package graft.query

import java.time.{Instant, ZonedDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

/** Query time window with the reference's human-friendly parsing.
  *
  * Mirrors parseable `src/utils/time.rs:191-213` `parse_human_time`:
  * "now", relative ("10m", "2h", "7d" — meaning now minus that much), or
  * RFC3339; both bounds truncated to the minute.
  */
final case class TimeRange(start: Instant, end: Instant) {
  require(!end.isBefore(start), s"end $end before start $start")
  def duration: java.time.Duration = java.time.Duration.between(start, end)
}

object TimeRange {

  private val Relative = """^(\d+)\s*(s|m|h|d)$""".r

  def parseHumanTime(s: String, now: Instant): Instant = s.trim match {
    case "now" => truncMinute(now)
    case Relative(n, unit) =>
      val amount = n.toLong
      val d = unit match {
        case "s" => java.time.Duration.ofSeconds(amount)
        case "m" => java.time.Duration.ofMinutes(amount)
        case "h" => java.time.Duration.ofHours(amount)
        case "d" => java.time.Duration.ofDays(amount)
      }
      truncMinute(now.minus(d))
    case other =>
      truncMinute(ZonedDateTime
        .parse(other, DateTimeFormatter.ISO_DATE_TIME)
        .withZoneSameInstant(ZoneOffset.UTC)
        .toInstant)
  }

  def parse(start: String, end: String, now: Instant = Instant.now()): TimeRange =
    TimeRange(parseHumanTime(start, now), parseHumanTime(end, now))

  private def truncMinute(i: Instant): Instant = i.truncatedTo(ChronoUnit.MINUTES)
}
