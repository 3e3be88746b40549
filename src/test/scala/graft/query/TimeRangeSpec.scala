package graft.query

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

class TimeRangeSpec extends AnyFunSuite {

  private val now = Instant.parse("2024-06-15T10:32:45Z")

  test("human times: now, relative, RFC3339, minute truncation") {
    assert(TimeRange.parseHumanTime("now", now) ==
      Instant.parse("2024-06-15T10:32:00Z"))
    assert(TimeRange.parseHumanTime("10m", now) ==
      Instant.parse("2024-06-15T10:22:00Z"))
    assert(TimeRange.parseHumanTime("2h", now) ==
      Instant.parse("2024-06-15T08:32:00Z"))
    assert(TimeRange.parseHumanTime("1d", now) ==
      Instant.parse("2024-06-14T10:32:00Z"))
    assert(TimeRange.parseHumanTime("2024-01-02T03:04:05Z", now) ==
      Instant.parse("2024-01-02T03:04:00Z"))
  }

  test("parse produces an ordered range") {
    val r = TimeRange.parse("10m", "now", now)
    assert(r.start.isBefore(r.end))
    assert(r.duration.toMinutes == 10)
  }

  test("auto bin interval follows the reference's 1m/5m/1h/1d ladder") {
    import java.time.Duration
    assert(Counts.autoBinMillis(Duration.ofMinutes(30)) == 60 * 1000L)
    assert(Counts.autoBinMillis(Duration.ofHours(12)) == 5 * 60 * 1000L)
    assert(Counts.autoBinMillis(Duration.ofDays(2)) == 3600 * 1000L)
    assert(Counts.autoBinMillis(Duration.ofDays(40)) == 86400 * 1000L)
  }
}
