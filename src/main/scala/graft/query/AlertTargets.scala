package graft.query

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledExecutorService, TimeUnit}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.query.Alerts.{AlertState, Disabled, NotTriggered, Notification, Triggered}

/** Alert notification delivery — the reference's target machinery
  * (parseable `src/alerts/target.rs`: `Target::call` suppression/repeat
  * state at `:275-340`, repeat task `:316-399`, the three payload shapes
  * `:480-640`) re-expressed as a driver-side dispatcher that plugs
  * directly into [[Alerts.StateMachine]]'s `notify` callback.
  *
  * Three target kinds (same payload contracts as the reference):
  *   - [[Slack]]: `{"text": message}` JSON;
  *   - [[Webhook]]: the raw message body plus caller headers;
  *   - [[AlertManager]]: the alertmanager v2 alert-list JSON (labels +
  *     annotations, `status` label, `endsAt` stamped on resolution),
  *     optional HTTP Basic auth.
  *
  * Two independent retry axes, as in the reference:
  *   - [[DeliveryPolicy]] — per-call transport retry: a POST that fails
  *     (connect error, non-2xx) is retried up to `attempts` times with a
  *     fixed backoff and per-request timeout.
  *   - [[NotificationConfig]] — the REPEAT policy: on Triggered the target
  *     fires once and enters a timeout window; repeated Triggered
  *     evaluations inside the window are suppressed, while a background
  *     task re-notifies every `intervalMillis` as long as the alert stays
  *     Triggered, up to `times` total notifications (`None` = infinite,
  *     the reference's alertmanager default). The FIRST resolution inside
  *     the window always delivers; later duplicate resolves are dropped
  *     (`awaiting_resolve` in the reference).
  *
  * Scale note: notification volume is per-alert-transition, not per-row —
  * a driver-side `HttpClient` plus one shared scheduler thread is the
  * right size at any corpus scale; the heavy lifting (evaluation) stays
  * in Spark.
  */
object AlertTargets {

  sealed trait TargetType { def endpoint: String }
  final case class Slack(endpoint: String) extends TargetType
  final case class Webhook(endpoint: String,
                           headers: Map[String, String] = Map.empty)
      extends TargetType
  final case class AlertManager(endpoint: String,
                                auth: Option[(String, String)] = None)
      extends TargetType

  /** Repeat policy (reference `NotificationConfig`/`Retry`): re-notify
    * every `intervalMillis` while the alert remains Triggered; `times` is
    * the TOTAL notification budget per incident (first call included),
    * `None` = repeat until resolved.
    */
  final case class NotificationConfig(intervalMillis: Long = 60 * 1000L,
                                      times: Option[Int] = Some(1))

  /** Per-call transport retry: `attempts` tries, fixed `backoffMillis`
    * between them, `timeoutMillis` per request.
    */
  final case class DeliveryPolicy(attempts: Int = 3,
                                  timeoutMillis: Long = 10 * 1000L,
                                  backoffMillis: Long = 200L)

  final case class Target(name: String,
                          target: TargetType,
                          notification: NotificationConfig = NotificationConfig(),
                          delivery: DeliveryPolicy = DeliveryPolicy())

  private val mapper = new ObjectMapper()

  /** Reference `default_resolved_string`. */
  def resolvedMessage(alertId: String): String = s"$alertId is now resolved"

  /** Payload body + content type + extra headers for one notification. */
  def payload(t: TargetType, n: Notification): (String, String, Map[String, String]) = {
    val text = n.state match {
      case Triggered => n.message
      case _         => resolvedMessage(n.alertId)
    }
    t match {
      case Slack(_) =>
        val node = mapper.createObjectNode()
        node.put("text", text)
        (mapper.writeValueAsString(node), "application/json", Map.empty)
      case Webhook(_, headers) =>
        (text, "text/plain", headers)
      case AlertManager(_, auth) =>
        val alert = mapper.createObjectNode()
        val labels = alert.putObject("labels")
        labels.put("alertname", n.alertId)
        labels.put("status",
          if (n.state == Triggered) "triggered" else "not-triggered")
        val ann = alert.putObject("annotations")
        ann.put("message", text)
        if (n.state != Triggered) {
          ann.put("reason", resolvedMessage(n.alertId))
          alert.put("endsAt", java.time.Instant.now().toString)
        }
        val arr = mapper.createArrayNode()
        arr.add(alert)
        val hdrs = auth.map { case (u, p) =>
          "Authorization" -> ("Basic " + java.util.Base64.getEncoder
            .encodeToString(s"$u:$p".getBytes(UTF_8)))
        }.toMap
        (mapper.writeValueAsString(arr), "application/json", hdrs)
    }
  }

  /** One notification → one target, with transport retries. Returns true
    * iff some attempt got a 2xx back.
    */
  def deliver(t: Target, n: Notification,
              client: HttpClient = defaultClient): Boolean = {
    val (body, contentType, headers) = payload(t.target, n)
    val builder = HttpRequest.newBuilder(URI.create(t.target.endpoint))
      .timeout(Duration.ofMillis(t.delivery.timeoutMillis))
      .header("Content-Type", contentType)
    headers.foreach { case (k, v) => builder.header(k, v) }
    val req = builder
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build()
    var attempt = 0
    var ok = false
    while (!ok && attempt < math.max(1, t.delivery.attempts)) {
      if (attempt > 0) Thread.sleep(t.delivery.backoffMillis)
      ok =
        try {
          val code = client
            .send(req, HttpResponse.BodyHandlers.discarding()).statusCode()
          code >= 200 && code < 300
        } catch { case _: Exception => false }
      attempt += 1
    }
    ok
  }

  private lazy val defaultClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  /** Per-(target, alert) incident state — the reference's `TimeoutState`. */
  private final class IncidentState {
    @volatile var timedOut = false
    @volatile var awaitingResolve = false
    @volatile var lastState: AlertState = NotTriggered
    @volatile var sent = 0
  }

  /** The `notify` function for [[Alerts.StateMachine]]: fans each
    * notification out to every target with the reference's
    * suppression/repeat semantics. Close to stop repeat tasks.
    */
  final class Dispatcher(targets: Seq[Target],
                         client: HttpClient = defaultClient,
                         scheduler: ScheduledExecutorService =
                           Dispatcher.defaultScheduler)
      extends (Notification => Unit) with AutoCloseable {

    private val states = new ConcurrentHashMap[(String, String), IncidentState]()
    @volatile private var closed = false

    private def state(t: Target, alertId: String): IncidentState =
      states.computeIfAbsent((t.name, alertId), _ => new IncidentState)

    override def apply(n: Notification): Unit =
      targets.foreach(dispatch(_, n))

    private def dispatch(t: Target, n: Notification): Unit = {
      val st = state(t, n.alertId)
      st.synchronized {
        st.lastState = n.state
        n.state match {
          case Triggered =>
            if (!st.timedOut) {
              // first trigger of an incident: call once, open the window
              st.timedOut = true
              st.awaitingResolve = true
              st.sent = 1
              deliver(t, n, client)
              scheduleRepeat(t, n, st)
            } // else: suppressed — the repeat task re-notifies
          case NotTriggered =>
            if (st.timedOut) {
              if (st.awaitingResolve) {
                st.awaitingResolve = false
                deliver(t, n, client)
              } // else: duplicate resolve inside the window — dropped
            } else deliver(t, n, client)
          case Disabled => () // no notifications for disabled alerts
        }
      }
    }

    private def scheduleRepeat(t: Target, n: Notification,
                               st: IncidentState): Unit = {
      // the suppression window always spans at least one interval — the
      // reference resets TimeoutState only AFTER its timeout task's final
      // sleep, never synchronously on budget exhaustion
      scheduler.schedule(new Runnable {
        override def run(): Unit = st.synchronized {
          if (!closed && st.lastState == Triggered &&
              !t.notification.times.exists(st.sent >= _)) {
            st.awaitingResolve = true
            st.sent += 1
            deliver(t, n, client)
            scheduleRepeat(t, n, st)
          } else st.timedOut = false // resolved / budget spent: window over
        }
      }, t.notification.intervalMillis, TimeUnit.MILLISECONDS)
      ()
    }

    override def close(): Unit = { closed = true }
  }

  object Dispatcher {
    lazy val defaultScheduler: ScheduledExecutorService =
      Executors.newSingleThreadScheduledExecutor(r => {
        val th = new Thread(r, "graft-alert-notify")
        th.setDaemon(true)
        th
      })
  }
}
