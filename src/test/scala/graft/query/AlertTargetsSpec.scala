package graft.query

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.HttpServer

import graft.SparkSuite
import graft.query.Alerts._
import graft.query.AlertTargets._

class AlertTargetsSpec extends SparkSuite {

  /** Local HTTP sink recording every request; the first `failFirst`
    * requests answer 500 to exercise transport retry.
    */
  private final class Sink(failFirst: Int = 0) extends AutoCloseable {
    val bodies = new CopyOnWriteArrayList[String]()
    val headers = new CopyOnWriteArrayList[Map[String, String]]()
    private val n = new AtomicInteger
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { ex =>
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      bodies.add(body)
      headers.add(ex.getRequestHeaders.entrySet().asScala
        .map(e => e.getKey -> e.getValue.asScala.mkString(",")).toMap)
      val code = if (n.incrementAndGet() <= failFirst) 500 else 200
      ex.sendResponseHeaders(code, 0L)
      ex.close()
    })
    server.start()
    def endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}/"
    override def close(): Unit = server.stop(0)
  }

  private def eventually[A](timeoutMs: Long = 5000)(f: => A): A = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try return f
      catch { case t: Throwable => last = t; Thread.sleep(25) }
    }
    throw last
  }

  private def trig(id: String, msg: String = "cpu high") =
    Notification(id, Triggered, msg)
  private def resolved(id: String) = Notification(id, NotTriggered, "")

  test("delivery retries after failure until a 2xx lands") {
    val sink = new Sink(failFirst = 2)
    try {
      val t = Target("wh", Webhook(sink.endpoint),
        delivery = DeliveryPolicy(attempts = 4, backoffMillis = 10))
      assert(AlertTargets.deliver(t, trig("a1")))
      assert(sink.bodies.size == 3) // two 500s, then the success
      assert(sink.bodies.get(2) == "cpu high")
    } finally sink.close()
  }

  test("delivery gives up after the attempt budget") {
    val sink = new Sink(failFirst = 10)
    try {
      val t = Target("wh", Webhook(sink.endpoint),
        delivery = DeliveryPolicy(attempts = 2, backoffMillis = 10))
      assert(!AlertTargets.deliver(t, trig("a1")))
      assert(sink.bodies.size == 2)
    } finally sink.close()
  }

  test("dispatcher sends Triggered then Resolved; duplicates suppressed") {
    val sink = new Sink()
    val d = new Dispatcher(Seq(Target("slack", Slack(sink.endpoint),
      NotificationConfig(intervalMillis = 150, times = Some(1)))))
    try {
      d(trig("cpu", "cpu over 90"))
      d(trig("cpu", "cpu over 90")) // still triggered: suppressed
      d(trig("cpu", "cpu over 90"))
      eventually() { assert(sink.bodies.size == 1) }
      assert(sink.bodies.get(0) == """{"text":"cpu over 90"}""")
      d(resolved("cpu"))
      d(resolved("cpu")) // duplicate resolve inside the window: dropped
      eventually() { assert(sink.bodies.size == 2) }
      assert(sink.bodies.get(1).contains(AlertTargets.resolvedMessage("cpu")))
      // the window closes one interval after the trigger; a NEW incident
      // after that notifies again
      Thread.sleep(400)
      d(trig("cpu", "cpu over 90"))
      eventually() { assert(sink.bodies.size == 3) }
    } finally { d.close(); sink.close() }
  }

  test("repeat task re-notifies while Triggered, stops on resolve") {
    val sink = new Sink()
    val d = new Dispatcher(Seq(Target("wh", Webhook(sink.endpoint),
      NotificationConfig(intervalMillis = 80, times = Some(3)))))
    try {
      d(trig("mem", "mem high"))
      // budget 3: initial + 2 repeats while the alert stays Triggered
      eventually() { assert(sink.bodies.size == 3) }
      Thread.sleep(250)
      assert(sink.bodies.size == 3) // budget exhausted, no more repeats
      d(resolved("mem"))
      eventually() { assert(sink.bodies.size == 4) }
    } finally { d.close(); sink.close() }
  }

  test("resolve mid-window halts the infinite repeat loop") {
    val sink = new Sink()
    val d = new Dispatcher(Seq(Target("wh", Webhook(sink.endpoint),
      NotificationConfig(intervalMillis = 60, times = None))))
    try {
      d(trig("disk", "disk full"))
      eventually() { assert(sink.bodies.size >= 2) } // repeating
      d(resolved("disk"))
      eventually() { assert(sink.bodies.asScala.exists(
        _.contains(AlertTargets.resolvedMessage("disk")))) }
      val after = sink.bodies.size
      Thread.sleep(250)
      assert(sink.bodies.size == after) // loop stopped
    } finally { d.close(); sink.close() }
  }

  test("alertmanager payload carries labels, status, endsAt and Basic auth") {
    val sink = new Sink()
    val d = new Dispatcher(Seq(Target("am",
      AlertManager(sink.endpoint, auth = Some(("alice", "s3cret"))))))
    try {
      d(trig("lat", "latency p99"))
      d(resolved("lat"))
      eventually() { assert(sink.bodies.size == 2) }
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val fired = m.readTree(sink.bodies.get(0)).get(0)
      assert(fired.get("labels").get("alertname").asText() == "lat")
      assert(fired.get("labels").get("status").asText() == "triggered")
      assert(fired.get("annotations").get("message").asText() == "latency p99")
      val res = m.readTree(sink.bodies.get(1)).get(0)
      assert(res.get("labels").get("status").asText() == "not-triggered")
      assert(res.hasNonNull("endsAt"))
      val auth = sink.headers.get(0).collectFirst {
        case (k, v) if k.equalsIgnoreCase("Authorization") => v }
      assert(auth.contains("Basic " + java.util.Base64.getEncoder
        .encodeToString("alice:s3cret".getBytes(UTF_8))))
    } finally { d.close(); sink.close() }
  }

  test("state machine wired to the dispatcher delivers on transitions only") {
    import spark.implicits._
    val sink = new Sink()
    val d = new Dispatcher(Seq(Target("wh", Webhook(sink.endpoint))))
    val machine = new StateMachine(d)
    val cfg = AlertConfig(AggAvg, "v", None, Seq("svc"), Above, 50.0)
    try {
      val hot = Seq(("a", 90.0), ("a", 80.0), ("b", 10.0)).toDF("svc", "v")
      val cold = Seq(("a", 10.0), ("b", 10.0)).toDF("svc", "v")
      machine.observe("avg_v", cfg, Alerts.evaluate(hot, cfg))
      eventually() { assert(sink.bodies.size == 1) }
      assert(sink.bodies.get(0).contains("AggAvg(v)=85.0"))
      machine.observe("avg_v", cfg, Alerts.evaluate(hot, cfg)) // suppressed
      machine.observe("avg_v", cfg, Alerts.evaluate(cold, cfg)) // resolve
      eventually() { assert(sink.bodies.size == 2) }
      machine.observe("avg_v", cfg, Alerts.evaluate(cold, cfg)) // quiet
      Thread.sleep(150)
      assert(sink.bodies.size == 2)
    } finally { d.close(); sink.close() }
  }
}
