package graft.http

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

/** System resource guard (reference `src/handlers/http/resource_check.rs`):
  * a background sampler flips a flag when CPU or memory utilization crosses
  * its threshold, and the ingest path answers 503 while the flag is down —
  * load-shedding the write path instead of melting the node. The query
  * path stays open (reads are how an operator diagnoses the overload).
  *
  * The sampler is injectable so thresholds are testable without actually
  * starving a host; the default reads the JVM's platform MXBean (process-
  * wide CPU load and physical memory, the `sysinfo` figures the reference
  * samples).
  */
object ResourceMonitor {

  /** Thresholds are percentages (reference defaults: CPU and memory
    * checks both enabled; interval seconds-scale).
    */
  final case class Config(
      cpuThresholdPct: Double = 90.0,
      memThresholdPct: Double = 80.0,
      intervalMillis: Long = 15000L,
      sampler: () => (Double, Double) = () => defaultSample())

  /** (cpuPct, memPct) from the platform MXBean; 0.0 where the platform
    * does not expose a figure (never spuriously trips a threshold).
    */
  def defaultSample(): (Double, Double) =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean =>
        val cpuRaw = b.getCpuLoad * 100.0
        val cpu = if (cpuRaw.isNaN || cpuRaw < 0) 0.0 else cpuRaw
        val total = b.getTotalMemorySize.toDouble
        val mem =
          if (total > 0) (total - b.getFreeMemorySize) / total * 100.0
          else 0.0
        (cpu, mem)
      case _ => (0.0, 0.0)
    }
}

final class ResourceMonitor(cfg: ResourceMonitor.Config) {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)
  private val okFlag = new AtomicBoolean(true)
  private val exec = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-resource-monitor")
    t.setDaemon(true)
    t
  })

  /** Whether requests should currently be accepted. */
  def ok: Boolean = okFlag.get()

  /** One sample → flag update; exposed for deterministic tests. */
  def sampleOnce(): Unit = {
    val (cpu, mem) = cfg.sampler()
    val good = cpu <= cfg.cpuThresholdPct && mem <= cfg.memThresholdPct
    val was = okFlag.getAndSet(good)
    if (was != good) {
      if (good)
        log.info(f"resource utilization back to normal (cpu $cpu%.1f%%, " +
          f"mem $mem%.1f%%) - requests will be accepted")
      else
        log.warn(f"resource utilization too high (cpu $cpu%.1f%% / " +
          f"${cfg.cpuThresholdPct}%.1f%%, mem $mem%.1f%% / " +
          f"${cfg.memThresholdPct}%.1f%%) - ingest will be rejected")
    }
  }

  def start(): Unit = {
    exec.scheduleAtFixedRate(() => {
      try sampleOnce()
      catch { case e: Exception => log.warn(s"resource sample failed: $e") }
    }, 0L, cfg.intervalMillis, TimeUnit.MILLISECONDS)
    ()
  }

  def stop(): Unit = { exec.shutdownNow(); () }
}
