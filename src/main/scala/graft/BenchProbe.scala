package graft

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Box-weather probes + per-query attribution shared by the bench
  * mains (`Bench`, `BenchVec`, `BenchDoc`).
  *
  * Round-12 lesson (verdict task 1): the driver's r12 bench window ran
  * ~19% slower per shared query than r11 at EQUAL endpoint calibration
  * — a min-of-three endpoint CPU probe provably missed whatever the
  * window did, and per-query wall-clock alone cannot separate box
  * weather from an engine regression. Three fixes live here:
  *
  *  - [[calibrate]] — the fixed CPU+shuffle probe (unchanged since
  *    round 9: 20M deterministic rows, xxhash64 chain, 97,651-key hash
  *    agg, global sort). Bench now also samples it MID-RUN (every ~30
  *    queries), so a contention burst inside the window shows up in
  *    the artifact's `cal_samples` array instead of being averaged
  *    away by endpoint minima.
  *  - [[calibrateDisk]] — a DISK probe beside the CPU probe (round-12
  *    verdict task 8): the drift data showed disk-episode queries
  *    scaling at ~0.89× across windows while the CPU probe said
  *    1.53×, so one probe cannot normalize both query families. The
  *    probe mirrors what the store episodes actually do: a 256 MiB
  *    sequential write force()d to the device (page cache cannot
  *    absorb it — fsync measures real write bandwidth, and a READ
  *    probe of a fixed file would measure page-cache memory bandwidth
  *    on a 128 GiB box, not the disk) plus 32 small create+fsync+
  *    rename cycles (the manifest-publish latency shape). Reported as
  *    `calibration_disk`; `scripts/check_perf_drift.py` normalizes
  *    episode tables with it and compute tables with the CPU probe.
  *  - [[CpuListener]] / [[taskCpuNanos]] — per-query executor CPU via
  *    TaskMetrics, so artifacts carry cpu-normalized-ratio inputs: a
  *    weather-slowed query keeps its CPU time flat (it waited); an
  *    engine regression grows it.
  */
object BenchProbe {

  /** Fixed synthetic CPU+shuffle work — corpus- and engine-code-
    * independent, so its runtime measures only the BOX. */
  def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(20000000L)
      .select((col("id") % 97651L).as("k"),
        xxhash64(xxhash64(col("id")), col("id")).as("h"))
      .groupBy("k").agg(sum(col("h")).as("s"), count(lit(1)).as("c"))
      .orderBy(col("s")).count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Disk-weather probe: 256 MiB sequential write + force(), then 32
    * small create+fsync+rename cycles — the two I/O shapes the
    * versioned-store episodes are made of. Runs in java.io.tmpdir
    * (same device the bench episodes write to); cleans up after
    * itself. Returns seconds. */
  def calibrateDisk(): Double = {
    val dir = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val big = dir.resolve(s"graft_diskprobe_$tag.bin")
    val buf = java.nio.ByteBuffer.allocate(1 << 20)
    while (buf.hasRemaining) buf.put((buf.position() * 131 + 17).toByte)
    val t0 = System.nanoTime()
    try {
      val ch = FileChannel.open(big, StandardOpenOption.CREATE,
        StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
      try {
        var i = 0
        while (i < 256) { buf.rewind(); ch.write(buf); i += 1 }
        ch.force(true)
      } finally ch.close()
      var j = 0
      while (j < 32) {
        val tmp = dir.resolve(s"graft_diskprobe_$tag.$j.tmp")
        val fin = dir.resolve(s"graft_diskprobe_$tag.$j.fin")
        val sc = FileChannel.open(tmp, StandardOpenOption.CREATE,
          StandardOpenOption.WRITE, StandardOpenOption.TRUNCATE_EXISTING)
        try { buf.rewind(); buf.limit(8192); sc.write(buf); buf.limit(buf.capacity()); sc.force(true) }
        finally sc.close()
        Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
        Files.deleteIfExists(fin)
        j += 1
      }
    } finally Files.deleteIfExists(big)
    (System.nanoTime() - t0) / 1e9
  }

  /** (rchar, wchar) from /proc/self/io — bytes moved through
    * read()/write() syscalls, page-cache hits included. In local mode
    * driver+executors share the process, so these are whole-engine
    * counters (see BenchVec's metering note: Spark 4.1 task
    * InputMetrics count only parquet footers under the vectorized
    * reader, so /proc is the honest meter). */
  def procIo(): (Long, Long) = {
    var r = 0L; var w = 0L
    scala.io.Source.fromFile("/proc/self/io").getLines().foreach { l =>
      if (l.startsWith("rchar:")) r = l.stripPrefix("rchar:").trim.toLong
      else if (l.startsWith("wchar:")) w = l.stripPrefix("wchar:").trim.toLong
    }
    (r, w)
  }

  /** Accumulates executorCpuTime (ns) across every finished task, plus
    * the Spark JOB count (round-13 verdict task 7: cpu≪wall separates
    * waiting from working, but a 40-job leg bound by the per-job
    * scheduler floor is only identifiable from its job count — with
    * `n_jobs` in the artifact, floor-bound vs work-bound is a column,
    * not code-reading). Snapshot-and-diff around each query (after
    * [[drainListenerBus]]) attributes both per query. */
  final class CpuListener extends SparkListener {
    val cpuNanos = new AtomicLong(0L)
    val jobs = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) cpuNanos.addAndGet(m.executorCpuTime)
    }
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
  }

  /** Flush the async listener bus so CpuListener has seen every task
    * of the query just finished. `listenerBus` is `private[spark]` at
    * the Scala level but public in bytecode — plain reflection, no
    * setAccessible. Best-effort: on any failure fall back to a short
    * sleep (the attribution slop is then ≤ one bus flush, and the
    * artifact still carries the number). */
  def drainListenerBus(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty", classOf[Long])
        .invoke(bus, java.lang.Long.valueOf(5000L))
    } catch { case _: Throwable => Thread.sleep(100L) }
}
