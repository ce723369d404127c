package graft

import java.lang.management.ManagementFactory
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.graftbridge.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev diagnostic for the `rec_item_item_cf` aged-JVM bi-modality (VERDICT
  * r14/r15): times the key in a FRESH session regime, ages the JVM by
  * running the entire 374-query suite once, then times the key again in
  * the SAME JVM — differencing task metrics (GC, CPU, shuffle), Catalyst
  * codegen compilation counts, HotSpot JIT compilation time, JIT code
  * cache occupancy, and old-gen heap between the two regimes. The output
  * is the stage-metric diff the round-15 verdict asked for.
  *
  * Usage: runMain graft.CfDiag [sfDir]
  */
object CfDiag {
  final class TaskTally extends SparkListener {
    val gcMs = new AtomicLong
    val runMs = new AtomicLong
    val cpuNs = new AtomicLong
    val deserMs = new AtomicLong
    val shufReadB = new AtomicLong
    val shufWriteB = new AtomicLong
    val spillB = new AtomicLong
    val tasks = new AtomicLong
    val peakMem = new AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        gcMs.addAndGet(m.jvmGCTime)
        runMs.addAndGet(m.executorRunTime)
        cpuNs.addAndGet(m.executorCpuTime)
        deserMs.addAndGet(m.executorDeserializeTime)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spillB.addAndGet(m.memoryBytesSpilled)
        tasks.incrementAndGet()
        peakMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      }
    }
    def snap(): Map[String, Long] = Map(
      "gc_ms" -> gcMs.get, "run_ms" -> runMs.get, "cpu_ms" -> cpuNs.get / 1000000,
      "deser_ms" -> deserMs.get, "shuf_read_b" -> shufReadB.get,
      "shuf_write_b" -> shufWriteB.get, "spill_b" -> spillB.get,
      "tasks" -> tasks.get, "peak_mem" -> peakMem.get)
  }

  private def jvmState(): Map[String, Long] = {
    val comp = ManagementFactory.getCompilationMXBean
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    val codeCache = pools.filter(_.getName.startsWith("CodeHeap"))
      .map(p => p.getName.replaceAll("[^a-zA-Z]", "_") -> p.getUsage.getUsed)
    val oldGen = pools.find(_.getName.contains("Old Gen"))
      .map(_.getUsage.getUsed).getOrElse(-1L)
    val gcs = ManagementFactory.getGarbageCollectorMXBeans.asScala
    val meta = pools.find(_.getName == "Metaspace").map(_.getUsage.getUsed).getOrElse(-1L)
    (codeCache.toMap ++ Map(
      "jit_total_ms" -> comp.getTotalCompilationTime,
      "old_gen_used" -> oldGen,
      "metaspace_used" -> meta,
      "gc_count" -> gcs.map(_.getCollectionCount).sum,
      "gc_time_ms" -> gcs.map(_.getCollectionTime).sum,
      "catalyst_codegen_compiles" ->
        org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount,
      "catalyst_codegen_ms_mean_x1k" ->
        (org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME
          .getSnapshot.getMean * 1000).toLong))
  }

  private def diffPrint(tag: String, a: Map[String, Long], b: Map[String, Long]): Unit = {
    val keys = (a.keySet ++ b.keySet).toSeq.sorted
    println(s"[cfdiag] $tag:")
    keys.foreach { k =>
      println(f"[cfdiag]   $k%-34s ${b.getOrElse(k, -1L) - a.getOrElse(k, 0L)}%,15d (now ${b.getOrElse(k, -1L)}%,d)")
    }
  }

  def runKey(spark: SparkSession, sfDir: String, tag: String, reps: Int = 3): Unit = {
    val sc = spark.sparkContext
    for (i <- 1 to reps) {
      val tally = new TaskTally
      sc.addSparkListener(tally)
      val j0 = jvmState()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("rec_item_item_cf")(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      ListenerBridge.flush(sc)
      val j1 = jvmState()
      sc.removeSparkListener(tally)
      val m = tally.snap()
      println(f"[cfdiag] === $tag rep$i: wall $wall%.3f s ($n rows) ===")
      println(f"[cfdiag]   tasks ${m("tasks")}%,d  run_ms ${m("run_ms")}%,d  cpu_ms ${m("cpu_ms")}%,d  gc_ms ${m("gc_ms")}%,d  deser_ms ${m("deser_ms")}%,d")
      println(f"[cfdiag]   shuf_read ${m("shuf_read_b") / 1048576.0}%.1f MB  shuf_write ${m("shuf_write_b") / 1048576.0}%.1f MB  spill ${m("spill_b")}%,d  peak_mem ${m("peak_mem")}%,d")
      diffPrint(s"$tag rep$i jvm-delta", j0, j1)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val codegenCache = sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", codegenCache)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    println(s"[cfdiag] codegen cache maxEntries = $codegenCache")
    spark.sparkContext.setLogLevel("WARN")

    // Regime A: fresh JVM (after the same sf0.001 warmup Bench does).
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.values.foreach { fn =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    runKey(spark, sfDir, "fresh")

    // Age the JVM: one rep of every query at the target sf (≈ a Bench pass).
    println("[cfdiag] aging: full suite 1 rep each at " + sfDir)
    val tAge0 = System.nanoTime()
    SparkEntry.queries.foreach { case (k, fn) =>
      try fn(spark, sfDir).count() catch { case e: Throwable => println(s"[cfdiag] $k ERR $e") }
    }
    println(f"[cfdiag] aging done in ${(System.nanoTime() - tAge0) / 1e9}%.1f s")

    // Regime B: aged JVM, same key, same plan.
    runKey(spark, sfDir, "aged", reps = 5)
    spark.stop()
  }
}
