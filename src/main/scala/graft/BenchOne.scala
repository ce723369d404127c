package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time (or explain) a single SparkEntry query.
  * Usage: runMain graft.BenchOne <query_key> [sfDir] [explain]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "jaccard_split") {
      // Attribution probe (VERDICT r8 #3): inside one invocation the
      // persisted w/prefix frames stay live, so count#1 = index build +
      // probe join, count#2 = probe join only; build = #1 − #2.
      for (i <- 1 to 3) // rep1 = cold JVM (JIT + scan setup), rep3 ≈ bench-warm
        ops.Llm.withDedupJaccardPrefix(spark, sfDir) { df =>
          val t0 = System.nanoTime(); val n1 = df.count()
          val t1 = System.nanoTime(); val n2 = df.count()
          val t2 = System.nanoTime()
          println(f"[benchone] jaccard_split rep$i: build+probe ${(t1 - t0) / 1e9}%.3f s, probe ${(t2 - t1) / 1e9}%.3f s, $n1/$n2 rows")
        }
      spark.stop(); return
    }
    val fn = SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    else if (args.contains("phases")) {
      // Split a rep into plan time (analysis+optimization+physical planning,
      // forced via executedPlan) and execution time (count on the planned
      // frame) — Bench reps pay both, so attributing a regression needs the
      // split. One warmup rep first (JIT + file-index cache).
      fn(spark, sfDir).count()
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // force planning
        val t1 = System.nanoTime()
        val n = df.count()
        val t2 = System.nanoTime()
        println(f"[benchone] $name rep$i: plan ${(t1 - t0) / 1e9}%.3f s, exec ${(t2 - t1) / 1e9}%.3f s, $n rows")
      }
    } else if (args.contains("stages")) {
      // Stage-level attribution: warm rep, then one timed rep with a
      // listener printing every stage's wall, task count, and task-time
      // sum — decomposes a query's cost into its stages (job overhead
      // vs compute vs exchange).
      import org.apache.spark.scheduler._
      val stages = new java.util.concurrent.ConcurrentHashMap[Int, String]()
      val runMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
      val cpuMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            runMs.computeIfAbsent(t.stageId, _ => new java.util.concurrent.atomic.AtomicLong)
              .addAndGet(m.executorRunTime)
            cpuMs.computeIfAbsent(t.stageId, _ => new java.util.concurrent.atomic.AtomicLong)
              .addAndGet(m.executorCpuTime / 1000000)
          }
        }
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
          val rm = Option(runMs.get(i.stageId)).map(_.get).getOrElse(0L)
          val cm = Option(cpuMs.get(i.stageId)).map(_.get).getOrElse(0L)
          stages.put(i.stageId,
            f"stage ${i.stageId}%3d ${i.name.take(44)}%-44s wall $wall%6.3f s tasks ${i.numTasks}%4d run ${rm / 1e3}%6.2f cpu ${cm / 1e3}%6.2f")
        }
      }
      fn(spark, sfDir).count() // warm
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach { case (_, l) => println(s"[benchone] $l") }
      println(f"[benchone] $name: $dt%.3f s, $n rows")
    } else if (args.contains("warmprobe")) {
      // Warm-strategy probe: run the key N times at a WARM dir first
      // (default sf0.01), then time reps at the target — answers whether
      // a stronger warm pass absorbs the HotSpot tier-up tax that
      // min-of-3 at the target otherwise pays.
      val jit = java.lang.management.ManagementFactory.getCompilationMXBean
      val wi = args.indexOf("warmprobe")
      val warmDir = args(wi + 1)
      val warmReps = args(wi + 2).toInt
      val tw0 = System.nanoTime()
      for (_ <- 1 to warmReps) fn(spark, warmDir).count()
      println(f"[benchone] $name warm ${warmReps}x$warmDir: ${(System.nanoTime() - tw0) / 1e9}%.3f s")
      for (i <- 1 to 3) {
        val j0 = jit.getTotalCompilationTime
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[benchone] $name rep$i: $dt%.3f s, $rows rows, jit ${jit.getTotalCompilationTime - j0} ms")
      }
    } else if (args.contains("reps")) {
      // JIT-convergence probe: N timed reps, per-rep wall + JIT-compiler
      // delta, no warmup — rep1 IS the cold measurement. Shows how many
      // executions a key needs before HotSpot reaches steady state.
      val jit = java.lang.management.ManagementFactory.getCompilationMXBean
      val n = args(args.indexOf("reps") + 1).toInt
      for (i <- 1 to n) {
        val j0 = jit.getTotalCompilationTime
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[benchone] $name rep$i: $dt%.3f s, $rows rows, jit ${jit.getTotalCompilationTime - j0} ms")
      }
    } else {
      val jit = java.lang.management.ManagementFactory.getCompilationMXBean
      fn(spark, sfDir).count() // warmup
      val j0 = jit.getTotalCompilationTime
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[benchone] $name: $dt%.3f s, $n rows, jit ${jit.getTotalCompilationTime - j0} ms")
    }
    spark.stop()
  }
}
