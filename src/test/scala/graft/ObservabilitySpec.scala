package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Production observability surface: `Dataset.observe` named metrics (the
  * Flink metrics-group analogue, usable in batch AND streaming) and
  * `QueryExecutionListener` (post-execution plan/metric hooks). These are
  * how a 100 TB pipeline self-reports row counts and data-quality
  * aggregates without a second scan. */
class ObservabilitySpec extends SparkTestBase {

  test("observe() attaches zero-extra-scan metrics to a batch query") {
    @volatile var observed: Map[String, Any] = Map.empty
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val row = qe.observedMetrics.get("ingest_stats")
        row.foreach { r =>
          observed = Map("n" -> r.getAs[Long]("n"), "sum_v" -> r.getAs[Double]("sum_v"))
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val ev = Tables.events(spark, sf0001)
        .observe("ingest_stats", count(lit(1)).as("n"),
          round(Tables.dsum(col("value")), 6).as("sum_v"))
        .where(col("event_type") === "purchase")
      val filtered = ev.count()
      // listener delivery is async; poll until the metric lands
      val deadline = System.nanoTime() + 30L * 1000000000
      while (observed.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      // metrics reflect rows flowing THROUGH the observe point (all rows,
      // before the filter), proving no second scan is needed
      assert(observed("n") === Tables.events(spark, sf0001).count())
      assert(filtered < observed("n").asInstanceOf[Long])
      val direct = Tables.events(spark, sf0001)
        .agg(round(Tables.dsum(col("value")), 6)).head().getDouble(0)
      assert(observed("sum_v") === direct)
    } finally spark.listenerManager.unregister(listener)
  }

  test("observe() metrics surface per micro-batch in streaming progress") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val q = ms.toDF().observe("batch_stats", count(lit(1)).as("rows"))
      .writeStream.format("memory").queryName("obs_sink")
      .outputMode("append").start()
    try {
      ms.addData(1, 2, 3, 4)
      q.processAllAvailable()
      val metrics = q.lastProgress.observedMetrics
      assert(metrics.containsKey("batch_stats"))
      assert(metrics.get("batch_stats").getAs[Long]("rows") === 4L)
    } finally q.stop()
  }

  test("state-store metrics: stateOperators report rows+memory; watermark surfaces in progress") {
    // the Flink state-size / watermark metrics analogue: every stateful
    // streaming operator self-reports its state rows and memory through
    // StreamingQueryProgress — the signal a 100 TB deployment alerts on
    // when keyed state starts growing without bound
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[streaming.Streams.Event]
    val agg = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("state_metrics")
      .outputMode("update").start()
    try {
      def ev(id: Long, t: String) = streaming.Streams.Event(id, ts(t), 1L, "click", 1.0)
      ms.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 11:00:00"))
      q.processAllAvailable()
      ms.addData(ev(3, "2024-01-01 12:00:00"))
      q.processAllAvailable()
      val p = q.lastProgress
      assert(p.stateOperators.nonEmpty, "stateful agg must expose a state operator")
      val st = p.stateOperators.head
      assert(st.numRowsTotal > 0, s"state rows: ${st.numRowsTotal}")
      assert(st.memoryUsedBytes > 0, s"state memory: ${st.memoryUsedBytes}")
      // the watermark the second batch established (12:00 - 10 min)
      val wm = p.eventTime.get("watermark")
      assert(wm != null && wm.startsWith("2024-01-01T11:50"), s"watermark: $wm")
    } finally q.stop()
  }
}
