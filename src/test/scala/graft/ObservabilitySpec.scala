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
}
