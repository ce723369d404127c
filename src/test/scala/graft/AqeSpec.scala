package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution evidence (SURVEY §4.2's "AQE dynamic
  * re-planning incl. skew-join split" row, demonstrated rather than
  * assumed): a manufactured whale key must be split by
  * `OptimizeSkewedJoin` at runtime. Thresholds are lowered so the split
  * triggers at fixture scale; the mechanism is byte-identical at 100 TB. */
class AqeSpec extends SparkTestBase {

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    val s = spark
    import s.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one whale key (0) carrying ~100k rows vs 1k spread keys
      val big = spark.range(110000)
        .select(when($"id" < 100000, 0L).otherwise($"id" % 1000).as("k"),
          concat(lit("payload_payload_payload_"), $"id").as("pay"))
      val small = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = big.join(small, "k")
      // collect() (not count()) so THIS plan executes and AQE finalizes it;
      // count() would plan a separate aggregate query
      assert(joined.collect().length === 110000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
      assert(finalPlan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the whale partition:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
