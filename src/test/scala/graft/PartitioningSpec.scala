package graft

import org.apache.spark.sql.functions._

/** Physical-partitioning surface (the Flink `rebalance` / `rescale` /
  * `keyBy` / `partitionCustom` family, §2.B5): in Spark these are
  * `repartition(n)` (round-robin rebalance), `repartition(col)` (hash
  * keyBy), `repartitionByRange` (range partition, the sort-shuffle
  * building block), and `coalesce(n)` (shuffle-FREE narrow rescale).
  * Each is asserted on both the physical plan and the resulting layout. */
class PartitioningSpec extends SparkTestBase {

  private lazy val ev = Tables.events(spark, sf0001)

  test("repartition(n) round-robin rebalances near-evenly") {
    val df = ev.repartition(8)
    assert(df.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning"))
    val sizes = df.groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    assert(sizes.length === 8)
    assert(sizes.max - sizes.min <= 1, s"uneven: ${sizes.mkString(",")}")
  }

  test("repartition(col) hash-partitions: every key lives in exactly one partition") {
    val df = ev.repartition(8, col("user_id"))
    assert(df.queryExecution.executedPlan.toString.contains("hashpartitioning(user_id"))
    val spread = df.select(col("user_id"), spark_partition_id().as("p"))
      .distinct().groupBy("user_id").count()
      .where(col("count") > 1).count()
    assert(spread === 0)
  }

  test("repartitionByRange gives disjoint ordered ranges across partitions") {
    val df = ev.repartitionByRange(4, col("value"))
    assert(df.queryExecution.executedPlan.toString.contains("rangepartitioning"))
    val bounds = df.select(spark_partition_id().as("p"), col("value"))
      .groupBy("p").agg(min("value").as("mn"), max("value").as("mx"))
      .orderBy("p").collect()
    bounds.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("mx") <= b.getAs[Double]("mn"),
          s"overlapping ranges: $a vs $b")
      case _ => ()
    }
  }

  test("coalesce(n) narrows without any shuffle") {
    val df = ev.repartition(8).coalesce(2)
    val plan = df.queryExecution.executedPlan.toString
    // exactly the one exchange from repartition(8); coalesce adds none
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === ev.count())
  }
}
