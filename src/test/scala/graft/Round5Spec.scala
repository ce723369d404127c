package graft

import org.apache.spark.sql.functions._

/** Round-5 additions: exact-boundary session semantics, parameterized
  * connected-components parallelism, and the bounded-collect cap. */
class Round5Spec extends SparkTestBase {

  test("native session_window MERGES two events exactly gap apart (pins the oracle's > rule)") {
    val s = spark
    import s.implicits._
    // 2h gap, events at t0 and t0+2h exactly: native session_window keeps
    // them in ONE session ending last+gap — so a new session starts only
    // when diff > gap, which is precisely the lag+cumsum rule the
    // sessionize_native_window oracle uses (is_new when diff > 7200e6 us).
    // An exact-boundary fixture row therefore cannot break oracle parity.
    val df = Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 02:00:00"))
      .toDF("uid", "t").withColumn("ts", col("t").cast("timestamp"))
    val sw = df.groupBy(col("uid"), session_window(col("ts"), "2 hours").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("n"), col("sw.end").cast("string").as("end"))
      .collect()
    assert(sw.length === 1, sw.mkString(","))
    assert(sw.head.getLong(0) === 2L)
    assert(sw.head.getString(1) === "2024-01-01 04:00:00")
    // one second past the boundary → two sessions
    val df2 = Seq((1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 02:00:01"))
      .toDF("uid", "t").withColumn("ts", col("t").cast("timestamp"))
    assert(df2.groupBy(col("uid"), session_window(col("ts"), "2 hours")).count()
      .count() === 2L)
  }

  test("dedup clusters: hash-partitioned Pregel rounds match the single-partition path") {
    val auto = ops.Llm3.dedupClusters(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.toString)
    val par4 = ops.Llm3.dedupClustersAt(spark, sf0001, parallelism = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(auto.nonEmpty)
    assert(auto.toSeq === par4.toSeq)
  }

  test("boundedCollect fails loudly past its cap and passes under it") {
    val df = spark.range(100).toDF("x")
    assert(Tables.boundedCollect(df, 100, "test").length === 100)
    val e = intercept[IllegalArgumentException] {
      Tables.boundedCollect(df, 99, "test-over")
    }
    assert(e.getMessage.contains("driver-collect cap"), e.getMessage)
  }
}
