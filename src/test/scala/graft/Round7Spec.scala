package graft

import org.apache.spark.sql.functions._

/** Round-7 pins for the four ADVICE items: TimeBuckets floor division on
  * pre-epoch instants, ZOrder null propagation in the degenerate branch,
  * the minhash source-similarity loud bound, and AsOf.join duplicate-name
  * rejection. */
class Round7Spec extends SparkTestBase {

  test("TimeBuckets floors (not truncates) around zero — DuckDB `//` semantics") {
    val s = spark
    import s.implicits._
    val got = Seq(-10L, -5L, -1L, 0L, 1L, 9L, 10L, 15L).toDF("ts")
      .select(col("ts"), functions.TimeBuckets.bucketOf("ts", 10).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(-10L -> -1L, -5L -> -1L, -1L -> -1L,
      0L -> 0L, 1L -> 0L, 9L -> 0L, 10L -> 1L, 15L -> 1L))
  }

  test("covering-bucket theorem holds across the zero boundary") {
    val s = spark
    import s.implicits._
    val w = 10L
    // every instant t in [ts, ts+w) must land in a covering bucket of ts —
    // with truncation toward zero, ts=-5 covered {0} but t=-3 lives in -1
    val violations = Seq.tabulate(41)(i => i - 20L).toDF("ts")
      .select(col("ts"), functions.TimeBuckets.coveringBuckets("ts", w).as("cov"))
      .select(col("ts"), col("cov"),
        explode(sequence(col("ts"), col("ts") + lit(w - 1))).as("t"))
      .select(functions.TimeBuckets.bucketOf("t", w).as("tb"), col("cov"))
      .where(!array_contains(col("cov"), col("tb")))
      .count()
    assert(violations === 0L)
  }

  test("ZOrder degenerate (constant) dimension still nulls the key for null rows") {
    val s = spark
    import s.implicits._
    // x is constant among non-null rows → hi<=lo branch; the null row must
    // get a NULL z-key (its own leading file range), not bucket 0
    val df = Seq((Option(5L), 1L), (None, 2L), (Option(5L), 3L)).toDF("x", "y")
    val z = functions.ZOrder.withZKey(df, "x", "y")
    assert(z.where(col("x").isNull && col("z").isNull).count() === 1L)
    assert(z.where(col("x").isNotNull && col("z").isNotNull).count() === 2L)
  }

  test("minhashSourceSim fails loudly past the source bound instead of dropping rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-srcbound").toString
    spark.range(1001)
      .select(col("id").as("doc_id"),
        lit("alpha beta gamma delta epsilon").as("text"), lit("en").as("lang"),
        concat(lit("src_"), col("id")).as("source"), lit(30L).as("n_chars"))
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val ex = intercept[IllegalArgumentException] {
      ops.Llm3.minhashSourceSim(spark, dir)
    }
    assert(ex.getMessage.contains("1001 sources"), ex.getMessage)
  }

  test("AsOf.join rejects a duplicate column name instead of binding to the first") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 10L, 5L)).toDF("k", "t", "t") // duplicate name "t"
    val right = Seq((1L, 5L, 1L)).toDF("rk", "rt", "rid")
    val ex = intercept[IllegalArgumentException] {
      plans.AsOf.join(left, right, "k", "rk", "t", "rt", "k", "rid")
    }
    assert(ex.getMessage.contains("ambiguous"), ex.getMessage)
  }
}
