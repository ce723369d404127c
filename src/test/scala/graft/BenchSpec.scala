package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins the round-6 bench contract: error counting (a throwing query can
  * never masquerade as a fast one), min-of-reps noise suppression, and the
  * top-K + rest-rollup JSON line shape. */
class BenchSpec extends SparkTestBase {

  private def q(df: => DataFrame): (SparkSession, String) => DataFrame =
    (_, _) => df

  test("timeQueries counts a throwing query in errors and still times the rest") {
    val s = spark
    import s.implicits._
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "ok"   -> q(Seq(1, 2, 3).toDF("x")),
      "boom" -> q(throw new RuntimeException("broken query"))
    )
    val (results, errors) = Bench.timeQueries(spark, sf0001, queries, reps = 2)
    assert(errors === 1)
    assert(results.keySet === Set("ok", "boom"))
    assert(results("ok") >= 0.0)
  }

  test("timeQueries reports zero errors on healthy queries") {
    val s = spark
    import s.implicits._
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "a" -> q(Seq(1).toDF("x")),
      "b" -> q(Seq(2).toDF("x"))
    )
    val (_, errors) = Bench.timeQueries(spark, sf0001, queries, reps = 2)
    assert(errors === 0)
  }

  test("renderLine keeps slowest topK, rolls up the rest, and stays under budget") {
    val results = (1 to 130).map(i => s"q$i" -> i / 100.0).toMap
    val line = Bench.renderLine(results, errors = 0, sfDir = "/tmp/sf", topK = 40)
    assert(line.length <= Bench.LINE_BUDGET)
    assert(line.contains("\"errors\":0"))
    assert(line.contains("\"n_queries\":130"))
    // slowest query present, fastest rolled up
    assert(line.contains("\"q130\":1.3"))
    assert(!line.contains("\"q1\":"))
    assert(line.contains("\"rest\":{\"n\":90,\"sum\":"))
    // sanity: value field = sum of all timings
    val total = results.values.sum
    assert(line.contains(s""""value":${BigDecimal(total).setScale(3, BigDecimal.RoundingMode.HALF_UP)}"""))
  }

  test("renderLine surfaces a nonzero error count") {
    val line = Bench.renderLine(Map("a" -> 0.5), errors = 3, sfDir = "/tmp/sf")
    assert(line.contains("\"errors\":3"))
  }

  test("renderFull contains every query key") {
    val results = (1 to 130).map(i => s"q$i" -> i / 100.0).toMap
    val full = Bench.renderFull(results, errors = 0, sfDir = "/tmp/sf")
    (1 to 130).foreach(i => assert(full.contains("\"q" + i + "\":")))
  }
}
