package graft

import org.apache.spark.sql.functions._

/** Round-11 nineteenth batch: forward as-of join and the Schuster
  * periodogram — JVM replays plus the definitional anchors (forward
  * as-of waits are non-negative and agree with a brute next-purchase
  * scan; Parseval-flavored power mass is positive and the DC-free
  * spectrum detects a planted cycle exactly). */
class Round11sSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("join_asof_next_purchase: forward lookup replicates a brute per-user scan") {
    val ev = Tables.events(spark, sf0001)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val byUser = ev.groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._3, t._2))).toMap
    val want = byUser.values.flatMap { seq =>
      seq.zipWithIndex.collect { case ((u, id, ts, "click"), i) =>
        val nxt = seq.drop(i).find(_._4 == "purchase")
        (u, id, nxt.map(_._2), nxt.map(_._3 - ts))
      }
    }.toSeq.sortBy(_._2)
    val got = SparkEntry.queries("join_asof_next_purchase")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == want)
    // waits are non-negative; matched and unmatched clicks both occur
    got.foreach(g => g._4.foreach(w => assert(w >= 0, s"negative wait: $g")))
    assert(got.exists(_._3.isDefined) && got.exists(_._3.isEmpty),
      "fixture lacks one of matched/unmatched clicks")
  }

  test("ts_periodogram: integer-micro spectrum replicates JVM; planted cycle detected through the same kernel") {
    val hourly = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("b"))
      .agg(round(Tables.dsum(col("value")), 6).as("x")).orderBy("b")
      .collect().map(_.getDouble(1))
    def micro(x: Double): Long = math.rint(x * 1e6).toLong
    def halfUp(p: Long): Long =
      if (p >= 0) (p + 500000L) / 1000000L else -((-p + 500000L) / 1000000L)
    def spectrum(xs: Array[Double]): Seq[(Long, Double, Double, Double)] = {
      val n = xs.length.toDouble
      (1L to 12L).map { k =>
        var ca = 0L; var sb = 0L
        xs.zipWithIndex.foreach { case (x, t) =>
          val th = 2.0 * math.Pi * k * t / n
          val cm = (BigDecimal.valueOf(r6hu(math.cos(th))) *
            BigDecimal(1000000)).toLongExact
          val sm = (BigDecimal.valueOf(r6hu(math.sin(th))) *
            BigDecimal(1000000)).toLongExact
          val xmv = (BigDecimal.valueOf(x) * BigDecimal(1000000)).toLongExact
          ca += halfUp(xmv * cm); sb += halfUp(xmv * sm)
        }
        val a = r6(ca / 1e6); val b = r6(sb / 1e6)
        (k, a, b, r6((a * a + b * b) / n))
      }
    }
    def r6hu(x: Double): Double =
      BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val want = spectrum(hourly)
    val n = hourly.length.toDouble
    val maxP = want.map(_._4).max
    val wantRows = want.map(t => (t._1, t._2, t._3, t._4, r6(n / t._1),
      t._4 == maxP))
    val got = SparkEntry.queries("ts_periodogram")(spark, sf0001)
      .collect().map(r => (r.getInt(0).toLong, r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(got.toSeq == wantRows)
    assert(got.count(_._6) >= 1)
    got.foreach(g => assert(g._4 >= 0.0))
    // kernel detection fixed point: a pure k=3 cosine of dyadic
    // amplitude concentrates its power at k=3 through the same kernel
    val m = 96
    val planted = Array.tabulate(m)(t =>
      r6(100.0 + 25.0 * math.cos(2.0 * math.Pi * 3 * t / m)))
    val sp = spectrum(planted)
    assert(sp.maxBy(_._4)._1 == 3L, s"planted cycle missed: $sp")
  }
}
