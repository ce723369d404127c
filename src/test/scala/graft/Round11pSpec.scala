package graft

import org.apache.spark.sql.functions._

/** Round-11 sixteenth batch: Cohen's d / Hedges' g effect sizes and
  * the cohort LTV curve — JVM replays plus the definitional fixed
  * points (g shrinks d toward zero; LTV is non-decreasing in age and
  * age-0 LTV times headcount equals age-0 cumulative revenue). */
class Round11pSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  private def dsumL(xs: Iterable[Double]): Double =
    xs.map(x => math.rint(x * 1e6).toLong).sum / 1e6

  test("stats_cohens_d: effect size replicates JVM; g strictly shrinks d; magnitude label consistent") {
    val ev = Tables.events(spark, sf0001)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def side(t: String) = {
      val xs = ev.filter(_._1 == t).map(_._2)
      val n = xs.length.toLong
      val s = r6(dsumL(xs))
      val ss = r6(dsumL(xs.map(x => r6(x * x))))
      (n, s, ss)
    }
    val (n1, s1, ss1) = side("click"); val (n2, s2, ss2) = side("purchase")
    val m1 = r6(s1 / n1); val m2 = r6(s2 / n2)
    val v1 = r6((ss1 - s1 * s1 / n1) / (n1 - 1.0))
    val v2 = r6((ss2 - s2 * s2 / n2) / (n2 - 1.0))
    val pooledRaw = math.sqrt(((n1 - 1.0) * v1 + (n2 - 1.0) * v2) /
      (n1 + n2 - 2.0))
    val d = r6((m1 - m2) / pooledRaw)
    val g = r6((m1 - m2) / pooledRaw *
      (1.0 - 3.0 / (4.0 * (n1 + n2) - 9.0)))
    val mag = if (math.abs(d) < 0.2) "negligible"
      else if (math.abs(d) < 0.5) "small"
      else if (math.abs(d) < 0.8) "medium" else "large"
    val row = SparkEntry.queries("stats_cohens_d")(spark, sf0001)
      .collect().head
    assert((row.getLong(0), row.getLong(1)) == ((n1, n2)))
    assert((row.getDouble(2), row.getDouble(3)) == ((m1, m2)))
    assert((row.getDouble(4), row.getDouble(5)) == ((v1, v2)))
    assert(row.getDouble(6) == r6(pooledRaw))
    assert(row.getDouble(7) == d && row.getDouble(8) == g)
    assert(row.getString(9) == mag)
    // Hedges' correction strictly shrinks toward zero (and keeps sign)
    assert(math.abs(g) < math.abs(d) && g.sign == d.sign)
  }

  test("cohort_revenue_ltv: curve replicates JVM; LTV non-decreasing within cohort") {
    val om = Tables.orders(spark, sf0001)
      .select(trunc(col("o_orderdate").cast("date"), "month").cast("string"),
        col("o_custkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    def mIdx(s: String): Long =
      s.substring(0, 4).toLong * 12 + s.substring(5, 7).toLong
    val m0 = om.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val sizes = m0.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    def micro(x: Double): Long = math.rint(x * 1e6).toLong
    val cells = om.groupBy(t => (m0(t._2), mIdx(t._1) - mIdx(m0(t._2))))
      .toSeq.map { case ((c, age), xs) =>
        (c, age, xs.length.toLong,
          r6(xs.map(x => micro(x._3)).sum / 1e6 / 1e3))
      }.sortBy(t => (t._1, t._2))
    val want = cells.groupBy(_._1).toSeq.flatMap { case (c, rows) =>
      var cumM = 0L
      rows.sortBy(_._2).map { case (_, age, nOrd, revK) =>
        cumM += micro(revK)
        val n = sizes(c)
        (c.substring(0, 7), age, n, nOrd, revK, cumM / 1e6,
          ((2 * cumM + n) / (2 * n)) / 1e6)
      }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("cohort_revenue_ltv")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == want)
    // LTV never decreases with age inside a cohort (revenue is positive)
    got.groupBy(_._1).foreach { case (c, rows) =>
      val ltv = rows.sortBy(_._2).map(_._7)
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a },
        s"LTV dips in cohort $c")
    }
    // age-0 sanity: every cohort has an age-0 row (its birth month)
    assert(got.groupBy(_._1).forall(_._2.exists(_._2 == 0L)))
  }
}
