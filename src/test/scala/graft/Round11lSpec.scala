package graft

import org.apache.spark.sql.functions._

/** Round-11 twelfth batch: Bollinger volatility bands and the
  * Gopher-style quality-rule battery — JVM replays over the raw
  * fixture plus the structural invariants (band edges symmetric about
  * the mean at exactly 2σ in micro space; rule-failure counts bound
  * the keep count from above). */
class Round11lSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  private def dsumL(xs: Iterable[Double]): Double =
    xs.map(x => math.rint(x * 1e6).toLong).sum / 1e6

  test("ts_bollinger: trailing-24h bands replicate JVM; edges sit at exactly 2 sigma in micro space") {
    val hourly = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("b"))
      .agg(round(Tables.dsum(col("value")), 6).as("x")).orderBy("b")
      .collect().map(r => (r.getTimestamp(0).toInstant.toEpochMilli * 1000L,
        r.getDouble(1)))
    val xk = hourly.map(t => (t._1, r6(t._2 / 1000.0)))
    def micro(x: Double): Long = math.rint(x * 1e6).toLong
    val want = xk.indices.filter(_ >= 23).map { i =>
      val w = (i - 23 to i).map(j => xk(j)._2)
      val sxM = w.map(micro).sum
      val sx = sxM / 1e6
      val sxx = w.map(x => micro(r6(x * x))).sum / 1e6
      val meanK = ((sxM + 12) / 24) / 1e6
      val mean = sx / 24.0
      val v = (sxx - sx * sx / 24.0) / 23.0
      val sigmaK = r6(math.sqrt(v))
      val z = r6((xk(i)._2 - mean) / math.sqrt(v))
      (xk(i)._1, xk(i)._2, meanK, sigmaK,
        (micro(meanK) + 2 * micro(sigmaK)) / 1e6,
        (micro(meanK) - 2 * micro(sigmaK)) / 1e6,
        z, math.abs(z) > 2.0)
    }.sortBy(t => (-math.abs(t._7), t._1)).take(20)
    val got = SparkEntry.queries("ts_bollinger")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getBoolean(7)))
    assert(got.toSeq == want)
    // structural: edges are exactly mean ± 2σ in micro space, and at
    // least one hour genuinely breaks out of its band on the fixture
    got.foreach { g =>
      assert(micro(g._5) - micro(g._3) == 2 * micro(g._4), s"upper edge: $g")
      assert(micro(g._3) - micro(g._6) == 2 * micro(g._4), s"lower edge: $g")
    }
    assert(got.exists(_._8), "no breakout fired on the fixture")
  }

  test("llm_gopher_rules: per-language rule battery replicates JVM; keep count consistent with failures") {
    val docs = Tables.documents(spark, sf0001)
      .select("lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val flagged = docs.map { case (lang, text, nChars) =>
      val w = text.split(" ", -1)
      val nw = w.length.toLong
      val meanWl = (nChars - nw + 1).toDouble / nw.toDouble
      val nStop = w.count(x => x == "the" || x == "a").toLong
      val ttr = w.distinct.length.toDouble / nw.toDouble
      (lang, nw >= 50 && nw <= 100000, meanWl >= 3.0 && meanWl <= 10.0,
        nStop >= 2, ttr >= 0.1)
    }
    val want = flagged.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, xs) =>
      val keep = xs.count(t => t._2 && t._3 && t._4 && t._5).toLong
      (lang, xs.length.toLong, xs.count(!_._2).toLong, xs.count(!_._3).toLong,
        xs.count(!_._4).toLong, xs.count(!_._5).toLong, keep,
        r6(keep.toDouble / xs.length.toDouble))
    }
    val got = SparkEntry.queries("llm_gopher_rules")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getDouble(7)))
    assert(got.toSeq == want)
    got.foreach { g =>
      // keep ≥ docs − Σ per-rule failures (inclusion–exclusion bound),
      // and the battery genuinely discriminates on the fixture
      assert(g._7 >= g._2 - (g._3 + g._4 + g._5 + g._6), s"bound: $g")
      assert(g._8 > 0.0 && g._8 < 1.0, s"degenerate battery on $g")
    }
  }
}
