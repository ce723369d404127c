package graft

import org.apache.spark.sql.functions._

/** Round-11 fifteenth batch: Wilcoxon signed-rank paired test and the
  * Murphy decomposition of the Brier score — JVM replays plus the
  * identities the definitions promise (signed-rank W⁺ + W⁻ covers all
  * ranks; Brier of a perfect forecaster is 0 and the decomposition is
  * exact when forecasts are bin-constant). */
class Round11oSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  private def dsumL(xs: Iterable[Double]): Double =
    xs.map(x => math.rint(x * 1e6).toLong).sum / 1e6

  test("stats_wilcoxon_signed_rank: doubled midranks replicate JVM; rank mass conserves") {
    val daily = Tables.events(spark, sf0001)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(round(Tables.dsum(when(col("event_type") === "click",
        col("value"))), 6).as("xc"),
        round(Tables.dsum(when(col("event_type") === "purchase",
          col("value"))), 6).as("xp"))
      .collect().map(r => (Option(r.get(1)).map(_ => r.getDouble(1)),
        Option(r.get(2)).map(_ => r.getDouble(2))))
    def micro(x: Double): Long = math.rint(x * 1e6).toLong
    val ds = daily.collect { case (Some(c), Some(p)) =>
      (micro(c) - micro(p)) / 1e6
    }.filter(_ != 0.0)
    val byAd = ds.map(math.abs).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val sorted = byAd.toSeq.sortBy(_._1)
    val r2 = {
      var cum = 0L
      sorted.map { case (ad, c) =>
        val r = 2L * cum + c + 1L; cum += c; ad -> r
      }.toMap
    }
    val n = ds.length.toLong
    val w2p = ds.filter(_ > 0).map(d => r2(math.abs(d))).sum
    val w2m = ds.filter(_ < 0).map(d => r2(math.abs(d))).sum
    val tAdj = byAd.values.map(c => c * c * c - c).sum
    val mu2 = n * (n + 1) / 2
    val nd = n.toDouble
    val z = r6((w2p - mu2).toDouble /
      math.sqrt(nd * (nd + 1.0) * (2.0 * nd + 1.0) / 6.0 - tAdj / 12.0))
    val row = SparkEntry.queries("stats_wilcoxon_signed_rank")(spark, sf0001)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == ((n, w2p, mu2, tAdj)))
    assert(row.getDouble(4) == z)
    assert(row.getBoolean(5) == (math.abs(z) > 1.96))
    // rank-mass conservation: W₂⁺ + W₂⁻ = Σ all doubled ranks = n(n+1)
    assert(w2p + w2m == n * (n + 1), s"rank mass: $w2p + $w2m != ${n * (n + 1)}")
    assert(n >= 10, s"too few pairs ($n) for the normal approximation story")
  }

  private def sigmoid6(nc: Long, nw: Int): Double = {
    val z = -1.0 + -1.5 * (nc.toDouble / 100.0) + 1.2 * (nw.toDouble / 10.0)
    r6(1.0 / (1.0 + math.exp(-z)))
  }

  test("ml_brier_decomposition: components replicate JVM; perfect/bin-constant kernels hit the identities") {
    val docs = Tables.documents(spark, sf0001)
      .select("lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val scored = docs.map { case (lang, text, nc) =>
      (sigmoid6(nc, text.split(" ", -1).length),
        if (lang == "en") 1L else 0L) }
    def decompose(sc: Seq[(Double, Long)])
        : (Long, Double, Double, Double, Double, Double, Double) = {
      val n = sc.length.toLong
      val brier = r6(dsumL(sc.map { case (s, y) => r6((s - y) * (s - y)) }) / n)
      val ybar = r6(sc.map(_._2).sum.toDouble / n)
      val bins = sc.groupBy(t => math.min(math.floor(t._1 * 10).toLong, 9L))
      val rel = r6(dsumL(bins.values.map { xs =>
        val sb = r6(dsumL(xs.map(_._1)) / xs.length)
        val yb = r6(xs.map(_._2).sum.toDouble / xs.length)
        r6(xs.length.toDouble * (sb - yb) * (sb - yb))
      }) / n)
      val res = r6(dsumL(bins.values.map { xs =>
        val yb = r6(xs.map(_._2).sum.toDouble / xs.length)
        r6(xs.length.toDouble * (yb - ybar) * (yb - ybar))
      }) / n)
      val unc = r6(ybar * (1.0 - ybar))
      (n, brier, ybar, rel, res, unc, r6(brier - (rel - res + unc)))
    }
    val want = decompose(scored.toSeq)
    val row = SparkEntry.queries("ml_brier_decomposition")(spark, sf0001)
      .collect().head
    assert((row.getLong(0), row.getDouble(1), row.getDouble(2),
      row.getDouble(3), row.getDouble(4), row.getDouble(5),
      row.getDouble(6)) == want)
    // identities through the same kernel: a perfect forecaster has
    // brier 0; bin-constant forecasts make the decomposition EXACT
    val perfect = scored.map { case (_, y) => (y.toDouble, y) }
    assert(decompose(perfect.toSeq)._2 == 0.0)
    val binConst = scored.map { case (s, y) =>
      (math.min(math.floor(s * 10), 9.0) / 10.0 + 0.05, y) }
    val d = decompose(binConst.toSeq)
    assert(math.abs(d._7) < 1e-4, s"bin-constant gap not ~0: ${d._7}")
    // and the fixture's own gap is small relative to the score
    assert(math.abs(want._7) <= want._2, s"gap dominates brier: $want")
  }
}
