package graft

import org.apache.spark.sql.functions._

/** Round-11 fourth batch: Welch's t-test, one-way ANOVA, Spearman rank
  * correlation, pairwise Jensen–Shannon divergence — each replayed from
  * first principles in JVM over the raw fixture, plus the invariants the
  * statistic's definition promises (η² ∈ [0,1], |ρ| ≤ 1, JSD ∈ [0, ln 2],
  * SSB + SSW = SST). */
class Round11dSpec extends SparkTestBase {

  // Spark-faithful rounding: round() on doubles goes through the
  // shortest-decimal BigDecimal HALF_UP, which differs from
  // rint(x*1e6) exactly at decimal midpoints — and the JSD terms hit
  // one on this fixture
  private def rN(x: Double, n: Int): Double =
    BigDecimal.decimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r6(x: Double): Double = rN(x, 6)
  private def r2(x: Double): Double = rN(x, 2)
  private def micro(x: Double): Long =
    (BigDecimal.decimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
      BigDecimal(1000000)).toLongExact

  private def dsumL(xs: Iterable[Double]): Double = xs.map(micro).sum / 1e6

  test("stats_welch_ttest: t and Welch df replicate a JVM closed form") {
    val ev = Tables.events(spark, sf0001).select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def side(t: String) = {
      val v = ev.filter(_._1 == t).map(_._2)
      val n = v.length.toLong
      val s = r6(dsumL(v))
      val ss = r6(dsumL(v.map(x => r6(x * x))))
      val m = r6(s / n)
      val va = r6((ss - s * s / n) / (n - 1))
      (n, m, va)
    }
    val (n1, m1, v1) = side("click")
    val (n2, m2, v2) = side("purchase")
    val (vn1, vn2) = (r6(v1 / n1), r6(v2 / n2))
    val t = r6((m1 - m2) / math.sqrt(vn1 + vn2))
    val df = r6((vn1 + vn2) * (vn1 + vn2) /
      (vn1 * vn1 / (n1 - 1) + vn2 * vn2 / (n2 - 1)))
    val got = SparkEntry.queries("stats_welch_ttest")(spark, sf0001)
      .collect().head
    assert((got.getLong(0), got.getLong(1)) == ((n1, n2)))
    assert((got.getDouble(2), got.getDouble(3)) == ((m1, m2)))
    assert((got.getDouble(4), got.getDouble(5)) == ((v1, v2)))
    assert(got.getDouble(6) == t, s"t: ${got.getDouble(6)} != $t")
    assert(got.getDouble(7) == df)
    assert(got.getBoolean(8) == (math.abs(t) > 1.96))
    // Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
    assert(df >= math.min(n1, n2) - 1 && df <= n1 + n2 - 2)
  }

  test("stats_anova_f: scaled two-pass SSW/SSB replicate JVM; partition identity holds") {
    val os = Tables.orders(spark, sf0001).select("o_orderpriority", "o_totalprice")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val byP = os.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val sG = byP.view.mapValues(v => r6(dsumL(v))).toMap
    val meanG = byP.map { case (p, v) => p -> r2(sG(p) / v.length) }
    val n = os.length.toLong
    val k = byP.size.toLong
    val meanT = r2(dsumL(sG.values) / n)
    val sswM = os.map { case (p, x) =>
      val d = (x - meanG(p)) / 1000.0; micro(r6(d * d)) }.sum
    val sstM = os.map { case (_, x) =>
      val d = (x - meanT) / 1000.0; micro(r6(d * d)) }.sum
    val (ssw, ssb) = (sswM / 1e6, (sstM - sswM) / 1e6)
    val f = r6((ssb / (k - 1)) / (ssw / (n - k)))
    val eta = r6(ssb / (ssb + ssw))
    val got = SparkEntry.queries("stats_anova_f")(spark, sf0001).collect()
    assert(got.length == k)
    got.foreach { r =>
      assert(r.getLong(1) == byP(r.getString(0)).length.toLong)
      assert(r.getDouble(2) == meanG(r.getString(0)))
      assert(r.getDouble(3) == ssb && r.getDouble(4) == ssw)
      assert(r.getLong(5) == k - 1 && r.getLong(6) == n - k)
      assert(r.getDouble(7) == f && r.getDouble(8) == eta)
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0)
    }
  }

  test("stats_spearman: distinct-frame midranks replicate a JVM rank pass; |rho| <= 1") {
    val li = Tables.lineitem(spark, sf0001).select("l_quantity", "l_extendedprice")
      .collect().map(r => (r.getDouble(0), r6(r.getDouble(1))))
    val n = li.length.toLong
    def rankMap(vals: Seq[Double]): Map[Double, Double] = {
      val grouped = vals.groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      var cum = 0L
      grouped.map { case (v, c) =>
        cum += c
        v -> r6((2 * (cum - c) + c + 1).toDouble / (2 * n).toDouble)
      }.toMap
    }
    val rx = rankMap(li.map(_._1).toSeq)
    val ry = rankMap(li.map(_._2).toSeq)
    val pairs = li.map { case (q, v) => (rx(q), ry(v)) }
    val sx = r6(dsumL(pairs.map(_._1)))
    val sy = r6(dsumL(pairs.map(_._2)))
    val sxx = r6(dsumL(pairs.map(p => r6(p._1 * p._1))))
    val syy = r6(dsumL(pairs.map(p => r6(p._2 * p._2))))
    val sxy = r6(dsumL(pairs.map(p => r6(p._1 * p._2))))
    val rho = r6((n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
    val got = SparkEntry.queries("stats_spearman")(spark, sf0001).collect().head
    assert(got.getLong(0) == n)
    assert(got.getDouble(1) == rho, s"${got.getDouble(1)} != $rho")
    // the synthetic fixture draws price independently of quantity, so the
    // statistic's VALUE is near zero — the replay above is the real gate;
    // the definitional bound is all the data promises
    assert(math.abs(rho) <= 1.0)
  }

  test("stats_kruskal_wallis: doubled-midrank H replicates JVM; tie correction in (0,1]") {
    val ev = Tables.events(spark, sf0001).select("event_type", "value")
      .collect().map(r => (r.getString(0), r6(r.getDouble(1))))
    val byV = ev.map(_._2).groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var cum = 0L
    val r2map = byV.map { case (v, c) =>
      cum += c; v -> (2 * (cum - c) + c + 1)
    }.toMap
    val n = ev.length.toLong
    val grp = ev.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.map(x => BigInt(r2map(x._2))).sum.toDouble)
    }.toMap
    val k = grp.size.toLong
    val sumS = r6(grp.values.map { case (ng, s2) =>
      val u = s2 / (2.0 * n * ng)
      BigDecimal.decimal(r6(u * u * ng))
    }.sum.toDouble)
    val h = 12.0 * n / (n + 1.0) * sumS - 3.0 * (n + 1.0)
    val tAdj = byV.map { case (_, c) => BigInt(c) * BigInt(c) * BigInt(c) - c }
      .sum.toDouble
    val tieC = 1.0 - tAdj / (n.toDouble * n * n - n)
    val got = SparkEntry.queries("stats_kruskal_wallis")(spark, sf0001)
      .collect().head
    assert(got.getLong(0) == n && got.getLong(1) == k)
    assert(got.getDouble(2) == r6(h), s"${got.getDouble(2)} != ${r6(h)}")
    assert(got.getDouble(3) == r6(tieC))
    assert(got.getDouble(4) == r6(h / tieC))
    assert(got.getLong(5) == k - 1)
    assert(got.getDouble(3) > 0.0 && got.getDouble(3) <= 1.0)
  }

  test("stats_brown_forsythe: median-centered W replicates JVM") {
    val os = Tables.orders(spark, sf0001).select("o_orderpriority", "o_totalprice")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def quantile(v: Seq[Double], p: Double): Double = {
      val s = v.sorted
      val rank = (s.length - 1) * p
      val lo = math.floor(rank).toInt; val hi = math.ceil(rank).toInt
      s(lo) + (rank - lo) * (s(hi) - s(lo))
    }
    val med = os.groupBy(_._1).view.mapValues(v =>
      r2(quantile(v.map(_._2).toSeq, 0.5))).toMap
    val z = os.map { case (p, y) => (p, math.abs(y - med(p))) }
    val sG = z.groupBy(_._1).view.mapValues(v => r6(dsumL(v.map(_._2)))).toMap
    val meanG = z.groupBy(_._1).view.map { case (p, v) =>
      p -> r2(sG(p) / v.length) }.toMap
    val n = z.length.toLong; val k = meanG.size.toLong
    val meanT = r2(dsumL(sG.values) / n)
    val sswM = z.map { case (p, x) =>
      val d = (x - meanG(p)) / 1000.0; micro(r6(d * d)) }.sum
    val sstM = z.map { case (_, x) =>
      val d = (x - meanT) / 1000.0; micro(r6(d * d)) }.sum
    val (ssw, ssb) = (sswM / 1e6, (sstM - sswM) / 1e6)
    val w = r6((ssb / (k - 1)) / (ssw / (n - k)))
    val got = SparkEntry.queries("stats_brown_forsythe")(spark, sf0001)
      .collect()
    assert(got.length == k)
    got.foreach { r =>
      val p = r.getString(0)
      assert(r.getLong(1) == z.count(_._1 == p).toLong)
      assert(r.getDouble(2) == med(p) && r.getDouble(3) == meanG(p))
      assert(r.getLong(4) == k - 1 && r.getLong(5) == n - k)
      assert(r.getDouble(6) == w, s"${r.getDouble(6)} != $w")
    }
  }

  test("stats_durbin_watson: residual autocorrelation replicates JVM; DW in [0,4]") {
    val hourly = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("b"))
      .agg(round(Tables.dsum(col("value")), 6).as("y")).orderBy("b")
      .collect().map(_.getDouble(1))
    val n = hourly.length.toDouble
    val t = hourly.indices.map(_.toDouble)
    val sx = r6(dsumL(t)); val sy = r6(dsumL(hourly))
    val sxx = r6(dsumL(t.map(x => x * x)))
    val sxy = t.zip(hourly).map { case (x, y) =>
      (BigDecimal.decimal(r6(x * y)) * BigDecimal(1000000)).toLongExact
    }.sum / 1e6
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val e = t.zip(hourly).map { case (x, y) => r6(y - (icept + slope * x)) }
    val de = e.sliding(2).map(p => p(1) - p(0)).toSeq
    val dw = r6(dsumL(de.map(d => r6(d * d))) / dsumL(e.map(x => r6(x * x))))
    val got = SparkEntry.queries("stats_durbin_watson")(spark, sf0001)
      .collect().head
    assert(got.getLong(0) == hourly.length.toLong)
    assert(got.getDouble(1) == r6(slope) && got.getDouble(2) == r6(icept))
    assert(got.getDouble(3) == dw, s"${got.getDouble(3)} != $dw")
    assert(dw >= 0.0 && dw <= 4.0)
    val verdict = if (dw < 1.5) "positive_autocorr"
      else if (dw > 2.5) "negative_autocorr" else "none"
    assert(got.getString(4) == verdict)
  }

  test("stats_friedman: within-day doubled midranks replicate JVM; rank-sum identity holds") {
    val daily = Tables.events(spark, sf0001)
      .groupBy(expr("unix_micros(date_trunc('day', ts)) div 86400000000")
        .as("day"), col("event_type"))
      .agg(round(Tables.dsum(col("value")), 6).as("r"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val k = daily.map(_._2).distinct.length
    val complete = daily.groupBy(_._1).filter(_._2.length == k)
    val b = complete.size.toLong
    val s2 = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    complete.values.foreach { rows =>
      val sorted = rows.sortBy(_._3)
      rows.foreach { case (_, t, v) =>
        val rk = sorted.indexWhere(_._3 == v) + 1 // rank() = first position
        val ties = rows.count(_._3 == v)
        s2(t) += 2L * rk + ties - 1
      }
    }
    val sumRr = r6(s2.values.map { x =>
      val rj = x / 2.0
      BigDecimal.decimal(r6(rj * rj / (b * k * (k + 1.0))))
    }.sum.toDouble)
    val chi2 = r6(12.0 * sumRr - 3.0 * b * (k + 1.0))
    val got = SparkEntry.queries("stats_friedman")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5), r.getBoolean(6)))
    assert(got.length == k)
    got.foreach { g =>
      assert(g._2 == b)
      assert(g._3 == s2(g._1) / 2.0, s"R_j ${g._3} != ${s2(g._1) / 2.0}")
      assert(g._4 == r6(g._3 / b))
      assert(g._5 == chi2, s"chi2 ${g._5} != $chi2")
      assert(g._6 == k - 1)
    }
    // within-block ranks must sum to k(k+1)/2 per block: Σ R_j = b·k(k+1)/2
    assert(got.map(_._3).sum == b * k * (k + 1) / 2.0)
  }

  test("stats_runs_test: run count and z replicate JVM; runs within [1, n]") {
    val hourly = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("b"))
      .agg(round(Tables.dsum(col("value")), 6).as("y")).orderBy("b")
      .collect().map(_.getDouble(1))
    val n = hourly.length.toDouble
    val t = hourly.indices.map(_.toDouble)
    val sx = r6(dsumL(t)); val sy = r6(dsumL(hourly))
    val sxx = r6(dsumL(t.map(x => x * x)))
    val sxy = t.zip(hourly).map { case (x, y) => micro(r6(x * y)) }.sum / 1e6
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val pos = t.zip(hourly).map { case (x, y) =>
      r6(y - (icept + slope * x)) >= 0 }
    val nPos = pos.count(identity).toLong
    val nNeg = pos.length - nPos
    val nRuns = 1L + pos.sliding(2).count(p => p(0) != p(1))
    val (p, q) = (nPos.toDouble, nNeg.toDouble)
    val mu = 2.0 * p * q / n + 1.0
    val z = r6((nRuns - mu) / math.sqrt(2.0 * p * q * (2.0 * p * q - n) /
      (n * n * (n - 1.0))))
    val got = SparkEntry.queries("stats_runs_test")(spark, sf0001)
      .collect().head
    assert(got.getLong(0) == hourly.length.toLong)
    assert(got.getLong(1) == nPos && got.getLong(2) == nNeg)
    assert(got.getLong(3) == nRuns, s"runs ${got.getLong(3)} != $nRuns")
    assert(got.getDouble(4) == r6(mu))
    assert(got.getDouble(5) == z, s"z ${got.getDouble(5)} != $z")
    assert(got.getBoolean(6) == (math.abs(z) <= 1.96))
    assert(nRuns >= 1 && nRuns <= hourly.length)
  }

  test("stats_jsd_sources: smoothed-profile JSD replicates JVM; bounded by ln 2") {
    val docs = Tables.documents(spark, sf0001).select("source", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val langs = docs.map(_._2).distinct.sorted
    val srcs = docs.map(_._1).distinct.sorted
    val tot = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cnt = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val p = (for { s <- srcs; l <- langs } yield (s, l) ->
      r6((cnt.getOrElse((s, l), 0L) + 1).toDouble / (tot(s) + langs.length)))
      .toMap
    val all = for {
      i <- srcs.indices; j <- i + 1 until srcs.length
    } yield {
      val m = langs.map { l =>
        val (pa, pb) = (p((srcs(i), l)), p((srcs(j), l)))
        val ta = r6(pa * r6(math.log(2.0 * pa / (pa + pb))))
        val tb = r6(pb * r6(math.log(2.0 * pb / (pa + pb))))
        micro(ta) + micro(tb)
      }.sum
      (srcs(i), srcs(j), ((m + 1) / 2).toDouble / 1e6)
    }
    val want = all.sortBy(t => (-t._3, t._1, t._2)).take(20)
    val got = SparkEntry.queries("stats_jsd_sources")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
    got.foreach { t =>
      assert(t._3 >= 0.0 && t._3 <= math.log(2.0) + 1e-9,
        s"JSD out of [0, ln 2]: $t")
    }
  }
}
