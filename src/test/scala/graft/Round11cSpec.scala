package graft

import org.apache.spark.sql.functions._

/** Round-11 third batch: the classical-statistics family (Gini/Lorenz,
  * Benford, two-sample KS, Kaplan–Meier) — each replayed from first
  * principles in JVM over the raw fixture, plus the invariants the
  * statistic's definition promises (Lorenz endpoint, survival
  * monotonicity, KS bounds). */
class Round11cSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  private def dsumL(xs: Iterable[Double]): Double =
    xs.map(x => math.rint(x * 1e6).toLong).sum / 1e6

  test("stats_gini_lorenz: rank-sum Gini and decile Lorenz replicate a JVM sort") {
    val orders = Tables.orders(spark, sf0001)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val custs = Tables.customer(spark, sf0001).select("c_custkey")
      .collect().map(_.getLong(0))
    val revByCust = orders.groupBy(_._1)
      .map { case (k, xs) => k -> r6(dsumL(xs.map(_._2))) }
    val vs = custs.map(c => revByCust.getOrElse(c, 0.0)).sorted
    val n = vs.length
    val counts = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val t = dsumL(vs.distinct.map(v => r6(v * counts(v))))
    var cumC = 0L
    val sumIx = dsumL(vs.distinct.sorted.map { v =>
      val c = counts(v); cumC += c
      r6(v * (c * (cumC - c) + c * (c + 1) / 2).toDouble)
    })
    // tie-order invariance: the grouped closed form equals the naive
    // per-row rank sum up to per-term rounding granularity
    val naive = dsumL(vs.zipWithIndex.map { case (v, i) => r6(v * (i + 1)) })
    assert(math.abs(sumIx - naive) < 1e-3 * math.max(1.0, math.abs(naive)))
    val gini = r6(2.0 * sumIx / (n * t) - (n + 1).toDouble / n)
    val wantShares = (1 to 10).map { d =>
      val k = n * d / 10
      (d, k.toLong, r6(dsumL(vs.take(k)) / t))
    }
    val got = SparkEntry.queries("stats_gini_lorenz")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(x => (x._1, x._2, x._3)).toSeq == wantShares)
    got.foreach { x =>
      assert(x._4 == gini, s"gini ${x._4} vs $gini")
      assert(x._4 >= 0.0 && x._4 < 1.0)
    }
    assert(got.last._3 == 1.0, "decile 10 must hold all revenue")
    // Lorenz curve is convex-increasing: shares nondecreasing
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
  }

  test("stats_benford: digit histogram and chi-square replicate JVM counts") {
    val prices = Tables.orders(spark, sf0001).select("o_totalprice")
      .collect().map(_.getDouble(0))
    val byDigit = prices.map(p => math.floor(p).toLong.toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTot = prices.length.toLong
    val got = SparkEntry.queries("stats_benford")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val digits = got.map(_._1).toSeq
    assert(digits == digits.sorted && digits.toSet.subsetOf((1 to 9).toSet))
    assert(got.map(x => x._1 -> x._2).toMap == byDigit)
    assert(got.map(_._2).sum == nTot)
    val chi2 = r6(dsumL(got.map { x =>
      val exp = r6(nTot.toDouble * x._3)
      r6((x._2 - exp) * (x._2 - exp) / exp)
    }))
    got.foreach(x => assert(x._6 == chi2))
    // the nine probabilities sum to ~1 (they are log10(1+1/d) literals)
    assert(math.abs(dsumL(got.map(_._3)) - 1.0) < 1e-4)
  }

  test("stats_ks_test: D statistic equals the exact JVM ECDF max-gap") {
    val ev = Tables.events(spark, sf0001)
      .where(col("event_type").isin("click", "purchase"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r6(r.getDouble(1))))
    val clicks = ev.filter(_._1 == "click").map(_._2).sorted
    val purch = ev.filter(_._1 == "purchase").map(_._2).sorted
    val n1 = clicks.length.toLong; val n2 = purch.length.toLong
    val values = (clicks ++ purch).distinct.sorted
    val dNum = values.map { v =>
      val c1 = clicks.count(_ <= v).toLong
      val c2 = purch.count(_ <= v).toLong
      math.abs(c1 * n2 - c2 * n1)
    }.max
    val d = r6(dNum.toDouble / (n1 * n2))
    val row = SparkEntry.queries("stats_ks_test")(spark, sf0001).collect().head
    assert((row.getLong(0), row.getLong(1)) == ((n1, n2)))
    assert(row.getDouble(2) == d)
    val p = row.getDouble(3)
    assert(p > 0.0 && p <= 1.0)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
  }

  test("stats_kaplan_meier: product-limit curve replicates a JVM fold; survival non-increasing") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tMax = ev.map(_._2).max
    val users = ev.groupBy(_._1).values.map { xs =>
      val t0 = xs.map(_._2).min; val t1 = xs.map(_._2).max
      ((t1 - t0) / 3600000000L, t1 > tMax - 24L * 3600000000L)
    }.toSeq
    val nUsers = users.size.toLong
    val perT = users.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.count(!_._2).toLong, xs.size.toLong)
    }
    var cumBefore = 0L
    var logS = 0L // scaled-long decimal accumulator
    val want = perT.flatMap { case (t, d, cAll) =>
      val nRisk = nUsers - cumBefore
      cumBefore += cAll
      logS += math.rint(math.log(1.0 - d.toDouble / nRisk) * 1e6).toLong
      if (d >= 1) Some((t, nRisk, d, cAll - d, r6(math.exp(logS / 1e6))))
      else None
    }
    val got = SparkEntry.queries("stats_kaplan_meier")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
    val s = got.map(_._5)
    assert(s.zip(s.drop(1)).forall { case (a, b) => b <= a },
      "survival must be non-increasing")
    assert(s.forall(x => x > 0.0 && x <= 1.0))
  }
}
