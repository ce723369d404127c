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

  private lazy val docs: Array[(Long, String, String, String, Long)] =
    Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "source", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))

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

  test("graph_adamic_adar: top-20 scores replicate a JVM enumeration; pairs are non-adjacent with shared neighbors") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairsAll = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }
    val edges = pairsAll.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    val neigh = (edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).distinct.sorted }
    val scored = neigh.toSeq.flatMap { case (_, ns) =>
      val d = ns.length
      if (d < 2 || d > 256) Seq.empty
      else {
        val w = r6(1.0 / math.log(d.toDouble))
        for (i <- ns.indices; j <- i + 1 until ns.length)
          yield ((ns(i), ns(j)), w)
      }
    }.groupBy(_._1).map { case (p, xs) =>
      (p._1, p._2, xs.size.toLong, r6(dsumL(xs.map(_._2))))
    }.filter(t => !edges.contains((t._1, t._2))).toSeq
      .sortBy(t => (-t._4, t._1, t._2)).take(20)
    val got = SparkEntry.queries("graph_adamic_adar")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == scored, s"\n got ${got.toSeq}\nwant $scored")
    got.foreach { t =>
      assert(!edges.contains((t._1, t._2)), "a returned pair is adjacent")
      assert(t._3 >= 1, "a returned pair shares no neighbor")
    }
  }

  test("ml_avg_precision: step-interpolated AP replicates a JVM threshold sweep") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val scored = docs.map { d =>
      val z = -1.0 + -1.5 * (d._4.toDouble / 100.0) +
        1.2 * (d._3.split(" ", -1).length.toDouble / 10.0)
      (if (d._2 == "en") 1L else 0L, r6(1.0 / (1.0 + math.exp(-z))))
    }
    val perScore = scored.groupBy(_._2).toSeq
      .map { case (s, xs) => (s, xs.length.toLong, xs.map(_._1).sum) }
      .sortBy(-_._1)
    val pTot = perScore.map(_._3).sum
    val nTot = perScore.map(_._2).sum
    var cumPos = 0L; var cumN = 0L
    val ap = r6(dsumL(perScore.map { case (_, n, np) =>
      cumPos += np; cumN += n
      r6(np.toDouble * cumPos.toDouble / (pTot.toDouble * cumN.toDouble))
    }))
    val row = SparkEntry.queries("ml_avg_precision")(spark, sf0001)
      .collect().head
    assert((row.getLong(0), row.getLong(1)) == ((pTot, nTot - pTot)))
    assert(row.getDouble(2) == r6(pTot.toDouble / nTot.toDouble))
    assert(row.getDouble(3) == ap, s"AP ${row.getDouble(3)} vs $ap")
    assert(ap > 0.0 && ap <= 1.0)
    // Observed on the fixture: AP 0.361 < prevalence 0.386 — the
    // PR-view verdict that this model underperforms a random ranker on
    // the positive class even though its ROC AUC looks acceptable;
    // exactly the imbalance-sensitivity the metric exists to expose.
    // (No directional assertion: that is a model property, not an
    // operator property.)
  }

  test("ml_pca_power: matrix-free power iteration replicates a JVM pass; lambda is a non-decreasing Rayleigh estimate") {
    val xs = Tables.embeddings(spark, sf0001)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val n = xs.length
    val dDim = xs.head.length
    val mu = Array.tabulate(dDim)(d => r6(dsumL(xs.map(_(d))) / n))
    def matvec(v: Array[Double]): Array[Double] = {
      val acc = Array.fill(dDim)(0L)
      xs.foreach { x =>
        var s = 0.0
        var i = 0
        while (i < dDim) { s += (x(i) - mu(i)) * v(i); i += 1 }
        val sr = r6(s)
        var j = 0
        while (j < dDim) {
          acc(j) += math.rint(r6(sr * (x(j) - mu(j)) * 1024.0) * 1e6).toLong
          j += 1
        }
      }
      acc.map(a => r6(a / 1e6 / n))
    }
    def norm(y: Array[Double]): Double =
      r6(math.sqrt(dsumL(y.map(v => r6(v * v)))))
    val y1 = matvec(Array.fill(dDim)(0.125))
    val n1 = norm(y1)
    val v1 = y1.map(v => r6(v / n1))
    val y2 = matvec(v1)
    val n2 = norm(y2)
    val v2 = y2.map(v => r6(v / n2))
    val lambda = r6(n2 / 1024.0)
    val got = SparkEntry.queries("ml_pca_power")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == dDim)
    got.foreach { g =>
      assert(g._2 == mu(g._1), s"mu at dim ${g._1}")
      assert(g._3 == v1(g._1), s"v1 at dim ${g._1}")
      assert(g._4 == v2(g._1), s"v2 at dim ${g._1}")
      assert(g._5 == lambda)
    }
    // power iteration on a PSD operator: the norm estimate cannot drop
    assert(n2 >= n1 - 1e-3, s"pass-2 norm $n2 < pass-1 norm $n1")
    assert(lambda > 0.0)
    // v2 is unit-length up to round-6 quantization
    val v2n = math.sqrt(v2.map(v => v * v).sum)
    assert(math.abs(v2n - 1.0) < 1e-4)
  }

  test("stats_theil_decomposition: within/between replicate JVM; the decomposition identity holds") {
    val rows = Tables.orders(spark, sf0001).select("o_custkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val nat = Tables.customer(spark, sf0001).select("c_custkey", "c_nationkey")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val nName = Tables.nation(spark, sf0001).select("n_nationkey", "n_name")
      .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    val xs = rows.groupBy(_._1).toSeq.map { case (ck, os) =>
      (nName(nat(ck)), r6(dsumL(os.map(_._2))))
    }
    val xt = r6(dsumL(xs.map(_._2))); val n = xs.length.toLong
    val grp = xs.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, ys) =>
      val xg = r6(dsumL(ys.map(_._2))); val ng = ys.length.toLong
      val tg = r6(dsumL(ys.map { y =>
        r6((y._2 / xg) * r6(math.log(y._2 * ng / xg))) }))
      val bg = r6((xg / xt) * r6(math.log((xg / xt) * (n.toDouble / ng))))
      (g, ng, r6(xg / xt), tg, bg, r6((xg / xt) * tg))
    }
    val between = r6(dsumL(grp.map(_._5)))
    val within = r6(dsumL(grp.map(_._6)))
    val total = r6(dsumL(xs.map(y =>
      r6((y._2 / xt) * r6(math.log(y._2 * n / xt))))))
    val got = SparkEntry.queries("stats_theil_decomposition")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)).toSeq ==
      grp.map(g => (g._1, g._2, g._3, g._4, g._5)))
    got.foreach { g =>
      assert(g._6 == between && g._7 == within && g._8 == total)
      assert(g._4 >= -1e-5, "within-group Theil is a KL divergence (>= 0)")
    }
    assert(between >= -1e-5 && total >= -1e-5)
    // the decomposability Gini lacks: T = T_between + T_within (exact in
    // R, rounding-limited in round-6 space)
    assert(math.abs(total - (between + within)) < 1e-3,
      s"decomposition identity: $total vs ${between + within}")
  }

  test("stats_mann_kendall: S, tie-corrected variance and z replicate JVM") {
    val hourly = Tables.events(spark, sf0001)
      .select(unix_micros(date_trunc("hour", col("ts"))), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, xs) => r6(dsumL(xs.map(_._2))) }
    val n = hourly.length.toLong
    var s = 0L
    for (i <- hourly.indices; j <- i + 1 until hourly.length)
      s += java.lang.Double.compare(hourly(j), hourly(i)).sign
    val tieAdj = hourly.groupBy(identity).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
    val varS = r6((n * (n - 1) * (2 * n + 5) - tieAdj).toDouble / 18.0)
    val z = r6(if (s > 0) (s - 1).toDouble / math.sqrt(varS)
      else if (s < 0) (s + 1).toDouble / math.sqrt(varS) else 0.0)
    val row = SparkEntry.queries("stats_mann_kendall")(spark, sf0001)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((n, s, tieAdj)))
    assert(row.getDouble(3) == varS && row.getDouble(4) == z)
    val trend = if (z > 1.96) "increasing"
      else if (z < -1.96) "decreasing" else "none"
    assert(row.getString(5) == trend)
  }

  test("stats_chi2_independence: contingency chi2 and Cramer's V replicate JVM") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), hour(col("ts"))).collect()
      .map(r => (r.getString(0), r.getInt(1)))
    val cells = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ro = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val co = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTot = ev.length.toLong
    val chi2 = r6(dsumL(cells.toSeq.map { case ((t, h), o) =>
      val e = ro(t).toDouble * co(h).toDouble / nTot.toDouble
      r6((o - e) * (o - e) / e)
    }))
    val r = ro.size.toLong; val c = co.size.toLong
    val v = r6(math.sqrt(chi2 / (nTot.toDouble * math.min(r - 1, c - 1))))
    val row = SparkEntry.queries("stats_chi2_independence")(spark, sf0001)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((nTot, r, c, (r - 1) * (c - 1))))
    assert(row.getDouble(4) == chi2 && row.getDouble(5) == v)
  }

  test("stats_poisson_bootstrap: replica means replicate the h48 draws; CI is ordered") {
    val ev = Tables.events(spark, sf0001)
      .where(col("event_type") === "purchase")
      .select("event_id", "value").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val cs = { // the frozen round-12 thresholds, rebuilt independently
      var fact = 1.0; var cum = 0.0
      (0 to 7).map { k =>
        if (k > 0) fact *= k
        cum += 1.0 / fact
        BigDecimal(cum * math.exp(-1.0))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    val reps = (0 until 32).map { b =>
      val ws = ev.map { case (id, v) =>
        val u = (Tables.h48jvm(s"$id:$b") + 0.5) / 281474976710656.0
        (cs.count(c => u > c).toLong, v)
      }
      val nEff = ws.map(_._1).sum
      (b, nEff, r6(dsumL(ws.map(w => r6(w._1 * w._2))) / nEff))
    }
    val sorted = reps.sortBy(t => (t._3, t._1)).map(_._3)
    val ciLo = sorted(1); val ciHi = sorted(30)
    val meanFull = r6(dsumL(ev.map(_._2)) / ev.length)
    val got = SparkEntry.queries("stats_poisson_bootstrap")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.map(g => (g._1, g._2, g._3)).toSeq == reps)
    got.foreach { g =>
      assert(g._4 == meanFull && g._5 == ciLo && g._6 == ciHi)
    }
    assert(ciLo < ciHi)
    // Poisson(1) total weight concentrates at n (±4σ = ±4√n)
    val nTot = ev.length.toLong
    reps.foreach { r =>
      assert(math.abs(r._2 - nTot) <= 4 * math.sqrt(nTot.toDouble) + 1,
        s"replica ${r._1} weight ${r._2} far from $nTot")
    }
  }

  test("llm_lexical_diversity: per-language TTR/hapax/Herdan replicate a JVM vocabulary pass") {
    val docs = Tables.documents(spark, sf0001)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, xs) =>
      val toks = xs.flatMap(_._2.split(" ", -1))
      val counts = toks.groupBy(identity).view.mapValues(_.length).toMap
      val n = toks.length.toLong
      val v = counts.size.toLong
      val hapax = counts.count(_._2 == 1).toLong
      (lang, n, v, hapax, r6(v.toDouble / n), r6(hapax.toDouble / v),
        r6(r6(math.log(v.toDouble)) / r6(math.log(n.toDouble))),
        r6(v.toDouble / math.sqrt(n.toDouble)))
    }
    val got = SparkEntry.queries("llm_lexical_diversity")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
    got.foreach { g =>
      assert(g._4 <= g._3 && g._3 <= g._2, "hapax <= V <= N must hold")
      assert(g._5 > 0.0 && g._5 <= 1.0)
      assert(g._7 > 0.0 && g._7 < 1.0, "Herdan's C in (0,1) for V < N")
    }
  }

  test("ts_ohlc_hourly: candles replicate a JVM rollup; low <= open/close <= high") {
    val ev = Tables.events(spark, sf0001)
      .select(unix_micros(date_trunc("hour", col("ts"))), col("event_type"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val want = ev.groupBy(e => (e._1, e._2)).toSeq
      .sortBy(_._1).map { case ((b, t), xs) =>
        val open = xs.minBy(_._3)._4
        val close = xs.maxBy(_._3)._4
        val hi = xs.map(_._4).max; val lo = xs.map(_._4).min
        (b, t, open, hi, lo, close, xs.length.toLong,
          r6(dsumL(xs.map(_._4))), r6(hi - lo))
      }
    val got = SparkEntry.queries("ts_ohlc_hourly")(spark, sf0001)
      .select(unix_micros(col("bucket")), col("event_type"), col("open"),
        col("high"), col("low"), col("close"), col("n_events"), col("v_sum"),
        col("range"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6),
        r.getDouble(7), r.getDouble(8)))
    assert(got.toSeq == want)
    got.foreach { c =>
      assert(c._5 <= c._3 && c._3 <= c._4, "low <= open <= high")
      assert(c._5 <= c._6 && c._6 <= c._4, "low <= close <= high")
    }
  }

  test("agg_mode_top_user: deterministic mode replicates JVM max-by-(n, -uid)") {
    val ev = Tables.events(spark, sf0001)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val counts = xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val (u, n) = counts.toSeq.maxBy { case (uid, n) => (n, -uid) }
      (t, u, n, xs.length.toLong, r6(n.toDouble / xs.length))
    }
    val got = SparkEntry.queries("agg_mode_top_user")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
  }

  test("ts_dow_hour_profile: punch card replicates JVM; shares sum to 1") {
    val ev = Tables.events(spark, sf0001)
      .select(unix_micros(col("ts")), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    def cell(us: Long): (Int, Int) = {
      val sec = math.floorDiv(us, 1000000L)
      val days = math.floorDiv(sec, 86400L)
      val dow = ((days + 3) % 7 + 1).toInt // 1970-01-01 = Thursday = isodow 4
      val hr = (math.floorMod(sec, 86400L) / 3600L).toInt
      (dow, hr)
    }
    val nTot = ev.length.toLong
    val want = ev.groupBy(e => cell(e._1)).toSeq.sortBy(_._1).map {
      case ((dow, hr), xs) =>
        (dow, hr, xs.length.toLong, r6(dsumL(xs.map(_._2)) / xs.length),
          r6(dsumL(xs.map(_._2))), r6(xs.length.toDouble / nTot), dow >= 6)
    }
    val got = SparkEntry.queries("ts_dow_hour_profile")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(got.toSeq == want)
    assert(math.abs(dsumL(got.map(_._6)) - 1.0) < 1e-3, "shares must sum to 1")
  }

  test("ml_threshold_sweep: operating points replicate JVM; recall non-increasing in t") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val scored = docs.map { d =>
      val z = -1.0 + -1.5 * (d._4.toDouble / 100.0) +
        1.2 * (d._3.split(" ", -1).length.toDouble / 10.0)
      (if (d._2 == "en") 1L else 0L, r6(1.0 / (1.0 + math.exp(-z))))
    }
    val p = scored.map(_._1).sum
    val nTot = scored.length.toLong
    val want = (1 to 9).map { i =>
      val t = i.toDouble / 10.0
      val tp = scored.count(s => s._2 >= t && s._1 == 1).toLong
      val fp = scored.count(s => s._2 >= t && s._1 == 0).toLong
      (t, tp, fp, p - tp, nTot - p - fp,
        if (tp + fp > 0) Some(r6(tp.toDouble / (tp + fp))) else None,
        r6(tp.toDouble / p),
        if (tp > 0) Some(r6(2.0 * tp / (tp + fp + p))) else None,
        r6((tp + nTot - p - fp).toDouble / nTot))
    }
    val got = SparkEntry.queries("ml_threshold_sweep")(spark, sf0001)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getDouble(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7)), r.getDouble(8)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
    val recalls = got.map(_._7)
    assert(recalls.zip(recalls.drop(1)).forall { case (a, b) => b <= a },
      "recall must be non-increasing as the threshold rises")
    got.foreach(g => assert(g._2 + g._4 == p, "tp + fn must equal P"))
  }

  test("privacy_randomized_response: every coin replays via h48; debiased estimate beats raw") {
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val flips = ev.map { case (id, t) =>
      val y = if (t == "purchase") 1L else 0L
      val u = (Tables.h48jvm(s"rr:$id") + 0.5) / 281474976710656.0
      (y, if (u < 0.75) y else 1 - y)
    }
    val n = flips.length.toLong
    val nTrue = flips.map(_._1).sum
    val nRep = flips.map(_._2).sum
    val trueFrac = r6(nTrue.toDouble / n)
    val obsFrac = r6(nRep.toDouble / n)
    val est = r6((obsFrac - 0.25) / 0.5)
    val row = SparkEntry.queries("privacy_randomized_response")(spark, sf0001)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(3)) == ((n, nTrue, nRep)))
    assert(row.getDouble(2) == trueFrac && row.getDouble(4) == obsFrac)
    assert(row.getDouble(5) == est)
    assert(row.getDouble(6) == r6(math.abs(est - trueFrac)))
    // the inversion must recover the truth better than the raw noised
    // rate does (the mechanism's whole point)
    assert(math.abs(est - trueFrac) < math.abs(obsFrac - trueFrac))
    assert(row.getDouble(7) == r6(math.log(3.0)))
  }

  test("stats_hill_tail: top-201 order statistics replicate; alpha positive") {
    val xs = Tables.orders(spark, sf0001)
      .select("o_totalprice", "o_orderkey").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(t => (-t._1, t._2))
    val top = xs.take(201)
    val thr = top.last._1
    val mle = r6(dsumL(top.take(200).map(t => r6(math.log(t._1 / thr)))) / 200.0)
    val row = SparkEntry.queries("stats_hill_tail")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == 200L)
    assert(row.getDouble(1) == thr)
    assert(row.getDouble(2) == mle)
    assert(row.getDouble(3) == r6(1.0 / mle))
    assert(row.getDouble(3) > 0.0, "tail exponent must be positive")
  }

  test("ml_feature_stats: per-dim moments replicate a JVM raw-sums pass in x8 space") {
    val xs = Tables.embeddings(spark, sf0001)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val n = xs.length
    val got = SparkEntry.queries("ml_feature_stats")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getBoolean(8)))
    assert(got.length == xs.head.length)
    got.foreach { g =>
      val d = g._1
      val v8 = xs.map(_(d) * 8.0)
      val m = dsumL(v8) / n
      val r2 = dsumL(v8.map(x => r6(x * x))) / n
      val r3 = dsumL(v8.map(x => r6(x * x * x))) / n
      val r4 = dsumL(v8.map(x => r6(x * x * x * x))) / n
      val std8 = math.sqrt(math.max(r2 - m * m, 0.0))
      val m3 = r3 - 3.0 * m * r2 + 2.0 * m * m * m
      val m4 = r4 - 4.0 * m * r3 + 6.0 * m * m * r2 - 3.0 * m * m * m * m
      assert(g._2 == n.toLong)
      assert(g._3 == r6(m / 8.0), s"mean dim $d")
      assert(g._4 == r6(std8 / 8.0), s"std dim $d")
      assert(g._5 == r6(v8.min / 8.0) && g._6 == r6(v8.max / 8.0))
      assert(g._7 == r6(m3 / (std8 * std8 * std8)), s"skew dim $d")
      assert(g._8 == r6(m4 / (std8 * std8 * std8 * std8) - 3.0), s"kurt dim $d")
      assert(g._9 == (std8 / 8.0 < 0.001))
      assert(g._5 <= g._3 && g._3 <= g._6, "min <= mean <= max")
    }
  }

  test("win_activity_streaks: islands replicate JVM; streaks are genuinely consecutive") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"),
        expr("unix_micros(date_trunc('day', ts)) div 86400000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val streaks = ev.groupBy(_._1).toSeq.flatMap { case (u, ds) =>
      val days = ds.map(_._2).sorted
      val runs = days.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, d) => acc match {
          case (len, st, en) :: tl if d == en + 1 => (len + 1, st, d) :: tl
          case _ => (1L, d, d) :: acc
        }
      }
      runs.map { case (len, st, en) => (u, len, st, en) }
    }
    val want = streaks.sortBy(t => (-t._2, t._1, t._3)).take(20)
    val got = SparkEntry.queries("win_activity_streaks")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
    got.foreach(s => assert(s._4 - s._3 + 1 == s._2,
      "streak length must equal its day span"))
  }

  test("llm_containment_dedup: top-20 replicates JVM; the partial-copy verdict is sound") {
    val slice = docs.filter(_._1 < 100)
    val ws = slice.map(d => d._1 -> d._4.split(" ", -1).distinct.toSet).toMap
    val ids = slice.map(_._1).sorted
    val all = for {
      i <- ids.indices; j <- i + 1 until ids.length
      a = ws(ids(i)); b = ws(ids(j))
      inter = (a & b).size.toLong
      if inter >= 1
    } yield {
      val (s1, s2) = (a.size.toLong, b.size.toLong)
      (ids(i), ids(j), inter, s1, s2,
        r6(inter.toDouble / math.min(s1, s2)),
        r6(inter.toDouble / s1), r6(inter.toDouble / s2),
        r6(inter.toDouble / (s1 + s2 - inter)))
    }
    val want = all.sortBy(t => (-t._6, t._1, t._2)).take(20)
      .map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9,
        t._6 >= 0.9 && t._9 < 0.9))
    val got = SparkEntry.queries("llm_containment_dedup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8), r.getBoolean(9)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
    // the miss class is real on this corpus: the top of the containment
    // ranking includes pairs symmetric >=0.9-Jaccard dedup cannot see
    assert(got.exists(_._10), "expected at least one partial-copy pair")
    got.filter(_._10).foreach { t =>
      assert(t._6 >= 0.9 && t._9 < 0.9)
    }
  }

  test("ts_open_orders_curve: sweep replicates JVM; curve non-negative with one peak level") {
    val op = Tables.orders(spark, sf0001)
      .select(expr("unix_micros(date_trunc('day', o_orderdate)) div 86400000000"))
      .collect().map(_.getLong(0))
    val cl = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"),
        expr("unix_micros(date_trunc('day', l_shipdate)) div 86400000000"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map(_._2.map(_._2).max).toSeq
    val lo = (op ++ cl).min; val hi = (op ++ cl).max
    val opened = op.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val closed = cl.groupBy(identity).view.mapValues(_.length.toLong).toMap
    var run = 0L
    val want = (lo to hi).map { d =>
      val o = opened.getOrElse(d, 0L); val c = closed.getOrElse(d, 0L)
      run += o - c
      (d, o, c, run)
    }
    val peak = want.map(_._4).max
    val got = SparkEntry.queries("ts_open_orders_curve")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got.map(g => (g._1, g._2, g._3, g._4)).toSeq == want)
    got.foreach { g =>
      assert(g._4 >= 0, "an order cannot close before it opens")
      assert(g._5 == (g._4 == peak))
    }
    assert(got.last._4 == op.length - cl.length,
      "end-of-horizon open count must equal opened minus closed")
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
