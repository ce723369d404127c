package graft

import org.apache.spark.sql.functions._

/** Round-11 second batch: EWMA/OLS/MAD statistics, the graph trio
  * (HITS, k-core, degree histogram), χ² term selection, Zipf fit,
  * Fellegi–Sunter linkage scoring, and the Z-order pruning audit —
  * each replayed from first principles in JVM over the raw fixture. */
class Round11bSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  private lazy val events: Array[(String, Long, Double)] =
    Tables.events(spark, sf0001)
      .select(col("event_type"), unix_micros(date_trunc("hour", col("ts"))),
        col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

  private lazy val docs: Array[(Long, String, String, String, Long)] =
    Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "source", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))

  // decimal(18,6)-exact sum in scaled-long space
  private def dsumL(xs: Iterable[Double]): Double =
    xs.map(x => math.rint(x * 1e6).toLong).sum / 1e6

  test("ts_ewma_deviation: smoothed series replicates a JVM fold with identical add order") {
    val hourly = events.groupBy(_._2).toSeq
      .map { case (h, xs) => (h, r6(dsumL(xs.map(_._3)))) }
      .sortBy(_._1)
    val xs = hourly.map(_._2).toArray
    val want = hourly.indices.map { i =>
      var num = xs(i); var den = 1.0
      for (k <- 1 to 12) {
        if (i - k >= 0) { num += xs(i - k) * math.pow(0.5, k)
          den += math.pow(0.5, k) }
        else num += 0.0 * math.pow(0.5, k)
      }
      val ewma = r6(num / den)
      (hourly(i)._1, xs(i), ewma, r6(xs(i) - ewma))
    }.sortBy(t => (-math.abs(t._4), t._1)).take(20)
    val got = SparkEntry.queries("ts_ewma_deviation")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want)
    // deviations genuinely fire (non-zero top excursion)
    assert(math.abs(got.head._4) > 1.0, s"flat series? ${got.head}")
  }

  test("ml_ols_daily_trend: slope/intercept/r2 replicate the closed form") {
    val daily = Tables.orders(spark, sf0001)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1995-01-01").cast("date")).cast("long"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).toSeq
      .map { case (d, xs) => (d, r6(dsumL(xs.map(_._2)) / 1e6)) }
    val n = daily.length.toLong
    val sx = daily.map(_._1).sum
    val sxx = daily.map(d => d._1 * d._1).sum
    val sy = dsumL(daily.map(_._2))
    val sxy = dsumL(daily.map(d => r6(d._1 * d._2)))
    val syy = dsumL(daily.map(d => r6(d._2 * d._2)))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx).toDouble
    val icept = (sy - sx.toDouble * slope) / n.toDouble
    val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
      ((n * sxx - sx * sx).toDouble * (n * syy - sy * sy))
    val row = SparkEntry.queries("ml_ols_daily_trend")(spark, sf0001).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - r6(slope)) < 1e-9, "slope")
    assert(math.abs(row.getDouble(2) - r6(icept)) < 1e-9, "intercept")
    assert(math.abs(row.getDouble(3) - r6(r2)) < 1e-9, "r2")
  }

  private def medianInterp(xs: Seq[Double]): Double = {
    val s = xs.sorted; val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  test("anomaly_mad_robust: medians, MAD and outlier counts replicate; outliers fire") {
    val byType = events.groupBy(_._1)
    val want = byType.toSeq.map { case (t, xs) =>
      val vs = xs.map(_._3)
      val med = r6(medianInterp(vs))
      val mad = r6(medianInterp(vs.map(v => r6(math.abs(v - med)))))
      val zs = vs.map(v => math.abs(0.6745 * (v - med) / mad))
      (t, vs.length.toLong, med, mad, zs.count(_ > 3.5).toLong, r6(zs.max))
    }.sortBy(_._1)
    val got = SparkEntry.queries("anomaly_mad_robust")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == want)
    assert(got.map(_._5).sum > 0, "no outliers fired anywhere")
    assert(got.forall(_._4 > 0), "degenerate MAD")
  }

  private lazy val tradeEdges: Set[(Long, Long)] = {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val om = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    li.map { case (o, s) => (s, om(o)) }.toSet
  }

  test("graph_hits_step: hub/authority scores replicate one JVM iteration") {
    val auth = tradeEdges.groupBy(_._2).map { case (c, es) => c -> es.size.toLong }
    val hub = tradeEdges.groupBy(_._1)
      .map { case (s, es) => s -> es.toSeq.map(e => auth(e._2)).sum }
    def top(m: Map[Long, Long], role: String) = {
      val tot = m.values.sum.toDouble
      m.toSeq.sortBy { case (n, raw) => (-raw, n) }.take(20)
        .map { case (n, raw) => (role, n, raw, r6(raw / tot)) }
    }
    val want = (top(auth, "auth") ++ top(hub, "hub"))
      .sortBy(t => (t._1, -t._3, t._2))
    val got = SparkEntry.queries("graph_hits_step")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want)
  }

  private lazy val coEdges: Set[(Long, Long)] = {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).filter(_._2.size >= 2).keys.toSet
  }

  test("graph_kcore_peel: three peeling rounds replicate; counts monotone") {
    def degrees(e: Set[(Long, Long)]): Map[Long, Int] =
      e.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (v, xs) => v -> xs.size }
    var e = coEdges
    val want = scala.collection.mutable.ArrayBuffer(
      (0, degrees(e).size.toLong, e.size.toLong))
    for (r <- 1 to 3) {
      val keep = degrees(e).filter(_._2 >= 3).keySet
      e = e.filter(p => keep(p._1) && keep(p._2))
      want += ((r, degrees(e).size.toLong, e.size.toLong))
    }
    val got = SparkEntry.queries("graph_kcore_peel")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
    assert(got.map(_._2).sliding(2).forall(p => p.head >= p.last), "nodes grew")
    assert(got.map(_._3).sliding(2).forall(p => p.head >= p.last), "edges grew")
  }

  test("graph_degree_hist: histogram replicates; masses conserve") {
    val degs = coEdges.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (_, xs) => xs.size.toLong }
    val want = degs.groupBy(identity).map { case (d, xs) => (d, xs.size.toLong) }
      .toSeq.sortBy(_._1)
    val got = SparkEntry.queries("graph_degree_hist")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == want)
    assert(got.map(_._2).sum == degs.size, "node mass")
    assert(got.map(t => t._1 * t._2).sum == 2L * coEdges.size, "edge mass (handshake)")
  }

  test("ml_chi2_terms: top-20 chi-square rows replicate a JVM contingency pass") {
    val n = docs.length.toLong
    val classN = docs.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val dfLw = docs.flatMap(d => d._4.split(" ", -1).distinct.map(w => (d._2, w)))
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val dfW = dfLw.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val want = dfLw.toSeq.map { case ((l, w), a) =>
      val b = dfW(w) - a; val c = classN(l) - a; val d = n - classN(l) - b
      val num = (a * d - b * c).toDouble
      val den = ((a + b) * (c + d)).toDouble * ((a + c) * (b + d)).toDouble
      (w, l, a, b, c, d, r6(n.toDouble * num * num / den))
    }.sortBy(t => (-t._7, t._1, t._2)).take(20)
    val got = SparkEntry.queries("ml_chi2_terms")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq == want)
  }

  test("llm_zipf_slope: fit replicates; slope is negative (Zipf decay)") {
    val counts = docs.flatMap(_._4.split(" ", -1)).groupBy(identity)
      .map { case (w, xs) => (w, xs.length.toLong) }
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(100)
    val xy = counts.zipWithIndex.map { case ((_, c), i) =>
      (r6(math.log(i + 1.0)), r6(math.log(c.toDouble))) }
    val n = xy.length.toLong
    val sx = dsumL(xy.map(_._1)); val sxx = dsumL(xy.map(p => r6(p._1 * p._1)))
    val sy = dsumL(xy.map(_._2)); val sxy = dsumL(xy.map(p => r6(p._1 * p._2)))
    val syy = dsumL(xy.map(p => r6(p._2 * p._2)))
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - sx * slope) / n.toDouble
    val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    val row = SparkEntry.queries("llm_zipf_slope")(spark, sf0001).collect().head
    assert(row.getLong(0) == n)
    assert(math.abs(row.getDouble(1) - r6(slope)) < 1e-9)
    assert(math.abs(row.getDouble(2) - r6(icept)) < 1e-9)
    assert(math.abs(row.getDouble(3) - r6(r2)) < 1e-9)
    assert(row.getDouble(1) < 0.0, s"no Zipf decay: slope ${row.getDouble(1)}")
  }

  test("er_fellegi_sunter: scores replicate; blocks stay bounded; a match fires at sf0.01") {
    val wa = Seq(0.90 -> 0.10, 0.85 -> 0.05, 0.85 -> 0.05, 0.95 -> 0.20)
      .map { case (m, u) => r6(math.log(m / u)) }
    val wd = Seq(0.90 -> 0.10, 0.85 -> 0.05, 0.85 -> 0.05, 0.95 -> 0.20)
      .map { case (m, u) => r6(math.log((1 - m) / (1 - u))) }
    val feats = docs.map { case (id, lang, src, text, nc) =>
      val ws = text.split(" ", -1)
      (id, (lang, src, nc / 100), ws.length / 10, ws.head, ws.last, nc)
    }
    val blocks = feats.groupBy(_._2)
    assert(blocks.values.map(_.length).max <= 16, "block blew up")
    val pairs = blocks.values.flatMap { xsArr =>
      val xs = xsArr.toSeq
      for (x <- xs; y <- xs if x._1 < y._1) yield {
        val ag = Seq(x._3 == y._3, x._4 == y._4, x._5 == y._5,
          math.abs(x._6 - y._6) <= 10)
        val score = ag.zipWithIndex
          .map { case (a, i) => if (a) wa(i) else wd(i) }
          .reduceLeft(_ + _)
        (x._1, y._1, ag(0), ag(1), ag(2), ag(3), r6(score))
      }
    }.toSeq
    val want = pairs.sortBy(t => (-t._7, t._1, t._2)).take(20)
      .map(t => (t._1, t._2, if (t._3) 1 else 0, if (t._4) 1 else 0,
        if (t._5) 1 else 0, if (t._6) 1 else 0, t._7))
    val got = SparkEntry.queries("er_fellegi_sunter")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getDouble(6)))
    assert(got.toSeq == want)
    // the match path is seen to fire at the verify SF
    val m = SparkEntry.queries("er_fellegi_sunter")(spark, "/root/testdata/sf0.01")
      .where(col("is_match")).count()
    assert(m >= 1, "no pair above the FS threshold at sf0.01")
  }

  test("ts_stl_decompose: trend/seasonal/residual replicate a JVM decomposition") {
    val hourly = events.groupBy(_._2).toSeq
      .map { case (h, xs) => (h, r6(dsumL(xs.map(_._3)))) }
      .sortBy(_._1)
    val xs = hourly.map(_._2).toArray
    val full = hourly.indices.filter(i => i >= 12 && i + 12 < hourly.length)
    val rows0 = full.map { i =>
      val trend = r6(dsumL((i - 12 to i + 12).map(xs)) / 25.0)
      val hod = ((hourly(i)._1 / 3600000000L) % 24).toInt
      (hourly(i)._1, hod, xs(i), trend, r6(xs(i) - trend))
    }
    val seasonal = rows0.groupBy(_._2).map { case (hod, rs) =>
      hod -> r6(dsumL(rs.map(_._5)) / rs.length) }
    val want = rows0.map { case (us, hod, x, trend, detr) =>
      (us, hod, x, trend, seasonal(hod), r6(detr - seasonal(hod)))
    }.sortBy(t => (-math.abs(t._6), t._1)).take(20)
    val got = SparkEntry.queries("ts_stl_decompose")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want)
  }

  test("llm_dedup_keep_best: per-cluster argmax replicates; retention ledger conserves docs") {
    val clusters = graft.ops.Llm3.dedupClusters(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val scores = graft.ops.Llm.qualityScore(spark, sf0001)
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = clusters.groupBy(_._2).toSeq.map { case (c, members) =>
      val best = members.minBy(m => (-scores(m._1), m._1))
      (c, members.head._3, best._1, scores(best._1), members.head._3 - 1)
    }.sortBy(_._1)
    val got = SparkEntry.queries("llm_dedup_keep_best")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == want)
    // ledger conservation: kept + dropped == the 50-doc dedup universe
    assert(got.map(_._2).sum == clusters.length)
    assert(got.length + got.map(_._5).sum == clusters.length)
    // at least one real cluster exists (something actually deduped)
    assert(got.exists(_._5 > 0), "no multi-doc cluster — dead policy")
  }

  test("llm_hard_negatives: top-5 cross-label neighbors replicate a JVM brute force") {
    import graft.functions.ArrayMath.{dotJvm, round6}
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    val want = vecs.filter(_._1 < 10).sortBy(_._1).flatMap { case (qid, qlab, qv) =>
      val qn = math.sqrt(dotJvm(qv, qv))
      vecs.filter(_._2 != qlab).map { case (id2, lab2, v2) =>
        (qid, qlab, id2, lab2,
          round6(dotJvm(qv, v2) / (qn * math.sqrt(dotJvm(v2, v2)))))
      }.sortBy(t => (-t._5, t._3)).take(5).zipWithIndex
        .map { case (t, i) => (t._1, t._2, t._3, t._4, t._5, i + 1) }
    }
    val got = SparkEntry.queries("llm_hard_negatives")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4), r.getInt(5)))
    assert(got.toSeq == want.toSeq)
    // every mined negative really crosses the label boundary
    assert(got.forall(t => t._2 != t._4))
  }

  test("ts_crosscorr_types: 13-lag cross-correlation replicates a JVM densified pass") {
    val hourly = Tables.events(spark, sf0001)
      .where(col("event_type").isin("click", "purchase"))
      .select(unix_micros(date_trunc("hour", col("ts"))), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byHour = hourly.groupBy(_._1)
    val lo = byHour.keys.min; val hi = byHour.keys.max
    val hours = (lo to hi by 3600000000L).toArray
    def series(t: String) = hours.map { h =>
      byHour.get(h).map(xs => r6(dsumL(xs.filter(_._2 == t).map(_._3)))).getOrElse(0.0) }
    val a = series("click"); val b = series("purchase")
    val want = (-6 to 6).map { k =>
      val pairs = hours.indices.flatMap { i =>
        val j = i + k
        if (j >= 0 && j < hours.length) Some((a(i), b(j))) else None
      }
      val n = pairs.length.toLong
      val sx = dsumL(pairs.map(_._1)); val sxx = dsumL(pairs.map(p => r6(p._1 * p._1)))
      val sy = dsumL(pairs.map(_._2)); val syy = dsumL(pairs.map(p => r6(p._2 * p._2)))
      val sxy = dsumL(pairs.map(p => r6(p._1 * p._2)))
      (k, n, r6((n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))))
    }
    val bestAbs = want.map(t => math.abs(t._3)).max
    val got = SparkEntry.queries("ts_crosscorr_types")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == want)
    got.foreach { t =>
      assert(math.abs(t._3) <= 1.0)
      assert(t._4 == (math.abs(t._3) == bestAbs), s"is_best wrong at lag ${t._1}")
    }
  }

  test("er_blocking_quality: three schemes replicate in JVM; prefix filtering is LOSSLESS (PC exactly 1)") {
    // truth: exhaustive >=0.9 word-set Jaccard over docs < 50
    val slice = docs.filter(_._1 < 50)
    val wordSets = slice.map(d => d._1 -> d._4.split(" ", -1).distinct.toSet).toMap
    val ids = slice.map(_._1).sorted
    val truth = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      s1 = wordSets(ids(i)); s2 = wordSets(ids(j))
      inter = (s1 & s2).size
      if 10 * inter >= 9 * (s1.size + s2.size - inter)
    } yield (ids(i), ids(j))).toSet
    // scheme 1: SNM ranks over the FULL corpus by (text, doc_id)
    val ranks = docs.sortBy(d => (d._4, d._1)).map(_._1).zipWithIndex.toMap
    val c1 = (for {
      x <- slice.iterator; y <- slice.iterator
      if x._1 != y._1 && {
        val d = ranks(y._1) - ranks(x._1); d >= 1 && d <= 5 }
    } yield (math.min(x._1, y._1), math.max(x._1, y._1))).toSet
    // scheme 2: (lang, source, chars-band) blocks
    val c2 = slice.groupBy(d => (d._2, d._3, d._5 / 100)).values.flatMap { xsA =>
      val xs = xsA.toSeq
      for (x <- xs; y <- xs if x._1 < y._1) yield (x._1, y._1) }.toSet
    // scheme 3: prefix filtering at t=0.9 in (df, word) order
    val dfw = slice.flatMap(d => wordSets(d._1)).groupBy(identity)
      .map { case (w, xs) => w -> xs.length }
    val prefix = slice.map { d =>
      val sz = wordSets(d._1).size
      val p = sz - ((9 * sz + 9) / 10) + 1
      d._1 -> wordSets(d._1).toSeq.sortBy(w => (dfw(w), w)).take(p).toSet
    }.toMap
    val c3 = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      if (prefix(ids(i)) & prefix(ids(j))).nonEmpty
    } yield (ids(i), ids(j))).toSet
    val want = Seq(("1_snm_text", c1), ("2_attr_block", c2), ("3_prefix_filter", c3))
      .map { case (s, c) => (s, c.size.toLong, truth.size.toLong,
        (c & truth).size.toLong) }
    val got = SparkEntry.queries("er_blocking_quality")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want, s"\n got $got\nwant $want")
    // the prefix-filter theorem: candidates are a SUPERSET of truth
    assert((truth -- c3).isEmpty, "prefix filtering lost a true pair")
    val pcRow = SparkEntry.queries("er_blocking_quality")(spark, sf0001)
      .where(col("scheme") === "3_prefix_filter").collect().head
    assert(pcRow.getDouble(6) == 1.0, "PC not exactly 1")
  }

  test("attr_last_touch: per-user carry-forward attribution replicates; revenue conserves") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val attributed = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      var touch: String = null
      xs.sortBy(e => (e._2.getTime / 1000 * 1000000L + e._2.getNanos / 1000, e._3))
        .flatMap { e =>
          val out = if (e._4 == "purchase")
            Some((Option(touch).getOrElse("direct"), e._5)) else None
          if (e._4 != "purchase") touch = e._4
          out
        }
    }
    val totRev = dsumL(attributed.map(_._2))
    val want = attributed.groupBy(_._1).toSeq.map { case (t, xs) =>
      val rev = r6(dsumL(xs.map(_._2)))
      (t, xs.length.toLong, rev, r6(rev / totRev))
    }.sortBy(_._1)
    val got = SparkEntry.queries("attr_last_touch")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq == want)
    assert(got.map(_._2).sum == ev.count(_._4 == "purchase"), "purchase mass")
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-4, "shares do not sum to 1")
  }

  test("llm_pii_scan: recall is literally 1.0; the raw fixture is a clean control") {
    val got = SparkEntry.queries("llm_pii_scan")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val byType = got.map(t => t._1 -> t).toMap
    assert(byType("email")._4 == docs.count(_._1 % 7 == 0))
    assert(byType("phone")._4 == docs.count(_._1 % 11 == 0))
    got.foreach { t =>
      assert(t._5 == 1.0, s"${t._1} recall ${t._5}")
      assert(t._2 >= t._4 && t._3 >= t._4, s"${t._1} hits below planted")
    }
    // clean control: the UNplanted corpus has zero matches for either
    // pattern — flagged counts are planting-only, no false positives
    val email = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+".r
    val phone = "555-[0-9]{4}".r
    docs.foreach { case (id, _, _, text, _) =>
      assert(email.findFirstIn(text).isEmpty, s"raw doc $id matches email")
      assert(phone.findFirstIn(text).isEmpty, s"raw doc $id matches phone")
    }
  }

  private def sigmoid6(nc: Long, nw: Int): Double = {
    val z = -1.0 + -1.5 * (nc.toDouble / 100.0) + 1.2 * (nw.toDouble / 10.0)
    r6(1.0 / (1.0 + math.exp(-z)))
  }

  test("ml_auc_roc: Mann–Whitney midrank AUC replicates; a perfect scorer gets AUC 1 in the same JVM path") {
    def aucOf(scored: Seq[(Double, Long)]): Double = {
      val groups = scored.groupBy(_._1).toSeq.sortBy(_._1)
      var cum = 0L; var sumMid2 = 0L
      groups.foreach { case (_, xs) =>
        val n = xs.length.toLong; val np = xs.map(_._2).sum
        sumMid2 += np * (2 * cum + n + 1)
        cum += n
      }
      val np = scored.map(_._2).sum; val nn = scored.length - np
      r6((sumMid2 / 2.0 - np.toDouble * (np + 1).toDouble / 2.0) / (np * nn).toDouble)
    }
    val scored = docs.map { case (_, lang, _, text, nc) =>
      (sigmoid6(nc, text.split(" ", -1).length), if (lang == "en") 1L else 0L) }
    val row = SparkEntry.queries("ml_auc_roc")(spark, sf0001).collect().head
    assert(row.getLong(0) == scored.map(_._2).sum)
    assert(row.getLong(1) == scored.length - scored.map(_._2).sum)
    assert(math.abs(row.getDouble(2) - aucOf(scored.toSeq)) < 1e-9)
    assert(math.abs(row.getDouble(3) - r6(2.0 * row.getDouble(2) - 1.0)) < 1e-9)
    // metric sanity through the SAME kernel: score == label ⇒ AUC exactly 1
    val perfect = scored.map { case (_, y) => (y.toDouble, y) }
    assert(aucOf(perfect.toSeq) == 1.0)
    // and an anti-scorer ⇒ exactly 0
    assert(aucOf(perfect.map { case (s, y) => (-s, y) }.toSeq) == 0.0)
  }

  test("ml_calibration_bins: reliability table replicates; masses conserve; bins spread") {
    val scored = docs.map { case (_, lang, _, text, nc) =>
      (sigmoid6(nc, text.split(" ", -1).length), if (lang == "en") 1L else 0L) }
    val want = scored.groupBy(t => math.min(math.floor(t._1 * 10).toLong, 9L))
      .toSeq.map { case (bin, xs) =>
        val mp = r6(dsumL(xs.map(_._1)) / xs.length)
        val fp = r6(xs.map(_._2).sum.toDouble / xs.length)
        (bin, xs.length.toLong, mp, xs.map(_._2).sum, fp, r6(mp - fp))
      }.sortBy(_._1)
    val got = SparkEntry.queries("ml_calibration_bins")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want)
    assert(got.map(_._2).sum == docs.length, "doc mass")
    assert(got.length >= 5, s"degenerate score spread: ${got.length} bins")
  }

  test("graph_local_clustering: per-node triangle counts replicate; mass = 3x global") {
    val adj = (coEdges.toSeq.flatMap(e => Seq(e, (e._2, e._1))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    val triPerNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var total = 0L
    for ((a, b) <- coEdges; c <- adj(a) & adj(b) if a < b && b < c) {
      triPerNode(a) += 1; triPerNode(b) += 1; triPerNode(c) += 1
      total += 1
    }
    val want = triPerNode.toSeq.map { case (v, t) =>
      val d = adj(v).size.toLong
      (v, d, t, r6(2.0 * t / (d * (d - 1)).toDouble))
    }.filter(_._2 >= 2)
      .sortBy(x => (-x._3, -x._4, x._1)).take(20)
    val got = SparkEntry.queries("graph_local_clustering")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want)
    assert(triPerNode.values.sum == 3L * total, "attribution mass")
  }

  test("win_sliding_distinct: frame-exact distinct counts replicate a JVM sliding pass") {
    val ev = Tables.events(spark, sf0001)
      .where(col("user_id") < 10)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(e => (e._2, e._3))
      sorted.indices.map { i =>
        val frame = sorted.slice(math.max(0, i - 4), i + 1)
        (sorted(i)._1, sorted(i)._2, sorted(i)._3,
          frame.map(_._4).distinct.length.toLong)
      }
    }.sortBy(t => (t._1, t._2, t._3))
    val got = SparkEntry.queries("win_sliding_distinct")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want)
    // the frame cap binds: no count exceeds 5, and variety genuinely moves
    assert(got.forall(_._4 <= 5) && got.map(_._4).distinct.length > 1)
  }

  test("graph_assortativity: Pearson r over directed degree pairs replicates; |r| <= 1") {
    val deg = coEdges.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (v, xs) => v -> xs.size.toLong }
    val pairs = coEdges.toSeq.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val n = pairs.length.toLong
    val sx = pairs.map(_._1).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val want = r6((n * sxy - sx * sx).toDouble / (n * sxx - sx * sx).toDouble)
    val row = SparkEntry.queries("graph_assortativity")(spark, sf0001).collect().head
    assert(row.getLong(0) == coEdges.size.toLong)
    assert(row.getLong(1) == deg.size.toLong)
    assert(math.abs(row.getDouble(2) - want) < 1e-9)
    assert(math.abs(row.getDouble(2)) <= 1.0)
  }

  test("privacy_dp_counts: hash-seeded Laplace draws replicate; ledger consistent") {
    val got = SparkEntry.queries("privacy_dp_counts")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    got.foreach { case (t, nTrue, noise, nNoisy, eps) =>
      val u = (Tables.h48jvm(s"dp:$t").toDouble + 0.5) / math.pow(2.0, 48)
      val want = r6(-1.0 * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5)))
      assert(math.abs(noise - want) < 1e-9, s"$t noise $noise vs $want")
      assert(math.abs(nNoisy - math.max(0.0, r6(nTrue + noise))) < 1e-9)
      assert(eps == 1.0)
      assert(math.abs(noise) < 25.0, s"$t noise implausibly large for b=1")
    }
    val ev = Tables.events(spark, sf0001).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (t, nTrue, _, _, _) => assert(ev(t) == nTrue) }
  }

  test("llm_vocab_coverage: per-lang OOV rates replicate a JVM top-K vocab") {
    val toks = docs.flatMap(d => d._4.split(" ", -1).map(w => (d._2, w)))
    val vocab = toks.map(_._2).groupBy(identity).toSeq
      .map { case (w, xs) => (w, xs.length) }
      .sortBy { case (w, c) => (-c, w) }.take(1000).map(_._1).toSet
    val want = toks.groupBy(_._1).toSeq.map { case (lang, xs) =>
      val n = xs.length.toLong
      val cov = xs.count(t => vocab(t._2)).toLong
      (lang, n, cov, n - cov, r6(cov.toDouble / n))
    }.sortBy(_._1)
    val got = SparkEntry.queries("llm_vocab_coverage")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == want)
    assert(got.map(_._2).sum == toks.length)
  }

  test("privacy_l_diversity: bands replicate a JVM distinct-user audit") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), hour(col("ts")), col("value"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    // .toSeq BEFORE mapping to (l, n): mapping a Map collapses duplicate
    // (l, n) pairs (the key-collapse trap Round10cSpec pinned)
    val cls = ev.groupBy(e => (e._1, e._2, math.floor(e._3 / 20.0).toLong))
      .toSeq
      .map { case (_, xs) => (xs.map(_._4).distinct.length.toLong, xs.length.toLong) }
    val want = cls.groupBy { case (l, _) =>
      if (l < 3) "l<3" else if (l < 10) "3<=l<10" else "l>=10"
    }.map { case (band, xs) =>
      (band, xs.size.toLong, xs.map(_._2).sum, xs.map(_._1).min, xs.map(_._1).max)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("privacy_l_diversity")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want)
    // class mass conservation
    assert(got.map(_._3).sum == ev.length)
  }

  test("llm_span_corrupt: masked input/target replicate a JVM h48-seeded mask") {
    val want = docs.sortBy(_._1).flatMap { case (id, _, _, text, _) =>
      val ws = text.split(" ", -1)
      if (ws.length <= 3) None else {
        val s = (Tables.h48jvm(s"span:$id") % (ws.length - 3)).toInt + 1
        val input = (ws.take(s - 1) ++ Array("<X>") ++ ws.drop(s + 2)).mkString(" ")
        val target = ("<X>" +: ws.slice(s - 1, s + 2)).mkString(" ")
        Some((id, ws.length, s.toLong, input, target))
      }
    }
    val got = SparkEntry.queries("llm_span_corrupt")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
    // reconstruction property: splicing target over the sentinel restores
    // the original text for every row
    got.foreach { case (id, _, s, input, target) =>
      val orig = docs.find(_._1 == id).get._4
      val restored = input.replaceFirst("<X>",
        java.util.regex.Matcher.quoteReplacement(target.stripPrefix("<X> ")))
      assert(restored == orig, s"doc $id does not reconstruct")
    }
  }

  test("layout_zorder_prune: zone maps replicate; z-order dominates 2-D pruning") {
    val base = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (mind, maxd) = (base.map(_._2).min, base.map(_._2).max)
    val (minc, maxc) = (base.map(_._3).min, base.map(_._3).max)
    def buckets(row: (Long, Long, Long)): Seq[(String, Long)] = {
      val (ok, day, cust) = row
      val dk = (day - mind) * 8 / (maxd - mind + 1)
      val ck = (cust - minc) * 8 / (maxc - minc + 1)
      val z = 32 * (dk / 4 % 2) + 16 * (ck / 4 % 2) + 8 * (dk / 2 % 2) +
        4 * (ck / 2 % 2) + 2 * (dk % 2) + (ck % 2)
      Seq(("1_natural", ok % 64), ("2_datesort", (day - mind) * 64 / (maxd - mind + 1)),
        ("3_zorder", z))
    }
    val zones = base.flatMap(r => buckets(r).map(lb => (lb, r._2, r._3)))
      .groupBy(_._1)
    val want = zones.toSeq.map { case ((layout, _), xs) =>
      (layout, xs.map(_._2).min, xs.map(_._2).max,
        xs.map(_._3).min, xs.map(_._3).max, xs.length.toLong)
    }.groupBy(_._1).toSeq.map { case (layout, zs) =>
      val hitD = zs.filter(z => z._2 <= 899 && z._3 >= 600)
      val hitB = hitD.filter(z => z._4 <= 187 && z._5 >= 0)
      (layout, zs.length.toLong, hitD.length.toLong, hitB.length.toLong,
        hitB.map(_._6).sum, zs.map(_._6).sum)
    }.sortBy(_._1)
    val got = SparkEntry.queries("layout_zorder_prune")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == want)
    // every layout holds the full table
    assert(got.map(_._6).distinct.length == 1)
    // the dominance claim needs the customer dimension to discriminate —
    // at sf0.001 custkey tops out below the predicate bound, so grade at
    // sf0.01: z-order must beat 1-D sort on the 2-D predicate's scanned
    // rows, and 1-D sort must beat natural order's scanned buckets
    val big = SparkEntry.queries("layout_zorder_prune")(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(big("3_zorder")._2 < big("2_datesort")._2, s"rows_2d $big")
    assert(big("2_datesort")._1 < big("1_natural")._1, s"scan_2d $big")
  }
}
