package graft

import org.apache.spark.sql.functions._

/** Round-11 first batch: distributed-ML training steps (Naive Bayes,
  * Gini stump, logistic gradient, silhouette) — each replayed from
  * first principles in JVM over the raw fixture. */
class Round11Spec extends SparkTestBase {

  private lazy val docs: Array[(Long, String, String, Long)] =
    Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  test("ml_naive_bayes: confusion matrix replicates a full JVM NB fit+score") {
    val train = docs.filter(_._1 % 5 != 0)
    val test0 = docs.filter(_._1 % 5 == 0)
    val trainTok = train.flatMap(d => d._3.split(" ", -1).map(w => (d._2, w)))
    val nTok = trainTok.groupBy(_._1).map { case (l, ts) => l -> ts.length.toLong }
    val nDocs = train.groupBy(_._2).map { case (l, ds) => l -> ds.length.toLong }
    val v = trainTok.map(_._2).distinct.length.toLong
    val cw = trainTok.groupBy(identity).map { case (k, ts) => k -> ts.length.toLong }
    val langs = nDocs.keys.toSeq.sorted
    // decimal(18,6) sums are exact in scaled-long space
    def micro(x: Double): Long = math.rint(x * 1e6).toLong
    val predicted = test0.map { case (id, langTrue, text, _) =>
      val scores = langs.map { c =>
        val prior = micro(r6(math.log(nDocs(c).toDouble / train.length)))
        val toks = text.split(" ", -1).map { w =>
          val cnt = cw.getOrElse((c, w), 0L)
          micro(r6(math.log((cnt + 1).toDouble / (nTok(c) + v).toDouble)))
        }.sum
        c -> (prior + toks)
      }
      val best = scores.minBy { case (c, s) => (-s, c) }._1
      (langTrue, best)
    }
    val want = predicted.groupBy(identity)
      .map { case ((t, p), xs) => (t, p, xs.length.toLong) }.toSet
    val got = SparkEntry.queries("ml_naive_bayes")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    // fixture lang labels are independent of the word-soup text (no signal
    // to learn), so accuracy ≈ the prior-weighted chance level — the
    // correctness claim is the EXACT confusion-matrix replication above
    // plus conservation: every held-out doc predicted exactly once.
    assert(got.toSeq.map(_._3).sum == test0.length.toLong)
    val acc = predicted.count(p => p._1 == p._2).toDouble / predicted.length
    assert(acc > 0.05, s"accuracy $acc below any plausible chance floor")
  }

  test("ml_gini_split: best threshold replicates an exhaustive JVM split search") {
    val ev = Tables.events(spark, sf0001).select("value", "event_type").collect()
      .map(r => (r.getDouble(0), r.getString(1) == "purchase"))
    val buckets = ev.map { case (v, p) => (math.min(math.floor(v / 20.0).toLong, 9L), p) }
    def gini(n: Long, pos: Long): Double = {
      val nd = n.toDouble; val pd = pos.toDouble
      1.0 - (pd * pd + (nd - pd) * (nd - pd)) / (nd * nd)
    }
    val nTot = buckets.length.toLong
    val pTot = buckets.count(_._2).toLong
    val cand = (0L to 9L).flatMap { b =>
      val nl = buckets.count(_._1 <= b).toLong
      val pl = buckets.count(x => x._1 <= b && x._2).toLong
      if (nl < nTot)
        Some((20 * (b + 1),
          r6((nl * gini(nl, pl) + (nTot - nl) * gini(nTot - nl, pTot - pl)) / nTot)))
      else None
    }
    val wantBest = cand.minBy { case (t, g) => (g, t) }._1
    val rows = SparkEntry.queries("ml_gini_split")(spark, sf0001).collect()
    val gotBest = rows.filter(_.getBoolean(6)).map(_.getLong(0))
    assert(gotBest.toSeq == Seq(wantBest))
    // every candidate's impurity replicates
    val got = rows.map(r => (r.getLong(0), r.getDouble(5))).toMap
    cand.foreach { case (t, g) =>
      assert(math.abs(got(t) - g) < 1e-9, s"threshold $t: ${got(t)} vs $g") }
    // a split must actually improve on the root impurity
    val root = r6(gini(nTot, pTot))
    assert(cand.map(_._2).min <= root)
  }

  test("ml_logreg_gradient: gradient replicates; step moves weights against the gradient") {
    val w = Seq(0.1, -0.05, 0.02)
    val feats = docs.map { case (_, lang, text, nChars) =>
      val y = if (lang == "en") 1.0 else 0.0
      val x = Seq(1.0, nChars / 100.0, text.split(" ", -1).length / 10.0)
      val z = w.zip(x).map { case (a, b) => a * b }.sum
      val p = 1.0 / (1.0 + math.exp(-z))
      (y, x, p)
    }
    val rows = SparkEntry.queries("ml_logreg_gradient")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    rows.foreach { case (j, n, gsum, gmean, wOld, wNew) =>
      assert(n == docs.length)
      val want = feats.map { case (y, x, p) =>
        math.rint(r6((p - y) * x(j - 1)) * 1e6).toLong }.sum / 1e6
      assert(math.abs(gsum - r6(want)) < 1e-9, s"feature $j grad $gsum vs $want")
      assert(math.abs(gmean - r6(gsum / n)) < 1e-9)
      assert(wOld == w(j - 1))
      assert(math.abs(wNew - r6(wOld - 0.1 * gmean)) < 1e-9)
    }
  }

  test("llm_silhouette: per-label silhouette replicates a JVM centroid computation") {
    val vecs = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    // decimal-mean centroids: sum in micro-space exactly like davg
    val cents = vecs.groupBy(_._2).map { case (l, vs) =>
      l -> (0 until 64).map { i =>
        vs.map(v => math.rint(v._3(i) * 1e6).toLong).sum / 1e6 / vs.length
      }.toArray
    }
    def dist(a: Array[Double], b: Array[Double]): Double =
      r6(math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum))
    val s = vecs.map { case (_, l, v) =>
      val a = dist(v, cents(l))
      val b = cents.filter(_._1 != l).values.map(dist(v, _)).min
      l -> r6((b - a) / math.max(a, b))
    }
    val want = s.groupBy(_._1).map { case (l, xs) =>
      (l, xs.length.toLong,
        r6(xs.map(x => math.rint(x._2 * 1e6).toLong).sum / 1e6 / xs.length))
    }.toSet
    val got = SparkEntry.queries("llm_silhouette")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    // sanity: s ∈ [-1, 1] everywhere
    assert(s.forall(x => x._2 >= -1.0 && x._2 <= 1.0))
  }

  test("anomaly_cusum: window formulation equals the SEQUENTIAL textbook recursion") {
    // replay S_t = max(0, S_{t-1} + x_t - k) literally, per type, in
    // micro-long space (the decimal(18,6) twin) — the prefix-minus-min
    // window trick in the query must reproduce it exactly
    val ev = Tables.events(spark, sf0001)
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getDouble(3)))
    val want = ev.groupBy(_._1).map { case (tpe, rows) =>
      var s = 0L; var alarms = 0L; var maxS = 0L; var firstAlarm = -1L
      rows.sortBy(r => (r._2, r._3)).foreach { case (_, us, _, v) =>
        val term = math.rint((v - 55.0) * 1e6).toLong
        s = math.max(0L, s + term)
        if (s > 200L * 1000000) { alarms += 1; if (firstAlarm < 0) firstAlarm = us }
        maxS = math.max(maxS, s)
      }
      (tpe, rows.length.toLong, alarms, maxS / 1e6, firstAlarm)
    }.toSet
    val got = SparkEntry.queries("anomaly_cusum")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(got == want)
    // the alarm path fires on every fixture type (a chart never seen to
    // alarm is not a chart)
    assert(got.forall(_._3 > 0))
  }

  test("ts_autocorr_hourly: r replicates from a JVM densified series; lags well-formed") {
    val rows = SparkEntry.queries("ts_autocorr_hourly")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(1, 24))
    val ev = Tables.events(spark, sf0001).select("ts", "value").collect()
      .map(r => (r.getTimestamp(0).getTime / 3600000 * 3600000, r.getDouble(1)))
    val byHour = ev.groupBy(_._1).map { case (h, xs) =>
      h -> xs.map(x => math.rint(x._2 * 1e6).toLong).sum / 1e6 }
    val hours = (byHour.keys.min to byHour.keys.max by 3600000L)
      .map(h => byHour.getOrElse(h, 0.0)).toArray
    rows.foreach { case (lag, nPairs, r) =>
      assert(nPairs == hours.length - lag)
      val x = hours.dropRight(lag); val y = hours.drop(lag)
      val n = x.length.toDouble
      def mic(v: Double) = math.rint(v * 1e6).toLong
      val sx = x.map(mic).sum / 1e6; val sy = y.map(mic).sum / 1e6
      val sxy = x.zip(y).map { case (a, b) => mic(r6(a * b)) }.sum / 1e6
      val sxx = x.map(a => mic(r6(a * a))).sum / 1e6
      val syy = y.map(a => mic(r6(a * a))).sum / 1e6
      val want = r6((n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)))
      assert(math.abs(r - want) < 1e-9, s"lag $lag: $r vs $want")
      assert(r > -1.0 && r < 1.0)
    }
  }

  test("mv_incremental_update: merge == direct rebuild, delta genuinely partial") {
    val rows = SparkEntry.queries("mv_incremental_update")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(5)))
    assert(rows.length == 5)
    rows.foreach { case (tpe, nb, nd, nm, ok) =>
      assert(ok, s"$tpe merged view inconsistent with direct rebuild")
      assert(nb + nd == nm)
      assert(nb > 0 && nd > 0, s"$tpe: cut date must split the fixture")
    }
  }

  test("agg_hll_merge_rollup: registers replicate; week sketch == per-register max of days") {
    val ev = Tables.events(spark, sf0001)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
      .where(col("ts") < lit("2024-01-08").cast("timestamp"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    def reg(users: Set[Long]): Map[Long, Int] =
      users.toSeq.map { u =>
        val h = Tables.h48jvm(s"hll:$u")
        val idx = h % 64; val w = h / 64
        val rho = if (w == 0) 43 else 43 - java.lang.Long.toBinaryString(w).length
        idx -> rho
      }.groupBy(_._1).map { case (i, rs) => i -> rs.map(_._2).max }
    val dayRegs = ev.groupBy(_._1).map { case (d, xs) => d -> reg(xs.map(_._2).toSet) }
    val weekReg = reg(ev.map(_._2).toSet)
    // mergeability: the week register table IS the per-register max of days
    val mergedUp = dayRegs.values.flatten.groupBy(_._1)
      .map { case (i, rs) => i -> rs.map(_._2).max }
    assert(mergedUp == weekReg)
    val got = SparkEntry.queries("agg_hll_merge_rollup")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.length == 8)
    val gotWeek = got.find(_._1 == "week").get
    assert(gotWeek._2 == weekReg.size.toLong)
    assert(gotWeek._3 == ev.map(_._2).distinct.length.toLong)
    // estimator graded within 3σ on every period of the fixture
    assert(got.forall(_._5), s"estimator out of band: $got")
  }

  test("graph_triangle_count: counts replicate an exhaustive JVM enumeration") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }
    val edges = pairs.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    val adjR = edges.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSet }
      .withDefaultValue(Set.empty[Long])
    def neigh(v: Long) = adj(v) ++ adjR(v)
    // brute-force triangle enumeration, orientation-free
    val tri = (for {
      (a, b) <- edges.iterator
      c <- neigh(a) & neigh(b)
    } yield Seq(a, b, c).sorted).toSet.size
    val wedgesAll = nodes.toSeq.map { v =>
      val d = neigh(v).size.toLong; d * (d - 1) / 2 }.sum
    val row = SparkEntry.queries("graph_triangle_count")(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == nodes.size.toLong, "n_nodes")
    assert(row.getLong(1) == edges.size.toLong, "n_edges")
    assert(row.getLong(3) == tri.toLong, s"n_triangles ${row.getLong(3)} vs $tri")
    assert(row.getLong(4) == wedgesAll, "wedges_all")
    // oriented wedges must be a subset of all wedges (the O(m^1.5) bound)
    assert(row.getLong(2) <= wedgesAll)
    assert(math.abs(row.getDouble(5) - math.rint(3.0 * tri / wedgesAll * 1e6) / 1e6) < 1e-9)
  }

  test("sample_weighted_reservoir: top-k by A-ES key replicates; sample skews heavy") {
    val orders = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val keyed = orders.map { case (id, w) =>
      val u = (Tables.h48jvm(s"res:$id") + 1).toDouble / math.pow(2.0, 48)
      (id, w, math.rint(math.log(u) * 1e6 / w * 1e9) / 1e9)
    }
    val want = keyed.sortBy(k => (-k._3, k._1)).take(50)
    val got = SparkEntry.queries("sample_weighted_reservoir")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
    // weighted sampling must overrepresent heavy orders
    val sampleMean = got.map(_._2).sum / got.length
    val popMean = orders.map(_._2).sum / orders.length
    assert(sampleMean > popMean * 1.2,
      s"sample mean $sampleMean not skewed above population mean $popMean")
  }

  test("llm_bleu_overlap: BLEU-2 components replicate for the top pair; identical text scores 1") {
    val rows = SparkEntry.queries("llm_bleu_overlap")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.length == 20)
    assert(rows.map(_._8).sliding(2).forall(p => p.head >= p.last))
    val byId = docs.map(d => d._1 -> d).toMap
    rows.take(5).foreach { case (refId, candId, lenC, lenR, clip1, clip2, bp, bleu) =>
      assert(candId == refId + 1)
      val cw = byId(candId)._3.split(" ", -1); val rw = byId(refId)._3.split(" ", -1)
      assert(lenC == cw.length && lenR == rw.length)
      def counts(a: Array[String]) = a.groupBy(identity).map { case (k, v) => k -> v.length }
      def clip(c: Array[String], r: Array[String]) = {
        val cc = counts(c); val rc = counts(r)
        cc.map { case (w, n) => math.min(n, rc.getOrElse(w, 0)) }.sum.toLong
      }
      assert(clip1 == clip(cw, rw))
      def bg(a: Array[String]) = a.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toArray
      assert(clip2 == clip(bg(cw), bg(rw)))
      val p1 = clip1.toDouble / lenC; val p2 = clip2.toDouble / (lenC - 1)
      val bp0 = if (lenC >= lenR) 1.0 else math.exp(1.0 - lenR.toDouble / lenC)
      assert(math.abs(bp - r6(bp0)) < 1e-9)
      val want = if (clip1 == 0 || clip2 == 0) 0.0 else r6(bp0 * math.sqrt(p1 * p2))
      assert(math.abs(bleu - want) < 1e-9)
    }
    // metric sanity on a synthetic identical pair: BLEU-2 == 1
    import spark.implicits._
    val t = Seq(("x y z w", "x y z w")).toDF("a", "b")
      .selectExpr("split(a, ' ') AS cw", "split(b, ' ') AS rw")
    val self = t.selectExpr(
      "aggregate(array_distinct(cw), 0L, (acc, w) -> acc + least(size(filter(cw, x -> x = w)), size(filter(rw, x -> x = w)))) AS c1")
      .collect().head.getLong(0)
    assert(self == 4L)
  }

  test("llm_rake_keywords: word scores and the top phrase replicate a JVM RAKE pass") {
    val stop = Set("a", "the", "big", "small", "fast", "slow")
    // phrase segmentation: maximal stopword-free runs, per doc
    val phrases = docs.flatMap { case (_, _, text, _) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      text.split(" ", -1).foreach { w =>
        if (stop(w)) {
          if (cur.nonEmpty) { out += cur.toArray
            cur = scala.collection.mutable.ArrayBuffer.empty[String] }
        } else cur += w
      }
      if (cur.nonEmpty) out += cur.toArray
      out
    }
    val freq = phrases.flatten.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val deg = phrases.flatMap(p => p.map(w => w -> p.length.toLong))
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val scoreW = freq.keys.map(w => w -> r6(deg(w).toDouble / freq(w))).toMap
    val byPhrase = phrases.groupBy(_.mkString(" ")).map { case (p, occ) =>
      val ws = occ.head
      val score = r6(ws.map(w => math.rint(scoreW(w) * 1e6).toLong).sum / 1e6)
      (p, ws.length.toLong, occ.length.toLong, score)
    }
    val want = byPhrase.toSeq.sortBy(x => (-x._4, x._1)).take(20)
    val got = SparkEntry.queries("llm_rake_keywords")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == want)
    // longer multiword phrases must outrank single words (the RAKE property)
    assert(got.head._2 > 1, s"top phrase ${got.head} is a single word")
  }
}
