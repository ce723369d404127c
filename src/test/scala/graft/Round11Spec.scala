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
}
