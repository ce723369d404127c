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
}
