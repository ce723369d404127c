package graft

import org.apache.spark.sql.functions._

/** Round-11 tenth batch: Jarque–Bera normality screen and the
  * chance-corrected classifier pair (Cohen's kappa + Matthews
  * correlation) — each replayed from first principles in JVM over the
  * raw fixture, plus the closed-form sanity points the definitions
  * promise (kappa/MCC are exactly 1 for a perfect predictor and 0 for
  * a marginal-independent one; JB ≥ 0 always). */
class Round11jSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  // decimal(18,6)-exact sum in scaled-long space
  private def dsumL(xs: Iterable[Double]): Double =
    xs.map(x => math.rint(x * 1e6).toLong).sum / 1e6

  private lazy val events: Array[(String, Double)] =
    Tables.events(spark, sf0001)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))

  private lazy val docs: Array[(Long, String, String, Long)] =
    Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("stats_jarque_bera: moments replicate JVM; JB nonnegative; a symmetric grid is skew-free through the same kernel") {
    def jb(xs: Seq[Double]): (Long, Double, Double, Double) = {
      val n = xs.length.toLong; val nd = n.toDouble
      val s1 = r6(dsumL(xs))
      val s2 = r6(dsumL(xs.map(x => r6(x * x))))
      val s3 = r6(dsumL(xs.map(x => r6(x * x * x))))
      val s4 = r6(dsumL(xs.map(x => r6(x * x * x * x))))
      val mu = s1 / nd
      val m2 = s2 / nd - mu * mu
      val m3 = s3 / nd - 3.0 * mu * s2 / nd + 2.0 * mu * mu * mu
      val m4 = s4 / nd - 4.0 * mu * s3 / nd + 6.0 * mu * mu * s2 / nd -
        3.0 * mu * mu * mu * mu
      val sk = r6(m3 / math.sqrt(m2 * m2 * m2))
      val ku = r6(m4 / (m2 * m2))
      (n, sk, ku, r6(nd / 6.0 * (sk * sk + (ku - 3.0) * (ku - 3.0) / 4.0)))
    }
    val want = events.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val (n, sk, ku, stat) = jb(xs.map(_._2 / 100.0).toSeq)
      (t, n, sk, ku, stat, stat <= 5.991465)
    }
    val got = SparkEntry.queries("stats_jarque_bera")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(got.toSeq == want)
    got.foreach(g => assert(g._5 >= 0.0, s"JB negative: $g"))
    // kernel sanity: a symmetric grid has skew exactly 0 and the
    // uniform's platykurtic signature (K < 3 ⇒ JB strictly positive)
    val (_, sk0, ku0, jb0) = jb((-50 to 50).map(_ / 100.0))
    assert(sk0 == 0.0 && ku0 < 3.0 && jb0 > 0.0)
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

  test("graph_connected_components: labels match a JVM union-find; counts conserve") {
    // reference: classic union-find with path compression
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    coEdges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = parent.keys.toSeq.map(v => (v, find(v)))
    // component id = MIN member: union always roots at the smaller id and
    // find fully compresses, so the root IS the min
    val sizes = comp.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nComponents = sizes.size.toLong
    val nCovered = comp.size.toLong
    val want = sizes.toSeq.map { case (c, n) => (c, n, nComponents, nCovered) }
      .sortBy(t => (-t._2, t._1)).take(20)
    val got = SparkEntry.queries("graph_connected_components")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want)
    // the component id really is the minimum member of its component
    comp.groupBy(_._2).foreach { case (c, vs) =>
      assert(vs.map(_._1).min == c, s"component $c root is not its min")
    }
    assert(got.map(_._2).sum <= nCovered)
  }

  test("ml_ndcg: dcg/idcg replicate a JVM ranking; ndcg in (0,1]; perfect ranking kernel gives exactly 1") {
    val scored = docs.map { case (id, lang, text, nc) =>
      (id, sigmoid6(nc, text.split(" ", -1).length),
        if (lang == "en") 1L else 0L) }
    val top = scored.sortBy(t => (-t._2, t._1)).take(20)
    def dcgOf(ys: Seq[Long], k: Int): Double =
      r6(dsumL(ys.take(k).zipWithIndex.map { case (y, i0) =>
        r6(y.toDouble / (math.log(i0 + 2.0) / math.log(2.0))) }))
    val nPos = scored.map(_._3).sum
    def idcgOf(k: Int): Double =
      r6(dsumL((1L to math.min(k.toLong, nPos)).map(i =>
        r6(1.0 / (math.log(i + 1.0) / math.log(2.0))))))
    val want = Seq(5, 10, 20).map { k =>
      val (d, id0) = (dcgOf(top.map(_._3).toSeq, k), idcgOf(k))
      (k, nPos, d, id0, r6(d / id0))
    }
    val got = SparkEntry.queries("ml_ndcg")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want)
    got.foreach(g => assert(g._5 > 0.0 && g._5 <= 1.0, s"ndcg out of range: $g"))
    // kernel sanity: an all-relevant top-k is a perfect ranking ⇒ ndcg 1
    // (ideal built over 1..k directly, so this holds however many
    // positives the corpus happens to have)
    Seq(5, 10, 20).foreach { k =>
      val ideal = r6(dsumL((1 to k).map(i =>
        r6(1.0 / (math.log(i + 1.0) / math.log(2.0))))))
      assert(r6(dcgOf(Seq.fill(20)(1L), k) / ideal) == 1.0)
    }
  }

  private def sigmoid6(nc: Long, nw: Int): Double = {
    val z = -1.0 + -1.5 * (nc.toDouble / 100.0) + 1.2 * (nw.toDouble / 10.0)
    r6(1.0 / (1.0 + math.exp(-z)))
  }

  test("ml_cohens_kappa: confusion matrix replicates; perfect predictor scores exactly 1 through the same kernel") {
    def kappaMcc(cm: (Long, Long, Long, Long)): (Double, Double, Double) = {
      val (tp, fp, fn, tn) = cm
      val n = (tp + fp + fn + tn).toDouble
      val po = (tp + tn).toDouble / n
      val pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)).toDouble / (n * n)
      val mcc = (tp * tn - fp * fn).toDouble /
        math.sqrt((tp + fp).toDouble * (tp + fn).toDouble *
          (tn + fp).toDouble * (tn + fn).toDouble)
      (r6(po), r6((po - pe) / (1.0 - pe)), r6(mcc))
    }
    val scored = docs.map { case (_, lang, text, nc) =>
      (sigmoid6(nc, text.split(" ", -1).length) >= 0.5,
        lang == "en") }
    val want = (
      scored.count(t => t._1 && t._2).toLong,
      scored.count(t => t._1 && !t._2).toLong,
      scored.count(t => !t._1 && t._2).toLong,
      scored.count(t => !t._1 && !t._2).toLong)
    val (acc, kap, mcc) = kappaMcc(want)
    val row = SparkEntry.queries("ml_cohens_kappa")(spark, sf0001)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == want)
    assert(row.getDouble(4) == acc && row.getDouble(5) == kap &&
      row.getDouble(6) == mcc)
    // both classes genuinely present on both axes (matrix not degenerate)
    assert(want._1 + want._2 > 0 && want._3 + want._4 > 0)
    assert(want._1 + want._3 > 0 && want._2 + want._4 > 0)
    // kernel sanity: perfect predictor ⇒ kappa = mcc = 1; a predictor
    // independent of the label (predict-by-coin-flip counts chosen so
    // the joint factorizes) ⇒ kappa = mcc = 0
    assert(kappaMcc((7L, 0L, 0L, 13L)) == ((1.0, 1.0, 1.0)))
    val (_, k0, m0) = kappaMcc((6L, 4L, 9L, 6L))
    assert(k0 == 0.0 && m0 == 0.0)
  }
}
