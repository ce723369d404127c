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
