package graft

import org.apache.spark.sql.functions._

/** Round-15 continuation: matrix-profile legs — a full JVM replica of
  * the z-normalized subsequence profile and its motif/discord reading. */
class Round15iSpec extends SparkTestBase {

  private def r6(x: Double): Double =
    BigDecimal.decimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("matrix profile: JVM replica reproduces the motif and discord panels at sf0.001") {
    val m = 24
    val xs = Tables.events(spark, sf0001)
      .groupBy(date_trunc("hour", col("ts")).as("b"))
      .agg(round(Tables.dsum(col("value")), 6).as("x"))
      .orderBy("b").collect().map(_.getDouble(1))
    val nSub = xs.length - m + 1
    def sub(i: Int) = xs.slice(i - 1, i - 1 + m) // 1-based i
    val stats = (1 to nSub).flatMap { i =>
      val s = r6(sub(i).map(BigDecimal.decimal(_).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      val ss = r6(sub(i).map(x => BigDecimal.decimal(r6(x * x)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      val mu = r6(s / m)
      val sigma = r6(math.sqrt(math.max(0.0, r6(ss / m - mu * mu))))
      if (sigma > 0.0) Some(i -> ((mu, sigma))) else None
    }.toMap
    val pairD2 = for {
      i <- 1 to nSub; j <- (i + m) to nSub
      if stats.contains(i) && stats.contains(j)
    } yield {
      val sxy = r6((0 until m).map(k =>
        BigDecimal.decimal(r6(sub(i)(k) * sub(j)(k))).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      val (mui, si) = stats(i)
      val (muj, sj) = stats(j)
      val corr = r6((sxy - m * mui * muj) / (m * si * sj))
      (i, j, r6(2.0 * m * (1.0 - corr)))
    }
    val both = pairD2 ++ pairD2.map { case (i, j, d) => (j, i, d) }
    val prof = both.groupBy(_._1).map { case (i, ps) =>
      val best = ps.minBy(p => (p._3, p._2))
      (i.toLong, best._2.toLong, best._3)
    }.toSeq
    val motifs = prof.sortBy(p => (p._3, p._1)).take(3)
    val discords = prof.sortBy(p => (-p._3, p._1)).take(3)
    val got = SparkEntry.queries("ts_matrix_profile")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val gotM = got.filter(_._1 == "motif").sortBy(_._2)
      .map(r => (r._3, r._4, r._5)).toSeq
    val gotD = got.filter(_._1 == "discord").sortBy(_._2)
      .map(r => (r._3, r._4, r._5)).toSeq
    assert(gotM === motifs)
    assert(gotD === discords)
    assert(motifs.head._3 < discords.head._3,
      "the best motif must be tighter than the worst discord")
    assert(prof.forall(_._3 >= -1e-9), "z-normalized d2 is non-negative")
  }

  test("Otsu: BigInt argmax replica from the pixel formula, and class separation on the low-contrast band") {
    // replica for doc 1 (low contrast: v in [60, 100))
    val f = 1
    val hist = new Array[Long](256)
    for (x <- 0 until 64; y <- 0 until 64)
      hist(60 + (3 * x + 5 * y + 17 * f) % 40) += 1
    val n = 4096L
    val sTot = (0 until 256).map(v => v * hist(v)).sum
    var w0 = 0L; var s0 = 0L
    var bestT = -1; var best = BigInt(-1)
    for (t <- 0 until 256) {
      w0 += hist(t); s0 += t * hist(t)
      val w1 = n - w0
      if (w0 > 0 && w1 > 0) {
        val num = BigInt(s0) * w1 - BigInt(sTot - s0) * w0
        val score = num * num * 1000000 / (BigInt(w0) * w1)
        if (score > best) { best = score; bestT = t }
      }
    }
    val got = ops.MmOtsu.otsuOf(1L)
    assert(got.otsu_threshold === bestT.toLong)
    // the threshold lands inside the occupied band and separates means
    assert(got.otsu_threshold >= 60L && got.otsu_threshold < 99L)
    assert(got.mean_below < got.mean_above)
    assert(got.n_below + got.n_above === 4096L)
  }

  test("Sobel: formula replica for one family, and both edge classes exercised") {
    val f = 2 // doc 2: low contrast
    def v(x: Int, y: Int) = 60 + (3 * x + 5 * y + 17 * f) % 40
    var edges = 0L; var sum = 0L; var mx = 0L
    for (y <- 1 until 63; x <- 1 until 63) {
      val gx = (v(x + 1, y - 1) + 2 * v(x + 1, y) + v(x + 1, y + 1)) -
        (v(x - 1, y - 1) + 2 * v(x - 1, y) + v(x - 1, y + 1))
      val gy = (v(x - 1, y + 1) + 2 * v(x, y + 1) + v(x + 1, y + 1)) -
        (v(x - 1, y - 1) + 2 * v(x, y - 1) + v(x + 1, y - 1))
      val m = math.abs(gx).toLong + math.abs(gy)
      if (m >= 80) edges += 1
      sum += m; mx = math.max(mx, m)
    }
    val got = ops.MmSobel.sobelOf(2L)
    assert((got.n_edges, got.sum_mag, got.max_mag) === ((edges, sum, mx)))
    assert(got.n_edges > 0L && got.n_edges < got.n_interior,
      "both smooth and edge pixels must exist")
  }
}
