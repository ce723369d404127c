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
}
