package graft

import org.apache.spark.sql.functions._

/** Round-11 twenty-first batch: one-scan correlation matrix and the
  * ingest-volume anomaly monitor — JVM replays plus the algebraic
  * anchors (r of a column with a positive affine image of itself is 1;
  * the robust z of the median day is 0). */
class Round11uSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
  private def micro(x: Double): Long = math.rint(x * 1e6).toLong

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val idx = (s.length - 1) * p
    val lo = idx.toInt; val frac = idx - lo
    if (lo + 1 < s.length) s(lo) + frac * (s(lo + 1) - s(lo)) else s(lo)
  }

  // the query's cross-term quantization: floor(v·10⁶ + 0.5) long micros
  // (identical double ops in Spark / DuckDB / here — not BigDecimal)
  private def fmicro(v: Double): Long = math.floor(v * 1000000.0 + 0.5).toLong

  private def rOf(xs: Seq[Double], ys: Seq[Double]): Double = {
    val n = xs.length.toDouble
    val sx = xs.map(micro).sum / 1e6
    val sy = ys.map(micro).sum / 1e6
    val sxx = xs.map(x => fmicro(x * x)).sum / 1e6
    val syy = ys.map(y => fmicro(y * y)).sum / 1e6
    val sxy = xs.zip(ys).map { case (x, y) => fmicro(x * y) }.sum / 1e6
    r6((n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)))
  }

  test("agg_corr_matrix: six pairwise r's replicate JVM; affine self-correlation is exactly 1") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .collect().map(r => (r.getDouble(0), r.getDouble(1) / 1e3,
        r.getDouble(2), r.getDouble(3)))
    val colsByName = Map(
      "quantity" -> li.map(_._1).toSeq, "price_k" -> li.map(_._2).toSeq,
      "discount" -> li.map(_._3).toSeq, "tax" -> li.map(_._4).toSeq)
    val names = Seq("quantity", "price_k", "discount", "tax")
    val want = (for (i <- names.indices; j <- i + 1 until names.length)
      yield (li.length.toLong, names(i), names(j),
        rOf(colsByName(names(i)), colsByName(names(j)))))
      .sortBy(t => (t._2, t._3))
    val got = SparkEntry.queries("agg_corr_matrix")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3)))
    assert(got.toSeq == want)
    got.foreach(g => assert(g._4 >= -1.0 && g._4 <= 1.0))
    // the fixture's measures are drawn independently — every pairwise r
    // is near zero (|r| < 0.1), which is itself the informative readout
    got.foreach(g => assert(math.abs(g._4) < 0.1,
      s"independent fixture columns correlate: $g"))
    assert(got.exists(_._4 != 0.0), "all r exactly zero?")
    // kernel anchor: x vs 2x+3 through the same sums is exactly 1
    val xs = Seq(1.0, 2.5, 4.0, 7.25, 9.5)
    assert(rOf(xs, xs.map(x => 2.0 * x + 3.0)) == 1.0)
  }

  test("dq_volume_anomaly: robust-z page replicates JVM; median day scores 0") {
    val daily = Tables.events(spark, sf0001)
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("d")), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val med = r6(pct(daily.map(_._2.toDouble).toSeq, 0.5))
    val mad = r6(pct(daily.map(t => math.abs(t._2.toDouble - med)).toSeq, 0.5))
    val want = daily.map { case (d, n) =>
      val z = r6(0.6745 * (n.toDouble - med) / mad)
      (d, n, med, mad, z, math.abs(z) > 3.5)
    }.sortBy(t => (-math.abs(t._5), t._1)).take(20).toSeq
    val got = SparkEntry.queries("dq_volume_anomaly")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(got.toSeq == want)
    // anchor: a day counting exactly the median scores exactly 0
    assert(r6(0.6745 * (med - med) / mad) == 0.0)
    // scale sanity: mad strictly positive on the fixture
    assert(mad > 0.0)
  }
}
