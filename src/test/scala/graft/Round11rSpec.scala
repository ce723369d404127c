package graft

import org.apache.spark.sql.functions._

/** Round-11 eighteenth batch: one-scan learning curve and the skyline
  * operator — JVM replays plus the structural guarantees (train RMSE
  * from the closed-form SSE matches a residual re-scan; no frontier
  * point dominates another; every non-frontier point is dominated by
  * some frontier point). */
class Round11rSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
  private def micro(x: Double): Long = math.rint(x * 1e6).toLong

  test("ml_learning_curve: closed-form SSE curve replicates JVM; test error computed on the fixed holdout") {
    val base = Tables.orders(spark, sf0001)
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1995-01-01").cast("date")).cast("long"),
        round(col("o_totalprice") / 1e3, 6),
        col("o_orderkey").cast("string"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Tables.h48jvm(r.getString(2)) % 10))
    def sums(rows: Seq[(Long, Double, Long)]) = {
      val n = rows.length.toLong
      val sx = rows.map(_._1).sum
      val sxx = rows.map(t => t._1 * t._1).sum
      val sy = rows.map(t => micro(t._2)).sum / 1e6
      val sxy = rows.map(t => micro(r6(t._1 * t._2))).sum / 1e6
      val syy = rows.map(t => micro(r6(t._2 * t._2))).sum / 1e6
      (n, sx, sxx, sy, sxy, syy)
    }
    val hold = sums(base.filter(_._3 == 9L).toSeq)
    val want = (1 to 9).map { b =>
      val (n, sx, sxx, sy, sxy, syy) = sums(base.filter(_._3 < b).toSeq)
      val nd = n.toDouble
      val beta = (nd * sxy - sx * sy) / (nd * sxx - sx.toDouble * sx)
      val alpha = (sy - beta * sx) / nd
      def sse(s: (Long, Long, Long, Double, Double, Double)): Double = {
        val (n0, sx0, sxx0, sy0, sxy0, syy0) = s
        syy0 - 2.0 * alpha * sy0 - 2.0 * beta * sxy0 +
          n0 * alpha * alpha + 2.0 * alpha * beta * sx0 +
          beta * beta * sxx0
      }
      (b * 10, n, r6(beta), r6(alpha),
        r6(math.sqrt(sse((n, sx, sxx, sy, sxy, syy)) / nd)),
        r6(math.sqrt(sse(hold) / hold._1)))
    }
    val got = SparkEntry.queries("ml_learning_curve")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want)
    // the closed-form SSE IS the residual sum: re-derive rmse_train for
    // the 50% point by brute residual scan and compare to the same 6dp
    val half = base.filter(_._3 < 5L).toSeq
    val (n, sx, sxx, sy, sxy, _) = sums(half)
    val beta = (n.toDouble * sxy - sx * sy) / (n.toDouble * sxx - sx.toDouble * sx)
    val alpha = (sy - beta * sx) / n.toDouble
    val brute = math.sqrt(half.map { case (x, y, _) =>
      val e = y - (alpha + beta * x); e * e }.sum / n)
    assert(math.abs(brute - want(4)._5) < 1e-4,
      s"closed-form vs residual scan: $brute vs ${want(4)._5}")
    // diagnostic shape: training error grows with data, far-from-zero
    assert(want.last._5 > 0.0 && want.head._2 < want.last._2)
  }

  test("pareto_frontier_parts: skyline replicates JVM; dominance checked exhaustively both ways") {
    val pts = Tables.part(spark, sf0001)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
      .groupBy(t => (t._2, t._3)).map { case ((p, s), xs) =>
        (p, s, xs.size.toLong, xs.map(_._1).min) }.toSeq
    def dominates(a: (Double, Int), b: (Double, Int)): Boolean =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    val want = pts.filter(p => !pts.exists(q =>
        dominates((q._1, q._2), (p._1, p._2))))
      .sortBy(_._1).map(t => (t._1, t._2, t._3, t._4))
    val got = SparkEntry.queries("pareto_frontier_parts")(spark, sf0001)
      .collect().map(r => (r.getDouble(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == want)
    assert(got.nonEmpty)
    // exhaustive both ways: no frontier point dominates another, and
    // every excluded point is dominated by at least one frontier point
    val front = got.map(g => (g._1, g._2)).toSet
    for (a <- front; b <- front if a != b)
      assert(!dominates(a, b), s"$a dominates fellow frontier point $b")
    pts.filter(p => !front((p._1, p._2))).foreach { p =>
      assert(front.exists(f => dominates(f, (p._1, p._2))),
        s"excluded point $p dominated by no frontier point")
    }
  }
}
