package graft

import org.apache.spark.sql.functions._

/** Round-11 eleventh batch: Kendall τ-b cross-series concordance and
  * item-item collaborative filtering — JVM replays over the raw
  * fixture plus the closed-form fixed points the definitions promise
  * (τ-b = ±1 on perfectly monotone pairs; CF cosine = 1 for items with
  * identical customer sets). */
class Round11kSpec extends SparkTestBase {

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  private def dsumL(xs: Iterable[Double]): Double =
    xs.map(x => math.rint(x * 1e6).toLong).sum / 1e6

  private def tauB(pts: Seq[(Long, Double)])
      : (Long, Long, Long, Long, Long, Double) = {
    val idx = pts.indices
    var nc = 0L; var nd = 0L; var tx = 0L; var ty = 0L; var np = 0L
    for (i <- idx; j <- idx if i < j) {
      np += 1
      val (xi, yi) = pts(i); val (xj, yj) = pts(j)
      if ((xj > xi && yj > yi) || (xj < xi && yj < yi)) nc += 1
      else if ((xj > xi && yj < yi) || (xj < xi && yj > yi)) nd += 1
      if (xj == xi) tx += 1
      if (yj == yi) ty += 1
    }
    val tau = r6((nc - nd).toDouble /
      math.sqrt((np - tx).toDouble * (np - ty).toDouble))
    (np, nc, nd, tx, ty, tau)
  }

  test("stats_kendall_tau: pair counts replicate JVM; monotone fixed points hit ±1") {
    val daily = Tables.orders(spark, sf0001)
      .select(col("o_orderdate").cast("date").cast("string"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, xs) => (xs.length.toLong, r6(dsumL(xs.map(_._2)))) }
    val (np, nc, nd, tx, ty, tau) = tauB(daily)
    val row = SparkEntry.queries("stats_kendall_tau")(spark, sf0001)
      .collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((np, nc, nd, tx, ty)))
    assert(row.getDouble(5) == tau)
    assert(tau >= -1.0 && tau <= 1.0)
    // sanity through the same kernel: strictly co-monotone ⇒ exactly +1,
    // anti-monotone ⇒ exactly −1, and a tie-heavy design stays inside
    val mono = (1L to 10L).map(i => (i, i.toDouble))
    assert(tauB(mono)._6 == 1.0)
    assert(tauB(mono.map { case (x, y) => (x, -y) })._6 == -1.0)
    val tied = Seq((1L, 1.0), (1L, 2.0), (2L, 2.0), (2L, 3.0))
    val t = tauB(tied)._6
    assert(t > 0.0 && t < 1.0)
  }

  test("rec_item_item_cf: cosine neighbor table replicates JVM; identical-customer-set items score 1 in the same kernel") {
    val cp = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf0001).select(col("l_orderkey"),
        col("l_partkey")), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    def table(pairs: Seq[(Long, Long)])
        : Seq[(Long, Long, Long, Long, Long, Double)] = {
      val byItem = pairs.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      val co = pairs.groupBy(_._1).values.toSeq.flatMap { xs =>
        val ps = xs.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      co.toSeq.filter(_._2 >= 2).map { case ((a, b), n) =>
        val (na, nb) = (byItem(a).size.toLong, byItem(b).size.toLong)
        (a, b, n, na, nb, r6(n.toDouble / math.sqrt(na.toDouble * nb.toDouble)))
      }.sortBy(t => (-t._6, t._1, t._2)).take(20)
    }
    val want = table(cp.toSeq)
    val got = SparkEntry.queries("rec_item_item_cf")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(got.toSeq == want)
    got.foreach(g => assert(g._6 > 0.0 && g._6 <= 1.0, s"cosine range: $g"))
    // kernel fixed point: two items bought by exactly the same two
    // customers have cosine exactly 1 and outrank a half-overlap pair
    val toy = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (1L, 12L), (3L, 12L), (2L, 13L), (3L, 13L))
    val tt = table(toy)
    assert(tt.head._6 == 1.0 && tt.head._1 == 10L && tt.head._2 == 11L)
    assert(tt.tail.forall(_._6 < 1.0))
  }
}
