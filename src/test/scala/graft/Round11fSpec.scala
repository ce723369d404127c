package graft

import org.apache.spark.sql.functions._

/** Round-11 sixth batch: referential-integrity audit, brand-partition
  * modularity, Holt double exponential smoothing — JVM replays plus
  * structural invariants (Σd_c = 2m, Q ∈ [−1, 1], Holt state exactly
  * reproducible by a sequential fold). */
class Round11fSpec extends SparkTestBase {

  test("audit_referential: counts replicate JVM; fixture is referentially intact") {
    def keys(df: org.apache.spark.sql.DataFrame, c: String): Array[Long] =
      df.select(c).collect().map(_.getAs[Number](0).longValue)
    val lo = keys(Tables.lineitem(spark, sf0001), "l_orderkey")
    val lp = keys(Tables.lineitem(spark, sf0001), "l_partkey")
    val ok = keys(Tables.orders(spark, sf0001), "o_orderkey")
    val oc = keys(Tables.orders(spark, sf0001), "o_custkey")
    val ck = keys(Tables.customer(spark, sf0001), "c_custkey")
    val cn = keys(Tables.customer(spark, sf0001), "c_nationkey")
    val nk = keys(Tables.nation(spark, sf0001), "n_nationkey")
    val pk = keys(Tables.part(spark, sf0001), "p_partkey")
    def dup(xs: Array[Long]) =
      xs.groupBy(identity).count(_._2.length > 1).toLong
    val want = Seq(
      ("fk_customer_nation", ck.length.toLong,
        cn.count(!nk.toSet.contains(_)).toLong),
      ("fk_lineitem_orders", lo.length.toLong,
        lo.count(!ok.toSet.contains(_)).toLong),
      ("fk_lineitem_part", lp.length.toLong,
        lp.count(!pk.toSet.contains(_)).toLong),
      ("fk_orders_customer", oc.length.toLong,
        oc.count(!ck.toSet.contains(_)).toLong),
      ("pk_customer", ck.distinct.length.toLong, dup(ck)),
      ("pk_orders", ok.distinct.length.toLong, dup(ok)),
      ("pk_part", pk.distinct.length.toLong, dup(pk)),
    ).map(t => (t._1, t._2, t._3, t._3 == 0L))
    val got = SparkEntry.queries("audit_referential")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
    // the driver fixture is referentially intact — all constraints green
    assert(got.forall(_._4), "expected a clean fixture")
  }

  test("graph_modularity: per-brand terms replicate JVM; degree identity and Q bounds hold") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brand = Tables.part(spark, sf0001).select("p_partkey", "p_brand")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val edges = li.distinct.groupBy(_._1).values.toSeq.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val m = edges.length.toLong
    val eC = edges.filter(e => brand(e._1) == brand(e._2))
      .groupBy(e => brand(e._1)).view.mapValues(_.size.toLong).toMap
    val dC = (edges.map(e => brand(e._1)) ++ edges.map(e => brand(e._2)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def r6(x: Double) = BigDecimal.decimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val terms = dC.keys.toSeq.sorted.map { b =>
      val e = eC.getOrElse(b, 0L)
      (b, e, dC(b), m, r6(e.toDouble / m -
        (dC(b).toDouble / (2 * m)) * (dC(b).toDouble / (2 * m))))
    }
    val qTotal = r6(terms.map(t =>
      BigDecimal.decimal(t._5).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble)
    val got = SparkEntry.queries("graph_modularity")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)).toSeq == terms,
      s"\n got ${got.toSeq}\nwant $terms")
    got.foreach(g => assert(g._6 == qTotal))
    assert(got.map(_._3).sum == 2 * m, "sum of community degrees must be 2m")
    assert(qTotal >= -1.0 && qTotal <= 1.0)
  }

  test("ts_holt_daily: recursive CTE state equals a JVM sequential fold") {
    val daily = Tables.events(spark, sf0001)
      .groupBy(unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .agg((sum(col("value").cast("decimal(18,6)")) * 1000000)
        .cast("long").as("y")).orderBy("day_us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var l = daily.head._2; var b = 0L
    val states = scala.collection.mutable.ArrayBuffer((daily.head._1,
      daily.head._2, l, b))
    daily.drop(1).foreach { case (d, y) =>
      val lNew = math.floor((y + l + b) / 2.0).toLong
      b = math.floor((lNew - l + b) / 2.0).toLong
      l = lNew
      states += ((d, y, l, b))
    }
    def r6(x: Double) = BigDecimal.decimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = SparkEntry.queries("ts_holt_daily")(spark, sf0001)
      .collect().sortBy(_.getAs[Number](0).longValue)
    assert(got.length == states.length)
    got.zip(states).zipWithIndex.foreach { case ((r, (d, y, sl, sb)), i) =>
      assert(r.getLong(1) == d)
      assert(r.getDouble(2) == r6(y / 1e6))
      assert(r.getDouble(3) == r6(sl / 1e6), s"level differs at rn ${i + 1}")
      assert(r.getDouble(4) == r6(sb / 1e6), s"trend differs at rn ${i + 1}")
      if (i > 0) {
        val (_, _, pl, pb) = states(i - 1)
        assert(r.getDouble(5) == r6((pl + pb) / 1e6), "forecast differs")
        assert(r.getDouble(6) == r6(math.abs(y - (pl + pb)) / 1e6))
      }
    }
    // the WITH RECURSIVE engine formulation is row-identical to the
    // bounded-collect fold the registered query uses (same oracle text)
    val rec = ops.Warehouse5.holtDailyRecursive(spark, sf0001)
      .collect().sortBy(_.getAs[Number](0).longValue)
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    val reg = got.map(r => (r.getAs[Number](0).longValue, r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4),
      if (r.isNullAt(5)) None else Some(r.getDouble(5)),
      if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    assert(rec.toSeq == reg.toSeq,
      "recursive-CTE twin must be row-identical to the bounded fold")
    // a constant series is a Holt fixed point: level locks to the
    // constant, trend to ~0 (floor rounding leaves at most 1 micro)
    var cl = 5000000L; var cb = 0L
    (1 to 10).foreach { _ =>
      val ln = math.floor((5000000L + cl + cb) / 2.0).toLong
      cb = math.floor((ln - cl + cb) / 2.0).toLong; cl = ln
    }
    assert(cl == 5000000L && math.abs(cb) <= 1L)
  }
}
