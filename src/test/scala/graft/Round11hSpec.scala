package graft

import org.apache.spark.sql.functions._

/** Round-11 eighth batch: frequent triples, hour-of-day percentile
  * bands, end-to-end pretraining funnel — JVM replays plus funnel
  * monotonicity and percentile-band ordering invariants. */
class Round11hSpec extends SparkTestBase {

  private def r6(x: Double): Double =
    BigDecimal.decimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("basket_top_triples: row-local C(k,3) generation replicates a JVM pass") {
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val triples = li.distinct.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length;
           k <- j + 1 until ps.length)
        yield (ps(i), ps(j), ps(k))
    }.toSeq
    val want = triples.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2).toSeq
      .map { case ((a, b, c), s) => (a, b, c, s) }
      .sortBy(t => (-t._4, t._1, t._2, t._3)).take(15)
    val got = SparkEntry.queries("basket_top_triples")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
    got.foreach(t => assert(t._1 < t._2 && t._2 < t._3,
      "triples must be strictly ordered"))
  }

  test("ts_hourly_percentiles: interpolated quantiles replicate JVM; bands ordered") {
    val ev = Tables.events(spark, sf0001).select(hour(col("ts")), col("value"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    def q(v: Seq[Double], p: Double): Double = {
      val s = v.sorted
      val rank = (s.length - 1) * p
      val lo = math.floor(rank).toInt; val hi = math.ceil(rank).toInt
      r6(s(lo) + (rank - lo) * (s(hi) - s(lo)))
    }
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (h, xs) =>
      val v = xs.map(_._2).toSeq
      (h, v.length.toLong, q(v, 0.5), q(v, 0.9), q(v, 0.99))
    }
    val got = SparkEntry.queries("ts_hourly_percentiles")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == want, s"\n got ${got.take(3).toSeq}…\nwant ${want.take(3)}…")
    got.foreach(g => assert(g._3 <= g._4 && g._4 <= g._5,
      "percentile bands must be ordered"))
    assert(got.length == 24)
  }

  test("llm_e2e_pipeline: funnel replicates JVM; stages monotone") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val keepers = docs.groupBy(d => java.security.MessageDigest.getInstance("MD5")
        .digest(d._2.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .values.map(_.minBy(_._1)).toSeq
    val flagged = keepers.map { case (_, text) =>
      val wc = text.split(" ", -1).length.toLong
      val sent = math.max("[.!?]+".r.findAllIn(text).length.toLong, 1L)
      val syl = math.max("[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong, 1L)
      val wps = r6(wc.toDouble / sent); val spw = r6(syl.toDouble / wc)
      val grade = r6(0.39 * wps + 11.8 * spw - 15.59)
      (wc, wc >= 20 && wc <= 10000, grade >= 2.0 && grade <= 15.0)
    }
    val n0 = docs.length.toLong
    val n1 = keepers.length.toLong
    val n2 = flagged.count(_._2).toLong
    val n3 = flagged.count(f => f._2 && f._3).toLong
    val n4 = flagged.filter(f => f._2 && f._3).map(f => (f._1 + 4095) / 4096).sum
    val want = Seq(
      (0, "raw_docs", n0, None),
      (1, "exact_dedup", n1, Some(r6(n1.toDouble / n0))),
      (2, "length_gate", n2, Some(r6(n2.toDouble / n1))),
      (3, "readability_band", n3, Some(r6(n3.toDouble / n2))),
      (4, "packed_windows_4096", n4, None))
    val got = SparkEntry.queries("llm_e2e_pipeline")(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
    assert(n0 >= n1 && n1 >= n2 && n2 >= n3, "funnel must be monotone")
    assert(n3 > 0, "fixture must survive the funnel")
  }
}
