package graft

import org.apache.spark.sql.functions._

/** Round-11 fifth batch: content-defined chunking, feature hashing,
  * normal-equation OLS — JVM replays plus the invariants each method
  * promises (chunking is lossless per doc; hashed buckets stay in
  * [0, D); R² ∈ [0, 1] and the two solved betas satisfy the normal
  * equations they came from). */
class Round11eSpec extends SparkTestBase {

  private def rN(x: Double, n: Int): Double =
    BigDecimal.decimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r6(x: Double): Double = rN(x, 6)

  private lazy val docs: Array[(Long, String)] =
    Tables.documents(spark, sf0001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  test("llm_cdc_chunks: boundaries/chunks replicate h48jvm; chunking is lossless per doc") {
    val chunked: Seq[(Long, Seq[String])] = docs.toSeq.map { case (id, text) =>
      val words = text.split(" ", -1).toSeq
      val chunks = scala.collection.mutable.ArrayBuffer[String]()
      val cur = scala.collection.mutable.ArrayBuffer[String]()
      words.foreach { w =>
        cur += w
        if (Tables.h48jvm(w) % 8 == 0) { chunks += cur.mkString(" "); cur.clear() }
      }
      if (cur.nonEmpty) chunks += cur.mkString(" ")
      // losslessness: content-defined edges never drop or reorder words
      assert(chunks.mkString(" ") == text, s"doc $id chunking not lossless")
      (id, chunks.toSeq)
    }
    val freq = chunked.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong)
    val nChunks = chunked.map(_._2.size.toLong).sum
    val nDistinct = freq.size.toLong
    val dupRatio = r6((nChunks - nDistinct).toDouble / nChunks.toDouble)
    val want = freq.toSeq.filter(_._2 >= 2)
      .sortBy { case (t, n) => (-n, t) }.take(15)
      .map { case (t, n) => (t, n, nChunks, nDistinct, dupRatio) }
    val got = SparkEntry.queries("llm_cdc_chunks")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
    assert(got.nonEmpty, "fixture must contain duplicated chunks")
  }

  test("ml_feature_hashing: triplets + collision audit replicate h48jvm") {
    val words = docs.flatMap { case (id, t) =>
      t.split(" ", -1).map(w => (id, w, Tables.h48jvm(w) % 64)) }
    val perDoc = words.filter(_._1 < 10)
      .groupBy(w => (w._1, w._3)).view.mapValues(_.length.toLong).toMap
    val load = words.groupBy(_._3).view
      .mapValues(_.map(_._2).distinct.length.toLong).toMap
    val want = perDoc.toSeq
      .map { case ((id, b), c) => (id, b, c, load(b)) }
      .sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("ml_feature_hashing")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want)
    got.foreach(t => assert(t._2 >= 0 && t._2 < 64))
  }

  test("ml_ols_multi: centered Cramer solve replicates JVM; normal equations hold") {
    val li = Tables.lineitem(spark, sf0001).select("l_partkey", "l_quantity",
      "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val pr = Tables.part(spark, sf0001).select("p_partkey", "p_retailprice")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rows = li.flatMap { case (pk, q, ep) => pr.get(pk).map { rp =>
      (q.toLong, math.rint(rp * 100).toLong, math.rint(ep * 100).toLong) } }
    val n = rows.length.toDouble
    def s(f: ((Long, Long, Long)) => BigInt): Double =
      rows.map(f).sum.toDouble
    val (sx1, sx2, sy) = (s(r => BigInt(r._1)), s(r => BigInt(r._2)), s(r => BigInt(r._3)))
    val sx1x1 = s(r => BigInt(r._1) * BigInt(r._1))
    val sx1x2 = s(r => BigInt(r._1) * BigInt(r._2))
    val sx2x2 = s(r => BigInt(r._2) * BigInt(r._2))
    val sx1y = s(r => BigInt(r._1) * BigInt(r._3))
    val sx2y = s(r => BigInt(r._2) * BigInt(r._3))
    val syy = s(r => BigInt(r._3) * BigInt(r._3))
    val a11 = sx1x1 - sx1 * sx1 / n; val a12 = sx1x2 - sx1 * sx2 / n
    val a22 = sx2x2 - sx2 * sx2 / n
    val b1 = sx1y - sx1 * sy / n; val b2 = sx2y - sx2 * sy / n
    val det = a11 * a22 - a12 * a12
    val bet1 = (b1 * a22 - b2 * a12) / det
    val bet2 = (a11 * b2 - a12 * b1) / det
    val beta0 = r6((sy - bet1 * sx1 - bet2 * sx2) / n / 100.0)
    val r2 = r6((bet1 * b1 + bet2 * b2) / (syy - sy * sy / n))
    val got = SparkEntry.queries("ml_ols_multi")(spark, sf0001).collect().head
    assert(got.getLong(0) == rows.length.toLong)
    assert(got.getDouble(1) == beta0)
    assert(got.getDouble(2) == r6(bet1 / 100.0))
    assert(got.getDouble(3) == r6(bet2))
    assert(got.getDouble(4) == r2)
    assert(r2 >= 0.0 && r2 <= 1.0)
    // the solved betas satisfy the centered normal equations
    assert(math.abs(a11 * bet1 + a12 * bet2 - b1) / math.abs(b1) < 1e-9)
    assert(math.abs(a12 * bet1 + a22 * bet2 - b2) / math.abs(b2) < 1e-9)
  }

  private def us(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  test("attribution_position: U-shaped credits replicate JVM; each journey's credits sum to ~1") {
    val ev = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), us(r.getTimestamp(1)), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val credits = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      // reverse running count of purchases assigns each touch its NEXT purchase
      var g2 = ordered.count(_._4 == "purchase").toLong
      val groups = scala.collection.mutable.Map[Long,
        scala.collection.mutable.ArrayBuffer[String]]()
      val pv = scala.collection.mutable.Map[Long, Double]()
      ordered.foreach { r =>
        if (r._4 == "purchase") { pv(g2) = r._5; g2 -= 1 }
        else if ((r._4 == "view" || r._4 == "click") && g2 > 0)
          groups.getOrElseUpdate(g2, scala.collection.mutable.ArrayBuffer()) += r._4
      }
      groups.foreach { case (gg, ts) =>
        val k = ts.length
        ts.zipWithIndex.foreach { case (t, i) =>
          val c = if (k == 1) 1.0 else if (k == 2) 0.5
            else if (i == 0 || i == k - 1) 0.4 else r6(0.2 / (k - 2))
          credits += ((t, r6(c * pv(gg))))
        }
        // U-shaped credits sum to 1 modulo the round-6 middle split
        val csum = ts.zipWithIndex.map { case (_, i) =>
          if (k == 1) 1.0 else if (k == 2) 0.5
          else if (i == 0 || i == k - 1) 0.4 else r6(0.2 / (k - 2)) }.sum
        assert(math.abs(csum - 1.0) < k * 1e-6)
      }
    }
    val want = credits.groupBy(_._1).view.map { case (t, xs) =>
      (t, xs.size.toLong, r6(xs.map(x => BigDecimal.decimal(x._2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("attribution_position")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
  }

  test("ml_kfold_cv: closed-form leave-fold-out replicates JVM") {
    val os = Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val byF = os.groupBy(o => Tables.h48jvm(o._1.toString) % 5)
    val sF = byF.view.mapValues(v => r6(v.map(_._2).map(x =>
      math.rint(x * 1e6).toLong).sum / 1e6)).toMap
    val n = os.length.toLong
    val s = r6(sF.values.map(x => math.rint(x * 1e6).toLong).sum / 1e6)
    val want = byF.toSeq.sortBy(_._1).map { case (f, v) =>
      val m = rN((s - sF(f)) / (n - v.length), 2)
      val ssq = v.map { case (_, y) =>
        val d = (y - m) / 1000.0
        (BigDecimal.decimal(r6(d * d)) * BigDecimal(1000000)).toLongExact
      }.sum / 1e6
      (f, v.length.toLong, m, r6(math.sqrt(ssq / v.length)))
    }
    val got = SparkEntry.queries("ml_kfold_cv")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
    assert(got.length == 5)
  }

  test("llm_readability: Flesch formulas replicate Java-regex JVM counts") {
    val full = Tables.documents(spark, sf0001).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val perDoc = full.map { case (lang, text) =>
      val words = text.split(" ", -1).length.toLong
      val sentences = math.max("[.!?]+".r.findAllIn(text).length.toLong, 1L)
      val syll = math.max("[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong, 1L)
      val wps = r6(words.toDouble / sentences.toDouble)
      val spw = r6(syll.toDouble / words.toDouble)
      (lang, r6(206.835 - 1.015 * wps - 84.6 * spw),
        r6(0.39 * wps + 11.8 * spw - 15.59))
    }
    val want = perDoc.groupBy(_._1).view.map { case (l, xs) =>
      def davg(v: Seq[Double]) =
        r6(v.map(x => math.rint(x * 1e6).toLong).sum / 1e6 / v.length)
      (l, xs.length.toLong, davg(xs.map(_._2).toSeq), davg(xs.map(_._3).toSeq),
        r6(xs.map(_._3).min), r6(xs.map(_._3).max))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("llm_readability")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want, s"\n got ${got.toSeq}\nwant $want")
  }
}
