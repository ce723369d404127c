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
}
