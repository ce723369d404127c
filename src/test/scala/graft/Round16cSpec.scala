package graft

import org.apache.spark.sql.functions._

/** Round-16 third leg: the LSH banding-parameter audit — the (b, r)
  * S-curve story pinned end to end against a JVM brute-force ground
  * truth. */
class Round16cSpec extends SparkTestBase {

  test("band audit: recall/cost S-curve is monotone and ground truth matches brute force") {
    val rows = SparkEntry.queries("llm_dedup_band_audit")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(7)))
    assert(rows.length === 4)
    // ordered (8,1) -> (1,8): the selectivity sweep
    assert(rows.map(t => (t._1, t._2)).toSeq ===
      Seq((8L, 1L), (4L, 2L), (2L, 4L), (1L, 8L)))
    // s* midpoints rise with selectivity; candidates fall; recall falls
    assert(rows.map(_._3).toSeq === rows.map(_._3).sorted.toSeq)
    assert(rows.map(_._4).toSeq === rows.map(_._4).sorted.reverse.toSeq)
    assert(rows.map(_._7).toSeq === rows.map(_._7).sorted.reverse.toSeq)
    // r=1 ORs 8 single minhashes: a >=0.5-Jaccard pair collides on at
    // least one with overwhelming margin on this corpus — full recall
    assert(rows.head._7 === 1.0)
    // every config shares one ground-truth denominator
    assert(rows.map(_._5).distinct.length === 1)
    // detected <= candidates and <= true everywhere
    rows.foreach { t => assert(t._6 <= t._4 && t._6 <= t._5) }

    // brute-force JVM ground truth: distinct 3-word shingle Jaccard >= 0.5
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val shingles = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      id -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    var nTrue = 0L
    for (i <- shingles.indices; j <- i + 1 until shingles.length) {
      val (a, b) = (shingles(i)._2, shingles(j)._2)
      val ix = a.intersect(b).size
      if (ix > 0 && ix.toDouble / (a.size + b.size - ix) >= 0.5) nTrue += 1
    }
    assert(rows.head._5 === nTrue, "oracle ground-truth pair count diverged")
  }

  test("tokenizer bakeoff: totals cross-pin the BPE and unigram keys; winner is the integer verdict") {
    val bake = SparkEntry.queries("llm_tokenizer_bakeoff")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(6)))
    assert(bake.length === 5) // the five fixture languages
    // per-language BPE totals must equal llm_bpe_tokenize's n_tokens —
    // the bakeoff reads the SAME learned segmentation
    val bpeTok = SparkEntry.queries("llm_bpe_tokenize")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    bake.foreach { case (lang, nWords, bpeT, _, _) =>
      assert((nWords, bpeT) === bpeTok(lang), s"$lang BPE totals diverged")
    }
    // corpus-wide unigram total must equal llm_unigram_loss round 2's
    // n_tokens (same round-2 segmentation, summed over languages)
    val uniTotal = SparkEntry.queries("llm_unigram_loss")(spark, sf0001)
      .collect().find(_.getLong(0) == 2L).get.getLong(2)
    assert(bake.map(_._4).sum === uniTotal, "unigram totals diverged")
    // winner is decided on integers, and on this corpus the unigram
    // model's richer 25-piece-or-so vocabulary beats five BPE merges
    bake.foreach { case (lang, _, bpeT, uniT, winner) =>
      val want = if (bpeT < uniT) "bpe" else if (bpeT > uniT) "unigram" else "tie"
      assert(winner === want, s"$lang winner")
      assert(winner === "unigram", s"$lang: five merges cannot out-compress 2-round EM here")
    }
  }
}
