package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 closing composition: the tokenizer BAKEOFF — per-language
  * fertility of the corpus's two self-trained tokenizers, L370's
  * five-merge BPE vs L393's two-round unigram-LM, decided on exact
  * integer token counts. "Which tokenizer do we train with" is the
  * decision the induction ops exist to inform (Mielke et al. 2021,
  * "Between words and characters", surveys exactly this comparison);
  * this key closes the loop: both models are learned from the SAME
  * corpus by the SHARED machinery the green keys run, applied back at
  * (lang, word) grain, and the winner column compares integer token
  * totals — no float in the verdict (fertilities are round-6 readouts,
  * not decision inputs). 100-TB shape: both learned segmentations are
  * vocab-bounded (word, n_tokens) tables riding broadcast joins onto
  * one (lang, word) aggregate — the L372 contract, twice.
  *
  * Load sensitivity (VERDICT r16 `weak`, closed r17 with a pinned
  * measurement, SURVEY §8r): 8.5 s driver-loaded vs 1.7 s idle with
  * byte-identical shuffle — the key re-trains both tokenizers
  * (driver-loop rounds of small jobs), so ambient load multiplies its
  * many-fixed-overhead-jobs profile; the round-17 JVM-flag experiment
  * pinned that code-cache sizing does not move it, while the
  * codegen-cache enlargement (now default) removes the regeneration
  * share, and per-key `jit_ms` attributes the rest. */
object Llm16 {

  def tokenizerBakeoff(spark: SparkSession, dir: String): DataFrame = {
    val bpe = Llm11.segN(spark, dir)
      .select(col("word"), col("n_sym").as("bpe_sym"))
    val uni = Llm14.segmentsRound2(spark, dir)
      .select(col("word"), col("n_pieces").as("uni_sym"))
    val byLang = documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
    byLang.join(broadcast(bpe), "word").join(broadcast(uni), "word")
      .groupBy("lang")
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("bpe_sym")).as("bpe_tokens"),
        sum(col("cnt") * col("uni_sym")).as("unigram_tokens"))
      .select(col("lang"), col("n_words"), col("bpe_tokens"),
        col("unigram_tokens"),
        round(col("bpe_tokens").cast("double") / col("n_words"), 6)
          .as("bpe_fertility"),
        round(col("unigram_tokens").cast("double") / col("n_words"), 6)
          .as("unigram_fertility"),
        when(col("bpe_tokens") < col("unigram_tokens"), lit("bpe"))
          .when(col("bpe_tokens") > col("unigram_tokens"), lit("unigram"))
          .otherwise(lit("tie")).as("winner"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_tokenizer_bakeoff" -> (tokenizerBakeoff _),
  )

  val oracles: Map[String, String] = Map(
    "llm_tokenizer_bakeoff" ->
      s"""WITH ${Llm14.wcSql},
         ${Llm11.bpeChainSql},
         ${Llm14.trainSqlBody},
         un AS (SELECT word,
             CAST(len(string_split(seg, chr(1))) - 1 AS BIGINT) AS uni_sym
           FROM r2best),
         bl AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
             FROM documents)
           WHERE len(word) > 0 GROUP BY 1, 2)
         SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(SUM(cnt * segn.n_sym) AS BIGINT) AS bpe_tokens,
           CAST(SUM(cnt * un.uni_sym) AS BIGINT) AS unigram_tokens,
           round(CAST(SUM(cnt * segn.n_sym) AS BIGINT)
             / CAST(SUM(cnt) AS DOUBLE), 6) AS bpe_fertility,
           round(CAST(SUM(cnt * un.uni_sym) AS BIGINT)
             / CAST(SUM(cnt) AS DOUBLE), 6) AS unigram_fertility,
           CASE WHEN CAST(SUM(cnt * segn.n_sym) AS BIGINT)
                  < CAST(SUM(cnt * un.uni_sym) AS BIGINT) THEN 'bpe'
                WHEN CAST(SUM(cnt * segn.n_sym) AS BIGINT)
                  > CAST(SUM(cnt * un.uni_sym) AS BIGINT) THEN 'unigram'
                ELSE 'tie' END AS winner
         FROM bl JOIN segn USING (word) JOIN un USING (word)
         GROUP BY lang ORDER BY lang""",
  )
}
