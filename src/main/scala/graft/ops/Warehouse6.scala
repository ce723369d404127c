package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 warehouse batch III: frequent 3-itemsets, hour-of-day
  * percentile bands, and the end-to-end pretraining-data funnel. */
object Warehouse6 {

  /** L291 — frequent 3-itemset mining over order baskets (one rung up
    * from L204's pairwise lift: the triple level is where "bundle"
    * recommendations actually come from, and the level at which naive
    * candidate generation first explodes). Same scale contract as the
    * L204/L220 basket trick: triples are generated ROW-LOCALLY from
    * each order's sorted distinct-part array — per-order work C(k,3)
    * bounded by basket size, never a three-way corpus self-join — then
    * one triple-keyed support count. Support ≥ 2, top-15 by (support,
    * triple). */
  def basketTopTriples(spark: SparkSession, dir: String): DataFrame = {
    val triples = lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(flatten(flatten(expr(
        """transform(ps, (a, i) ->
             transform(slice(ps, i + 2, size(ps) - i - 1), (b, j) ->
               transform(slice(ps, i + j + 3, size(ps) - i - j - 2), c ->
                 struct(a AS pa, b AS pb, c AS pc))))""")))).as("t"))
    triples
      .groupBy(col("t.pa").as("part_a"), col("t.pb").as("part_b"),
        col("t.pc").as("part_c"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
      .orderBy(col("support").desc, col("part_a"), col("part_b"), col("part_c"))
      .limit(15)
  }

  /** L292 — hour-of-day percentile BANDS of event value (p50/p90/p99 +
    * n per clock hour — the distributional widening of L187's
    * hour-of-day mean baseline: an alerting threshold set at the p99
    * band instead of mean+kσ survives non-Gaussian traffic). Exact
    * interpolated percentiles (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, the L21 identity) over 24 bounded groups; one
    * map-side-combinable aggregate shuffle at any scale. */
  def hourlyPercentiles(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy("hod")

  /** L293 — the END-TO-END pretraining-data funnel (the composition a
    * real data pipeline runs nightly, emitted as the per-stage funnel
    * table every data-quality dashboard shows: raw → exact-dedup →
    * length gate → readability band → packed 4096-token windows). Each
    * stage reuses a family primitive (J1 hash dedup, L12-style length
    * gate, L283 Flesch–Kincaid band, L107 packing arithmetic); counts
    * are one conditional aggregate over the keeper frame, window
    * arithmetic in exact integers ((wc+4095) div 4096). The funnel
    * row set is POSITIVE evidence of every stage's effect — the
    * pct_of_prev column is the knob-tuning readout. */
  def e2ePipeline(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"))
    val wc = size(split(col("text"), " ")).cast("long")
    val sentences = greatest(
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("long"),
      lit(1L))
    val syllables = greatest(
      size(regexp_extract_all(lower(col("text")), lit("[aeiouy]+"), lit(0)))
        .cast("long"), lit(1L))
    val wps = round(wc.cast("double") / sentences.cast("double"), 6)
    val spw = round(syllables.cast("double") / wc.cast("double"), 6)
    val grade = round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6)
    val keepers = documents(spark, dir)
      .withColumn("h", md5(col("text")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("text"))
      .withColumn("wc", wc)
      .withColumn("len_ok", col("wc") >= 20 && col("wc") <= 10000)
      .withColumn("grade", grade)
      .withColumn("read_ok", col("grade") >= 2.0 && col("grade") <= 15.0)
    val agg = keepers.agg(
      count(lit(1)).as("n1"),
      sum(when(col("len_ok"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("len_ok") && col("read_ok"), 1L).otherwise(0L)).as("n3"),
      coalesce(sum(when(col("len_ok") && col("read_ok"),
        expr("(wc + 4095) div 4096"))), lit(0L)).as("n4"))
    val n0 = documents(spark, dir).agg(count(lit(1)).as("n0"))
    agg.crossJoin(broadcast(n0))
      .select(expr(
        """stack(5,
             0, 'raw_docs', n0, CAST(NULL AS BIGINT),
             1, 'exact_dedup', n1, n0,
             2, 'length_gate', n2, n1,
             3, 'readability_band', n3, n2,
             4, 'packed_windows_4096', n4, CAST(NULL AS BIGINT))
           AS (stage, label, n_units, prev)"""))
      .select(col("stage"), col("label"), col("n_units"),
        round(col("n_units").cast("double") / col("prev").cast("double"), 6)
          .as("pct_of_prev"))
      .orderBy("stage")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "basket_top_triples" -> (basketTopTriples _),
    "ts_hourly_percentiles" -> (hourlyPercentiles _),
    "llm_e2e_pipeline" -> (e2ePipeline _),
  )

  private val evTs = "CAST(ts AS TIMESTAMP)"

  val oracles: Map[String, String] = Map(
    "basket_top_triples" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
           FROM lineitem)
         SELECT a.p AS part_a, b.p AS part_b, c.p AS part_c,
           CAST(COUNT(*) AS BIGINT) AS support
         FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
           JOIN op c ON b.o = c.o AND b.p < c.p
         GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
         ORDER BY support DESC, part_a, part_b, part_c LIMIT 15""",
    "ts_hourly_percentiles" ->
      s"""SELECT hour($evTs) AS hod, CAST(COUNT(*) AS BIGINT) AS n,
         round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
         round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
         round(quantile_cont(CAST(value AS DOUBLE), 0.99), 6) AS p99
         FROM events GROUP BY 1 ORDER BY 1""",
    "llm_e2e_pipeline" ->
      """WITH k AS (SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS wc
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
               ORDER BY doc_id) AS rn FROM documents)
           WHERE rn = 1),
         f AS (SELECT *,
             wc >= 20 AND wc <= 10000 AS len_ok,
             round(0.39 * round(CAST(wc AS DOUBLE)
                 / CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS DOUBLE), 6)
               + 11.8 * round(CAST(GREATEST(len(regexp_extract_all(lower(text),
                   '[aeiouy]+')), 1) AS DOUBLE)
                 / CAST(wc AS DOUBLE), 6)
               - 15.59, 6) AS grade
           FROM k),
         a AS (SELECT
             CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN len_ok AND grade >= 2.0 AND grade <= 15.0
               THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             COALESCE(CAST(SUM(CASE WHEN len_ok AND grade >= 2.0
                 AND grade <= 15.0 THEN (wc + 4095) // 4096 END) AS BIGINT), 0)
               AS n4
           FROM f),
         n0t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM documents),
         funnel AS (
           SELECT 0 AS stage, 'raw_docs' AS label, n0 AS n_units,
             CAST(NULL AS BIGINT) AS prev FROM n0t
           UNION ALL SELECT 1, 'exact_dedup', n1, n0 FROM a, n0t
           UNION ALL SELECT 2, 'length_gate', n2, n1 FROM a
           UNION ALL SELECT 3, 'readability_band', n3, n2 FROM a
           UNION ALL SELECT 4, 'packed_windows_4096', n4,
             CAST(NULL AS BIGINT) FROM a)
         SELECT stage, label, n_units,
           round(CAST(n_units AS DOUBLE) / CAST(prev AS DOUBLE), 6)
             AS pct_of_prev
         FROM funnel ORDER BY stage""",
  )
}
