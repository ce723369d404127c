package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Release-gate audits a training-data pipeline runs before shipping a
  * corpus or publishing a table: k-anonymity over quasi-identifiers
  * (privacy) and keyed snapshot reconciliation (data integrity). */
object Audit {

  /** k-anonymity audit (Sweeney 2002, public): group the corpus by its
    * quasi-identifier tuple (lang, source, length bucket) and band the
    * equivalence classes by k — classes with k < 5 are the
    * re-identification risk a privacy review flags before release.
    * Pure two-phase agg (QI-keyed then band-keyed), map-side
    * combinable; the QI space, not the corpus, bounds the second
    * stage. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    documents(spark, dir)
      .groupBy(col("lang"), col("source"),
        expr("n_chars div 100").as("len_b"))
      .agg(count(lit(1)).as("k"))
      .withColumn("band",
        when(col("k") < 5, "k<5")
          .when(col("k") < 20, "5<=k<20")
          .otherwise("k>=20"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_docs"))
      .orderBy("band")
  }

  /** Keyed snapshot reconciliation (the table-diff every CDC/publish
    * pipeline runs to certify a new snapshot): diff the events table
    * against a DETERMINISTICALLY mutated twin (drop id%97=0, bump value
    * at id%101=0, clone id%103=0 under shifted ids) and report
    * added/removed/changed/unchanged counts. Full outer join on the
    * key with row-payload comparison — one equi shuffle each side; at
    * warehouse scale the same diff runs per partition-predicate slice.
    * The mutation constants are coprime so every status class is
    * provably non-empty on any fixture with ≥10k consecutive ids. */
  def tableDiff(spark: SparkSession, dir: String): DataFrame = {
    val a = events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val b0 = a.where(col("event_id") % 97 =!= 0)
      .withColumn("value",
        when(col("event_id") % 101 === 0, col("value") + 1.0)
          .otherwise(col("value")))
    val b = b0.unionByName(
      a.where(col("event_id") % 103 === 0)
        .withColumn("event_id", col("event_id") + lit(1000000000L)))
    val d = a.select(col("event_id"), col("value").as("a_value"))
      .join(b.select(col("event_id"), col("value").as("b_value")),
        Seq("event_id"), "full")
      .withColumn("status",
        when(col("a_value").isNull, "added")
          .when(col("b_value").isNull, "removed")
          .when(col("a_value") =!= col("b_value"), "changed")
          .otherwise("unchanged"))
    d.groupBy("status").agg(count(lit(1)).as("n"))
      .orderBy("status")
  }

  /** Hour-of-day seasonal baseline + residual flags — the
    * deseasonalization step before any threshold alerting on a metric
    * with a daily cycle (the L59 z-score's seasonal sibling). Baseline =
    * per-hour deterministic mean (`davg` decimal-sum contract); flags =
    * values exceeding their hour's baseline by a fixed margin. The
    * 24-row baseline broadcasts back onto the stream — two passes over
    * events, no window, map-side combinable both times. */
  def tsSeasonalHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(hour(col("ts")).as("h"), col("value"))
    val base = ev.groupBy("h")
      .agg(count(lit(1)).as("n"), davg(col("value")).as("mean_v"))
    ev.join(broadcast(base), "h")
      .groupBy("h")
      .agg(first(col("n")).as("n"),
        first(round(col("mean_v"), 6)).as("mean_r"),
        sum(when(col("value") > col("mean_v") + 50.0, 1L).otherwise(0L))
          .as("n_hi"))
      .orderBy("h")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "privacy_k_anonymity" -> (kAnonymity _),
    "cdc_table_diff" -> (tableDiff _),
    "ts_seasonal_hourly" -> (tsSeasonalHourly _),
  )

  val oracles: Map[String, String] = Map(
    "privacy_k_anonymity" ->
      """WITH cls AS (SELECT lang, source, n_chars // 100 AS len_b,
             COUNT(*) AS k
           FROM documents GROUP BY 1, 2, 3),
         bands AS (SELECT CASE WHEN k < 5 THEN 'k<5'
             WHEN k < 20 THEN '5<=k<20' ELSE 'k>=20' END AS band, k
           FROM cls)
         SELECT band, CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(k) AS BIGINT) AS n_docs
         FROM bands GROUP BY band ORDER BY band""",
    "cdc_table_diff" ->
      """WITH a AS (SELECT event_id, value FROM events),
         b AS (
           SELECT event_id,
             CASE WHEN event_id % 101 = 0 THEN value + 1.0 ELSE value END AS value
           FROM a WHERE event_id % 97 <> 0
           UNION ALL
           SELECT event_id + 1000000000 AS event_id, value
           FROM a WHERE event_id % 103 = 0),
         d AS (SELECT COALESCE(a.event_id, b.event_id) AS event_id,
             a.value AS a_value, b.value AS b_value
           FROM a FULL JOIN b ON a.event_id = b.event_id)
         SELECT CASE WHEN a_value IS NULL THEN 'added'
             WHEN b_value IS NULL THEN 'removed'
             WHEN a_value <> b_value THEN 'changed'
             ELSE 'unchanged' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n
         FROM d GROUP BY 1 ORDER BY 1""",
    "ts_seasonal_hourly" ->
      """WITH ev AS (SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS h, value
           FROM events),
         base AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS mean_v
           FROM ev GROUP BY 1)
         SELECT b.h, b.n, round(b.mean_v, 6) AS mean_r,
           CAST(SUM(CASE WHEN e.value > b.mean_v + 50.0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_hi
         FROM ev e JOIN base b ON e.h = b.h
         GROUP BY b.h, b.n, b.mean_v ORDER BY b.h""",
  )
}
