package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Shared table loaders + determinism helpers.
  *
  * Loading contract (SURVEY.md §1.2-1.3, FIXTURES.md):
  *   - All fixture tables are single parquet files under `$dir/<name>.parquet`.
  *   - Time columns have shipped in TWO fixture generations and the loaders
  *     dispatch on the read schema to support both:
  *     (a) pre-2026-08-13 drops: `events.ts` was parquet `timestamp[ns]`
  *     (readable only as epoch-nanos Long under
  *     `spark.sql.legacy.parquet.nanosAsLong`; normalized here with
  *     `timestamp_micros(ts div 1000)` — integer floor-to-µs, exactly
  *     DuckDB's own ns→µs read; a double `ts/1000` would lose precision
  *     since epoch-ns ≈ 1.7e18 > 2^53), and orders/lineitem dates were
  *     UTC-adjusted `timestamp[ms]` (plain TimestampType read).
  *     (b) current drops: all time columns are plain `timestamp[us]`
  *     without UTC adjustment, which Spark 4 reads as TIMESTAMP_NTZ —
  *     normalized here by casting to session-zone TimestampType (the
  *     repo-wide UTC session makes that cast wall-clock identity, and
  *     `tools/check.py` pins DuckDB to UTC too), so every downstream
  *     operator keeps seeing the TimestampType it was built against.
  *
  * Determinism contract (SURVEY.md §7.5): double aggregation order differs
  * between Spark's partial aggregation and DuckDB's single-threaded fold, so
  * raw `sum(double)` hash-mismatches the oracle. Every declared query sums
  * money/value doubles through `dsum`/`davg`: cast each input to
  * DECIMAL(18,6) (deterministic half-up rounding in both engines), sum
  * exactly in decimal, cast the final sum back to double (deterministic
  * nearest-double). The oracle SQL mirrors the same shape:
  * `CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)`.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Cast any TIMESTAMP_NTZ column to session-zone TimestampType (see the
    * loading contract above — identity wall clock under the UTC session). */
  private def tsNorm(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == types.TimestampNTZType)
      .foldLeft(df)((d, f) => d.withColumn(f.name, col(f.name).cast("timestamp")))

  /** events with `ts` normalized to TimestampType (µs), exact DuckDB parity. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime conf; must be set before the first read of events.parquet in
    // this session (legacy ns fixtures only). Harmless to re-set.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case types.LongType => // generation (a): int64 epoch-nanos
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => tsNorm(raw) // generation (b): timestamp[us] NTZ
    }
  }

  // NOTE (round 17, measured): fanout does NOT belong in these loaders.
  // Wrapping lineitem/orders in fanout regressed every probe key
  // (rev_hhi_parts 1.51→2.03 s, tpch_q21 1.44→2.14, tpch_q18 1.02→1.57,
  // agg_pricing_summary 0.49→0.72, join_orders_customer 0.72→0.95 at
  // sf0.1): the raw-row exchange costs more than the single-task
  // map-side work it parallelizes at these row counts. fanout is applied
  // per operator where the per-row compute is the measured cost.
  def lineitem(spark: SparkSession, dir: String): DataFrame = tsNorm(table(spark, dir, "lineitem"))
  def orders(spark: SparkSession, dir: String): DataFrame = tsNorm(table(spark, dir, "orders"))
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Scan-stage parallelism for compute-heavy row-local operators
    * (round-17 optimization, guide §2.5 "input skew"). Spark derives
    * scan task count from file SPLITS; the fixture tables are single
    * row-group parquet files, so every scan — and with it all per-row
    * work up to the first exchange (codec kernels, tokenization,
    * hashing) — runs in ONE task regardless of core count (measured:
    * mm_video_scene_cut 3.9 s at local[32] ≈ the single-thread kernel
    * cost). `fanout` round-robin-repartitions to the session's
    * parallelism so those stages use the machine; it never SHRINKS a
    * frame that already has more partitions (at production scale, file
    * splits supply the parallelism and this is the identity). Apply it
    * only where per-row compute is the measured cost — it buys nothing
    * on scan-cheap relational paths and would add one (tiny) exchange. */
  def fanout(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // plan-time split count from the UNOPTIMIZED physical plan: a
    // `.rdd`-based probe was measured re-materializing AQE query stages
    // on every call (mm_frame_sample 0.7 → 8.1 s across three suite
    // runs); `sparkPlan` only plans. Scans report their file-split
    // count; anything unknown (0) is treated as narrow and spread.
    val known = try df.queryExecution.sparkPlan.outputPartitioning.numPartitions
      catch { case _: Throwable => 0 }
    if (known >= p) df else df.repartition(p)
  }

  // ---- float-determinism helpers (see scaladoc above) ----

  /** Exact, order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")

  /** Deterministic average: exact decimal sum, then double division. */
  def davg(c: Column): Column = dsum(c) / count(c).cast("double")

  /** Deterministic average of an integral column. */
  def lavg(c: Column): Column = sum(c).cast("double") / count(c).cast("double")

  // ---- portable 48-bit hash (Spark ⋄ DuckDB ⋄ JVM) ----
  // h48(s) = first 12 hex chars of md5(s) as an integer. Both engines have
  // md5; the hex→int fold is exact 48-bit integer arithmetic. Powers
  // MinHash / SimHash / fingerprint / LSH operators with oracle parity
  // (Spark's xxhash64 has no DuckDB twin — SURVEY.md §7.5.3).

  /** Column form: 48-bit integer hash of a string column. */
  def h48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** JVM twin of [[h48]] for mapPartitions-side code; bit-identical. */
  def h48jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(6).map(b => f"$b%02x").mkString, 16)
  }

  /** Driver-side collect with an explicit cap — the ONLY sanctioned
    * `collect()` on a query path (CollectGuardSpec greps the source tree
    * for strays). `limit(max+1)` bounds the transfer itself, so an
    * oversized input fails loudly here instead of OOMing the driver at
    * warehouse scale. */
  def boundedCollect[T](ds: org.apache.spark.sql.Dataset[T], maxRows: Int,
      what: String): Array[T] = {
    val rows = ds.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"$what exceeds the driver-collect cap ($maxRows rows) — " +
        "use the banded/bucketed scale path instead of the brute baseline")
    rows
  }

  /** DuckDB SQL expression text equivalent to [[h48]] over expression `e`:
    * fold the 12 hex chars to a 48-bit int (DuckDB has no hex→int cast). */
  def h48Sql(e: String): String =
    // lambda var deliberately obscure: callers embed this inside their own
    // lambdas (e.g. over a dimension index i) and must not be shadowed
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1,13), hx_i -> " +
      s"CAST(strpos('0123456789abcdef', substr(md5($e),hx_i,1)) - 1 AS BIGINT))), " +
      s"(hx_a,hx_b) -> hx_a*16 + hx_b)"
}
