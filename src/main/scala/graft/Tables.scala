package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared table loaders + determinism helpers.
  *
  * Loading contract (SURVEY.md §1.2-1.3, FIXTURES.md):
  *   - All fixture tables are single parquet files under `$dir/<name>.parquet`.
  *   - `events.ts` is parquet `timestamp[ns]`, which Spark 4.x refuses to read
  *     by default (`PARQUET_TYPE_ILLEGAL`). We read it as epoch-nanos Long via
  *     `spark.sql.legacy.parquet.nanosAsLong` and derive a proper
  *     microsecond `TimestampType` with integer division (`ts div 1000`):
  *     floor-to-µs exactly matches DuckDB's own ns→µs read of the same file,
  *     giving exact oracle parity. (A double division `ts/1000` would lose
  *     precision: epoch-ns ≈ 1.7e18 > 2^53.)
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

  /** events with `ts` normalized to TimestampType (µs), exact DuckDB parity. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime conf; must be set before the first read of events.parquet in
    // this session. Harmless to re-set.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

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
