package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional file
  * skipping — the storage-side complement to partitioning/bucketing.
  *
  * A single-dimension sort gives perfect file pruning on that dimension
  * and NONE on any other: at 100 TB, a time-sorted events table answers
  * time-range queries from a handful of files but scans every file for a
  * user-range query. Interleaving the bits of two bucketed dimensions
  * into one sort key makes file z-ranges correspond to rectangles in
  * (x, y) space, so BOTH single-dimension and conjunctive 2-D predicates
  * skip most files, and parquet row-group min/max stats on the natural
  * columns stay tight within each file (the pushed filter then skips the
  * row groups a naive layout would read).
  *
  * Everything here is pure `Column` bit arithmetic — codegen'd, no UDF,
  * usable inside any plan. The one driver transfer (the global min/max
  * row for linear bucketing) is a single row through
  * [[graft.Tables.boundedCollect]].
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (the classic
    * 4-round mask/shift Morton spread). */
  private def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = (a.bitwiseOR(shiftleft(a, 8))).bitwiseAND(lit(0x00FF00FFL))
    val d = (b.bitwiseOR(shiftleft(b, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val e = (d.bitwiseOR(shiftleft(d, 2))).bitwiseAND(lit(0x33333333L))
    (e.bitwiseOR(shiftleft(e, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit bucket ids: `x` in even bit
    * positions, `y` in odd. Monotone in each argument with the other
    * fixed; contiguous z-ranges are unions of (x, y) rectangles. */
  def interleave16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Append z-key column `zCol` bucketing (`cx`, `cy`) each to 2^16
    * levels by global linear min/max (one aggregation pass; the bounds
    * row is the only driver transfer). A constant column lands wholly in
    * bucket 0 — the z-key degrades to a plain sort on the other
    * dimension. Null in either dimension yields a null z-key (sorts
    * first, i.e. its own leading file range) — except when that whole
    * dimension is null, which is treated as constant, since per-row
    * propagation would null every key. */
  def withZKey(df: DataFrame, cx: String, cy: String,
      zCol: String = "z"): DataFrame = {
    val bounds = graft.Tables.boundedCollect(
      df.agg(min(col(cx)).cast("double"), max(col(cx)).cast("double"),
        min(col(cy)).cast("double"), max(col(cy)).cast("double")),
      maxRows = 1, what = "z-order global min/max row")
    if (bounds.isEmpty) return df.withColumn(zCol, lit(0L)) // empty input
    val r = bounds.head
    // per-dimension degenerate bounds, two distinct cases:
    //  - ALL-null dimension: the column carries no ordering information at
    //    all, so every row gets bucket 0 and the key degrades to a sort on
    //    the other dimension (per-row propagation would null EVERY key);
    //  - constant non-null dimension: non-null rows land in bucket 0, but
    //    null rows STILL null the key, matching the per-row null
    //    propagation of the linear branch below (a constant dimension must
    //    not quietly give partially-null rows a real z-key)
    def bucket(c: Column, loIdx: Int, hiIdx: Int): Column =
      if (r.isNullAt(loIdx)) lit(0L)
      else if (r.getDouble(hiIdx) <= r.getDouble(loIdx))
        when(c.isNull, lit(null)).otherwise(lit(0L))
      else {
        val (lo, hi) = (r.getDouble(loIdx), r.getDouble(hiIdx))
        val raw = floor((c.cast("double") - lit(lo)) / lit(hi - lo) * 65536.0)
          .cast("long")
        // when/otherwise, NOT least(): least skips nulls and would place a
        // null dimension in the top bucket instead of nulling the key
        when(raw > 65535L, 65535L).otherwise(raw)
      }
    df.withColumn(zCol, interleave16(bucket(col(cx), 0, 1), bucket(col(cy), 2, 3)))
  }

  /** Write `df` z-ordered on (`cx`, `cy`) as `nFiles` z-range files:
    * `repartitionByRange` aligns file boundaries with z quantiles (range
    * exchange = one sampling pass + one shuffle, the same cost as any
    * global sort), `sortWithinPartitions` keeps row groups tight inside
    * each file. The z column is retained in the output — its per-file
    * min/max is itself a useful skipping index. */
  def writeZOrdered(df: DataFrame, cx: String, cy: String, nFiles: Int,
      path: String): Unit =
    withZKey(df, cx, cy).repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(path)
}
