package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared time-axis quantization expressions. The batch operators and
  * their streaming twins (`join_range_bucketed` / `Streams.
  * rangeJoinBucketed`, `stream_cumulate_counts` / `Streams.
  * cumulateCounts`) build their bucket arithmetic from THESE helpers, so
  * a boundary-rule fix cannot silently diverge one twin from the other —
  * the drift mode the CEP twins' scaladoc documents is structurally
  * closed for the bucketed family.
  *
  * All helpers take column NAMES (not Columns) because exact integer
  * division needs SQL `div`; a double-typed `/` can round a
  * one-off-the-boundary timestamp up and land it in the wrong bucket.
  *
  * Division is FLOOR division, built as `(e - pmod(e, w)) div w` — still
  * all-integer, but aligned with the DuckDB oracles' `//` and with the
  * covering-bucket theorem for NEGATIVE (pre-epoch) instants too, where
  * `div`'s truncation toward zero would shift every bucket boundary by
  * one and silently drop range-join pairs straddling zero. For
  * nonnegative inputs the two are identical (pmod = %), so fixture
  * results are unchanged. */
object TimeBuckets {

  /** `floor(e / w)` in exact integer arithmetic: pmod is nonnegative, so
    * `e - pmod(e, w)` is the largest multiple of `w` ≤ e and the `div`
    * is exact (no truncation ambiguity). */
  private def floorDiv(e: String, w: Long): String =
    s"((($e) - pmod(($e), ${w}L)) div ${w}L)"

  /** Bucket id of instant `tsCol` on a `w`-wide grid. */
  def bucketOf(tsCol: String, w: Long): Column = expr(floorDiv(tsCol, w))

  /** The 1 or 2 grid buckets covering the HALF-OPEN interval
    * [ts, ts + w): last covered instant is ts + w − 1, so a span-aligned
    * interval genuinely collapses to a single bucket (`array_distinct`
    * is live, not decorative). */
  def coveringBuckets(tsCol: String, w: Long): Column =
    array_distinct(array(
      expr(floorDiv(tsCol, w)), expr(floorDiv(s"$tsCol + ${w - 1}L", w))))

  /** CUMULATE covering ends for an event at `tsCol` whose span starts at
    * `wsCol`: every step-aligned end STRICTLY past the event (an event
    * on a step boundary belongs to the NEXT end), up to and including
    * the span close. `ts − ws` is nonnegative by construction (the event
    * lies inside its span), so plain `div` is already floor here. */
  def cumulateEnds(tsCol: String, wsCol: String,
      span: Long, step: Long): Column =
    sequence(
      col(wsCol) + (expr(s"($tsCol - $wsCol) div ${step}L") + 1) * step,
      col(wsCol) + span, lit(step))
}
