package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-tree guard: every PARTITION-LESS window definition in
  * `src/main` must be allowlisted here together with the reason its
  * frame is bounded. An unpartitioned `Window.orderBy` /
  * `Window.rowsBetween` / `Window.rangeBetween` / `Window.partitionBy()`
  * moves the WHOLE frame into one task — correct at any fixture SF and
  * a 100× scale-killer the moment the frame grows with the data (the
  * r11 "value-grain single-partition window" defect class; round 12's
  * `llm_cdc_chunks` slipped through because the r11 sweep only grepped
  * `Window.orderBy` — this spec closes BOTH shapes permanently, per
  * VERDICT r12 #2).
  *
  * To add a new unpartitioned window you must either (a) replace it:
  * running/cumulative statistics go through [[graft.ops.PrefixScan]],
  * whole-frame totals through a 1-row aggregate +
  * `crossJoin(broadcast(...))` (the tpch_q11 pattern, allowlisted in
  * PlanSpec); or (b) prove the frame is bounded BY CONSTRUCTION
  * (calendar / dimension / grid / top-k / quantization-saturated) and
  * record that proof as the allowlist justification below. */
class WindowGuardSpec extends AnyFunSuite {

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val (dirs, files) = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaFiles)
  }

  /** True iff the (non-comment) source line defines or uses an
    * unpartitioned window. Exposed for the matcher self-test. */
  private[graft] def isUnpartitionedWindowLine(raw: String): Boolean = {
    val t = raw.trim
    val comment = t.startsWith("*") || t.startsWith("//") || t.startsWith("/*")
    if (comment) return false
    val partitionless = (t.contains("Window.orderBy") ||
      t.contains("Window.rowsBetween") ||
      t.contains("Window.rangeBetween")) && !t.contains("partitionBy")
    partitionless || t.contains("Window.partitionBy()")
  }

  /** (file, enclosing query-level def) -> (hit count, boundedness
    * justification). Counts are exact: adding ANOTHER unpartitioned
    * window to an allowlisted def still fails the build. */
  private val allowed: Map[(String, String), (Int, String)] = Map(
    ("Llm7.scala", "hybridRrf") -> (2,
      "rank over two 20-row TakeOrdered frames (limit 20 runs upstream)"),
    ("Llm9.scala", "matryoshkaRecall") -> (1,
      "10-row query-panel frame (bounded probe set, the llm_ivf_ann shape)"),
    ("Llm8.scala", "zipfSlope") -> (1,
      "top-100 vocabulary-head frame (limit 100 runs upstream)"),
    ("Analytics.scala", "graphModularity") -> (1,
      "brand-grain frame, |p_brand| = 25 dimension-bounded"),
    ("Warehouse.scala", "tsPctChangeDaily") -> (1,
      "calendar: one row per day"),
    ("Audit.scala", "stlDaily") -> (1,
      "calendar: one row per day"),
    ("Ml.scala", "ndcg") -> (1,
      "20-row TakeOrdered frame (limit 20 runs upstream)"),
    ("Ml.scala", "brierDecomposition") -> (1,
      "10-bin probability grid"),
    ("Ml.scala", "learningCurve") -> (2,
      "B-bucket training-fraction grid (B = 5 by construction)"),
    ("Ml.scala", "kfoldCv") -> (1,
      "k = 5 fold panel"),
    ("Ml.scala", "daviesBouldin") -> (1,
      "label-grain cluster frame (|labels| dimension-bounded)"),
    ("Warehouse6.scala", "seasonalStrength") -> (2,
      "calendar: one row per hour"),
    ("Stats.scala", "benford") -> (1,
      "9-row leading-digit grid"),
    ("Stats.scala", "kaplanMeier") -> (2,
      "lifetime-hour grain, bounded by the observation horizon in hours"),
    ("Stats.scala", "chi2Independence") -> (1,
      "event_type × hour grid (|types|·24 rows)"),
    ("Stats.scala", "poissonBootstrap") -> (2,
      "32-row bootstrap-replica frame (BootB fixed)"),
    ("Stats.scala", "hillTail") -> (1,
      "201-row top-k frame (limit k+1 runs upstream)"),
    ("Stats2.scala", "anovaF") -> (1,
      "5-row order-priority panel"),
    ("Stats2.scala", "brownForsythe") -> (1,
      "5-row order-priority panel"),
    ("Stats2.scala", "durbinWatson") -> (3,
      "calendar: one row per hour"),
    ("Stats2.scala", "friedman") -> (1,
      "event_type × block panel (|types| rows after the per-type agg)"),
    ("Stats2.scala", "runsTest") -> (3,
      "calendar: one row per hour"),
    ("Stats2.scala", "wilcoxonSignedRank") -> (1,
      "calendar: distinct daily |d| values, one row per day at most"),
    ("Warehouse5.scala", "ewmaDeviation") -> (1,
      "calendar: one row per hour"),
    ("Warehouse5.scala", "stlDecompose") -> (1,
      "calendar: one row per hour"),
    ("Warehouse5.scala", "crossCorrTypes") -> (1,
      "calendar: one row per hour"),
    ("Warehouse5.scala", "openOrdersCurve") -> (2,
      "calendar: one row per day"),
    ("Warehouse5.scala", "holtDailyRecursive") -> (1,
      "calendar: one row per day"),
    ("Warehouse5.scala", "keySkewProfile") -> (2,
      "distinct-frequency frame: one row per distinct user-event COUNT, " +
        "sub-linear in the corpus (VERDICT r12 #3 accepted)"),
    ("Warehouse5.scala", "bollingerBands") -> (1,
      "calendar: one row per hour"),
    ("Warehouse5.scala", "changepointBinseg") -> (2,
      "calendar: one row per day"),
    ("Warehouse5.scala", "periodogram") -> (2,
      "calendar: one row per hour"),
    ("Warehouse5.scala", "hurstExponent") -> (2,
      "calendar: one row per hour"),
    ("Warehouse5.scala", "dowHourProfile") -> (1,
      "168-row dow × hour grid"))

  test("every partition-less window in src/main is allowlisted with a bound") {
    val defRe = raw"def\s+(\w+)\s*\(spark".r
    val hits = scalaFiles(new java.io.File("src/main/scala")).flatMap { f =>
      scala.util.Using.resource(scala.io.Source.fromFile(f, "UTF-8")) { src =>
        var enclosing = "<toplevel>"
        src.getLines().zipWithIndex.flatMap { case (line, i) =>
          defRe.findFirstMatchIn(line).foreach(m => enclosing = m.group(1))
          if (isUnpartitionedWindowLine(line))
            Some(((f.getName, enclosing), s"${f.getPath}:${i + 1}"))
          else None
        }.toList
      }
    }
    val counts = hits.groupBy(_._1).map { case (k, v) => k -> v.size }
    val unexpected = hits.filter { case (k, _) =>
      !allowed.contains(k) || counts(k) > allowed(k)._1
    }
    assert(unexpected.isEmpty,
      "unpartitioned window(s) outside the allowlist — a whole-frame " +
        "single-task shape. Replace with PrefixScan (cumulatives) or a " +
        "1-row broadcast cross (totals), or add an allowlist entry WITH " +
        "a boundedness justification:\n" +
        unexpected.map { case ((file, d), loc) => s"  $loc (in $d)" }
          .mkString("\n"))
    // stale entries rot the contract in the other direction: an
    // allowlisted def that no longer holds an unpartitioned window must
    // drop off the list (keeps the list = the exact current surface)
    val stale = allowed.keySet -- counts.keySet
    assert(stale.isEmpty, s"stale WindowGuard allowlist entries: $stale")
    val undercounted = allowed.collect {
      case (k, (n, _)) if counts.getOrElse(k, 0) < n => k
    }
    assert(undercounted.isEmpty,
      s"allowlist counts above actual — tighten: $undercounted")
  }

  test("matcher catches both defect shapes and skips comments") {
    assert(isUnpartitionedWindowLine(
      """val w = Window.orderBy(col("v"))"""))
    assert(isUnpartitionedWindowLine(
      "val wAll = Window.rowsBetween(Window.unboundedPreceding,"))
    assert(isUnpartitionedWindowLine("val w = Window.partitionBy()"))
    assert(!isUnpartitionedWindowLine(
      """val w = Window.partitionBy(col("k")).orderBy(col("v"))"""))
    assert(!isUnpartitionedWindowLine(
      """// an unpartitioned Window.orderBy(price) would be the defect"""))
    assert(!isUnpartitionedWindowLine(
      """* the scale-safe replacement for `Window.orderBy(v)`"""))
  }
}
