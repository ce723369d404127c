package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed inclusive prefix aggregates over a globally ordered frame —
  * the scale-safe replacement for `Window.orderBy(v)` with NO partition
  * spec, which puts every distinct value in ONE task (the r11 verdict's
  * "value-grain single-partition window" defect class: Spearman/KS/
  * Kruskal–Wallis/Gini/skyline frames grow linearly with the corpus until
  * quantization saturates, so the unpartitioned window is a 100× scale
  * killer even though it is correct today).
  *
  * Algorithm — the classic two-pass parallel scan, in the same
  * range-partition + per-partition-offset style as [[Er.windowPairs]]'s
  * zipWithIndex rank (oracle-proven bit-equal to ROW_NUMBER there):
  *
  *   1. `repartitionByRange(order)` + `sortWithinPartitions(order)` — the
  *      global sort, distributed across P tasks;
  *   2. pass 1: each partition reduces its scan columns to ONE totals row;
  *      the driver collects P rows (partition-count-grain, never
  *      data-grain) and prefix-combines them into exclusive offsets;
  *   3. pass 2: each partition re-streams its sorted rows (shuffle files
  *      are reused — the exchange runs once), emitting running aggregates
  *      seeded with its offset.
  *
  * Both passes hang off the SAME RDD lineage, so the range exchange (and
  * its sampled partition boundaries) is planned and executed once; pass 2
  * reads the map output pass 1 already produced. Order keys must form a
  * total order (the callers all scan a grouped DISTINCT-value frame, so
  * the keys are unique by construction) — ties across partition
  * boundaries would otherwise make the split nondeterministic.
  *
  * Exactness contract: long sums in 64-bit integers; decimal sums in
  * BigDecimal (the input column must already be the exact
  * `decimal(18,6)` quantization — same as feeding Spark's decimal
  * `sum`), surfaced as DOUBLE via the same decimal→double conversion
  * `cast("double")` performs. Global totals ride back to the driver for
  * free (they are the last offsets), so callers replace their
  * whole-frame `rowsBetween(unboundedPreceding, unboundedFollowing)`
  * window — the SAME single-partition shape in disguise — with exact
  * literals.
  */
object PrefixScan {

  /** Global totals of the scanned columns (exact; keyed by INPUT name). */
  final case class Totals(longs: Map[String, Long],
      decs: Map[String, java.math.BigDecimal])

  /** @param df        input frame (any schema; all columns pass through)
    * @param order     globally unique ordering key columns
    * @param sumsLong  (inputCol → outputCol): inclusive running Long sum
    * @param sumsDec   (inputCol → outputCol): inclusive running decimal
    *                  sum over an exact decimal input, emitted as DOUBLE
    * @param maxLongExcl (inputCol → outputCol): EXCLUSIVE running max
    *                  (strictly earlier rows only; null at the global
    *                  head — the `rowsBetween(unboundedPreceding, -1)`
    *                  frame of a skyline prefix-max)
    * @param parts     range partitions; 0 → `defaultParallelism`
    * @return the frame with appended scan columns, plus global totals */
  def apply(df: DataFrame, order: Seq[String],
      sumsLong: Seq[(String, String)] = Nil,
      sumsDec: Seq[(String, String)] = Nil,
      maxLongExcl: Seq[(String, String)] = Nil,
      parts: Int = 0): (DataFrame, Totals) = {
    val spark = df.sparkSession
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val inSchema = df.schema
    val idxOf = inSchema.fieldNames.zipWithIndex.toMap
    val li = sumsLong.map { case (in, _) => idxOf(in) }.toArray
    val di = sumsDec.map { case (in, _) => idxOf(in) }.toArray
    val mi = maxLongExcl.map { case (in, _) => idxOf(in) }.toArray

    // numeric accessors tolerant of int/long (counts) and any exact
    // decimal scale (the callers quantize to 18,6 but the scan itself
    // only needs exactness, not a fixed scale)
    def longAt(r: Row, i: Int): Long = r.get(i) match {
      case l: Long => l
      case n: Int  => n.toLong
      case s: Short => s.toLong
      case other => throw new IllegalArgumentException(
        s"prefixScan long column holds ${other.getClass}")
    }
    def decAt(r: Row, i: Int): java.math.BigDecimal = r.get(i) match {
      case d: java.math.BigDecimal => d
      case d: scala.math.BigDecimal => d.bigDecimal
      case other => throw new IllegalArgumentException(
        s"prefixScan decimal column holds ${other.getClass}")
    }

    val ranged = df.repartitionByRange(p, order.map(col): _*)
      .sortWithinPartitions(order.map(col): _*)
    val rdd = ranged.rdd

    // pass 1: per-partition totals — P driver rows, partition-count-grain
    val partTotals = rdd.mapPartitionsWithIndex { (pid, it) =>
      val ls = new Array[Long](li.length)
      val ds = Array.fill(di.length)(java.math.BigDecimal.ZERO)
      val ms = new Array[Long](mi.length)
      val mSeen = new Array[Boolean](mi.length)
      it.foreach { r =>
        var i = 0
        while (i < li.length) { ls(i) += longAt(r, li(i)); i += 1 }
        i = 0
        while (i < di.length) { ds(i) = ds(i).add(decAt(r, di(i))); i += 1 }
        i = 0
        while (i < mi.length) {
          val v = longAt(r, mi(i))
          if (!mSeen(i) || v > ms(i)) { ms(i) = v; mSeen(i) = true }
          i += 1
        }
      }
      Iterator((pid, ls, ds, ms, mSeen))
    }.collect().sortBy(_._1)

    // exclusive prefix offsets per partition id
    val offL = Array.fill(p, li.length)(0L)
    val offD = Array.fill(p, di.length)(java.math.BigDecimal.ZERO)
    val offM = Array.fill(p, mi.length)(0L)
    val offMSeen = Array.fill(p, mi.length)(false)
    val runL = new Array[Long](li.length)
    val runD = Array.fill(di.length)(java.math.BigDecimal.ZERO)
    val runM = new Array[Long](mi.length)
    val runMSeen = new Array[Boolean](mi.length)
    partTotals.foreach { case (pid, ls, ds, ms, mSeen) =>
      var i = 0
      while (i < li.length) { offL(pid)(i) = runL(i); runL(i) += ls(i); i += 1 }
      i = 0
      while (i < di.length) {
        offD(pid)(i) = runD(i); runD(i) = runD(i).add(ds(i)); i += 1 }
      i = 0
      while (i < mi.length) {
        offM(pid)(i) = runM(i); offMSeen(pid)(i) = runMSeen(i)
        if (mSeen(i) && (!runMSeen(i) || ms(i) > runM(i))) {
          runM(i) = ms(i); runMSeen(i) = true }
        i += 1
      }
    }
    val totals = Totals(
      sumsLong.map(_._1).zip(runL).toMap,
      sumsDec.map(_._1).zip(runD).toMap)

    val outSchema = StructType(inSchema.fields ++
      sumsLong.map { case (_, o) => StructField(o, LongType, nullable = false) } ++
      sumsDec.map { case (_, o) => StructField(o, DoubleType, nullable = false) } ++
      maxLongExcl.map { case (_, o) => StructField(o, LongType, nullable = true) })

    // pass 2: running aggregates seeded with the partition offset
    val nL = li.length; val nD = di.length; val nM = mi.length
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val curL = offL(pid).clone()
      val curD = offD(pid).clone()
      val curM = offM(pid).clone()
      val curMSeen = offMSeen(pid).clone()
      it.map { r =>
        val appended = new Array[Any](nL + nD + nM)
        var i = 0
        while (i < nL) {
          curL(i) += longAt(r, li(i)); appended(i) = curL(i); i += 1 }
        i = 0
        while (i < nD) {
          curD(i) = curD(i).add(decAt(r, di(i)))
          appended(nL + i) = curD(i).doubleValue; i += 1 }
        i = 0
        while (i < nM) {
          // exclusive: emit the max of strictly earlier rows FIRST
          appended(nL + nD + i) =
            if (curMSeen(i)) java.lang.Long.valueOf(curM(i)) else null
          val v = longAt(r, mi(i))
          if (!curMSeen(i) || v > curM(i)) { curM(i) = v; curMSeen(i) = true }
          i += 1
        }
        Row.fromSeq(r.toSeq ++ appended)
      }
    }
    (spark.createDataFrame(outRdd, outSchema), totals)
  }

  /** Distributed DENSE RANK over `order` (bit-equal to SQL
    * `dense_rank() OVER (ORDER BY order)`), in the same two-pass
    * range-partition discipline as [[apply]] — ONE exchange, a
    * partition-count-grain driver combine, and the rank pass re-reading
    * the exchange's shuffle files; never a single-partition window and
    * never a distinct+join round-trip (the round-17 suffix-array
    * profile showed the distinct → range-sort → zipWithIndex → join
    * form paying four exchanges per doubling round where this pays
    * one). Unlike [[apply]], `order` keys need NOT be unique: pass 1
    * reduces each partition to (distinct-run count, first key, last
    * key); the driver stitches runs that span partition boundaries
    * (first key == previous partition's last key) into exclusive rank
    * offsets; pass 2 re-streams each sorted partition assigning
    * offset + local dense rank (−1 when the first run continues).
    *
    * Returns the input frame + a `rankCol` LONG column, and the TOTAL
    * distinct-key count — which callers in a fixpoint loop (prefix
    * doubling) use as a FREE convergence check: ranks are a permutation
    * iff totalDistinct == row count. */
  /** [[denseRank]] fast path for integer keys with a KNOWN dense domain
    * (round-17 optimization, guide §2.4): when the leading key is a Long
    * in [1, keyMax] — every dense rank produced by a PREVIOUS denseRank
    * pass qualifies, which is exactly the prefix-doubling loop's shape —
    * the range partitioning needs no sampling: rows go to deterministic
    * key-range BUCKETS (16·p contiguous ranges, hash-assigned to
    * partitions so the spread is even, guide §2.5), and since equal keys
    * share a bucket and a bucket lives wholly in one partition, runs
    * never span partitions and per-BUCKET distinct counts (driver
    * traffic: 16·p rows) give exclusive rank offsets directly.
    *
    * vs the generic path this removes the RangePartitioner SAMPLING job
    * — which re-executed the (join-shaped) input lineage once per round
    * before pass 1 executed it again (measured ~2× the per-round cost of
    * the suffix-array doubling loop) — while keeping the exchange on the
    * Tungsten DataFrame path. Bit-equal to SQL dense_rank() over
    * (key [, key2]): Round17Spec pins it against [[denseRank]].
    *
    * @param key     leading Long key column, values in [1, keyMax]
    * @param key2    optional Long tiebreak column (non-null)
    * @param keyMax  upper bound of the leading key's domain (≥ max(key))
    */
  def denseRankDense(df: DataFrame, key: String, key2: Option[String],
      rankCol: String, keyMax: Long, parts: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val buckets = 16 * p
    val bMax = math.max(keyMax, 1L)
    require(bMax <= Long.MaxValue / buckets,
      s"denseRankDense: keyMax $bMax too large for $buckets buckets")
    import org.apache.spark.sql.functions.{col, expr, least, greatest, lit}
    val bCol = least(lit(buckets - 1), greatest(lit(0),
      expr(s"(($key - 1) * $buckets) div $bMax"))).cast("int").as("__b")
    val sortCols = (Seq(key) ++ key2.toSeq).map(col)
    // hash exchange on the bucket id (deterministic — no sampling pass),
    // local sort by the keys; __b is monotone in key, so buckets are
    // contiguous runs within each sorted partition
    val ranged = df.withColumn("__b", bCol)
      .repartition(p, col("__b"))
      .sortWithinPartitions(sortCols: _*)
    val rdd = ranged.rdd
    val n = df.schema.fields.length // __b appended at index n
    val ki = df.schema.fieldNames.indexOf(key)
    val k2i = key2.map(k => df.schema.fieldNames.indexOf(k)).getOrElse(-1)
    require(ki >= 0 && (key2.isEmpty || k2i >= 0), "denseRankDense: bad keys")

    // pass 1: per-bucket distinct-run counts (each bucket whole in one
    // partition, so no cross-partition stitching is ever needed)
    val perBucket = rdd.mapPartitions { it =>
      val acc = scala.collection.mutable.LinkedHashMap.empty[Int, Long]
      var lastB = -1
      var lastK = 0L
      var lastK2 = 0L
      var any = false
      it.foreach { r =>
        val b = r.getInt(n)
        val k = r.getLong(ki)
        val k2 = if (k2i >= 0) r.getLong(k2i) else 0L
        if (b != lastB || !any || k != lastK || k2 != lastK2)
          acc.update(b, acc.getOrElse(b, 0L) + 1L)
        lastB = b; lastK = k; lastK2 = k2; any = true
      }
      acc.iterator
    }.collect()

    val offsets = new Array[Long](buckets)
    var cum = 0L
    val counts = perBucket.toMap
    var b = 0
    while (b < buckets) {
      offsets(b) = cum
      cum += counts.getOrElse(b, 0L)
      b += 1
    }
    val totalDistinct = cum

    val outSchema = StructType(df.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    // pass 2: same lineage — the bucket exchange's map output is reused
    val outRdd = rdd.mapPartitions { it =>
      var lastB = -1
      var lastK = 0L
      var lastK2 = 0L
      var any = false
      var rank = 0L
      it.map { r =>
        val bb = r.getInt(n)
        val k = r.getLong(ki)
        val k2 = if (k2i >= 0) r.getLong(k2i) else 0L
        if (bb != lastB) { rank = offsets(bb); any = false }
        if (!any || k != lastK || k2 != lastK2) rank += 1
        lastB = bb; lastK = k; lastK2 = k2; any = true
        Row.fromSeq(r.toSeq.dropRight(1) :+ rank)
      }
    }
    (spark.createDataFrame(outRdd, outSchema), totalDistinct)
  }

  def denseRank(df: DataFrame, order: Seq[String], rankCol: String,
      parts: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val p = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val ki = order.map(df.schema.fieldNames.zipWithIndex.toMap).toArray
    def keyOf(r: Row): Seq[Any] = ki.map(r.get).toSeq

    val ranged = df.repartitionByRange(p, order.map(col): _*)
      .sortWithinPartitions(order.map(col): _*)
    val rdd = ranged.rdd

    // pass 1: per-partition (distinct-run count, first key, last key)
    val partStats = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      var first: Seq[Any] = null
      var last: Seq[Any] = null
      it.foreach { r =>
        val k = keyOf(r)
        if (first == null) first = k
        if (last == null || k != last) n += 1
        last = k
      }
      Iterator((pid, n, first, last))
    }.collect().sortBy(_._1)

    // driver combine: exclusive dense offsets + boundary-span stitches
    val offsets = new Array[Long](p)
    val spans = new Array[Boolean](p)
    var cum = 0L
    var prevLast: Seq[Any] = null
    partStats.foreach { case (pid, n, first, last) =>
      spans(pid) = first != null && prevLast != null && first == prevLast
      offsets(pid) = cum
      cum += n - (if (spans(pid)) 1 else 0)
      if (last != null) prevLast = last
    }
    val totalDistinct = cum

    val outSchema = StructType(df.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    // pass 2: same lineage — the range exchange's map output is reused
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val base = offsets(pid) - (if (spans(pid)) 1L else 0L)
      var local = 0L
      var last: Seq[Any] = null
      it.map { r =>
        val k = keyOf(r)
        if (last == null || k != last) local += 1
        last = k
        Row.fromSeq(r.toSeq :+ (base + local))
      }
    }
    (spark.createDataFrame(outRdd, outSchema), totalDistinct)
  }
}
