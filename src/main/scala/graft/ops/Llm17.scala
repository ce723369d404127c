package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-17 exact-substring dedup at SUFFIX-ARRAY grain (Lee et al. ACL
  * 2022 "Deduplicating Training Data Makes Language Models Better" —
  * their ExactSubstr deduper is built on a suffix array; the L358/L364
  * shingle-grain family approximates it at 16-word resolution and
  * cannot see a repeat shorter than the shingle). This file builds a
  * GENERALIZED WORD-GRAIN SUFFIX ARRAY over the whole corpus by prefix
  * doubling (Manber & Myers SIAM J. Comput. 1993; the log n
  * rank/(rank, next-rank)/re-rank rounds), then reads two artifacts off
  * it:
  *
  *   - `llm_suffix_lrs` — the longest repeated word sequence, both
  *     anywhere and across two distinct documents. Both are EXACT: all
  *     occurrences of a repeated string form a contiguous suffix-array
  *     interval, so the maximum adjacent-pair LCP attains the longest
  *     repeat, and an interval spanning ≥2 docs always contains an
  *     ADJACENT pair from distinct docs (walk the interval until the
  *     doc changes), so the cross-doc maximum is exact too.
  *   - `llm_suffix_coverage` — per-doc duplicated-word coverage at
  *     [[MinDupWords]]-word grain, strictly finer than the shingle
  *     family: position q starts a duplicated T-gram iff its max
  *     adjacent-suffix LCP ≥ T (the standard suffix-array duplicate
  *     test), islands merge exactly as L358's spans do.
  *
  * Engine-stability design: every rank is an integer produced by a
  * DENSE RANK over (prev-rank, next-rank) pairs, so the whole
  * construction is bit-deterministic and engine-portable — no floats,
  * no hashes (unlike the shingle family there are no collision
  * caveats; this is the exact structure). Per-doc unique sentinel
  * symbols (U+0001-prefixed, sorting below every real word) terminate
  * each document, so no repeated prefix can cross a document boundary
  * and a shorter suffix always sorts before its extensions.
  *
  * 100-TB shape: prefix doubling is the distributed-suffix-array
  * construction precisely because each round is only (a) one
  * equi-join on global position (gpos ↔ gpos+2^k) and (b) one dense
  * rank — realized scalably by [[PrefixScan.denseRank]]'s two-pass
  * range-partition scan (one exchange, partition-count-grain driver
  * combine, free distinct total); never a single-partition window. Rounds
  * stop as soon as ranks are distinct — convergence at round m means
  * NO repeat is ≥ 2^m words, so rounds track the longest repeat
  * (log₂ LRS), not corpus size. Doc offsets come from [[PrefixScan]]
  * (doc-count-grain driver traffic). The LCP of the N−1 adjacent pairs
  * descends the kept rank levels greedily (rank_k equal ⇒ first 2^k
  * words equal ⇒ extend by 2^k) with the [[prunedMaxLcp]] argmax prune,
  * so only the first level's join touches the full pair set. Everything
  * shuffles on gpos or rank-pair keys — uniform by construction, no
  * skew. */
object Llm17 {

  /** Doubling-round bound: the construction fails LOUDLY (rather than
    * silently disagreeing with the fixed-unroll oracle) if ranks are
    * still not distinct after RMax rounds — i.e. some repeat is
    * ≥ 2^RMax = 4096 words, 40× the longest fixture document. */
  private[graft] val RMax = 12

  /** Coverage grain T: a position is duplicated if the T-gram starting
    * there occurs ≥2 times corpus-wide. 4 words — a quarter of the
    * shingle family's 16-word floor, so sub-shingle repeats (licence
    * lines, short boilerplate) become visible. */
  private[graft] val MinDupWords = 4

  /** Sentinel key prefix — U+0001 sorts below every fixture word under
    * the binary collation both engines use (the `Llm11.Sep` symbol). */
  private val SentPrefix = "\u0001"

  // dense ranks come from [[PrefixScan.denseRank]] — one range exchange
  // per rank (pass 1 reduce + pass 2 assignment over the same shuffle
  // files), with the distinct-key total returned for FREE, which is the
  // doubling loop's convergence check. The earlier distinct →
  // zipWithIndex → join-back form paid four exchanges per round and an
  // extra distinct-count action; this is the same bit-exact dense_rank.

  /** (gpos, doc_id, nw, pos, key0): every word position in the global
    * doc-concatenation plus one sentinel per document (pos = nw,
    * key0 = U+0001‖doc_id — unique, below all words). Offsets are
    * exclusive running sums of (nw+1) in doc_id order via PrefixScan. */
  /** Returns the position frame plus the TOTAL position count — the
    * latter rides back free on [[PrefixScan]]'s offset totals (round 17:
    * it previously cost a separate `l0.count()` job). */
  private def positions(spark: SparkSession, dir: String): (DataFrame, Long) = {
    val docs = documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("nw", size(col("ws")).cast("long"))
    val (scanned, tot) = PrefixScan(
      docs.select(col("doc_id"), col("nw"), (col("nw") + 1).as("nw1")),
      order = Seq("doc_id"), sumsLong = Seq("nw1" -> "cum"))
    val offs = scanned.select(col("doc_id"),
      (col("cum") - col("nw1")).as("off"))
    val reals = docs.join(offs, "doc_id")
      .select(col("doc_id"), col("nw"), col("off"),
        posexplode(col("ws")).as(Seq("pos", "key0")))
      .select((col("off") + col("pos")).as("gpos"), col("doc_id"),
        col("nw"), col("pos").cast("long").as("pos"), col("key0"))
    val sents = docs.join(offs, "doc_id")
      .select((col("off") + col("nw")).as("gpos"), col("doc_id"),
        col("nw"), col("nw").as("pos"),
        concat(lit(SentPrefix), col("doc_id").cast("string")).as("key0"))
    (reals.unionByName(sents), tot.longs.getOrElse("nw1", 0L))
  }

  /** Prefix doubling. With the default `upTo = RMax` it runs to
    * convergence (ranks fully distinct — the suffix array) and FAILS
    * LOUDLY otherwise; callers that only need a fixed prefix length
    * (coverage needs level log₂ t) pass a smaller `upTo`, and the loop
    * still early-stops if convergence arrives first (higher levels
    * would be identical frames). Returns (levels, m) with m = the
    * convergence level, or −1 when the bounded run stopped early. */
  private def doubling(spark: SparkSession, dir: String,
      upTo: Int = RMax): (DataFrame, Vector[DataFrame], Int, Long) = {
    val dbg = sys.env.contains("GRAFT_SUFFIX_DEBUG")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = if (dbg) {
      println(f"[suffix] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    // materialize the exploded position frame ONCE: the l0 dense rank's
    // generic (sampled) path executes its input lineage for the sample
    // pass AND pass 1 — off the checkpoint both read a cache (round 17)
    val (p0raw, total) = positions(spark, dir)
    val p0 = p0raw.localCheckpoint(true)
    val (l0r, d0) = PrefixScan.denseRank(p0, Seq("key0"), "r")
    val posFrame = l0r.select(col("gpos"), col("doc_id"), col("nw"),
      col("pos")).localCheckpoint(true)
    // level frames carry ONLY (gpos, r) — doc/pos provenance rejoins at
    // the end via this side table, so every doubling exchange moves 2
    // longs per position instead of 5 (measured 251 -> ~100 MB at sf0.1)
    val l0 = l0r.select(col("gpos"), col("r")).localCheckpoint(true)
    lap("l0")
    var levels = Vector(l0)
    var m = if (d0 == total) 0 else -1
    var k = 0
    var dPrev = d0 // rank domain of the CURRENT level: [1, dPrev]
    while (m < 0 && k < upTo) {
      val cur = levels.last
      val step = 1L << k
      val nxt = cur.select((col("gpos") - step).as("gsrc"), col("r").as("rnext"))
      val paired = cur.join(nxt, col("gpos") === col("gsrc"), "left")
        .select(col("gpos"), col("r"),
          coalesce(col("rnext"), lit(Long.MinValue)).as("r2"))
      // ranks are dense in [1, dPrev] by construction, so the rank pass
      // takes the sampling-free bucketed path (round 17: the generic
      // path's RangePartitioner sample re-executed the join every round)
      val (lnr, dist) = PrefixScan.denseRankDense(
        paired, "r", Some("r2"), "rn", keyMax = dPrev)
      val ln = lnr.select(col("gpos"), col("rn").as("r")).localCheckpoint(true)
      levels = levels :+ ln
      k += 1
      dPrev = dist
      lap(s"round $k")
      if (dist == total) m = k
    }
    if (m < 0 && upTo == RMax) throw new IllegalStateException(
      s"suffix-array doubling did not converge in $RMax rounds — " +
        s"some repeat is >= ${1L << RMax} words; raise RMax (and the " +
        "oracle unroll) rather than truncating silently")
    (posFrame, levels, m, total)
  }

  /** Adjacent suffix-array pairs (sentinels excluded — their unique
    * symbols contribute 0 to any LCP but would split real adjacencies):
    * reals ranked to a dense suffix-array order, consecutive ranks
    * joined. Columns (i, doc_a, pos_a, j, doc_b, pos_b) plus — round-17
    * optimization — the two sides' level-(m−1) ranks (rpa, rpb), which
    * the descent's FIRST level needs at exactly these positions (acc is
    * still 0 there): carrying them through this join turns the
    * descent's only full-pair-set level from a 4-exchange double join
    * into a filter. When m = 0 the rank columns are absent (no level
    * below the converged one; the descent loop is empty anyway). */
  private def adjacentPairs(sa: DataFrame): DataFrame = {
    val aCols = Seq(col("t"), col("gpos").as("i"),
      col("doc_id").as("doc_a"), col("pos").as("pos_a")) ++
      (if (sa.columns.contains("rp")) Seq(col("rp").as("rpa")) else Nil)
    val bCols = Seq((col("t") - 1).as("t"), col("gpos").as("j"),
      col("doc_id").as("doc_b"), col("pos").as("pos_b")) ++
      (if (sa.columns.contains("rp")) Seq(col("rp").as("rpb")) else Nil)
    sa.select(aCols: _*).join(sa.select(bCols: _*), "t").drop("t")
  }

  /** Auto-broadcast ceiling for the descent's shrunken candidate set:
    * survivor counts are MEASURED (each level's checkpoint is counted
    * anyway), so below this many rows the next level probes the cached
    * level frame with a broadcast hash join — no exchange of the
    * 1.1M-row level frame — and above it the exchange join stands
    * (adversarial corpora can keep the survivor set large; broadcast
    * must never be assumed). ~60 MB worst case at 56 B/row. */
  private val DescentBroadcastRows = 1000000L

  /** PRUNED greedy descent for the MAXIMUM adjacent-pair LCP: at level
    * k, if ANY pair's next-2^k ranks match, the argmax provably lies
    * among the matched pairs (an unmatched pair can gain at most
    * 2^k − 1 from all remaining levels), so the candidate set prunes to
    * them and the shared scalar acc grows by 2^k; if none match, the
    * set stands. The set shrinks to the near-dup hot spots after the
    * first matching level, so all later joins are tiny — and every
    * survivor's exact LCP equals the final acc (a survivor matched
    * precisely at the set's matched levels), making the min-i survivor
    * bit-equal to the oracle's unpruned (lcp desc, i asc) argmax.
    *
    * Round-17 cost shape: the first level (k = m−1, acc = 0) is the
    * only one that touches the FULL pair set, and its ranks ride in on
    * the pair frame (rpa/rpb — see [[adjacentPairs]]), so it is a
    * filter, not a join; later levels run on the measured survivor
    * count and broadcast the candidate side below
    * [[DescentBroadcastRows]], leaving the cached level frames
    * un-exchanged. Returns ≤1 row:
    * (i, doc_a, pos_a, j, doc_b, pos_b, lcp). */
  private def prunedMaxLcp(pairs0: DataFrame, levels: Vector[DataFrame],
      m: Int): DataFrame = {
    val pairCols = Seq(col("i"), col("doc_a"), col("pos_a"),
      col("j"), col("doc_b"), col("pos_b"))
    var p = pairs0.select(pairCols: _*)
    var pRows = -1L // unknown until first checkpointed count
    var acc = 0L
    var startK = m - 1
    if (m >= 1 && pairs0.columns.contains("rpa")) {
      // level m−1 as a filter over the carried ranks (acc = 0 here)
      val matched = pairs0.where(col("rpa") === col("rpb"))
        .select(pairCols: _*).localCheckpoint(true)
      val cnt = matched.count()
      if (cnt > 0) { p = matched; pRows = cnt; acc += 1L << (m - 1) }
      startK = m - 2
    }
    for (k <- startK to 0 by -1) {
      val lk = levels(k)
      val la = lk.select(col("gpos").as("ga"), col("r").as("ra"))
      val lb = lk.select(col("gpos").as("gb"), col("r").as("rb"))
      val probe0 = p
        .withColumn("ia", col("i") + acc)
        .withColumn("ja", col("j") + acc)
      // candidate side measured small → broadcast BOTH probe steps so the
      // cached level frame is scanned in place, never exchanged; the
      // first inner join can only shrink the candidate set, so the
      // second broadcast is bounded by the same measured count
      val small = pRows >= 0 && pRows <= DescentBroadcastRows
      val matched = (if (small) {
        val j1 = la.join(broadcast(probe0), col("ia") === col("ga"))
        lb.join(broadcast(j1), col("ja") === col("gb"))
      } else {
        probe0.join(la, col("ia") === col("ga"))
          .join(lb, col("ja") === col("gb"))
      }).where(col("ra") === col("rb"))
        .select(pairCols: _*)
        .localCheckpoint(true)
      val cnt = matched.count()
      if (cnt > 0) { p = matched; pRows = cnt; acc += 1L << k }
    }
    p.orderBy(col("i").asc).limit(1).withColumn("lcp", lit(acc))
  }

  /** L401 — longest repeated word sequence, two scopes: `any` (the
    * textbook LRS) and `cross` (longest sequence present in ≥2 distinct
    * documents — exact, see the object doc). One row per scope with the
    * witness pair and the recovered text; tie-break (lcp desc, leftmost
    * first-occurrence position) is a total order both engines share. */
  def suffixLrs(spark: SparkSession, dir: String): DataFrame = {
    val (posFrame, levels, m, total) = doubling(spark, dir)
    // attach the level-(m−1) rank (rp) alongside the converged rank so
    // the descent's first — and only full-pair-set — level is a filter
    // over the pair frame instead of a double join (see adjacentPairs)
    val withPrev = if (m >= 1)
      posFrame.join(levels(m - 1).withColumnRenamed("r", "rp"), "gpos")
    else posFrame
    val reals = withPrev.where(col("pos") < col("nw"))
      .join(levels(m), "gpos")
    // converged ranks are distinct in [1, total] — bucketed fast path
    val sa = PrefixScan.denseRankDense(reals, "r", None, "t",
      keyMax = total)._1
    val pairs = adjacentPairs(sa).localCheckpoint(true)
    val anyTop = prunedMaxLcp(pairs, levels, m)
      .withColumn("scope", lit("any")).localCheckpoint(true)
    // if the overall winner is already a cross-doc pair, the cross-scope
    // maximum IS the same pair (max over a subset containing the overall
    // argmax) — the second descent is provably redundant; the 1-row
    // driver peek is the bounded-collect tier
    val anyRow = boundedCollect(anyTop, 1, "lrs any-scope winner")
    val crossTop =
      if (anyRow.nonEmpty && anyRow(0).getLong(1) != anyRow(0).getLong(4))
        anyTop.withColumn("scope", lit("cross"))
      else prunedMaxLcp(pairs.where(col("doc_a") =!= col("doc_b")), levels, m)
        .withColumn("scope", lit("cross"))
    val cand = anyTop.unionByName(crossTop)
    val docs = documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    cand.join(docs, col("doc_a") === col("doc_id"))
      .select(col("scope"), col("lcp").as("lrs_words"),
        col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"),
        (col("doc_a") =!= col("doc_b")).as("cross_doc"),
        concat_ws(" ", slice(col("ws"), (col("pos_a") + 1).cast("int"),
          col("lcp").cast("int"))).as("lrs_text"))
      .orderBy("scope")
  }

  /** L402 — per-doc duplicated coverage at [[MinDupWords]]-word grain:
    * position q is a duplicated start iff max(LCP with SA-neighbours)
    * ≥ T; covered words = union of [q, q+T−1] merged gaps-and-islands
    * (break when the next start clears the previous interval). Same
    * readout shape as L358's `llm_dedup_substring`, strictly finer
    * grain. */
  def suffixCoverage(spark: SparkSession, dir: String): DataFrame =
    coverageAt(spark, dir, MinDupWords)

  /** Coverage at grain `t` (a power of two) — Round17Spec runs t=16 to
    * pin bit-equality with the shingle family on planted ≥16-word dups.
    * No suffix array and no descent: the t-gram at position q occurs
    * ≥2 times corpus-wide iff q's level-log₂(t) rank is SHARED (rank
    * equality ⟺ first t words equal, sentinel-capped), so only
    * log₂(t) doubling rounds and one rank-keyed multiplicity count are
    * needed — the exact-arithmetic version of the shingle family's
    * hash-groupBy shape. */
  private[graft] def coverageAt(spark: SparkSession, dir: String,
      t: Int): DataFrame = {
    require(t >= 2 && (t & (t - 1)) == 0,
      s"coverage grain must be a power of two, got $t")
    val kLvl = java.lang.Integer.numberOfTrailingZeros(t)
    val (posFrame, levels, _, _) = doubling(spark, dir, upTo = kLvl)
    val lvl = levels(math.min(kLvl, levels.size - 1))
    val shared = lvl.groupBy(col("r")).agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= 2)
    val dl = lvl.join(shared.select(col("r")), "r")
      .join(posFrame, "gpos")
      .select(col("doc_id"), col("pos"))
    val nwByDoc = documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nw"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val run = wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dl.withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(wd) > t, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(run))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("sp_s"),
        (max(col("pos")) + lit(t - 1)).as("sp_e"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("sp_e") - col("sp_s") + 1).cast("long").as("dup_words"))
      .join(nwByDoc, "doc_id")
      .select(col("doc_id"), col("nw").as("n_words"), col("n_dup_spans"),
        col("dup_words"),
        round(col("dup_words").cast("double") / col("nw").cast("double"), 6)
          .as("dup_ratio"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_suffix_lrs" -> (suffixLrs _),
    "llm_suffix_coverage" -> (suffixCoverage _),
  )

  // ---------- DuckDB oracle: the same doubling rounds, fixed-unrolled ----------
  //
  // The oracle unrolls ALL RMax rounds (the L393 unrolled-CTE pattern)
  // while the engine early-exits at convergence level m ≤ RMax; the
  // extra oracle rounds are provably the identity (a dense rank over
  // already-distinct dense ranks reproduces them), and the extra
  // descent levels never fire (distinct ranks are never equal), so the
  // two chains agree wherever the engine converged — and the engine
  // throws if it didn't.

  private def levelSql(k: Int): String =
    s"""l${k + 1} AS MATERIALIZED (SELECT a.gpos, a.doc_id, a.nw, a.pos,
        CAST(dense_rank() OVER (ORDER BY a.r,
          COALESCE(b.r, ${Long.MinValue})) AS BIGINT) AS r
        FROM l$k a LEFT JOIN l$k b ON b.gpos = a.gpos + ${1L << k})"""

  private def descentSql(k: Int): String =
    s"""pr$k AS MATERIALIZED (SELECT p.i, p.doc_a, p.pos_a, p.j, p.doc_b,
        p.pos_b, p.acc + CASE WHEN a.r IS NOT NULL AND b.r IS NOT NULL
          AND a.r = b.r THEN ${1L << k} ELSE 0 END AS acc
        FROM pr${k + 1} p
        LEFT JOIN l$k a ON a.gpos = p.i + p.acc
        LEFT JOIN l$k b ON b.gpos = p.j + p.acc)"""

  /** Base positions + levels l0..l`upTo` (prefix length 2^k at l_k). */
  private def levelsChainSql(upTo: Int): String = {
    val levels = (0 until upTo).map(levelSql).mkString(",\n       ")
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       d AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS nw FROM w),
       offs AS (SELECT doc_id, ws, nw, CAST(COALESCE(SUM(nw + 1) OVER
           (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS off FROM d),
       p0 AS (SELECT off + i - 1 AS gpos, doc_id, nw,
           CAST(i - 1 AS BIGINT) AS pos, ws[i] AS key0
         FROM (SELECT doc_id, ws, nw, off, unnest(range(1, nw + 1)) AS i
           FROM offs)
         UNION ALL
         SELECT off + nw, doc_id, nw, nw,
           chr(1) || CAST(doc_id AS VARCHAR) FROM offs),
       l0 AS MATERIALIZED (SELECT gpos, doc_id, nw, pos,
         CAST(dense_rank() OVER (ORDER BY key0) AS BIGINT) AS r FROM p0),
       $levels"""
  }

  /** Full chain for the LRS: levels → suffix array → adjacent pairs →
    * LCP descent → `lcp(i, doc_a, pos_a, j, doc_b, pos_b, lcp)`. */
  private def lcpChainSql: String = {
    val descent = ((RMax - 1) to 0 by -1).map(descentSql).mkString(",\n       ")
    s"""${levelsChainSql(RMax)},
       sa AS MATERIALIZED (SELECT gpos, doc_id, pos,
         row_number() OVER (ORDER BY r) AS t FROM l$RMax WHERE pos < nw),
       pr$RMax AS (SELECT a.gpos AS i, a.doc_id AS doc_a, a.pos AS pos_a,
           b.gpos AS j, b.doc_id AS doc_b, b.pos AS pos_b,
           CAST(0 AS BIGINT) AS acc
         FROM sa a JOIN sa b ON b.t = a.t + 1),
       $descent,
       lcp AS MATERIALIZED (SELECT i, doc_a, pos_a, j, doc_b, pos_b,
         acc AS lcp FROM pr0)"""
  }

  /** Coverage grain's level index: log₂(MinDupWords). */
  private val KCov = java.lang.Integer.numberOfTrailingZeros(MinDupWords)

  val oracles: Map[String, String] = Map(
    "llm_suffix_lrs" ->
      s"""WITH $lcpChainSql,
         cand AS (
           SELECT 'any' AS scope, i, doc_a, pos_a, doc_b, pos_b, lcp
             FROM (SELECT * FROM lcp ORDER BY lcp DESC, i ASC LIMIT 1)
           UNION ALL
           SELECT 'cross', i, doc_a, pos_a, doc_b, pos_b, lcp
             FROM (SELECT * FROM lcp WHERE doc_a != doc_b
               ORDER BY lcp DESC, i ASC LIMIT 1))
         SELECT scope, CAST(lcp AS BIGINT) AS lrs_words, doc_a,
           CAST(pos_a AS BIGINT) AS pos_a, doc_b,
           CAST(pos_b AS BIGINT) AS pos_b, doc_a != doc_b AS cross_doc,
           array_to_string(list_slice(dd.ws, pos_a + 1, pos_a + lcp), ' ')
             AS lrs_text
         FROM cand JOIN w dd ON dd.doc_id = cand.doc_a
         ORDER BY scope""",
    "llm_suffix_coverage" ->
      s"""WITH ${levelsChainSql(KCov)},
         dl AS (SELECT l.doc_id, l.pos FROM l$KCov l
           JOIN (SELECT r FROM l$KCov GROUP BY r HAVING COUNT(*) >= 2) sh
             ON sh.r = l.r),
         isl AS (SELECT doc_id, pos, SUM(brk) OVER
             (PARTITION BY doc_id ORDER BY pos) AS island
           FROM (SELECT doc_id, pos, CASE WHEN pos - LAG(pos) OVER
               (PARTITION BY doc_id ORDER BY pos) > $MinDupWords
             THEN 1 ELSE 0 END AS brk FROM dl)),
         sp AS (SELECT doc_id, island, MIN(pos) AS sp_s,
             MAX(pos) + ${MinDupWords - 1} AS sp_e
           FROM isl GROUP BY 1, 2)
         SELECT sp.doc_id, d.nw AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
           CAST(SUM(sp_e - sp_s + 1) AS BIGINT) AS dup_words,
           round(CAST(SUM(sp_e - sp_s + 1) AS DOUBLE) / d.nw, 6) AS dup_ratio
         FROM sp JOIN d ON d.doc_id = sp.doc_id
         GROUP BY sp.doc_id, d.nw
         ORDER BY sp.doc_id""",
  )
}
