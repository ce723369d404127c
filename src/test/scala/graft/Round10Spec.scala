package graft

import scala.collection.mutable

/** Round-10: multi-pass Sorted-Neighborhood ER graded against the
  * EXHAUSTIVE ≥0.9-Jaccard ground truth (VERDICT r9 next-round #3 —
  * the r9 spec could only see in-window truth, i.e. could not see the
  * misses SNM is famous for). */
class Round10Spec extends SparkTestBase {

  /** All unordered doc pairs with integer word-set Jaccard ≥ 9/10,
    * computed by brute force over the whole fixture — the ground truth
    * no windowed method can hide behind. */
  private lazy val truthAndDocs: (Set[(Long, Long)], Int) = {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).distinct.toSet)
    val t = mutable.Set.empty[(Long, Long)]
    for (i <- docs.indices; j <- (i + 1) until docs.length) {
      val (a, wa) = docs(i); val (b, wb) = docs(j)
      val inter = (wa & wb).size
      val uni = wa.size + wb.size - inter
      if (10 * inter >= 9 * uni) t += ((math.min(a, b), math.max(a, b)))
    }
    (t.toSet, docs.length)
  }

  private def pairsOf(key: String): Set[(Long, Long)] =
    SparkEntry.queries(key)(spark, sf0001)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-pass SNM: second (reversed-text) pass strictly widens recall; precision stays 1") {
    val (truth, _) = truthAndDocs
    assert(truth.size > 1000, s"fixture ground truth unexpectedly small: ${truth.size}")
    val p1 = pairsOf("er_sorted_neighborhood")
    val p2 = pairsOf("er_snm_multipass")
    // the union-of-candidates construction makes pass-1 output a subset
    assert(p1.subsetOf(p2), "multipass lost pairs the single pass found")
    assert(p2.size > p1.size, "reversed-text pass added no candidates")
    // precision 1 by construction: every emitted pair is exact-verified
    assert(p1.subsetOf(truth) && p2.subsetOf(truth), "emitted a non-≥0.9 pair")
    val r1 = p1.size.toDouble / truth.size
    val r2 = p2.size.toDouble / truth.size
    info(f"exhaustive truth=${truth.size}; pass1 recall=$r1%.4f (${p1.size}); 2-pass recall=$r2%.4f (${p2.size})")
    assert(r2 > r1, "second pass did not improve exhaustive recall")
    // window-local recall is the method's documented weak axis: both
    // numbers are SMALL against a dense 231-doc family — pin that the
    // measurement actually sees the misses (in-window truth could not)
    assert(r2 < 0.5, "fixture no longer exercises the window-recall limit")
  }

  test("multi-pass SNM + transitive closure (the full Hernández–Stolfo remedy) recovers the families") {
    val (truth, _) = truthAndDocs
    val verified = pairsOf("er_snm_multipass")
    // union-find closure over verified pairs — entity-level merge
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    verified.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
    }
    val comps = verified.flatMap(p => Seq(p._1, p._2))
      .groupBy(find).values.map(_.toSeq.sorted)
    val closure = comps.flatMap(c =>
      for (i <- c.indices; j <- (i + 1) until c.length) yield (c(i), c(j))).toSet
    val recall = (closure & truth).size.toDouble / truth.size
    val precision = (closure & truth).size.toDouble / closure.size
    info(f"closure pairs=${closure.size}; recall=$recall%.4f precision=$precision%.4f")
    // measured on the shipped fixture: recall 0.961, precision 0.532 —
    // closure trades pairwise precision (≥0.9-Jaccard isn't transitive)
    // for entity recall. Loose bounds so a driver fixture regeneration
    // with the same generator survives.
    assert(recall >= 0.85, f"closure recall $recall%.4f below the multi-pass promise")
    assert(precision >= 0.35, f"closure precision $precision%.4f collapsed — families over-merged")
  }

  test("L117: SemDeDup on a planted ANISOTROPIC space — τ=0.95 prunes; decisions exact vs brute cosine") {
    val s = spark
    import s.implicits._
    // 16 true clusters in 64-dim: centroid + σ·gauss members give
    // member↔centroid cos ≈ 0.89 and member↔member cos ≈ 0.8 (below τ);
    // planted replicas (source + tiny noise) sit at cos ≈ 0.997 (above).
    // The shipped corpus is near-isotropic and exercises only τ=0.35 —
    // this fixture makes the paper-realistic τ=0.95 path fire for real.
    val rnd = new scala.util.Random(42)
    val dim = 64
    def gauss() = Array.fill(dim)(rnd.nextGaussian())
    def unit(v: Array[Double]) = { val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n) }
    def jitter(base: Array[Double], sigma: Double) =
      unit(base.zip(gauss()).map { case (a, g) => a + sigma * g })
    val cents = Array.fill(16)(unit(gauss()))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    (0 until 16).foreach(c => rows += ((c.toLong, cents(c)))) // seeds: vec_id < 16
    val members = for (c <- 0 until 16; _ <- 0 until 12) yield {
      val id = 16L + rows.length - 16
      rows += ((id, jitter(cents(c), 1.0 / 16)))
      id
    }
    // 3 replicas per cluster, ids strictly above every member id so the
    // keep-lowest rule must keep the source and prune the replica
    val planted = for (c <- 0 until 16; r <- 0 until 3) yield {
      val srcId = members(c * 12 + r)
      val src = rows.find(_._1 == srcId).get._2
      val id = rows.length.toLong
      rows += ((id, jitter(src, 0.01)))
      (id, srcId)
    }
    val tau = 0.95
    val out = graft.ops.Llm.semDedupFrom(spark, rows.toSeq.toDF("vec_id", "embedding"), tau)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.size === rows.length)
    val emb = rows.map { case (id, v) => id -> unit(v) }.toMap // unit: cos = dot
    // brute-force replay of the prune rule against EXACT cosine, using
    // the function's own cell assignment
    val byCell = out.toSeq.groupBy(_._2._1)
    val expectPruned = byCell.values.flatMap { cell =>
      val ids = cell.map(_._1).toSeq.sorted
      ids.filter(i => ids.exists(j => j < i &&
        emb(i).zip(emb(j)).map { case (a, b) => a * b }.sum >= tau))
    }.toSet
    val gotPruned = out.filter(_._2._2).keySet
    assert(gotPruned === expectPruned,
      s"prune decisions diverge from exact cosine: extra=${gotPruned -- expectPruned} missing=${expectPruned -- gotPruned}")
    // the τ path actually fired, and fired selectively
    assert(gotPruned.nonEmpty && gotPruned.size < rows.length / 2)
    // every planted replica landed in its source's cell and was pruned
    planted.foreach { case (rep, src) =>
      assert(out(rep)._1 === out(src)._1, s"replica $rep drifted out of $src's cell")
      assert(out(rep)._2, s"replica $rep of $src not pruned at τ=$tau")
    }
    // no centroid/member false positives beyond brute agreement: sources kept
    assert(planted.forall { case (_, src) => !out(src)._2 || expectPruned(src) })
  }

  test("L109: animated-GIF video codec — real demux, full raster (the interlace trap), parsed timing") {
    import graft.ops.MmDecode._
    val (id, nc) = (1L, 441) // w=10, h=4, 11 frames
    val bytes = synthesizeVideo(id, nc)
    // the payload is a genuine GIF89a container
    assert(bytes.take(6).map(_.toChar).mkString === "GIF89a")
    // independent reader pass: frame count from the container scan, and
    // EVERY row of every frame must carry the closed-form pixels — this
    // is the exact trap round-10 hit: the JDK writer defaults to
    // interlaced output and the JDK reader's deinterlacer drops the
    // final pass on small frames (last row read as zeros), so the codec
    // must write non-interlaced explicitly
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) === 11)
    for (f <- Seq(0, 10)) {
      val img = reader.read(f)
      assert((img.getWidth, img.getHeight) === ((10, 4)))
      for (y <- 0 until 4; x <- 0 until 10)
        assert((img.getRGB(x, y) & 0xff) === ((id + 17L * f + x) % 256).toInt,
          s"frame $f pixel ($x,$y)")
    }
    reader.dispose(); iis.close()
    // sampled frames: ⌊j·11/4⌋ = 0,2,5,8; ts from the PARSED 4 cs delay
    val s = sampleFrames(Payload(id, bytes))
    assert(s.map(_.frame_idx) === Seq(0L, 2L, 5L, 8L))
    assert(s.map(_.frame_ts_ms) === Seq(0L, 80L, 200L, 320L))
    assert(s.head.n_frames === 11L)
    // mean gray of frame 0 = mean of (1+x)%256 over x<10 = 5.5
    assert(s.head.mean_gray === 5.5)
  }
}
