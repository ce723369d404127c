package graft

import org.apache.spark.sql.functions._

/** Round-15 continuation: DBSCAN planted-geometry legs — hand-built
  * role cases (including a pair straddling a grid-cell boundary, the
  * case the 3×3 neighborhood join exists for) plus full equality
  * against an independent JVM brute-force DBSCAN on a synthetic
  * h48-seeded point set. */
class Round15fSpec extends SparkTestBase {

  /** Independent replica: brute-force ε-pairs, paper-convention roles,
    * min-label clusters via union-find, min-core-neighbor border
    * assignment — no grid anywhere (grid ≡ brute force is the theorem
    * under test). */
  private def bruteDbscan(pts: Seq[(Long, Double, Double)], eps: Double,
      minPts: Int): Map[Long, (Long, String, Long)] = {
    val eps2 = eps * eps
    def close(p: (Long, Double, Double), q: (Long, Double, Double)) =
      (p._2 - q._2) * (p._2 - q._2) + (p._3 - q._3) * (p._3 - q._3) <= eps2
    val nbrs = pts.map(p =>
      p._1 -> pts.filter(q => q._1 != p._1 && close(p, q)).map(_._1)).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size + 1 >= minPts).toSet
    val parent = collection.mutable.HashMap[Long, Long]()
    def find(a: Long): Long = {
      var x = a
      while (parent.getOrElse(x, x) != x) x = parent(x)
      x
    }
    for (a <- core; b <- nbrs(a) if core(b)) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clab = core.map(c => c -> find(c)).toMap
    pts.map { p =>
      val id = p._1
      val (role, cluster) =
        if (core(id)) ("core", clab(id))
        else {
          val cn = nbrs(id).filter(core)
          if (cn.nonEmpty) ("border", cn.map(clab).min) else ("noise", -1L)
        }
      id -> ((nbrs(id).size.toLong, role, cluster))
    }.toMap
  }

  private def runDbscan(pts: Seq[(Long, Double, Double)], eps: Double,
      minPts: Int): Map[Long, (Long, String, Long)] = {
    val s = spark
    import s.implicits._
    ops.Ml2.dbscanAt(spark, pts.toDF("vec_id", "x", "y"), eps, minPts)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getLong(3)))).toMap
  }

  test("planted geometry: two blobs, a border point, noise, and a cell-straddling pair") {
    val eps = 0.1
    // blob A: 6 points inside one ε-ball around (0.05, 0.05)
    val blobA = (0 until 6).map(i =>
      (i.toLong, 0.05 + 0.01 * (i % 3), 0.05 + 0.01 * (i / 3)))
    // blob B: 6 points around (1.0, 1.0) — note 1.0/0.1 sits ON a cell
    // edge, so B itself exercises cell-boundary membership
    val blobB = (0 until 6).map(i =>
      (10L + i, 1.0 + 0.01 * (i % 3), 1.0 + 0.01 * (i / 3)))
    // border: within ε of only blob A's two right-edge points (0.095
    // and ~0.0955) — 2 < minPts−1 neighbors, so border, not core
    val border = Seq((20L, 0.165, 0.05))
    // noise: far from everything
    val noise = Seq((30L, 5.0, 5.0), (31L, -4.0, 2.5))
    val pts = blobA ++ blobB ++ border ++ noise
    val got = runDbscan(pts, eps, minPts = 6)
    blobA.foreach { p =>
      assert(got(p._1)._2 === "core", s"A ${p._1}")
      assert(got(p._1)._3 === 0L, "cluster id = min member of blob A")
    }
    blobB.foreach { p =>
      assert(got(p._1)._2 === "core", s"B ${p._1}")
      assert(got(p._1)._3 === 10L)
    }
    assert(got(20L)._2 === "border")
    assert(got(20L)._3 === 0L, "border joins blob A")
    noise.foreach { p =>
      assert(got(p._1)._2 === "noise")
      assert(got(p._1)._3 === -1L)
    }
  }

  test("cell-straddling ε-pair is found: two points in different cells, within ε") {
    // cells of side 0.1: x=0.099 → cell 0, x=0.101 → cell 1; the pair
    // distance is 0.002 ≪ ε — a home-cell-only join would miss it
    val pts = Seq((0L, 0.099, 0.05), (1L, 0.101, 0.05))
    val got = runDbscan(pts, eps = 0.1, minPts = 2)
    assert(got(0L) === ((1L, "core", 0L)))
    assert(got(1L) === ((1L, "core", 0L)))
  }

  test("grid DBSCAN ≡ brute-force DBSCAN on an h48-seeded synthetic set") {
    // deterministic geometry: three tight 12-point line blobs (spacing
    // 0.002 — every pair within ε, all core), each with one "finger"
    // point 0.039 beyond its right end (within ε of exactly ONE blob
    // point → guaranteed border), plus h48-jittered far scatter (noise)
    def u(tag: String, i: Int): Double =
      (Tables.h48jvm(s"dbscan:$tag:$i") % 1000) / 1000.0
    val dense = for {
      (cx, cy, base) <- Seq((0.2, 0.2, 0), (0.8, 0.3, 20), (0.5, 0.9, 40))
      i <- 0 until 12
    } yield ((base + i).toLong, cx + 0.002 * i, cy)
    val fingers = Seq((0.2, 0.2, 60), (0.8, 0.3, 61), (0.5, 0.9, 62))
      .map { case (cx, cy, id) => (id.toLong, cx + 0.022 + 0.039, cy) }
    val scatter = (0 until 44).map(i =>
      (100L + i, 3.0 + 3.0 * u("sx", i), 3.0 + 3.0 * u("sy", i)))
    val pts = dense ++ fingers ++ scatter
    val eps = 0.04
    val minPts = 5
    val got = runDbscan(pts, eps, minPts)
    val want = bruteDbscan(pts, eps, minPts)
    assert(got === want)
    // the fixture must exercise every role
    val roles = got.values.map(_._2).toSet
    assert(roles === Set("core", "border", "noise"),
      s"synthetic set must produce all three roles, got $roles")
  }
}
