package graft

import org.apache.spark.sql.functions._

/** Round 13/14 (VERDICT r13 #1): the two cold paths round 13 shipped —
  * `Llm3.componentLabelsDf`'s >cap pointer-doubling Pregel fallback and
  * the L255/L333 average-precision pair — get the pins their scaladocs
  * promise. The Pregel path is driven twice: explicitly (the
  * `parallelism` arg) on the REAL fixture edge set for row-identity
  * against the driver union-find, and implicitly (auto-routing) on a
  * synthetic >[[ops.Llm3.DriverUfCap]]-edge graph so the fallback's
  * convergence `require` is seen to hold past the cap it exists for. */
class Round13Spec extends SparkTestBase {

  test("componentLabelsDf: driver union-find and Pregel paths are row-identical on the fixture edge set") {
    val pairs = ops.Er.snmMultipass(spark, sf0001).select(col("d1"), col("d2"))
    val uf = ops.Llm3.componentLabelsDf(spark, pairs)
      .orderBy("node").collect().toSeq
    val pregel = ops.Llm3.componentLabelsDf(spark, pairs, parallelism = 4)
      .orderBy("node").collect().toSeq
    assert(uf.nonEmpty, "fixture edge set produced no components")
    assert(pregel === uf)
  }

  test("componentLabelsDf auto-routes >DriverUfCap edges to Pregel, converges, labels correctly") {
    // 110k disjoint 6-node chains = 550k edges > the 500k driver cap, so
    // parallelism = 0 MUST take the distributed branch (the er_golden_record
    // production routing). Chain i owns nodes [10i, 10i+5]; every node's
    // component min-label is therefore node - node % 10, checkable without
    // collecting 660k rows to the driver.
    val nChains = 110000L
    val edges = spark.range(nChains)
      .select((col("id") * 10).as("base"))
      .select(col("base"), explode(expr("sequence(0L, 4L)")).as("j"))
      .select((col("base") + col("j")).as("d1"),
        (col("base") + col("j") + lit(1L)).as("d2"))
    assert(edges.count() === 5 * nChains)
    val labels = ops.Llm3.componentLabelsDf(spark, edges)
    assert(labels.count() === 6 * nChains)
    val wrong = labels
      .where(col("label") =!= col("node") - pmod(col("node"), lit(10L)))
      .limit(1).count()
    assert(wrong === 0L, "a node escaped its chain's min label")
    assert(labels.select(countDistinct(col("label"))).collect()(0).getLong(0)
      === nChains)
  }

  test("ml_avg_precision (L255) and ml_average_precision (L333) both sit on the exact AP within round-6 quantization") {
    // the two keys compute the SAME statistic with different round-6
    // placement (L255 rounds the whole term, L333 rounds P(s) first), so
    // they are NOT bit-identical; the pin is against the exactly-computed
    // AP from the shared per-threshold integers, full double precision
    val per = ops.Ml.scoredDocs(spark, sf0001).groupBy("s")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
      .orderBy(col("s").desc).collect()
    val pTot = per.map(_.getAs[Long]("np")).sum
    var cumN = 0L; var cumP = 0L; var acc = 0.0
    per.foreach { r =>
      cumN += r.getAs[Long]("n"); cumP += r.getAs[Long]("np")
      acc += r.getAs[Long]("np").toDouble * cumP.toDouble / cumN.toDouble
    }
    val exact = acc / pTot
    val sklearn = SparkEntry.queries("ml_avg_precision")(spark, sf0001)
      .select(col("avg_precision")).collect()(0).getDouble(0)
    val step = SparkEntry.queries("ml_average_precision")(spark, sf0001)
      .select(col("average_precision")).collect()(0).getDouble(0)
    assert(math.abs(sklearn - exact) < 1e-5,
      s"L255=$sklearn strayed from exact AP $exact")
    assert(math.abs(step - exact) < 1e-5,
      s"L333=$step strayed from exact AP $exact")
    assert(math.abs(sklearn - step) < 1e-5,
      s"the two forms diverged beyond quantization: L255=$sklearn L333=$step")
  }
}
