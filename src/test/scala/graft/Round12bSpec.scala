package graft

import org.apache.spark.sql.functions._

/** Round 12 second wave: JVM replays for the three new operators —
  * average precision (PR-AUC), t-closeness, and nucleus vocabulary. */
class Round12bSpec extends SparkTestBase {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ml_average_precision: replicates a JVM ranked sweep; AP in (0,1]") {
    // replicate the scorer: s = round-6 sigmoid of the L214 spread
    // weights, y = (lang == en)
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("n_chars"),
        size(split(col("text"), " ")).cast("long").as("nw"))
      .collect()
      .map { r =>
        val z = -1.0 + -1.5 * (r.getAs[Long]("n_chars").toDouble / 100.0) +
          1.2 * (r.getAs[Long]("nw").toDouble / 10.0)
        val s = r6(1.0 / (1.0 + math.exp(-z)))
        val y = if (r.getAs[String]("lang") == "en") 1L else 0L
        (s, y)
      }
    val perScore = docs.groupBy(_._1).map { case (s, g) =>
      (s, g.length.toLong, g.map(_._2).sum)
    }.toSeq.sortBy(-_._1)
    val nPos = perScore.map(_._3).sum
    var tp = 0L; var cn = 0L
    var sum = BigDecimal(0)
    perScore.foreach { case (_, n, np) =>
      tp += np; cn += n
      val pAt = r6(tp.toDouble / cn.toDouble)
      sum += BigDecimal(r6(np.toDouble * pAt))
    }
    val want = r6(sum.toDouble / nPos.toDouble)
    val got = SparkEntry.queries("ml_average_precision")(spark, sf0001)
      .collect().head
    assert(got.getAs[Long]("n_pos") === nPos)
    assert(got.getAs[Double]("average_precision") === want)
    val ap = got.getAs[Double]("average_precision")
    assert(ap > 0.0 && ap <= 1.0)
    // AP of a scorer better than random exceeds the positive base rate
    val base = nPos.toDouble / docs.length
    assert(ap > base * 0.5, s"AP $ap implausibly below base rate $base")
  }

  test("privacy_t_closeness: EMD replicates JVM; bounds and flag respected") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), hour(col("ts")).as("hod"), col("value"))
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        math.min(math.floor(r.getDouble(2) / 20.0).toLong, 9L)))
    val nTotal = ev.length.toLong
    val globalBin = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = ev.groupBy(_._1).map { case ((et, hod), g) =>
      val nG = g.length.toLong
      val binG = g.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      var cumG = 0L; var cumJ = 0L
      var s = BigInt(0)
      (0L to 9L).foreach { b =>
        cumG += binG.getOrElse(b, 0L)
        cumJ += globalBin.getOrElse(b, 0L)
        s += (BigInt(cumG) * nTotal - BigInt(cumJ) * nG).abs
      }
      val emd = r6(s.toDouble / (nG.toDouble * nTotal.toDouble * 9.0))
      (et, hod, nG, emd)
    }.toSeq.sortBy(x => (-x._4, x._1, x._2)).take(20)
    val got = SparkEntry.queries("privacy_t_closeness")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getAs[Double]("emd")))
    assert(got.toSeq === want)
    got.foreach { case (_, _, _, emd) =>
      assert(emd >= 0.0 && emd <= 1.0, s"EMD out of [0,1]: $emd")
    }
  }

  test("privacy_t_closeness: a hand-built leaking class is flagged") {
    import spark.implicits._
    // 10 uniform background classes + one class concentrated in the top
    // band: its EMD from the uniform table distribution must flag t>0.2
    val dir = java.nio.file.Files.createTempDirectory("graft-tclose").toString
    val bg = for (h <- 0 until 10; i <- 0 until 10) yield
      (h * 100L + i, i.toLong, java.sql.Timestamp.valueOf(f"2026-01-01 $h%02d:00:00"),
        "click", i * 20.0 + 1.0, "{}")
    val leak = (0 until 10).map(i =>
      (9000L + i, i.toLong, java.sql.Timestamp.valueOf("2026-01-02 23:00:00"),
        "purchase", 195.0, "{}"))
    (bg ++ leak).toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = ops.Audit.tCloseness(spark, dir).collect()
    val top = rows.head
    assert(top.getString(0) === "purchase" && top.getInt(1) === 23)
    assert(top.getAs[Boolean]("violates_t"),
      s"concentrated class not flagged: ${top}")
    // the uniform background classes sit well under the threshold
    rows.filter(_.getString(0) == "click").foreach { r =>
      assert(r.getAs[Double]("emd") < 0.2, s"uniform class flagged: $r")
    }
  }

  test("llm_vocab_nucleus: minimal 90%-mass prefix, replicated in JVM") {
    val words = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w")).collect()
      .map(_.getString(0))
    val counts = words.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case (w, c) => (-c, w) }
    val total = counts.map(_._2).sum
    var cum = 0L
    val want = counts.zipWithIndex.takeWhile { case ((_, c), _) =>
      val keep = 10L * cum < 9L * total
      cum += c
      keep
    }.map { case ((w, c), i) => (i + 1L, w, c) }
    val got = SparkEntry.queries("llm_vocab_nucleus")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === want)
    // mass covered >= 90%, and dropping the last word dips below
    val mass = got.map(_._3).sum
    assert(10L * mass >= 9L * total, "nucleus under-covers")
    assert(10L * (mass - got.last._3) < 9L * total, "nucleus not minimal")
    // cum_share of the last retained row crosses 0.9
    val last = SparkEntry.queries("llm_vocab_nucleus")(spark, sf0001)
      .orderBy(col("rank").desc).collect().head
    assert(last.getAs[Double]("cum_share") >= 0.9)
  }
}
