package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.5) over generated event tables
  * pushed through the same query shapes the engine ships. Uses ScalaCheck
  * generators sampled under fixed seeds (5 cases per property — each case
  * runs real Spark jobs). */
class PropertySpec extends SparkTestBase {
  import PropertySpec.GenEvent

  private val genEvents: Gen[List[GenEvent]] = for {
    n <- Gen.choose(1, 60)
    evs <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 100000L)
      t <- Gen.choose(0L, 7L * 24 * 3600 * 1000) // a week in ms
      uid <- Gen.choose(0L, 5L)
      typ <- Gen.oneOf("click", "view", "purchase")
      v <- Gen.choose(0.0, 1000.0)
    } yield GenEvent(id, 1704067200000L + t, uid, typ, v))
  } yield evs

  /** Deterministic stand-in for forAll: 5 seeded samples per property. */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (1 to 5).foreach { i =>
      f(g.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(sys.error(s"generator failed for seed $i")))
    }

  private def toDf(evs: List[GenEvent]) = {
    val s = spark
    import s.implicits._
    evs.toDF().withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
  }

  test("tumbling window counts always sum to the input cardinality") {
    forAll(genEvents) { evs =>
      val df = toDf(evs)
      val winSum = df.groupBy(window(col("ts"), "1 hour")).count()
        .agg(sum("count")).head().getLong(0)
      assert(winSum === evs.size.toLong)
    }
  }

  test("dedup is idempotent and keeps ≤1 row per key") {
    forAll(genEvents) { evs =>
      val df = toDf(evs)
      val once = df.dropDuplicates("user_id", "event_type")
      val twice = once.dropDuplicates("user_id", "event_type")
      assert(once.count() === twice.count())
      assert(once.groupBy("user_id", "event_type").count()
        .where(col("count") > 1).count() === 0)
    }
  }

  test("union cardinality: |A ∪all B| = |A| + |B|") {
    forAll(genEvents) { evs =>
      val df = toDf(evs)
      val a = df.where(col("event_type") === "click")
      val b = df.where(col("event_type") =!= "click")
      assert(a.unionByName(b).count() === df.count())
    }
  }

  test("intersect ⊆ both sides; except ∩ right = ∅") {
    forAll(genEvents) { evs =>
      val df = toDf(evs)
      val a = df.where(col("value") > 500).select("user_id")
      val b = df.where(col("event_type") === "view").select("user_id")
      val i = a.intersect(b)
      assert(i.except(a.distinct()).count() === 0)
      assert(i.except(b.distinct()).count() === 0)
      assert(a.except(b).intersect(b.distinct()).count() === 0)
    }
  }

  test("running total is monotone for non-negative values") {
    forAll(genEvents) { evs =>
      val s = spark
      import s.implicits._
      val df = toDf(evs)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val rt = df.withColumn("run", sum($"value").over(w))
        .withColumn("prev", lag($"run", 1).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
            .orderBy($"ts", $"event_id")))
      assert(rt.where($"prev".isNotNull && $"run" < $"prev" - 1e-9).count() === 0)
    }
  }

  test("session count per user never exceeds event count and is ≥1") {
    forAll(genEvents) { evs =>
      val df = toDf(evs)
      val sessions = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      val perUser = sessions.groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"))
      assert(perUser.where(col("n_sessions") > col("n_events")).count() === 0)
      assert(perUser.agg(sum("n_events")).head().getLong(0) === df.count())
    }
  }

  // ---- round-2 operator properties ----

  test("multiset identity: |A ∩all B| + |A \\all B| = |A| on random bags") {
    forAll(genEvents) { evs =>
      val df = toDf(evs)
      val a = df.where(col("event_type") === "click").select("user_id")
      val b = df.where(col("event_type") === "view").select("user_id")
      assert(a.intersectAll(b).count() + a.exceptAll(b).count() === a.count())
    }
  }

  test("pivot conserves mass: row sums equal the unpivoted per-user totals") {
    forAll(genEvents) { evs =>
      val df = toDf(evs)
      val piv = df.groupBy("user_id")
        .agg(Seq("click", "view", "purchase").map(t =>
          sum(when(col("event_type") === t, col("value"))).as(t)).head,
          Seq("view", "purchase").map(t =>
            sum(when(col("event_type") === t, col("value"))).as(t)): _*)
      val back = piv.select(col("user_id"),
        (coalesce(col("click"), lit(0.0)) + coalesce(col("view"), lit(0.0)) +
          coalesce(col("purchase"), lit(0.0))).as("total"))
      val direct = df.groupBy("user_id").agg(sum("value").as("total"))
      val bad = back.as("b").join(direct.as("d"), "user_id")
        .where(abs(col("b.total") - col("d.total")) > 1e-6)
      assert(bad.count() === 0)
    }
  }

  test("exact percentile lies within [min, max] and is monotone in p") {
    forAll(genEvents) { evs =>
      val df = toDf(evs)
      val r = df.agg(
        min("value").as("mn"), max("value").as("mx"),
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.75)").as("p75")).head()
      assert(r.getDouble(0) - 1e-9 <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3)
        && r.getDouble(3) <= r.getDouble(1) + 1e-9)
    }
  }

  test("ratio-to-report shares sum to 1 per user (within fp tolerance)") {
    forAll(genEvents) { evs =>
      val df = toDf(evs)
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      val shares = df
        .withColumn("share", col("value") / sum(col("value")).over(w))
        .groupBy("user_id").agg(sum("share").as("s"))
      assert(shares.where(abs(col("s") - 1.0) > 1e-6).count() === 0)
    }
  }

  test("gapfill never changes totals and only inserts zero rows") {
    forAll(genEvents) { evs =>
      val df = toDf(evs)
      val ev = df.select(col("user_id"), date_trunc("hour", col("ts")).as("bucket"))
      val counts = ev.groupBy("user_id", "bucket").agg(count(lit(1)).as("n"))
      val dense = ev.groupBy("user_id")
        .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
        .select(col("user_id"),
          explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 HOUR"))).as("bucket"))
      val filled = dense.join(counts, Seq("user_id", "bucket"), "left")
        .select(col("user_id"), coalesce(col("n"), lit(0L)).as("n"))
      assert(filled.agg(sum("n")).head().getLong(0) === df.count())
      assert(filled.count() >= counts.count())
    }
  }

  test("salted join ≡ plain join for any salt bucket count") {
    val genWithBuckets = for {
      evs <- genEvents
      buckets <- Gen.choose(1, 12)
    } yield (evs, buckets)
    forAll(genWithBuckets) { case (evs, buckets) =>
      val df = toDf(evs)
      val dim = toDf(evs.take(math.max(1, evs.size / 2)))
        .select(col("user_id")).distinct()
        .withColumn("segment", concat(lit("s"), col("user_id")))
      val plain = df.join(dim, Seq("user_id")).select("event_id", "segment")
      val salted = ops.Skew.saltedJoin(df, dim, "user_id", "user_id", buckets)
        .select(df("event_id"), col("segment"))
      assert(salted.exceptAll(plain).count() === 0)
      assert(plain.exceptAll(salted).count() === 0)
    }
  }

  test("sessionization invariants hold for any gap threshold") {
    val genWithGap = for {
      evs <- genEvents
      gapH <- Gen.choose(1, 48)
    } yield (evs, gapH)
    forAll(genWithGap) { case (evs, gapH) =>
      val df = toDf(evs)
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      val sessions = df
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("is_new", when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapH.toLong * 3600000000L, 1L)
          .otherwise(0L))
        .withColumn("sid", sum(col("is_new")).over(byUser))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("n"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("dur_us"))
      // sessions partition the events; durations are non-negative; a
      // single-event session has zero duration
      assert(sessions.agg(sum("n")).head().getLong(0) === df.count())
      assert(sessions.where(col("dur_us") < 0).count() === 0)
      assert(sessions.where(col("n") === 1 && col("dur_us") =!= 0).count() === 0)
    }
  }

  test("minhash estimate concentrates around exact Jaccard (property)") {
    val s = spark
    import s.implicits._
    // two random subsets of a small universe → known exact Jaccard
    val genSets = for {
      na <- Gen.choose(20, 120)
      nb <- Gen.choose(20, 120)
      a <- Gen.listOfN(na, Gen.choose(0L, 300L))
      b <- Gen.listOfN(nb, Gen.choose(0L, 300L))
    } yield (a.toSet, b.toSet)
    forAll(genSets) { case (a, b) =>
      val exact = (a & b).size.toDouble / (a | b).size.toDouble
      val df = (a.toSeq.map(("a", _)) ++ b.toSeq.map(("b", _))).toDF("g", "x")
      val sigs = df.groupBy("g")
        .agg(functions.MinHash.sig(col("x"), 64).as("sig"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      val est = sigs("a").zip(sigs("b")).count { case (x, y) => x == y } / 64.0
      // k=64 → stderr = sqrt(J(1−J)/64) ≤ 0.0625; 0.3 is a ≥4.8σ bound
      assert(math.abs(est - exact) <= 0.3,
        s"est=$est exact=$exact |A|=${a.size} |B|=${b.size}")
    }
  }

  test("bucketed range join equals brute force for any window width (property)") {
    val genWithWindow = for {
      evs <- genEvents
      wMin <- Gen.choose(1, 240) // minutes
    } yield (evs, wMin)
    forAll(genWithWindow) { case (evs, wMin) =>
      val w = wMin.toLong * 60L * 1000000L
      val df = toDf(evs).select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      val intervals = df.where(col("event_type") === "view")
        .select(col("event_id").as("iid"), col("ts_us").as("i_us"))
      val points = df.where(col("event_type") === "click")
        .select(col("event_id").as("pid"), col("ts_us").as("p_us"))
      // the production helpers (brute force below is the independent side)
      val bucketed = points
        .withColumn("bucket", functions.TimeBuckets.bucketOf("p_us", w))
        .join(intervals.withColumn("bucket",
            explode(functions.TimeBuckets.coveringBuckets("i_us", w))),
          "bucket")
        .where(col("p_us") >= col("i_us") && col("p_us") < col("i_us") + w)
        .select("pid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val brute = points.join(intervals,
          col("p_us") >= col("i_us") && col("p_us") < col("i_us") + w)
        .select("pid", "iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // set-equal AND exactly-once (generator may duplicate ids — compare
      // multiplicity against the distinct pair set only when ids are unique)
      assert(bucketed.toSet === brute, s"w=${wMin}m")
    }
  }
}

object PropertySpec {
  /** Top-level so Spark can derive an Encoder (inner classes need an outer
    * scope the executor side does not have). */
  case class GenEvent(event_id: Long, ts_ms: Long, user_id: Long,
                      event_type: String, value: Double)
}
