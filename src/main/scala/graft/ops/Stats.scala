package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical statistics / econometrics operators (round 11): Gini +
  * Lorenz inequality curve, Benford first-digit audit, two-sample
  * Kolmogorov–Smirnov, and the Kaplan–Meier survival estimator. The
  * family's shared scale contract is the one the midrank-AUC row (L242)
  * established: every "needs a global sort" statistic is re-expressed
  * over the DISTINCT-VALUE frame (round-6 quantization bounds it at
  * ≤10⁶+ rows however large the corpus), so the corpus itself is
  * touched only by map-combinable aggregates; the single-partition
  * window runs on the bounded frame, never the data.
  *
  * Determinism: exact integers wherever possible; ratios of integers
  * round-6; every transcendental (ln / exp) rounded to 6 decimals at
  * the call site per the repo's cross-libm contract; double sums via
  * [[graft.Tables.dsum]] decimal quantization. */
object Stats {

  private def dsumSql(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"
  private val evTs = "CAST(ts AS TIMESTAMP)"

  /** L251 — Gini coefficient + Lorenz curve of customer revenue (the
    * canonical inequality readout; completes the concentration family
    * beside L211's top-decile share). Revenue per customer = round-6
    * decimal sum of order totals, customers with no orders included at
    * 0 — the honest population. The rank-sum formula
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n needs ascending ranks, but ranks
    * are computed on the VALUE-GROUPED frame: a group of c equal values
    * v with cumulative count C contributes v·(c·(C−c) + c(c+1)/2) —
    * Σ i over the group in closed form, invariant to intra-tie order.
    * The Lorenz curve is sampled at the 10 decile grid points by
    * locating the ⌊n·d/10⌋-th smallest customer inside its value group
    * (cum_rev = cumS_prev + (k − C_prev)·v — again tie-order-free).
    * Corpus cost: one orders scan + one dim-sized left join; the window
    * runs over distinct revenue values only. */
  def giniLorenz(spark: SparkSession, dir: String): DataFrame = {
    val rev = customer(spark, dir).select(col("c_custkey"))
      .join(orders(spark, dir).groupBy(col("o_custkey"))
          .agg(round(dsum(col("o_totalprice")), 6).as("r0")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("r0"), lit(0.0)).as("v"))
    val grouped = rev.groupBy("v").agg(count(lit(1)).as("c"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val frame = grouped
      .withColumn("cum_c", sum(col("c")).over(w))
      .withColumn("cum_s", sum(round(col("v") * col("c"), 6)
        .cast("decimal(18,6)")).over(w).cast("double"))
    val agg = frame.agg(
      max(col("cum_c")).as("n"),
      round(dsum(round(col("v") * col("c"), 6)), 6).as("t"),
      round(dsum(round(col("v") *
        (col("c") * (col("cum_c") - col("c")) +
          expr("c * (c + 1) div 2")).cast("double"), 6)), 6).as("sum_ix"))
    val gini = agg.select(col("n"), col("t"),
      round(lit(2.0) * col("sum_ix") / (col("n").cast("double") * col("t")) -
        (col("n") + 1).cast("double") / col("n").cast("double"), 6).as("gini"))
    val deciles = gini.select(col("n"), col("t"), col("gini"),
        explode(sequence(lit(1), lit(10))).as("decile"))
      .withColumn("k", expr("n * decile div 10"))
    frame.join(broadcast(deciles),
        col("cum_c") - col("c") < col("k") && col("k") <= col("cum_c"))
      .select(col("decile"), col("k").as("n_cust"),
        round((col("cum_s") - round((col("cum_c") - col("k")).cast("double") *
          col("v"), 6)) / col("t"), 6).as("cum_rev_share"),
        col("gini"))
      .orderBy("decile")
  }

  /** L252 — Benford first-significant-digit audit of order totals
    * (Newcomb 1881 / Benford 1938; the classic fraud/synthetic-data
    * screen: natural multi-scale amounts follow P(d) = log₁₀(1+1/d)).
    * First digit via integer floor → string head (never log10 of a
    * double near a power-of-10 boundary — the cross-libm trap); the
    * nine expected probabilities are JVM-precomputed round-6 LITERALS
    * shared verbatim with the oracle SQL, so both engines grade
    * against bit-identical expectations. One map-combinable 9-group
    * agg; χ² per digit + the 9-row total via a frame window. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val obs = orders(spark, dir)
      .select(substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val withP = obs.join(broadcast(benfordP(spark)), "digit")
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    withP
      .withColumn("n", sum(col("n_obs")).over(w))
      .withColumn("expected", round(col("n").cast("double") * col("p_benford"), 6))
      .withColumn("chi2_term",
        round((col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) / col("expected"), 6))
      .withColumn("chi2_total", round(sum(col("chi2_term")).over(w), 6))
      .select(col("digit"), col("n_obs"), col("p_benford"), col("expected"),
        col("chi2_term"), col("chi2_total"))
      .orderBy("digit")
  }

  /** The nine Benford probabilities as round-6 literals (JVM log10,
    * frozen at authoring time into both engines' plans). */
  private val BenfordP: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> BigDecimal(math.log10(1.0 + 1.0 / d))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  private def benfordP(spark: SparkSession): DataFrame = {
    import spark.implicits._
    BenfordP.toDF("digit", "p_benford")
  }

  /** L253 — two-sample Kolmogorov–Smirnov test between the click and
    * purchase value distributions (the nonparametric drift test that
    * reads the WHOLE distribution, complementing L126's binned PSI).
    * D = max |F₁−F₂| evaluated on the merged distinct-value frame; the
    * max is taken over the INTEGER |c₁·N₂ − c₂·N₁| (cumulative counts
    * cross-scaled) so the statistic is exact until one final division.
    * p-value via the asymptotic two-sided bound 2·exp(−2D²·nₑ),
    * nₑ = N₁N₂/(N₁+N₂), clamped to 1 — exp round-6 on the 1-row
    * reduce. Corpus cost: one value-grouped agg; the window runs over
    * distinct round-6 values. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val per = events(spark, dir)
      .where(col("event_type").isin("click", "purchase"))
      .groupBy(round(col("value"), 6).as("v"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n1"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n2"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val cum = per
      .withColumn("c1", sum(col("n1")).over(w))
      .withColumn("c2", sum(col("n2")).over(w))
      .withColumn("t1", sum(col("n1")).over(wAll))
      .withColumn("t2", sum(col("n2")).over(wAll))
    cum.agg(
        max(col("t1")).as("n_click"), max(col("t2")).as("n_purchase"),
        max(abs(col("c1") * col("t2") - col("c2") * col("t1"))).as("d_num"))
      .select(col("n_click"), col("n_purchase"),
        round(col("d_num").cast("double") /
          (col("n_click") * col("n_purchase")).cast("double"), 6).as("d_stat"))
      .withColumn("p_value", least(lit(1.0), round(lit(2.0) *
        round(exp(lit(-2.0) * col("d_stat") * col("d_stat") *
          (col("n_click") * col("n_purchase")).cast("double") /
          (col("n_click") + col("n_purchase")).cast("double")), 6), 6)))
  }

  /** L254 — Kaplan–Meier survival estimator (Kaplan & Meier JASA 1958)
    * over user "lifetimes" (hours between a user's first and last
    * event), right-censored for users still active in the final 24 h
    * of the observation window — the product-limit curve every
    * churn/retention analysis starts from. The sequential product
    * Π(1 − dᵢ/nᵢ) is de-sequentialized as exp(Σ ln(1 − dᵢ/nᵢ)) with
    * ln round-6 → decimal cumsum → exp round-6 (the CUSUM
    * prefix-trick's multiplicative sibling). At-risk nᵢ counts BOTH
    * event and censored lifetimes ≥ tᵢ (same-hour censorings count as
    * at risk — the standard discrete-time convention, documented
    * because it is a convention). Corpus cost: one user-keyed agg; the
    * survival window runs over ≤|span-in-hours| distinct lifetimes. */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val horizon = ev.agg(max(unix_micros(col("ts"))).as("t_max"))
    val users = ev.groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("t0"),
        max(unix_micros(col("ts"))).as("t1"))
      .crossJoin(broadcast(horizon))
      .select(expr("(t1 - t0) div 3600000000").as("t_h"),
        (col("t1") > col("t_max") - lit(24L * 3600000000L)).as("censored"))
    val perT = users.groupBy("t_h")
      .agg(sum(when(!col("censored"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("c_all"))
    val w = Window.orderBy(col("t_h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    perT
      .withColumn("n_risk", sum(col("c_all")).over(wAll) -
        (sum(col("c_all")).over(w) - col("c_all")))
      .withColumn("log_s", sum(round(log(lit(1.0) -
          col("d").cast("double") / col("n_risk").cast("double")), 6)
        .cast("decimal(18,6)")).over(w).cast("double"))
      .where(col("d") >= 1)
      .select(col("t_h").as("t_hours"), col("n_risk"), col("d").as("n_events"),
        (col("c_all") - col("d")).as("n_censored_at_t"),
        round(exp(col("log_s")), 6).as("survival"))
      .orderBy("t_hours")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_gini_lorenz" -> (giniLorenz _),
    "stats_benford" -> (benford _),
    "stats_ks_test" -> (ksTest _),
    "stats_kaplan_meier" -> (kaplanMeier _),
  )

  val oracles: Map[String, String] = Map(
    "stats_gini_lorenz" ->
      """WITH rev AS (SELECT c.c_custkey,
             COALESCE(r.r0, 0.0) AS v
           FROM customer c LEFT JOIN (
             SELECT o_custkey,
               round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 6)
               AS r0 FROM orders GROUP BY 1) r ON c.c_custkey = r.o_custkey),
         g AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM rev GROUP BY 1),
         f AS (SELECT v, c,
             SUM(c) OVER (ORDER BY v) AS cum_c,
             CAST(SUM(CAST(round(v * c, 6) AS DECIMAL(18,6)))
               OVER (ORDER BY v) AS DOUBLE) AS cum_s
           FROM g),
         a AS (SELECT MAX(cum_c) AS n,
             round(CAST(SUM(CAST(round(v * c, 6) AS DECIMAL(18,6))) AS DOUBLE), 6)
               AS t,
             round(CAST(SUM(CAST(round(v * CAST(c * (cum_c - c)
               + c * (c + 1) // 2 AS DOUBLE), 6) AS DECIMAL(18,6))) AS DOUBLE), 6)
               AS sum_ix
           FROM f),
         gi AS (SELECT n, t,
             round(2.0 * sum_ix / (CAST(n AS DOUBLE) * t)
               - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
           FROM a),
         dec AS (SELECT n, t, gini, d.decile,
             CAST(n * d.decile // 10 AS BIGINT) AS k
           FROM gi, (SELECT unnest(generate_series(1, 10)) AS decile) d)
         SELECT CAST(decile AS INT) AS decile, k AS n_cust,
           round((cum_s - round(CAST(cum_c - k AS DOUBLE) * v, 6)) / t, 6)
             AS cum_rev_share,
           gini
         FROM dec JOIN f ON cum_c - c < k AND k <= cum_c
         ORDER BY decile""",
    "stats_benford" -> {
      val pRows = BenfordP.map { case (d, p) => f"($d, $p%.6f)" }.mkString(", ")
      s"""WITH p(digit, p_benford) AS (VALUES $pRows),
         obs AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
               AS VARCHAR), 1, 1) AS INT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n_obs
           FROM orders GROUP BY 1),
         j AS (SELECT obs.digit, n_obs, p_benford,
             SUM(n_obs) OVER () AS n
           FROM obs JOIN p ON obs.digit = p.digit),
         t AS (SELECT digit, n_obs, p_benford,
             round(CAST(n AS DOUBLE) * p_benford, 6) AS expected
           FROM j),
         c AS (SELECT *, round((CAST(n_obs AS DOUBLE) - expected)
             * (CAST(n_obs AS DOUBLE) - expected) / expected, 6) AS chi2_term
           FROM t)
         SELECT digit, n_obs, p_benford, expected, chi2_term,
           round(SUM(chi2_term) OVER (), 6) AS chi2_total
         FROM c ORDER BY digit""" },
    "stats_ks_test" ->
      """WITH per AS (SELECT round(value, 6) AS v,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS n2
           FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
         cum AS (SELECT v, n1, n2,
             SUM(n1) OVER (ORDER BY v) AS c1,
             SUM(n2) OVER (ORDER BY v) AS c2,
             SUM(n1) OVER () AS t1, SUM(n2) OVER () AS t2
           FROM per),
         a AS (SELECT CAST(MAX(t1) AS BIGINT) AS n_click,
             CAST(MAX(t2) AS BIGINT) AS n_purchase,
             MAX(abs(c1 * t2 - c2 * t1)) AS d_num
           FROM cum),
         d AS (SELECT n_click, n_purchase,
             round(CAST(d_num AS DOUBLE)
               / (CAST(n_click AS DOUBLE) * CAST(n_purchase AS DOUBLE)), 6)
               AS d_stat
           FROM a)
         SELECT n_click, n_purchase, d_stat,
           LEAST(1.0, round(2.0 * round(exp(-2.0 * d_stat * d_stat
             * CAST(n_click AS DOUBLE) * CAST(n_purchase AS DOUBLE)
             / CAST(n_click + n_purchase AS DOUBLE)), 6), 6)) AS p_value
         FROM d""",
    "stats_kaplan_meier" ->
      s"""WITH h AS (SELECT MAX(epoch_us($evTs)) AS t_max FROM events),
         u AS (SELECT (MAX(epoch_us($evTs)) - MIN(epoch_us($evTs)))
               // 3600000000 AS t_h,
             MAX(epoch_us($evTs)) > (SELECT t_max FROM h) - 86400000000
               AS censored
           FROM events GROUP BY user_id),
         perT AS (SELECT t_h,
             CAST(SUM(CASE WHEN NOT censored THEN 1 ELSE 0 END) AS BIGINT)
               AS d,
             CAST(COUNT(*) AS BIGINT) AS c_all
           FROM u GROUP BY 1),
         f AS (SELECT t_h, d, c_all,
             SUM(c_all) OVER () - (SUM(c_all) OVER (ORDER BY t_h) - c_all)
               AS n_risk
           FROM perT),
         s AS (SELECT t_h, d, c_all, n_risk,
             CAST(SUM(CAST(round(ln(1.0 - CAST(d AS DOUBLE)
               / CAST(n_risk AS DOUBLE)), 6) AS DECIMAL(18,6)))
               OVER (ORDER BY t_h) AS DOUBLE) AS log_s
           FROM f)
         SELECT t_h AS t_hours, CAST(n_risk AS BIGINT) AS n_risk,
           d AS n_events, c_all - d AS n_censored_at_t,
           round(exp(log_s), 6) AS survival
         FROM s WHERE d >= 1 ORDER BY t_hours""",
  )
}
