package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic CEP pattern compiler (round-9, VERDICT r8 #5): a small pattern
  * AST — sequence, Kleene one-or-more, absence (notFollowedBy), within
  * span, after-match skip strategy — compiled onto the SAME single
  * user-shuffle window/gaps-and-islands machinery the four specialized
  * CEP queries in [[Joins]] hand-roll (L47 sequence, L99 Kleene+timeout,
  * L111 skip strategies, L156 absence). Round9Spec proves the compiler
  * reproduces each of those shapes row-for-row from its AST form.
  *
  * Supported fragment (the MATCH_RECOGNIZE-ish subset every template
  * needs; unsupported shapes throw at compile time rather than silently
  * mis-matching):
  *   - all-Exact sequences `A{a} B{b} …` (strictly consecutive, Flink
  *     `next()`), optional `within`;
  *   - RELAXED-contiguity chains of strict blocks `A{a} ~> B{b} ~> C`
  *     (Flink `times(n).consecutive()` blocks joined by `followedBy()` —
  *     unrelated events may interleave BETWEEN blocks, never inside
  *     one), optional `within`: latest-predecessor selection — each
  *     anchor (last-block completion) emits at most ONE match, built
  *     from the latest preceding block completion that itself owns a
  *     valid prefix chain, ties broken by event_id; `within` filters the
  *     finished chain's span. Flink's NO_SKIP full enumeration (every
  *     combination) is deliberately not offered — it is
  *     pairwise-explosive at scale, and the tightest chain is the one
  *     every funnel/attribution query wants;
  *   - `A+ B` (greedy consecutive one-or-more then next), optional
  *     `within`, optionally emitting timed-out partial matches;
  *   - `A` + absence (`notFollowedBy(B).within(w)`);
  *   - homogeneous `A{n}` enumeration counts under skip-to-next vs
  *     skip-past-last ([[matchCounts]]).
  *
  * Scale shape: every compiled plan is one hash shuffle on user_id
  * reused by all window passes plus the final sort — identical to the
  * specialized queries' budget; nothing pairwise, state bounded by the
  * pattern length (lag depth) or the island window. */
object Cep {

  sealed trait Quant
  /** exactly `n` consecutive events of the group's type (n ≥ 1). */
  final case class Exact(n: Int) extends Quant
  /** greedy MAXIMAL run of ≥1 consecutive events (Flink
    * `oneOrMore().consecutive().greedy()`). */
  case object OneOrMore extends Quant

  final case class Group(eventType: String, quant: Quant = Exact(1))

  /** Trailing negation: the match survives only if NO event of
    * `eventType` occurs within `withinUs` µs after the matched event
    * (Flink `notFollowedBy(...).within(...)`). */
  final case class Absence(eventType: String, withinUs: Long)

  sealed trait Skip
  case object SkipToNext extends Skip
  case object SkipPastLast extends Skip

  final case class Pattern(
      groups: Seq[Group],
      withinUs: Option[Long] = None,
      absence: Option[Absence] = None,
      emitTimeouts: Boolean = false,
      relaxed: Boolean = false)

  /** Canonical match schema: one row per match —
    * (user_id, g_first_id, g_last_id, g_count: per-group arrays,
    * first_ts_us, last_ts_us, span_us, matched). Timed-out partial
    * matches (Kleene mode with emitTimeouts) carry null for the
    * unmatched tail group and matched=false. */
  def matches(events: DataFrame, p: Pattern): DataFrame = {
    require(p.groups.nonEmpty, "empty pattern")
    if (p.relaxed) {
      require(p.groups.size >= 2 && p.groups.forall(_.quant.isInstanceOf[Exact]) &&
        p.absence.isEmpty && !p.emitTimeouts,
        "relaxed contiguity supports chains of Exact blocks A{a} ~> B{b} ~> … only")
      return compileRelaxed(events, p)
    }
    (p.groups.map(_.quant), p.absence) match {
      case (qs, None) if qs.forall(_.isInstanceOf[Exact]) =>
        require(!p.emitTimeouts, "emitTimeouts requires a Kleene group")
        compileSequence(events, p)
      case (Seq(OneOrMore, Exact(1)), None) =>
        compileKleeneNext(events, p)
      case (Seq(Exact(1)), Some(abs)) =>
        require(p.withinUs.isEmpty && !p.emitTimeouts,
          "absence carries its own within")
        compileAbsence(events, p.groups.head.eventType, abs)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported pattern fragment: $other (see Cep scaladoc)")
    }
  }

  /** Per-user enumeration counts of the homogeneous pattern `A{n}` under
    * BOTH after-match skip strategies, plus the longest run: within a
    * maximal run of length L there are max(L−n+1, 0) skip-to-next
    * (overlapping) matches and ⌊L/n⌋ skip-past-last (restarting)
    * matches. Output: (user_id, n_skip_to_next, n_skip_past_last,
    * longest_run). */
  def matchCounts(events: DataFrame, eventType: String, n: Int): DataFrame = {
    require(n >= 1)
    islands(events, eventType)
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(
        sum(greatest(col("len") - (n - 1), lit(0L))).as("n_skip_to_next"),
        sum(floor(col("len") / lit(n.toDouble)).cast("long")).as("n_skip_past_last"),
        max(col("len")).as("longest_run"))
  }

  // ------------------------------------------------------------------

  private def seqCols(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"))

  private def byUser: org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))

  /** The shared gaps-and-islands pass: rows of `eventType` tagged with a
    * per-user island id (consecutive runs of that type). */
  private def islands(events: DataFrame, eventType: String): DataFrame =
    seqCols(events)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("is_start", when(col("event_type") === eventType &&
        (col("prev_type").isNull || col("prev_type") =!= eventType), 1L)
        .otherwise(0L))
      .withColumn("island", sum(col("is_start")).over(byUser))
      .where(col("event_type") === eventType)

  /** All-Exact strictly-consecutive sequence: expand the groups to a flat
    * type list of length L, anchor on the LAST event, and test the L−1
    * preceding events with lag — the L47 template, arbitrary types and
    * counts. One window pass, lag depth = pattern length. */
  private def compileSequence(events: DataFrame, p: Pattern): DataFrame = {
    val expanded: Seq[String] =
      p.groups.flatMap(g => Seq.fill(g.quant.asInstanceOf[Exact].n)(g.eventType))
    val L = expanded.size
    def at(pos: Int, c: String): Column = // pos 0..L-1 over the match, anchor = L-1
      if (pos == L - 1) col(c) else lag(col(c), L - 1 - pos).over(byUser)
    val typed = seqCols(events)
      .withColumn("first_ts_us", at(0, "ts_us"))
      .withColumn("cond", expanded.zipWithIndex.map { case (t, j) =>
        at(j, "event_type") === t
      }.reduce(_ && _))
    // group j spans expanded positions [starts(j), starts(j)+n_j)
    val starts = p.groups.scanLeft(0)((acc, g) =>
      acc + g.quant.asInstanceOf[Exact].n).init
    val firstIds = p.groups.zip(starts).map { case (_, s) => at(s, "event_id") }
    val lastIds = p.groups.zip(starts).map { case (g, s) =>
      at(s + g.quant.asInstanceOf[Exact].n - 1, "event_id") }
    val counts = p.groups.map(g => lit(g.quant.asInstanceOf[Exact].n.toLong))
    val span = col("ts_us") - col("first_ts_us")
    typed
      .withColumn("g_first_id", array(firstIds: _*))
      .withColumn("g_last_id", array(lastIds: _*))
      .withColumn("g_count", array(counts: _*))
      .where(col("cond") && p.withinUs.map(span <= _).getOrElse(lit(true)))
      .select(col("user_id"), col("g_first_id"), col("g_last_id"),
        col("g_count"), col("first_ts_us"), col("ts_us").as("last_ts_us"),
        span.as("span_us"), lit(true).as("matched"))
  }

  /** Relaxed-contiguity chain of strict blocks
    * `t0{n0} ~> t1{n1} ~> … ~> t(k-1){n(k-1)}` (Flink
    * `times(n).consecutive()` blocks joined by `followedBy` — unrelated
    * events may sit BETWEEN blocks, never inside one): a row COMPLETES
    * block j when it and its n_j−1 immediate predecessors are all t_j
    * (lag checks, same pass as the strict compiler); each completion
    * carries a struct `(ts_us, event_id, first_ts, first_id, prev)`
    * where `prev` is the LATEST preceding stage-(j−1) completion that
    * itself owns a valid prefix — one running struct-max window pass per
    * edge, every pass on the SAME user_id shuffle (lexicographic struct
    * order ≡ (ts_us, event_id) order since ids are unique, so the tail
    * fields never participate in the comparison). The stage-j frame ends
    * at offset −n_j, so the predecessor block provably ends strictly
    * before this block's first row — blocks cannot overlap. Anchors of
    * the last stage with a non-null chain emit the match; `within`
    * bounds the whole chain's span AFTER selection — the tightest
    * (latest-predecessor) chain either passes or the anchor yields
    * nothing, which keeps one-row-per-anchor determinism. k−1 window
    * passes, state = one struct of depth k per row plus max(n_j) lag
    * depth: linear, nothing pairwise. */
  private def compileRelaxed(events: DataFrame, p: Pattern): DataFrame = {
    val types = p.groups.map(_.eventType)
    val ns = p.groups.map(_.quant.asInstanceOf[Exact].n)
    val k = types.size
    def frameEnding(n: Int) = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -n)
    // completes(j): this row is the LAST row of a strict n_j-run of t_j
    def completes(j: Int): Column =
      (0 until ns(j)).map {
        case 0 => col("event_type") === types(j)
        case i => lag(col("event_type"), i).over(byUser) === types(j)
      }.reduce(_ && _)
    def blockFirst(j: Int, c: String): Column =
      if (ns(j) == 1) col(c) else lag(col(c), ns(j) - 1).over(byUser)
    var df = seqCols(events).withColumn("s0",
      when(completes(0),
        struct(col("ts_us"), col("event_id"),
          blockFirst(0, "ts_us").as("first_ts"),
          blockFirst(0, "event_id").as("first_id"))))
    for (j <- 1 until k) {
      df = df.withColumn(s"p${j - 1}",
        max(col(s"s${j - 1}")).over(frameEnding(ns(j))))
      if (j < k - 1)
        df = df.withColumn(s"s$j",
          when(completes(j) && col(s"p${j - 1}").isNotNull,
            struct(col("ts_us"), col("event_id"),
              blockFirst(j, "ts_us").as("first_ts"),
              blockFirst(j, "event_id").as("first_id"),
              col(s"p${j - 1}").as("prev"))))
    }
    val chain = col(s"p${k - 2}")
    // stage j's struct sits (k-2-j) `prev` hops down from the chain head
    def stage(j: Int): Column =
      (0 until (k - 2 - j)).foldLeft(chain)((c, _) => c.getField("prev"))
    val firstIds = (0 until k - 1).map(j => stage(j).getField("first_id")) :+
      blockFirst(k - 1, "event_id")
    val lastIds = (0 until k - 1).map(j => stage(j).getField("event_id")) :+
      col("event_id")
    val firstTs = stage(0).getField("first_ts")
    val span = col("ts_us") - firstTs
    df.where(completes(k - 1) && chain.isNotNull &&
        p.withinUs.map(span <= _).getOrElse(lit(true)))
      .select(col("user_id"),
        array(firstIds: _*).as("g_first_id"),
        array(lastIds: _*).as("g_last_id"),
        array(ns.map(n => lit(n.toLong)): _*).as("g_count"),
        firstTs.as("first_ts_us"), col("ts_us").as("last_ts_us"),
        span.as("span_us"), lit(true).as("matched"))
  }

  /** `A+ B within w`: maximal islands of A; the event immediately after
    * the island must be B within w of the island's first event — the L99
    * template with arbitrary types; timed-out islands optionally kept. */
  private def compileKleeneNext(events: DataFrame, p: Pattern): DataFrame = {
    val Seq(kleene, next) = p.groups
    val byUserRn = Window.partitionBy(col("user_id")).orderBy(col("rn"))
    val seq = seqCols(events)
      .withColumn("rn", row_number().over(byUser))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUserRn))
      .withColumn("next_type", lead(col("event_type"), 1).over(byUserRn))
      .withColumn("next_id", lead(col("event_id"), 1).over(byUserRn))
      .withColumn("next_ts", lead(col("ts_us"), 1).over(byUserRn))
      .withColumn("is_start", when(col("event_type") === kleene.eventType &&
        (col("prev_type").isNull || col("prev_type") =!= kleene.eventType), 1L)
        .otherwise(0L))
      .withColumn("island", sum(col("is_start")).over(byUserRn))
    val islandW = Window.partitionBy(col("user_id"), col("island"))
    val islandOrd = islandW.orderBy(col("rn"))
    val hit = col("next_type") === next.eventType &&
      p.withinUs.map(w => col("next_ts") - col("first_ts_us") <= w)
        .getOrElse(lit(true))
    val matched = coalesce(hit, lit(false))
    val out = seq.where(col("event_type") === kleene.eventType)
      .withColumn("n_run", count(lit(1)).over(islandW))
      .withColumn("first_id", first(col("event_id")).over(islandOrd))
      .withColumn("first_ts_us", first(col("ts_us")).over(islandOrd))
      // the island's LAST row is the only one whose successor is not an A
      .where(col("next_type").isNull || col("next_type") =!= kleene.eventType)
      .select(col("user_id"),
        array(col("first_id"), when(matched, col("next_id"))).as("g_first_id"),
        array(col("event_id"), when(matched, col("next_id"))).as("g_last_id"),
        array(col("n_run"), when(matched, lit(1L))).as("g_count"),
        col("first_ts_us"),
        when(matched, col("next_ts")).as("last_ts_us"),
        when(matched, col("next_ts") - col("first_ts_us")).as("span_us"),
        matched.as("matched"))
    if (p.emitTimeouts) out else out.where(col("matched"))
  }

  /** `A notFollowedBy B within w`: every A event with no same-user B in
    * the following window — the L156 template. EXISTS over the time range
    * collapses to a running following-extremum: one window pass. */
  private def compileAbsence(events: DataFrame, anchor: String,
      abs: Absence): DataFrame = {
    val following = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    seqCols(events)
      .withColumn("next_banned_us",
        min(when(col("event_type") === abs.eventType, col("ts_us")))
          .over(following))
      .where(col("event_type") === anchor &&
        (col("next_banned_us").isNull ||
          col("next_banned_us") - col("ts_us") > abs.withinUs))
      .select(col("user_id"),
        array(col("event_id")).as("g_first_id"),
        array(col("event_id")).as("g_last_id"),
        array(lit(1L)).as("g_count"),
        col("ts_us").as("first_ts_us"), col("ts_us").as("last_ts_us"),
        lit(0L).as("span_us"), lit(true).as("matched"))
  }
}
