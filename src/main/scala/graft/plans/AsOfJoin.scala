package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.LongType

/** The full custom-operator extension point (SURVEY §4.3 preference tier
  * (c): LogicalPlan + SparkStrategy + SparkPlan, injected via
  * `SparkSessionExtensions.injectPlannerStrategy`) exercised on the one
  * operator Spark's planner genuinely lacks: a LEFT AS-OF JOIN executed as
  * a single streaming merge.
  *
  * Semantics: for every left row, attach the LAST right row of the same
  * key whose (time, tiebreak) is ≤ the left row's (time, tiebreak) —
  * lexicographically, exactly the `last(...) over (partition by key order
  * by time, tie rows unbounded preceding..current)` window the composed
  * form uses ([[graft.ops.Joins.joinAsofClickBeforePurchase]], which
  * AsOfSpec proves row-identical). Unmatched left rows keep nulls.
  *
  * Why a physical operator at 100 TB: the composed window form must
  * UNION both sides into one shuffle and sort the union, then filter the
  * probe side back out — every right row is carried through the window
  * state machine. This exec declares `requiredChildDistribution`
  * (co-hash-partitioned by key) + `requiredChildOrdering` ((key, time,
  * tie) ascending), so EnsureRequirements plans each side its own
  * exchange+sort and the join itself is a zero-allocation per-partition
  * merge holding ONE buffered right row and ONE remembered match — the
  * classic sort-merge-as-of kernel, state O(1) regardless of key width.
  *
  * Scope: key/time/tie are LongType columns (the fixture's id/µs-epoch
  * shapes). Driver-facing entry: `join_asof_physical`
  * ([[graft.ops.Joins.joinAsofPhysical]]) routes through this exec on a
  * plain session ([[AsOf.join]] self-installs the strategy) and shares
  * the window twin's DuckDB oracle, so the operator is oracle-verified
  * end-to-end, not just spec-tested.
  */
case class GraftAsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    leftTie: Attribute, rightTie: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): GraftAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: swap the logical node for its exec. `planLater` leaves
  * the children to Spark's own strategies. */
object GraftAsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: GraftAsOfJoin =>
      GraftAsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.rightKey, j.leftTime, j.rightTime, j.leftTie, j.rightTie) :: Nil
    case _ => Nil
  }
}

case class GraftAsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    leftTie: Attribute, rightTie: Attribute) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-hash-partition both sides on the key, sort by (key, time, tie):
  // EnsureRequirements inserts the exchanges/sorts, AQE may satisfy them
  // from reused shuffles — the merge below only ever sees aligned input
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): GraftAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  private def ordinal(attrs: Seq[Attribute], a: Attribute): Int = {
    val i = attrs.indexWhere(_.exprId == a.exprId)
    require(i >= 0, s"attribute $a not found in $attrs")
    i
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lki = ordinal(left.output, leftKey)
    val lti = ordinal(left.output, leftTime)
    val lci = ordinal(left.output, leftTie)
    val rki = ordinal(right.output, rightKey)
    val rti = ordinal(right.output, rightTime)
    val rci = ordinal(right.output, rightTie)
    val rightLen = right.output.length
    val outAttrs = output
    // bind against the NULLABLE right attrs: binding by the child's own
    // (non-null) attributes would codegen away the null check and read 0s
    // out of the all-null unmatched row
    val inAttrs = left.output ++ right.output.map(_.withNullability(true))
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, inAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightLen)
      // Null semantics mirror the window-composed twin exactly: the
      // required child ordering is Ascending = NULLS FIRST, a null key is
      // its own group (window partitionBy groups nulls together), and a
      // null (time, tie) field sorts before any value. Encode each field
      // as (isNull, value) and compare null-first; getLong on a null slot
      // would otherwise silently read 0 and merge null keys into key 0.
      def cmp(aNull: Boolean, a: Long, bNull: Boolean, b: Long): Int =
        if (aNull && bNull) 0
        else if (aNull) -1
        else if (bNull) 1
        else java.lang.Long.compare(a, b)
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastMatch: InternalRow = null
      var lastKeyNull = false
      var lastKey = 0L
      var hasMatch = false
      lIter.map { l =>
        val lkNull = l.isNullAt(lki)
        val lk = if (lkNull) 0L else l.getLong(lki)
        val ltNull = l.isNullAt(lti)
        val lt = if (ltNull) 0L else l.getLong(lti)
        val lcNull = l.isNullAt(lci)
        val lc = if (lcNull) 0L else l.getLong(lci)
        if (hasMatch && cmp(lastKeyNull, lastKey, lkNull, lk) != 0) {
          hasMatch = false; lastMatch = null
        }
        var scanning = true
        while (scanning && rHead != null) {
          val rkNull = rHead.isNullAt(rki)
          val rk = if (rkNull) 0L else rHead.getLong(rki)
          val keyCmp = cmp(rkNull, rk, lkNull, lk)
          val take = keyCmp < 0 || (keyCmp == 0 && {
            val rtNull = rHead.isNullAt(rti)
            val rt = if (rtNull) 0L else rHead.getLong(rti)
            val tCmp = cmp(rtNull, rt, ltNull, lt)
            tCmp < 0 || (tCmp == 0 && {
              val rcNull = rHead.isNullAt(rci)
              val rc = if (rcNull) 0L else rHead.getLong(rci)
              cmp(rcNull, rc, lcNull, lc) <= 0
            })
          })
          if (take) {
            // only same-key rows are candidate matches; smaller-key rows
            // are merely drained (their left partners were earlier or absent)
            if (keyCmp == 0) {
              lastMatch = rHead.copy(); lastKeyNull = lkNull; lastKey = lk
              hasMatch = true
            }
            rHead = if (rIter.hasNext) rIter.next() else null
          } else scanning = false
        }
        proj(joined(l,
          if (hasMatch && cmp(lastKeyNull, lastKey, lkNull, lk) == 0) lastMatch
          else nullRight))
      }
    }
  }
}

/** User-facing constructor: `AsOf.join(purchases, clicks, ...)`. Columns
  * are named per side; all six must be LongType. Works on ANY session:
  * the strategy self-installs through the public
  * `spark.experimental.extraStrategies` hook if the session was not built
  * with [[GraftExtensions]] (which injects [[GraftAsOfStrategy]] at
  * construction). */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftTie: String, rightTie: String): DataFrame = {
    val session = left.sparkSession
    // planner.strategies covers BOTH install paths (extension-injected and
    // experimental), so a GraftExtensions session is not double-registered;
    // synchronized closes the read-modify-write race on the shared var
    AsOf.synchronized {
      if (!session.sessionState.planner.strategies.contains(GraftAsOfStrategy))
        session.experimental.extraStrategies =
          session.experimental.extraStrategies :+ GraftAsOfStrategy
    }
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    // Dataset.join dedups shared exprIds through the analyzer; this
    // constructor bypasses it, and UnsafeProjection binds by exprId, so a
    // same-lineage pair would silently read right columns out of left
    // positions. Refuse instead of corrupting.
    val shared = lp.outputSet.intersect(rp.outputSet)
    require(shared.isEmpty,
      s"left and right share attribute lineage (${shared.mkString(", ")}); " +
        "alias every column of one side (select(col(...).as(...))) before AsOf.join")
    // strict like the lineage/type checks around it: a duplicate column
    // name must not silently bind to whichever attribute happens first
    def attr(p: LogicalPlan, n: String): Attribute = {
      val hits = p.output.filter(_.name == n)
      if (hits.isEmpty) throw new IllegalArgumentException(
        s"column $n not in [${p.output.map(_.name).mkString(", ")}]")
      require(hits.size == 1,
        s"column $n is ambiguous (${hits.size} attributes of that name); " +
          "rename the duplicates before AsOf.join")
      hits.head
    }
    val attrs = Seq(attr(lp, leftKey), attr(rp, rightKey), attr(lp, leftTime),
      attr(rp, rightTime), attr(lp, leftTie), attr(rp, rightTie))
    attrs.foreach(a => require(a.dataType == LongType,
      s"as-of join columns must be LongType; ${a.name} is ${a.dataType}"))
    DatasetBridge.ofRows(left.sparkSession,
      GraftAsOfJoin(lp, rp, attrs(0), attrs(1), attrs(2), attrs(3), attrs(4), attrs(5)))
  }
}
