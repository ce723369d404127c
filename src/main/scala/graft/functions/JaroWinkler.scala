package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro–Winkler similarity (Jaro 1989;
  * Winkler 1990 prefix boost — THE edit-style comparator of the record-
  * linkage literature, the default string scorer in Fellegi–Sunter
  * stacks).
  *
  * Why a custom Expression (SURVEY.md §4.3 extension point): Spark ships
  * `levenshtein` but no Jaro–Winkler, and a Scala UDF would box both
  * strings and drop out of whole-stage codegen on the O(pairs) ER
  * comparison stage. Here the generated code makes ONE static call into
  * [[JaroWinkler.sim]] per row — the kernel itself allocates two small
  * boolean arrays and runs the classical two-pass match/transposition
  * scan.
  *
  * Semantics pinned to the textbook definition — match window
  * ⌊max(|a|,|b|)/2⌋−1, transpositions = half the out-of-order matches,
  * Winkler boost ℓ·0.1·(1−J) for the common prefix ℓ ≤ 4 applied only
  * when J > 0.7 — which is bit-for-bit what DuckDB's
  * `jaro_winkler_similarity` computes (probed on reference pairs:
  * martha/marhta = 0.961111, dixon/dicksonx = 0.813333, …), making the
  * oracle twin a built-in call. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.JaroWinkler.sim($x.toString(), $y.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column API. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinklerSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Static kernel — also the JVM twin the specs replay. ASCII-safe on
    * the fixture (part names are lowercase words); operates on UTF-16
    * chars, matching DuckDB's codepoint walk for BMP text. */
  def sim(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2.charAt(j) == s1.charAt(i)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - half).toDouble / m) / 3.0
    if (j <= 0.7) return j
    var l = 0
    val maxL = math.min(4, math.min(l1, l2))
    while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}
