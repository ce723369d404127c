package graft.ops

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Scalar UDF surface (SURVEY.md §2.K1 — the Flink `ScalarFunction`
  * analogue). Deliberately OFF every shipped query's hot path: a Scala UDF
  * is an optimization barrier (no codegen fusion, no pushdown through it);
  * the production formulations use built-ins or the native
  * [[graft.functions.DotProduct]] expression. This instance exists to
  * demonstrate (and test) the registration surface. */
object Udfs {

  /** Cosine similarity of two double vectors; null-safe, NaN on zero norm. */
  val cosineSim: UserDefinedFunction = udf { (a: Seq[Double], b: Seq[Double]) =>
    if (a == null || b == null) None
    else {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      Some(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
  }
}
