package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: ADVICE regression pins + new-operator cases. */
class Round9Spec extends SparkTestBase {

  test("minhashSigJvm matches the SQL signature on trailing-whitespace text") {
    // Round-8 ADVICE: Java's default split drops trailing empty strings,
    // Spark's split keeps them — a trailing space changed the shingle set.
    // Pin bit-equality on texts the fixture sweep can't reach.
    val s = spark
    import s.implicits._
    val texts = Seq(
      1L -> "alpha beta gamma ",      // one trailing space → 4 tokens in Spark
      2L -> "alpha beta gamma   ",    // three trailing → 6 tokens
      3L -> " leading and inner  sp", // leading + double-inner
      4L -> "a b",                    // under 3 words either way
      5L -> "  ")                     // only separators
    val df = texts.toDF("doc_id", "text")
    df.createOrReplaceTempView("r9_minhash_docs")
    val sqlSigs = ops.Llm.minhashSigsOf(df)
      .collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getLong).toSeq)
      .toMap
    texts.foreach { case (id, text) =>
      val jvm = ops.Llm.minhashSigJvm(text).toSeq
      sqlSigs.get(id) match {
        case Some(expect) => assert(jvm === expect, s"doc $id")
        case None => assert(jvm.isEmpty, s"doc $id")
      }
    }
    // the trailing space must actually matter: doc 1's signature differs
    // from the signature of the trimmed text
    assert(ops.Llm.minhashSigJvm("alpha beta gamma ").toSeq !==
      ops.Llm.minhashSigJvm("alpha beta gamma").toSeq)
  }
}
