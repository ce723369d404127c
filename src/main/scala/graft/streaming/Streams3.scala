package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.OutputMode

/** Round-15 streaming twin for the exact-substring dedup family. */
object Streams3 {

  /** One K-word shingle start of an arriving document (hash computed
    * row-locally with [[graft.Tables.h48jvm]] — the bit-parity-tested
    * JVM twin of the SQL shingle hash in
    * [[graft.ops.Llm10.shingleStarts]], so batch and stream agree on
    * every key by construction). */
  case class ShingleRow(sh: Long, doc_id: Long, nw: Long, pos: Long)

  /** A shingle start flagged as duplicated-vs-prefix: some strictly
    * earlier occurrence (earlier doc, or earlier position of the same
    * doc) already claimed this shingle. */
  case class DupFlag(doc_id: Long, nw: Long, pos: Long)

  /** L365 — ONLINE exact-substring dedup (the live form of
    * [[graft.ops.Llm10.dedupSubstringIncr]], L364's keep-first prefix
    * semantics replayed one arriving document at a time — the form a
    * crawl pipeline actually wants: the moment a page arrives, which
    * of its spans are verbatim copies of anything already ingested?).
    * Each arriving doc explodes row-locally into its K-word shingle
    * starts; state is keyed by the SHINGLE HASH (the same
    * collision-proportional key discipline as batch — state size is
    * DISTINCT-shingle-bounded, the deduped corpus's own vocabulary,
    * never the token stream) holding the first-claimant (doc, pos) as
    * a ValueState; every later occurrence emits a [[DupFlag]].
    * Intra-batch occurrences fold in (doc_id, pos) order, so a
    * micro-batch boundary can never change which occurrence is the
    * keeper — StreamingSpec pins the streamed flags' per-doc span
    * merge equal to the batch `llm_dedup_substring_incr` rows across
    * RocksDB micro-batches. */
  def substrDedupTws(docs: Dataset[(Long, String)]): Dataset[DupFlag] = {
    import docs.sparkSession.implicits._
    val k = graft.ops.Llm10.ShingleK
    docs
      .flatMap { case (id, text) =>
        val w = text.split(" ", -1)
        val nw = w.length.toLong
        if (w.length < k) Iterator.empty
        else (0 to w.length - k).iterator.map(i =>
          ShingleRow(graft.Tables.h48jvm(w.slice(i, i + k).mkString(" ")),
            id, nw, i.toLong))
      }
      .groupByKey(_.sh)
      .transformWithState(new SubstrProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  class SubstrProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, ShingleRow, DupFlag] {
    import org.apache.spark.sql.{Encoders, streaming}
    @transient private var first: streaming.ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode,
        timeMode: streaming.TimeMode): Unit =
      first = getHandle.getValueState[(Long, Long)]("substr_first",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ShingleRow],
        timerValues: streaming.TimerValues): Iterator[DupFlag] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[DupFlag]
      var claimed = Option(first.get()).isDefined
      // fold in (doc, pos) order so the keeper is batch-split-invariant
      rows.toSeq.sortBy(r => (r.doc_id, r.pos)).foreach { r =>
        if (claimed) out += DupFlag(r.doc_id, r.nw, r.pos)
        else {
          first.update((r.doc_id, r.pos))
          claimed = true
        }
      }
      out.iterator
    }
  }
}
