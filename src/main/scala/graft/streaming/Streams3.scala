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

  /** One frame of one video arriving on the stream (the payload is
    * synthesized + decoded row-locally through the SAME
    * [[graft.ops.MmVideo]] code path as batch — zero drift). */
  case class FrameEvent(doc_id: Long, frame_no: Int)
  case class CutAlert(doc_id: Long, frame_no: Long, sad: Long)

  /** L369 — ONLINE shot-boundary detection (the live form of
    * [[graft.ops.Mm4.videoSceneCut]]: a cut alerts the moment its
    * frame arrives — the shape a live-ingest pipeline needs to start
    * a new shot record without waiting for the batch sweep). State is
    * keyed by the VIDEO (doc_id) and holds exactly ONE decoded frame —
    * the latest seen (frame_no, 768 grayscale bytes) — so state is
    * one-frame-per-live-video bounded, never the stream; an arriving
    * frame decodes through the real `javax.imageio` reader, SADs
    * against the stored predecessor, alerts on the same ≥ 8·768
    * threshold, and replaces the stored frame. Intra-batch frames fold
    * in frame_no order; a frame whose predecessor index is missing
    * (out-of-contract arrival) is folded into state without alerting
    * rather than SAD'd against a non-adjacent frame — the batch chain
    * only ever compares consecutive frames. StreamingSpec pins the
    * streamed alerts set-equal to the batch `mm_video_scene_cut` rows
    * with micro-batch boundaries cutting videos mid-sequence. */
  def sceneCutTws(frames: Dataset[FrameEvent]): Dataset[CutAlert] = {
    import frames.sparkSession.implicits._
    frames
      .groupByKey(_.doc_id)
      .transformWithState(new SceneCutProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  class SceneCutProcessor extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, FrameEvent, CutAlert] {
    import org.apache.spark.sql.{Encoders, streaming}
    @transient private var last: streaming.ValueState[(Int, Array[Byte])] = _

    override def init(outputMode: OutputMode,
        timeMode: streaming.TimeMode): Unit =
      last = getHandle.getValueState[(Int, Array[Byte])]("scene_last",
        Encoders.tuple(Encoders.scalaInt, Encoders.BINARY),
        streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FrameEvent],
        timerValues: streaming.TimerValues): Iterator[CutAlert] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[CutAlert]
      var prev = Option(last.get())
      rows.toSeq.sortBy(_.frame_no).foreach { r =>
        val px = graft.ops.MmVideo.decodeFramePixels(key, r.frame_no)
        prev match {
          case Some((pt, pp)) if pt == r.frame_no - 1 =>
            var sad = 0L
            var i = 0
            while (i < px.length) {
              sad += math.abs((px(i) & 0xff) - (pp(i) & 0xff))
              i += 1
            }
            if (sad >= graft.ops.MmVideo.sadThreshold)
              out += CutAlert(key, r.frame_no.toLong, sad)
          case _ => // first frame of the video, or out-of-contract gap
        }
        prev = Some((r.frame_no, px))
      }
      prev.foreach(last.update)
      out.iterator
    }
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

  // -------------------------------------------------- Page–Hinkley

  /** One (possibly partial) contribution to an hour's monitored total —
    * partial sums for the same bucket accumulate in state, so a single
    * hour may arrive split across micro-batches. */
  case class HourPoint(bucket_us: Long, x_micro: Long)

  case class PhPoint(rn: Long, bucket_us: Long, x_micro: Long,
    mean_run: Long, m: Long, ph: Long, alarm: Boolean)

  /** L379 — Page–Hinkley change-point monitor ON A STREAM (the live
    * form of [[graft.ops.Stats4.pageHinkley]]: the drift alarm trips
    * the hour the statistic crosses λ, not in tomorrow's batch — which
    * is the whole point of a SEQUENTIAL change detector; Page 1954's
    * test was designed for exactly this one-pass regime, the batch
    * windows are the retrospective replay). Single-model-key
    * `transformWithState`: state = one (n, S, m, m_min) integer tuple
    * plus the open hours' partial micro sums (O(open hours), nothing
    * corpus-proportional). An hour folds into the statistic only when
    * a LATER hour has been seen (hour-close-by-progress — the
    * bounded-drain analogue of an hour watermark, the
    * [[graft.streaming.Streams.holtTws]] convention). Arithmetic is
    * byte-for-byte the batch frame: exact half-up integer-micro
    * running means, 64-bit m and prefix-min — StreamingSpec pins every
    * emitted (rn, mean, m, ph) bit-equal to
    * [[graft.ops.Stats4.pageHinkleyFrameMicro]] across RocksDB
    * micro-batches, including hours split across batch boundaries. */
  def pageHinkleyTws(hours: Dataset[HourPoint],
      lambdaMicro: Long, deltaMicro: Long): Dataset[PhPoint] = {
    import hours.sparkSession.implicits._
    hours
      .groupByKey(_ => 0L)
      .transformWithState(new PageHinkleyProcessor(lambdaMicro, deltaMicro),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  class PageHinkleyProcessor(lambdaMicro: Long, deltaMicro: Long)
      extends org.apache.spark.sql.streaming
      .StatefulProcessor[Long, HourPoint, PhPoint] {
    import org.apache.spark.sql.{Encoders, streaming}
    @transient private var hourSums: streaming.MapState[Long, Long] = _
    // (n_closed, s_cum, m, m_min) — all exact integer micros
    @transient private var stat:
      streaming.ValueState[(Long, Long, Long, Long)] = _

    override def init(outputMode: OutputMode,
        timeMode: streaming.TimeMode): Unit = {
      hourSums = getHandle.getMapState[Long, Long]("ph_hour_sums",
        Encoders.scalaLong, Encoders.scalaLong, streaming.TTLConfig.NONE)
      stat = getHandle.getValueState[(Long, Long, Long, Long)]("ph_stat",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong), streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[HourPoint],
        timerValues: streaming.TimerValues): Iterator[PhPoint] = {
      rows.foreach { p =>
        val cur = if (hourSums.containsKey(p.bucket_us))
          hourSums.getValue(p.bucket_us) else 0L
        hourSums.updateValue(p.bucket_us, cur + p.x_micro)
      }
      val open = hourSums.keys().toSeq.sorted
      if (open.length <= 1) return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[PhPoint]
      var (n, s, m, mMin) =
        Option(stat.get()).getOrElse((0L, 0L, 0L, Long.MaxValue))
      open.dropRight(1).foreach { bucket => // fold every CLOSED hour
        val x = hourSums.getValue(bucket)
        n += 1
        s += x
        val mean = (2 * s + n) / (2 * n)
        m += x - mean - deltaMicro
        if (m < mMin) mMin = m
        val ph = m - mMin
        out += PhPoint(n, bucket, x, mean, m, ph, ph > lambdaMicro)
        hourSums.removeKey(bucket)
      }
      stat.update((n, s, m, mMin))
      out.iterator
    }
  }
}
