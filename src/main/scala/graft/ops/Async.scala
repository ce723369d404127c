package graft.ops

import org.apache.spark.sql.Dataset
import graft.streaming.Streams.Event

/** External-service enrichment (the Flink `AsyncDataStream.unorderedWait` /
  * `AsyncFunction` analogue).
  *
  * Spark's unit of concurrency is the partition — hundreds are in flight
  * across executors at once — so the idiomatic equivalent of Flink's
  * per-record async I/O is `mapPartitions` with one client per partition
  * and request BATCHING inside it: amortize connection setup once per
  * partition, group keys into fixed-size batches per round trip, and let
  * inter-partition parallelism supply the concurrency that Flink gets from
  * its in-operator future pool. Emission order inside a partition follows
  * input order (Flink `orderedWait` semantics); global order across
  * partitions is undefined in both engines.
  *
  * The service is injected as a plain (serializable) batch-lookup function
  * so tests can count round trips; production would close over an HTTP/gRPC
  * client built inside the partition lambda (never on the driver — clients
  * don't serialize). */
object Async {

  /** Enrich each event with the service's value for its user_id, batching
    * `batchSize` distinct keys per service call. Returns
    * (event_id, user_id, segment-or-null). */
  def enrichBatched(events: Dataset[Event],
                    lookup: Seq[Long] => Map[Long, String],
                    batchSize: Int): Dataset[(Long, Long, String)] = {
    import events.sparkSession.implicits._
    events.mapPartitions { it =>
      // one "connection" per partition; stream the partition in batches
      it.grouped(batchSize).flatMap { chunk =>
        val resp = lookup(chunk.map(_.user_id).distinct)
        chunk.map(e => (e.event_id, e.user_id, resp.getOrElse(e.user_id, null)))
      }
    }
  }
}
