package graft.ops

import org.apache.spark.sql.SparkSession

/** Warehouse table maintenance: small-file compaction — the OPTIMIZE /
  * bin-packing rewrite every long-lived lakehouse table needs once
  * streaming ingests (micro-batch appends, `foreachBatchUpsert`
  * publishes) have fragmented it into thousands of KB-sized files. At
  * 100 TB the file count, not the byte count, is what kills scan
  * planning (one footer read + one task per file), so the maintenance
  * pass bin-packs to a byte target and republishes atomically. */
object Maintenance {

  case class CompactStats(filesBefore: Int, filesAfter: Int, rows: Long,
    bytesBefore: Long)

  /** Rewrite the parquet table at `path` into ⌈bytes/target⌉ files.
    *
    * The rewrite lands in a sibling staging dir first and is swapped in
    * with the SAME rename-aside publish protocol as the streaming upsert
    * sink ([[graft.streaming.Streams.publishUpsertTable]]): at every
    * instant at least one complete copy of the table exists on disk, and
    * a crash mid-swap is repaired by
    * [[graft.streaming.Streams.recoverUpsertTable]]. Readers race-safely
    * see either the old fragmented copy or the new compacted one, never
    * a partial table.
    *
    * `repartition(n)` is a full shuffle of the table — the honest cost
    * of re-binning (a rewrite IS table-proportional); at deployment
    * scale the pass runs per partition-predicate slice (compact only
    * fragmented date partitions), which this same function expresses by
    * pointing `path` at the partition directory. */
  def compactParquet(spark: SparkSession, path: String,
      targetBytesPerFile: Long = 128L * 1024 * 1024): CompactStats = {
    val dir = new java.io.File(path)
    // Self-heal a crashed prior publish (rename-aside leftovers) before
    // inspecting the directory — same recover-at-entry protocol as
    // foreachBatchUpsert, with which this shares the publish path.
    graft.streaming.Streams.recoverUpsertTable(path)
    require(dir.isDirectory, s"not a table directory: $path")
    def parquetFiles(d: java.io.File): Array[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val before = parquetFiles(dir)
    val bytesBefore = before.map(_.length()).sum
    val nOut = math.max(1L, (bytesBefore + targetBytesPerFile - 1) / targetBytesPerFile).toInt
    val df = spark.read.parquet(path)
    val rows = df.count()
    val id = System.currentTimeMillis()
    val staging = new java.io.File(dir.getPath + s".staging-$id")
    df.repartition(nOut).write.mode("overwrite").parquet(staging.getPath)
    graft.streaming.Streams.publishUpsertTable(dir, staging, id)
    CompactStats(before.length, parquetFiles(dir).length, rows, bytesBefore)
  }
}
