package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-tree guard: no bare driver-side `collect()` on any query path.
  * The only sanctioned driver collect is [[graft.Tables.boundedCollect]],
  * which caps the transfer and fails loudly on overflow — a stray
  * `.collect()` in `src/main` is a latent driver OOM at warehouse scale
  * (this is exactly how llm_dedup_embed's unbounded collect slipped
  * through round 4). */
class CollectGuardSpec extends AnyFunSuite {

  private def scalaFiles(dir: java.io.File): Seq[java.io.File] = {
    val (dirs, files) = Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .partition(_.isDirectory)
    files.filter(_.getName.endsWith(".scala")) ++ dirs.flatMap(scalaFiles)
  }

  test("src/main has no bare collect() outside Tables.boundedCollect") {
    val hits = scalaFiles(new java.io.File("src/main/scala")).flatMap { f =>
      scala.util.Using.resource(scala.io.Source.fromFile(f, "UTF-8")) { src =>
        src.getLines().zipWithIndex.collect {
          case (line, i)
              if line.contains(".collect()") || line.contains(".collectAsList()") =>
            s"${f.getPath}:${i + 1}: ${line.trim}"
        }.toList // materialize before the Source closes
      }
    }
    val allowed = hits.filter(h =>
      (h.contains("Tables.scala") && h.contains("ds.limit(maxRows + 1).collect()")) ||
        // PrefixScan pass 1 collects ONE totals row per partition — the
        // transfer is partition-count-grain (≤ the scan's `parts`
        // argument) by construction, never data-grain
        (h.contains("PrefixScan.scala") && h.contains(".collect().sortBy(_._1)")) ||
        // denseRankDense pass 1 collects ONE count per key-range bucket
        // (16·parts buckets) — bucket-count-grain, never data-grain
        (h.contains("PrefixScan.scala") && h.endsWith("}.collect()")))
    assert(hits == allowed,
      s"bare collect() found — route through Tables.boundedCollect:\n${(hits.toSet -- allowed).mkString("\n")}")
  }
}
