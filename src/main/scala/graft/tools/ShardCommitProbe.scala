package graft.tools

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.concurrent.Executors

/** Micro-bench for the NEXT control-plane ceiling (VERDICT r19 #7):
  * at 50k streams the r19 shard fix removed the directory-mutex
  * convoy, leaving the per-stream manifest CAS loop itself — one JSON
  * temp-write + atomic rename (+ lock file) PER STREAM — as the
  * serial cost. This probe measures, on the real filesystem, the
  * three commit-layout candidates for 250k streams:
  *
  *   A. per-stream manifests (today's layout): N writes+renames,
  *      hash-spread over 64 shard dirs, 32-way parallel — the
  *      baseline the bulk-ingest commit loop pays;
  *   B. batched shard manifests: 64 files, each holding N/64
  *      manifests as one JSON object, one write+rename per SHARD per
  *      commit round — the "multi-stream manifest object" design;
  *   C. per-shard commit journal: 64 append-only journals, N/64
  *      entries appended per shard with ONE fsync per shard — the
  *      "journal now, materialize manifests lazily" design.
  *
  * Run: `sbt "runMain graft.tools.ShardCommitProbe [N]"` (default
  * 50000). Prints one JSON line with seconds per layout and the
  * per-stream cost, for DESIGN-250K.md.
  */
object ShardCommitProbe {

  private def manifestJson(i: Int): String =
    s"""{"tailSeq":${i * 7L},"tailTs":1000,"fencingToken":"","trimPoint":0,""" +
      s""""deletionPending":false,"lastEpoch":3,"reclaimedTo":0,""" +
      s""""generation":0,"version":2}"""

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def parallel(parts: Seq[() => Unit], threads: Int): Unit = {
    val pool = Executors.newFixedThreadPool(threads)
    try parts.map(p => pool.submit(new Runnable { def run(): Unit = p() }))
      .foreach(_.get())
    finally pool.shutdown()
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val shards = 64
    val root = Files.createTempDirectory("graft-scp")
    val shardDirs = (0 until shards).map { s =>
      val d = root.resolve(f"s$s%02d"); Files.createDirectories(d); d
    }
    def atomicWrite(path: Path, content: String): Unit = {
      val tmp = Files.createTempFile(path.getParent, ".tmp", ".json")
      Files.writeString(tmp, content)
      Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

    // A: today's per-stream layout — one manifest file per stream,
    // 32 workers each owning a slice of shards (so same-dir renames
    // stay single-writer, like the real commit loop's spread)
    val perStreamSec = timed {
      parallel((0 until shards).map { s => () =>
        var i = s
        while (i < n) { // streams hash-spread over shards
          atomicWrite(shardDirs(s).resolve(s"stream-$i.json"), manifestJson(i))
          i += shards
        }
      }, 32)
    }

    // B: batched shard manifests — one JSON object per shard holding
    // every manifest in that shard; one write+rename per shard
    val batchedSec = timed {
      parallel((0 until shards).map { s => () =>
        val sb = new StringBuilder("{")
        var i = s
        var first = true
        while (i < n) {
          if (!first) sb.append(',')
          sb.append(s""""stream-$i":${manifestJson(i)}""")
          first = false; i += shards
        }
        sb.append('}')
        atomicWrite(shardDirs(s).resolve("manifests.json"), sb.toString)
      }, 32)
    }

    // C: per-shard journal — append N/64 entries, one fsync per shard
    val journalSec = timed {
      parallel((0 until shards).map { s => () =>
        val ch = java.nio.channels.FileChannel.open(
          shardDirs(s).resolve("journal.jsonl"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
        try {
          var i = s
          while (i < n) {
            ch.write(java.nio.ByteBuffer.wrap(
              (s"""{"stream":"stream-$i","m":${manifestJson(i)}}""" + "\n")
                .getBytes("UTF-8")))
            i += shards
          }
          ch.force(false)
        } finally ch.close()
      }, 32)
    }

    // cleanup (off the timings)
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(rm) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rm(root)

    println(
      f"""{"probe":"shard-commit","n_streams":$n,"shards":$shards,""" +
        f""""per_stream_sec":$perStreamSec%.3f,"batched_shard_sec":$batchedSec%.3f,""" +
        f""""journal_sec":$journalSec%.3f,""" +
        f""""per_stream_us_each":${perStreamSec * 1e6 / n}%.1f,""" +
        f""""batched_us_each":${batchedSec * 1e6 / n}%.1f,""" +
        f""""journal_us_each":${journalSec * 1e6 / n}%.1f}""")
  }
}
