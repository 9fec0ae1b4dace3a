package graft.log

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** RPC-level usage accounting backing the `/v1/metrics` serving
  * surface (api/src/v1/metrics.rs metric sets; lite stubs the
  * handlers — the cloud meters at its serving edge, which is exactly
  * where this meter lives: one instance per [[HttpRecordsServer]]).
  *
  * Counters are per (basin, stream, kind, minute) with minute
  * resolution — the finest interval the API exposes
  * (TimeseriesInterval::Minute) — and re-bucketed to hour/day at query
  * time. Kinds: `append` / `read` (data-plane RPCs with byte volumes)
  * and `basin` (control-plane RPCs, the BasinOps set).
  *
  * Memory bound, two tiers: past [[UsageMeter.MaxCells]] cells the
  * OLDEST minute's cells are evicted (a horizon trim — old metrics
  * read as zero), tracked through a monotone `minMinute` watermark so
  * the full-key scan runs once per evicted minute, not once per
  * record. If a SINGLE minute alone floods past 2×MaxCells distinct
  * cells, new cells in that minute are refused (existing counters
  * keep counting; the live minute is never wiped) — the hard cap
  * holds without the eviction ever deleting the bucket being written.
  */
final class UsageMeter {
  import UsageMeter._

  private val cells = new ConcurrentHashMap[Key, Cell]()
  private val minMinute = new AtomicLong(Long.MaxValue)

  def record(kind: String, basin: String, stream: String,
             nowMs: Long, ops: Long = 1L, bytes: Long = 0L): Unit = {
    val minute = nowMs / 60000L * 60L
    val key = Key(basin, stream, kind, minute)
    var cell = cells.get(key)
    if (cell == null) {
      if (cells.size >= MaxCells) {
        val oldest = minMinute.get()
        if (oldest < minute) evictMinute(oldest)
        else if (cells.size >= 2 * MaxCells) return // single-minute flood
      }
      cell = cells.computeIfAbsent(key, _ => new Cell)
      // monotone-min watermark (racy CAS loop; ties are fine)
      var cur = minMinute.get()
      while (minute < cur && !minMinute.compareAndSet(cur, minute))
        cur = minMinute.get()
    }
    cell.ops.add(ops)
    cell.bytes.add(bytes)
  }

  /** Drop every cell of `minute` and recompute the watermark — one
    * full scan per evicted minute (amortized over the many records
    * that filled it). */
  private def evictMinute(minute: Long): Unit = synchronized {
    if (minMinute.get() != minute) return // another thread evicted it
    cells.keySet.removeIf(_.minuteSec == minute)
    var newMin = Long.MaxValue
    cells.keys.asIterator().forEachRemaining(k =>
      if (k.minuteSec < newMin) newMin = k.minuteSec)
    minMinute.set(newMin)
  }

  /** Accumulated (bucketStartSec, value) points over [startSec,
    * endSec), re-bucketed to `intervalSec`; zero buckets omitted
    * (sparse, like a real TSDB response). */
  def series(kind: String, basin: Option[String], stream: Option[String],
             startSec: Long, endSec: Long, intervalSec: Long,
             wantBytes: Boolean): Seq[(Long, Double)] = {
    val acc = scala.collection.mutable.TreeMap.empty[Long, Double]
    cells.forEach { (k, c) =>
      if (k.kind == kind && k.minuteSec >= startSec && k.minuteSec < endSec &&
          basin.forall(_ == k.basin) && stream.forall(_ == k.stream)) {
        val bucket = k.minuteSec / intervalSec * intervalSec
        val v = if (wantBytes) c.bytes.sum().toDouble else c.ops.sum().toDouble
        if (v != 0d) acc.updateWith(bucket)(p => Some(p.getOrElse(0d) + v))
      }
    }
    acc.toSeq
  }

  /** Basins with any recorded activity in the window (the
    * ActiveBasins label set). */
  def activeBasins(startSec: Long, endSec: Long): Seq[String] = {
    val out = scala.collection.mutable.SortedSet.empty[String]
    cells.forEach { (k, c) =>
      if (k.basin.nonEmpty && k.minuteSec >= startSec && k.minuteSec < endSec &&
          (c.ops.sum() != 0L || c.bytes.sum() != 0L))
        out += k.basin
    }
    out.toSeq
  }
}

object UsageMeter {
  /** ~100k cells ≈ a week of minutes for ~10 streams or a day for
    * ~70 — bounded regardless of server lifetime. */
  val MaxCells = 100000

  final case class Key(basin: String, stream: String, kind: String,
                       minuteSec: Long)

  final class Cell {
    val ops = new LongAdder
    val bytes = new LongAdder
  }
}
