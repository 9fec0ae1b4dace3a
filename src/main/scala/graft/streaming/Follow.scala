package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.log.{Layout, StreamStore}

/** R8/R9 — live tail ("follow") of a stream as a Structured Streaming
  * query.
  *
  * The store's data directory IS the streaming source: every committed
  * append lands as a new parquet file, and Spark's file stream source
  * turns new-files-in-order into micro-batches. This matches the
  * reference's follow semantics structurally (read.rs:183-240):
  * - catch-up vs live is unified — a follower that falls behind simply
  *   reads older files (the "lagged follower falls back to catch-up
  *   scan" rule, FOLLOWER_MAX_LAG, is inherent: there is no bounded
  *   broadcast buffer to overflow);
  * - resumption (SSE Last-Event-ID, read.rs:49-65) is the source's
  *   checkpointed file offset — restart the query with the same
  *   checkpointLocation and it continues exactly after the last
  *   delivered batch;
  * - heartbeats / wait budgets are serving-layer concerns around
  *   `StreamingQuery.awaitTermination(timeout)` + progress events.
  *
  * At scale: one follower = one streaming query over one partition
  * directory — no shuffle, no state store; fan-out to N followers is N
  * independent queries over the same immutable files.
  */
object Follow {

  /** Streaming DataFrame of records appended to (basin, stream),
    * starting at `fromSeq` (R2 applied to the live feed). Backed by the
    * custom seq-offset source (graft.streaming.source.GraftStreamSource):
    * offsets are seq_nums, only manifest-committed (= durable) records
    * are offered, and catch-up ranges prune files by footer stats.
    */
  def follow(store: StreamStore, basin: String, stream: String,
             fromSeq: Long = 0L,
             ignoreCommands: Boolean = false,
             maxRecordsPerTrigger: Option[Long] = None,
             maxBytesPerTrigger: Option[Long] = None): DataFrame = {
    var reader = store.spark.readStream.format("graft-stream")
      .option("root", store.root)
      .option("basin", basin)
      .option("stream", stream)
      .option("startSeq", fromSeq)
    // admission control (the FOLLOWER_MAX_LAG analog,
    // lite/src/backend/mod.rs:27): bound each micro-batch so a
    // catch-up over a deep backlog drains as many bounded batches
    maxRecordsPerTrigger.foreach(n =>
      reader = reader.option("maxRecordsPerTrigger", n))
    maxBytesPerTrigger.foreach(n =>
      reader = reader.option("maxBytesPerTrigger", n))
    var df = reader.load()
    if (ignoreCommands)
      // null-safe: NULL headers = encrypted data envelope, never a command
      df = df.where(col("headers").isNull || !(size(col("headers")) === 1 &&
        octet_length(col("headers")(0)("name")) === 0))
    df
  }

  /** File-stream variant (plain Spark file source over the partition
    * dir) — kept for comparison/fallback; may surface rows written but
    * not yet manifest-committed during a crash window.
    */
  def followFiles(store: StreamStore, basin: String, stream: String,
                  fromSeq: Long = 0L,
                  maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // pinned to the CURRENT generation at stream start; a compaction
    // flip mid-stream is the known limitation of this fallback (the
    // DSv2 source re-resolves the generation every plan)
    val dir = Layout.genDir(store.root, basin, stream,
      store.manifest(basin, stream).generation)
    var reader = store.spark.readStream.schema(store.recordSchema)
    maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    reader.parquet(dir).where(col("seq_num") >= fromSeq)
  }

  /** M1-style live metrics over the tail: per-minute ops/bytes with
    * watermarked event time (tumbling window).
    */
  def liveMinuteMetrics(store: StreamStore, basin: String, stream: String): DataFrame = {
    follow(store, basin, stream)
      .withColumn("event_time", timestamp_millis(col("timestamp")))
      .withWatermark("event_time", "1 minute")
      .groupBy(window(col("event_time"), "1 minute"))
      .agg(count(lit(1)).as("n_ops"), sum("metered_size").as("bytes"))
  }
}
