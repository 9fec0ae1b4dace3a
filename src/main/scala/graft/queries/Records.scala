package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Canonical sequenced-record view over the driver's `events` table.
  *
  * The events table plays the role of the reference's append traffic
  * (FIXTURES.md §4): basin `bench-basin`, one stream per `event_type`,
  * arrival order = `event_id` order. Sequencing (A2) assigns contiguous
  * per-stream seq_nums; timestamping (A3, ClientPrefer + monotone clamp,
  * ref lite/src/backend/streamer.rs:964-1008) assigns non-decreasing
  * microsecond timestamps; metering follows the exact formula of
  * common/src/record/envelope.rs:74-78.
  *
  * Scale note: sequencing a stream is inherently a per-stream total
  * order — the shuffle on `stream` here is the batch-mode analog of the
  * reference's one-writer-per-stream actor. At 100 TB this is done
  * incrementally at append time (see graft.log.StreamStore), never as a
  * global re-sort; this batch view exists for oracle-checked replay of
  * a bounded ingest log.
  */
object Records {

  val Basin = "bench-basin"

  /** Raw events with `ts` normalized to epoch-NANOS LONG regardless of
    * the parquet's physical encoding. The driver's testdata has shipped
    * two encodings over time:
    *   - TIMESTAMP(NANOS), which Spark only reads as LONG (nanosAsLong)
    *     — already the canonical form;
    *   - TIMESTAMP(MICROS), which Spark reads as TIMESTAMP_NTZ — we
    *     rebase to nanos (`unix_micros * 1000`; exact, micros resolution)
    *     so every downstream `ts div 1000` / `div 1000000` consumer and
    *     the DuckDB `epoch_us(ts)` oracles agree bit-for-bit.
    * On the NTZ path the session timezone is pinned to UTC so the
    * NTZ→instant cast is identity and the view never depends on the
    * caller's JVM zone; the pin is scoped to that branch (every
    * in-repo entrypoint already builds UTC sessions — the conf write
    * only matters, and is documented to happen, for an external
    * caller on the micros encoding).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => raw
      case TimestampNTZType | TimestampType =>
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw.withColumn(
          "ts", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
      case other =>
        throw new IllegalStateException(
          s"events.parquet ts has unsupported type $other; " +
            "expected LONG (nanos) or TIMESTAMP[_NTZ] (micros)")
    }
  }

  /** The sequenced-record relation:
    * basin, stream, seq_num, ts_client, ts_assigned, body, metered_size,
    * event_id (provenance).
    */
  def records(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Partition the sequencing window by the ALIASED `stream` column:
    // predicates on `stream` then push through the Window (references ⊆
    // partitionSpec) and through the Project down to the parquet scan —
    // reading one stream prunes before the shuffle instead of
    // sequencing the whole table first.
    val w = Window.partitionBy($"stream").orderBy($"event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, sfDir).select(
      lit(Basin).as("basin"),
      $"event_type".as("stream"),
      expr("ts div 1000").as("ts_client"),
      $"user_id", $"props", $"event_id")
      .withColumn("seq_num", (row_number().over(w) - 1).cast(LongType))
      .withColumn("ts_assigned", max($"ts_client").over(cum))
      .withColumn("metered_size",
        // 8 + 2*2 headers + (7+len(user_id)) + (10+len(event_type)) + len(props)
        (lit(29L) + length($"user_id".cast(StringType))
          + length($"stream") + length($"props")).cast(LongType))
      .withColumn("body", $"props")
      .drop("props")
  }

  /** Same relation with full header fidelity (ARRAY<STRUCT<name,value>>
    * BINARY pairs) and in-band command records injected on rows where
    * event_id % 101 == 0 (a `fence` command in envelope form: exactly
    * one header with empty name — ref common/src/record/mod.rs:89-103).
    */
  def recordsWithHeaders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val isCmd = $"event_id" % 101 === 0
    records(spark, sfDir)
      .withColumn("headers",
        when(isCmd, array(struct(
          lit(Array.emptyByteArray).as("name"),
          lit("fence".getBytes("UTF-8")).as("value"))))
        .otherwise(array(
          struct(lit("user_id".getBytes("UTF-8")).as("name"),
                 $"user_id".cast(StringType).cast(BinaryType).as("value")),
          struct(lit("event_type".getBytes("UTF-8")).as("name"),
                 $"stream".cast(BinaryType).as("value")))))
      .withColumn("body",
        when(isCmd, lit("tok")).otherwise($"body"))
      // structural command detection, NOT the injection rule:
      .withColumn("is_command",
        size($"headers") === 1 && octet_length($"headers"(0)("name")) === 0)
  }

  /** Shared DuckDB CTE equivalent of records() for oracle SQL. */
  val RecordsCte: String =
    """WITH records AS (
      |  SELECT
      |    'bench-basin' AS basin,
      |    event_type AS stream,
      |    CAST(row_number() OVER w - 1 AS BIGINT) AS seq_num,
      |    CAST(epoch_us(ts) AS BIGINT) AS ts_client,
      |    CAST(max(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ts_assigned,
      |    CAST(29 + length(CAST(user_id AS VARCHAR)) + length(event_type)
      |         + length(props) AS BIGINT) AS metered_size,
      |    props AS body,
      |    event_id
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type ORDER BY event_id)
      |)""".stripMargin
}
