package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** SURVEY §2 stream-engine operators expressed as oracle-checked batch
  * queries over the canonical record relation (Records.records).
  *
  * Each entry names the operator it verifies (A* append pipeline, R*
  * read path, T* retention, C* catalog, M* metrics) with the reference
  * anchor in the comment.
  */
object StreamOps {
  import Records.{records, recordsWithHeaders, RecordsCte}

  private val MicrosPerMinute = 60L * 1000000
  private val MicrosPerHour = 3600L * 1000000
  private val SevenDaysMicros = 7L * 24 * 3600 * 1000000

  def defs: Seq[QueryDef] = Seq(

    // A2 — per-stream contiguous sequence assignment
    // (lite/src/backend/streamer.rs:964-1008)
    QueryDef("a2_sequencing",
      (s, d) => records(s, d)
        .select(col("stream"), col("seq_num"), col("event_id"))
        .orderBy("stream", "seq_num"),
      Some(s"""$RecordsCte
        |SELECT stream, seq_num, event_id FROM records
        |ORDER BY stream, seq_num""".stripMargin)),

    // A3 — ClientPrefer timestamping with monotone non-decreasing clamp
    // (streamer.rs:988-1005)
    QueryDef("a3_ts_monotonic",
      (s, d) => records(s, d)
        .select(col("stream"), col("seq_num"), col("ts_client"), col("ts_assigned"))
        .orderBy("stream", "seq_num"),
      Some(s"""$RecordsCte
        |SELECT stream, seq_num, ts_client, ts_assigned FROM records
        |ORDER BY stream, seq_num""".stripMargin)),

    // Metered-size formula (common/src/record/envelope.rs:74-78)
    QueryDef("s1_metered_size",
      (s, d) => records(s, d)
        .select(col("stream"), col("seq_num"), col("metered_size"))
        .orderBy("stream", "seq_num"),
      Some(s"""$RecordsCte
        |SELECT stream, seq_num, metered_size FROM records
        |ORDER BY stream, seq_num""".stripMargin)),

    // A9 — client batcher grouping by the 1000-record cap
    // (sdk/src/batching.rs:186-266; caps.rs:10)
    QueryDef("a9_batch_by_count",
      (s, d) => records(s, d)
        .groupBy(col("stream"), expr("seq_num div 1000").as("batch_id"))
        .agg(count(lit(1)).cast(LongType).as("n_records"),
             sum("metered_size").cast(LongType).as("batch_bytes"),
             min("seq_num").as("first_seq"),
             max("seq_num").as("last_seq"))
        .orderBy("stream", "batch_id"),
      Some(s"""$RecordsCte
        |SELECT stream, seq_num // 1000 AS batch_id,
        |  CAST(count(*) AS BIGINT) AS n_records,
        |  CAST(sum(metered_size) AS BIGINT) AS batch_bytes,
        |  min(seq_num) AS first_seq, max(seq_num) AS last_seq
        |FROM records GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // R1 — check_tail: next position per stream (streamer.rs:684-686)
    QueryDef("r1_check_tail",
      (s, d) => records(s, d)
        .groupBy("stream")
        .agg((max("seq_num") + 1).as("next_seq"),
             max("ts_assigned").as("last_ts"),
             count(lit(1)).cast(LongType).as("n_records"))
        .orderBy("stream"),
      Some(s"""$RecordsCte
        |SELECT stream, max(seq_num) + 1 AS next_seq,
        |  max(ts_assigned) AS last_ts, CAST(count(*) AS BIGINT) AS n_records
        |FROM records GROUP BY stream ORDER BY stream""".stripMargin)),

    // R2 — start-position resolution: ReadFrom::SeqNum
    // (common/src/stream.rs:309-326)
    QueryDef("r2_start_seq",
      (s, d) => records(s, d)
        .where(col("stream") === "click" && col("seq_num") >= 50)
        .select(col("stream"), col("seq_num"), col("ts_assigned"), col("body"))
        .orderBy("seq_num"),
      Some(s"""$RecordsCte
        |SELECT stream, seq_num, ts_assigned, body FROM records
        |WHERE stream = 'click' AND seq_num >= 50 ORDER BY seq_num""".stripMargin)),

    // R2 — ReadFrom::Timestamp: resolve first seq with ts >= T via the
    // time index analog (lite/src/backend/read.rs:287-317)
    QueryDef("r2_start_timestamp",
      (s, d) => {
        val r = records(s, d).where(col("stream") === "error")
        val t = r.agg(expr("(min(ts_assigned) + max(ts_assigned)) div 2").as("t"))
        val start = r.crossJoin(broadcast(t))
          .where(col("ts_assigned") >= col("t"))
          .agg(min("seq_num").as("start_seq"))
        r.crossJoin(broadcast(start))
          .where(col("seq_num") >= col("start_seq"))
          .select(col("stream"), col("seq_num"), col("ts_assigned"))
          .orderBy("seq_num")
      },
      Some(s"""$RecordsCte,
        |b AS (SELECT (min(ts_assigned) + max(ts_assigned)) // 2 AS t
        |      FROM records WHERE stream = 'error'),
        |st AS (SELECT min(seq_num) AS start_seq FROM records, b
        |       WHERE stream = 'error' AND ts_assigned >= t)
        |SELECT stream, seq_num, ts_assigned FROM records, st
        |WHERE stream = 'error' AND seq_num >= start_seq
        |ORDER BY seq_num""".stripMargin)),

    // R2 — ReadFrom::TailOffset: last k records per stream (saturating)
    QueryDef("r2_tail_offset",
      (s, d) => {
        val r = records(s, d)
        val tails = r.groupBy("stream").agg((max("seq_num") + 1).as("tail"))
        r.join(broadcast(tails), "stream")
          .where(col("seq_num") >= greatest(col("tail") - 25, lit(0L)))
          .select(col("stream"), col("seq_num"), col("ts_assigned"))
          .orderBy("stream", "seq_num")
      },
      Some(s"""$RecordsCte,
        |tails AS (SELECT stream, max(seq_num) + 1 AS tail FROM records GROUP BY stream)
        |SELECT r.stream, r.seq_num, r.ts_assigned
        |FROM records r JOIN tails t ON r.stream = t.stream
        |WHERE r.seq_num >= greatest(t.tail - 25, 0)
        |ORDER BY r.stream, r.seq_num""".stripMargin)),

    // R3 — bounded catch-up scan [start, end) (read.rs:110-182)
    QueryDef("r3_catchup",
      (s, d) => records(s, d)
        .where(col("stream") === "purchase" &&
               col("seq_num") >= 10 && col("seq_num") < 200)
        .select(col("seq_num"), col("body"))
        .orderBy("seq_num"),
      Some(s"""$RecordsCte
        |SELECT seq_num, body FROM records
        |WHERE stream = 'purchase' AND seq_num >= 10 AND seq_num < 200
        |ORDER BY seq_num""".stripMargin)),

    // R4 — ReadLimit::Count (common/src/read_extent.rs:18-136)
    QueryDef("r4_limit_count",
      (s, d) => records(s, d)
        .where(col("stream") === "view")
        .select(col("stream"), col("seq_num"), col("body"))
        .orderBy("seq_num")
        .limit(100),
      Some(s"""$RecordsCte
        |SELECT stream, seq_num, body FROM records
        |WHERE stream = 'view' ORDER BY seq_num LIMIT 100""".stripMargin)),

    // R4 — ReadLimit::Bytes: running metered-size prefix under budget;
    // a record is included only if it fits the remaining bytes
    // (read_extent.rs:88-108)
    QueryDef("r4_limit_bytes",
      (s, d) => {
        val w = Window.partitionBy("stream").orderBy("seq_num")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        records(s, d).where(col("stream") === "error")
          .withColumn("cum_bytes", sum("metered_size").over(w))
          .where(col("cum_bytes") <= 5000)
          .select(col("stream"), col("seq_num"), col("metered_size"), col("cum_bytes"))
          .orderBy("seq_num")
      },
      Some(s"""$RecordsCte,
        |c AS (SELECT stream, seq_num, metered_size,
        |        CAST(sum(metered_size) OVER (PARTITION BY stream ORDER BY seq_num
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_bytes
        |      FROM records WHERE stream = 'error')
        |SELECT stream, seq_num, metered_size, cum_bytes FROM c
        |WHERE cum_bytes <= 5000 ORDER BY seq_num""".stripMargin)),

    // R4 — ReadLimit::CountOrBytes: record admitted only if it fits BOTH
    QueryDef("r4_count_or_bytes",
      (s, d) => {
        val ws = Window.partitionBy("stream").orderBy("seq_num")
        val w = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        records(s, d).where(col("stream") === "error")
          .withColumn("cum_bytes", sum("metered_size").over(w))
          .withColumn("rn", row_number().over(ws).cast(LongType))
          .where(col("cum_bytes") <= 5000 && col("rn") <= 120)
          .select(col("stream"), col("seq_num"), col("cum_bytes"), col("rn"))
          .orderBy("seq_num")
      },
      Some(s"""$RecordsCte,
        |c AS (SELECT stream, seq_num,
        |        CAST(sum(metered_size) OVER win AS BIGINT) AS cum_bytes,
        |        CAST(row_number() OVER (PARTITION BY stream ORDER BY seq_num) AS BIGINT) AS rn
        |      FROM records WHERE stream = 'error'
        |      WINDOW win AS (PARTITION BY stream ORDER BY seq_num
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT stream, seq_num, cum_bytes, rn FROM c
        |WHERE cum_bytes <= 5000 AND rn <= 120 ORDER BY seq_num""".stripMargin)),

    // R5 — exclusive `until` timestamp bound (read_extent.rs:138-176);
    // prefix cut == row filter because assigned timestamps are monotone
    QueryDef("r5_until",
      (s, d) => {
        val r = records(s, d).where(col("stream") === "signup")
        val t = r.agg(expr("(min(ts_assigned) + max(ts_assigned)) div 2").as("t"))
        r.crossJoin(broadcast(t))
          .where(col("ts_assigned") < col("t"))
          .select(col("stream"), col("seq_num"), col("ts_assigned"))
          .orderBy("seq_num")
      },
      Some(s"""$RecordsCte,
        |b AS (SELECT (min(ts_assigned) + max(ts_assigned)) // 2 AS t
        |      FROM records WHERE stream = 'signup')
        |SELECT stream, seq_num, ts_assigned FROM records, b
        |WHERE stream = 'signup' AND ts_assigned < t
        |ORDER BY seq_num""".stripMargin)),

    // R10 — ignore_command_records filter, detected STRUCTURALLY from
    // headers (sdk/src/ops.rs:451-466; record/mod.rs:89-103)
    QueryDef("r10_command_filter",
      (s, d) => recordsWithHeaders(s, d)
        .groupBy("stream")
        .agg(sum(when(!col("is_command"), 1L).otherwise(0L)).as("n_envelope"),
             sum(when(col("is_command"), 1L).otherwise(0L)).as("n_command"))
        .orderBy("stream"),
      Some(s"""$RecordsCte
        |SELECT stream,
        |  CAST(sum(CASE WHEN event_id % 101 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_envelope,
        |  CAST(sum(CASE WHEN event_id % 101 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_command
        |FROM records GROUP BY stream ORDER BY stream""".stripMargin)),

    // T1 — trim: records < trim point invisible; tail unchanged
    // (streamer.rs:377-389; bgtasks/stream_trim.rs:20-152)
    QueryDef("t1_trim_read",
      (s, d) => records(s, d)
        .where(!(col("stream") === "click" && col("seq_num") < 100))
        .groupBy("stream")
        .agg(min("seq_num").as("min_seq"),
             (max("seq_num") + 1).as("next_seq"),
             count(lit(1)).cast(LongType).as("n_records"))
        .orderBy("stream"),
      Some(s"""$RecordsCte
        |SELECT stream, min(seq_num) AS min_seq, max(seq_num) + 1 AS next_seq,
        |  CAST(count(*) AS BIGINT) AS n_records
        |FROM records WHERE NOT (stream = 'click' AND seq_num < 100)
        |GROUP BY stream ORDER BY stream""".stripMargin)),

    // T2 — age retention: only records younger than 7d vs dataset max
    // survive (streamer.rs:1021-1032; config.rs:78-84)
    QueryDef("t2_age_retention",
      (s, d) => {
        val r = records(s, d)
        val cutoff = r.agg((max("ts_assigned") - SevenDaysMicros).as("cutoff"))
        r.crossJoin(broadcast(cutoff))
          .where(col("ts_assigned") >= col("cutoff"))
          .groupBy("stream")
          .agg(count(lit(1)).cast(LongType).as("n_live"),
               min("seq_num").as("first_live_seq"))
          .orderBy("stream")
      },
      Some(s"""$RecordsCte,
        |b AS (SELECT max(ts_assigned) - ${SevenDaysMicros} AS cutoff FROM records)
        |SELECT stream, CAST(count(*) AS BIGINT) AS n_live,
        |  min(seq_num) AS first_live_seq
        |FROM records, b WHERE ts_assigned >= cutoff
        |GROUP BY stream ORDER BY stream""".stripMargin)),

    // T3 — delete-on-empty candidates: streams idle vs dataset max
    // (streamer.rs:448-511; bgtasks/stream_doe.rs)
    QueryDef("t3_delete_on_empty",
      (s, d) => {
        val r = records(s, d)
        val cutoff = r.agg((max("ts_assigned") - 100L * 1000000).as("cutoff"))
        r.groupBy("stream").agg(max("ts_assigned").as("last_ts"))
          .crossJoin(broadcast(cutoff))
          .where(col("last_ts") < col("cutoff"))
          .select(col("stream"), col("last_ts"))
          .orderBy("stream")
      },
      Some(s"""$RecordsCte,
        |b AS (SELECT max(ts_assigned) - ${100L * 1000000} AS cutoff FROM records)
        |SELECT stream, max(ts_assigned) AS last_ts
        |FROM records, b GROUP BY stream, cutoff
        |HAVING max(ts_assigned) < cutoff ORDER BY stream""".stripMargin)),

    // C1 — list with start_after (exclusive) + limit
    // (lite/src/backend/streams.rs:34-77)
    QueryDef("c1_list_streams",
      (s, d) => records(s, d)
        .select("stream").distinct()
        .where(col("stream") > "click")
        .orderBy("stream")
        .limit(3),
      Some(s"""$RecordsCte
        |SELECT DISTINCT stream FROM records WHERE stream > 'click'
        |ORDER BY stream LIMIT 3""".stripMargin)),

    // M1 — per-stream ops per minute bucket (common/src/metrics.rs:9-53)
    QueryDef("m1_ops_per_minute",
      (s, d) => records(s, d)
        .groupBy(col("stream"), expr(s"ts_assigned div $MicrosPerMinute").as("minute"))
        .agg(count(lit(1)).cast(LongType).as("n_ops"))
        .orderBy("stream", "minute"),
      Some(s"""$RecordsCte
        |SELECT stream, ts_assigned // ${MicrosPerMinute} AS minute,
        |  CAST(count(*) AS BIGINT) AS n_ops
        |FROM records GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // M2 — per-stream append throughput per hour (bytes + ops)
    QueryDef("m2_throughput_hourly",
      (s, d) => records(s, d)
        .groupBy(col("stream"), expr(s"ts_assigned div $MicrosPerHour").as("hour"))
        .agg(sum("metered_size").cast(LongType).as("bytes"),
             count(lit(1)).cast(LongType).as("n_ops"))
        .orderBy("stream", "hour"),
      Some(s"""$RecordsCte
        |SELECT stream, ts_assigned // ${MicrosPerHour} AS hour,
        |  CAST(sum(metered_size) AS BIGINT) AS bytes,
        |  CAST(count(*) AS BIGINT) AS n_ops
        |FROM records GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // M3 — per-stream storage gauge = sum of live metered sizes
    QueryDef("m3_storage",
      (s, d) => records(s, d)
        .groupBy("stream")
        .agg(sum("metered_size").cast(LongType).as("storage_bytes"),
             count(lit(1)).cast(LongType).as("n_records"))
        .orderBy("stream"),
      Some(s"""$RecordsCte
        |SELECT stream, CAST(sum(metered_size) AS BIGINT) AS storage_bytes,
        |  CAST(count(*) AS BIGINT) AS n_records
        |FROM records GROUP BY stream ORDER BY stream""".stripMargin)),

    // M4 — metrics request with [start, end) range (metrics.rs:60-92):
    // day 2 of the dataset, minute interval
    QueryDef("m4_metrics_range",
      (s, d) => {
        val r = records(s, d)
        val b = r.agg(expr(s"min(ts_assigned) div $MicrosPerMinute").as("m0"))
        r.crossJoin(broadcast(b))
          .withColumn("minute", expr(s"ts_assigned div $MicrosPerMinute"))
          .where(col("minute") >= col("m0") + 1440 && col("minute") < col("m0") + 2880)
          .groupBy("stream", "minute")
          .agg(count(lit(1)).cast(LongType).as("n_ops"))
          .orderBy("stream", "minute")
      },
      Some(s"""$RecordsCte,
        |b AS (SELECT min(ts_assigned) // ${MicrosPerMinute} AS m0 FROM records)
        |SELECT stream, ts_assigned // ${MicrosPerMinute} AS minute,
        |  CAST(count(*) AS BIGINT) AS n_ops
        |FROM records, b
        |WHERE ts_assigned // ${MicrosPerMinute} >= m0 + 1440
        |  AND ts_assigned // ${MicrosPerMinute} < m0 + 2880
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
  )
}
