package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Temporal join operators over the events stream — the join shapes a
  * stream engine's users actually run against sequenced records (the
  * reference exposes positional/temporal reads, `common/src/stream.rs`;
  * correlating two record flows by time is what a consumer does with
  * them) and the two classic cases Spark has no built-in operator for:
  * as-of join and interval/range join.
  *
  * Both are implemented as SCALE-FIRST plans, not nested-loop
  * translations:
  *
  *  - as-of = union + one window partitioned by the equality key: a
  *    single shuffle, no join operator at all, state bounded by one
  *    key's history per partition. This is the distributed form of the
  *    kdb/Flink temporal-join semantics.
  *  - range join = equality join on (key, time-bucket) with bucket
  *    width = window width, so each probe row lands in exactly 2
  *    buckets and each (probe, build) pair is examined at most once.
  *    The bucket key bounds fan-out regardless of how long the stream
  *    is — the 100 TB alternative (join on key alone, filter time
  *    after) re-pairs every click with every purchase of that user
  *    across all history.
  *  - the salted join demonstrates the skew pattern: the build side is
  *    replicated ×8 under a salt column and the probe side hashes into
  *    a salt, so one hot key's probe rows spread over 8 tasks. At this
  *    SF the profile dim is broadcastable (and the oracle is the plain
  *    join); the salted plan is exercised because at 1e9 users the dim
  *    no longer broadcasts and heavy users would pin a single task.
  */
object TemporalOps {

  private val HourUs = 3600L * 1000000L

  /** events projected to (user_id, event_id, ts_us, event_type, value). */
  private def ev(s: SparkSession, d: String): DataFrame =
    Records.events(s, d).select(col("user_id"), col("event_id"),
      expr("ts div 1000").as("ts_us"), col("event_type"), col("value"))

  private val EvCte =
    """ev AS (SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
      |         event_type, value FROM events),
      |c AS (SELECT user_id, ts_us, event_id, value FROM ev WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts_us, event_id FROM ev WHERE event_type = 'purchase')""".stripMargin

  /** As-of core: each probe row (user_id, ts_us, p_event_id) matched
    * to the latest quote row (user_id, ts_us, click_id) with
    * quote.ts_us <= probe.ts_us for the same user; same-microsecond
    * ties resolve to the highest click_id; no prior quote → -1
    * sentinels. Plan: tag quotes side=0 / probes side=1, union, ONE
    * window partitioned by user ordered by (ts, side, click_id),
    * carry the last non-null quote forward, keep probe rows — a
    * single shuffle on the equality key, no join node, per-partition
    * state bounded by one user's history.
    */
  private[graft] def asofAttribution(clicks: DataFrame,
                                     purchases: DataFrame): DataFrame = {
    val quotes = clicks
      .select(col("user_id"), col("ts_us"), col("click_id"),
        lit(null).cast(LongType).as("p_event_id"), lit(0).as("side"))
    val probes = purchases
      .select(col("user_id"), col("ts_us"),
        lit(null).cast(LongType).as("click_id"),
        col("p_event_id"), lit(1).as("side"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("side"), col("click_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    quotes.unionByName(probes)
      .withColumn("last_click_id", last("click_id", ignoreNulls = true).over(w))
      .withColumn("last_click_ts",
        last(when(col("side") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .select(
        col("p_event_id"), col("user_id"),
        col("ts_us").as("p_ts_us"),
        coalesce(col("last_click_id"), lit(-1L)).as("click_id"),
        coalesce(col("last_click_ts"), lit(-1L)).as("click_ts_us"),
        coalesce(col("ts_us") - col("last_click_ts"), lit(-1L)).as("gap_us"))
      .orderBy("p_event_id")
  }

  def defs: Seq[QueryDef] = Seq(

    // As-of join: each purchase matched to the same user's most recent
    // click at-or-before it (attribution). See asofAttribution for the
    // union+window plan; ties at the same microsecond resolve to the
    // highest click event_id on both engines.
    QueryDef("j3_asof_join",
      (s, d) => {
        val e = ev(s, d)
        asofAttribution(
          e.where(col("event_type") === "click")
            .select(col("user_id"), col("ts_us"),
              col("event_id").as("click_id")),
          e.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts_us"),
              col("event_id").as("p_event_id")))
      },
      Some(s"""WITH $EvCte
        |SELECT p.event_id AS p_event_id, p.user_id, p.ts_us AS p_ts_us,
        |  coalesce(l.click_id, -1) AS click_id,
        |  coalesce(l.click_ts_us, -1) AS click_ts_us,
        |  coalesce(p.ts_us - l.click_ts_us, -1) AS gap_us
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.event_id AS click_id, c.ts_us AS click_ts_us
        |  FROM c WHERE c.user_id = p.user_id AND c.ts_us <= p.ts_us
        |  ORDER BY c.ts_us DESC, c.event_id DESC LIMIT 1) l ON true
        |ORDER BY p_event_id""".stripMargin)),

    // Interval/range join: clicks in the hour BEFORE each purchase
    // (funnel attribution window). Bucket width == window width, so a
    // click's hour-bucket equals one of the purchase's two probe
    // buckets and every qualifying pair is produced exactly once; the
    // residual range predicate then trims the two edge buckets. Money
    // summed in exact cents (house float-parity rule).
    QueryDef("j4_range_join",
      (s, d) => {
        val e = ev(s, d)
        val clicks = e.where(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_ts_us"),
            expr("CAST(round(value*100) AS BIGINT)").as("c_val_c"),
            expr(s"ts_us div $HourUs").as("hb"))
        val purch = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_event_id"),
            col("ts_us").as("p_ts_us"))
          .withColumn("phb", expr(s"p_ts_us div $HourUs"))
          .withColumn("hb", explode(array(col("phb"), col("phb") - 1)))
        purch.join(clicks, Seq("user_id", "hb"))
          .where(col("c_ts_us") >= col("p_ts_us") - HourUs &&
            col("c_ts_us") < col("p_ts_us"))
          .groupBy("p_event_id", "user_id", "p_ts_us")
          .agg(count(lit(1)).cast(LongType).as("n_clicks"),
            expr("CAST(sum(c_val_c) AS DOUBLE) / 100").as("click_value"))
          .orderBy("p_event_id")
      },
      Some(s"""WITH $EvCte
        |SELECT p.event_id AS p_event_id, p.user_id, p.ts_us AS p_ts_us,
        |  CAST(count(*) AS BIGINT) AS n_clicks,
        |  CAST(sum(CAST(round(c.value*100) AS BIGINT)) AS DOUBLE) / 100 AS click_value
        |FROM p JOIN c ON c.user_id = p.user_id
        |  AND c.ts_us >= p.ts_us - 3600000000 AND c.ts_us < p.ts_us
        |GROUP BY 1, 2, 3 ORDER BY p_event_id""".stripMargin)),

    // Skew-salted join: every event joined to its user's profile (first
    // seen, lifetime event count), aggregated to account-age cohorts.
    // The profile side is exploded ×8 under a salt and the fact side
    // salts by pmod(event_id, 8): identical semantics to the plain
    // join (the oracle), but one hot user's rows now spread over 8
    // shuffle tasks instead of pinning one. The salt constant trades
    // dim replication (×8 rows) against per-task skew — at this SF
    // broadcast() is the right physical plan and AQE's skew-join would
    // kick in on a real cluster; the salted plan is the portable form
    // when neither applies (dim too big to broadcast, skew beyond
    // AQE's split threshold).
    QueryDef("j5_salted_join",
      (s, d) => {
        val e = ev(s, d)
        val salts = 8
        val profile = e.groupBy("user_id")
          .agg(min("ts_us").as("first_us"),
            count(lit(1)).as("n_total"))
          .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
        val fact = e.select(col("user_id"), col("event_id"),
            col("ts_us"), col("event_type"))
          .withColumn("salt", pmod(col("event_id"), lit(salts)).cast(IntegerType))
        fact.join(profile, Seq("user_id", "salt"))
          .withColumn("age_day",
            expr("(ts_us - first_us) div 86400000000"))
          .groupBy("event_type", "age_day")
          .agg(count(lit(1)).cast(LongType).as("n_events"),
            countDistinct("user_id").cast(LongType).as("n_users"))
          .orderBy("event_type", "age_day")
      },
      Some("""WITH ev AS (SELECT user_id, event_id,
        |         CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_type FROM events),
        |prof AS (SELECT user_id, min(ts_us) AS first_us, count(*) AS n_total
        |         FROM ev GROUP BY user_id)
        |SELECT e.event_type,
        |  CAST((e.ts_us - p.first_us) // 86400000000 AS BIGINT) AS age_day,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM ev e JOIN prof p ON e.user_id = p.user_id
        |GROUP BY 1, 2 ORDER BY event_type, age_day""".stripMargin))
  )
}
