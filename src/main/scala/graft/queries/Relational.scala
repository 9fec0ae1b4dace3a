package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational coverage over the TPC-H-ish star schema: joins (broadcast
  * + shuffle), aggregations, window functions, top-k, distinct, set
  * ops, anti/semi joins. The reference engine has none of these
  * (SURVEY §2.6) — they come free from Catalyst — but they are the
  * operators a user of this engine runs against its tables, and the
  * bench headliners.
  *
  * Cross-engine float parity: money columns are 2-decimal doubles, so
  * all aggregated arithmetic is done in exact integer cents
  * (`round(x*100) AS BIGINT`) and only converted to DOUBLE at the end
  * with an identical expression on both engines.
  */
object Relational {

  private def read(s: SparkSession, d: String, t: String): DataFrame =
    s.read.parquet(s"$d/$t.parquet")

  // Shared by the funnel/retention pair (w3/w4): the micro-timestamped
  // event projection and the first-signup-per-user dim, kept as ONE
  // definition in each engine so the two queries cannot drift.
  private def evUs(s: SparkSession, d: String): DataFrame =
    Records.events(s, d)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"))
  private def firstSignup(ev: DataFrame): DataFrame =
    ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("ts_us"))).as("signup_us"))
      .where(col("signup_us").isNotNull)
  private val EvUsCte =
    """ev AS (
      |  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us
      |  FROM events)""".stripMargin
  private val FirstSignupCte =
    """s1 AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN ts_us END) AS signup_us
      |  FROM ev GROUP BY user_id
      |  HAVING signup_us IS NOT NULL)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Q1-style pricing summary: scan + filter + 8-way aggregate.
    // Predicate + column pruning must reach the parquet scan.
    QueryDef("q1_pricing_summary",
      (s, d) => read(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .withColumn("qty_c", expr("CAST(round(l_quantity*100) AS BIGINT)"))
        .withColumn("ext_c", expr("CAST(round(l_extendedprice*100) AS BIGINT)"))
        .withColumn("disc_c", expr("CAST(round(l_discount*100) AS BIGINT)"))
        .withColumn("tax_c", expr("CAST(round(l_tax*100) AS BIGINT)"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          expr("CAST(sum(qty_c) AS DOUBLE) / 100").as("sum_qty"),
          expr("CAST(sum(ext_c) AS DOUBLE) / 100").as("sum_base_price"),
          expr("CAST(sum(ext_c * (100 - disc_c)) AS DOUBLE) / 10000").as("sum_disc_price"),
          expr("CAST(sum(ext_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / 1000000").as("sum_charge"),
          expr("CAST(sum(qty_c) AS DOUBLE) / 100 / count(*)").as("avg_qty"),
          expr("CAST(sum(disc_c) AS DOUBLE) / 100 / count(*)").as("avg_disc"),
          count(lit(1)).cast(LongType).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(sum(qty_c) AS DOUBLE) / 100 AS sum_qty,
        |  CAST(sum(ext_c) AS DOUBLE) / 100 AS sum_base_price,
        |  CAST(sum(ext_c * (100 - disc_c)) AS DOUBLE) / 10000 AS sum_disc_price,
        |  CAST(sum(ext_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / 1000000 AS sum_charge,
        |  CAST(sum(qty_c) AS DOUBLE) / 100 / count(*) AS avg_qty,
        |  CAST(sum(disc_c) AS DOUBLE) / 100 / count(*) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_quantity*100) AS BIGINT) AS qty_c,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS ext_c,
        |    CAST(round(l_discount*100) AS BIGINT) AS disc_c,
        |    CAST(round(l_tax*100) AS BIGINT) AS tax_c
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Q3-style shipping priority: 3-way join + top-k by revenue.
    // customer is the small side -> broadcast.
    QueryDef("q3_top_orders",
      (s, d) => {
        val cust = read(s, d, "customer")
          .where(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val ord = read(s, d, "orders")
          .where(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
          .select("o_orderkey", "o_custkey", "o_orderdate")
        val li = read(s, d, "lineitem")
          .where(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
          .select(col("l_orderkey"),
            expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("ext_c"),
            expr("CAST(round(l_discount*100) AS BIGINT)").as("disc_c"))
        li.join(ord.join(broadcast(cust),
            ord("o_custkey") === cust("c_custkey")),
            li("l_orderkey") === ord("o_orderkey"))
          .groupBy(col("l_orderkey"),
            unix_millis(col("o_orderdate").cast(TimestampType)).as("order_date_ms"))
          .agg(expr("CAST(sum(ext_c * (100 - disc_c)) AS DOUBLE) / 10000").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
        |  CAST(epoch_ms(o_orderdate) AS BIGINT) AS order_date_ms,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000 AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, order_date_ms
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    // Q5-style revenue by nation: 5-way join, dims broadcast.
    QueryDef("q5_nation_revenue",
      (s, d) => {
        val region = read(s, d, "region").where(col("r_name") === "ASIA")
        val nation = read(s, d, "nation")
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "n_name")
        val cust = read(s, d, "customer")
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey", "n_name")
        val ord = read(s, d, "orders").select("o_orderkey", "o_custkey")
        val li = read(s, d, "lineitem").select(col("l_orderkey"),
          expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("ext_c"),
          expr("CAST(round(l_discount*100) AS BIGINT)").as("disc_c"))
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .groupBy("n_name")
          .agg(expr("CAST(sum(ext_c * (100 - disc_c)) AS DOUBLE) / 10000").as("revenue"),
               count(lit(1)).cast(LongType).as("n_items"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |      * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE) / 10000 AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM region, nation, customer, orders, lineitem
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        |  AND c_nationkey = n_nationkey AND o_custkey = c_custkey
        |  AND l_orderkey = o_orderkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // Window function: top-3 orders per customer by price.
    QueryDef("w1_top_orders_per_customer",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        read(s, d, "orders")
          .withColumn("rn", row_number().over(w).cast(LongType))
          .where(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |FROM orders QUALIFY rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // Exact distinct aggregation.
    QueryDef("d1_distinct_parts",
      (s, d) => read(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").cast(LongType).as("n_parts"),
             countDistinct("l_suppkey").cast(LongType).as("n_supps"),
             count(lit(1)).cast(LongType).as("n_rows"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Anti join: customers with no order in the final year of data.
    QueryDef("j1_customers_no_orders",
      (s, d) => {
        val cust = read(s, d, "customer")
        val ord = read(s, d, "orders")
          .where(col("o_orderdate") >= lit("2001-01-01").cast(TimestampType))
          .select("o_custkey")
        val nation = read(s, d, "nation")
        cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).cast(LongType).as("n_custs"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_custs
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Semi join: suppliers that shipped, per nation.
    QueryDef("j2_active_suppliers",
      (s, d) => {
        val supp = read(s, d, "supplier")
        val li = read(s, d, "lineitem").select("l_suppkey")
        val nation = read(s, d, "nation")
        supp.join(li, supp("s_suppkey") === li("l_suppkey"), "left_semi")
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(count(lit(1)).cast(LongType).as("n_suppliers"))
          .orderBy("n_name")
      },
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Set op: (user, day) pairs with clicks but no purchase that day.
    QueryDef("s2_except_user_days",
      (s, d) => {
        val ev = Records.events(s, d)
          .withColumn("day", expr("ts div 86400000000000"))
        val click = ev.where(col("event_type") === "click")
          .select("user_id", "day").distinct()
        val buy = ev.where(col("event_type") === "purchase")
          .select("user_id", "day").distinct()
        click.except(buy).orderBy("user_id", "day")
      },
      Some("""SELECT DISTINCT user_id, CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day
        |FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT DISTINCT user_id, CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id, day""".stripMargin)),

    // Semi-structured extraction: the record payload is opaque bytes
    // to the engine (schemaless by design, SURVEY §1.3), so analytics
    // over it is schema-ON-READ — here the JSON props field parsed
    // scan-side with get_json_object (codegen'd, no UDF) and
    // aggregated per event type. The parse is a narrow projection
    // fused into the scan stage; nothing shuffles but the 5-row
    // aggregate state.
    QueryDef("s3_props_json",
      (s, d) => Records.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast(LongType).as("n"),
          sum("k").cast(LongType).as("sum_k"),
          min("k").cast(LongType).as("min_k"),
          max("k").cast(LongType).as("max_k"),
          expr("CAST(sum(k) AS DOUBLE) / count(*)").as("avg_k"))
        .orderBy("event_type"),
      Some("""WITH j AS (
        |  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(min(k) AS BIGINT) AS min_k,
        |  CAST(max(k) AS BIGINT) AS max_k,
        |  CAST(sum(k) AS DOUBLE) / count(*) AS avg_k
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Batch sessionization: per-user sessions split at >30-minute
    // event-time gaps — the classic lag -> gap-flag -> running-sum
    // pattern (the batch complement of e2e_stream_session's streaming
    // session windows). Both windows partition by user_id, so no
    // partition outgrows one user's history; ties order by event_id
    // for determinism.
    QueryDef("w2_user_sessions",
      (s, d) => {
        val ev = Records.events(s, d)
          .select(col("user_id"), col("event_id"), expr("ts div 1000").as("ts_us"))
        val wU = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
        val gapped = ev.withColumn("prev_ts", lag("ts_us", 1).over(wU))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
              col("ts_us") - col("prev_ts") > 1800L * 1000000L, 1L).otherwise(0L))
        gapped
          .withColumn("session_seq",
            sum("new_sess").over(wU.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "session_seq")
          .agg(count(lit(1)).cast(LongType).as("n_events"),
            min("ts_us").cast(LongType).as("start_us"),
            max("ts_us").cast(LongType).as("end_us"))
          .withColumn("duration_us", col("end_us") - col("start_us"))
          .orderBy("user_id", "session_seq")
      },
      Some("""WITH ev AS (
        |  SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
        |  FROM events),
        |g AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END
        |      AS new_sess
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT user_id, ts_us,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM g)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(ts_us) AS BIGINT) AS start_us,
        |  CAST(max(ts_us) AS BIGINT) AS end_us,
        |  CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us
        |FROM sess GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin)),

    // Ordered funnel with a 24 h conversion window per stage: per
    // user, first signup -> first click within a day of it -> first
    // purchase within a day of that click (the MATCH_RECOGNIZE
    // pattern a product-analytics user runs over an event stream).
    // Each stage is one aggregate keyed by user (conditional min), and
    // each stage's bound joins back as the 1-row-per-user dim side —
    // tiny relative to the event table, so Spark broadcasts it at any
    // realistic SF and degrades to a user_id-co-partitioned shuffle
    // join only past broadcastable user counts (no hint forces the
    // driver to collect it). Stage timestamps use -1 sentinels so the
    // output is null-free for hashing.
    QueryDef("w3_funnel",
      (s, d) => {
        val DayUs = 86400L * 1000000L
        val ev = evUs(s, d)
        val s1 = firstSignup(ev)
        val s2 = ev.join(s1, "user_id")
          .groupBy("user_id", "signup_us")
          .agg(min(when(col("event_type") === "click" &&
            col("ts_us") >= col("signup_us") &&
            col("ts_us") < col("signup_us") + DayUs, col("ts_us"))).as("click_us"))
        val s3 = ev.join(s2, "user_id")
          .groupBy("user_id", "signup_us", "click_us")
          .agg(min(when(col("event_type") === "purchase" &&
            col("ts_us") >= col("click_us") &&
            col("ts_us") < col("click_us") + DayUs, col("ts_us"))).as("purchase_us"))
        s3.select(col("user_id"), col("signup_us"),
            coalesce(col("click_us"), lit(-1L)).as("click_us"),
            coalesce(col("purchase_us"), lit(-1L)).as("purchase_us"),
            (when(col("purchase_us").isNotNull, 3L)
              .when(col("click_us").isNotNull, 2L)
              .otherwise(1L)).as("stage_reached"))
          .orderBy("user_id")
      },
      Some(s"""WITH $EvUsCte,
        |$FirstSignupCte,
        |s2 AS (
        |  SELECT ev.user_id, s1.signup_us,
        |    min(CASE WHEN event_type = 'click' AND ts_us >= s1.signup_us
        |        AND ts_us < s1.signup_us + 86400000000 THEN ts_us END) AS click_us
        |  FROM ev JOIN s1 USING (user_id) GROUP BY 1, 2),
        |s3 AS (
        |  SELECT ev.user_id, s2.signup_us, s2.click_us,
        |    min(CASE WHEN event_type = 'purchase' AND ts_us >= s2.click_us
        |        AND ts_us < s2.click_us + 86400000000 THEN ts_us END) AS purchase_us
        |  FROM ev JOIN s2 USING (user_id) GROUP BY 1, 2, 3)
        |SELECT user_id, signup_us,
        |  coalesce(click_us, -1) AS click_us,
        |  coalesce(purchase_us, -1) AS purchase_us,
        |  CAST(CASE WHEN purchase_us IS NOT NULL THEN 3
        |            WHEN click_us IS NOT NULL THEN 2
        |            ELSE 1 END AS BIGINT) AS stage_reached
        |FROM s3 ORDER BY user_id""".stripMargin)),

    // Cohort retention: users grouped by signup week, counted as
    // retained in week-offset k if they have ANY event k weeks after
    // their signup week (the retention triangle every product team
    // computes). Two keyed aggregates — signup week per user (the
    // same un-hinted dim join as w3_funnel), then ONE distinct over
    // (user, cohort, offset) after which the count is a plain
    // count(*) — so the event table is scanned twice and never
    // self-joined or double-deduped; offsets key on the user's OWN
    // signup, not calendar alignment.
    QueryDef("w4_retention",
      (s, d) => {
        val WeekUs = 7L * 86400L * 1000000L
        val ev = evUs(s, d)
        val cohort = firstSignup(ev)
          .withColumn("cohort_week", expr(s"signup_us div $WeekUs"))
        val active = ev.join(cohort, "user_id")
          .where(col("ts_us") >= col("signup_us"))
          .select(col("user_id"), col("cohort_week"),
            (expr(s"ts_us div $WeekUs") - col("cohort_week")).as("week_offset"))
          .distinct()
        active.groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).cast(LongType).as("n_active"))
          .orderBy("cohort_week", "week_offset")
      },
      Some(s"""WITH $EvUsCte,
        |$FirstSignupCte,
        |cohort AS (
        |  SELECT user_id, signup_us, signup_us // 604800000000 AS cohort_week
        |  FROM s1),
        |active AS (
        |  SELECT DISTINCT ev.user_id, c.cohort_week,
        |    ev.ts_us // 604800000000 - c.cohort_week AS week_offset
        |  FROM ev JOIN cohort c USING (user_id)
        |  WHERE ev.ts_us >= c.signup_us)
        |SELECT cohort_week, week_offset,
        |  CAST(count(*) AS BIGINT) AS n_active
        |FROM active GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin))
  )
}
