package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-analytics + retrieval operators a 100 TB pipeline runs
  * beside dedup/ANN: mergeable sketches (Count-Min, HyperLogLog),
  * distributed k-means clustering over embeddings, and BM25 keyword
  * retrieval over the documents table.
  *
  * Cross-engine determinism strategy (shared with VectorOps/TextOps):
  * every estimator is built from EXACT integer state — bucket sums,
  * max-rho registers, quantized coordinates, fixed-point score
  * micros — so group-by order can never perturb a float sum. The only
  * floating-point steps are final divisions / a log on already-exact
  * operands, identical IEEE ops in Spark and DuckDB, rounded to 6
  * decimals before compare.
  */
object AnalyticsOps {

  private def docsRaw(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")

  private def docs(s: SparkSession, d: String): DataFrame =
    QueryDef.fanOut(docsRaw(s, d))

  /** BM25 per-doc score micros for the fixed 3-term query — factored
    * so text_bm25_topk and CurationOps.rank_fusion_rrf score through
    * ONE definition (formula drift between the two would silently
    * de-synchronize their oracles). Per-term contributions freeze to
    * fixed-point micros so the doc sum is order-independent.
    */
  private[queries] def bm25DocMicros(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // raw scan: toks is referenced by three consumers (dl, stats, tf),
    // so a fanned reader plans the exchange per subtree — and the
    // split+explode here is light enough that the one-task scan beat
    // the fan-out in the round-21 A/B (0.65 s vs 0.91 s at sf0.1)
    val toks = docsRaw(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).cast(LongType).as("dlen"))
    val stats = dl.agg(
      count(lit(1)).cast(LongType).as("n_docs"),
      sum("dlen").cast(LongType).as("tot"))
    val qt = Seq("spark", "join", "window").toDF("term")
    val tf = toks.join(broadcast(qt), toks("tok") === qt("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).cast(LongType).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast(LongType).as("df"))
    tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("micros", expr(
        """CAST(floor(
             ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
             * (tf * 2.2)
             / (tf + 1.2 * (0.25 + 0.75 * dlen * n_docs / CAST(tot AS DOUBLE)))
             * 1000000 + 0.5) AS BIGINT)"""))
      .groupBy("doc_id").agg(sum("micros").cast(LongType).as("micros"))
  }

  /** The DuckDB mirror of bm25DocMicros as a WITH-body (CTE chain
    * ending in `scored(doc_id, micros)`), shared by the same two
    * oracles.
    */
  private[queries] val bm25ScoredDuck: String =
    """toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dlen FROM toks GROUP BY 1),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |                 CAST(sum(dlen) AS BIGINT) AS tot FROM dl),
      |qt AS (SELECT unnest(['spark', 'join', 'window']) AS term),
      |tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
      |       FROM toks JOIN qt ON toks.tok = qt.term GROUP BY 1, 2),
      |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |contrib AS (
      |  SELECT tf.doc_id,
      |    CAST(floor(
      |      ln((CAST(s.n_docs AS DOUBLE) - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
      |      * (tf.tf * 2.2)
      |      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dlen * s.n_docs / CAST(s.tot AS DOUBLE)))
      |      * 1000000 + 0.5) AS BIGINT) AS micros
      |  FROM tf JOIN dfreq USING (term) JOIN dl ON dl.doc_id = tf.doc_id, stats s),
      |scored AS (SELECT doc_id, CAST(sum(micros) AS BIGINT) AS micros
      |           FROM contrib GROUP BY 1)""".stripMargin
  private def embRaw(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  private def emb(s: SparkSession, d: String): DataFrame =
    QueryDef.fanOut(embRaw(s, d))

  /** Hex digit -> 0..15, identical in Spark SQL and DuckDB. */
  private def hexVal(c: String): String =
    s"(instr('0123456789abcdef', $c) - 1)"

  // ---- Count-Min sketch ----------------------------------------------------

  private val CmRows = 4    // depth: independent hash rows
  private val CmWidth = 256 // width: buckets per row (2 hex digits)

  /** Row-r bucket of `tok`: first two hex digits of md5("r:tok"). */
  private def cmBucketSpark(r: String, tok: String): String = {
    val h = s"md5(CAST(concat(CAST($r AS STRING), ':', $tok) AS BINARY))"
    s"(16 * ${hexVal(s"substr($h, 1, 1)")} + ${hexVal(s"substr($h, 2, 1)")})"
  }
  private def cmBucketDuck(r: String, tok: String): String = {
    val h = s"md5(CAST($r AS VARCHAR) || ':' || $tok)"
    s"(16 * ${hexVal(s"substr($h, 1, 1)")} + ${hexVal(s"substr($h, 2, 1)")})"
  }

  // ---- Misra-Gries heavy hitters -------------------------------------------

  /** One partition's Misra-Gries summary: at most k counters; when a
    * new key arrives with the map full, ALL counters decrement and
    * zeros drop (the classic eviction). Guarantee used by
    * sketch_topk_mg: any item with partition frequency > n_p/(k+1)
    * survives, so the UNION of per-partition summaries contains every
    * item with GLOBAL frequency > N/(k+1) (pigeonhole over the
    * partitioning). Returns surviving keys only — the counts are
    * under-estimates by design and the query recounts candidates
    * exactly in a second pass.
    */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      m.get(t) match {
        case Some(c) => m.update(t, c + 1L)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          // amortized O(1): each decrement sweep removes >= 1 counter
          // paid for by a prior insertion
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          m.foreachEntry { (key, c) =>
            if (c == 1L) dead += key else m.update(key, c - 1L)
          }
          dead.foreach(m.remove)
      }
    }
    m.keysIterator
  }

  // ---- HyperLogLog ---------------------------------------------------------

  private val HllM = 256 // registers (2 hex digits of the item hash)
  /** alpha_256 * m^2, the HLL bias constant for m=256. The leading
    * CAST matters: both engines parse bare fractional literals as
    * DECIMAL and their decimal-division scale rules differ — forcing
    * the first operand to DOUBLE makes the whole chain identical
    * IEEE arithmetic.
    */
  private val HllAlphaM2 =
    "(CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0)) * 65536.0"

  /** Leading-zero count of a nibble value v in 1..15 (v=0 handled by
    * the caller's CASE). */
  private def lzNibble(v: String): String =
    s"""(CASE $v WHEN 1 THEN 3 WHEN 2 THEN 2 WHEN 3 THEN 2
        WHEN 4 THEN 1 WHEN 5 THEN 1 WHEN 6 THEN 1 WHEN 7 THEN 1
        ELSE 0 END)"""

  /** rho = 1 + number of leading zero BITS in hex digits 3..14 of `hh`
    * (the 48 bits after the 8 bucket bits), capped at 30 so the
    * 2^(30-rho) register weights sum exactly in BIGINT. An all-zero
    * window maps to the cap via the 49 sentinel.
    */
  private def rhoExpr(hh: String, listMin: String, transform: String,
      idxRange: String): String = {
    val v = s"${hexVal(s"substr($hh, 2 + i, 1)")}"
    s"""least(30, $listMin($transform($idxRange,
        i -> CASE WHEN $v > 0 THEN 4 * (i - 1) + ${lzNibble(v)} + 1
             ELSE 49 END)))"""
  }
  // i ranges over nibbles 1..12: Spark sequence is inclusive, DuckDB
  // range is end-exclusive.
  private def rhoSpark(hh: String): String =
    rhoExpr(hh, "array_min", "transform", "sequence(1, 12)")
  private def rhoDuck(hh: String): String =
    rhoExpr(hh, "list_min", "list_transform", "range(1, 13)")

  // ---- k-means -------------------------------------------------------------

  private[queries] val KmK = 8      // clusters; init = vectors 0..7
  private[queries] val KmScale = 1000 // fixed-point quantization of coordinates
  /** dedup_semantic_kmeans skew budget: cells above this size are
    * sub-bucketed by the shared hyperplane signature before the
    * within-cell self-join (see the QueryDef doc). 64 matches the
    * repo-wide capped-bucket discipline (TextOps.cappedCandidates) AND
    * puts the oversized path under the DuckDB hash gate: the sf0.01
    * fixture's cells run 54-75 members, so four of eight cells
    * sub-bucket at the oracle scale (all eight do at sf0.1). */
  private[queries] val SemCellCap = 64L

  /** Squared L2 between quantized vector `qv` and centroid
    * (`sums`/`cnt`) as one sequential double fold — same element
    * order both engines; sums and cnt are exact integers so the
    * per-dim division is deterministic IEEE.
    */
  private def kmDistSpark: String =
    """aggregate(sequence(1, 64), CAST(0 AS DOUBLE), (acc, j) ->
       acc + (CAST(element_at(qv, j) AS DOUBLE)
               - CAST(element_at(sums, j) AS DOUBLE) / CAST(cnt AS DOUBLE))
           * (CAST(element_at(qv, j) AS DOUBLE)
               - CAST(element_at(sums, j) AS DOUBLE) / CAST(cnt AS DOUBLE)))"""
  private[queries] def kmDistDuck(q: String, sums: String, cnt: String): String =
    s"""list_reduce(list_transform(range(1, 65),
        j -> (CAST($q[j] AS DOUBLE) - CAST($sums[j] AS DOUBLE) / CAST($cnt AS DOUBLE))
           * (CAST($q[j] AS DOUBLE) - CAST($sums[j] AS DOUBLE) / CAST($cnt AS DOUBLE))),
        (a, b) -> a + b)"""

  /** DuckDB sequential-fold cosine between aug rows a and b — the
    * same fold order as GraftFunctions.cosine_sim. */
  private val semCosineDuck =
    """(list_reduce(list_transform(list_zip(a.embedding, b.embedding),
          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)
        / (sqrt(list_reduce(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
             (acc, v) -> acc + v))
         * sqrt(list_reduce(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
             (acc, v) -> acc + v))))"""

  /** One Lloyd assignment: nearest centroid by exact-arithmetic
    * squared L2, cluster-id tiebreak. Centroids are broadcast — the
    * corpus side never shuffles for assignment. The argmin is a HASH
    * AGGREGATE (min of struct = lexicographic (dist, cluster) — the
    * window's (dist asc, cluster asc) pick, since cluster is unique
    * per group), not a window: the aggregate partial-combines
    * map-side, so the k-way candidate fan-out never reaches an
    * exchange+sort (the same shape ann_pq_learned already uses;
    * guide §2.3 "aggregate before you shuffle").
    */
  private def kmAssign(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(broadcast(cents))
      .withColumn("dist", expr(kmDistSpark))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cluster"), col("qv"))).as("b"))
      .select(col("vec_id"), col("b.qv").as("qv"),
        col("b.cluster").as("cluster"), col("b.dist").as("dist"))

  /** One Lloyd update: centroid = elementwise mean of assigned
    * vectors, kept as EXACT (BIGINT sum list, count) pairs — one
    * map-side-combined aggregate straight to k rows (64 independent
    * integer sums per cluster; the former (vec x dim) explode +
    * two-level aggregate paid a second exchange for the same sums).
    */
  private def kmUpdate(a: DataFrame): DataFrame =
    a.groupBy("cluster")
      .agg(
        array((1 to 64).map(j => sum(expr(s"element_at(qv, $j)"))): _*).as("sums"),
        count(lit(1)).cast(LongType).as("cnt"))

  /** Every vector's distance rank against the FINAL learned centroids
    * after `iters` Lloyd rounds: (vec_id, qv, cluster, dist, arn)
    * where arn = 1 is the own cell. ann_ivf_kmeans probes arn <=
    * nprobe — IVF with a learned coarse quantizer instead of
    * deterministic picks.
    */
  private[queries] def kmeansCellRanks(embDf: DataFrame, k: Int, iters: Int): DataFrame = {
    val qv = kmQv(embDf)
    val cents = kmTrained(qv, k, iters)
    val w = Window.partitionBy("vec_id").orderBy(col("dist").asc, col("cluster"))
    qv.crossJoin(broadcast(cents))
      .withColumn("dist", expr(kmDistSpark))
      .withColumn("arn", row_number().over(w))
      .select("vec_id", "qv", "cluster", "dist", "arn")
  }

  private def kmQv(embDf: DataFrame): DataFrame =
    embDf.select(col("vec_id"), expr(
      s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale + 0.5) AS BIGINT))")
      .as("qv"))

  /** The trained centroid table after `iters` Lloyd rounds. Each
    * round's <= k-row centroid output is localCheckpoint'd: the next
    * round's broadcast (and every downstream consumer) reads k stored
    * rows instead of replaying the whole training chain — without it
    * the lazily-nested broadcasts re-run all prior rounds per
    * consumer (the measured lineage blowup this optimization round
    * removed).
    */
  private def kmTrained(qv: DataFrame, k: Int, iters: Int): DataFrame = {
    val cents0 = qv.where(col("vec_id") < k)
      .select(col("vec_id").cast(IntegerType).as("cluster"),
        col("qv").as("sums"), lit(1L).as("cnt"))
    var cents = cents0
    for (_ <- 1 to iters)
      cents = kmUpdate(kmAssign(qv, cents)).localCheckpoint()
    cents
  }

  /** The Lloyd loop alone: final (vec_id, cluster, dist) after
    * `iters` centroid updates. Shared by cluster_kmeans and the
    * SemDeDup-style blocking in dedup_semantic_kmeans. Uses the
    * hash-agg argmin directly (no arn window pass — consumers of the
    * full distance ranking go through kmeansCellRanks).
    */
  private[graft] def kmeansAssignments(embDf: DataFrame, k: Int, iters: Int): DataFrame = {
    val qv = kmQv(embDf)
    kmAssign(qv, kmTrained(qv, k, iters))
      .select("vec_id", "qv", "cluster", "dist")
  }

  private[graft] def kmeansRun(embDf: DataFrame, k: Int, iters: Int): DataFrame = {
    // two consumers (sizes agg + the join-back) — materialize the
    // narrow assignment once instead of re-running the final assign
    // pass per consumer
    val fin = kmeansAssignments(embDf, k, iters)
      .select("vec_id", "cluster", "dist").localCheckpoint()
    val sizes = fin.groupBy("cluster").agg(count(lit(1)).cast(LongType).as("csize"))
    fin.join(broadcast(sizes), "cluster")
      .withColumn("dist", round(col("dist"), 6))
      .select("vec_id", "cluster", "dist", "csize")
      .orderBy("vec_id")
  }

  /** Count-Min build + estimate for the `topK` true-heaviest tokens.
    * Exposed for spec fixtures (the no-underestimate guarantee over a
    * full synthetic vocabulary).
    */
  private[graft] def countMinEstimates(tokens: DataFrame, topK: Int): DataFrame = {
    val s = tokens.sparkSession
    val counts = tokens.groupBy("tok").agg(count(lit(1)).cast(LongType).as("cnt"))
    val rows = s.range(CmRows).select(col("id").cast(IntegerType).as("r"))
    val sketch = counts.crossJoin(broadcast(rows))
      .withColumn("bucket", expr(cmBucketSpark("r", "tok")))
      .groupBy("r", "bucket")
      .agg(sum("cnt").cast(LongType).as("bsum"))
    val cand = counts
      .orderBy(col("cnt").desc, col("tok"))
      .limit(topK)
      .select(col("tok"), col("cnt").as("exact_count"))
    cand.crossJoin(broadcast(rows))
      .withColumn("bucket", expr(cmBucketSpark("r", "tok")))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy("tok", "exact_count")
      .agg(min("bsum").cast(LongType).as("est_count"))
      .withColumn("over_count", (col("est_count") - col("exact_count")).cast(LongType))
      .select("tok", "exact_count", "est_count", "over_count")
      .orderBy(col("exact_count").desc, col("tok"))
  }

  /** HLL estimate over the distinct values of `items`' single `item`
    * column. Exposed for spec fixtures (accuracy on known
    * cardinalities).
    */
  /** `withExact = true` is the AUDIT mode the oracle checks (exact
    * distinct + rel_err ride along to calibrate the sketch);
    * `withExact = false` is the PRODUCTION mode at 100 TB — the
    * register build is the only aggregation (items never survive the
    * map-side dedup into a global distinct). PlanShapeSpec pins that
    * the sketch-only plan carries no exact companion.
    */
  private[graft] def hllEstimate(items: DataFrame,
                                 withExact: Boolean = true): DataFrame = {
    val s = items.sparkSession
    val sh = items.select(col("item")).distinct()
    val rho = sh
      .withColumn("hh", md5(col("item").cast(BinaryType)))
      .withColumn("bucket", expr(
        s"(16 * ${hexVal("substr(hh, 1, 1)")} + ${hexVal("substr(hh, 2, 1)")})"))
      .withColumn("r", expr(rhoSpark("hh")))
    // absent registers fold in arithmetically (rho >= 1 when present,
    // so m = 0 === absent): zeros = HllM - |present|, each adding 2^30
    // to ssum — no range grid, no left join (same rewrite as
    // hllMergeStats' acc)
    val acc = rho.groupBy("bucket").agg(max("r").as("mr"))
      .agg(
        (coalesce(sum(expr("shiftleft(CAST(1 AS BIGINT), 30 - mr)")), lit(0L)) +
          (lit(HllM.toLong) - count(lit(1))) * (1L << 30))
          .cast(LongType).as("ssum"),
        (lit(HllM.toLong) - count(lit(1))).cast(LongType).as("zeros"))
    val est = acc
      .withColumn("raw", expr(
        s"$HllAlphaM2 / (CAST(ssum AS DOUBLE) / 1073741824.0)"))
      .withColumn("est_distinct", round(expr(
        s"CASE WHEN raw <= 2.5 * $HllM AND zeros > 0 THEN $HllM * ln(CAST($HllM AS DOUBLE) / zeros) ELSE raw END"), 6))
    if (!withExact) return est.select("est_distinct", "zeros")
    val exact = sh.agg(count(lit(1)).cast(LongType).as("exact_distinct"))
    est.crossJoin(exact)
      .withColumn("rel_err", when(col("exact_distinct") === 0, lit(null)).otherwise(round(
        (col("est_distinct") - col("exact_distinct")) / col("exact_distinct"), 6)))
      .select("exact_distinct", "est_distinct", "zeros", "rel_err")
  }

  /** DuckDB mirror of one assignment step over CTE `cents`. */
  private[queries] def kmAssignDuck(cents: String, name: String): String = {
    val dst = kmDistDuck("v.qv", "c.sums", "c.cnt")
    s"""$name AS (
       |  SELECT vec_id, qv, cluster, dist FROM (
       |    SELECT v.vec_id, v.qv, c.cluster, $dst AS dist,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY $dst ASC, c.cluster) AS rn
       |    FROM qv v, $cents c) WHERE rn = 1)""".stripMargin
  }
  private[queries] def kmUpdateDuck(assignCte: String, name: String): String =
    s"""$name AS (
       |  SELECT cluster, list(s ORDER BY j) AS sums, CAST(max(nv) AS BIGINT) AS cnt
       |  FROM (
       |    SELECT a.cluster, t.j, CAST(sum(a.qv[t.j]) AS BIGINT) AS s, count(*) AS nv
       |    FROM $assignCte a, (SELECT unnest(range(1, 65)) AS j) t
       |    GROUP BY 1, 2) GROUP BY cluster)""".stripMargin

  /** DuckDB CTE chain mirroring kmeansCellRanks over `embeddings`:
    * the k=KmK / 2-round Lloyd loop (identical to cluster_kmeans's
    * oracle) ending in `cents2`, plus `ranked_cells`
    * (vec_id, cluster, arn) — every vector's distance rank against
    * the final learned centroids.
    */
  private[queries] def kmeansCellRanksDuck: String = {
    val dst = kmDistDuck("v.qv", "c.sums", "c.cnt")
    s"""qv AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings),
       |cents0 AS (
       |  SELECT CAST(vec_id AS INT) AS cluster, qv AS sums, CAST(1 AS BIGINT) AS cnt
       |  FROM qv WHERE vec_id < $KmK),
       |${kmAssignDuck("cents0", "a1")},
       |${kmUpdateDuck("a1", "cents1")},
       |${kmAssignDuck("cents1", "a2")},
       |${kmUpdateDuck("a2", "cents2")},
       |ranked_cells AS (
       |  SELECT v.vec_id, c.cluster,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY $dst ASC, c.cluster) AS arn
       |  FROM qv v, cents2 c)""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(

    // Count-Min sketch over document word-bigrams: depth 4 x width 256
    // integer counters, hashes = md5("r:tok"). The sketch is ONE
    // narrow pass with map-side partial aggregation (each partition
    // combines to <= d*w cells before the shuffle), and sketches merge
    // by elementwise sum — the property that lets 1000 executors build
    // it independently at 100 TB and combine d*w integers at the end.
    // The estimate for the top-20 true-heaviest bigrams rides along
    // with the exact count, so the CM guarantee (never under, over
    // only on collisions) is oracle-checked per row via over_count.
    QueryDef("sketch_countmin",
      (s, d) => {
        val toks = docs(s, d)
          .select(split(col("text"), " ").as("w"))
          .select(explode(expr(
            """transform(sequence(1, size(w) - 1),
               i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"""))
            .as("tok"))
        countMinEstimates(toks, 20)
      },
      Some(s"""WITH toks AS (
        |  SELECT w[i] || ' ' || w[i+1] AS tok
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents),
        |       unnest(range(1, len(w))) t(i)),
        |counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok),
        |rows_ AS (SELECT CAST(unnest(range(0, $CmRows)) AS INT) AS r),
        |sketch AS (
        |  SELECT r, ${cmBucketDuck("r", "tok")} AS bucket,
        |    CAST(sum(cnt) AS BIGINT) AS bsum
        |  FROM counts, rows_ GROUP BY 1, 2),
        |cand AS (SELECT tok, cnt AS exact_count FROM counts
        |  ORDER BY cnt DESC, tok LIMIT 20)
        |SELECT c.tok, c.exact_count, CAST(min(s.bsum) AS BIGINT) AS est_count,
        |  CAST(min(s.bsum) - c.exact_count AS BIGINT) AS over_count
        |FROM cand c, rows_
        |JOIN sketch s ON s.r = rows_.r
        |  AND s.bucket = ${cmBucketDuck("rows_.r", "c.tok")}
        |GROUP BY 1, 2
        |ORDER BY exact_count DESC, tok""".stripMargin)),

    // Misra-Gries heavy hitters over document word tokens: the classic
    // two-pass top-k that NEVER shuffles the full key space. Pass 1
    // builds one bounded summary (<= k counters) per partition via
    // mapPartitions — mergeable by union, the property that lets 1000
    // executors summarize 100 TB into k*partitions candidate strings.
    // Pass 2 recounts ONLY the candidate set (broadcast semi-join),
    // so the one shuffle is over candidate-matching rows, not all
    // tokens. Output is made partition-INDEPENDENT by the MG
    // guarantee: every item with global frequency > N/(k+1) survives
    // some partition's summary (pigeonhole), so filtering candidates
    // to exact_count*(k+1) > N yields exactly the above-threshold
    // set — deterministic, and recomputable from scratch in SQL.
    QueryDef("sketch_topk_mg",
      (s, d) => {
        import s.implicits._
        val MgK = 64
        def toks = docs(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
        val cands = toks.as[String]
          .mapPartitions(it => misraGries(it, MgK))
          .distinct().toDF("tok")
        val total = toks.agg(count(lit(1)).as("total"))
        toks.join(broadcast(cands), Seq("tok"))
          .groupBy("tok").agg(count(lit(1)).as("exact_count"))
          .crossJoin(broadcast(total))
          .where(col("exact_count") * (MgK + 1) > col("total"))
          .select(col("tok"),
            col("exact_count").cast(LongType).as("exact_count"),
            expr("exact_count * 1000000 div total").cast(LongType)
              .as("share_ppm"))
          .orderBy(col("exact_count").desc, col("tok"))
      },
      Some("""WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |counts AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
        |  FROM toks GROUP BY tok),
        |n AS (SELECT CAST(sum(exact_count) AS BIGINT) AS total FROM counts)
        |SELECT c.tok, c.exact_count,
        |  CAST(c.exact_count * 1000000 // n.total AS BIGINT) AS share_ppm
        |FROM counts c, n
        |WHERE c.exact_count * 65 > n.total
        |ORDER BY exact_count DESC, tok""".stripMargin)),

    // HyperLogLog distinct-count of word-3-gram shingles: m=256
    // registers keyed by the hash's first 2 hex digits, rho = leading
    // zeros of the next 48 bits, capped at 30 so register weights
    // 2^(30-rho) sum EXACTLY in BIGINT (order-independent — the
    // property that makes the register table mergeable by max across
    // 1000 executors: 256 bytes of state summarize any corpus).
    // Exact distinct + relative error ride along; the small-range
    // linear-counting correction is the standard HLL estimator.
    QueryDef("sketch_hll_distinct",
      (s, d) => {
        val sh = TextOps.shingles(
            docs(s, d).select(col("doc_id"), col("text")))
          .select(col("sh").as("item"))
        hllEstimate(sh)
      },
      Some(s"""WITH sh0 AS (
        |  ${TextOps.shinglesSqlOver("documents")}),
        |sh AS (SELECT DISTINCT sh AS s FROM sh0),
        |rho AS (
        |  SELECT (16 * ${hexVal("substr(hh, 1, 1)")} + ${hexVal("substr(hh, 2, 1)")}) AS bucket,
        |    ${rhoDuck("hh")} AS r
        |  FROM (SELECT md5(s) AS hh FROM sh)),
        |regs AS (
        |  SELECT g.bucket, COALESCE(max(rho.r), 0) AS m
        |  FROM (SELECT unnest(range(0, $HllM)) AS bucket) g
        |  LEFT JOIN rho ON rho.bucket = g.bucket GROUP BY 1),
        |acc AS (
        |  SELECT CAST(sum(CAST(1 AS BIGINT) << (30 - m)) AS BIGINT) AS ssum,
        |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros
        |  FROM regs),
        |est AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM sh) AS exact_distinct,
        |    round(CASE WHEN $HllAlphaM2 / (CAST(ssum AS DOUBLE) / 1073741824.0)
        |                    <= 2.5 * $HllM AND zeros > 0
        |      THEN $HllM * ln(CAST($HllM AS DOUBLE) / zeros)
        |      ELSE $HllAlphaM2 / (CAST(ssum AS DOUBLE) / 1073741824.0) END, 6)
        |      AS est_distinct,
        |    zeros
        |  FROM acc)
        |SELECT exact_distinct, est_distinct, zeros,
        |  round((est_distinct - exact_distinct) / NULLIF(exact_distinct, 0), 6) AS rel_err
        |FROM est""".stripMargin)),

    // HLL MERGE — the sketch algebra that makes it a 100 TB operator:
    // per-source register vectors (256 max-rho ints each) are built
    // independently, then the union's registers are just the
    // element-wise max of the per-source ones — associative and
    // lossless, so 1000 executors sketch their partitions and a
    // 20-row reduce yields every per-source estimate AND the
    // cross-source union estimate, where exact countDistinct would
    // shuffle every item. The union row here is computed FROM the
    // per-source registers (the merge path, not a second global
    // sketch); AnalyticsOpsSpec proves it equals the directly-built
    // global sketch bit-for-bit.
    QueryDef("sketch_hll_merge",
      (s, d) => hllMergeStats(s, d),
      Some(mergeOracleSql)),
  ) ++ moreDefs

  /** `withExact = true` = the AUDIT mode sketch_hll_merge oracles
    * (per-source exact counts + the UNION's item-level countDistinct
    * calibrate the merge); `withExact = false` = the 100 TB
    * PRODUCTION mode — register build and max-merge only, NO
    * aggregation ever touches item granularity after the per-source
    * dedup (PlanShapeSpec pins the exact companion's absence).
    */
  private[graft] def hllMergeStats(s: SparkSession, d: String,
                                   withExact: Boolean = true): DataFrame = {
    val dd = docs(s, d)
    // r22 restructure (guide §2.3 "shuffle keys, not payloads"):
    // 1. `source` rides through the shingle explode directly — the
    //    former shingles⋈docs join re-attached a column the explode's
    //    own input row already had.
    // 2. The md5 the register build needs anyway is computed BEFORE
    //    the (source, item) distinct, and the distinct runs on the
    //    16-byte BINARY digest instead of the shingle string — the
    //    dedup exchange carries fixed 16-byte keys, never text.
    //    Exactness: the distinct (and the exact_distinct audit
    //    columns) change only if two distinct shingles collide in
    //    md5 — the same 128-bit hash every register value is already
    //    derived from, and the DuckDB oracle (which dedups on raw
    //    strings) hash-verifies the outputs at every SF.
    // localCheckpoint: five consumers (registers, union registers,
    // two exact counts) would each re-run the explode + md5 +
    // distinct otherwise — same measured inversion as
    // dedup_ngram_prefix's shingle table.
    val pairs = dd
          .select(col("source"), col("text"), split(col("text"), " ").as("w"))
          .select(col("source"),
            explode(TextOps.shingleArray(col("text"), col("w"))).as("item"))
          .select(col("source"),
            unhex(md5(col("item").cast(BinaryType))).as("hb"))
          .distinct()
          .localCheckpoint()
    val rho = pairs
          // lower(hex(..)) == the md5() hex string the r21 plan fed
          // hexVal/rhoSpark (both are lowercase-hex parsers)
          .withColumn("hh", lower(hex(col("hb"))))
          .withColumn("bucket", expr(
            s"(16 * ${hexVal("substr(hh, 1, 1)")} + ${hexVal("substr(hh, 2, 1)")})"))
          .withColumn("r", expr(rhoSpark("hh")))
        // ... and the register table (n_sources x 256 rows — this IS
        // the sketch) is itself read by three consumers; materialized,
        // the md5+rho pass over the pairs runs exactly once.
        val perReg = rho.groupBy("source", "bucket").agg(max("r").as("mr"))
          .localCheckpoint()
        val uniReg = perReg.groupBy("bucket").agg(max("mr").as("mr"))
          .withColumn("source", lit("UNION"))
        val allReg = perReg.unionByName(uniReg)
        // absent registers contribute m = 0 exactly (rho >= 1 for every
        // present register, so "m = 0" === "bucket absent"): fold them
        // in arithmetically — zeros = HllM - |present|, each adding
        // 2^30 to ssum — instead of materializing a source x 256 grid
        // and left-joining it back (two joins and a 5k-row aggregate
        // replaced by one aggregate over the register table)
        val acc = allReg
          .groupBy("source").agg(
            (sum(expr("shiftleft(CAST(1 AS BIGINT), 30 - mr)")) +
              (lit(HllM.toLong) - count(lit(1))) * (1L << 30))
              .cast(LongType).as("ssum"),
            (lit(HllM.toLong) - count(lit(1))).cast(LongType).as("zeros"))
        val est = acc
          .withColumn("raw", expr(
            s"$HllAlphaM2 / (CAST(ssum AS DOUBLE) / 1073741824.0)"))
          .withColumn("est_distinct", round(expr(
            s"""CASE WHEN raw <= 2.5 * $HllM AND zeros > 0
                THEN $HllM * ln(CAST($HllM AS DOUBLE) / zeros)
                ELSE raw END"""), 6))
        if (!withExact)
          return est.select("source", "est_distinct", "zeros").orderBy("source")
        // pairs is already DISTINCT (source, hb): per-source exact is
        // a plain count — countDistinct here re-deduped a deduped
        // table. Only the UNION row still needs an item-level distinct
        // (an item may live in several sources) — the one aggregation
        // the sketch-only mode above avoids; it dedups the 16-byte
        // digests (= the items, absent an md5 collision).
        val exact = pairs.groupBy("source")
          .agg(count(lit(1)).cast(LongType).as("exact_distinct"))
          .unionByName(pairs.agg(
            countDistinct("hb").cast(LongType).as("exact_distinct"))
            .withColumn("source", lit("UNION")))
        est.join(exact, "source")
          .withColumn("rel_err", when(col("exact_distinct") === 0, lit(null)).otherwise(round(
            (col("est_distinct") - col("exact_distinct")) / col("exact_distinct"), 6)))
          .select("source", "exact_distinct", "est_distinct", "zeros", "rel_err")
          .orderBy("source")
  }

  private lazy val mergeOracleSql: String = s"""WITH sh0 AS (
        |  ${TextOps.shinglesSqlOver("documents")}),
        |sh AS (SELECT doc_id, sh AS item FROM sh0),
        |pairs AS (SELECT DISTINCT d.source, sh.item
        |          FROM sh JOIN documents d USING (doc_id)),
        |rho AS (
        |  SELECT source,
        |    (16 * ${hexVal("substr(hh, 1, 1)")} + ${hexVal("substr(hh, 2, 1)")}) AS bucket,
        |    ${rhoDuck("hh")} AS r
        |  FROM (SELECT source, md5(item) AS hh FROM pairs)),
        |preg AS (SELECT source, bucket, max(r) AS mr FROM rho GROUP BY 1, 2),
        |ureg AS (SELECT 'UNION' AS source, bucket, max(mr) AS mr
        |         FROM preg GROUP BY bucket),
        |allreg AS (SELECT * FROM preg UNION ALL SELECT * FROM ureg),
        |grid AS (
        |  SELECT s.source, g.bucket
        |  FROM (SELECT DISTINCT source FROM allreg) s,
        |       (SELECT unnest(range(0, $HllM)) AS bucket) g),
        |acc AS (
        |  SELECT grid.source,
        |    CAST(sum(CAST(1 AS BIGINT) << (30 - COALESCE(allreg.mr, 0))) AS BIGINT)
        |      AS ssum,
        |    CAST(sum(CASE WHEN COALESCE(allreg.mr, 0) = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS zeros
        |  FROM grid LEFT JOIN allreg USING (source, bucket)
        |  GROUP BY 1),
        |exact AS (
        |  SELECT source, CAST(count(DISTINCT item) AS BIGINT) AS exact_distinct
        |  FROM pairs GROUP BY 1
        |  UNION ALL
        |  SELECT 'UNION', CAST(count(DISTINCT item) AS BIGINT) FROM pairs),
        |est AS (
        |  SELECT a.source, e.exact_distinct, a.zeros,
        |    round(CASE WHEN $HllAlphaM2 / (CAST(ssum AS DOUBLE) / 1073741824.0)
        |                    <= 2.5 * $HllM AND zeros > 0
        |      THEN $HllM * ln(CAST($HllM AS DOUBLE) / zeros)
        |      ELSE $HllAlphaM2 / (CAST(ssum AS DOUBLE) / 1073741824.0) END, 6)
        |      AS est_distinct
        |  FROM acc a JOIN exact e USING (source))
        |SELECT source, exact_distinct, est_distinct, zeros,
        |  round((est_distinct - exact_distinct) / NULLIF(exact_distinct, 0), 6) AS rel_err
        |FROM est ORDER BY source""".stripMargin

  private def moreDefs: Seq[QueryDef] = Seq(

    // Distributed k-means over embeddings: k=8, init = vectors 0..7,
    // two Lloyd iterations, final assignment + cluster sizes.
    // Coordinates are fixed-point quantized (x1000) so centroids stay
    // EXACT rationals (BIGINT sum list / count) — group-by order can
    // never flip an argmin across engines. Per iteration the corpus
    // does one broadcast-centroid assignment (no shuffle) and one
    // two-level aggregate (map-side combine to k*64 cells), which is
    // the plan that scales: iteration cost is linear scans + a k*64-row
    // shuffle, independent of corpus row count. Iterations are fixed
    // at 2 for oracle parity; production loops until centroid shift
    // < epsilon with the same per-round plan.
    QueryDef("cluster_kmeans",
      (s, d) => kmeansRun(emb(s, d), KmK, 2),
      Some(s"""WITH qv AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale + 0.5) AS BIGINT)) AS qv
        |  FROM embeddings),
        |cents0 AS (
        |  SELECT CAST(vec_id AS INT) AS cluster, qv AS sums, CAST(1 AS BIGINT) AS cnt
        |  FROM qv WHERE vec_id < $KmK),
        |${kmAssignDuck("cents0", "a1")},
        |${kmUpdateDuck("a1", "cents1")},
        |${kmAssignDuck("cents1", "a2")},
        |${kmUpdateDuck("a2", "cents2")},
        |${kmAssignDuck("cents2", "a3")},
        |sizes AS (SELECT cluster, CAST(count(*) AS BIGINT) AS csize FROM a3 GROUP BY 1)
        |SELECT a.vec_id, a.cluster, round(a.dist, 6) AS dist, s.csize
        |FROM a3 a JOIN sizes s USING (cluster) ORDER BY a.vec_id""".stripMargin)),

    // SemDeDup-style semantic dedup (Abbas et al. 2023): k-means
    // cells over embeddings are the BLOCKING structure — near-dup
    // cosine pairs are searched only WITHIN a cluster, the production
    // recipe for semantic dedup at corpus scale. Identical vectors
    // reach identical exact-arithmetic distances, so copies always
    // land in their original's cell and blocking loses no exact
    // duplicate. k=8 here mirrors cluster_kmeans for oracle parity.
    //
    // STRUCTURAL skew cap (not a comment-level promise): a cell larger
    // than SemCellCap is sub-bucketed by the SAME random-hyperplane
    // signature dedup_embedding_cosine blocks on, so the self-join key
    // is (cluster, sub-bucket) and one hot cell can never go quadratic
    // in corpus size — the two-level blocking real SemDeDup deployments
    // use when k ~ n/cell_budget undershoots. Small cells keep sub = 0
    // (exact within-cell search, no recall change); oversized cells
    // trade the usual sign-LSH recall at the 0.99 band (exact copies
    // share every bit, so planted duplicates are never lost). The
    // oracle replays the size gate and the signature bit-for-bit.
    QueryDef("dedup_semantic_kmeans",
      (s, d) => {
        // union branches from the raw scan, ONE fan-out after
        val base = embRaw(s, d).select(col("vec_id"), col("embedding"))
        val aug = QueryDef.fanOut(base.unionAll(
          base.where(col("vec_id") % 23 === 0)
            .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))))
        // materialize the assignment once: both self-join sides (and
        // the cell-size aggregate) consume it, and without the
        // checkpoint the 2-Lloyd-round subtree replays per consumer
        val asn = kmeansAssignments(aug, KmK, 2).select("vec_id", "cluster")
          .join(aug, "vec_id")
          .localCheckpoint()
        // <= k rows; rides a broadcast join, never a shuffle
        val csize = asn.groupBy("cluster")
          .agg(count(lit(1)).cast(LongType).as("csize"))
        val keyed = asn
          .join(broadcast(csize), "cluster")
          .withColumn("sub", when(col("csize") > SemCellCap,
              expr(VectorOps.hyperplaneSigSpark("embedding")).cast(LongType))
            .otherwise(lit(0L)))
        val a = keyed.select(col("cluster"), col("sub"),
          col("vec_id").as("id_a"), col("embedding").as("va"))
        val b = keyed.select(col("cluster"), col("sub"),
          col("vec_id").as("id_b"), col("embedding").as("vb"))
        a.join(b, Seq("cluster", "sub"))
          .where(col("id_a") < col("id_b"))
          .withColumn("score", round(
            graft.functions.GraftFunctions.cosine_sim(col("va"), col("vb")), 6))
          .where(col("score") >= 0.99)
          .select("cluster", "id_a", "id_b", "score")
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH aug AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 23 = 0),
        |qv AS (
        |  SELECT vec_id, list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * $KmScale + 0.5) AS BIGINT)) AS qv
        |  FROM aug),
        |cents0 AS (
        |  SELECT CAST(vec_id AS INT) AS cluster, qv AS sums, CAST(1 AS BIGINT) AS cnt
        |  FROM qv WHERE vec_id < $KmK),
        |${kmAssignDuck("cents0", "a1")},
        |${kmUpdateDuck("a1", "cents1")},
        |${kmAssignDuck("cents1", "a2")},
        |${kmUpdateDuck("a2", "cents2")},
        |${kmAssignDuck("cents2", "a3")},
        |csize AS (
        |  SELECT cluster, CAST(count(*) AS BIGINT) AS csize FROM a3 GROUP BY 1),
        |keyed AS (
        |  SELECT a3.cluster, a3.vec_id, g.embedding,
        |    CASE WHEN c.csize > $SemCellCap
        |      THEN CAST(${VectorOps.hyperplaneSigDuck("g.embedding")} AS BIGINT)
        |      ELSE 0 END AS sub
        |  FROM a3 JOIN aug g ON g.vec_id = a3.vec_id
        |  JOIN csize c USING (cluster))
        |SELECT ka.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(${semCosineDuck}, 6) AS score
        |FROM keyed ka JOIN keyed kb
        |  ON ka.cluster = kb.cluster AND ka.sub = kb.sub AND ka.vec_id < kb.vec_id
        |JOIN aug a ON a.vec_id = ka.vec_id
        |JOIN aug b ON b.vec_id = kb.vec_id
        |WHERE round(${semCosineDuck}, 6) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin)),

    // Cross-document duplicated-substring REMOVAL — the transform half
    // of exact substring dedup (Lee et al. 2022 "Deduplicating
    // Training Data Makes Language Models Better": keep ONE copy of
    // every duplicated span, rewrite the rest). Ownership rule is
    // deterministic: the LOWEST doc_id containing a token 8-gram owns
    // it; every position of that gram in a HIGHER doc is flagged and
    // the union of flagged [pos, pos+7] windows is cut from the doc.
    // Emits per doc the kept/removed token counts and md5 of the
    // REWRITTEN text (an exact near-copy collapses to kept_tokens = 0,
    // NULL hash — the planted %31 copies in the augmented corpus).
    // Scale shape: gram ownership is one partial-aggregated groupBy
    // (min doc_id per gram — never pairwise), flagged positions
    // explode to at most 8x the flagged-span count, and the rewrite is
    // a per-doc sorted collect over that doc's own tokens (arrays
    // bounded by document length, the same bound every tokenizer op
    // here lives with).
    QueryDef("text_substring_remove",
      (s, d) => {
        val aug = TextOps.docsAug(s, d)
        val toks = aug.select(col("doc_id"), split(col("text"), " ").as("w"))
        val spans = toks
          .where(size(col("w")) >= 8) // Spark sequence(1, n<1) DESCENDS
          .select(col("doc_id"),
            explode(expr("sequence(1, size(w) - 7)")).as("pos"),
            col("w"))
          .withColumn("g", md5(concat_ws(" ",
            expr("slice(w, pos, 8)")).cast(BinaryType)))
          .select("doc_id", "pos", "g")
        val owner = spans.groupBy("g").agg(min("doc_id").as("owner"))
        val flagged = spans.join(owner, "g")
          .where(col("doc_id") > col("owner"))
          .select("doc_id", "pos")
        val removedIdx = flagged
          .select(col("doc_id"), explode(expr("sequence(pos, pos + 7)")).as("idx"))
          .distinct()
        val tokIdx = toks.select(col("doc_id"),
            posexplode(col("w")).as(Seq("idx0", "tok")))
          .withColumn("idx", col("idx0") + 1).drop("idx0")
        val kept = tokIdx.join(removedIdx, Seq("doc_id", "idx"), "left_anti")
        val perDoc = kept.groupBy("doc_id").agg(
            count(lit(1)).cast(LongType).as("kept_tokens"),
            sort_array(collect_list(struct(col("idx").as("i"),
              col("tok").as("tok")))).as("ks"))
          .withColumn("cleaned_hash",
            md5(concat_ws(" ", expr("transform(ks, x -> x.tok)"))
              .cast(BinaryType)))
          .select("doc_id", "kept_tokens", "cleaned_hash")
        val dl = toks.select(col("doc_id"),
          size(col("w")).cast(LongType).as("n_tokens"))
        dl.join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"),
            coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
            (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
              .as("removed_tokens"),
            col("cleaned_hash"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${TextOps.DocsAugCte},
        |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs_aug),
        |spans AS (
        |  SELECT doc_id, i AS pos, md5(array_to_string(w[i:i+7], ' ')) AS g
        |  FROM toks, unnest(range(1, len(w) - 6)) t(i)),
        |owner AS (SELECT g, min(doc_id) AS owner FROM spans GROUP BY g),
        |flagged AS (
        |  SELECT s.doc_id, s.pos FROM spans s JOIN owner o USING (g)
        |  WHERE s.doc_id > o.owner),
        |removed AS (
        |  SELECT DISTINCT doc_id, pos + k AS idx
        |  FROM flagged, unnest(range(0, 8)) t(k)),
        |tok_idx AS (
        |  SELECT doc_id, i AS idx, w[i] AS tok
        |  FROM toks, unnest(range(1, len(w) + 1)) t(i)),
        |kept AS (
        |  SELECT t.doc_id, t.idx, t.tok
        |  FROM tok_idx t LEFT JOIN removed r
        |    ON r.doc_id = t.doc_id AND r.idx = t.idx
        |  WHERE r.idx IS NULL),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
        |    md5(string_agg(tok, ' ' ORDER BY idx)) AS cleaned_hash
        |  FROM kept GROUP BY doc_id),
        |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |       FROM docs_aug)
        |SELECT dl.doc_id, dl.n_tokens,
        |  COALESCE(a.kept_tokens, 0) AS kept_tokens,
        |  dl.n_tokens - COALESCE(a.kept_tokens, 0) AS removed_tokens,
        |  a.cleaned_hash
        |FROM dl LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // Cross-document duplicated-substring detection — the span-level
    // dedup signal (find token 8-grams appearing in >= 2 distinct
    // docs, then the fraction of each doc covered by such spans).
    // This is the distributed approximation of suffix-array substring
    // dedup: grams hash to md5 keys and the cross-doc test is one
    // partial-aggregated groupBy, so the plan is explode -> shuffle
    // on gram -> join back — never a pairwise comparison. Span
    // coverage (union of overlapping 8-token windows) is computed
    // with a per-doc lead() window: partitions are doc-sized, never
    // corpus-sized. Runs over the augmented corpus; the near-copies
    // light up as ~full-coverage, and the generator's natural phrase
    // repetition shows up as partial spans.
    QueryDef("dedup_substring_spans",
      (s, d) => {
        val aug = TextOps.docsAug(s, d)
        val toks = aug.select(col("doc_id"), split(col("text"), " ").as("w"))
        val spans = toks
          .select(col("doc_id"),
            explode(expr("sequence(1, size(w) - 7)")).as("pos"),
            col("w"))
          .withColumn("g", md5(concat_ws(" ",
            expr("slice(w, pos, 8)")).cast(BinaryType)))
          .select("doc_id", "pos", "g")
        val dupGrams = spans.groupBy("g")
          .agg(countDistinct("doc_id").as("nd"))
          .where(col("nd") >= 2).select("g")
        val wDoc = Window.partitionBy("doc_id").orderBy("pos")
        val dupPos = spans.join(dupGrams, "g")
          .withColumn("contrib", least(lit(8),
            coalesce(lead("pos", 1).over(wDoc), col("pos") + 8) - col("pos")))
        val cover = dupPos.groupBy("doc_id").agg(
          count(lit(1)).cast(LongType).as("dup_grams"),
          sum("contrib").cast(LongType).as("dup_tokens"))
        val dl = toks.select(col("doc_id"),
          size(col("w")).cast(LongType).as("n_tokens"))
        dl.join(cover, "doc_id")
          .withColumn("dup_frac", round(
            col("dup_tokens").cast(DoubleType) / col("n_tokens"), 6))
          .select("doc_id", "n_tokens", "dup_grams", "dup_tokens", "dup_frac")
          .orderBy("doc_id")
      },
      Some(s"""WITH ${TextOps.DocsAugCte},
        |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM docs_aug),
        |spans AS (
        |  SELECT doc_id, i AS pos, md5(array_to_string(w[i:i+7], ' ')) AS g
        |  FROM toks, unnest(range(1, len(w) - 6)) t(i)),
        |dup_grams AS (
        |  SELECT g FROM spans GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
        |dup_pos AS (
        |  SELECT s.doc_id, s.pos,
        |    least(8, COALESCE(lead(s.pos, 1) OVER (PARTITION BY s.doc_id ORDER BY s.pos),
        |      s.pos + 8) - s.pos) AS contrib
        |  FROM spans s JOIN dup_grams d USING (g)),
        |cover AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_grams,
        |    CAST(sum(contrib) AS BIGINT) AS dup_tokens
        |  FROM dup_pos GROUP BY doc_id),
        |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |       FROM docs_aug)
        |SELECT dl.doc_id, dl.n_tokens, c.dup_grams, c.dup_tokens,
        |  round(CAST(c.dup_tokens AS DOUBLE) / dl.n_tokens, 6) AS dup_frac
        |FROM dl JOIN cover c USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // Histogram-sketch percentiles over events.value: a fixed 1000-bin
    // histogram is the mergeable-summary answer to quantiles at scale
    // — per-partition histograms are integer vectors that sum, so the
    // corpus-wide distribution costs one narrow aggregation, and any
    // percentile is then a cumulative walk over 1000 rows. The exact
    // rank-k percentile rides along to make the approximation error
    // observable, WITHOUT a global sort: the cumulative histogram
    // already says which bin holds rank k and how many values precede
    // it, so exact rank is recovered by ranking ONLY inside the ~n/1000
    // rows of the target bins (window partitioned by bin — bins rank in
    // parallel, no single-task stage). Bin assignment is monotone in
    // value, so global rank = bin prior + bin-local rank. hi == lo
    // (constant column) degenerates to bin 0 rather than NULL bins.
    // Bin assignment arithmetic is identical IEEE in both engines.
    QueryDef("sketch_histogram_quantiles",
      (s, d) => {
        val binSql = "CAST(CASE WHEN hi = lo THEN 0 ELSE " +
          "least(999, floor((value - lo) / (hi - lo) * 1000)) END AS INT)"
        val ev = Records.events(s, d).select(col("value"))
        val stats = ev.agg(min("value").as("lo"), max("value").as("hi"),
          count(lit(1)).cast(LongType).as("n"))
        val binned = ev.crossJoin(broadcast(stats)).withColumn("b", expr(binSql))
        val hist = binned.groupBy("b").agg(count(lit(1)).cast(LongType).as("c"))
        val wCum = Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cc", sum("c").over(wCum))
        val ps = s.range(1).select(explode(expr(
          "array(CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE))")).as("p"))
        val tgt = ps.crossJoin(broadcast(stats))
          .withColumn("k", expr("CAST(ceil(p * n) AS BIGINT)"))
          .select("p", "k", "lo", "hi")
        val est = tgt.join(broadcast(cum), col("cc") >= col("k"))
          .groupBy("p", "k", "lo", "hi").agg(min("b").as("b"))
        // (p, k) -> target bin + count of values in all earlier bins
        val kb = est.select(col("p").as("pe"), col("k"), col("b").as("tb"))
          .join(broadcast(cum.select(col("b").as("tb"),
            (col("cc") - col("c")).as("prior"))), "tb")
        val wBin = Window.partitionBy("b").orderBy("value")
        val binRanked = binned
          .join(broadcast(kb.select("tb").distinct()), col("b") === col("tb"))
          .drop("tb")
          .withColumn("rn", row_number().over(wBin).cast(LongType))
        val exact = kb.join(binRanked,
            kb("tb") === binRanked("b") && col("rn") === col("k") - col("prior"))
          .select(col("pe"), col("value").as("exact_value"))
        est
          .withColumn("est_value", round(
            expr("lo + (b + 0.5) / 1000.0 * (hi - lo)"), 6))
          .join(exact, col("p") === col("pe"))
          .select(col("p"), col("est_value"), round(col("exact_value"), 6).as("exact_value"))
          .orderBy("p")
      },
      Some("""WITH stats AS (
        |  SELECT min(value) AS lo, max(value) AS hi,
        |    CAST(count(*) AS BIGINT) AS n FROM events),
        |hist AS (
        |  SELECT CAST(CASE WHEN hi = lo THEN 0 ELSE
        |      least(999, floor((value - lo) / (hi - lo) * 1000)) END AS INT) AS b,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events, stats GROUP BY 1),
        |cum AS (SELECT b, sum(c) OVER (ORDER BY b) AS cc FROM hist),
        |ps AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p),
        |tgt AS (SELECT p, CAST(ceil(p * n) AS BIGINT) AS k, lo, hi FROM ps, stats),
        |est AS (
        |  SELECT t.p, t.lo, t.hi, min(c.b) AS b
        |  FROM tgt t JOIN cum c ON c.cc >= t.k GROUP BY 1, 2, 3),
        |exact AS (
        |  SELECT t.p, r.value AS exact_value
        |  FROM tgt t JOIN (
        |    SELECT value, CAST(row_number() OVER (ORDER BY value) AS BIGINT) AS rn
        |    FROM events) r ON r.rn = t.k)
        |SELECT e.p, round(e.lo + (e.b + 0.5) / 1000.0 * (e.hi - e.lo), 6) AS est_value,
        |  round(x.exact_value, 6) AS exact_value
        |FROM est e JOIN exact x ON e.p = x.p
        |ORDER BY e.p""".stripMargin)),

    // Unigram-LM perplexity proxy — the classic cheap quality signal
    // (a doc whose token distribution diverges from the corpus LM
    // scores high): per-token surprisal -ln(cnt/total) is frozen to
    // fixed-point micros PER VOCABULARY TYPE, so each doc's total
    // surprisal is an exact BIGINT dot product of (tf, nll) — summable
    // in any order. The vocabulary table is corpus-global but tiny
    // relative to the corpus (it's a groupBy with map-side combine)
    // and broadcasts to the per-doc join; the per-doc plan is one
    // narrow aggregation. ppl = exp(mean surprisal) rides along.
    // Bigram LM perplexity with STUPID BACKOFF (Brants et al.,
    // "Large Language Models in Machine Translation", EMNLP 2007 —
    // the backoff chosen at web scale precisely because it needs no
    // normalization pass: score(w|v) = c(vw)/c(v) when the bigram
    // was seen, else 0.4 * c(w)/N). Train/score split by doc parity
    // so backoff genuinely fires: the LM trains on EVEN doc ids and
    // scores the held-out ODD ids, whose unseen bigrams take the
    // backoff path (n_backoff counts them per doc). OOV unigrams get
    // the 0.4 pseudo-count. All counts freeze to per-token NLL
    // micros, so the doc sum is an exact BIGINT both engines agree
    // on. Scale shape: the bigram and unigram tables are bounded by
    // vocabulary (hashed in production, same trick as
    // text_quality_model), built with one map-side-combined groupBy
    // each and broadcast; scoring is a narrow per-token pass that
    // partial-aggregates to one row per doc before the shuffle.
    QueryDef("text_perplexity_bigram",
      (s, d) => {
        def toks(df: DataFrame): DataFrame = df
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(w)),
                 i -> named_struct('tok', element_at(w, i),
                   'prev', IF(i = 1, CAST(NULL AS STRING), element_at(w, i - 1))))"""))
            .as("t"))
          .select(col("doc_id"), col("t.tok").as("tok"), col("t.prev").as("prev"))
        val all = docs(s, d).select(col("doc_id"), col("text"))
        val train = toks(all.where(col("doc_id") % 2 === 0))
        val heldOut = toks(all.where(col("doc_id") % 2 === 1))
        // uni and big are vocabulary-bounded model tables consumed by
        // four broadcast jobs — checkpoint the TINY tables once so
        // each broadcast doesn't re-run the training scan
        val uni = train.groupBy("tok").agg(count(lit(1)).cast(LongType).as("c"))
          .localCheckpoint()
        val total = uni.agg(sum("c").cast(LongType).as("n"))
        val big = train.where(col("prev").isNotNull)
          .groupBy("prev", "tok").agg(count(lit(1)).cast(LongType).as("cbi"))
          .localCheckpoint()
        heldOut
          .join(broadcast(big), Seq("prev", "tok"), "left")
          .join(broadcast(uni), Seq("tok"), "left")
          .join(broadcast(uni.select(col("tok").as("prev"),
            col("c").as("cprev"))), Seq("prev"), "left")
          .crossJoin(broadcast(total))
          .withColumn("backoff",
            col("prev").isNotNull && col("cbi").isNull)
          .withColumn("nll_micros", expr(
            """CAST(floor(CASE
                 WHEN prev IS NULL THEN ln(n / COALESCE(c, 0.4))
                 WHEN cbi IS NOT NULL THEN ln(CAST(cprev AS DOUBLE) / cbi)
                 ELSE ln(2.5 * n / COALESCE(c, 0.4))
               END * 1000000 + 0.5) AS BIGINT)"""))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast(LongType).as("dlen"),
            sum(when(col("backoff"), 1L).otherwise(0L))
              .cast(LongType).as("n_backoff"),
            sum("nll_micros").cast(LongType).as("tot_micros"))
          .withColumn("avg_nll", round(
            col("tot_micros").cast(DoubleType) / col("dlen") / 1000000.0, 6))
          .withColumn("ppl", round(exp(
            col("tot_micros").cast(DoubleType) / col("dlen") / 1000000.0), 6))
          .select("doc_id", "dlen", "n_backoff", "avg_nll", "ppl")
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, w[i] AS tok,
        |    CASE WHEN i = 1 THEN NULL ELSE w[i - 1] END AS prev
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |    unnest(range(1, len(w) + 1)) t(i)),
        |train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
        |held AS (SELECT * FROM toks WHERE doc_id % 2 = 1),
        |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM train GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
        |big AS (SELECT prev, tok, CAST(count(*) AS BIGINT) AS cbi
        |  FROM train WHERE prev IS NOT NULL GROUP BY 1, 2),
        |scored AS (
        |  SELECT h.doc_id,
        |    (h.prev IS NOT NULL AND b.cbi IS NULL) AS backoff,
        |    CAST(floor(CASE
        |        WHEN h.prev IS NULL THEN ln(t.n / COALESCE(u.c, 0.4))
        |        WHEN b.cbi IS NOT NULL THEN ln(CAST(p.c AS DOUBLE) / b.cbi)
        |        ELSE ln(2.5 * t.n / COALESCE(u.c, 0.4))
        |      END * 1000000 + 0.5) AS BIGINT) AS nll_micros
        |  FROM held h
        |  LEFT JOIN big b ON b.prev = h.prev AND b.tok = h.tok
        |  LEFT JOIN uni u ON u.tok = h.tok
        |  LEFT JOIN uni p ON p.tok = h.prev
        |  CROSS JOIN tot t),
        |per_doc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dlen,
        |    CAST(sum(CASE WHEN backoff THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
        |    CAST(sum(nll_micros) AS BIGINT) AS tot_micros
        |  FROM scored GROUP BY 1)
        |SELECT doc_id, dlen, n_backoff,
        |  round(CAST(tot_micros AS DOUBLE) / dlen / 1000000.0, 6) AS avg_nll,
        |  round(exp(CAST(tot_micros AS DOUBLE) / dlen / 1000000.0), 6) AS ppl
        |FROM per_doc ORDER BY doc_id""".stripMargin)),

    QueryDef("text_perplexity",
      (s, d) => {
        val toks = docs(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).cast(LongType).as("cnt"))
        val total = vocab.agg(sum("cnt").cast(LongType).as("total"))
        val nll = vocab.crossJoin(broadcast(total))
          .withColumn("nll_micros", expr(
            "CAST(floor(ln(CAST(total AS DOUBLE) / cnt) * 1000000 + 0.5) AS BIGINT)"))
          .select("tok", "nll_micros")
        toks.join(broadcast(nll), "tok")
          .groupBy("doc_id")
          .agg(count(lit(1)).cast(LongType).as("dlen"),
            sum("nll_micros").cast(LongType).as("tot_micros"))
          .withColumn("avg_nll", round(
            col("tot_micros").cast(DoubleType) / col("dlen") / 1000000.0, 6))
          .withColumn("ppl", round(exp(
            col("tot_micros").cast(DoubleType) / col("dlen") / 1000000.0), 6))
          .select("doc_id", "dlen", "avg_nll", "ppl")
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
        |nll AS (
        |  SELECT tok,
        |    CAST(floor(ln(CAST(total AS DOUBLE) / cnt) * 1000000 + 0.5) AS BIGINT)
        |      AS nll_micros
        |  FROM vocab, tot),
        |per_doc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dlen,
        |    CAST(sum(nll_micros) AS BIGINT) AS tot_micros
        |  FROM toks JOIN nll USING (tok) GROUP BY 1)
        |SELECT doc_id, dlen,
        |  round(CAST(tot_micros AS DOUBLE) / dlen / 1000000.0, 6) AS avg_nll,
        |  round(exp(CAST(tot_micros AS DOUBLE) / dlen / 1000000.0), 6) AS ppl
        |FROM per_doc ORDER BY doc_id""".stripMargin)),

    // Interpolated Kneser-Ney bigram LM (D = 0.75) on the same
    // train/held-out split — the industry-standard smoothing the
    // stupid-backoff variant above approximates. The discounted
    // bigram probability interpolates with the CONTINUATION unigram
    // P_cont(w) = |{v : c(vw) > 0}| / |bigram types| (how many
    // contexts a word completes, not how often it occurs — the
    // "Francisco" fix). All model state is exact integers (bigram
    // counts, context totals cv, fan-outs n1f, fan-ins n1b, type
    // total tt); the probability expression is written token-for-
    // token identically in both engines and freezes to fixed-point
    // micros per held token, so doc sums are order-invariant.
    // Scale shape: model tables are vocabulary-bounded and broadcast;
    // the held-out stream never shuffles except the final per-doc agg.
    QueryDef("text_perplexity_kn",
      (s, d) => {
        def toks(df: DataFrame): DataFrame = df
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(w)),
                 i -> named_struct('tok', element_at(w, i),
                   'prev', IF(i = 1, CAST(NULL AS STRING), element_at(w, i - 1))))"""))
            .as("t"))
          .select(col("doc_id"), col("t.tok").as("tok"), col("t.prev").as("prev"))
        val all = docs(s, d).select(col("doc_id"), col("text"))
        val train = toks(all.where(col("doc_id") % 2 === 0))
        val heldOut = toks(all.where(col("doc_id") % 2 === 1))
        val big = train.where(col("prev").isNotNull)
          .groupBy("prev", "tok").agg(count(lit(1)).cast(LongType).as("cbi"))
          .localCheckpoint()
        val ctx = big.groupBy("prev").agg(
          sum("cbi").cast(LongType).as("cv"),
          count(lit(1)).cast(LongType).as("n1f"))
        val cont = big.groupBy("tok").agg(count(lit(1)).cast(LongType).as("n1b"))
        val types = big.agg(count(lit(1)).cast(LongType).as("tt"))
        heldOut
          .join(broadcast(big), Seq("prev", "tok"), "left")
          .join(broadcast(ctx), Seq("prev"), "left")
          .join(broadcast(cont), Seq("tok"), "left")
          .crossJoin(broadcast(types))
          .withColumn("backoff",
            col("prev").isNotNull && col("cv").isNotNull && col("cbi").isNull)
          .withColumn("nll_micros", expr(
            """CAST(floor(CASE
                 WHEN prev IS NULL OR cv IS NULL
                   THEN ln(tt / COALESCE(n1b, 0.4e0))
                 ELSE -ln(
                   (GREATEST(COALESCE(cbi, 0) - 0.75e0, 0e0) / cv) +
                   (0.75e0 * n1f / cv) * (COALESCE(n1b, 0.4e0) / tt))
               END * 1000000 + 0.5) AS BIGINT)"""))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast(LongType).as("dlen"),
            sum(when(col("backoff"), 1L).otherwise(0L))
              .cast(LongType).as("n_backoff"),
            sum("nll_micros").cast(LongType).as("tot_micros"))
          .withColumn("avg_nll", round(
            col("tot_micros").cast(DoubleType) / col("dlen") / 1000000.0, 6))
          .withColumn("ppl", round(exp(
            col("tot_micros").cast(DoubleType) / col("dlen") / 1000000.0), 6))
          .select("doc_id", "dlen", "n_backoff", "avg_nll", "ppl")
          .orderBy("doc_id")
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, w[i] AS tok,
        |    CASE WHEN i = 1 THEN NULL ELSE w[i - 1] END AS prev
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |    unnest(range(1, len(w) + 1)) t(i)),
        |train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
        |held AS (SELECT * FROM toks WHERE doc_id % 2 = 1),
        |big AS (SELECT prev, tok, CAST(count(*) AS BIGINT) AS cbi
        |  FROM train WHERE prev IS NOT NULL GROUP BY 1, 2),
        |ctx AS (SELECT prev, CAST(sum(cbi) AS BIGINT) AS cv,
        |  CAST(count(*) AS BIGINT) AS n1f FROM big GROUP BY 1),
        |cont AS (SELECT tok, CAST(count(*) AS BIGINT) AS n1b
        |  FROM big GROUP BY 1),
        |types AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM big),
        |scored AS (
        |  SELECT h.doc_id,
        |    (h.prev IS NOT NULL AND x.cv IS NOT NULL AND b.cbi IS NULL)
        |      AS backoff,
        |    CAST(floor(CASE
        |        WHEN h.prev IS NULL OR x.cv IS NULL
        |          THEN ln(tt / COALESCE(n1b, 0.4e0))
        |        ELSE -ln(
        |          (GREATEST(COALESCE(b.cbi, 0) - 0.75e0, 0e0) / x.cv) +
        |          (0.75e0 * x.n1f / x.cv) * (COALESCE(n1b, 0.4e0) / tt))
        |      END * 1000000 + 0.5) AS BIGINT) AS nll_micros
        |  FROM held h
        |  LEFT JOIN big b ON b.prev = h.prev AND b.tok = h.tok
        |  LEFT JOIN ctx x ON x.prev = h.prev
        |  LEFT JOIN cont c ON c.tok = h.tok
        |  CROSS JOIN types),
        |per_doc AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dlen,
        |    CAST(sum(CASE WHEN backoff THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
        |    CAST(sum(nll_micros) AS BIGINT) AS tot_micros
        |  FROM scored GROUP BY 1)
        |SELECT doc_id, dlen, n_backoff,
        |  round(CAST(tot_micros AS DOUBLE) / dlen / 1000000.0, 6) AS avg_nll,
        |  round(exp(CAST(tot_micros AS DOUBLE) / dlen / 1000000.0), 6) AS ppl
        |FROM per_doc ORDER BY doc_id""".stripMargin)),

    // BM25 top-20 for a fixed 3-term keyword query (k1=1.2, b=0.75).
    // Scoring state is exact integers (tf, df, doc lengths) and the
    // per-(doc, term) contribution is frozen to fixed-point micros
    // BEFORE the per-doc sum, so the score aggregation is an exact
    // BIGINT sum in any order — the one design choice that makes a
    // ranking function hash-comparable across engines. The top-20 is
    // orderBy+limit (TakeOrderedAndProject: per-partition heaps, no
    // global sort), with the rank window running over 20 survivors.
    // Zipf-law fit over the corpus token distribution — the
    // corpus-health diagnostic (a healthy natural-language corpus has
    // slope near -1; synthetic/templated text flattens, boilerplate
    // floods steepen). Least-squares over (ln rank, ln count) of the
    // top-100 tokens: both logs freeze to fixed-point micros per
    // rank, every regression moment (sx, sy, sxy, sxx, syy) is then
    // an EXACT integer sum — the micros scale cancels in the slope,
    // and slope/intercept/r² derive from those integers through
    // expressions written character-identically in both engines.
    // Scale shape: one token-count aggregation (map-side combinable)
    // and a 100-row top-k (TakeOrderedAndProject — per-partition
    // heaps, no global sort); the regression runs on 100 rows.
    QueryDef("stats_zipf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val counts = docs(s, d)
          .select(explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).cast(LongType).as("cnt"))
        val top = counts.orderBy(col("cnt").desc, col("tok")).limit(100)
          .withColumn("rank", row_number()
            .over(Window.orderBy(col("cnt").desc, col("tok"))).cast(LongType))
        val m = top.select(
          expr("CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")
            .as("xq"),
          expr("CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)")
            .as("yq"))
          .agg(count(lit(1)).cast(LongType).as("n"),
            sum("xq").cast(LongType).as("sx"),
            sum("yq").cast(LongType).as("sy"),
            sum(expr("xq * yq")).cast(LongType).as("sxy"),
            sum(expr("xq * xq")).cast(LongType).as("sxx"),
            sum(expr("yq * yq")).cast(LongType).as("syy"))
        m.select(col("n"),
          expr("""round(CAST(n * sxy - sx * sy AS DOUBLE)
                  / CAST(n * sxx - sx * sx AS DOUBLE), 6)""").as("slope"),
          expr("""round((CAST(sy AS DOUBLE) / n
                  - (CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE))
                    * CAST(sx AS DOUBLE) / n) / 1000000.0, 6)""")
            .as("intercept_ln"),
          expr("""round(CAST(n * sxy - sx * sy AS DOUBLE)
                  * CAST(n * sxy - sx * sy AS DOUBLE)
                  / (CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE)), 6)""").as("r2"))
      },
      Some("""WITH counts AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1),
        |top AS (
        |  SELECT cnt, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT)
        |    AS rank
        |  FROM counts ORDER BY cnt DESC, tok LIMIT 100),
        |q AS (
        |  SELECT
        |    CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS xq,
        |    CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS yq
        |  FROM top),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
        |    CAST(sum(xq * yq) AS BIGINT) AS sxy,
        |    CAST(sum(xq * xq) AS BIGINT) AS sxx,
        |    CAST(sum(yq * yq) AS BIGINT) AS syy
        |  FROM q)
        |SELECT n,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
        |  round((CAST(sy AS DOUBLE) / n
        |    - (CAST(n * sxy - sx * sy AS DOUBLE)
        |       / CAST(n * sxx - sx * sx AS DOUBLE))
        |      * CAST(sx AS DOUBLE) / n) / 1000000.0, 6) AS intercept_ln,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |    * CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (CAST(n * sxx - sx * sx AS DOUBLE)
        |       * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
        |FROM m""".stripMargin)),

    QueryDef("text_bm25_topk",
      (s, d) => {
        val w = Window.orderBy(col("micros").desc, col("doc_id"))
        bm25DocMicros(s, d)
          .orderBy(col("micros").desc, col("doc_id")).limit(20)
          .withColumn("score", col("micros").cast(DoubleType) / 1000000.0)
          .withColumn("rank", row_number().over(w).cast(LongType))
          .select("doc_id", "score", "rank")
          .orderBy("rank")
      },
      Some(s"""WITH $bm25ScoredDuck
        |SELECT doc_id, CAST(micros AS DOUBLE) / 1000000.0 AS score,
        |  CAST(row_number() OVER (ORDER BY micros DESC, doc_id) AS BIGINT) AS rank
        |FROM scored QUALIFY rank <= 20 ORDER BY rank""".stripMargin)),

    // PageRank centrality — the authority-scoring pattern web-corpus
    // curation runs over the domain link graph (CommonCrawl-style
    // "keep documents from high-centrality domains"), demonstrated on
    // the supplier<->customer interaction graph (distinct trading
    // pairs via lineitem x orders, both arc directions so the walk is
    // over the undirected graph). Three join-based iterations — the
    // Pregel shape: contributions = one shuffle on dst per round, the
    // adjacency localCheckpoint'd once and reused — with ALL rank
    // arithmetic in fixed-point integers (SCALE=1e12, floor divisions)
    // so both engines agree bit-for-bit: r' = floor(0.15*SCALE/N) +
    // floor(0.85 * sum(floor(r/outdeg))). Every node has outdeg >= 1
    // (it entered via an edge), so there is no dangling-mass term and
    // no node drops out of an iteration. At 100 TB the adjacency is
    // the big table: it is shuffled ONCE onto src at checkpoint time,
    // each round's rank join co-partitions with it, and ranks (one
    // long per node) are the only state that moves between rounds.
    QueryDef("graph_pagerank",
      (s, d) => {
        val Scale = 1000000000000L
        val li = QueryDef.fanOut(s.read.parquet(s"$d/lineitem.parquet")
          .select("l_orderkey", "l_suppkey"))
        val ord = s.read.parquet(s"$d/orders.parquet")
          .select("o_orderkey", "o_custkey")
        val e = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .select((col("l_suppkey") * 2).as("s"),
            (col("o_custkey") * 2 + 1).as("c"))
          .distinct()
        // bi is localCheckpoint'd so the lineitem⋈orders→distinct edge
        // pipeline runs exactly once (deg, n, the initial ranks, and
        // the adjacency all read the materialized arcs). deg IS the
        // node table (one row per node, every node has an arc) — no
        // distinct() ever runs over the arc table. adj is
        // pre-partitioned on src and cached (cache, not checkpoint,
        // because the cached plan keeps its outputPartitioning, so the
        // three per-round joins reuse the partitioning instead of
        // re-shuffling 2|E| arcs every round — only the |V| rank rows
        // shuffle per iteration); the final ranks are checkpointed and
        // the cache is dropped before returning. The checkpointed arc
        // blocks are freed by the ContextCleaner when bi goes out of
        // scope (the repo-wide localCheckpoint contract — see
        // ccIncident); the cache needs the explicit unpersist because
        // CacheManager entries are not GC-driven.
        val bi = e.select(explode(array(
            struct(col("s").as("src"), col("c").as("dst")),
            struct(col("c").as("src"), col("s").as("dst")))).as("a"))
          .select(col("a.src").as("src"), col("a.dst").as("dst"))
          .localCheckpoint()
        val deg = bi.groupBy("src").agg(count(lit(1)).as("outdeg"))
        val adj = bi.join(deg, "src").repartition(col("src")).cache()
        val n = deg.count()
        val base = (15L * Scale) / (100L * n)
        var ranks = deg.select(col("src").as("node"))
          .withColumn("rank", lit(Scale / n))
        for (_ <- 1 to 3) {
          ranks = adj.join(ranks, col("src") === col("node"))
            .select(col("dst"), expr("rank div outdeg").as("contrib"))
            .groupBy("dst")
            .agg(sum("contrib").as("sc"))
            .select(col("dst").as("node"),
              (lit(base) + expr("(85 * sc) div 100")).as("rank"))
        }
        val out = ranks.select(
            when(col("node") % 2 === 0, "supplier").otherwise("customer")
              .as("node_type"),
            expr("node div 2").cast(LongType).as("key"),
            col("rank").cast(LongType).as("rank"))
          .localCheckpoint() // |V| rows; runs the 3 rounds against the cache
        adj.unpersist()
        out.orderBy("node_type", "key")
      },
      Some("""WITH e AS (
        |  SELECT DISTINCT l_suppkey * 2 AS s, o_custkey * 2 + 1 AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |bi AS (SELECT s AS src, c AS dst FROM e
        |       UNION ALL SELECT c, s FROM e),
        |deg AS (SELECT src, count(*) AS outdeg FROM bi GROUP BY src),
        |adj AS (SELECT bi.src, bi.dst, deg.outdeg
        |        FROM bi JOIN deg ON deg.src = bi.src),
        |nn AS (SELECT count(*) AS n FROM deg),
        |r0 AS (SELECT src AS node, 1000000000000 // (SELECT n FROM nn) AS rank
        |       FROM deg),
        |it1 AS (SELECT a.dst AS node,
        |          (15 * 1000000000000) // (100 * (SELECT n FROM nn))
        |            + (85 * sum(r.rank // a.outdeg)) // 100 AS rank
        |        FROM adj a JOIN r0 r ON r.node = a.src GROUP BY a.dst),
        |it2 AS (SELECT a.dst AS node,
        |          (15 * 1000000000000) // (100 * (SELECT n FROM nn))
        |            + (85 * sum(r.rank // a.outdeg)) // 100 AS rank
        |        FROM adj a JOIN it1 r ON r.node = a.src GROUP BY a.dst),
        |it3 AS (SELECT a.dst AS node,
        |          (15 * 1000000000000) // (100 * (SELECT n FROM nn))
        |            + (85 * sum(r.rank // a.outdeg)) // 100 AS rank
        |        FROM adj a JOIN it2 r ON r.node = a.src GROUP BY a.dst)
        |SELECT CASE WHEN node % 2 = 0 THEN 'supplier' ELSE 'customer' END
        |         AS node_type,
        |  CAST(node // 2 AS BIGINT) AS key, CAST(rank AS BIGINT) AS rank
        |FROM it3 ORDER BY node_type, key""".stripMargin))
  )
}
