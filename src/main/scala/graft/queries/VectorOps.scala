package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (ARRAY<FLOAT>, 64-d):
  *
  * - brute-force cosine top-k (the correctness baseline),
  * - IVF-style partitioned search (the 100 TB scale path: assign every
  *   vector to its nearest centroid, probe only the query's cell),
  * - near-duplicate pairs by cosine threshold with label blocking
  *   (the embedding-space dedup used by training-data pipelines).
  *
  * Cross-engine float parity: dot products are computed as sequential
  * left-folds in DOUBLE on both engines (Spark `aggregate`, DuckDB
  * `list_reduce`) — same order, same rounding — and scores are rounded
  * to 6 decimals before compare/threshold.
  */
object VectorOps {

  private def embRaw(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/embeddings.parquet")

  private def emb(s: SparkSession, d: String): DataFrame =
    QueryDef.fanOut(embRaw(s, d))

  /** Sequential-fold cosine between two ARRAY<FLOAT> columns (double)
    * — the custom codegen'd Catalyst expression
    * (graft.functions.CosineSimilarityExpr): one fused primitive loop
    * per pair instead of the interpreted aggregate(zip_with(...))
    * higher-order chain, with bit-identical fold order so the DuckDB
    * oracle's 6-decimal-rounded scores still hash-match.
    */
  private def cosine(a: String, b: String): Column =
    graft.functions.GraftFunctions.cosine_sim(col(a), col(b))

  /** DuckDB equivalent of cosine(a, b) — shared with CurationOps so
    * the fold-order-sensitive SQL exists exactly once. */
  private[queries] def duckCosine(a: String, b: String): String =
    s"""(list_reduce(list_transform(list_zip($a, $b),
          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)
        / (sqrt(list_reduce(list_transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
             (acc, v) -> acc + v))
         * sqrt(list_reduce(list_transform($b, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
             (acc, v) -> acc + v))))"""

  /** Random-hyperplane LSH for near-dup blocking: `NPlanes` fixed ±1
    * hyperplanes whose components derive from md5("plane-p:j") —
    * computed once on the driver and inlined as literals in BOTH
    * engines, so the blocking is exactly reproducible. A vector's
    * signature is the `NPlanes`-bit pattern of dot-product signs;
    * near-identical vectors collide on all bits. Dots are sequential
    * DOUBLE folds (same order both engines → identical signs).
    */
  private val NPlanes = 8
  val EmbDim = 64
  private def planeSign(p: Int, j: Int): Int = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane-$p:$j".getBytes("UTF-8"))
    if ((h(0) & 0x80) == 0) 1 else -1
  }
  private def planeVals(p: Int): Seq[String] =
    (0 until EmbDim).map(j => if (planeSign(p, j) > 0) "1.0" else "-1.0")

  /** NPlanes-bit signature of `v` as a Spark SQL expression.
    * private[queries]: dedup_semantic_kmeans reuses the SAME planes to
    * sub-bucket oversized k-means cells, so the two blocking families
    * stay directly comparable. */
  private[queries] def hyperplaneSigSpark(v: String): String =
    (0 until NPlanes).map { p =>
      val plane = planeVals(p).mkString("array(", ",", ")")
      s"""(CASE WHEN aggregate(zip_with($v, $plane,
            (x, y) -> CAST(x AS DOUBLE) * y),
            CAST(0 AS DOUBLE), (acc, w) -> acc + w) >= 0
          THEN ${1 << p} ELSE 0 END)"""
    }.mkString("(", " + ", ")")

  /** Identical signature in DuckDB. */
  private[queries] def hyperplaneSigDuck(v: String): String =
    (0 until NPlanes).map { p =>
      val plane = planeVals(p).mkString("[", ",", "]")
      s"""(CASE WHEN list_reduce(list_transform(list_zip($v, $plane),
            x -> CAST(x[1] AS DOUBLE) * x[2]), (acc, w) -> acc + w) >= 0
          THEN ${1 << p} ELSE 0 END)"""
    }.mkString("(", " + ", ")")

  /** Binary quantization signature: 128 sign-random-projection planes
    * (salted independently of the 8 blocking planes above), packed as
    * EIGHT 16-bit words. Word w covers planes 16w..16w+15. Spark
    * computes each word with the codegen'd
    * graft.functions.BinarySigExpr (one fused primitive loop, plane
    * signs baked in as 64-bit masks); DuckDB recomputes the same
    * sequential-DOUBLE folds from ±1 literals below — both sides
    * derive signs from BinarySigExpr.planePositive, so they agree on
    * every bit.
    */
  // shared with the codegen'd expression so the DuckDB ±1 literals
  // can never drift from the masks baked into the generated code
  private def bplaneVals(p: Int): Seq[String] =
    (0 until EmbDim).map(j =>
      if (graft.functions.BinarySigExpr.planePositive(p, j)) "1.0" else "-1.0")

  private def binarySigDuck(v: String, word: Int): String =
    (0 until 16).map { b =>
      val plane = bplaneVals(16 * word + b).mkString("[", ",", "]")
      s"""(CASE WHEN list_reduce(list_transform(list_zip($v, $plane),
            x -> CAST(x[1] AS DOUBLE) * x[2]), (acc, w) -> acc + w) >= 0
          THEN ${1 << b} ELSE 0 END)"""
    }.mkString("(", " + ", ")")

  /** PQ encode + reconstruct: codebook = the first 16 corpus vectors;
    * 8 subspaces of 8 dims; each subvector maps to its nearest
    * codebook entry by sequential-double-fold squared L2 (code-id
    * tiebreak); v̂ = concat of chosen codebook subvectors. Shared by
    * ann_pq_topk and ann_ivfpq_topk so the two quantizers can never
    * drift. Returns (vec_id, vhat).
    */
  private def pqRecon(all: DataFrame, cb: DataFrame): DataFrame = {
    val dists = all.crossJoin(broadcast(cb))
      .withColumn("m", explode(sequence(lit(0), lit(7))))
      .withColumn("dist", expr(
        """aggregate(sequence(8*m+1, 8*m+8), CAST(0 AS DOUBLE),
           (acc, j) -> acc +
             (CAST(element_at(embedding, j) AS DOUBLE)
               - CAST(element_at(cv, j) AS DOUBLE))
           * (CAST(element_at(embedding, j) AS DOUBLE)
               - CAST(element_at(cv, j) AS DOUBLE)))"""))
    // argmin as a hash aggregate (min of struct = the window's
    // (dist asc, code asc) pick — code is unique per group), so the
    // 16x candidate fan-out partial-combines map-side instead of
    // reaching an exchange+sort (guide §2.3)
    val codes = dists
      .groupBy("vec_id", "m")
      .agg(min(struct(col("dist"), col("code"))).as("b"))
      .select(col("vec_id"), col("m"), col("b.code").as("code"))
    codes.join(broadcast(cb), "code")
      .withColumn("sub", expr("slice(cv, 8*m+1, 8)"))
      .groupBy("vec_id")
      .agg(expr(
        """flatten(transform(array_sort(collect_list(struct(m, sub))),
           x -> x.sub))""").as("vhat"))
  }

  /** DuckDB mirror of pqRecon, ending in `recon(vec_id, vhat)`.
    * Expects an `embeddings` table in scope. */
  private def pqReconCtesDuck: String =
    s"""cb AS (
       |  SELECT CAST(vec_id AS INT) AS code, embedding AS cv
       |  FROM embeddings WHERE vec_id < 16),
       |dists AS (
       |  SELECT e.vec_id, c.code, m.m,
       |    list_reduce(list_transform(range(8*m.m+1, 8*m.m+9),
       |      j -> (CAST(e.embedding[j] AS DOUBLE) - CAST(c.cv[j] AS DOUBLE))
       |         * (CAST(e.embedding[j] AS DOUBLE) - CAST(c.cv[j] AS DOUBLE))),
       |      (a, b) -> a + b) AS dist
       |  FROM embeddings e, cb c, (SELECT unnest(range(0, 8)) AS m) m),
       |codes AS (
       |  SELECT vec_id, m, code FROM dists
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, m
       |    ORDER BY dist ASC, code ASC) = 1),
       |recon AS (
       |  SELECT d.vec_id,
       |    flatten(list(c.cv[8*d.m+1 : 8*d.m+8] ORDER BY d.m)) AS vhat
       |  FROM codes d JOIN cb c ON d.code = c.code
       |  GROUP BY d.vec_id)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // Brute-force cosine top-10 for 5 query vectors. The small query
    // side is broadcast so the big side streams without a shuffle.
    QueryDef("ann_bruteforce_topk",
      (s, d) => {
        // raw reader, NOT the fanned one: this is a narrow
        // broadcast-cross-join + window pass — the fan-out exchange
        // cost more than the cosine work it spread (r21 driver
        // artifacts: 0.55 -> 0.65/0.81 s; same class as the
        // dedup_bloom revert)
        val all = embRaw(s, d).select(col("vec_id").as("n_id"), col("embedding").as("ve"))
        val q = embRaw(s, d).where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"))
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("n_id"))
        all.crossJoin(broadcast(q))
          .where(col("n_id") =!= col("q_id"))
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .withColumn("rank", row_number().over(w).cast(LongType))
          .where(col("rank") <= 10)
          .select("q_id", "n_id", "score", "rank")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH scored AS (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    round(${duckCosine("q.embedding", "n.embedding")}, 6) AS score
        |  FROM embeddings q, embeddings n
        |  WHERE q.vec_id < 5 AND n.vec_id <> q.vec_id)
        |SELECT q_id, n_id, score,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS BIGINT) AS rank
        |FROM scored QUALIFY rank <= 10 ORDER BY q_id, rank""".stripMargin)),

    // IVF-style ANN: centroids = vec_id % 100 == 0; every vector joins
    // its nearest centroid (argmin by cosine distance, centroid-id
    // tiebreak); queries probe ONLY their own cell (nprobe=1).
    QueryDef("ann_ivf_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val all = emb(s, d).select(col("vec_id"), col("embedding"))
        val cents = all.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("vc"))
        val wAssign = Window.partitionBy("vec_id")
          .orderBy(col("csim").desc, col("c_id"))
        val assigned = all.crossJoin(broadcast(cents))
          .withColumn("csim", round(cosine("embedding", "vc"), 6))
          .withColumn("arn", row_number().over(wAssign))
          .where(col("arn") === 1)
          .select(col("vec_id"), col("embedding"), col("c_id").as("cell"))
        val q = assigned.where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"), col("cell"))
        val wRank = Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("n_id"))
        assigned.select(col("vec_id").as("n_id"), col("embedding").as("ve"), col("cell"))
          .join(broadcast(q), "cell")
          .where(col("n_id") =!= col("q_id"))
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .withColumn("rank", row_number().over(wRank).cast(LongType))
          .where(col("rank") <= 5)
          .select("q_id", "n_id", "cell", "score", "rank")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH cents AS (
        |  SELECT vec_id AS c_id, embedding AS vc FROM embeddings WHERE vec_id % 100 = 0),
        |assigned AS (
        |  SELECT vec_id, embedding, c_id AS cell FROM (
        |    SELECT e.vec_id, e.embedding, c.c_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        round(${duckCosine("e.embedding", "c.vc")}, 6) DESC, c.c_id) AS arn
        |    FROM embeddings e, cents c)
        |  WHERE arn = 1),
        |q AS (SELECT vec_id AS q_id, embedding AS vq, cell FROM assigned WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.q_id, a.vec_id AS n_id, a.cell,
        |    round(${duckCosine("q.vq", "a.embedding")}, 6) AS score
        |  FROM assigned a JOIN q ON a.cell = q.cell
        |  WHERE a.vec_id <> q.q_id)
        |SELECT q_id, n_id, cell, score,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS BIGINT) AS rank
        |FROM scored QUALIFY rank <= 5 ORDER BY q_id, rank""".stripMargin)),

    // Multi-probe IVF — the production answer to own-cell IVF's known
    // recall cliff (a query near a Voronoi boundary has most true
    // neighbors in the SECOND-nearest cell): each query probes its
    // nearest P=2 centroid cells (deterministic csim-desc/c_id order),
    // ranks top-10 within the probed union, and emits recall@10
    // against the corpus-wide brute-force top-10 in the same result.
    // Probing a superset of the own cell can only ADD brute-force
    // hits (any candidate outscoring a global-top-10 member is itself
    // global-top-10), so recall10 here is structurally >= own-cell
    // recall. The brute-force side is demo instrumentation — at
    // corpus scale only the probed-cells join runs, and its cost is
    // bounded by P/num_cells of the corpus per query.
    QueryDef("ann_ivf_multiprobe",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val all = emb(s, d).select(col("vec_id"), col("embedding"))
        val cents = all.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("vc"))
        val wAssign = Window.partitionBy("vec_id")
          .orderBy(col("csim").desc, col("c_id"))
        val ranked = all.crossJoin(broadcast(cents))
          .withColumn("csim", round(cosine("embedding", "vc"), 6))
          .withColumn("arn", row_number().over(wAssign))
        val assigned = ranked.where(col("arn") === 1)
          .select(col("vec_id").as("n_id"), col("embedding").as("ve"),
            col("c_id").as("cell"))
        // nprobe=2: each query keeps its two nearest centroids
        val probes = ranked.where(col("vec_id") < 5 && col("arn") <= 2)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"),
            col("c_id").as("cell"))
        val wRank = Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("n_id"))
        val multi = assigned.join(broadcast(probes), "cell")
          .where(col("n_id") =!= col("q_id"))
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .withColumn("rank", row_number().over(wRank).cast(LongType))
          .where(col("rank") <= 10)
          .select("q_id", "n_id", "score", "rank")
        // corpus-wide brute-force top-10: the recall denominator
        val q = emb(s, d).where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"))
        val brute = all.select(col("vec_id").as("n_id"), col("embedding").as("ve"))
          .crossJoin(broadcast(q))
          .where(col("n_id") =!= col("q_id"))
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .withColumn("brank", row_number().over(wRank))
          .where(col("brank") <= 10)
          .select(col("q_id"), col("n_id"))
        val recall = multi.join(brute, Seq("q_id", "n_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as("hits"))
        multi.join(broadcast(recall), Seq("q_id"), "left")
          // left + coalesce: a zero-recall query has no `recall` group;
          // an inner join would silently drop its top-10 rows (ADVICE r8)
          .withColumn("recall10",
            coalesce(col("hits").cast(DoubleType), lit(0.0)) / 10.0)
          .select("q_id", "n_id", "score", "rank", "recall10")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH cents AS (
        |  SELECT vec_id AS c_id, embedding AS vc FROM embeddings WHERE vec_id % 100 = 0),
        |ranked AS (
        |  SELECT e.vec_id, e.embedding, c.c_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      round(${duckCosine("e.embedding", "c.vc")}, 6) DESC, c.c_id) AS arn
        |  FROM embeddings e, cents c),
        |assigned AS (
        |  SELECT vec_id AS n_id, embedding AS ve, c_id AS cell
        |  FROM ranked WHERE arn = 1),
        |probes AS (
        |  SELECT vec_id AS q_id, embedding AS vq, c_id AS cell
        |  FROM ranked WHERE vec_id < 5 AND arn <= 2),
        |multi AS (
        |  SELECT q_id, n_id, score,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, n_id) AS BIGINT) AS rank
        |  FROM (
        |    SELECT p.q_id, a.n_id,
        |      round(${duckCosine("p.vq", "a.ve")}, 6) AS score
        |    FROM assigned a JOIN probes p ON a.cell = p.cell
        |    WHERE a.n_id <> p.q_id)
        |  QUALIFY rank <= 10),
        |brute AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(${duckCosine("q.embedding", "n.embedding")}, 6) DESC,
        |        n.vec_id) AS brank
        |    FROM embeddings q, embeddings n
        |    WHERE q.vec_id < 5 AND n.vec_id <> q.vec_id)
        |  WHERE brank <= 10),
        |recall AS (
        |  SELECT m.q_id, count(*) AS hits FROM multi m
        |  JOIN brute b ON m.q_id = b.q_id AND m.n_id = b.n_id
        |  GROUP BY m.q_id)
        |SELECT m.q_id, m.n_id, m.score, m.rank,
        |  CAST(COALESCE(r.hits, 0) AS DOUBLE) / 10.0 AS recall10
        |FROM multi m LEFT JOIN recall r ON m.q_id = r.q_id
        |ORDER BY m.q_id, m.rank""".stripMargin)),

    // IVF with LEARNED centroids — the production coarse quantizer:
    // ann_ivf_topk/multiprobe pick centroids by vec_id % 100 (cheap
    // but arbitrary Voronoi geometry); here the cells are the k-means
    // centroids cluster_kmeans already learns (k=8, 2 Lloyd rounds,
    // shared fixed-point quantization so the oracle replays the
    // training bit-for-bit). The corpus embeddings are unit-norm, so
    // the L2 cell geometry matches the cosine ranking metric. Each
    // query probes its nprobe=2 nearest learned cells and recall@10
    // vs the corpus-wide brute-force top-10 rides along in-query —
    // AnnSpec pins that learned cells beat the deterministic picks on
    // the same probe budget (0.88 vs 0.70 mean recall at sf0.001).
    // Scale: training cost is cluster_kmeans's (broadcast assignment,
    // k x 64-cell map-side-combined update); per-query probe cost is
    // bounded by nprobe/k of the corpus, same as ann_ivf_multiprobe.
    QueryDef("ann_ivf_kmeans",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val all = emb(s, d).select(col("vec_id"), col("embedding"))
        // the Lloyd chain feeds FOUR consumers (assigned, probes, and
        // each again through multi's two consumers) — materialize the
        // narrow (vec_id, cluster, arn) projection once instead of
        // re-running training per consumer; the heavy qv/dist payload
        // is dropped before the checkpoint so the stored blocks stay
        // 3 ints per vector x k
        val cellRanks = AnalyticsOps.kmeansCellRanks(all, AnalyticsOps.KmK, 2)
          .select("vec_id", "cluster", "arn")
          .localCheckpoint()
        val assigned = cellRanks.where(col("arn") === 1)
          .join(all, "vec_id")
          .select(col("vec_id").as("n_id"), col("embedding").as("ve"),
            col("cluster").as("cell"))
        val probes = cellRanks.where(col("vec_id") < 5 && col("arn") <= 2)
          .join(all.where(col("vec_id") < 5), "vec_id")
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"),
            col("cluster").as("cell"))
        val wRank = Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("n_id"))
        val multi = assigned.join(broadcast(probes), "cell")
          .where(col("n_id") =!= col("q_id"))
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .withColumn("rank", row_number().over(wRank).cast(LongType))
          .where(col("rank") <= 10)
          .select("q_id", "n_id", "score", "rank")
          // <= 50 rows, consumed by recall AND the final join
          .localCheckpoint()
        val q = emb(s, d).where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"))
        val brute = all.select(col("vec_id").as("n_id"), col("embedding").as("ve"))
          .crossJoin(broadcast(q))
          .where(col("n_id") =!= col("q_id"))
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .withColumn("brank", row_number().over(wRank))
          .where(col("brank") <= 10)
          .select(col("q_id"), col("n_id"))
        val recall = multi.join(brute, Seq("q_id", "n_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as("hits"))
        multi.join(broadcast(recall), Seq("q_id"), "left")
          // left + coalesce: a zero-recall query has no `recall` group;
          // an inner join would silently drop its top-10 rows (ADVICE r8)
          .withColumn("recall10",
            coalesce(col("hits").cast(DoubleType), lit(0.0)) / 10.0)
          .select("q_id", "n_id", "score", "rank", "recall10")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH ${AnalyticsOps.kmeansCellRanksDuck},
        |assigned AS (
        |  SELECT r.vec_id AS n_id, e.embedding AS ve, r.cluster AS cell
        |  FROM ranked_cells r JOIN embeddings e ON e.vec_id = r.vec_id
        |  WHERE r.arn = 1),
        |probes AS (
        |  SELECT r.vec_id AS q_id, e.embedding AS vq, r.cluster AS cell
        |  FROM ranked_cells r JOIN embeddings e ON e.vec_id = r.vec_id
        |  WHERE r.vec_id < 5 AND r.arn <= 2),
        |multi AS (
        |  SELECT q_id, n_id, score,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, n_id) AS BIGINT) AS rank
        |  FROM (
        |    SELECT p.q_id, a.n_id,
        |      round(${duckCosine("p.vq", "a.ve")}, 6) AS score
        |    FROM assigned a JOIN probes p ON a.cell = p.cell
        |    WHERE a.n_id <> p.q_id)
        |  QUALIFY rank <= 10),
        |brute AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(${duckCosine("q.embedding", "n.embedding")}, 6) DESC,
        |        n.vec_id) AS brank
        |    FROM embeddings q, embeddings n
        |    WHERE q.vec_id < 5 AND n.vec_id <> q.vec_id)
        |  WHERE brank <= 10),
        |recall AS (
        |  SELECT m.q_id, count(*) AS hits FROM multi m
        |  JOIN brute b ON m.q_id = b.q_id AND m.n_id = b.n_id
        |  GROUP BY m.q_id)
        |SELECT m.q_id, m.n_id, m.score, m.rank,
        |  CAST(COALESCE(r.hits, 0) AS DOUBLE) / 10.0 AS recall10
        |FROM multi m LEFT JOIN recall r ON m.q_id = r.q_id
        |ORDER BY m.q_id, m.rank""".stripMargin)),

    // Product-quantized ANN — the memory-compression end of the ANN
    // ladder (brute -> IVF -> multiprobe -> int8 -> PQ): 64 dims split
    // into 8 subspaces of 8; each subvector is encoded as the id of
    // its nearest codebook entry (16 entries per subspace, deterministic
    // codebook = the first 16 corpus vectors), so a 256-byte float
    // vector becomes 8 one-byte codes — 32x less memory, which is the
    // whole point at 100 TB: the codes for a billion vectors fit in
    // executor memory where the floats never would. Scoring uses the
    // quantized RECONSTRUCTION v̂ (concat of chosen codebook
    // subvectors) through the same sequential-fold cosine as every
    // other vector query — bit-identical in DuckDB — with the exact
    // float score alongside, so the quantization error is directly
    // observable per result row. Encoding here is a window argmin
    // over (vector x code x subspace) rows for oracle parity;
    // production encodes at ingest with a fused kernel and stores
    // codes as a column.
    QueryDef("ann_pq_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val all = emb(s, d).select(col("vec_id"), col("embedding"))
        val cb = all.where(col("vec_id") < 16)
          .select(col("vec_id").cast(IntegerType).as("code"),
            col("embedding").as("cv"))
        val recon = pqRecon(all, cb)
        val q = emb(s, d).where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"))
        val wRank = Window.partitionBy("q_id")
          .orderBy(col("pq_score").desc, col("n_id"))
        val top = recon.select(col("vec_id").as("n_id"), col("vhat"))
          .crossJoin(broadcast(q))
          .where(col("n_id") =!= col("q_id"))
          .withColumn("pq_score", round(cosine("vq", "vhat"), 6))
          .withColumn("rank", row_number().over(wRank).cast(LongType))
          .where(col("rank") <= 10)
        // exact float score only for the 50 surviving rows
        top.join(emb(s, d).select(col("vec_id").as("n_id"),
            col("embedding").as("ve")), "n_id")
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .select("q_id", "n_id", "pq_score", "score", "rank")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $pqReconCtesDuck,
        |top AS (
        |  SELECT q_id, n_id, pq_score,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY pq_score DESC, n_id) AS BIGINT) AS rank
        |  FROM (
        |    SELECT q.vec_id AS q_id, r.vec_id AS n_id,
        |      round(${duckCosine("q.embedding", "r.vhat")}, 6) AS pq_score
        |    FROM embeddings q, recon r
        |    WHERE q.vec_id < 5 AND r.vec_id <> q.vec_id)
        |  QUALIFY rank <= 10)
        |SELECT t.q_id, t.n_id, t.pq_score,
        |  round(${duckCosine("q.embedding", "n.embedding")}, 6) AS score,
        |  t.rank
        |FROM top t
        |JOIN embeddings q ON q.vec_id = t.q_id
        |JOIN embeddings n ON n.vec_id = t.n_id
        |ORDER BY t.q_id, t.rank""".stripMargin)),

    // PQ with LEARNED per-subspace codebooks — the production product
    // quantizer (what Faiss trains): ann_pq_topk's codebook is the
    // first 16 corpus vectors (deterministic but arbitrary geometry);
    // here each of the 8 subspaces learns its own 16 centroids by
    // k-means over the corpus SUBVECTORS (init = subvectors of those
    // same 16 vectors, 2 Lloyd rounds, the cluster_kmeans machinery:
    // fixed-point x1000 coordinates, exact BIGINT sums/counts, so
    // DuckDB replays training bit-for-bit). Same bytes/vector as the
    // fixed codebook (8 one-byte codes); per-subspace training is
    // what reduces reconstruction error — AnalyticsOpsSpec pins that
    // recall@10 (in-query, vs corpus-wide brute force) does not lose
    // to the fixed codebook at equal budget. Scoring keeps vhat in
    // quantized units (cosine is scale-invariant and BOTH engines
    // fold identically, so the shared 1000x factor cancels the same
    // way bit-for-bit).
    // Scale: all 8 subspaces train in ONE flow — assignment is a
    // broadcast join against 128 (m, code) centroids, the update is a
    // map-side-combined aggregate to <= 8*16*8 rows; encode is one
    // more broadcast pass. Linear in the corpus, like cluster_kmeans.
    QueryDef("ann_pq_learned",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        def cosDbl(a: String, b: String) = expr(
          s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                CAST(0 AS DOUBLE), (acc, v) -> acc + v)
             / (sqrt(aggregate(transform($a, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
                 CAST(0 AS DOUBLE), (acc, v) -> acc + v))
              * sqrt(aggregate(transform($b, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
                 CAST(0 AS DOUBLE), (acc, v) -> acc + v)))""")
        val all = emb(s, d).select(col("vec_id"), col("embedding"))
        // (vec_id, m, sv): quantized 8-dim subvector per subspace
        // three consumers (two Lloyd assigns + the final encode) —
        // materialize the quantized subvector table once
        val sub = all
          .select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("m"),
            col("embedding"))
          .withColumn("sv", expr(
            """transform(slice(embedding, 8*m+1, 8),
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"""))
          .select("vec_id", "m", "sv")
          .localCheckpoint()
        val dist8 = expr(
          """aggregate(sequence(1, 8), CAST(0 AS DOUBLE), (acc, j) ->
             acc + (CAST(element_at(sv, j) AS DOUBLE)
                     - CAST(element_at(sums, j) AS DOUBLE) / CAST(cnt AS DOUBLE))
                 * (CAST(element_at(sv, j) AS DOUBLE)
                     - CAST(element_at(sums, j) AS DOUBLE) / CAST(cnt AS DOUBLE)))""")
        // argmin as a HASH AGGREGATE (min of struct = lexicographic
        // (dist, code) — exactly the window's (dist asc, code asc)
        // pick, since code is unique per group), not a window: the
        // aggregate partial-combines map-side, so the 16x candidate
        // fan-out never reaches an exchange+sort. The oracle keeps the
        // QUALIFY row_number form — same argmin, results identical.
        def assign(v: DataFrame, cents: DataFrame): DataFrame =
          v.join(broadcast(cents), "m")
            .withColumn("dist", dist8)
            .groupBy("vec_id", "m")
            .agg(min(struct(col("dist"), col("code"), col("sv"))).as("best"))
            .select(col("vec_id"), col("m"),
              col("best.sv").as("sv"), col("best.code").as("code"))
        // one map-side-combined aggregate straight to the <= 128
        // codebook rows (8 integer sums per (m, code); the former
        // explode + two-level aggregate paid a second exchange)
        def update(a: DataFrame): DataFrame =
          a.groupBy("m", "code")
            .agg(array((1 to 8).map(j =>
                sum(expr(s"element_at(sv, $j)"))): _*).as("sums"),
              count(lit(1)).cast(LongType).as("cnt"))
        val cents0 = sub.where(col("vec_id") < 16)
          .select(col("m"), col("vec_id").cast(IntegerType).as("code"),
            col("sv").as("sums"), lit(1L).as("cnt"))
        // Trains on the FULL corpus: a deterministic quarter-sample
        // (the classic Faiss training move) was A/B-measured and
        // REJECTED — at this corpus size it thins each subspace's
        // codebook geometry enough to drop recall@10 below the fixed
        // codebook (0.32 vs 0.36), and the training fan-out it saves
        // is a broadcast hash-agg that scales linearly anyway. At
        // billions of vectors the sample becomes representative and
        // the trade flips; the cut-over belongs in config, not here.
        // each round's <= 128-row codebook is localCheckpoint'd so the
        // next round's broadcast (and the encode below) reads stored
        // rows instead of replaying the whole training chain
        val cents = update(assign(sub,
          update(assign(sub, cents0)).localCheckpoint())).localCheckpoint()
        // encode against the learned codebooks; vhat = concat of
        // centroid means in quantized units (same hash-agg argmin)
        val centsH = cents.withColumn("subhat",
          expr("transform(sums, s -> CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE))"))
        val recon = sub.join(broadcast(centsH), "m")
          .withColumn("dist", dist8)
          .groupBy("vec_id", "m")
          .agg(min(struct(col("dist"), col("code"), col("subhat"))).as("best"))
          .select(col("vec_id"), col("m"), col("best.subhat").as("subhat"))
          .groupBy("vec_id")
          .agg(expr(
            """flatten(transform(array_sort(collect_list(struct(m, subhat))),
               x -> x.subhat))""").as("vhat"))
        val q = emb(s, d).where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"))
        val wRank = Window.partitionBy("q_id")
          .orderBy(col("pq_score").desc, col("n_id"))
        val top = recon.select(col("vec_id").as("n_id"), col("vhat"))
          .crossJoin(broadcast(q))
          .where(col("n_id") =!= col("q_id"))
          .withColumn("pq_score", round(cosDbl("vq", "vhat"), 6))
          .withColumn("rank", row_number().over(wRank).cast(LongType))
          .where(col("rank") <= 10)
          .select("q_id", "n_id", "vq", "pq_score", "rank")
          .localCheckpoint() // <= 50 rows; feeds recall + final join
        val brute = all.select(col("vec_id").as("n_id"), col("embedding").as("ve"))
          .crossJoin(broadcast(q))
          .where(col("n_id") =!= col("q_id"))
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .withColumn("brank", row_number().over(
            Window.partitionBy("q_id").orderBy(col("score").desc, col("n_id"))))
          .where(col("brank") <= 10)
          .select(col("q_id"), col("n_id"))
        val recall = top.join(brute, Seq("q_id", "n_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as("hits"))
        top
          .join(emb(s, d).select(col("vec_id").as("n_id"),
            col("embedding").as("ve")), "n_id")
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .join(broadcast(recall), Seq("q_id"), "left")
          .withColumn("recall10",
            coalesce(col("hits").cast(DoubleType), lit(0.0)) / 10.0)
          .select("q_id", "n_id", "pq_score", "score", "rank", "recall10")
          .orderBy("q_id", "rank")
      },
      Some {
        val dst =
          """list_reduce(list_transform(range(1, 9),
             j -> (CAST(s.sv[j] AS DOUBLE) - CAST(c.sums[j] AS DOUBLE) / CAST(c.cnt AS DOUBLE))
                * (CAST(s.sv[j] AS DOUBLE) - CAST(c.sums[j] AS DOUBLE) / CAST(c.cnt AS DOUBLE))),
             (a, b) -> a + b)"""
        def assignDuck(cents: String, out: String) =
          s"""$out AS (
             |  SELECT vec_id, m, sv, code FROM (
             |    SELECT s.vec_id, s.m, s.sv, c.code,
             |      row_number() OVER (PARTITION BY s.vec_id, s.m
             |        ORDER BY $dst ASC, c.code) AS rn
             |    FROM sub s JOIN $cents c ON s.m = c.m)
             |  WHERE rn = 1)""".stripMargin
        def updateDuck(a: String, out: String) =
          s"""$out AS (
             |  SELECT m, code, list(sj ORDER BY j) AS sums, max(nv) AS cnt FROM (
             |    SELECT m, code, j.j AS j, CAST(sum(sv[j.j]) AS BIGINT) AS sj,
             |      CAST(count(*) AS BIGINT) AS nv
             |    FROM $a, (SELECT unnest(range(1, 9)) AS j) j
             |    GROUP BY m, code, j.j)
             |  GROUP BY m, code)""".stripMargin
        s"""WITH sub AS (
           |  SELECT vec_id, m.m AS m,
           |    list_transform(embedding[8*m.m+1 : 8*m.m+8],
           |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS sv
           |  FROM embeddings, (SELECT unnest(range(0, 8)) AS m) m),
           |cents0 AS (
           |  SELECT m, CAST(vec_id AS INT) AS code, sv AS sums, CAST(1 AS BIGINT) AS cnt
           |  FROM sub WHERE vec_id < 16),
           |${assignDuck("cents0", "a1")},
           |${updateDuck("a1", "u1")},
           |${assignDuck("u1", "a2")},
           |${updateDuck("a2", "u2")},
           |codes AS (
           |  SELECT vec_id, m, code FROM (
           |    SELECT s.vec_id, s.m, c.code,
           |      row_number() OVER (PARTITION BY s.vec_id, s.m
           |        ORDER BY $dst ASC, c.code) AS rn
           |    FROM sub s JOIN u2 c ON s.m = c.m)
           |  WHERE rn = 1),
           |recon AS (
           |  SELECT d.vec_id,
           |    flatten(list(list_transform(u.sums,
           |      s -> CAST(s AS DOUBLE) / CAST(u.cnt AS DOUBLE)) ORDER BY d.m)) AS vhat
           |  FROM codes d JOIN u2 u ON d.m = u.m AND d.code = u.code
           |  GROUP BY d.vec_id),
           |top AS (
           |  SELECT q_id, n_id, pq_score,
           |    CAST(row_number() OVER (PARTITION BY q_id
           |      ORDER BY pq_score DESC, n_id) AS BIGINT) AS rank
           |  FROM (
           |    SELECT q.vec_id AS q_id, r.vec_id AS n_id,
           |      round(${duckCosine("q.embedding", "r.vhat")}, 6) AS pq_score
           |    FROM embeddings q, recon r
           |    WHERE q.vec_id < 5 AND r.vec_id <> q.vec_id)
           |  QUALIFY rank <= 10),
           |brute AS (
           |  SELECT q.vec_id AS q_id, n.vec_id AS n_id
           |  FROM embeddings q, embeddings n
           |  WHERE q.vec_id < 5 AND n.vec_id <> q.vec_id
           |  QUALIFY row_number() OVER (PARTITION BY q.vec_id
           |    ORDER BY round(${duckCosine("q.embedding", "n.embedding")}, 6) DESC,
           |      n.vec_id) <= 10),
           |recall AS (
           |  SELECT t.q_id, count(*) AS hits
           |  FROM top t JOIN brute b ON t.q_id = b.q_id AND t.n_id = b.n_id
           |  GROUP BY t.q_id)
           |SELECT t.q_id, t.n_id, t.pq_score,
           |  round(${duckCosine("q.embedding", "n.embedding")}, 6) AS score,
           |  t.rank,
           |  CAST(COALESCE(r.hits, 0) AS DOUBLE) / 10.0 AS recall10
           |FROM top t
           |JOIN embeddings q ON q.vec_id = t.q_id
           |JOIN embeddings n ON n.vec_id = t.n_id
           |LEFT JOIN recall r ON t.q_id = r.q_id
           |ORDER BY t.q_id, t.rank""".stripMargin
      }),

    // IVF+PQ — the production ANN shape (what Faiss IVFPQ runs): IVF
    // cells bound WHICH vectors a query touches (nprobe=2 of the
    // Voronoi partition), PQ codes bound HOW MUCH is read per touched
    // vector (8 bytes of codes vs 256 of floats). At 100 TB the two
    // multiply: a query reads P/num_cells of the corpus, 32x
    // compressed, and the exact-float rerank touches only the top-10
    // survivors — which is why this pair is the default production
    // config. Candidate scoring uses the PQ reconstruction v̂ through
    // the same sequential-fold cosine as ann_pq_topk (shared
    // pqRecon/pqReconCtesDuck, so the quantizers cannot drift); the
    // exact score rides along on the survivors.
    QueryDef("ann_ivfpq_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val all = emb(s, d).select(col("vec_id"), col("embedding"))
        val cents = all.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("c_id"), col("embedding").as("vc"))
        val wAssign = Window.partitionBy("vec_id")
          .orderBy(col("csim").desc, col("c_id"))
        val ranked = all.crossJoin(broadcast(cents))
          .withColumn("csim", round(cosine("embedding", "vc"), 6))
          .withColumn("arn", row_number().over(wAssign))
        val assigned = ranked.where(col("arn") === 1)
          .select(col("vec_id").as("n_id"), col("c_id").as("cell"))
        val probes = ranked.where(col("vec_id") < 5 && col("arn") <= 2)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"),
            col("c_id").as("cell"))
        val cb = all.where(col("vec_id") < 16)
          .select(col("vec_id").cast(IntegerType).as("code"),
            col("embedding").as("cv"))
        val recon = pqRecon(all, cb)
        val wRank = Window.partitionBy("q_id")
          .orderBy(col("pq_score").desc, col("n_id"))
        val top = assigned.join(broadcast(probes), "cell")
          .where(col("n_id") =!= col("q_id"))
          .join(recon.select(col("vec_id").as("n_id"), col("vhat")), "n_id")
          .withColumn("pq_score", round(cosine("vq", "vhat"), 6))
          .withColumn("rank", row_number().over(wRank).cast(LongType))
          .where(col("rank") <= 10)
        top.join(emb(s, d).select(col("vec_id").as("n_id"),
            col("embedding").as("ve")), "n_id")
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .select("q_id", "n_id", "pq_score", "score", "rank")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH $pqReconCtesDuck,
        |cents AS (
        |  SELECT vec_id AS c_id, embedding AS vc FROM embeddings WHERE vec_id % 100 = 0),
        |ranked AS (
        |  SELECT e.vec_id, e.embedding, c.c_id,
        |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |      round(${duckCosine("e.embedding", "c.vc")}, 6) DESC, c.c_id) AS arn
        |  FROM embeddings e, cents c),
        |assigned AS (
        |  SELECT vec_id AS n_id, c_id AS cell FROM ranked WHERE arn = 1),
        |probes AS (
        |  SELECT vec_id AS q_id, embedding AS vq, c_id AS cell
        |  FROM ranked WHERE vec_id < 5 AND arn <= 2),
        |top AS (
        |  SELECT q_id, n_id, pq_score,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY pq_score DESC, n_id) AS BIGINT) AS rank
        |  FROM (
        |    SELECT p.q_id, a.n_id,
        |      round(${duckCosine("p.vq", "r.vhat")}, 6) AS pq_score
        |    FROM assigned a
        |    JOIN probes p ON a.cell = p.cell AND a.n_id <> p.q_id
        |    JOIN recon r ON r.vec_id = a.n_id)
        |  QUALIFY rank <= 10)
        |SELECT t.q_id, t.n_id, t.pq_score,
        |  round(${duckCosine("q.embedding", "n.embedding")}, 6) AS score,
        |  t.rank
        |FROM top t
        |JOIN embeddings q ON q.vec_id = t.q_id
        |JOIN embeddings n ON n.vec_id = t.n_id
        |ORDER BY t.q_id, t.rank""".stripMargin)),

    // Int8-quantized ANN: per-vector symmetric scalar quantization
    // (q = round(x * 127 / max|x|)), integer dot products, and
    // per-vector integer norms precomputed ONCE — the memory-bound
    // scale path: a 64-dim float vector is 256 bytes, its int8 form
    // 64, so 4x more of the corpus fits in page cache / executor
    // memory, and the per-pair work is an integer fold. Cosine is
    // scale-invariant, so the per-vector scale cancels and the
    // quantized score needs no dequantization. The exact float score
    // rides along per result row, making the quantization error
    // directly observable. Cross-engine determinism: quantized values
    // and norms are exact integers; the only float ops are one
    // divide + two sqrts per pair, bit-identical IEEE in both
    // engines, rounded to 6 decimals.
    QueryDef("ann_int8_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val qexprs = emb(s, d)
          .withColumn("mx", expr(
            """greatest(aggregate(embedding, CAST(0 AS DOUBLE),
               (acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE)))),
               CAST(1e-30 AS DOUBLE))"""))
          .withColumn("qv", expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx) + 0.5) AS BIGINT))"))
          .withColumn("qn", expr(
            "aggregate(qv, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
        val all = qexprs.select(col("vec_id").as("n_id"), col("embedding").as("ve"),
          col("qv").as("qe"), col("qn").as("qne"))
        val q = qexprs.where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"),
            col("qv").as("qq"), col("qn").as("qnq"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("q_score").desc, col("n_id"))
        all.crossJoin(broadcast(q))
          .where(col("n_id") =!= col("q_id"))
          .withColumn("dot",
            graft.functions.GraftFunctions.int_dot(col("qq"), col("qe")))
          .withColumn("q_score", round(
            col("dot").cast(DoubleType) /
              (sqrt(col("qnq").cast(DoubleType)) * sqrt(col("qne").cast(DoubleType))), 6))
          .withColumn("rank", row_number().over(w).cast(LongType))
          .where(col("rank") <= 10)
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .select("q_id", "n_id", "q_score", "score", "rank")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH quant AS (
        |  SELECT vec_id, embedding, qv,
        |    list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b) AS qn
        |  FROM (
        |    SELECT vec_id, embedding,
        |      list_transform(embedding,
        |        x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / mx) + 0.5) AS BIGINT)) AS qv
        |    FROM (
        |      SELECT vec_id, embedding,
        |        greatest(list_reduce(list_transform(embedding,
        |          x -> abs(CAST(x AS DOUBLE))), (a, b) -> greatest(a, b)),
        |          CAST(1e-30 AS DOUBLE)) AS mx
        |      FROM embeddings))),
        |scored AS (
        |  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |    round(CAST(list_reduce(list_transform(list_zip(q.qv, n.qv),
        |        x -> x[1] * x[2]), (a, b) -> a + b) AS DOUBLE)
        |      / (sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(n.qn AS DOUBLE))), 6)
        |      AS q_score,
        |    round(${duckCosine("q.embedding", "n.embedding")}, 6) AS score
        |  FROM quant q, quant n
        |  WHERE q.vec_id < 5 AND n.vec_id <> q.vec_id)
        |SELECT q_id, n_id, q_score, score,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY q_score DESC, n_id) AS BIGINT) AS rank
        |FROM scored QUALIFY rank <= 10 ORDER BY q_id, rank""".stripMargin)),

    // Binary quantization — the last rung of the compression ladder
    // (float32 -> int8 -> PQ -> 1 bit/plane): every vector collapses
    // to a 128-bit sign-projection signature (8 x 16-bit words — 2
    // bits/dim, the density production binary quantizers use; 1
    // bit/dim measured 0.40 mean recall@10 at sf0.01, 2 bits/dim
    // 0.72), so
    // candidate generation is XOR + popcount against the query's
    // signature — 16x smaller than the raw vector and the cheapest
    // possible scan at 100 TB (the signature column is what you'd
    // precompute and store; here it's derived scan-side, narrow, no
    // shuffle). Top-50 by Hamming distance (n_id tiebreak) feed an
    // exact-cosine rerank to top-10 — the same
    // cheap-filter-then-exact-rerank shape as ann_pq_topk — and
    // recall@10 vs the corpus-wide brute force rides along in-query
    // (demo instrumentation, same caveat as ann_ivf_multiprobe).
    // AnnSpec pins the recall floor.
    QueryDef("ann_binary_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // raw reader throughout: the signature pass is one fused
        // codegen loop per row and the rest is broadcast joins +
        // q_id windows — the fan-out exchange regressed this query
        // in BOTH r21 driver artifacts (1.63 -> 2.36/1.88 s), the
        // exact narrow-pass class commit da40076 reverted elsewhere
        val all = embRaw(s, d).select(col("vec_id"), col("embedding"))
          .withColumns((0 until 8).map(w =>
            s"s$w" -> graft.functions.GraftFunctions
              .binary_sig(col("embedding"), w)).toMap)
        val q = all.where(col("vec_id") < 5)
          .select(Seq(col("vec_id").as("q_id"), col("embedding").as("vq")) ++
            (0 until 8).map(w => col(s"s$w").as(s"t$w")): _*)
        val wHam = Window.partitionBy("q_id")
          .orderBy(col("hamming").asc, col("n_id"))
        val wRank = Window.partitionBy("q_id")
          .orderBy(col("score").desc, col("n_id"))
        val approx = all
          .select(Seq(col("vec_id").as("n_id"), col("embedding").as("ve")) ++
            (0 until 8).map(w => col(s"s$w")): _*)
          .crossJoin(broadcast(q))
          .where(col("n_id") =!= col("q_id"))
          .withColumn("hamming", expr("CAST(" + (0 until 8)
            .map(w => s"bit_count(s$w ^ t$w)").mkString(" + ") + " AS BIGINT)"))
          .withColumn("crn", row_number().over(wHam))
          .where(col("crn") <= 50)
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .withColumn("rank", row_number().over(wRank).cast(LongType))
          .where(col("rank") <= 10)
          .select("q_id", "n_id", "hamming", "score", "rank")
        val qPlain = embRaw(s, d).where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"))
        val brute = embRaw(s, d)
          .select(col("vec_id").as("n_id"), col("embedding").as("ve"))
          .crossJoin(broadcast(qPlain))
          .where(col("n_id") =!= col("q_id"))
          .withColumn("score", round(cosine("vq", "ve"), 6))
          .withColumn("brank", row_number().over(wRank))
          .where(col("brank") <= 10)
          .select(col("q_id"), col("n_id"))
        val recall = approx.join(brute, Seq("q_id", "n_id"), "left_semi")
          .groupBy("q_id").agg(count(lit(1)).as("hits"))
        approx.join(broadcast(recall), Seq("q_id"), "left")
          // left + coalesce: a zero-recall query has no `recall` group;
          // an inner join would silently drop its top-10 rows (ADVICE r8)
          .withColumn("recall10",
            coalesce(col("hits").cast(DoubleType), lit(0.0)) / 10.0)
          .select("q_id", "n_id", "hamming", "score", "rank", "recall10")
          .orderBy("q_id", "rank")
      },
      Some(s"""WITH sigs AS (
        |  SELECT vec_id, embedding,
        |    ${(0 until 8).map(w => binarySigDuck("embedding", w) + s" AS s$w").mkString(",\n    ")}
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS vq,
        |        ${(0 until 8).map(w => s"s$w AS t$w").mkString(", ")}
        |      FROM sigs WHERE vec_id < 5),
        |approx AS (
        |  SELECT q_id, n_id, hamming, score,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY score DESC, n_id) AS BIGINT) AS rank
        |  FROM (
        |    SELECT q_id, n_id, hamming, ve, vq,
        |      round(${duckCosine("vq", "ve")}, 6) AS score
        |    FROM (
        |      SELECT q.q_id, s.vec_id AS n_id, s.embedding AS ve, q.vq,
        |        CAST(${(0 until 8).map(w => s"bit_count(xor(s.s$w, q.t$w))").mkString(" + ")}
        |          AS BIGINT) AS hamming
        |      FROM sigs s, q
        |      WHERE s.vec_id <> q.q_id
        |      QUALIFY row_number() OVER (PARTITION BY q_id
        |        ORDER BY hamming ASC, n_id) <= 50))
        |  QUALIFY rank <= 10),
        |brute AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q.vec_id AS q_id, n.vec_id AS n_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(${duckCosine("q.embedding", "n.embedding")}, 6) DESC,
        |        n.vec_id) AS brank
        |    FROM embeddings q, embeddings n
        |    WHERE q.vec_id < 5 AND n.vec_id <> q.vec_id)
        |  WHERE brank <= 10),
        |recall AS (
        |  SELECT a.q_id, count(*) AS hits FROM approx a
        |  JOIN brute b ON a.q_id = b.q_id AND a.n_id = b.n_id
        |  GROUP BY a.q_id)
        |SELECT a.q_id, a.n_id, a.hamming, a.score, a.rank,
        |  CAST(COALESCE(r.hits, 0) AS DOUBLE) / 10.0 AS recall10
        |FROM approx a LEFT JOIN recall r ON a.q_id = r.q_id
        |ORDER BY a.q_id, a.rank""".stripMargin)),

    // Embedding-cosine near-dup pairs with random-hyperplane LSH
    // blocking: pairs are compared only within equal 8-bit sign
    // signatures (2^8 buckets), so the pair count is Σ bucket² instead
    // of Σ label² — the blocking key's cardinality grows with NPlanes,
    // not with how coarse a human label happens to be, which is what
    // survives a 100 TB corpus (add planes → smaller buckets; the
    // recall caveat of sign-LSH near a hyperplane is inherent and
    // shared with every production near-dup pipeline). The corpus has
    // no natural near-dups, so exact copies (vec_id%23==0, +1M ids)
    // are unioned in — the same augmentation on both engines; copies
    // collide on all bits by construction.
    QueryDef("dedup_embedding_cosine",
      (s, d) => {
        // union branches from the raw scan, ONE fan-out after (see
        // QueryDef.fanOut — fanning the shared reader plans one
        // exchange per branch)
        val base = embRaw(s, d)
        val aug = QueryDef.fanOut(base.unionAll(
          base.where(col("vec_id") % 23 === 0)
            .select((col("vec_id") + 1000000).as("vec_id"),
                    col("embedding"), col("label"))))
          .withColumn("sig", expr(hyperplaneSigSpark("embedding")).cast(LongType))
        val a = aug.select(col("vec_id").as("id_a"), col("embedding").as("va"),
                           col("sig"))
        val b = aug.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
                           col("sig"))
        a.join(b, Seq("sig"))
          .where(col("id_a") < col("id_b"))
          .withColumn("score", round(cosine("va", "vb"), 6))
          .where(col("score") >= 0.99)
          .select("id_a", "id_b", "sig", "score")
          .orderBy("id_a", "id_b")
      },
      Some(s"""WITH aug AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 23 = 0),
        |sigged AS (
        |  SELECT vec_id, embedding,
        |    CAST(${hyperplaneSigDuck("embedding")} AS BIGINT) AS sig
        |  FROM aug)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.sig,
        |  round(${duckCosine("a.embedding", "b.embedding")}, 6) AS score
        |FROM sigged a JOIN sigged b ON a.sig = b.sig AND a.vec_id < b.vec_id
        |WHERE round(${duckCosine("a.embedding", "b.embedding")}, 6) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin)),

    // Hard-negative mining for contrastive training (the FaceNet /
    // sentence-transformers recipe): for every anchor, the nearest
    // SAME-label neighbor (the positive) and the nearest CROSS-label
    // neighbor (the hard negative), plus the triplet margin and the
    // semi-hard flag (negative inside the 0.1 margin band below the
    // positive). Scores are ppm-frozen so the argmax and flags are
    // bit-pinned. Scale shape: the argmax is max(struct(sim, -id))
    // — a hash AGGREGATE with map-side partial combine, not a window
    // — so the per-anchor reduction happens before the shuffle and
    // the shuffled volume is 2 rows per anchor, not |corpus| rows;
    // anchors are bounded and broadcast, the corpus is scanned once.
    // Anchors keep LEFT-join semantics so one with no same-label or
    // no cross-label peer still emits its row (NULL side, NULL
    // margin) instead of silently vanishing.
    QueryDef("mine_hard_negatives",
      (s, d) => {
        val all = emb(s, d).select(col("vec_id").as("n_id"),
          col("label").as("n_label"), col("embedding").as("ve"))
        val q = emb(s, d).where(col("vec_id") < 64)
          .select(col("vec_id").as("q_id"), col("label").as("q_label"),
            col("embedding").as("vq"))
        val scored = all.crossJoin(broadcast(q))
          .where(col("n_id") =!= col("q_id"))
          .withColumn("sim_ppm",
            floor(cosine("vq", "ve") * 1000000 + 0.5).cast(LongType))
        // argmax via max(struct): sim first, then -n_id so ties take
        // the smaller id — same selection as ORDER BY sim DESC, n_id
        def best(side: DataFrame, idName: String, ppmName: String) = side
          .groupBy("q_id")
          .agg(max(struct(col("sim_ppm"), (-col("n_id")).as("neg_nid"))).as("m"))
          .select(col("q_id"), (-col("m.neg_nid")).as(idName),
            col("m.sim_ppm").as(ppmName))
        val pos = best(scored.where(col("n_label") === col("q_label")),
          "pos_id", "pos_ppm")
        val neg = best(scored.where(col("n_label") =!= col("q_label")),
          "neg_id", "neg_ppm")
        q.select("q_id", "q_label")
          .join(pos, Seq("q_id"), "left")
          .join(neg, Seq("q_id"), "left")
          .withColumn("margin_ppm", col("pos_ppm") - col("neg_ppm"))
          .withColumn("semi_hard",
            col("neg_ppm") < col("pos_ppm") &&
              col("neg_ppm") > col("pos_ppm") - 100000L)
          .orderBy("q_id")
      },
      Some(s"""WITH q AS (
        |  SELECT vec_id AS q_id, label AS q_label, embedding AS vq
        |  FROM embeddings WHERE vec_id < 64),
        |scored AS (
        |  SELECT q.q_id, q.q_label, n.vec_id AS n_id, n.label AS n_label,
        |    CAST(floor(${duckCosine("q.vq", "n.embedding")} * 1000000 + 0.5)
        |      AS BIGINT) AS sim_ppm
        |  FROM embeddings n, q WHERE n.vec_id <> q.q_id),
        |pos AS (
        |  SELECT q_id, n_id AS pos_id, sim_ppm AS pos_ppm FROM scored
        |  WHERE n_label = q_label
        |  QUALIFY row_number() OVER (PARTITION BY q_id
        |    ORDER BY sim_ppm DESC, n_id) = 1),
        |neg AS (
        |  SELECT q_id, n_id AS neg_id, sim_ppm AS neg_ppm FROM scored
        |  WHERE n_label <> q_label
        |  QUALIFY row_number() OVER (PARTITION BY q_id
        |    ORDER BY sim_ppm DESC, n_id) = 1)
        |SELECT q.q_id, q.q_label, pos_id, pos_ppm, neg_id, neg_ppm,
        |  pos_ppm - neg_ppm AS margin_ppm,
        |  (neg_ppm < pos_ppm AND neg_ppm > pos_ppm - 100000) AS semi_hard
        |FROM q LEFT JOIN pos USING (q_id) LEFT JOIN neg USING (q_id)
        |ORDER BY q_id""".stripMargin)),

    // Distributed PCA by power iteration, in EXACT integer arithmetic
    // so the oracle replays the whole algorithm bit-for-bit: vectors
    // are quantized to q = floor(x*1024 + 0.5) (the int-quantization
    // family ann_int8/pq already use), the centered scatter matrix
    // M = S - (s s^T) div n is exact BIGINT (~ n * covariance; the
    // div-truncated centering perturbs each entry by < 1 quantum and
    // is part of the pinned algorithm — both engines truncate
    // identically, and |M| <= n*1024^2 keeps the iteration products
    // inside BIGINT out to ~1e8 vectors), and each power-iteration
    // round renormalizes the iterate to |v| <= 1024
    // by integer division — no float ever enters, so there is no
    // cross-engine ulp exposure anywhere. Scale shape: ONE corpus
    // pass builds the 64x64 scatter via a per-vector dim-pair
    // expansion groupBy'd on 4096 keys (map-side combine); every
    // iteration is a 4096-row join against a broadcast 64-row
    // iterate — corpus size never appears after the first aggregate.
    QueryDef("emb_pca_loadings",
      (s, d) => pcaLoadings(s, d)
        .select(col("j").as("dim"), col("vj").as("loading"))
        .orderBy("dim"),
      Some(s"""WITH $pcaCtes
        |SELECT j AS dim, vj AS loading FROM v$Rounds ORDER BY dim""".stripMargin)),

    // Projection of every vector onto the learned component — the
    // "embedding whitening / outlier axis" read: top-10 docs by
    // |projection| (exact integers again: p = sum q_j * v_j).
    QueryDef("emb_pca_project",
      (s, d) => {
        val ex = pcaExploded(s, d)
        val v = pcaLoadings(s, d)
        ex.join(broadcast(v), "j")
          .groupBy("vec_id")
          .agg(sum(col("q") * col("vj")).as("proj"))
          .orderBy(abs(col("proj")).desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH $pcaCtes
        |SELECT e.vec_id, CAST(sum(e.q * v.vj) AS BIGINT) AS proj
        |FROM ex e JOIN v$Rounds v USING (j)
        |GROUP BY e.vec_id
        |ORDER BY abs(sum(e.q * v.vj)) DESC, e.vec_id LIMIT 10""".stripMargin)),

    // Matryoshka-style truncation evaluation: retrieval quality of the
    // FIRST-16-dims prefix vs the full 64-dim embedding — the
    // measurement behind "store the short prefix, rerank with the
    // tail" serving layouts (MRL, Kusupati et al. 2022). recall@10 of
    // the truncated top-10 against the full top-10, per query, in
    // exact ppm. Zero-overlap queries still emit (LEFT join +
    // coalesce), per the ann-recall review finding. Scale shape:
    // both arms are bounded top-k per broadcast query; the
    // truncated arm reads 4x fewer bytes per candidate — at serving
    // scale that's the point.
    QueryDef("ann_matryoshka_recall",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val all = emb(s, d).select(col("vec_id").as("n_id"),
          col("embedding").as("ve"))
        val q = emb(s, d).where(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("sim_ppm").desc, col("n_id"))
        def topk(qc: Column, nc: Column): DataFrame =
          all.crossJoin(broadcast(q))
            .where(col("n_id") =!= col("q_id"))
            .withColumn("sim_ppm", floor(
              graft.functions.GraftFunctions.cosine_sim(qc, nc)
                * 1000000 + 0.5).cast(LongType))
            .withColumn("rn", row_number().over(w))
            .where(col("rn") <= 10)
            .select("q_id", "n_id")
        val full = topk(col("vq"), col("ve"))
        val trunc = topk(slice(col("vq"), 1, 16), slice(col("ve"), 1, 16))
        val hits = full.join(trunc, Seq("q_id", "n_id"))
          .groupBy("q_id").agg(count(lit(1)).as("h"))
        q.select("q_id").join(hits, Seq("q_id"), "left")
          .select(col("q_id"),
            coalesce(col("h"), lit(0L)).cast(LongType).as("hits"))
          .withColumn("recall_ppm", (col("hits") * 100000L).cast(LongType))
          .orderBy("q_id")
      },
      Some {
        def arm(cte: String, qv: String, nv: String) =
          s"""$cte AS (
          |  SELECT q_id, n_id FROM (
          |    SELECT q.q_id, n.vec_id AS n_id,
          |      row_number() OVER (PARTITION BY q.q_id
          |        ORDER BY CAST(floor(${duckCosine(qv, nv)} * 1000000 + 0.5)
          |                   AS BIGINT) DESC, n.vec_id) AS rn
          |    FROM embeddings n, q WHERE n.vec_id <> q.q_id)
          |  WHERE rn <= 10)"""
        s"""WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS vq FROM embeddings
        |  WHERE vec_id < 5),
        |${arm("full_r", "q.vq", "n.embedding")},
        |${arm("trunc_r", "q.vq[1:16]", "n.embedding[1:16]")},
        |hits AS (
        |  SELECT f.q_id, CAST(count(*) AS BIGINT) AS h
        |  FROM full_r f JOIN trunc_r t USING (q_id, n_id) GROUP BY f.q_id)
        |SELECT q.q_id, CAST(COALESCE(h.h, 0) AS BIGINT) AS hits,
        |  CAST(COALESCE(h.h, 0) * 100000 AS BIGINT) AS recall_ppm
        |FROM q LEFT JOIN hits h USING (q_id)
        |ORDER BY q_id""".stripMargin
      }),

    // Embedding outlier detection against the corpus centroid — the
    // standard "weird vector" screen (mislabeled / off-distribution /
    // corrupt rows) a training pipeline runs before clustering. Every
    // float step is frozen to fixed-point micros so the result is
    // engine-exact: per-dim centroid sums are integer (one 64-row
    // aggregate, map-side combinable), each vector's dot/norm terms
    // quantize per-dimension before their integer per-vector sums,
    // and the population mean/std of the cosine come from exact
    // integer sums — no order-dependent double accumulation anywhere.
    // Scale shape: two corpus passes (centroid, then scores) + one
    // scalar z-stats aggregate; the 64-row centroid broadcasts; no
    // pairwise joins.
    QueryDef("emb_outlier_centroid",
      (s, d) => {
        val q = emb(s, d).select(col("vec_id"),
            posexplode(col("embedding")).as(Seq("dim", "v")))
          .withColumn("vd", col("v").cast(DoubleType))
        val cent = q.groupBy("dim").agg(
            sum(expr("CAST(floor(vd * 1000000 + 0.5) AS BIGINT)"))
              .cast(LongType).as("sq"),
            count(lit(1)).cast(LongType).as("n"))
          .withColumn("cj", expr("CAST(sq AS DOUBLE) / (n * 1000000.0)"))
          .localCheckpoint()
        val cn = cent.agg(
          sum(expr("CAST(floor(cj * cj * 1000000 + 0.5) AS BIGINT)"))
            .cast(LongType).as("nc"))
        val pv = q.join(broadcast(cent.select("dim", "cj")), "dim")
          .withColumn("tm", expr("CAST(floor(vd * cj * 1000000 + 0.5) AS BIGINT)"))
          .withColumn("tv", expr("CAST(floor(vd * vd * 1000000 + 0.5) AS BIGINT)"))
          .groupBy("vec_id").agg(
            sum("tm").cast(LongType).as("dotm"),
            sum("tv").cast(LongType).as("nv"))
        // one row per vector — materialize so the z-stats aggregate and
        // the final projection don't each re-run the corpus pass
        val ci = pv.crossJoin(broadcast(cn))
          .withColumn("cim", expr(
            """CAST(floor(dotm / (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE)))
               * 1000000 + 0.5) AS BIGINT)"""))
          .localCheckpoint()
        val st = ci.agg(count(lit(1)).cast(LongType).as("nn"),
          sum("cim").cast(LongType).as("s1"),
          sum(expr("cim * cim")).cast(LongType).as("s2"))
        ci.crossJoin(broadcast(st))
          .withColumn("csim", round(col("cim").cast(DoubleType) / 1000000.0, 6))
          .withColumn("z", expr(
            """round((cim - CAST(s1 AS DOUBLE) / nn)
               / sqrt(CAST(s2 AS DOUBLE) / nn
                 - (CAST(s1 AS DOUBLE) / nn) * (CAST(s1 AS DOUBLE) / nn)), 6)"""))
          .withColumn("is_outlier", col("z") < -2.0)
          .select("vec_id", "csim", "z", "is_outlier")
          .orderBy("vec_id")
      },
      Some("""WITH q AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS vd
        |  FROM embeddings),
        |cent AS (
        |  SELECT dim,
        |    CAST(sum(CAST(floor(vd * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sq,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM q GROUP BY 1),
        |cd AS (SELECT dim, CAST(sq AS DOUBLE) / (n * 1000000.0) AS cj FROM cent),
        |cn AS (SELECT CAST(sum(CAST(floor(cj * cj * 1000000 + 0.5) AS BIGINT))
        |  AS BIGINT) AS nc FROM cd),
        |pv AS (
        |  SELECT vec_id,
        |    CAST(sum(CAST(floor(vd * cj * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS dotm,
        |    CAST(sum(CAST(floor(vd * vd * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS nv
        |  FROM q JOIN cd USING (dim) GROUP BY 1),
        |ci AS (
        |  SELECT vec_id,
        |    CAST(floor(dotm / (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE)))
        |      * 1000000 + 0.5) AS BIGINT) AS cim
        |  FROM pv, cn),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS nn,
        |  CAST(sum(cim) AS BIGINT) AS s1,
        |  CAST(sum(cim * cim) AS BIGINT) AS s2 FROM ci)
        |SELECT vec_id, round(CAST(cim AS DOUBLE) / 1000000.0, 6) AS csim,
        |  round((cim - CAST(s1 AS DOUBLE) / nn)
        |    / sqrt(CAST(s2 AS DOUBLE) / nn
        |      - (CAST(s1 AS DOUBLE) / nn) * (CAST(s1 AS DOUBLE) / nn)), 6) AS z,
        |  round((cim - CAST(s1 AS DOUBLE) / nn)
        |    / sqrt(CAST(s2 AS DOUBLE) / nn
        |      - (CAST(s1 AS DOUBLE) / nn) * (CAST(s1 AS DOUBLE) / nn)), 6) < -2.0
        |    AS is_outlier
        |FROM ci, st ORDER BY vec_id""".stripMargin))
  )

  // ---- PCA building blocks (shared by emb_pca_loadings/_project) ----------

  /** Power-iteration rounds. The synthetic corpus is near-isotropic
    * (measured lambda2/lambda1 ~ 0.93), so isolating the top component
    * needs (0.93)^k small: 24 rounds reach a Rayleigh quotient >= 0.98
    * of lambda_max (8 rounds stall at 0.90). Each round is a
    * 4096-row join — rounds are cheap; the corpus pass is not.
    */
  private val Rounds = 24

  /** (vec_id, j, q): dimension-exploded int-quantized vectors.
    * x*1024 is exact in float AND double (power-of-two scale), so the
    * quantization is engine-independent; cast to double anyway for
    * uniformity with the DuckDB text.
    */
  private def pcaExploded(s: SparkSession, d: String): DataFrame =
    emb(s, d).select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("j", "x")))
      .select(col("vec_id"), col("j").cast(LongType).as("j"),
        floor(col("x").cast(DoubleType) * 1024 + 0.5).cast(LongType).as("q"))

  /** `Rounds`-round integer power iteration; returns 64 rows (j, vj),
    * |vj| <= 1024.
    *
    * Optimization-round rewrite (same integer algorithm, same result
    * bit-for-bit — the DuckDB oracle CTEs are untouched):
    * - the scatter matrix is built in ONE corpus pass (per-vector
    *   (i, j, qi*qj) expansion into a map-side-combined 4096-key
    *   aggregate) instead of the former ex-⋈-ex self-join, which
    *   shuffled the exploded corpus and sorted it twice (guide §2.4:
    *   remove shuffles outright);
    * - per-dim sums and n ride the same scan shape (one 64-row agg);
    * - the power iteration runs on the DRIVER over the collected
    *   64x64 = 4096-cell scatter — a fixed-size model artifact,
    *   independent of corpus size (the distributed-PCA shape: Spark
    *   MLlib collects the Gram matrix the same way). The old
    *   DataFrame loop planned ~5 jobs per round x 24 rounds (~130
    *   one-task jobs, pure scheduler overhead at any scale); the
    *   driver loop over 4 KiB of longs is exact and free.
    * All arithmetic is the same BIGINT truncating division both
    * engines already agree on (DuckDB `//` and Spark `div` truncate
    * toward zero, as does Scala Long division).
    */
  private def pcaLoadings(s: SparkSession, d: String): DataFrame = {
    val (m, _) = pcaScatter(s, d)
    var v = Array.fill(64)(1L)
    for (_ <- 1 to Rounds) {
      val w = Array.tabulate(64)(i =>
        (0 until 64).map(j => m(i)(j) * v(j)).sum)
      val mx = w.map(math.abs).max
      v = w.map(wi => (wi * 1024L) / mx)
    }
    import s.implicits._
    v.toSeq.zipWithIndex.map { case (vj, j) => (j.toLong, vj) }
      .toDF("j", "vj")
  }

  /** Centered 64x64 integer scatter matrix m(i)(j) = sij - (si*sj) div n
    * plus n, from one corpus pass (4096-key hash aggregate with
    * map-side partial combine; the 4096-row collect is a fixed-size
    * model, not data). */
  private def pcaScatter(s: SparkSession, d: String): (Array[Array[Long]], Long) = {
    val prods = emb(s, d).select(expr(
        s"""transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1024 + 0.5) AS BIGINT))""")
        .as("qa"))
      .select(explode(expr(
        """flatten(transform(qa, (qi, i) ->
             transform(qa, (qj, j) ->
               struct(CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
                 qi * qj AS p))))""")).as("t"))
      .groupBy(col("t.i").as("i"), col("t.j").as("j"))
      .agg(sum(col("t.p")).as("sij"), count(lit(1)).as("cnt"))
      .collect()
    val n = prods.head.getLong(3)
    val sij = Array.ofDim[Long](64, 64)
    prods.foreach(r => sij(r.getLong(0).toInt)(r.getLong(1).toInt) = r.getLong(2))
    // first moments (per-dim sums) need their own 64-row aggregate
    val si = pcaExploded(s, d).groupBy("j").agg(sum("q").as("sj"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = Array.tabulate(64, 64)((i, j) =>
      sij(i)(j) - (si(i.toLong) * si(j.toLong)) / n)
    (m, n)
  }

  /** The same algorithm as DuckDB CTEs ending in `v$Rounds(j, vj)` —
    * every step integer-exact, so the two engines cannot diverge.
    */
  private lazy val pcaCtes: String = {
    // every CTE that later rounds re-reference is MATERIALIZED —
    // inlined CTEs would re-derive the scatter join once per
    // reference, doubling work each round (2^Rounds recomputations)
    val rounds = (1 to Rounds).map { r =>
      val prev = if (r == 1) "v0" else s"v${r - 1}"
      s"""w$r AS MATERIALIZED (
      |  SELECT m.i, CAST(sum(m.m * v.vj) AS BIGINT) AS w
      |  FROM m JOIN $prev v USING (j) GROUP BY m.i),
      |v$r AS MATERIALIZED (
      |  SELECT i AS j, (w * 1024) // (SELECT max(abs(w)) FROM w$r) AS vj
      |  FROM w$r)"""
    }.mkString(",\n")
    s"""ex AS MATERIALIZED (
    |  SELECT vec_id, CAST(t.j - 1 AS BIGINT) AS j,
    |    CAST(floor(CAST(embedding[t.j] AS DOUBLE) * 1024 + 0.5) AS BIGINT) AS q
    |  FROM embeddings, unnest(range(1, ${EmbDim + 1})) t(j)),
    |nv AS (SELECT count(DISTINCT vec_id) AS n FROM ex),
    |sums AS (SELECT j, CAST(sum(q) AS BIGINT) AS sj FROM ex GROUP BY j),
    |scat AS (
    |  SELECT a.j AS i, b.j AS j, CAST(sum(a.q * b.q) AS BIGINT) AS sij
    |  FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
    |m AS MATERIALIZED (
    |  SELECT s.i, s.j, s.sij - (si.sj * sj.sj) // nv.n AS m
    |  FROM scat s
    |  JOIN sums si ON si.j = s.i
    |  JOIN sums sj ON sj.j = s.j
    |  CROSS JOIN nv),
    |v0 AS (SELECT DISTINCT j, CAST(1 AS BIGINT) AS vj FROM ex),
    |$rounds""".stripMargin
  }
}
