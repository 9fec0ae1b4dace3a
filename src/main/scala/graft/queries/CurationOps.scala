package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-curation operators a production web-scale pipeline runs
  * between crawl and training, beyond the dedup/ANN/text families:
  * URL canonicalization dedup (the first dedup any CommonCrawl-style
  * pipeline applies — cheaper than any content hash), hybrid
  * lexical+semantic retrieval fused with reciprocal-rank fusion,
  * edit-distance near-dup verification over blocked candidates,
  * per-source quality-threshold sampling without a global sort, and
  * two-snapshot distribution-drift monitoring.
  *
  * Cross-engine determinism strategy (shared with the other query
  * families): all scores/shares freeze to fixed-point integers
  * (micros / ppm) computed with integer division, so group-by order
  * can never perturb a comparison and both engines hash-match
  * bit-for-bit.
  */
object CurationOps {

  private def docsRaw(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/documents.parquet")
  private def docs(s: SparkSession, d: String): DataFrame =
    QueryDef.fanOut(docsRaw(s, d))
  private def emb(s: SparkSession, d: String): DataFrame =
    QueryDef.fanOut(s.read.parquet(s"$d/embeddings.parquet"))

  /** The URL canonicalization chain as one Spark-SQL expression over
    * column `c` — shared by the batch dedup_url query and the
    * streaming frontier dedup demo (e2e_stream_url_dedup), so both
    * tiers canonicalize identically: strip fragment, lowercase
    * scheme+host (path case preserved), drop default :443, drop
    * utm_* tracking params, drop any trailing run of /index.html and
    * slashes (ONE combined rule — stripping them as two sequential
    * anchored rules is not idempotent on stacked tails like
    * `/index.html/index.html`, which CanonUrlPropSpec caught).
    * RE2-compatible (no lookaheads) so the DuckDB oracle runs the
    * same patterns.
    *
    * ESCAPING TRAP (review-caught): this string is s-interpolated, and
    * the s-interpolator processes `\\` even inside triple quotes —
    * then Spark's SQL literal parser unescapes once more. A literal
    * regex dot therefore needs FOUR backslashes here (`\\\\.`); the
    * two-backslash spelling ships a dot-any that strips
    * `/indexXhtml` too, and the fixture corpus can't catch it
    * because both engines still collapse the fixture variants.
    */
  private[graft] def canonUrlExpr(c: String): String = {
    val nf = s"regexp_replace($c, '#.*$$', '')"
    s"""regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                concat(
                  lower(regexp_extract($nf, '^[^:]+://[^/?#]+', 0)),
                  substr($nf,
                    length(regexp_extract($nf, '^[^:]+://[^/?#]+', 0)) + 1)),
                '://([^/?#]*):443([/?#]|$$)', '://$$1$$2'),
              'utm_[a-z]+=[^&#]*&?', ''),
            '[?&]$$', ''),
          '(/index\\\\.html|/)+$$', '')"""
  }

  /** The ONE text normalization the batch operator
    * (text_nfc_normalize) and the streaming demo
    * (e2e_stream_normalize_dedup) both apply — zero-width strip, then
    * Unicode canonical composition. Shared so the live path can never
    * drift from the batch-audited rule (same pattern as the URL canon
    * chain).
    */
  private[queries] val ZeroWidthSpace = 8203.toChar.toString
  private[queries] def nfcClean(s: String): String =
    java.text.Normalizer.normalize(s.replace(ZeroWidthSpace, ""),
      java.text.Normalizer.Form.NFC)

  def defs: Seq[QueryDef] = Seq(

    // Unicode normalization — the cleaning stage that runs BEFORE any
    // hashing/dedup in a crawl pipeline (C4/RefinedWeb-style): the
    // same visible text arrives as precomposed chars, combining-mark
    // sequences, or with zero-width characters, and every downstream
    // exact/near-dup signature diverges unless the corpus is NFC'd
    // first. The corpus is ASCII, so each doc gets a deterministic
    // "dirty" variant (doc_id%3==0: every 'e' becomes e+U+0301
    // combining acute; ==1: a U+200B zero-width space appended; ==2:
    // untouched), then the operator strips zero-width chars and
    // applies NFC via java.text.Normalizer in mapPartitions. The
    // oracle rebuilds the identical dirty text in SQL and recomputes
    // every count through DuckDB's independent utf8proc
    // nfc_normalize — canonical composition is Unicode-pinned, so the
    // two implementations must agree exactly. All injected chars are
    // BMP, so Spark's UTF-16 length and DuckDB's codepoint length
    // coincide by construction. Scale shape: one narrow pass, no
    // shuffle; normalization is embarrassingly parallel.
    QueryDef("text_nfc_normalize",
      (s, d) => {
        import s.implicits._
        val acute = 769.toChar.toString // combining acute (oracle chr(769))
        val zw = ZeroWidthSpace         // zero-width space (chr(8203))
        val dirty = docs(s, d).select(col("doc_id"),
          when(col("doc_id") % 3 === 0,
            expr(s"replace(text, 'e', concat('e', '$acute'))"))
            .when(col("doc_id") % 3 === 1,
              concat(col("text"), lit(zw)))
            .otherwise(col("text")).as("dt"))
        dirty.as[(Long, String)].mapPartitions { it =>
          it.map { case (id, t) =>
            val noZw = t.replace(zw, "")
            // nfcClean == normalize(strip(t)); strip already done once
            val nfc = java.text.Normalizer
              .normalize(noZw, java.text.Normalizer.Form.NFC)
            (id, nfc.length.toLong,
              (t.length - noZw.length).toLong,
              (noZw.length - nfc.length).toLong,
              t.length != nfc.length)
          }
        }.toDF("doc_id", "clean_chars", "zw_removed", "recomposed", "changed")
          .orderBy("doc_id")
      },
      Some("""WITH dirty AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3
        |      WHEN 0 THEN replace(text, 'e', 'e' || chr(769))
        |      WHEN 1 THEN text || chr(8203)
        |      ELSE text END AS dt
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, dt,
        |    replace(dt, chr(8203), '') AS nozw,
        |    nfc_normalize(replace(dt, chr(8203), '')) AS clean
        |  FROM dirty)
        |SELECT doc_id,
        |  CAST(length(clean) AS BIGINT) AS clean_chars,
        |  CAST(length(dt) - length(nozw) AS BIGINT) AS zw_removed,
        |  CAST(length(nozw) - length(clean) AS BIGINT) AS recomposed,
        |  length(dt) != length(clean) AS changed
        |FROM n ORDER BY doc_id""".stripMargin)),

    // URL-canonicalization dedup — the FIRST dedup of a crawl
    // pipeline: the same page is fetched under scheme/host case
    // variants, default ports, tracking query params, fragments and
    // index-file suffixes; canonicalizing the URL collapses them
    // before a single content byte is hashed. The corpus has no URL
    // column, so each doc deterministically gets one of 6 variant
    // spellings of its group's URL (doc_id div 6 = the page, doc_id
    // % 6 = the variant) — the same augmentation on both engines.
    // Canonicalization is a fixed chain of scan-side regexes
    // (codegen'd, zero UDFs): strip fragment, lowercase scheme+host
    // (path case is PRESERVED — it is significant in real URLs),
    // drop default :443, drop utm_* tracking params, drop
    // /index.html, drop trailing slash. Scale shape: the chain runs
    // inside the scan projection; the only shuffle is the groupBy on
    // the canonical key — one hash row per URL, the minimum any
    // dedup can move. No RE2-incompatible syntax (no lookaheads) so
    // the same patterns run on both engines.
    QueryDef("dedup_url",
      (s, d) => {
        val base = docs(s, d).select(col("doc_id"),
          (col("doc_id") / 6).cast(LongType).as("gid"),
          (col("doc_id") % 6).cast(IntegerType).as("v"))
          .withColumn("host",
            concat(lit("www.host"), col("gid") % 7, lit(".example.com")))
          .withColumn("raw", expr(
            """CASE v
                 WHEN 0 THEN concat('https://', host, '/Docs/', gid)
                 WHEN 1 THEN concat('HTTPS://', upper(host), '/Docs/', gid)
                 WHEN 2 THEN concat('https://', host, ':443/Docs/', gid)
                 WHEN 3 THEN concat('https://', host, '/Docs/', gid,
                                    '?utm_source=feed&utm_campaign=x')
                 WHEN 4 THEN concat('https://', host, '/Docs/', gid,
                                    '#section-2')
                 ELSE concat('https://', host, '/Docs/', gid, '/index.html')
               END"""))
        val canon = base.withColumn("c", expr(canonUrlExpr("raw")))
        canon.groupBy(col("c").as("canonical_url"))
          .agg(count(lit(1)).cast(LongType).as("n_urls"),
            countDistinct(col("raw")).cast(LongType).as("n_raw_spellings"),
            min("doc_id").cast(LongType).as("kept_doc"))
          .orderBy("canonical_url")
      },
      Some("""WITH base AS (
        |  SELECT doc_id, doc_id // 6 AS gid, doc_id % 6 AS v,
        |    'www.host' || (doc_id // 6) % 7 || '.example.com' AS host
        |  FROM documents),
        |raws AS (
        |  SELECT doc_id,
        |    CASE v
        |      WHEN 0 THEN 'https://' || host || '/Docs/' || gid
        |      WHEN 1 THEN 'HTTPS://' || upper(host) || '/Docs/' || gid
        |      WHEN 2 THEN 'https://' || host || ':443/Docs/' || gid
        |      WHEN 3 THEN 'https://' || host || '/Docs/' || gid
        |                  || '?utm_source=feed&utm_campaign=x'
        |      WHEN 4 THEN 'https://' || host || '/Docs/' || gid || '#section-2'
        |      ELSE 'https://' || host || '/Docs/' || gid || '/index.html'
        |    END AS raw
        |  FROM base),
        |nofrag AS (SELECT doc_id, raw, regexp_replace(raw, '#.*$', '') AS nf
        |           FROM raws),
        |canon AS (
        |  SELECT doc_id, raw,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            lower(regexp_extract(nf, '^[^:]+://[^/?#]+'))
        |              || substr(nf,
        |                   length(regexp_extract(nf, '^[^:]+://[^/?#]+')) + 1),
        |            '://([^/?#]*):443([/?#]|$)', '://\1\2'),
        |          'utm_[a-z]+=[^&#]*&?', '', 'g'),
        |        '[?&]$', ''),
        |      '(/index\.html|/)+$', '') AS c
        |  FROM nofrag)
        |SELECT c AS canonical_url, CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(count(DISTINCT raw) AS BIGINT) AS n_raw_spellings,
        |  CAST(min(doc_id) AS BIGINT) AS kept_doc
        |FROM canon GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Hybrid retrieval with reciprocal-rank fusion (Cormack et al.,
    // SIGIR 2009 — the standard way RAG stacks combine BM25 and
    // embedding search without score calibration): the lexical arm is
    // the same BM25 formula as text_bm25_topk (3-term query, top 20),
    // the semantic arm is cosine against a query vector (vec 0's
    // embedding, doc_id = vec_id in the corpus, top 20), and the fused
    // score per doc is sum over arms of floor(1e6 / (60 + rank)) —
    // exact integers, so tie behavior is pinned. A doc on one list
    // only contributes from that list (full outer fusion). Scale
    // shape: each arm ends in a top-k (TakeOrdered, never a global
    // window over the corpus); fusion joins two <= k-row lists — a
    // driver-sized op no matter the corpus size. The semantic arm
    // broadcasts the 1-row query vector through the corpus scan.
    QueryDef("rank_fusion_rrf",
      (s, d) => {
        // lexical arm — the SAME BM25 scoring as text_bm25_topk,
        // through AnalyticsOps.bm25DocMicros (one definition, two
        // consumers)
        val wl = Window.orderBy(col("micros").desc, col("doc_id"))
        val lex = AnalyticsOps.bm25DocMicros(s, d)
          .orderBy(col("micros").desc, col("doc_id")).limit(20)
          .withColumn("lex_rank", row_number().over(wl).cast(LongType))
          .select("doc_id", "lex_rank")
        // semantic arm — cosine vs the query vector, top 20
        val q = emb(s, d).where(col("vec_id") === 0)
          .select(col("embedding").as("vq"))
        val ws = Window.orderBy(col("score").desc, col("doc_id"))
        val sem = emb(s, d)
          .select(col("vec_id").as("doc_id"), col("embedding").as("ve"))
          .crossJoin(broadcast(q))
          .withColumn("score", round(
            graft.functions.GraftFunctions.cosine_sim(col("vq"), col("ve")), 6))
          .orderBy(col("score").desc, col("doc_id")).limit(20)
          .withColumn("sem_rank", row_number().over(ws).cast(LongType))
          .select("doc_id", "sem_rank")
        val wf = Window.orderBy(col("rrf_ppm").desc, col("doc_id"))
        lex.join(sem, Seq("doc_id"), "full_outer")
          .withColumn("rrf_ppm",
            coalesce(expr("1000000 div (60 + lex_rank)"), lit(0L)) +
            coalesce(expr("1000000 div (60 + sem_rank)"), lit(0L)))
          .withColumn("lex_rank", coalesce(col("lex_rank"), lit(0L)))
          .withColumn("sem_rank", coalesce(col("sem_rank"), lit(0L)))
          .withColumn("fused_rank", row_number().over(wf).cast(LongType))
          .select("doc_id", "lex_rank", "sem_rank", "rrf_ppm", "fused_rank")
          .orderBy("fused_rank")
      },
      Some(s"""WITH ${AnalyticsOps.bm25ScoredDuck},
        |lex AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY micros DESC, doc_id) AS BIGINT)
        |      AS lex_rank
        |  FROM scored
        |  QUALIFY lex_rank <= 20),
        |q AS (SELECT embedding AS vq FROM embeddings WHERE vec_id = 0),
        |sem AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
        |      AS sem_rank
        |  FROM (
        |    SELECT e.vec_id AS doc_id,
        |      round(${duckCosine("q.vq", "e.embedding")}, 6) AS score
        |    FROM embeddings e, q)
        |  QUALIFY sem_rank <= 20)
        |SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
        |  CAST(COALESCE(l.lex_rank, 0) AS BIGINT) AS lex_rank,
        |  CAST(COALESCE(s.sem_rank, 0) AS BIGINT) AS sem_rank,
        |  COALESCE(1000000 // (60 + l.lex_rank), 0)
        |    + COALESCE(1000000 // (60 + s.sem_rank), 0) AS rrf_ppm,
        |  CAST(row_number() OVER (ORDER BY
        |    COALESCE(1000000 // (60 + l.lex_rank), 0)
        |      + COALESCE(1000000 // (60 + s.sem_rank), 0) DESC,
        |    COALESCE(l.doc_id, s.doc_id)) AS BIGINT) AS fused_rank
        |FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
        |ORDER BY fused_rank""".stripMargin)),

    // Edit-distance near-dup: the verification tier below
    // shingle-Jaccard — catches single-token edits that keep the
    // shingle set almost intact but also typo-class changes no
    // shingle method scores precisely. All-pairs Levenshtein is
    // O(n² · len²) and unthinkable at scale, so candidates are
    // BLOCKED on md5 of the text's last 40 chars (a prefix edit
    // leaves the suffix intact — the complement of prefix-blocking;
    // production runs both polarities) plus a |length diff| <= 12
    // guard that is a lower bound on the distance, and only the
    // blocked pairs pay the quadratic verify. Near-dup twins (first
    // token replaced by 'zzz') are planted for doc_id % 17 == 0 —
    // the same augmentation on both engines. Scale shape: one
    // shuffle on the block key; pair count is sum over blocks of
    // |block|², never corpus²; levenshtein (codegen'd in Spark,
    // native in DuckDB) runs only on survivors.
    QueryDef("dedup_near_edit",
      (s, d) => {
        // union branches from the raw scan, ONE fan-out after
        val base = docsRaw(s, d).select(col("doc_id"), col("text"))
        val aug = QueryDef.fanOut(base.unionAll(
          base.where(col("doc_id") % 17 === 0)
            .select((col("doc_id") + 5000000L).as("doc_id"),
              regexp_replace(col("text"), "^[a-z]+ ", "zzz ").as("text"))))
          .withColumn("bk", md5(expr("right(text, 40)").cast(BinaryType)))
          .withColumn("len", length(col("text")).cast(LongType))
        val a = aug.select(col("doc_id").as("id_a"), col("text").as("ta"),
          col("bk"), col("len").as("la"))
        val b = aug.select(col("doc_id").as("id_b"), col("text").as("tb"),
          col("bk"), col("len").as("lb"))
        a.join(b, Seq("bk"))
          .where(col("id_a") < col("id_b") &&
            abs(col("la") - col("lb")) <= 12)
          // thresholded levenshtein (3.5+): O(len*k) banded DP instead
          // of the full O(len²) matrix; returns -1 above the bound, so
          // the kept rows and their exact distances are unchanged
          .withColumn("dist",
            levenshtein(col("ta"), col("tb"), 12).cast(LongType))
          .where(col("dist") >= 0 && col("dist") <= 12)
          .select(col("id_a"), col("id_b"), col("dist"),
            (col("id_b") - col("id_a") === 5000000L).as("is_planted_twin"))
          .orderBy("id_a", "id_b")
      },
      Some("""WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 5000000, regexp_replace(text, '^[a-z]+ ', 'zzz ')
        |  FROM documents WHERE doc_id % 17 = 0),
        |keyed AS (
        |  SELECT doc_id, text, md5(right(text, 40)) AS bk,
        |    CAST(length(text) AS BIGINT) AS len
        |  FROM aug)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
        |  (b.doc_id - a.doc_id = 5000000) AS is_planted_twin
        |FROM keyed a JOIN keyed b
        |  ON a.bk = b.bk AND a.doc_id < b.doc_id
        |WHERE abs(a.len - b.len) <= 12
        |  AND levenshtein(a.text, b.text) <= 12
        |ORDER BY id_a, id_b""".stripMargin)),

    // Per-source quality-threshold sampling WITHOUT a global sort —
    // how a real pipeline takes "the best 25% of every source": a
    // per-doc integer quality score (stopword-ratio micros, the
    // text_quality signal), a per-source 65-bin histogram of scores
    // (bounded state, map-side combined), a descending cumulative
    // walk over the BINS to find the threshold where the top-quartile
    // target is crossed, and a final mask `bin >= threshold`. The
    // only windows partition by source over <= 65 histogram rows; the
    // corpus itself is never sorted or ranked — the shape that holds
    // when one source is 40 TB. (Bin-resolution keep counts overshoot
    // the exact quartile by at most one bin's population — reported
    // as kept_micros so the overshoot is observable.)
    QueryDef("sample_quality_threshold",
      (s, d) => {
        val w = split(col("text"), " ")
        val scored = docs(s, d).select(col("source"),
            size(w).cast(LongType).as("n_tokens"),
            size(filter(w, x => x.isin("the", "a", "and", "of", "to")))
              .cast(LongType).as("n_stop"))
          .withColumn("score", expr("n_stop * 1000000 div n_tokens"))
          .withColumn("bin", expr("score div 15625"))
        val hist = scored.groupBy("source", "bin")
          .agg(count(lit(1)).cast(LongType).as("c"))
        val tot = scored.groupBy("source")
          .agg(count(lit(1)).cast(LongType).as("n_docs"))
          .withColumn("k_target", expr("(n_docs + 3) div 4"))
        val wc = Window.partitionBy("source").orderBy(col("bin").desc)
        val cum = hist
          .withColumn("cum", sum("c").over(wc).cast(LongType))
          .join(broadcast(tot), "source")
        cum.where(col("cum") >= col("k_target"))
          .groupBy("source", "n_docs", "k_target")
          .agg(max("bin").cast(LongType).as("threshold_bin"),
            min("cum").cast(LongType).as("kept_docs"))
          .withColumn("kept_micros", expr("kept_docs * 1000000 div n_docs"))
          .orderBy("source")
      },
      Some("""WITH scored AS (
        |  SELECT source,
        |    (CAST(len(list_filter(string_split(text, ' '),
        |       t -> t IN ('the', 'a', 'and', 'of', 'to'))) AS BIGINT) * 1000000)
        |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
        |  FROM documents),
        |binned AS (SELECT source, score // 15625 AS bin FROM scored),
        |hist AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS c
        |         FROM binned GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |          (CAST(count(*) AS BIGINT) + 3) // 4 AS k_target
        |        FROM binned GROUP BY 1),
        |cum AS (
        |  SELECT h.source, h.bin, t.n_docs, t.k_target,
        |    CAST(sum(h.c) OVER (PARTITION BY h.source ORDER BY h.bin DESC)
        |      AS BIGINT) AS cum
        |  FROM hist h JOIN tot t USING (source))
        |SELECT source, n_docs, k_target,
        |  CAST(max(bin) AS BIGINT) AS threshold_bin,
        |  CAST(min(cum) AS BIGINT) AS kept_docs,
        |  (CAST(min(cum) AS BIGINT) * 1000000) // n_docs AS kept_micros
        |FROM cum WHERE cum >= k_target
        |GROUP BY 1, 2, 3 ORDER BY source""".stripMargin)),

    // Corpus distribution drift between two snapshots — the
    // monitoring query a continuously-ingesting pipeline runs before
    // admitting a new crawl batch: per-feature (lang, source, length
    // bucket) share histograms for the base and candidate snapshots
    // (split by doc parity here — the same split both engines see),
    // then L1 distance and max single-bucket gap per feature, all in
    // share-micros. Scale shape: ONE scan explodes each doc into its
    // 3 (feature, bucket) pairs, one map-side-combined groupBy on
    // (snapshot, feature, bucket) — bounded output (features x
    // buckets) — and the distance math runs on the tiny aggregate.
    // The full-outer join catches buckets present in only one
    // snapshot (their whole share counts as drift).
    QueryDef("stats_drift",
      (s, d) => {
        val feats = docs(s, d).select(
          (col("doc_id") % 2 === 0).as("is_base"),
          explode(array(
            struct(lit("lang").as("feature"), col("lang").as("bucket")),
            struct(lit("source").as("feature"), col("source").as("bucket")),
            struct(lit("len64").as("feature"),
              (col("n_chars") / 64).cast(LongType).cast(StringType)
                .as("bucket")))).as("fb"))
          .select(col("is_base"), col("fb.feature").as("feature"),
            col("fb.bucket").as("bucket"))
        val counts = feats.groupBy("is_base", "feature", "bucket")
          .agg(count(lit(1)).cast(LongType).as("c"))
        val totals = feats.where(col("feature") === "lang")
          .groupBy("is_base")
          .agg(count(lit(1)).cast(LongType).as("n"))
        val shares = counts.join(broadcast(totals), "is_base")
          .withColumn("share_micros", expr("c * 1000000 div n"))
        val b = shares.where(col("is_base"))
          .select(col("feature"), col("bucket"),
            col("share_micros").as("base_micros"))
        val c = shares.where(!col("is_base"))
          .select(col("feature"), col("bucket"),
            col("share_micros").as("cand_micros"))
        b.join(c, Seq("feature", "bucket"), "full_outer")
          .withColumn("gap", abs(coalesce(col("base_micros"), lit(0L)) -
            coalesce(col("cand_micros"), lit(0L))))
          .groupBy("feature")
          .agg(count(lit(1)).cast(LongType).as("n_buckets"),
            sum("gap").cast(LongType).as("l1_micros"),
            max("gap").cast(LongType).as("max_gap_micros"))
          .orderBy("feature")
      },
      Some("""WITH feats AS (
        |  SELECT doc_id % 2 = 0 AS is_base, 'lang' AS feature, lang AS bucket
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id % 2 = 0, 'source', source FROM documents
        |  UNION ALL
        |  SELECT doc_id % 2 = 0, 'len64', CAST(n_chars // 64 AS VARCHAR)
        |  FROM documents),
        |counts AS (
        |  SELECT is_base, feature, bucket, CAST(count(*) AS BIGINT) AS c
        |  FROM feats GROUP BY 1, 2, 3),
        |totals AS (
        |  SELECT is_base, CAST(count(*) AS BIGINT) AS n
        |  FROM feats WHERE feature = 'lang' GROUP BY 1),
        |shares AS (
        |  SELECT c.is_base, c.feature, c.bucket, (c.c * 1000000) // t.n AS sm
        |  FROM counts c JOIN totals t USING (is_base)),
        |joined AS (
        |  SELECT COALESCE(b.feature, c.feature) AS feature,
        |    abs(COALESCE(b.sm, 0) - COALESCE(c.sm, 0)) AS gap
        |  FROM (SELECT feature, bucket, sm FROM shares WHERE is_base) b
        |  FULL OUTER JOIN
        |       (SELECT feature, bucket, sm FROM shares WHERE NOT is_base) c
        |    ON b.feature = c.feature AND b.bucket = c.bucket)
        |SELECT feature, CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(sum(gap) AS BIGINT) AS l1_micros,
        |  CAST(max(gap) AS BIGINT) AS max_gap_micros
        |FROM joined GROUP BY 1 ORDER BY feature""".stripMargin)),

    // Directional n-gram CONTAINMENT — the asymmetric complement of
    // Jaccard near-dup: a short doc quoting a long one (press-release
    // reuse, boilerplate embedding, quotation) has low Jaccard but
    // containment ~1 of the quote in its source, so symmetric dedup
    // never catches it (Broder's resemblance-vs-containment split,
    // "On the resemblance and containment of documents", 1997).
    // C(A->B) = |grams5(A) ∩ grams5(B)| / |grams5(A)|. Quote docs are
    // planted for doc_id % 31 == 0 (first 20 words of the source + a
    // unique tail) on both engines. Scale shape: the pair generator
    // joins docs only through SHARED gram hashes with a df <= 16 cap
    // (boilerplate grams above the cap are excluded from the
    // numerator — documented precision tradeoff, the same move that
    // makes dedup_minhash_lsh's bucket cap scale), so candidate count
    // is sum over grams of df², never corpus²; the denominator table
    // is one narrow row per doc.
    QueryDef("dedup_containment",
      (s, d) => {
        // union branches from the raw scan, ONE fan-out after
        val base = docsRaw(s, d).select(col("doc_id"), col("text"))
        val aug = QueryDef.fanOut(base.unionAll(
          base.where(col("doc_id") % 31 === 0)
            .select((col("doc_id") + 7000000L).as("doc_id"),
              concat(array_join(slice(split(col("text"), " "), 1, 20), " "),
                lit(" qz tail "), col("doc_id")).as("text"))))
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .where(size(col("w")) >= 5)
        val grams = aug.select(col("doc_id"), explode(array_distinct(expr(
          """transform(sequence(1, size(w) - 4),
               i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1),
                 element_at(w, i + 2), element_at(w, i + 3),
                 element_at(w, i + 4)))"""))).as("g"))
          // three consumers (denominator, df cap, pair join): hash the
          // gram once and reuse
          .withColumn("h", md5(col("g").cast(BinaryType)))
          .localCheckpoint()
        val denom = grams.groupBy("doc_id")
          .agg(count(lit(1)).cast(LongType).as("total_grams"))
        val rare = grams.groupBy("h")
          .agg(count(lit(1)).cast(LongType).as("df"))
          .where(col("df") <= 16)
          .select("h")
        val capped = grams.join(rare, "h")
        val pairs = capped.select(col("doc_id").as("id_a"), col("h"))
          .join(capped.select(col("doc_id").as("id_b"), col("h")), "h")
          .where(col("id_a") =!= col("id_b"))
          .groupBy("id_a", "id_b")
          .agg(count(lit(1)).cast(LongType).as("shared_grams"))
        pairs.join(denom.withColumnRenamed("doc_id", "id_a"), "id_a")
          .withColumn("containment_micros",
            expr("shared_grams * 1000000 div total_grams"))
          .where(col("containment_micros") >= 500000L &&
            col("shared_grams") >= 3L)
          .select(col("id_a").as("contained_id"), col("id_b").as("container_id"),
            col("shared_grams"), col("total_grams"), col("containment_micros"),
            (abs(col("id_a") - col("id_b")) === 7000000L).as("is_planted"))
          .orderBy("contained_id", "container_id")
      },
      Some("""WITH aug AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 7000000,
        |    array_to_string(string_split(text, ' ')[1:20], ' ')
        |      || ' qz tail ' || doc_id
        |  FROM documents WHERE doc_id % 31 = 0),
        |sp AS (SELECT doc_id, string_split(text, ' ') AS w FROM aug
        |       WHERE len(string_split(text, ' ')) >= 5),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    md5(w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] || ' '
        |        || w[i + 3] || ' ' || w[i + 4]) AS h
        |  FROM sp, unnest(range(1, len(w) - 3)) t(i)),
        |denom AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS total_grams
        |          FROM grams GROUP BY 1),
        |rare AS (SELECT h FROM grams GROUP BY h HAVING count(*) <= 16),
        |capped AS (SELECT g.doc_id, g.h FROM grams g JOIN rare USING (h)),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(count(*) AS BIGINT) AS shared_grams
        |  FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.id_a AS contained_id, p.id_b AS container_id,
        |  p.shared_grams, d.total_grams,
        |  (p.shared_grams * 1000000) // d.total_grams AS containment_micros,
        |  abs(p.id_a - p.id_b) = 7000000 AS is_planted
        |FROM pairs p JOIN denom d ON d.doc_id = p.id_a
        |WHERE (p.shared_grams * 1000000) // d.total_grams >= 500000
        |  AND p.shared_grams >= 3
        |ORDER BY contained_id, container_id""".stripMargin)),

    // Per-doc keyphrase extraction by bigram TF-IDF — the labeling/
    // clustering feature extractor (what topic buckets and dataset
    // cards are built from): unigram IDF is flat on a small shared
    // vocabulary, so phrases are BIGRAMS; idf freezes to micros per
    // vocabulary type (ln over exact integers, same documented 1-ulp
    // class as the other ln queries) and each doc's score is the
    // exact integer tf * idf_micros. Scale shape: the df table is
    // vocabulary-bounded (built with map-side combine, broadcast to
    // the scoring join); the top-3 window partitions BY DOC over that
    // doc's own bigrams only — thousands of independent tiny
    // partitions, never a global rank.
    QueryDef("text_keyphrase_tfidf",
      (s, d) => {
        val bi = docs(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .where(size(col("w")) >= 2)
          .select(col("doc_id"), explode(expr(
            """transform(sequence(1, size(w) - 1),
                 i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"""))
            .as("phrase"))
        val tf = bi.groupBy("doc_id", "phrase")
          .agg(count(lit(1)).cast(LongType).as("tf"))
        val n = docs(s, d).agg(count(lit(1)).cast(LongType).as("n_docs"))
        val idf = tf.groupBy("phrase")
          .agg(count(lit(1)).cast(LongType).as("df"))
          .crossJoin(broadcast(n))
          .withColumn("idf_micros", expr(
            "CAST(floor(ln(CAST(n_docs AS DOUBLE) / df) * 1000000 + 0.5) AS BIGINT)"))
          .select("phrase", "idf_micros")
        val wk = Window.partitionBy("doc_id")
          .orderBy(col("score_micros").desc, col("phrase"))
        tf.join(broadcast(idf), "phrase")
          .withColumn("score_micros", col("tf") * col("idf_micros"))
          .withColumn("rank", row_number().over(wk).cast(LongType))
          .where(col("rank") <= 3)
          .select("doc_id", "phrase", "tf", "score_micros", "rank")
          .orderBy("doc_id", "rank")
      },
      Some("""WITH sp AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |bi AS (
        |  SELECT doc_id, w[i] || ' ' || w[i + 1] AS phrase
        |  FROM sp, unnest(range(1, len(w))) t(i)),
        |tf AS (SELECT doc_id, phrase, CAST(count(*) AS BIGINT) AS tf
        |       FROM bi GROUP BY 1, 2),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |idf AS (
        |  SELECT phrase,
        |    CAST(floor(ln(CAST(n.n_docs AS DOUBLE) / count(*)) * 1000000 + 0.5)
        |      AS BIGINT) AS idf_micros
        |  FROM tf, n GROUP BY phrase, n.n_docs)
        |SELECT doc_id, phrase, tf, tf * idf_micros AS score_micros,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tf * idf_micros DESC, phrase) AS BIGINT) AS rank
        |FROM tf JOIN idf USING (phrase)
        |QUALIFY rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // Histogram sketch MERGE — the associativity proof for the
    // quantile sketch, the property that makes it a 100 TB operator
    // (same role sketch_hll_merge plays for HLL): partial histograms
    // built independently per event_type over SHARED bin edges merge
    // by plain bin-wise addition into exactly the histogram a direct
    // global pass builds — bin_mismatches is computed as a full-outer
    // bin-by-bin integer comparison and must be 0 — and the quantile
    // estimates read from the merged sketch are therefore identical
    // to the direct path's. At scale each worker/partition/day ships
    // its own 1000-bin table (the only thing that moves) and the
    // merge is a tiny groupBy; nothing corpus-sized is ever re-read.
    QueryDef("sketch_histogram_merge",
      (s, d) => {
        val binSql = "CAST(CASE WHEN hi = lo THEN 0 ELSE " +
          "least(999, floor((value - lo) / (hi - lo) * 1000)) END AS INT)"
        val ev = Records.events(s, d).select(col("event_type"), col("value"))
        val stats = ev.agg(min("value").as("lo"), max("value").as("hi"),
          count(lit(1)).cast(LongType).as("n"))
        val binned = ev.crossJoin(broadcast(stats)).withColumn("b", expr(binSql))
          // two histogram consumers (per-type and direct): bin once
          .localCheckpoint()
        val perType = binned.groupBy("event_type", "b")
          .agg(count(lit(1)).cast(LongType).as("c"))
        val merged = perType.groupBy("b")
          .agg(sum("c").cast(LongType).as("c"))
        val direct = binned.groupBy("b")
          .agg(count(lit(1)).cast(LongType).as("cd"))
        val mism = merged.join(direct, Seq("b"), "full_outer")
          .where(coalesce(col("c"), lit(0L)) =!= coalesce(col("cd"), lit(0L)))
          .agg(count(lit(1)).cast(LongType).as("bin_mismatches"))
        val wCum = Window.orderBy("b")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = merged.withColumn("cc", sum("c").over(wCum))
        val ps = s.range(1).select(explode(expr(
          "array(CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE))")).as("p"))
        val tgt = ps.crossJoin(broadcast(stats))
          .withColumn("k", expr("CAST(ceil(p * n) AS BIGINT)"))
        val nTypes = perType.select("event_type").distinct()
          .agg(count(lit(1)).cast(LongType).as("n_types"))
        tgt.join(broadcast(cum), col("cc") >= col("k"))
          .groupBy("p", "k", "lo", "hi").agg(min("b").as("b"))
          .withColumn("est_value", round(
            expr("lo + (b + 0.5) / 1000.0 * (hi - lo)"), 6))
          .crossJoin(broadcast(mism))
          .crossJoin(broadcast(nTypes))
          .select(col("p"), col("est_value"), col("bin_mismatches"),
            col("n_types"))
          .orderBy("p")
      },
      Some("""WITH stats AS (
        |  SELECT min(value) AS lo, max(value) AS hi,
        |    CAST(count(*) AS BIGINT) AS n FROM events),
        |binned AS (
        |  SELECT event_type,
        |    CAST(CASE WHEN hi = lo THEN 0 ELSE
        |      least(999, floor((value - lo) / (hi - lo) * 1000)) END AS INT) AS b
        |  FROM events, stats),
        |per_type AS (SELECT event_type, b, CAST(count(*) AS BIGINT) AS c
        |             FROM binned GROUP BY 1, 2),
        |merged AS (SELECT b, CAST(sum(c) AS BIGINT) AS c FROM per_type GROUP BY 1),
        |direct AS (SELECT b, CAST(count(*) AS BIGINT) AS cd FROM binned GROUP BY 1),
        |mism AS (
        |  SELECT CAST(count(*) AS BIGINT) AS bin_mismatches
        |  FROM merged m FULL OUTER JOIN direct d USING (b)
        |  WHERE COALESCE(m.c, 0) <> COALESCE(d.cd, 0)),
        |cum AS (SELECT b, sum(c) OVER (ORDER BY b) AS cc FROM merged),
        |ps AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p),
        |tgt AS (SELECT p, CAST(ceil(p * n) AS BIGINT) AS k, lo, hi
        |        FROM ps, stats),
        |nt AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |       FROM events),
        |est AS (
        |  SELECT t.p, t.lo, t.hi, min(c.b) AS b
        |  FROM tgt t JOIN cum c ON c.cc >= t.k GROUP BY 1, 2, 3)
        |SELECT e.p,
        |  round(e.lo + (e.b + 0.5) / 1000.0 * (e.hi - e.lo), 6) AS est_value,
        |  m.bin_mismatches, nt.n_types
        |FROM est e, mism m, nt ORDER BY e.p""".stripMargin)),

    // Per-type event-rate anomaly score — the ingestion-monitoring
    // query beside stats_drift: bucket each event type by DAY, then
    // z-score every bucket against that type's own mean/std across
    // buckets. All moments come from exact integer aggregates (sum,
    // sum of squares, bucket count); the z is one fixed expression
    // over those integers, written token-for-token identically in
    // both engines so IEEE's correctly-rounded +,-,*,/,sqrt produce
    // the bit-same double before the micro freeze. Scale shape: one
    // map-side-combined groupBy to (type, day) counts — bounded by
    // types x days — and a broadcast of the per-type moment rows;
    // the corpus is touched once.
    QueryDef("events_anomaly",
      (s, d) => {
        val counts = Records.events(s, d)
          .select(col("event_type"), expr("ts div 1000").as("us"))
          .withColumn("day", expr("us div 86400000000"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).cast(LongType).as("c"))
        val moments = counts.groupBy("event_type").agg(
          count(lit(1)).cast(LongType).as("nb"),
          sum("c").cast(LongType).as("sc"),
          sum(col("c") * col("c")).cast(LongType).as("scc"))
        counts.join(broadcast(moments), "event_type")
          .withColumn("z_micros", expr(
            """CASE WHEN CAST(scc AS DOUBLE) * nb - CAST(sc AS DOUBLE) * sc <= 0
                 THEN 0
                 ELSE CAST(floor(
                   (CAST(c AS DOUBLE) - CAST(sc AS DOUBLE) / nb)
                   / sqrt((CAST(scc AS DOUBLE) * nb - CAST(sc AS DOUBLE) * sc)
                          / (CAST(nb AS DOUBLE) * nb))
                   * 1000000 + 0.5) AS BIGINT)
               END"""))
          .select(col("event_type"), col("day").cast(LongType).as("day"),
            col("c").as("n_events"), col("nb").as("n_buckets"),
            col("z_micros"))
          .orderBy("event_type", "day")
      },
      Some("""WITH counts AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |moments AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(c) AS BIGINT) AS sc,
        |    CAST(sum(c * c) AS BIGINT) AS scc
        |  FROM counts GROUP BY 1)
        |SELECT c.event_type, CAST(c.day AS BIGINT) AS day,
        |  c.c AS n_events, m.nb AS n_buckets,
        |  CASE WHEN CAST(m.scc AS DOUBLE) * m.nb - CAST(m.sc AS DOUBLE) * m.sc <= 0
        |    THEN 0
        |    ELSE CAST(floor(
        |      (CAST(c.c AS DOUBLE) - CAST(m.sc AS DOUBLE) / m.nb)
        |      / sqrt((CAST(m.scc AS DOUBLE) * m.nb - CAST(m.sc AS DOUBLE) * m.sc)
        |             / (CAST(m.nb AS DOUBLE) * m.nb))
        |      * 1000000 + 0.5) AS BIGINT)
        |  END AS z_micros
        |FROM counts c JOIN moments m USING (event_type)
        |ORDER BY event_type, day""".stripMargin)),

    // Compression-ratio quality signal (the Gopher/RefinedWeb
    // "too-compressible text is boilerplate or spam" heuristic) with
    // a REAL compressor: per-doc DEFLATE (java.util.zip.Deflater,
    // BEST_COMPRESSION, fixed strategy — deterministic for fixed
    // input) over mapPartitions with one Deflater per partition, the
    // same executor-batch shape as the multimodal codecs. DEFLATE is
    // not expressible in SQL, so the oracle verifies the STRUCTURE
    // around the one opaque scalar instead of going rows-only: Verify
    // templates the dump directory into the SQL (__VERIFY_OUT__), and
    // DuckDB re-derives every other column independently — raw_bytes
    // must equal the corpus's true UTF-8 length (octet_length(encode))
    // straight from documents, ratio_micros/flag_repetitive are
    // recomputed from scratch, and the doc_id join proves exactly one
    // row per document. Only deflate_bytes itself is taken from the
    // persisted output; its VALUE (determinism, repetitive-text-
    // compresses-below-norm) stays pinned in CurationOpsSpec. Ratio is
    // frozen to micros of the EXACT integer byte lengths. Scale shape:
    // scan -> per-partition compress -> narrow (id, lens) rows;
    // nothing corpus-sized shuffles.
    QueryDef("text_compression_ratio",
      (s, d) => {
        import s.implicits._
        val rows = docs(s, d).select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions { it =>
            val deflater = new java.util.zip.Deflater(
              java.util.zip.Deflater.BEST_COMPRESSION)
            val buf = new Array[Byte](1 << 16)
            it.map { case (id, text) =>
              val in = text.getBytes("UTF-8")
              deflater.reset()
              deflater.setInput(in)
              deflater.finish()
              var outLen = 0L
              while (!deflater.finished())
                outLen += deflater.deflate(buf)
              (id, in.length.toLong, outLen)
            }
          }
          .toDF("doc_id", "raw_bytes", "deflate_bytes")
        rows
          .withColumn("ratio_micros",
            expr("deflate_bytes * 1000000 div raw_bytes"))
          .withColumn("flag_repetitive", col("ratio_micros") < 300000L)
          .orderBy("doc_id")
      },
      Some("""WITH sp AS (
        |  SELECT doc_id, deflate_bytes
        |  FROM read_parquet('__VERIFY_OUT__/text_compression_ratio/*.parquet'))
        |SELECT d.doc_id,
        |  CAST(octet_length(encode(d.text)) AS BIGINT) AS raw_bytes,
        |  CAST(sp.deflate_bytes AS BIGINT) AS deflate_bytes,
        |  CAST(sp.deflate_bytes * 1000000 // octet_length(encode(d.text)) AS BIGINT)
        |    AS ratio_micros,
        |  (sp.deflate_bytes * 1000000 // octet_length(encode(d.text))) < 300000
        |    AS flag_repetitive
        |FROM documents d LEFT JOIN sp USING (doc_id)
        |ORDER BY doc_id""".stripMargin)),

    // MMR diversified rerank (Carbonell & Goldstein, SIGIR 1998 — the
    // standard redundancy-vs-relevance tradeoff RAG stacks apply on
    // top of retrieval): per query, greedily select k=4 of the top-8
    // cosine candidates maximizing 0.7·rel − 0.3·max-sim-to-selected.
    // Every score is ppm-integer ((7·rel − 3·maxsim) div 10), so the
    // greedy argmax and its smaller-id tie-break are bit-pinned. The
    // greedy rounds are DATA-DEPENDENT, so the Spark side builds them
    // as a 4-round declarative loop over the bounded candidate set
    // and the oracle unrolls the same rounds as static CTEs — the
    // same technique as bpe_learn_merges. Scale shape: candidates and
    // their pairwise sims are top-k-bounded PER QUERY (8 + 8x8 rows);
    // all rounds are windows partitioned by q_id over those bounded
    // groups, distributed across queries — the corpus is touched only
    // by the initial top-k.
    QueryDef("rank_mmr_diversify",
      (s, d) => {
        val all = emb(s, d).select(col("vec_id"), col("embedding"))
        val q = all.where(col("vec_id") < 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("vq"))
        val wTop = Window.partitionBy("q_id")
          .orderBy(col("rel_ppm").desc, col("n_id"))
        val cand = all
          .select(col("vec_id").as("n_id"), col("embedding").as("ve"))
          .crossJoin(broadcast(q))
          .where(col("n_id") =!= col("q_id"))
          .withColumn("rel_ppm", floor(
            graft.functions.GraftFunctions.cosine_sim(col("vq"), col("ve"))
              * 1000000 + 0.5).cast(LongType))
          .withColumn("crn", row_number().over(wTop))
          .where(col("crn") <= 8)
          .select("q_id", "n_id", "ve", "rel_ppm")
          // consumed by the pair table and all 4 greedy rounds
          .localCheckpoint()
        val pairs = cand.select(col("q_id"), col("n_id").as("id_a"),
            col("ve").as("va"))
          .join(cand.select(col("q_id"), col("n_id").as("id_b"),
            col("ve").as("vb")), Seq("q_id"))
          .where(col("id_a") =!= col("id_b"))
          .withColumn("sim_ppm", floor(
            graft.functions.GraftFunctions.cosine_sim(col("va"), col("vb"))
              * 1000000 + 0.5).cast(LongType))
          .select("q_id", "id_a", "id_b", "sim_ppm")
          .localCheckpoint()
        // The greedy MMR selection runs on the DRIVER over the two
        // checkpointed tables above — BOUNDED data by construction
        // (top-8 candidates x |queries| rows, the per-query budget
        // that holds at any corpus size), so this is model-sized
        // state like a broadcast, not a corpus collect. The former
        // DataFrame loop planned 3 rounds x (2 joins + window +
        // checkpoint) over <= 24 rows — pure scheduler overhead.
        // Arithmetic is the same truncating BIGINT division (Spark
        // `div` / DuckDB `//` / Scala Long `/` all truncate toward
        // zero), so the oracle replays it bit-for-bit.
        val cs = cand.select("q_id", "n_id", "rel_ppm").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val sim = pairs.collect()
          .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
          .toMap
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long, Long)]
        cs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (q, qs) =>
          val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
          val first = qs.maxBy(c => (c._3, -c._2))
          sel += first._2
          out += ((q, 1L, first._2, first._3, first._3))
          for (r <- 2 to 4) {
            val rem = qs.filterNot(c => sel.contains(c._2))
            if (rem.nonEmpty) {
              val scored = rem.map { c =>
                val maxsim = sel.map(sid => sim((q, c._2, sid))).max
                (c, (7L * c._3 - 3L * maxsim) / 10L)
              }
              val (pick, score) = scored.maxBy { case (c, sc) => (sc, -c._2) }
              sel += pick._2
              out += ((q, r.toLong, pick._2, pick._3, score))
            }
          }
        }
        import s.implicits._
        out.toSeq.toDF("q_id", "round", "n_id", "rel_ppm", "score_ppm")
          .orderBy("q_id", "round")
      },
      Some {
        val selN = (r: Int) => (1 to r).map(i => s"SELECT q_id, n_id FROM sel$i")
          .mkString(" UNION ALL ")
        def round(r: Int) = s"""sel$r AS (
          |  SELECT q_id, n_id, rel_ppm, score_ppm, $r AS round FROM (
          |    SELECT c.q_id, c.n_id, c.rel_ppm,
          |      (7 * c.rel_ppm - 3 * max(p.sim_ppm)) // 10 AS score_ppm,
          |      row_number() OVER (PARTITION BY c.q_id
          |        ORDER BY (7 * c.rel_ppm - 3 * max(p.sim_ppm)) // 10 DESC,
          |                 c.n_id) AS rk
          |    FROM cand c
          |    JOIN (${selN(r - 1)}) s ON s.q_id = c.q_id
          |    JOIN pairs p ON p.q_id = c.q_id AND p.id_a = c.n_id
          |      AND p.id_b = s.n_id
          |    WHERE c.n_id NOT IN (SELECT n_id FROM (${selN(r - 1)}) x
          |                         WHERE x.q_id = c.q_id)
          |    GROUP BY c.q_id, c.n_id, c.rel_ppm)
          |  WHERE rk = 1)"""
        s"""WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS vq FROM embeddings
        |  WHERE vec_id < 3),
        |cand AS (
        |  SELECT q_id, n_id, ve, rel_ppm FROM (
        |    SELECT q.q_id, e.vec_id AS n_id, e.embedding AS ve,
        |      CAST(floor(${duckCosine("q.vq", "e.embedding")} * 1000000 + 0.5)
        |        AS BIGINT) AS rel_ppm
        |    FROM embeddings e, q WHERE e.vec_id <> q.q_id)
        |  QUALIFY row_number() OVER (PARTITION BY q_id
        |    ORDER BY rel_ppm DESC, n_id) <= 8),
        |pairs AS (
        |  SELECT a.q_id, a.n_id AS id_a, b.n_id AS id_b,
        |    CAST(floor(${duckCosine("a.ve", "b.ve")} * 1000000 + 0.5)
        |      AS BIGINT) AS sim_ppm
        |  FROM cand a JOIN cand b ON a.q_id = b.q_id AND a.n_id <> b.n_id),
        |sel1 AS (
        |  SELECT q_id, n_id, rel_ppm, rel_ppm AS score_ppm, 1 AS round FROM (
        |    SELECT q_id, n_id, rel_ppm,
        |      row_number() OVER (PARTITION BY q_id
        |        ORDER BY rel_ppm DESC, n_id) AS rk
        |    FROM cand)
        |  WHERE rk = 1),
        |${round(2)},
        |${round(3)},
        |${round(4)}
        |SELECT q_id, CAST(round AS BIGINT) AS round, n_id, rel_ppm, score_ppm
        |FROM (SELECT * FROM sel1 UNION ALL SELECT * FROM sel2
        |      UNION ALL SELECT * FROM sel3 UNION ALL SELECT * FROM sel4)
        |ORDER BY q_id, round""".stripMargin
      }))

  private def duckCosine(a: String, b: String): String =
    VectorOps.duckCosine(a, b)
}
