package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A/B harness for the dedup_ngram_jaccard / dedup_simhash plan shapes
  * (VERDICT r3 item 3: ngram regressed 2.97 -> 3.71 s, simhash
  * 0.48 -> 0.77 s after the minhash shingle cache was removed — those
  * queries had been reading minhash's leaked InMemoryRelation for
  * free). Goal: pick the fastest SELF-CONTAINED shape for each.
  */
object ProfTextAB {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fixtures come from the PRODUCTION code so A/B numbers can't
    // drift from what the queries actually run; only the candidate
    // shapes under test are inlined here
    import graft.queries.TextOps.{docsAug => prodDocsAug, shingles, md5s}
    def docsAug(): DataFrame = prodDocsAug(spark, d)

    def jacOut(common: DataFrame, counts: DataFrame): DataFrame = common
      .join(counts.toDF("doc_a", "na"), "doc_a")
      .join(counts.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("common").cast(DoubleType) / (col("na") + col("nb") - col("common")), 6))
      .where(col("jaccard") >= 0.6)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")

    // n0: current shape — shuffle self-join on sh
    def ngramJoin(persistSh: Boolean): (DataFrame, Seq[DataFrame]) = {
      var sh = shingles(docsAug())
      val cached = if (persistSh) { sh = sh.persist(); Seq(sh) } else Nil
      val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val a = sh.toDF("doc_a", "sh")
      val b = sh.toDF("doc_b", "sh")
      val common = a.join(b, a("sh") === b("sh") && a("doc_a") < b("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      (jacOut(common, counts), cached)
    }

    // n2: one shuffle — group docs per shingle, explode ordered pairs
    def ngramGroup(persistSh: Boolean): (DataFrame, Seq[DataFrame]) = {
      var sh = shingles(docsAug())
      val cached = if (persistSh) { sh = sh.persist(); Seq(sh) } else Nil
      val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val grouped = sh.groupBy("sh").agg(sort_array(collect_list("doc_id")).as("ds"))
        .where(size(col("ds")) >= 2)
      val pairs = grouped.select(explode(flatten(
        transform(col("ds"), (x, i) =>
          transform(slice(col("ds"), i + 2, size(col("ds"))),
            y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
      val common = pairs.groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      (jacOut(common, counts), cached)
    }

    def simhash(persistSh: Boolean): (DataFrame, Seq[DataFrame]) = {
      var sh0 = shingles(docsAug())
      val cached = if (persistSh) { sh0 = sh0.persist(); Seq(sh0) } else Nil
      val sh = sh0.withColumn("h", md5s(col("sh")))
      val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")
      val voteAggs = (1 to 32).map(j =>
        sum(when(substring(col("h"), j, 1).isin(hexHigh: _*), 1L)
          .otherwise(-1L)).as(s"b$j"))
      val out = sh.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
        .select(col("doc_id"),
          (1 to 32).map(j =>
            when(col(s"b$j") > 0, lit(1L << (j - 1))).otherwise(lit(0L)))
            .reduce(_ + _).cast(LongType).as("simhash"))
        .orderBy("doc_id")
      (out, cached)
    }

    // simhash s2: votes from bit-arithmetic on conv() of 8-hex chunks
    // instead of 32 single-char substrings + isin
    def simhashConv(): (DataFrame, Seq[DataFrame]) = {
      val sh = shingles(docsAug()).withColumn("h", md5s(col("sh")))
      // high bit of hex digit j of md5 = bit 3 of that digit's value
      val nib = (1 to 32).map(j =>
        conv(substring(col("h"), j, 1), 16, 10).cast(LongType).as(s"n$j"))
      val withN = sh.select(Seq(col("doc_id")) ++ nib: _*)
      val voteAggs = (1 to 32).map(j =>
        sum(when(col(s"n$j").bitwiseAND(lit(8L)) =!= 0L, 1L).otherwise(-1L)).as(s"b$j"))
      val out = withN.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
        .select(col("doc_id"),
          (1 to 32).map(j =>
            when(col(s"b$j") > 0, lit(1L << (j - 1))).otherwise(lit(0L)))
            .reduce(_ + _).cast(LongType).as("simhash"))
        .orderBy("doc_id")
      (out, Nil)
    }

    // simhash s3: 4 conv() calls over 8-hex-char chunks; each Long
    // carries 8 nibbles, vote j tests the high bit of its nibble
    def simhashWideConv(): (DataFrame, Seq[DataFrame]) = {
      val sh = shingles(docsAug()).withColumn("h", md5s(col("sh")))
      val chunks = (0 until 4).map(c =>
        conv(substring(col("h"), 1 + 8 * c, 8), 16, 10).cast(LongType).as(s"c$c"))
      val withC = sh.select(Seq(col("doc_id")) ++ chunks: _*)
      val voteAggs = (1 to 32).map { j =>
        val c = (j - 1) / 8          // which 8-hex chunk
        val pos = (j - 1) % 8        // nibble within the chunk, MSB first
        val mask = 8L << (4 * (7 - pos))
        sum(when(col(s"c$c").bitwiseAND(lit(mask)) =!= 0L, 1L)
          .otherwise(-1L)).as(s"b$j")
      }
      val out = withC.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
        .select(col("doc_id"),
          (1 to 32).map(j =>
            when(col(s"b$j") > 0, lit(1L << (j - 1))).otherwise(lit(0L)))
            .reduce(_ + _).cast(LongType).as("simhash"))
        .orderBy("doc_id")
      (out, Nil)
    }

    // minhash m0: the RETIRED candidate shape (sizes agg + join +
    // self-join + distinct), kept inline for comparison
    def minhashJoinCands(): (DataFrame, Seq[DataFrame]) = {
      import graft.queries.TextOps
      val sh = shingles(docsAug())
      val bands = TextOps.minhashBands(sh)
      val sizes = bands.groupBy("band", "band_key")
        .agg(count(lit(1)).as("bsz")).where(col("bsz") <= TextOps.BandBucketCap)
      val inCap = bands.join(sizes.select("band", "band_key"), Seq("band", "band_key"))
      val aa = inCap.select(col("band"), col("band_key"), col("doc_id").as("doc_a"))
      val bb = inCap.select(col("band"), col("band_key"), col("doc_id").as("doc_b"))
      val cands = aa.join(bb, Seq("band", "band_key"))
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val out = TextOps.jaccardFor(cands, sh)
        .where(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
      (out, Nil)
    }

    // minhash m1: candidates via ONE groupBy per bucket + ordered-pair
    // explosion (cap bounds each list at 64), replacing the
    // sizes-agg + join + self-join + distinct chain
    def minhashGroupCands(): (DataFrame, Seq[DataFrame]) = {
      import graft.queries.TextOps
      val sh = shingles(docsAug())
      val bands = TextOps.minhashBands(sh)
      val cands = bands.groupBy("band", "band_key")
        .agg(sort_array(collect_list("doc_id")).as("ds"))
        .where(size(col("ds")).between(2, TextOps.BandBucketCap.toInt))
        .select(explode(flatten(
          transform(col("ds"), (x, i) =>
            transform(slice(col("ds"), i + 2, size(col("ds"))),
              y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b")).distinct()
      val out = TextOps.jaccardFor(cands, sh)
        .where(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
      (out, Nil)
    }

    // minhash m2: production shape + persisted shingles (the shingle
    // pipeline now has 4 consumers: bands, counts, both verify sides)
    def minhashPersist(): (DataFrame, Seq[DataFrame]) = {
      import graft.queries.TextOps
      val sh = shingles(docsAug()).persist()
      val bands = TextOps.minhashBands(sh)
      val cands = TextOps.cappedCandidates(bands, TextOps.BandBucketCap)
      val out = TextOps.jaccardFor(cands, sh)
        .where(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
      (out, Seq(sh))
    }

    def run(label: String, mk: () => (DataFrame, Seq[DataFrame])): Unit = {
      val times = (0 until 3).map { _ =>
        val (q, cached) = mk()
        val t0 = System.nanoTime()
        val n = q.count()
        val dt = (System.nanoTime() - t0) / 1e9
        cached.foreach(_.unpersist(blocking = true))
        (dt, n)
      }
      val med = times.map(_._1).sorted.apply(1)
      println(f"$label%-30s median ${med}%.2f s  (rows ${times.head._2}, all ${times.map(t => f"${t._1}%.2f").mkString(",")})")
    }

    spark.read.parquet(s"$d/documents.parquet").count() // warm-up

    run("ngram n0 join (current)", () => ngramJoin(false))
    run("ngram n1 join + persist", () => ngramJoin(true))
    run("ngram n2 group-pairs", () => ngramGroup(false))
    run("ngram n3 group-pairs+persist", () => ngramGroup(true))
    run("simhash s0 (current)", () => simhash(false))
    run("simhash s1 persist", () => simhash(true))
    run("simhash s2 conv-nibbles", () => simhashConv())
    run("simhash s3 wide-conv", () => simhashWideConv())
    run("minhash m0 join-cands", () => minhashJoinCands())
    run("minhash m1 group-cands", () => minhashGroupCands())
    run("minhash m2 group+persist", () => minhashPersist())
    spark.stop()
  }
}
