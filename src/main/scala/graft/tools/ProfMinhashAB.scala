package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A/B harness for the dedup_minhash_lsh caching strategy: times the
  * FULL query (signatures -> capped band candidates -> jaccard verify)
  * under different persist placements to pick the cheapest plan shape.
  */
object ProfMinhashAB {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docsAug(): DataFrame = {
      val base = spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id", "text", "lang")
      base
        .unionAll(base.where(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"), col("lang")))
        .unionAll(base.where(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"),
            concat(col("text"), lit(" near duplicate suffix")).as("text"), col("lang")))
    }
    def shingles(df: DataFrame): DataFrame = {
      val w = col("w")
      df.select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"),
          explode(array_distinct(
            when(size(w) >= 3,
              transform(sequence(lit(1), size(w) - 2),
                i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
                  element_at(w, i + 2))))
              .otherwise(array().cast(ArrayType(StringType))))).as("sh"))
    }
    def md5s(c: Column): Column = md5(c.cast(BinaryType))

    def pipeline(cacheSh: Boolean, cacheBands: Boolean): (DataFrame, Seq[DataFrame]) = {
      var cached = List.empty[DataFrame]
      var sh = shingles(docsAug())
      if (cacheSh) { sh = sh.cache(); cached ::= sh }
      val withH = sh.select(Seq(col("doc_id"), col("sh")) ++
        (0 until 4).map(a => md5s(concat(lit(s"$a:"), col("sh"))).as(s"m$a")): _*)
      val minAggs = (0 until 16).map { i =>
        val (a, k) = (i / 4, i % 4)
        min(substring(col(s"m$a"), 1 + 8 * k, 8)).as(s"h$i")
      }
      val sig = withH.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
      var bands = sig.select(col("doc_id"),
        explode(array((0 until 4).map(b => struct(
          lit(b).as("band"),
          md5s(concat_ws("|", (0 until 4).map(j => col(s"h${4 * b + j}")): _*))
            .as("band_key"))): _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"),
          col("bk.band_key").as("band_key"))
      if (cacheBands) { bands = bands.cache(); cached ::= bands }
      val sizes = bands.groupBy("band", "band_key")
        .agg(count(lit(1)).as("bsz")).where(col("bsz") <= 64L)
      val inCap = bands.join(sizes.select("band", "band_key"), Seq("band", "band_key"))
      val aa = inCap.select(col("band"), col("band_key"), col("doc_id").as("doc_a"))
      val bb = inCap.select(col("band"), col("band_key"), col("doc_id").as("doc_b"))
      val cands = aa.join(bb, Seq("band", "band_key"))
        .where(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val aSh = cands.join(sh.toDF("doc_a", "sh"), "doc_a")
      val common = aSh.join(sh.toDF("doc_b", "sh"), Seq("doc_b", "sh"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("common"))
      val out = common
        .join(counts.toDF("doc_a", "na"), "doc_a")
        .join(counts.toDF("doc_b", "nb"), "doc_b")
        .withColumn("jaccard",
          round(col("common").cast(DoubleType) / (col("na") + col("nb") - col("common")), 6))
        .where(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
      (out, cached)
    }

    def run(label: String, cacheSh: Boolean, cacheBands: Boolean): Unit = {
      // fresh run each time; report median of 3
      val times = (0 until 3).map { _ =>
        val (q, cached) = pipeline(cacheSh, cacheBands)
        val t0 = System.nanoTime()
        val n = q.count()
        val dt = (System.nanoTime() - t0) / 1e9
        cached.foreach(_.unpersist(blocking = true))
        (dt, n)
      }
      val med = times.map(_._1).sorted.apply(1)
      println(f"$label%-28s median ${med}%.2f s  (rows ${times.head._2}, all ${times.map(t => f"${t._1}%.2f").mkString(",")})")
    }

    // warm-up: parquet footers + codegen
    spark.read.parquet(s"$d/documents.parquet").count()
    run("v0 sh.cache (current)", cacheSh = true, cacheBands = false)
    run("v1 sh+bands cache", cacheSh = true, cacheBands = true)
    run("v2 bands cache only", cacheSh = false, cacheBands = true)
    run("v3 no cache", cacheSh = false, cacheBands = false)
    spark.stop()
  }
}
