package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfMinhash {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // replicate pipeline stages
    val docs = spark.read.parquet(s"$d/documents.parquet").select("doc_id", "text", "lang")
    val aug = docs
      .unionAll(docs.where(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text"), col("lang")))
      .unionAll(docs.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" near duplicate suffix")).as("text"), col("lang")))
    val w = col("w")
    val sh = aug.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(array_distinct(transform(sequence(lit(1), size(w) - 2),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
            element_at(w, i + 2))))).as("sh"))
    time("shingle count")(println(sh.count()))
    val withH = sh.select(Seq(col("doc_id"), col("sh")) ++
      (0 until 4).map(a => md5(concat(lit(s"$a:"), col("sh")).cast("binary")).as(s"m$a")): _*)
    val minAggs = (0 until 16).map { i =>
      val (a, k) = (i / 4, i % 4)
      min(substring(col(s"m$a"), 1 + 8 * k, 8)).as(s"h$i")
    }
    val sig = withH.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
    time("signatures")(println(sig.count()))
    val bands = sig.select(col("doc_id"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until 4).map(j => col(s"h${4 * b + j}")): _*).cast("binary"))
          .as("band_key"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    val aa = bands.select(col("band"), col("band_key"), col("doc_id").as("doc_a"))
    val bb = bands.select(col("band"), col("band_key"), col("doc_id").as("doc_b"))
    val cands = aa.join(bb, Seq("band", "band_key"))
      .where(col("doc_a") < col("doc_b")).select("doc_a", "doc_b").distinct()
    time("candidates")(println(cands.count()))
    spark.stop()
  }
}
