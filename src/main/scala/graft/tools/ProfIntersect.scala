package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** A/B the hashed verification step of dedup_ngram_prefix: how to
  * count |H(A)∩H(B)| over ~235k candidate pairs fastest.
  */
object ProfIntersect {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profint] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val tt = 0.6
    val sh0 = graft.queries.TextOps.shingles(
      graft.queries.TextOps.docsAug(spark, d))
    val docSets = sh0.select(col("doc_id"), xxhash64(col("sh")).as("h"))
      .groupBy("doc_id").agg(collect_set("h").as("hs"))
      .select(col("doc_id"), col("hs"), size(col("hs")).cast(LongType).as("n"))
      .localCheckpoint()
    val sh = docSets.select(col("doc_id"), col("n"), explode(col("hs")).as("h"))
    val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("doc_id").orderBy(col("df").asc, col("h").asc)
    val prefix = sh.join(dfreq, "h")
      .withColumn("pos", row_number().over(wDoc))
      .where(col("pos") <= col("n") - ceil(col("n") * tt - lit(1e-9)) + lit(1L))
      .select("h", "doc_id", "n", "pos")
    val cands = prefix.groupBy("h")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
      .where(size(col("ds")) >= 2)
      .select(explode(flatten(
        transform(col("ds"), (x, i) =>
          transform(slice(col("ds"), i + 2, size(col("ds"))),
            y => struct(x.getField("doc_id").as("doc_a"), x.getField("n").as("na0"),
              y.getField("doc_id").as("doc_b"), y.getField("n").as("nb0")))))).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"), col("p.na0"), col("p.nb0"))
      .where(least(col("na0"), col("nb0")) >=
        ceil(greatest(col("na0"), col("nb0")) * tt - lit(1e-9)))
      .select("doc_a", "doc_b").distinct()
      .localCheckpoint()
    println(s"n_cands=${cands.count()}  n_docs=${docSets.count()}")
    println(docSets.agg(avg(col("n")), max(col("n"))).collect().mkString)

    val dsSorted = docSets
      .select(col("doc_id"), sort_array(col("hs")).as("hs"), col("n"))
      .localCheckpoint()

    def withSets(ds: org.apache.spark.sql.DataFrame, bcast: Boolean) = {
      val a = ds.select(col("doc_id").as("doc_a"), col("hs").as("ha"), col("n").as("na"))
      val b = ds.select(col("doc_id").as("doc_b"), col("hs").as("hbs"), col("n").as("nb"))
      if (bcast) cands.join(broadcast(a), "doc_a").join(broadcast(b), "doc_b")
      else cands.join(a, "doc_a").join(b, "doc_b")
    }

    (0 until 2).foreach { pass =>
      println(s"--- pass $pass ---")
      t("join only (broadcast, no intersect)") {
        withSets(docSets, bcast = true)
          .select(col("doc_a"), size(col("ha")) + size(col("hbs"))).count()
      }
      t("array_intersect, auto join") {
        withSets(docSets, bcast = false)
          .withColumn("ch", size(array_intersect(col("ha"), col("hbs"))))
          .where(col("ch") >= 1).count()
      }
      t("array_intersect, broadcast join") {
        withSets(docSets, bcast = true)
          .withColumn("ch", size(array_intersect(col("ha"), col("hbs"))))
          .where(col("ch") >= 1).count()
      }
      t("sorted arrays + array_intersect, broadcast") {
        withSets(dsSorted, bcast = true)
          .withColumn("ch", size(array_intersect(col("ha"), col("hbs"))))
          .where(col("ch") >= 1).count()
      }
      // exploded long join: cands x A-side hashes, match on (doc_b, h)
      t("exploded long join + count") {
        val aSh = cands.join(sh.select(col("doc_id").as("doc_a"), col("h")), "doc_a")
        aSh.join(sh.select(col("doc_id").as("doc_b"), col("h")), Seq("doc_b", "h"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ch"))
          .where(col("ch") >= 1).count()
      }
    }
    spark.stop()
  }
}
