package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Same-JVM A/B of dedup_ngram_prefix shapes (median of 3 full
  * runs each): V0 = r21 string pipeline, V1 = r22 long-interned
  * pipeline (current code), V2 = V1 with the canonical-order window
  * replaced by a per-doc groupBy + array sort/slice/posexplode.
  */
object ProfPfxAB {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    val tt = 0.6

    def sh0() = graft.queries.TextOps.shingles(
      graft.queries.TextOps.docsAug(spark, d))

    // ---- V0: r21 string pipeline --------------------------------
    def v0(): DataFrame = {
      val sh = sh0().localCheckpoint()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      val wDoc = Window.partitionBy("doc_id").orderBy(col("df").asc, col("sh").asc)
      val prefix = sh.join(dfreq, "sh").join(sizes, "doc_id")
        .withColumn("pos", row_number().over(wDoc))
        .where(col("pos") <= col("n") - ceil(col("n") * tt - lit(1e-9)) + lit(1L))
        .select("sh", "doc_id", "n")
      val cands = prefix.groupBy("sh")
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
      graft.queries.TextOps.jaccardFor(cands, sh,
        counts0 = Some(sizes.select(col("doc_id"), col("n").as("n_sh"))))
        .where(col("jaccard") >= tt)
    }

    // ---- V1: current committed-code shape ------------------------
    def v1(): DataFrame =
      graft.SparkEntry.queries("dedup_ngram_prefix")(spark, d)

    // ---- V2: V1 with groupBy-doc prefix instead of window ---------
    def v2(): DataFrame = {
      val docSets = sh0().select(col("doc_id"), xxhash64(col("sh")).as("h"))
        .groupBy("doc_id").agg(collect_set("h").as("hs"))
        .select(col("doc_id"), col("hs"), size(col("hs")).cast(LongType).as("n"))
        .localCheckpoint()
      val sh = docSets.select(col("doc_id"), col("n"), explode(col("hs")).as("h"))
      val dfreq = sh.groupBy("h").agg(count(lit(1)).as("df"))
      // per-doc prefix via one agg: collect (df, h), sort, slice to
      // the prefix length, posexplode for positions
      val pfxLen = col("n") - ceil(col("n") * tt - lit(1e-9)) + lit(1L)
      val prefix = sh.join(dfreq, "h")
        .groupBy("doc_id").agg(
          sort_array(collect_list(struct(col("df"), col("h")))).as("os"),
          first(col("n")).as("n"))
        .select(col("doc_id"), col("n"),
          posexplode(slice(col("os"), lit(1), pfxLen.cast("int"))))
        .select(col("col.h").as("h"), col("doc_id"), col("n"),
          (col("pos") + 1).cast(LongType).as("pos"))
      val alpha = ceil((lit(tt) / (1 + tt)) * (col("na0") + col("nb0")) - lit(1e-9))
      val cands = prefix.groupBy("h")
        .agg(sort_array(collect_list(
          struct(col("doc_id"), col("n"), col("pos")))).as("ds"))
        .where(size(col("ds")) >= 2)
        .select(explode(flatten(
          transform(col("ds"), (x, i) =>
            transform(slice(col("ds"), i + 2, size(col("ds"))),
              y => struct(x.getField("doc_id").as("doc_a"), x.getField("n").as("na0"),
                x.getField("pos").as("pa"),
                y.getField("doc_id").as("doc_b"), y.getField("n").as("nb0"),
                y.getField("pos").as("pb")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"), col("p.na0"), col("p.nb0"),
          col("p.pa"), col("p.pb"))
        .where(least(col("na0"), col("nb0")) >=
          ceil(greatest(col("na0"), col("nb0")) * tt - lit(1e-9)))
        .where(least(col("pa"), col("pb")) +
          least(col("na0") - col("pa"), col("nb0") - col("pb")) >= alpha)
        .where(when(col("na0") <= col("nb0"),
            col("pa") <= col("na0") -
              ceil(col("na0") * (2 * tt / (1 + tt)) - lit(1e-9)) + lit(1L))
          .otherwise(
            col("pb") <= col("nb0") -
              ceil(col("nb0") * (2 * tt / (1 + tt)) - lit(1e-9)) + lit(1L)))
        .select("doc_a", "doc_b").distinct()
      val hashPass = cands
        .join(docSets.select(col("doc_id").as("doc_a"), col("hs").as("ha"),
          col("n").as("na")), "doc_a")
        .join(docSets.select(col("doc_id").as("doc_b"), col("hs").as("hbs"),
          col("n").as("nb")), "doc_b")
        .withColumn("ch",
          size(array_intersect(col("ha"), col("hbs"))).cast(LongType))
        .where(col("ch").cast(DoubleType) / (col("na") + col("nb") - col("ch")) >=
          tt - 1e-6)
        .select("doc_a", "doc_b")
        .localCheckpoint()
      val survDocs = hashPass.select(col("doc_a").as("doc_id"))
        .union(hashPass.select(col("doc_b").as("doc_id"))).distinct()
      val shSurv = sh0().join(broadcast(survDocs), Seq("doc_id"), "left_semi")
        .localCheckpoint()
      graft.queries.TextOps.jaccardFor(hashPass, shSurv)
        .where(col("jaccard") >= tt)
    }

    def time3(label: String)(mk: () => DataFrame): Unit = {
      val walls = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        val c = mk().count()
        val w = (System.nanoTime() - t0) / 1e9
        (w, c)
      }
      val med = walls.map(_._1).sorted.apply(1)
      println(f"[pfxab] $label%-14s med=$med%.2f s  runs=${walls.map(w => f"${w._1}%.2f").mkString(",")}  rows=${walls.head._2}")
    }

    // V3: V1 but jaccardFor runs against the un-checkpointed semi-join
    // (3 cheap recomputes, one fewer materialization barrier)
    def v3real(): DataFrame = {
      val docSets = sh0().select(col("doc_id"), xxhash64(col("sh")).as("h"))
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
      val alpha = ceil((lit(tt) / (1 + tt)) * (col("na0") + col("nb0")) - lit(1e-9))
      val cands = prefix.groupBy("h")
        .agg(sort_array(collect_list(
          struct(col("doc_id"), col("n"), col("pos")))).as("ds"))
        .where(size(col("ds")) >= 2)
        .select(explode(flatten(
          transform(col("ds"), (x, i) =>
            transform(slice(col("ds"), i + 2, size(col("ds"))),
              y => struct(x.getField("doc_id").as("doc_a"), x.getField("n").as("na0"),
                x.getField("pos").as("pa"),
                y.getField("doc_id").as("doc_b"), y.getField("n").as("nb0"),
                y.getField("pos").as("pb")))))).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"), col("p.na0"), col("p.nb0"),
          col("p.pa"), col("p.pb"))
        .where(least(col("na0"), col("nb0")) >=
          ceil(greatest(col("na0"), col("nb0")) * tt - lit(1e-9)))
        .where(least(col("pa"), col("pb")) +
          least(col("na0") - col("pa"), col("nb0") - col("pb")) >= alpha)
        .where(when(col("na0") <= col("nb0"),
            col("pa") <= col("na0") -
              ceil(col("na0") * (2 * tt / (1 + tt)) - lit(1e-9)) + lit(1L))
          .otherwise(
            col("pb") <= col("nb0") -
              ceil(col("nb0") * (2 * tt / (1 + tt)) - lit(1e-9)) + lit(1L)))
        .select("doc_a", "doc_b").distinct()
      val hashPass = cands
        .join(docSets.select(col("doc_id").as("doc_a"), col("hs").as("ha"),
          col("n").as("na")), "doc_a")
        .join(docSets.select(col("doc_id").as("doc_b"), col("hs").as("hbs"),
          col("n").as("nb")), "doc_b")
        .withColumn("ch",
          size(array_intersect(col("ha"), col("hbs"))).cast(LongType))
        .where(col("ch").cast(DoubleType) / (col("na") + col("nb") - col("ch")) >=
          tt - 1e-6)
        .select("doc_a", "doc_b")
        .localCheckpoint()
      val survDocs = hashPass.select(col("doc_a").as("doc_id"))
        .union(hashPass.select(col("doc_b").as("doc_id"))).distinct()
      val shSurv = sh0().join(broadcast(survDocs), Seq("doc_id"), "left_semi")
      graft.queries.TextOps.jaccardFor(hashPass, shSurv)
        .where(col("jaccard") >= tt)
    }

    graft.SparkEntry.queries("q1_pricing_summary")(spark, d).count() // warm
    v1().count() // warm
    (0 until 3).foreach { round =>
      println(s"--- round $round ---")
      time3("v1_current")(() => v1())
      time3("v3_noSurvCkpt")(() => v3real())
    }
    spark.stop()
  }
}
