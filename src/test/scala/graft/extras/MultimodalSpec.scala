package graft.extras

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("decodeMeta: partition-batched stub decode with typed schema") {
    import spark.implicits._
    val df = Seq(
      (1L, "abcdef".getBytes),
      (2L, "x".getBytes),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "blob").repartition(2)
    val out = Multimodal.decodeMeta(df, "blob", "media_id")
      .orderBy("media_id").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("png", "jpg", "unknown"))
    assert(out.map(_.getLong(1)).toSeq == Seq(6L, 1L, 0L))
    assert(out.map(_.getBoolean(5)).toSeq == Seq(true, true, false))
    // deterministic fake dims
    assert(out(0).getInt(3) == (32 + 6 * 7 % 64))
  }

  test("sampleFrames: k frames per blob with deterministic offsets") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(100)(7: Byte))).toDF("media_id", "blob")
    val frames = Multimodal.sampleFrames(df, "blob", "media_id", 4)
      .orderBy("frame_idx").collect()
    assert(frames.length == 4)
    assert(frames.map(_.getLong(3)).toSeq == Seq(0L, 25L, 50L, 75L))
  }
}
