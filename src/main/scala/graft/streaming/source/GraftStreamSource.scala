package graft.streaming.source

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.example.GroupReadSupport

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.log.{FileIndex, Layout, StreamManifest}

/** R8/R9 as a first-class connector: a DataSource V2 streaming source
  * whose OFFSETS ARE SEQ_NUMS (`cf. ReadSessionOutput`,
  * common/src/stream.rs:370-374) — not file names.
  *
  * - `latestOffset` reads the stream manifest: only durably committed
  *   records (seq < tail) are ever offered, so a reader can never
  *   observe an uncommitted append (the reference's "ack follows
  *   durability" contract from the consumer side).
  * - `planInputPartitions(start, end)` prunes data files by their
  *   parquet footer min/max seq_num stats (cached on the driver) — the
  *   SRD prefix-scan analog; a catch-up of [1000, 2000) opens only the
  *   files overlapping that range.
  * - Checkpointed offsets give exact SSE-style resumption
  *   (Last-Event-ID ⇒ restart at seq_num+1, records.rs:49-65).
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft-stream")
  *   .option("root", store.root).option("basin", b).option("stream", s)
  *   .option("startSeq", "0").load()
  * }}}
  */
class GraftStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-stream"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftStreamSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GraftStreamTable(properties.asScala.toMap)
}

object GraftStreamSource {
  val Schema: StructType = StructType(Seq(
    StructField("seq_num", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("name", BinaryType), StructField("value", BinaryType)))),
      nullable = true),
    StructField("body", BinaryType, nullable = true),
    StructField("metered_size", LongType, nullable = false)))
}

final class GraftStreamTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"graft-stream:${props.getOrElse("basin", "?")}/${props.getOrElse("stream", "?")}"
  override def schema(): StructType = GraftStreamSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftScan(props ++ options.asScala)
}

final class GraftScan(props: Map[String, String]) extends Scan {
  override def readSchema(): StructType = GraftStreamSource.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(
      props("root"), props("basin"), props("stream"),
      props.getOrElse("startseq", props.getOrElse("startSeq", "0")).toLong)
}

/** Offset = the next seq_num to read (exclusive end of what was read). */
final case class GraftOffset(seq: Long) extends Offset {
  override def json(): String = s"""{"seq":$seq}"""
}

final case class GraftInputPartition(path: String, startSeq: Long, endSeq: Long)
    extends InputPartition

final class GraftMicroBatchStream(root: String, basin: String, stream: String,
                                  startSeq: Long) extends MicroBatchStream {

  private val dir = Layout.dataDir(root, basin, stream)

  private def manifest: StreamManifest =
    Layout.readJson[StreamManifest](Layout.statePath(root, basin, stream))
      .getOrElse(StreamManifest())

  override def initialOffset(): Offset = GraftOffset(startSeq)
  override def latestOffset(): Offset = GraftOffset(manifest.tailSeq)
  override def deserializeOffset(json: String): Offset =
    GraftOffset("""\d+""".r.findFirstIn(json).get.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftOffset].seq
    val e = end.asInstanceOf[GraftOffset].seq
    if (e <= s) return Array.empty
    // shared driver-side footer-stats cache (graft.log.FileIndex):
    // catch-up ranges open only the files overlapping [s, e)
    FileIndex.listStats(dir)
      .filter(st => st.maxSeq >= s && st.minSeq < e)
      .map(st => GraftInputPartition(st.path, s, e))
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory
}

final class GraftReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(partition.asInstanceOf[GraftInputPartition])
}

/** Executor-side reader: parquet-mr Group API -> InternalRow, filtered
  * to the [startSeq, endSeq) offset range.
  */
final class GraftPartitionReader(part: GraftInputPartition)
    extends PartitionReader[InternalRow] {

  private val reader = org.apache.parquet.hadoop.ParquetReader
    .builder(new GroupReadSupport(), new Path(part.path))
    .withConf(new Configuration())
    .build()
  private var current: InternalRow = _

  override def next(): Boolean = {
    var g = reader.read()
    while (g != null) {
      val seq = g.getLong("seq_num", 0)
      if (seq >= part.startSeq && seq < part.endSeq) {
        val headers =
          if (g.getFieldRepetitionCount("headers") == 0) null
          else {
            val hg = g.getGroup("headers", 0)
            val n = hg.getFieldRepetitionCount("list")
            new GenericArrayData((0 until n).map { i =>
              val el = hg.getGroup("list", i).getGroup("element", 0)
              val name = if (el.getFieldRepetitionCount("name") > 0)
                el.getBinary("name", 0).getBytes else null
              val value = if (el.getFieldRepetitionCount("value") > 0)
                el.getBinary("value", 0).getBytes else null
              new GenericInternalRow(Array[Any](name, value)): Any
            }.toArray)
          }
        val body = if (g.getFieldRepetitionCount("body") > 0)
          g.getBinary("body", 0).getBytes else null
        current = new GenericInternalRow(Array[Any](
          seq, g.getLong("timestamp", 0), headers, body,
          g.getLong("metered_size", 0)))
        return true
      }
      g = reader.read()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
