package graft.log

import graft.model._

/** Hand-written protobuf (proto3) wire codec for the records-API
  * message set — the reference's prost-generated `s2.v1` protocol
  * (api/src/v1/stream/proto/s2.v1.rs): StreamPosition, Header,
  * AppendRecord, AppendInput, AppendAck, SequencedRecord, ReadBatch.
  * Implemented from the PUBLIC protobuf encoding specification
  * (varints; tag = field<<3 | wire-type; wire-type 0 = varint,
  * 2 = length-delimited) — no generated code, no proto runtime.
  *
  * Presence semantics match prost/proto3 exactly:
  *  - plain `uint64`/`bytes` fields (implicit presence) are OMITTED
  *    on the wire when zero/empty and default to zero/empty on read;
  *  - `optional` fields (explicit presence: AppendRecord.timestamp,
  *    AppendInput.match_seq_num/fencing_token) are written whenever
  *    Some — including Some(0) — and absent means None;
  *  - message fields are written when present (AppendAck always
  *    carries all three positions, ReadBatch.tail only when known);
  *  - unknown fields are skipped (forward compatibility), as prost
  *    does for messages without `#[prost(unknown_fields)]`.
  *
  * These payloads ride in two places, exactly as in the reference:
  * unary record routes negotiated by `application/protobuf` /
  * `application/x-protobuf` Content-Type/Accept (api/src/mime.rs:41-46,
  * extract.rs:95-121), and S2S framed sessions under the `s2s/proto`
  * content type (extract.rs:54-93), where regular frames carry
  * AppendInput (client->server), AppendAck or ReadBatch
  * (server->client), and terminal frames stay 2-byte-status + JSON.
  */
object ProtoCodec {

  val ContentType = "application/protobuf"

  /** True iff the mime names the protobuf unary encoding
    * (is_protobuf, api/src/mime.rs:41-46): `application/protobuf` or
    * `application/x-protobuf`, parameters ignored, first entry only —
    * mirroring mime::parse taking the first comma-separated type. */
  def isProtoMime(header: Option[String]): Boolean =
    header.map(_.split(',')(0).split(';')(0).trim.toLowerCase).exists(m =>
      m == "application/protobuf" || m == "application/x-protobuf")

  final case class MalformedProto(msg: String)
    extends RuntimeException(msg)

  // -------------------------------------------------------------------
  // Wire primitives
  // -------------------------------------------------------------------

  private final class Writer(sizeHint: Int = 64) {
    private var buf = new Array[Byte](math.max(sizeHint, 16))
    private var n = 0
    private def ensure(k: Int): Unit =
      if (n + k > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, n + k))
    def varint(v0: Long): Unit = {
      ensure(10)
      var v = v0
      while ((v & ~0x7fL) != 0) {
        buf(n) = ((v & 0x7f) | 0x80).toByte; n += 1
        v >>>= 7
      }
      buf(n) = v.toByte; n += 1
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, 2); varint(b.length)
      ensure(b.length)
      System.arraycopy(b, 0, buf, n, b.length); n += b.length
    }
    /** Nested message: written via a child Writer (messages here are
      * small — a frame is capped at 2 MiB — so the copy is cheap and
      * keeps the encoder single-pass without a size-precompute). */
    def msgField(field: Int, child: Writer): Unit =
      bytesField(field, child.result())
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  private final class Reader(buf: Array[Byte], from: Int, to: Int) {
    private var p = from
    def hasNext: Boolean = p < to
    def varint(): Long = {
      var shift = 0
      var v = 0L
      while (true) {
        if (p >= to) throw MalformedProto("truncated varint")
        val b = buf(p); p += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        if (shift >= 64) throw MalformedProto("varint overruns 64 bits")
      }
      v // unreachable
    }
    /** Returns (fieldNumber, wireType). */
    def tag(): (Int, Int) = {
      val t = varint()
      val field = (t >>> 3).toInt
      if (field == 0) throw MalformedProto("field number 0")
      (field, (t & 7).toInt)
    }
    def lenDelim(): (Int, Int) = {
      val len = varint()
      if (len < 0 || len > to - p) throw MalformedProto("truncated length-delimited field")
      val off = p; p += len.toInt
      (off, len.toInt)
    }
    def bytes(): Array[Byte] = {
      val (off, len) = lenDelim()
      java.util.Arrays.copyOfRange(buf, off, off + len)
    }
    def subReader(): Reader = {
      val (off, len) = lenDelim()
      new Reader(buf, off, off + len)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => if (to - p < 8) throw MalformedProto("truncated fixed64") else p += 8
      case 2 => lenDelim(); ()
      case 5 => if (to - p < 4) throw MalformedProto("truncated fixed32") else p += 4
      case w => throw MalformedProto(s"unsupported wire type $w")
    }
  }

  private def reader(b: Array[Byte]) = new Reader(b, 0, b.length)

  // -------------------------------------------------------------------
  // StreamPosition { uint64 seq_num = 1; uint64 timestamp = 2; }
  // -------------------------------------------------------------------

  private def writePosition(p: StreamPosition): Writer = {
    val w = new Writer(24)
    if (p.seqNum != 0) { w.tag(1, 0); w.varint(p.seqNum) }
    if (p.timestamp != 0) { w.tag(2, 0); w.varint(p.timestamp) }
    w
  }

  private def readPosition(r: Reader): StreamPosition = {
    var seq = 0L; var ts = 0L
    while (r.hasNext) r.tag() match {
      case (1, 0) => seq = r.varint()
      case (2, 0) => ts = r.varint()
      case (_, w) => r.skip(w)
    }
    StreamPosition(seq, ts)
  }

  // -------------------------------------------------------------------
  // Header { bytes name = 1; bytes value = 2; }
  // -------------------------------------------------------------------

  private def writeHeader(h: Header): Writer = {
    val w = new Writer(h.name.length + h.value.length + 8)
    if (h.name.nonEmpty) w.bytesField(1, h.name)
    if (h.value.nonEmpty) w.bytesField(2, h.value)
    w
  }

  private def readHeader(r: Reader): Header = {
    var name = Array.emptyByteArray
    var value = Array.emptyByteArray
    while (r.hasNext) r.tag() match {
      case (1, 2) => name = r.bytes()
      case (2, 2) => value = r.bytes()
      case (_, w) => r.skip(w)
    }
    Header(name, value)
  }

  // -------------------------------------------------------------------
  // AppendRecord { optional uint64 timestamp = 1;
  //                repeated Header headers = 2; bytes body = 3; }
  // -------------------------------------------------------------------

  private def writeAppendRecord(rec: EnvelopeRecord,
                                ts: Option[Long]): Writer = {
    val w = new Writer(rec.body.length + 32)
    ts.foreach { t => w.tag(1, 0); w.varint(t) }
    rec.headers.foreach(h => w.msgField(2, writeHeader(h)))
    if (rec.body.nonEmpty) w.bytesField(3, rec.body)
    w
  }

  private def readAppendRecord(r: Reader): (EnvelopeRecord, Option[Long]) = {
    var ts: Option[Long] = None
    val headers = Seq.newBuilder[Header]
    var body = Array.emptyByteArray
    while (r.hasNext) r.tag() match {
      case (1, 0) => ts = Some(r.varint())
      case (2, 2) => headers += readHeader(r.subReader())
      case (3, 2) => body = r.bytes()
      case (_, w) => r.skip(w)
    }
    (EnvelopeRecord(headers.result(), body), ts)
  }

  // -------------------------------------------------------------------
  // AppendInput { repeated AppendRecord records = 1;
  //               optional uint64 match_seq_num = 2;
  //               optional string fencing_token = 3; }
  // -------------------------------------------------------------------

  def encodeAppendInput(in: AppendInput): Array[Byte] = {
    val w = new Writer(256)
    val ts = in.clientTimestamps
    in.records.zipWithIndex.foreach { case (rec, i) =>
      val env = rec match {
        case e: EnvelopeRecord => e
        case c: CommandRecord => c.toEnvelopeForm
      }
      w.msgField(1, writeAppendRecord(env, if (i < ts.size) ts(i) else None))
    }
    in.matchSeqNum.foreach { m => w.tag(2, 0); w.varint(m) }
    in.fencingToken.foreach(t => w.bytesField(3, t.getBytes("UTF-8")))
    w.result()
  }

  /** Records decode to their envelope form; command detection (the
    * empty-header-name convention) happens downstream exactly as on
    * the JSON path — the proto→model conversion mirrors
    * api/src/v1/stream/proto/mod.rs:24-69. */
  def decodeAppendInput(bytes: Array[Byte]): AppendInput = {
    val r = reader(bytes)
    val recs = Seq.newBuilder[(EnvelopeRecord, Option[Long])]
    var matchSeq: Option[Long] = None
    var fencing: Option[String] = None
    while (r.hasNext) r.tag() match {
      case (1, 2) => recs += readAppendRecord(r.subReader())
      case (2, 0) => matchSeq = Some(r.varint())
      case (3, 2) => fencing = Some(new String(r.bytes(), "UTF-8"))
      case (_, w) => r.skip(w)
    }
    val parsed = recs.result()
    AppendInput(parsed.map(_._1), matchSeq, fencing, parsed.map(_._2))
  }

  // -------------------------------------------------------------------
  // AppendAck { StreamPosition start = 1; end = 2; tail = 3; }
  // (prost message fields are Option; the reference always sets all
  // three, proto/mod.rs:71-82.)
  // -------------------------------------------------------------------

  def encodeAppendAck(ack: AppendAck): Array[Byte] = {
    val w = new Writer(64)
    w.msgField(1, writePosition(ack.start))
    w.msgField(2, writePosition(ack.end))
    w.msgField(3, writePosition(ack.tail))
    w.result()
  }

  def decodeAppendAck(bytes: Array[Byte]): AppendAck = {
    val r = reader(bytes)
    val zero = StreamPosition(0, 0)
    var start = zero; var end = zero; var tail = zero
    while (r.hasNext) r.tag() match {
      case (1, 2) => start = readPosition(r.subReader())
      case (2, 2) => end = readPosition(r.subReader())
      case (3, 2) => tail = readPosition(r.subReader())
      case (_, w) => r.skip(w)
    }
    AppendAck(start, end, tail)
  }

  // -------------------------------------------------------------------
  // SequencedRecord { uint64 seq_num = 1; uint64 timestamp = 2;
  //                   repeated Header headers = 3; bytes body = 4; }
  // ReadBatch { repeated SequencedRecord records = 1;
  //             optional StreamPosition tail = 2; }
  // -------------------------------------------------------------------

  private def writeSequenced(rec: SequencedRecord): Writer = {
    val w = new Writer(rec.body.length + 48)
    if (rec.seqNum != 0) { w.tag(1, 0); w.varint(rec.seqNum) }
    if (rec.timestamp != 0) { w.tag(2, 0); w.varint(rec.timestamp) }
    rec.headers.foreach(h => w.msgField(3, writeHeader(h)))
    if (rec.body.nonEmpty) w.bytesField(4, rec.body)
    w
  }

  private def readSequenced(r: Reader): SequencedRecord = {
    var seq = 0L; var ts = 0L
    val headers = Seq.newBuilder[Header]
    var body = Array.emptyByteArray
    while (r.hasNext) r.tag() match {
      case (1, 0) => seq = r.varint()
      case (2, 0) => ts = r.varint()
      case (3, 2) => headers += readHeader(r.subReader())
      case (4, 2) => body = r.bytes()
      case (_, w) => r.skip(w)
    }
    SequencedRecord(StreamPosition(seq, ts), headers.result(), body)
  }

  def encodeReadBatch(records: Seq[SequencedRecord],
                      tail: Option[StreamPosition]): Array[Byte] = {
    val w = new Writer(records.iterator.map(_.body.length + 64).sum + 32)
    records.foreach(rec => w.msgField(1, writeSequenced(rec)))
    tail.foreach(t => w.msgField(2, writePosition(t)))
    w.result()
  }

  def decodeReadBatch(bytes: Array[Byte])
      : (Seq[SequencedRecord], Option[StreamPosition]) = {
    val r = reader(bytes)
    val records = Seq.newBuilder[SequencedRecord]
    var tail: Option[StreamPosition] = None
    while (r.hasNext) r.tag() match {
      case (1, 2) => records += readSequenced(r.subReader())
      case (2, 2) => tail = Some(readPosition(r.subReader()))
      case (_, w) => r.skip(w)
    }
    (records.result(), tail)
  }
}
