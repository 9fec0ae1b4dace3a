package graft.log

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

/** Unit contracts for the hand-written protobuf wire codec
  * (api/src/v1/stream/proto/s2.v1.rs message set, public protobuf
  * encoding spec). The e2e_http_proto oracle proves the negotiated
  * serving behavior; this spec pins the BYTES — golden vectors a
  * prost encoder would emit, proto3 presence semantics, varint
  * edges, and unknown-field tolerance.
  */
class ProtoCodecSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString(" ")

  // -------------------------------------------------------------------
  // Golden vectors (hand-computed from the protobuf wire spec)
  // -------------------------------------------------------------------

  test("golden: AppendAck bytes are exactly what prost would emit") {
    // StreamPosition(5, 1000): 08 05 10 e8 07  (1000 = 0xE8 0x07 varint)
    // AppendAck{start=(5,1000), end=(7,1001), tail=(7,1001)}:
    //   field 1 msg: 0a 05 <pos>, field 2: 12 05, field 3: 1a 05
    val ack = AppendAck(
      StreamPosition(5, 1000), StreamPosition(7, 1001), StreamPosition(7, 1001))
    val expected = "0a 05 08 05 10 e8 07 " +
      "12 05 08 07 10 e9 07 " +
      "1a 05 08 07 10 e9 07"
    assert(hex(ProtoCodec.encodeAppendAck(ack)) == expected)
    assert(ProtoCodec.decodeAppendAck(ProtoCodec.encodeAppendAck(ack)) == ack)
  }

  test("golden: AppendInput with one bare-body record") {
    // AppendRecord{body="hi"}: 1a 02 68 69 (field 3 bytes)
    // AppendInput{records=[rec]}: 0a 04 1a 02 68 69
    val in = AppendInput(Seq(EnvelopeRecord(Nil, "hi".getBytes("UTF-8"))),
      clientTimestamps = Seq(None))
    assert(hex(ProtoCodec.encodeAppendInput(in)) == "0a 04 1a 02 68 69")
  }

  test("golden: zero-valued plain uint64 fields are omitted (proto3 implicit presence)") {
    // seq_num=0, timestamp=0 -> empty position messages; the ack still
    // writes the three (empty) message fields like prost's
    // Some(default) does: 0a 00 12 00 1a 00
    val ack = AppendAck(StreamPosition(0, 0), StreamPosition(0, 0), StreamPosition(0, 0))
    assert(hex(ProtoCodec.encodeAppendAck(ack)) == "0a 00 12 00 1a 00")
    assert(ProtoCodec.decodeAppendAck(ProtoCodec.encodeAppendAck(ack)) == ack)
  }

  test("golden: optional fields have explicit presence — Some(0) IS encoded") {
    // match_seq_num = Some(0): field 2 varint 0 -> 10 00 present on
    // the wire (this is the CAS-on-empty-stream case: absent and zero
    // MUST be distinguishable)
    val in = AppendInput(Seq(EnvelopeRecord(Nil, "x".getBytes("UTF-8"))),
      matchSeqNum = Some(0L), clientTimestamps = Seq(None))
    val wire = ProtoCodec.encodeAppendInput(in)
    assert(hex(wire) == "0a 03 1a 01 78 10 00")
    val back = ProtoCodec.decodeAppendInput(wire)
    assert(back.matchSeqNum.contains(0L))
    val without = ProtoCodec.decodeAppendInput(
      ProtoCodec.encodeAppendInput(in.copy(matchSeqNum = None)))
    assert(without.matchSeqNum.isEmpty)
  }

  test("golden: record timestamp optionality (Some(0) vs None) survives the wire") {
    val some0 = AppendInput(Seq(EnvelopeRecord(Nil, "x".getBytes("UTF-8"))),
      clientTimestamps = Seq(Some(0L)))
    val decoded = ProtoCodec.decodeAppendInput(ProtoCodec.encodeAppendInput(some0))
    assert(decoded.clientTimestamps == Seq(Some(0L)))
    val none = ProtoCodec.decodeAppendInput(ProtoCodec.encodeAppendInput(
      some0.copy(clientTimestamps = Seq(None))))
    assert(none.clientTimestamps == Seq(None))
  }

  test("varint edges: u64 max (-1L) is ten 0xff..0x01 bytes; Long.MaxValue round-trips") {
    val in = AppendInput(Seq(EnvelopeRecord(Nil, Array.emptyByteArray)),
      matchSeqNum = Some(-1L), clientTimestamps = Seq(None))
    val wire = ProtoCodec.encodeAppendInput(in)
    // record: 0a 00; match_seq_num: 10 ff ff ff ff ff ff ff ff ff 01
    assert(hex(wire) == "0a 00 10 ff ff ff ff ff ff ff ff ff 01")
    assert(ProtoCodec.decodeAppendInput(wire).matchSeqNum.contains(-1L))
    val big = in.copy(matchSeqNum = Some(Long.MaxValue))
    assert(ProtoCodec.decodeAppendInput(ProtoCodec.encodeAppendInput(big))
      .matchSeqNum.contains(Long.MaxValue))
  }

  // -------------------------------------------------------------------
  // Structural round-trips
  // -------------------------------------------------------------------

  test("full AppendInput round-trip: headers (incl. command form), bodies, fencing token") {
    val records: Seq[Record] = Seq(
      EnvelopeRecord(
        Seq(Header.utf8("k", "v"), Header.utf8("k", "v2"), // repeats preserved
          Header(Array.emptyByteArray, "fence".getBytes("UTF-8"))),
        Array[Byte](0, 1, 2, -1, 127)),
      EnvelopeRecord(Nil, Array.emptyByteArray))
    val in = AppendInput(records, matchSeqNum = Some(42L),
      fencingToken = Some("tok-1"), clientTimestamps = Seq(Some(123L), None))
    val back = ProtoCodec.decodeAppendInput(ProtoCodec.encodeAppendInput(in))
    // EnvelopeRecord bodies are Array[Byte] (reference equality), so
    // compare field-wise
    assert(back.matchSeqNum == in.matchSeqNum)
    assert(back.fencingToken == in.fencingToken)
    assert(back.clientTimestamps == in.clientTimestamps)
    val bEnvs = back.records.map(_.asInstanceOf[EnvelopeRecord])
    val iEnvs = records.map(_.asInstanceOf[EnvelopeRecord])
    assert(bEnvs.map(_.headers) == iEnvs.map(_.headers)) // Header overrides equals
    assert(bEnvs.map(_.body.toSeq) == iEnvs.map(_.body.toSeq))
    // the empty-name header decodes intact so downstream command
    // detection sees exactly what the JSON path sees
    val env = bEnvs.head
    assert(env.headers(2).name.isEmpty &&
      new String(env.headers(2).value, "UTF-8") == "fence")
  }

  test("command records encode via their envelope form") {
    val in = AppendInput(Seq(TrimCommand(7L)), clientTimestamps = Seq(None))
    val back = ProtoCodec.decodeAppendInput(ProtoCodec.encodeAppendInput(in))
    val env = back.records.head.asInstanceOf[EnvelopeRecord]
    assert(CommandRecord.fromEnvelopeForm(env).contains(TrimCommand(7L)))
  }

  test("ReadBatch round-trip: records with positions, optional tail") {
    val records = Seq(
      SequencedRecord(StreamPosition(0, 0), Nil, "first".getBytes("UTF-8")),
      SequencedRecord(StreamPosition(1, 999),
        Seq(Header.utf8("a", "b")), Array.emptyByteArray))
    val tail = Some(StreamPosition(2, 999))
    val (recs, t) = ProtoCodec.decodeReadBatch(
      ProtoCodec.encodeReadBatch(records, tail))
    assert(t == tail)
    assert(recs.map(_.position) == records.map(_.position))
    assert(recs.map(r => new String(r.body, "UTF-8")) == Seq("first", ""))
    assert(recs(1).headers == Seq(Header.utf8("a", "b")))
    // heartbeat shape: no records, tail only
    val (empty, hb) = ProtoCodec.decodeReadBatch(
      ProtoCodec.encodeReadBatch(Nil, tail))
    assert(empty.isEmpty && hb == tail)
    // absent tail decodes None (catch-up batches from the past)
    val (_, none) = ProtoCodec.decodeReadBatch(
      ProtoCodec.encodeReadBatch(records, None))
    assert(none.isEmpty)
  }

  // -------------------------------------------------------------------
  // Robustness
  // -------------------------------------------------------------------

  test("unknown fields are skipped (forward compatibility), varint and len-delimited") {
    // ReadBatch with tail + two foreign fields: field 15 varint
    // (78 2a) and field 14 len-delim (72 03 61 62 63)
    val base = ProtoCodec.encodeReadBatch(Nil, Some(StreamPosition(3, 4)))
    val extended = base ++ Array[Byte](0x78, 0x2a) ++
      Array[Byte](0x72, 0x03, 0x61, 0x62, 0x63)
    val (recs, tail) = ProtoCodec.decodeReadBatch(extended)
    assert(recs.isEmpty && tail.contains(StreamPosition(3, 4)))
  }

  test("malformed input throws MalformedProto, never returns garbage") {
    // truncated varint (continuation bit set at EOF)
    intercept[ProtoCodec.MalformedProto] {
      ProtoCodec.decodeAppendInput(Array[Byte](0x10, 0xff.toByte))
    }
    // length-delimited field overrunning the buffer
    intercept[ProtoCodec.MalformedProto] {
      ProtoCodec.decodeAppendInput(Array[Byte](0x0a, 0x7f, 0x00))
    }
    // varint wider than 64 bits
    intercept[ProtoCodec.MalformedProto] {
      ProtoCodec.decodeAppendInput(
        Array.fill[Byte](11)(0xff.toByte).updated(0, 0x10.toByte))
    }
  }

  test("isProtoMime matches the reference's is_protobuf, first mime only") {
    import ProtoCodec.isProtoMime
    assert(isProtoMime(Some("application/protobuf")))
    assert(isProtoMime(Some("application/x-protobuf")))
    assert(isProtoMime(Some("Application/Protobuf; charset=x")))
    assert(isProtoMime(Some(" application/protobuf , application/json")))
    assert(!isProtoMime(Some("application/json, application/protobuf")))
    assert(!isProtoMime(Some("application/json")))
    assert(!isProtoMime(Some("s2s/proto")))
    assert(!isProtoMime(None))
  }
}
