package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's inline unit matrices (SURVEY §5):
  * metered-size formula, command payload edges, caps, read-limit
  * arithmetic, config merge/patch.
  */
class ModelSpec extends AnyFunSuite {

  test("metered size formula for envelopes (envelope.rs:74-78)") {
    // 8 + 2*#headers + sum(name+value bytes) + body bytes
    val r = EnvelopeRecord(
      Seq(Header.utf8("user_id", "42"), Header.utf8("k", "vv")),
      "hello".getBytes)
    assert(r.meteredSize == 8 + 2 * 2 + (7 + 2) + (1 + 2) + 5)
  }

  test("metered size for empty record is 8") {
    assert(EnvelopeRecord(Nil, Array.emptyByteArray).meteredSize == 8)
  }

  test("metered size property: additive in headers and body (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val hs = Seq.fill(rnd.nextInt(5))(
        (rnd.alphanumeric.take(1 + rnd.nextInt(10)).mkString,
         rnd.alphanumeric.take(rnd.nextInt(20)).mkString))
      val body = rnd.alphanumeric.take(rnd.nextInt(100)).mkString
      val r = EnvelopeRecord(hs.map { case (n, v) => Header.utf8(n, v) },
        body.getBytes("UTF-8"))
      val expected = 8L + hs.map { case (n, v) => 2L + n.length + v.length }.sum +
        body.getBytes("UTF-8").length
      assert(r.meteredSize == expected)
    }
  }

  test("command metered size (command.rs:54-63)") {
    assert(FenceCommand("tok").meteredSize == 8 + 2 + 5 + 3)
    assert(TrimCommand(7).meteredSize == 8 + 2 + 4 + 8)
  }

  test("command envelope round-trip (record/mod.rs:89-103)") {
    for (c <- Seq[CommandRecord](FenceCommand(""), FenceCommand("a" * 36),
                                 TrimCommand(0), TrimCommand(Long.MaxValue))) {
      assert(CommandRecord.fromEnvelopeForm(c.toEnvelopeForm).contains(c))
    }
  }

  test("fence token caps: 36 ok, 37 rejected (fencing.rs:7)") {
    assert(Caps.validFencingToken("x" * 36))
    assert(!Caps.validFencingToken("x" * 37))
    assertThrows[IllegalArgumentException](FenceCommand("x" * 37))
  }

  test("trim payload must be exactly 8 bytes") {
    val bad = EnvelopeRecord(
      Seq(Header(Array.emptyByteArray, "trim".getBytes)), Array[Byte](1, 2, 3))
    assert(CommandRecord.fromEnvelopeForm(bad).isEmpty)
  }

  test("validateBatch rejects empty header names outside well-formed " +
    "command shape (envelope.rs:128-129 NameEmpty, mod.rs:94 UnknownCommand)") {
    // a USER record wearing an empty header name would be misclassified
    // by shape-based dispatch (encrypted-basin cleartext, ignoreCommands
    // drop) — the reference makes it unrepresentable at validation
    def bad(e: EnvelopeRecord) =
      Caps.validateBatch(Seq(e)).isLeft
    assert(bad(EnvelopeRecord(
      Seq(Header(Array.emptyByteArray, "not-an-op".getBytes)), "x".getBytes)))
    assert(bad(EnvelopeRecord(
      Seq(Header.utf8("a", "b"), Header(Array.emptyByteArray, "v".getBytes)),
      "x".getBytes)))
    assert(bad(EnvelopeRecord(
      Seq(Header(Array.emptyByteArray, "trim".getBytes)), Array[Byte](1, 2, 3))))
    // well-formed commands in envelope form still pass
    assert(Caps.validateBatch(Seq(TrimCommand(5L).toEnvelopeForm)).isRight)
    assert(Caps.validateBatch(Seq(FenceCommand("tok").toEnvelopeForm)).isRight)
    // and normal user records are unaffected
    assert(Caps.validateBatch(Seq(EnvelopeRecord(
      Seq(Header.utf8("a", "b")), "x".getBytes))).isRight)
  }

  test("validateWireShape (bulk path) mirrors the same rules") {
    import graft.log.RecordCipher.validateWireShape
    def h(n: String, v: String) = (n.getBytes("UTF-8"), v.getBytes("UTF-8"))
    assert(validateWireShape(Seq(h("a", "b")), "x".getBytes).isEmpty)
    assert(validateWireShape(null, "x".getBytes).isEmpty)
    assert(validateWireShape(Seq(h("", "trim")),
      java.nio.ByteBuffer.allocate(8).putLong(3L).array()).isEmpty)
    assert(validateWireShape(Seq(h("", "fence")), "tok".getBytes).isEmpty)
    assert(validateWireShape(Seq(h("", "nope")), "x".getBytes).nonEmpty)
    assert(validateWireShape(Seq(h("", "trim")), "123".getBytes).nonEmpty)
    assert(validateWireShape(Seq(h("", "fence")), ("x" * 37).getBytes).nonEmpty)
    assert(validateWireShape(Seq(h("a", "b"), h("", "v")), "x".getBytes).nonEmpty)
  }

  test("non-command envelopes are not detected as commands") {
    val e = EnvelopeRecord(Seq(Header.utf8("a", "b")), "x".getBytes)
    assert(CommandRecord.fromEnvelopeForm(e).isEmpty)
    val twoHeaders = EnvelopeRecord(
      Seq(Header(Array.emptyByteArray, "fence".getBytes), Header.utf8("a", "b")),
      Array.emptyByteArray)
    assert(CommandRecord.fromEnvelopeForm(twoHeaders).isEmpty)
  }

  test("basin name validation (basin.rs:33-71)") {
    assert(Caps.validBasinName("my-basin-01"))
    assert(!Caps.validBasinName("short"))                 // < 8
    assert(!Caps.validBasinName("-leading-hyphen"))
    assert(!Caps.validBasinName("trailing-hyphen-"))
    assert(!Caps.validBasinName("UpperCase-basin"))
    assert(!Caps.validBasinName("a" * 49))
  }

  test("stream name validation (stream.rs:28-47)") {
    assert(Caps.validStreamName("s"))
    assert(Caps.validStreamName("a" * 512))
    assert(!Caps.validStreamName(""))
    assert(!Caps.validStreamName("a" * 513))
    assert(!Caps.validStreamName("."))
    assert(!Caps.validStreamName(".."))
  }

  test("batch caps (caps.rs:10-16, stream.rs:251-269)") {
    val one = EnvelopeRecord(Nil, Array.fill(16)(1: Byte))
    assert(Caps.validateBatch(Nil).isLeft)
    assert(Caps.validateBatch(Seq.fill(1001)(one)).isLeft)
    assert(Caps.validateBatch(Seq.fill(1000)(one)).isRight)
    val big = EnvelopeRecord(Nil, Array.fill(1024 * 1024)(1: Byte)) // 8 over cap
    assert(Caps.validateBatch(Seq(big)).isLeft)
    val exact = EnvelopeRecord(Nil, Array.fill(1024 * 1024 - 8)(1: Byte))
    assert(Caps.validateBatch(Seq(exact)).isRight)
    // two records summing over 1 MiB
    val half = EnvelopeRecord(Nil, Array.fill(600 * 1024)(1: Byte))
    assert(Caps.validateBatch(Seq(half, half)).isLeft)
  }

  test("read-limit admit rule (read_extent.rs:88-108)") {
    // a record is included only if it fits BOTH remaining count and bytes
    val l = ReadLimit(count = Some(2), bytes = Some(100))
    assert(l.admits(0, 0, 60))
    assert(!l.admits(0, 60, 60))   // bytes would exceed
    assert(l.admits(1, 60, 40))    // exact byte fit allowed
    assert(!l.admits(2, 0, 1))     // count exhausted
    assert(ReadLimit().admits(Long.MaxValue - 1, Long.MaxValue / 2, 1))
  }

  test("read-limit: first record larger than byte budget yields nothing") {
    val l = ReadLimit(bytes = Some(10))
    assert(!l.admits(0, 0, 11))
  }

  test("config merge: stream over basin over system (config.rs:260-281)") {
    val basinDefaults = StreamConfig(
      retentionPolicy = Some(RetentionPolicy.Age(3600)),
      timestamping = Some(Timestamping(TimestampingMode.Arrival)))
    val stream = StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))
    val merged = stream.mergedOver(basinDefaults).mergedOver(StreamConfig.SystemDefault)
    assert(merged.retentionPolicy.contains(RetentionPolicy.Infinite))
    assert(merged.timestamping.contains(Timestamping(TimestampingMode.Arrival)))
    assert(merged.storageClass.contains(StorageClass.Express))
  }

  test("config patch tri-state (config.rs:234-258)") {
    val c = StreamConfig(retentionPolicy = Some(RetentionPolicy.Age(60)),
      deleteOnEmpty = Some(DeleteOnEmpty(5)))
    val p = StreamConfigPatch(
      retentionPolicy = Patch.Set(RetentionPolicy.Infinite),
      deleteOnEmpty = Patch.Clear)
    val out = p.applyTo(c)
    assert(out.retentionPolicy.contains(RetentionPolicy.Infinite))
    assert(out.deleteOnEmpty.isEmpty)
    assert(out.storageClass.isEmpty) // Keep
  }

  test("retention default is 7 days (config.rs:78-84)") {
    assert(StreamConfig().retentionOrDefault == RetentionPolicy.Age(7L * 24 * 3600))
  }
}
