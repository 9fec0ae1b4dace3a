package graft.log

import org.scalatest.funsuite.AnyFunSuite

/** The plaintext EnvelopeRecord wire codec — the exact bytes sealed by
  * A13 envelope encryption (reference storage/src/record/codec.rs:
  * 139-343: flag byte packing width fields, big-endian minimal-width
  * lengths, body = remainder).
  */
class EnvelopeCodecSpec extends AnyFunSuite {

  private def bytes(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + seed) & 0xFF).toByte)

  test("no headers: flag byte 0x00, body is the remainder (codec.rs:139-143)") {
    val enc = EnvelopeCodec.encode(Nil, "hello".getBytes)
    assert(enc(0) == 0x00)
    assert(new String(enc.drop(1)) == "hello")
    val (hs, body) = EnvelopeCodec.decode(enc)
    assert(hs.isEmpty && new String(body) == "hello")
  }

  test("flag byte packs widths: count byte in bits 5..4, name-1 in 3..2, " +
    "value-1 in 1..0 (codec.rs:150-172)") {
    // one header, short name/value -> widths all 1: flag = 0b01_00_00 | 0 | 0
    val enc = EnvelopeCodec.encode(Seq(("k".getBytes, "v".getBytes)), "b".getBytes)
    assert(enc(0) == 0x10)
    // a 300-byte value forces value width 2: flag = 0b01_00_01
    val enc2 = EnvelopeCodec.encode(
      Seq(("k".getBytes, bytes(300, 1))), Array.emptyByteArray)
    assert(enc2(0) == 0x11)
    // 300 headers force count width 2: flag bits 5..4 = 2
    val many = (0 until 300).map(i => (s"h$i".getBytes, "x".getBytes))
    val enc3 = EnvelopeCodec.encode(many, Array.emptyByteArray)
    assert(((enc3(0) >> 4) & 0x3) == 2)
  }

  test("explicit layout: 1 header (name 'ab', value 'xyz'), body 'B'") {
    val enc = EnvelopeCodec.encode(Seq(("ab".getBytes, "xyz".getBytes)), "B".getBytes)
    // flag 0x10, count=1, nameLen=2, 'ab', valLen=3, 'xyz', 'B'
    assert(enc.toSeq == Seq[Byte](0x10, 1, 2, 'a', 'b', 3, 'x', 'y', 'z', 'B'))
  }

  test("round-trip matrix: header counts x name/value lengths x body sizes " +
    "(including the width boundaries 255/256, 65535/65536)") {
    val lens = Seq(0, 1, 7, 255, 256, 300, 65535, 65536)
    val rnd = new scala.util.Random(42)
    val cases: Seq[(Seq[(Array[Byte], Array[Byte])], Array[Byte])] =
      (for {
        hCount <- Seq(0, 1, 2, 5, 17)
        nameLen <- Seq(0, 1, 30)
        valLen <- lens.take(6)
      } yield {
        val hs = (0 until hCount).map(i =>
          (bytes(nameLen, i), bytes(valLen, i + 100)))
        (hs, bytes(rnd.nextInt(2000), rnd.nextInt(255)))
      }) ++ Seq(
        // big single values exercise 3-byte length widths
        (Seq((bytes(2, 1), bytes(65536, 2))), bytes(5, 3)),
        (Seq((bytes(1, 1), Array.emptyByteArray)), Array.emptyByteArray))
    cases.foreach { case (hs, b) =>
      val (hs2, b2) = EnvelopeCodec.decode(EnvelopeCodec.encode(hs, b))
      assert(hs2.size == hs.size)
      hs.zip(hs2).foreach { case ((n1, v1), (n2, v2)) =>
        assert(java.util.Arrays.equals(n1, n2))
        assert(java.util.Arrays.equals(v1, v2))
      }
      assert(java.util.Arrays.equals(b, b2))
    }
  }

  test("canonical: encode(decode(x)) == x for encoded forms") {
    val cases = Seq(
      EnvelopeCodec.encode(Nil, bytes(100, 3)),
      EnvelopeCodec.encode(Seq(("n".getBytes, bytes(70000, 1))), bytes(10, 2)),
      EnvelopeCodec.encode((0 until 260).map(i => (s"h$i".getBytes, "".getBytes)),
        Array.emptyByteArray))
    cases.foreach { enc =>
      val (h, b) = EnvelopeCodec.decode(enc)
      assert(java.util.Arrays.equals(EnvelopeCodec.encode(h, b), enc))
    }
  }

  test("truncated encodings throw, never return garbage") {
    val enc = EnvelopeCodec.encode(
      Seq(("name".getBytes, "value".getBytes)), "body".getBytes)
    // cutting inside the header region must throw; cutting inside the
    // body region just shortens the body (the body has no length field)
    val headerRegion = 1 + 1 + 1 + 4 + 1 + 5
    (1 until headerRegion).foreach { cut =>
      intercept[IllegalArgumentException] {
        EnvelopeCodec.decode(enc.take(cut))
      }
    }
    // reserved flag bits rejected (codec.rs:176-178)
    intercept[IllegalArgumentException] {
      EnvelopeCodec.decode(Array[Byte](0x40, 1))
    }
  }

  test("A13 null-body pin: on an encrypted basin a NULL body seals as " +
    "the empty envelope body and reads back EMPTY, not null — the " +
    "reference body is Bytes (never null), so the distinction " +
    "collapses by design") {
    val enc = EnvelopeCodec.encode(Seq(("h".getBytes, "v".getBytes)), null)
    val (hs, body) = EnvelopeCodec.decode(enc)
    assert(hs.size == 1 && body.length == 0)
  }

  test("decryptToRow restores headers + body through a real cipher") {
    val key = Array.fill(32)(0x5A.toByte)
    val aad = RecordCipher.aad("b", "s")
    val spec = CipherSpec(CipherAlgo.Aes256Gcm, key)
    val hs = Seq(("h1".getBytes, "v1".getBytes), ("h2".getBytes, bytes(40, 9)))
    val sealedRec = RecordCipher.encryptEnvelope(spec, aad, hs, "payload".getBytes)
    val row = EnvelopeCodec.decryptToRow(key, aad, sealedRec)
    val arr = row.getArray(0)
    assert(arr.numElements() == 2)
    assert(new String(arr.getStruct(0, 2).getBinary(0)) == "h1")
    assert(new String(arr.getStruct(1, 2).getBinary(1).take(1)) != "")
    assert(new String(row.getBinary(1)) == "payload")
  }
}
