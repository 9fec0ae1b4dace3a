package graft.model

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property suites for the arithmetic the reference
  * proptests (SURVEY §5): metered size (envelope.rs:74-78,
  * command.rs:192-199), read-limit admission (read_extent.rs:88-136),
  * config merge/patch (config.rs:234-258), batcher invariants
  * (batching.rs:186-266). Fixed-point unit matrices can't catch
  * boundary arithmetic the way randomized cases do.
  */
/** Pure-model properties are cheap — run them densely. */
trait DenseProps { self: Properties =>
  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(1000)
}

object PropGens {
  val bytesGen: Gen[Array[Byte]] =
    Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  val headerGen: Gen[Header] =
    for { n <- bytesGen; v <- bytesGen } yield Header(n, v)

  val envelopeGen: Gen[EnvelopeRecord] =
    for {
      hs <- Gen.choose(0, 5).flatMap(k => Gen.listOfN(k, headerGen))
      b <- bytesGen
    } yield EnvelopeRecord(hs, b)

  val commandGen: Gen[CommandRecord] = Gen.oneOf(
    Gen.alphaNumStr.map(s => FenceCommand(s.take(Caps.MaxFencingTokenBytes))),
    Gen.choose(0L, Long.MaxValue).map(TrimCommand(_)))

  val recordGen: Gen[Record] = Gen.frequency(9 -> envelopeGen, 1 -> commandGen)

  val streamConfigGen: Gen[StreamConfig] =
    for {
      sc <- Gen.option(Gen.oneOf(StorageClass.Standard, StorageClass.Express))
      rp <- Gen.option(Gen.oneOf(
        Gen.const(RetentionPolicy.Infinite),
        Gen.choose(0L, 1L << 40).map(RetentionPolicy.Age(_))))
      ts <- Gen.option(for {
        m <- Gen.oneOf(TimestampingMode.ClientPrefer,
          TimestampingMode.ClientRequire, TimestampingMode.Arrival)
        u <- Gen.oneOf(true, false)
      } yield Timestamping(m, u))
      doe <- Gen.option(Gen.choose(0L, 1L << 32).map(DeleteOnEmpty(_)))
    } yield StreamConfig(sc, rp, ts, doe)

  def patchOf[T](g: Gen[T]): Gen[Patch[T]] = Gen.frequency(
    2 -> Gen.const(Patch.Keep), 1 -> Gen.const(Patch.Clear),
    2 -> g.map(Patch.Set(_)))

  val streamPatchGen: Gen[StreamConfigPatch] =
    for {
      sc <- patchOf(Gen.oneOf(StorageClass.Standard, StorageClass.Express))
      rp <- patchOf(Gen.oneOf[RetentionPolicy](
        RetentionPolicy.Infinite, RetentionPolicy.Age(60)))
      ts <- patchOf(Gen.const(Timestamping(TimestampingMode.Arrival, true)))
      doe <- patchOf(Gen.choose(0L, 1000L).map(DeleteOnEmpty(_)))
    } yield StreamConfigPatch(sc, rp, ts, doe)
}

/** Metered-size formula: envelope.rs:74-78 / command.rs:54-63. */
object MeteredSizePropSpec extends Properties("MeteredSize") with DenseProps {
  import PropGens._

  property("envelope = 8 + 2*#headers + sum(name+value) + body") =
    forAll(envelopeGen) { e =>
      e.meteredSize == 8L + 2L * e.headers.size +
        e.headers.map(h => h.name.length.toLong + h.value.length).sum +
        e.body.length
    }

  property("command metered size survives the envelope wire form") =
    forAll(commandGen) { c => c.meteredSize == c.toEnvelopeForm.meteredSize }

  property("command envelope-form round-trips (record/mod.rs:89-103)") =
    forAll(commandGen) { c =>
      CommandRecord.fromEnvelopeForm(c.toEnvelopeForm).contains(c)
    }

  property("an envelope with >1 header or nonempty first name is never a command") =
    forAll(envelopeGen) { e =>
      val looksLikeCommand =
        e.headers.size == 1 && e.headers.head.name.isEmpty
      looksLikeCommand || CommandRecord.fromEnvelopeForm(e).isEmpty
    }
}

/** Read-limit admission: a record is included iff it fits BOTH
  * remaining budgets (read_extent.rs:88-136).
  */
object ReadLimitPropSpec extends Properties("ReadLimit") with DenseProps {
  val limitGen: Gen[ReadLimit] = for {
    c <- Gen.option(Gen.choose(0L, 40L))
    b <- Gen.option(Gen.choose(0L, 4000L))
  } yield ReadLimit(c, b)

  val sizesGen: Gen[List[Long]] =
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, Gen.choose(1L, 200L)))

  private def admitted(l: ReadLimit, sizes: List[Long]): List[Long] = {
    var n = 0L; var b = 0L
    sizes.takeWhile { s =>
      val ok = l.admits(n, b, s)
      if (ok) { n += 1; b += s }
      ok
    }
  }

  property("admitted prefix respects both budgets exactly") =
    forAll(limitGen, sizesGen) { (l, sizes) =>
      val a = admitted(l, sizes)
      l.count.forall(a.size <= _) && l.bytes.forall(a.sum <= _)
    }

  property("the first denied record would break a budget; admitting stops there") =
    forAll(limitGen, sizesGen) { (l, sizes) =>
      val a = admitted(l, sizes)
      a.size == sizes.size || {
        val next = sizes(a.size)
        l.count.exists(a.size >= _) || l.bytes.exists(a.sum + next > _)
      }
    }

  property("no limit admits everything; zero count admits nothing") =
    forAll(sizesGen) { sizes =>
      admitted(ReadLimit(), sizes) == sizes &&
        admitted(ReadLimit(count = Some(0)), sizes).isEmpty
    }

  property("admission is monotone in the budgets") =
    forAll(limitGen, sizesGen) { (l, sizes) =>
      val bigger = ReadLimit(l.count.map(_ + 1), l.bytes.map(_ + 200))
      admitted(l, sizes).size <= admitted(bigger, sizes).size
    }
}

/** Config codec, 3-layer merge, and tri-state patch (config.rs:234-258). */
object ConfigPropSpec extends Properties("Config") with DenseProps {
  import PropGens._
  import graft.log.ConfigCodec

  property("flattened codec round-trips every StreamConfig") =
    forAll(streamConfigGen) { c => ConfigCodec.decode(ConfigCodec.encode(c)) == c }

  property("basin codec round-trips (flags + default stream config)") =
    forAll(streamConfigGen, Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (c, a, r) =>
        val b = BasinConfig(c, a, r)
        ConfigCodec.decodeBasin(ConfigCodec.encodeBasin(b)) == b
    }

  property("mergedOver takes each field from self, else defaults") =
    forAll(streamConfigGen, streamConfigGen) { (c, d) =>
      val m = c.mergedOver(d)
      m.storageClass == c.storageClass.orElse(d.storageClass) &&
        m.retentionPolicy == c.retentionPolicy.orElse(d.retentionPolicy) &&
        m.timestamping == c.timestamping.orElse(d.timestamping) &&
        m.deleteOnEmpty == c.deleteOnEmpty.orElse(d.deleteOnEmpty)
    }

  property("mergedOver is associative (3-layer merge is order-safe)") =
    forAll(streamConfigGen, streamConfigGen, streamConfigGen) { (a, b, c) =>
      a.mergedOver(b).mergedOver(c) == a.mergedOver(b.mergedOver(c))
    }

  property("all-Keep patch is identity; patch fields act independently") =
    forAll(streamConfigGen, streamPatchGen) { (c, p) =>
      StreamConfigPatch().applyTo(c) == c && {
        val r = p.applyTo(c)
        r.storageClass == Patch(p.storageClass, c.storageClass) &&
          r.retentionPolicy == Patch(p.retentionPolicy, c.retentionPolicy) &&
          r.timestamping == Patch(p.timestamping, c.timestamping) &&
          r.deleteOnEmpty == Patch(p.deleteOnEmpty, c.deleteOnEmpty)
      }
    }

  property("patch round-trip: Set then read back yields the set value") =
    forAll(streamConfigGen) { c =>
      val p = StreamConfigPatch(
        retentionPolicy = Patch.Set(RetentionPolicy.Infinite),
        deleteOnEmpty = Patch.Clear)
      val r = p.applyTo(c)
      r.retentionPolicy.contains(RetentionPolicy.Infinite) &&
        r.deleteOnEmpty.isEmpty && r.storageClass == c.storageClass
    }
}

/** Batcher invariants: ≤ maxRecords and ≤ maxBytes per batch, batches
  * non-empty, order preserved, match_seq_num chains
  * (batching.rs:138-159, 186-266).
  */
object BatcherPropSpec extends Properties("Batcher") with DenseProps {
  import PropGens._

  val smallRecordGen: Gen[Record] = Gen.frequency(
    8 -> (for {
      hs <- Gen.choose(0, 2).flatMap(k => Gen.listOfN(k, headerGen))
      b <- bytesGen
    } yield EnvelopeRecord(hs, b)),
    1 -> commandGen)

  val caseGen: Gen[(Int, Long, List[Record], Option[Long])] = for {
    maxRecords <- Gen.choose(1, 10)
    maxBytes <- Gen.choose(60L, 400L)
    n <- Gen.choose(0, 50)
    recs <- Gen.listOfN(n, smallRecordGen)
    msn <- Gen.option(Gen.choose(0L, 1000L))
  } yield (maxRecords, maxBytes, recs, msn)

  property("every batch is non-empty, within both caps, order-preserving, msn-chained") =
    forAll(caseGen) { case (maxRecords, maxBytes, recs, msn) =>
      val b = new Batcher(maxRecords, maxBytes, msn, Some("tok"))
      b.batch(recs) match {
        case Left(_) =>
          // only an oversize record may reject the input
          recs.exists(_.meteredSize > maxBytes)
        case Right(batches) =>
          var expectMsn = msn
          batches.forall { in =>
            val ok = in.records.nonEmpty &&
              in.records.size <= maxRecords &&
              in.records.map(_.meteredSize).sum <= maxBytes &&
              in.matchSeqNum == expectMsn &&
              in.fencingToken.contains("tok")
            expectMsn = expectMsn.map(_ + in.records.size)
            ok
          } && batches.flatMap(_.records) == recs
      }
    }

  property("greedy: a batch closes only when full by count or bytes") =
    forAll(caseGen) { case (maxRecords, maxBytes, recs, _) =>
      new Batcher(maxRecords, maxBytes).batch(recs) match {
        case Left(_) => Prop.passed
        case Right(batches) =>
          Prop.all(batches.zip(batches.drop(1)).map { case (cur, next) =>
            val full = cur.records.size == maxRecords ||
              cur.records.map(_.meteredSize).sum +
                next.records.head.meteredSize > maxBytes
            Prop(full) :| "batch closed early"
          }: _*)
      }
    }
}
