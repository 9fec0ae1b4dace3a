package graft.log

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.model._

/** Linearizability harness over the unary append/read/tail surface —
  * the analog of the reference's sim layer
  * (sim/src/scenarios/linearizable.rs:1-60, sim/src/history.rs):
  * seeded concurrent clients mixing plain appends, match_seq_num CAS,
  * fencing ops, tail checks and prefix reads against ONE stream
  * through TWO StreamStore instances on one root, recording a
  * start/finish-labeled history that is then checked against a
  * sequential model of the log.
  *
  * Unlike the reference (which ships histories to an offline
  * Porcupine model checker), the checker here needs no linearization
  * search: every committed append carries its linearization evidence
  * — the assigned seq range — so commit order IS the linearization
  * order, and the checker verifies that order directly against
  * real-time bounds, CAS semantics, fencing-token state, tail
  * monotonicity and read consistency. Operations that fail
  * indefinitely (commit-path exception, lost ack) are recorded as
  * `Indefinite` and resolved by the final log read: they may or may
  * not have happened, exactly as the reference treats them.
  *
  * Teeth: two injected-bug scenarios (fencing check skipped, CAS
  * check skipped) must produce checker violations — a checker that
  * passes everything proves nothing.
  */
class LinearizabilitySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val Basin = "test-basin"
  private val Stream = "lin"

  // ----------------------------------------------------------------
  // History model
  // ----------------------------------------------------------------

  sealed trait LinOp
  final case class PlainAppend(bodies: Vector[String]) extends LinOp
  final case class CasAppend(bodies: Vector[String], expect: Long) extends LinOp
  final case class GuardedAppend(bodies: Vector[String], guard: String) extends LinOp
  /** Appends a FenceCommand(token); `guard` optionally gates it on the
    * CURRENT token like any other append. The command's payload (the
    * token) is its unique log body. */
  final case class FenceSet(token: String, guard: Option[String]) extends LinOp
  case object TailCheck extends LinOp
  final case class ReadPrefix(count: Int) extends LinOp

  sealed trait LinRes
  final case class Committed(start: Long, end: Long) extends LinRes // end exclusive
  final case class CasFail(expected: Long, actual: Long) extends LinRes
  final case class FenceFail(current: String) extends LinRes
  final case class TailSeen(tail: Long) extends LinRes
  final case class ReadSeen(recs: Vector[(Long, String)]) extends LinRes
  case object Indefinite extends LinRes
  final case class Unexpected(msg: String) extends LinRes

  final case class LinEvent(client: Int, op: LinOp, t0: Long, t1: Long, res: LinRes)

  /** Bodies an op would occupy the log with, in order. */
  private def opBodies(op: LinOp): Vector[String] = op match {
    case PlainAppend(bs)      => bs
    case CasAppend(bs, _)     => bs
    case GuardedAppend(bs, _) => bs
    case FenceSet(tok, _)     => Vector(tok)
    case _                    => Vector.empty
  }

  // ----------------------------------------------------------------
  // Sequential-model checker
  // ----------------------------------------------------------------

  /** Check a history against the final log. Returns violations
    * (empty = linearizable w.r.t. the model).
    *
    * Model: a single log of records with a tail, a trim-free append
    * order, a fencing token (set only by committed FenceSet batches,
    * initial ""), CAS = (matchSeqNum == tail at linearization),
    * fencing = (guard == token at linearization), reads return exact
    * committed prefixes, and every operation linearizes at some
    * point inside its [t0, t1] window.
    */
  def check(events: Seq[LinEvent], log: Vector[(Long, String)],
            finalTail: Long): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def viol(e: LinEvent, msg: String): Unit =
      out += s"client ${e.client} ${e.op} -> ${e.res}: $msg"

    // log integrity: contiguous seqs from 0, unique bodies
    if (log.map(_._1) != (0L until finalTail).toVector)
      out += s"log seqs not contiguous 0..$finalTail: ${log.map(_._1).take(20)}"
    val bodyToSeq: Map[String, Long] = log.map { case (s, b) => b -> s }.toMap
    if (bodyToSeq.size != log.size)
      out += "duplicate bodies in log (workload bodies are unique: duplicated seq content)"

    // resolve each append-ish op's committed range from the log
    final case class CommittedOp(e: LinEvent, start: Long, end: Long)
    val committed = scala.collection.mutable.ArrayBuffer.empty[CommittedOp]
    val claimed = scala.collection.mutable.BitSet.empty
    events.foreach { e =>
      val bodies = opBodies(e.op)
      if (bodies.nonEmpty) {
        val seqs = bodies.map(bodyToSeq.get)
        val inLog = seqs.head.isDefined
        if (seqs.exists(_.isDefined) != seqs.forall(_.isDefined))
          viol(e, "batch partially in log — batches must commit atomically")
        if (inLog) {
          val s0 = seqs.head.get
          if (seqs.flatten != (s0 until s0 + bodies.size).toVector)
            viol(e, s"batch bodies not contiguous/in-order in log: ${seqs.flatten}")
          e.res match {
            case Committed(a, b) =>
              if (a != s0 || b != s0 + bodies.size)
                viol(e, s"ack range [$a,$b) != log range [$s0,${s0 + bodies.size})")
            case Indefinite => // resolved: it DID happen
            case _ => viol(e, "op reported failed but its records are in the log")
          }
          committed += CommittedOp(e, s0, s0 + bodies.size)
          (s0 until s0 + bodies.size).foreach(s => claimed += s.toInt)
        } else e.res match {
          case Committed(_, _) => viol(e, "acked append absent from final log")
          case _               => // failed or indefinite-that-didn't-happen: fine
        }
      }
      e.res match {
        case Unexpected(m) => viol(e, s"unexpected store error: $m")
        case _             =>
      }
    }
    if (claimed.size.toLong != finalTail)
      out += s"log not fully claimed by history: ${claimed.size} of $finalTail " +
        "records matched an operation"

    // commit order = seq order (ranges are assigned under the stream
    // lock, so manifest-commit order equals range order)
    val order = committed.sortBy(_.start).toVector
    order.sliding(2).foreach {
      case Vector(a, b) =>
        if (a.end != b.start)
          out += s"committed ranges not contiguous: [${a.start},${a.end}) then [${b.start},${b.end})"
      case _ =>
    }

    // real-time: if B finished before A started, B cannot follow A in the log
    for (i <- order.indices; j <- (i + 1) until order.size)
      if (order(j).e.t1 < order(i).e.t0)
        viol(order(j).e, s"linearized after an op (client ${order(i).e.client} " +
          s"${order(i).e.op}) that started only after it finished")

    // tails-by-time bounds: the tail any op could have observed inside
    // its window. Commit happens within the committer's own [t0,t1]:
    //   lower = everything that FINISHED before this op started has committed;
    //   upper = nothing that STARTED after this op finished has committed.
    def lower(e: LinEvent): Long =
      order.iterator.filter(_.e.t1 < e.t0).map(_.end).maxOption.getOrElse(0L)
    def upper(e: LinEvent): Long =
      order.iterator.filter(_.e.t0 < e.t1).map(_.end).maxOption.getOrElse(0L)
    val boundaries: Set[Long] = order.iterator.map(_.end).toSet + 0L

    // fencing-token state after k commits (k = 0 .. order.size)
    val tokenAfter: Vector[String] =
      order.scanLeft("") { (tok, c) =>
        c.e.op match {
          case FenceSet(t, _) => t
          case _              => tok
        }
      }.toVector
    val commitIdx: Map[Long, Int] = // range start -> commit index
      order.iterator.zipWithIndex.map { case (c, i) => c.start -> i }.toMap
    def loIdx(e: LinEvent): Int = order.count(_.e.t1 < e.t0)
    def hiIdx(e: LinEvent): Int = order.count(_.e.t0 < e.t1)

    events.foreach { e =>
      (e.op, e.res) match {
        // CAS semantics
        case (CasAppend(_, expect), Committed(a, _)) =>
          if (a != expect) viol(e, s"CAS expected tail $expect but linearized at $a")
        case (CasAppend(_, expect), CasFail(rexp, actual)) =>
          if (rexp != expect) viol(e, s"error echoed expected=$rexp, op sent $expect")
          if (actual == expect) viol(e, "rejected with actual == expected")
          if (!boundaries.contains(actual))
            viol(e, s"rejection cites tail $actual which never existed")
          if (actual < lower(e) || actual > upper(e))
            viol(e, s"rejection cites tail $actual outside window [${lower(e)},${upper(e)}]")
        // fencing semantics: guard must equal the token in effect at commit
        case (GuardedAppend(_, g), Committed(a, _)) =>
          val tok = tokenAfter(commitIdx(a))
          if (tok != g) viol(e, s"guard '$g' committed while token was '$tok'")
        case (FenceSet(_, Some(g)), Committed(a, _)) =>
          val tok = tokenAfter(commitIdx(a))
          if (tok != g) viol(e, s"guard '$g' committed while token was '$tok'")
        case (op, FenceFail(current)) =>
          val g = op match {
            case GuardedAppend(_, g0) => Some(g0)
            case FenceSet(_, g0)      => g0
            case _                    => None
          }
          if (g.contains(current)) viol(e, "rejected with current == guard")
          val window = (loIdx(e) to hiIdx(e)).map(tokenAfter)
          if (!window.contains(current))
            viol(e, s"rejection cites token '$current' not current anywhere in window " +
              s"${window.distinct.mkString("{", ",", "}")}")
        // tail checks
        case (TailCheck, TailSeen(t)) =>
          if (!boundaries.contains(t)) viol(e, s"tail $t never existed")
          if (t < lower(e) || t > upper(e))
            viol(e, s"tail $t outside window [${lower(e)},${upper(e)}]")
        // reads: exact committed prefix, cut at a plausible tail
        case (ReadPrefix(k), ReadSeen(recs)) =>
          if (recs != log.take(recs.size))
            viol(e, s"read returned ${recs.take(5)}... != log prefix ${log.take(5)}...")
          if (recs.size < k) {
            val t = recs.size.toLong
            if (!boundaries.contains(t)) viol(e, s"read cut at $t which was never a tail")
            if (t < lower(e) || t > upper(e))
              viol(e, s"read cut at $t outside window [${lower(e)},${upper(e)}]")
          } else if (upper(e) < k)
            viol(e, s"read returned $k records but at most ${upper(e)} existed in window")
        case _ =>
      }
    }
    out.toSeq
  }

  // ----------------------------------------------------------------
  // Workload
  // ----------------------------------------------------------------

  /** One client's view of the store: lets the teeth tests inject bugs
    * (dropping the CAS/fencing argument while still RECORDING the op
    * as guarded) without touching production code. */
  private final class ClientConn(st: StreamStore,
                                 skipFencing: Boolean = false,
                                 skipCas: Boolean = false) {
    def append(op: LinOp): LinRes = {
      val input = op match {
        case PlainAppend(bs) =>
          AppendInput(bs.map(b => EnvelopeRecord(Nil, b.getBytes("UTF-8"))))
        case CasAppend(bs, expect) =>
          AppendInput(bs.map(b => EnvelopeRecord(Nil, b.getBytes("UTF-8"))),
            matchSeqNum = if (skipCas) None else Some(expect))
        case GuardedAppend(bs, g) =>
          AppendInput(bs.map(b => EnvelopeRecord(Nil, b.getBytes("UTF-8"))),
            fencingToken = if (skipFencing) None else Some(g))
        case FenceSet(tok, g) =>
          AppendInput(Seq(FenceCommand(tok)),
            fencingToken = if (skipFencing) None else g)
        case _ => throw new IllegalArgumentException(s"not an append op: $op")
      }
      try st.append(Basin, Stream, input) match {
        case Right(ack) => Committed(ack.start.seqNum, ack.end.seqNum)
        case Left(AppendError.SeqNumMismatch(exp, act)) => CasFail(exp, act)
        case Left(AppendError.FencingTokenMismatch(cur)) => FenceFail(cur)
        case Left(other) => Unexpected(other.toString)
      } catch { case _: Throwable => Indefinite }
    }
    def tail(): LinRes =
      try TailSeen(st.checkTail(Basin, Stream).seqNum)
      catch { case _: Throwable => Indefinite }
    def read(k: Int): LinRes =
      try st.readUnary(Basin, Stream,
        ReadSpec(ReadStart(ReadFrom.SeqNum(0)),
          ReadEnd(limit = ReadLimit(count = Some(k.toLong))))) match {
        case Right(recs) => ReadSeen(recs.iterator
          .map(r => (r.seqNum, new String(r.body, "UTF-8"))).toVector)
        case Left(err) => Unexpected(err)
      } catch { case _: Throwable => Indefinite }
  }

  private def newStores(root: String): Vector[StreamStore] = {
    val a = new StreamStore(spark, root)
    a.catalog.createBasin(Basin,
      BasinConfig(defaultStreamConfig =
        StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
      .fold(e => fail(e), identity)
    a.catalog.createStream(Basin, Stream).fold(e => fail(e), identity)
    Vector(a, new StreamStore(spark, root))
  }

  private def finalState(st: StreamStore): (Vector[(Long, String)], Long) = {
    val tail = st.checkTail(Basin, Stream).seqNum
    val log = st.readBatch(Basin, Stream,
      ReadSpec(ReadStart(ReadFrom.SeqNum(0))))
      .fold(e => fail(e), identity)
      .iterator.map(r => (r.seqNum, new String(r.body, "UTF-8"))).toVector
    (log, tail)
  }

  /** Seeded concurrent workload: `nClients` threads × `opsPerClient`
    * ops over two instances, commit-path failure injection on
    * instance B, lost-ack simulation client-side. Returns the full
    * labeled history plus the final log.
    */
  private def runWorkload(seed: Long, nClients: Int, opsPerClient: Int)
      : (Seq[LinEvent], Vector[(Long, String)], Long) = {
    val root = Files.createTempDirectory("graft-lin").toString
    val stores = newStores(root)

    // injected commit failures on instance B: the data file is written,
    // the manifest commit throws, cleanup removes the file — the client
    // observes an exception and cannot know the outcome (Indefinite)
    val hookRnd = new java.util.Random(seed ^ 0x5eedL)
    stores(1).beforeManifestCommit = () =>
      if (hookRnd.synchronized(hookRnd.nextDouble()) < 0.10)
        throw new RuntimeException("injected commit failure")

    val events = Array.fill(nClients)(
      scala.collection.mutable.ArrayBuffer.empty[LinEvent])
    val start = new CountDownLatch(1)
    val threads = (0 until nClients).map { c =>
      new Thread(() => {
        val rnd = new scala.util.Random(seed * 1000003L + c)
        var believedTail = 0L
        var myToken = ""
        var fenceEpoch = 0
        start.await()
        for (i <- 0 until opsPerClient) {
          val conn = new ClientConn(stores(rnd.nextInt(stores.size)))
          def bodies(n: Int): Vector[String] =
            (0 until n).map(k => s"b-$c-$i-$k").toVector
          def record(op: LinOp)(run: => LinRes): LinRes = {
            val t0 = System.nanoTime()
            val res0 = run
            val t1 = System.nanoTime()
            // lost-ack simulation: the op really happened; the client
            // just never learned. Keep believedTail un-updated.
            val res = res0 match {
              case Committed(_, _) if rnd.nextDouble() < 0.05 => Indefinite
              case r => r
            }
            events(c) += LinEvent(c, op, t0, t1, res)
            res
          }
          c % 4 match {
            case 0 => // plain appender + reader
              val p = rnd.nextDouble()
              if (p < 0.6) {
                val op = PlainAppend(bodies(1 + rnd.nextInt(3)))
                record(op)(conn.append(op))
              } else if (p < 0.8) record(TailCheck)(conn.tail())
              else {
                val k = 1 + rnd.nextInt(50)
                record(ReadPrefix(k))(conn.read(k))
              }
            case 1 => // CAS client
              if (rnd.nextDouble() < 0.35)
                record(TailCheck)(conn.tail()) match {
                  case TailSeen(t) => believedTail = t
                  case _ =>
                }
              else {
                val op = CasAppend(bodies(1 + rnd.nextInt(2)), believedTail)
                record(op)(conn.append(op)) match {
                  case Committed(_, end) => believedTail = end
                  case CasFail(_, actual) => believedTail = actual
                  case _ =>
                }
              }
            case _ => // two fencing clients fighting over the token
              val p = rnd.nextDouble()
              if (p < 0.25) {
                val tok = s"t$c-$fenceEpoch"; fenceEpoch += 1
                // half the fences are guarded by the client's last
                // known token (often stale), half unconditional
                val op = FenceSet(tok,
                  if (rnd.nextBoolean() && myToken.nonEmpty) Some(myToken) else None)
                record(op)(conn.append(op)) match {
                  case Committed(_, _) => myToken = tok
                  case _ =>
                }
              } else if (p < 0.8 && myToken.nonEmpty) {
                val op = GuardedAppend(bodies(1), myToken)
                record(op)(conn.append(op)) match {
                  case FenceFail(_) => myToken = "" // lost the stream
                  case _ =>
                }
              } else if (p < 0.9) record(TailCheck)(conn.tail())
              else {
                val k = 1 + rnd.nextInt(30)
                record(ReadPrefix(k))(conn.read(k))
              }
          }
        }
      }, s"lin-client-$c")
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join())
    stores(1).beforeManifestCommit = () => ()

    val (log, tail) = finalState(stores(0))
    (events.toSeq.flatten, log, tail)
  }

  // ----------------------------------------------------------------
  // Specs
  // ----------------------------------------------------------------

  test("concurrent append/CAS/fencing/read histories linearize (5 seeds x 120 ops)") {
    val all = scala.collection.mutable.ArrayBuffer.empty[LinEvent]
    for (seed <- 1L to 5L) {
      val (events, log, tail) = runWorkload(seed, nClients = 4, opsPerClient = 30)
      val violations = check(events, log, tail)
      assert(violations.isEmpty,
        s"seed $seed: ${violations.size} violations:\n${violations.take(10).mkString("\n")}")
      assert(tail > 0, s"seed $seed: nothing committed")
      all ++= events
    }
    // non-vacuous: across the seeds the workload must exercise every
    // outcome family the checker has rules for
    def has(p: LinEvent => Boolean) = all.exists(p)
    assert(has(e => e.op.isInstanceOf[CasAppend] && e.res.isInstanceOf[Committed]))
    assert(has(e => e.op.isInstanceOf[CasAppend] && e.res.isInstanceOf[CasFail]))
    assert(has(e => e.op.isInstanceOf[GuardedAppend] && e.res.isInstanceOf[Committed]))
    assert(has(e => e.res.isInstanceOf[FenceFail]))
    assert(has(e => e.op.isInstanceOf[FenceSet] && e.res.isInstanceOf[Committed]))
    assert(has(_.res == Indefinite), "no indefinite outcomes — failure " +
      "injection never fired, the may-or-may-not path is untested")
    assert(has(e => e.op.isInstanceOf[ReadPrefix] && e.res.isInstanceOf[ReadSeen]))
    assert(has(e => e.op == TailCheck && e.res.isInstanceOf[TailSeen]))
  }

  test("teeth: a store that skips the fencing check is caught") {
    val root = Files.createTempDirectory("graft-lin-bug").toString
    val stores = newStores(root)
    val good = new ClientConn(stores(0))
    val buggy = new ClientConn(stores(1), skipFencing = true)
    val events = scala.collection.mutable.ArrayBuffer.empty[LinEvent]
    def rec(conn: ClientConn, op: LinOp): Unit = {
      val t0 = System.nanoTime()
      val res = conn.append(op)
      events += LinEvent(0, op, t0, System.nanoTime(), res)
    }
    rec(good, FenceSet("tA", None))
    rec(good, GuardedAppend(Vector("x1"), "tA")) // fine: token is tA
    rec(good, FenceSet("tB", None))
    // stale guard tA — a correct store rejects; the buggy one commits
    rec(buggy, GuardedAppend(Vector("x2"), "tA"))
    val (log, tail) = finalState(stores(0))
    val violations = check(events.toSeq, log, tail)
    assert(violations.exists(_.contains("guard 'tA' committed while token was 'tB'")),
      s"checker missed the fencing bug; violations=$violations")
  }

  test("teeth: a store that skips the CAS check is caught") {
    val root = Files.createTempDirectory("graft-lin-bug2").toString
    val stores = newStores(root)
    val good = new ClientConn(stores(0))
    val buggy = new ClientConn(stores(1), skipCas = true)
    val events = scala.collection.mutable.ArrayBuffer.empty[LinEvent]
    def rec(conn: ClientConn, op: LinOp): Unit = {
      val t0 = System.nanoTime()
      val res = conn.append(op)
      events += LinEvent(0, op, t0, System.nanoTime(), res)
    }
    rec(good, PlainAppend(Vector("p1")))
    // stale CAS on tail 0 — a correct store rejects; the buggy one commits at 1
    rec(buggy, CasAppend(Vector("p2"), 0L))
    val (log, tail) = finalState(stores(0))
    val violations = check(events.toSeq, log, tail)
    assert(violations.exists(_.contains("CAS expected tail 0 but linearized at 1")),
      s"checker missed the CAS bug; violations=$violations")
  }

  test("teeth: a fabricated out-of-thin-air ack is caught") {
    val root = Files.createTempDirectory("graft-lin-bug3").toString
    val stores = newStores(root)
    val good = new ClientConn(stores(0))
    val events = scala.collection.mutable.ArrayBuffer.empty[LinEvent]
    val t0 = System.nanoTime()
    val res = good.append(PlainAppend(Vector("real")))
    events += LinEvent(0, PlainAppend(Vector("real")), t0, System.nanoTime(), res)
    // an ack for records that never became durable
    events += LinEvent(1, PlainAppend(Vector("ghost")),
      System.nanoTime(), System.nanoTime(), Committed(1L, 2L))
    val (log, tail) = finalState(stores(0))
    val violations = check(events.toSeq, log, tail)
    assert(violations.exists(_.contains("acked append absent from final log")),
      s"checker missed the lost ack; violations=$violations")
  }
}
