package graft.log

/** History model + sequential checker shared by LinearizabilitySpec
  * (concurrent clients, commit-path failure injection) and
  * RecoverySpec (kill/restart at commit fault points): the analog of
  * the reference's sim history layer (sim/src/history.rs).
  *
  * The checker needs no linearization search: every committed append
  * carries its linearization evidence — the assigned seq range — so
  * commit order IS the linearization order, and the checker verifies
  * that order directly against real-time bounds, CAS semantics,
  * fencing-token state, tail monotonicity and read consistency.
  * Operations that fail indefinitely (commit-path exception, lost
  * ack, process kill) are recorded as `Indefinite` and resolved by
  * the final log read: they may or may not have happened, exactly as
  * the reference treats them.
  */
object LinModel {

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
  def opBodies(op: LinOp): Vector[String] = op match {
    case PlainAppend(bs)      => bs
    case CasAppend(bs, _)     => bs
    case GuardedAppend(bs, _) => bs
    case FenceSet(tok, _)     => Vector(tok)
    case _                    => Vector.empty
  }

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
}
