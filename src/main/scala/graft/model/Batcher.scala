package graft.model

/** A9 — client-side record batcher (sdk/src/batching.rs:20-36,186-266).
  *
  * Greedily packs records into batches of ≤ maxRecords and ≤ maxBytes
  * metered; a record that alone exceeds the byte cap is an error; an
  * initial match_seq_num auto-increments across emitted batches
  * (batching.rs:138-159), and the fencing token is carried onto every
  * batch. The 5 ms linger window is a client-timing concern — in the
  * Spark engine, the Structured Streaming trigger interval plays that
  * role (SURVEY §2.1 A9).
  */
final class Batcher(
    maxRecords: Int = Caps.MaxBatchRecords,
    maxBytes: Long = Caps.MaxBatchMeteredBytes,
    initialMatchSeqNum: Option[Long] = None,
    fencingToken: Option[String] = None) {

  require(maxRecords >= 1 && maxRecords <= Caps.MaxBatchRecords)
  require(maxBytes >= 1 && maxBytes <= Caps.MaxBatchMeteredBytes)

  /** Pack `records` into AppendInputs. Returns Left on an oversize
    * record (metered size > per-batch byte cap).
    */
  def batch(records: Seq[Record]): Either[String, Seq[AppendInput]] = {
    val out = Seq.newBuilder[AppendInput]
    var cur = Vector.empty[Record]
    var curBytes = 0L
    var emitted = 0L

    def flush(): Unit = if (cur.nonEmpty) {
      out += AppendInput(cur,
        matchSeqNum = initialMatchSeqNum.map(_ + emitted),
        fencingToken = fencingToken)
      emitted += cur.size
      cur = Vector.empty
      curBytes = 0L
    }

    for (r <- records) {
      val sz = r.meteredSize
      if (sz > maxBytes)
        return Left(s"record metered size $sz exceeds batch cap $maxBytes")
      if (cur.size >= maxRecords || curBytes + sz > maxBytes) flush()
      cur :+= r
      curBytes += sz
    }
    flush()
    Right(out.result())
  }
}
