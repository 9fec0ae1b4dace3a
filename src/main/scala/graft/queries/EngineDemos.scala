package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.log.{StreamStore, RecordCipher}
import graft.model._

/** Deterministic engine-semantics checks exposed as oracle queries.
  *
  * Each query exercises a stateful control-plane operator against a
  * fresh temp store with pinned clocks and returns (check, outcome)
  * rows; the DuckDB oracle is the constant table of expected outcomes
  * (reference semantics), so the driver hash-verifies behaviors that
  * are not otherwise SQL-expressible: CAS, fencing, in-band commands,
  * catalog create/ensure/reconfigure, encryption, batching, chunking,
  * access scopes, terminal deletion.
  */
object EngineDemos {

  private def freshStore(s: SparkSession): StreamStore = {
    val st = new StreamStore(s, Files.createTempDirectory("graft-demo").toString)
    st.catalog.createBasin("demo-basin1",
      BasinConfig(defaultStreamConfig =
        StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite))))
    st
  }

  private def rec(body: String): EnvelopeRecord =
    EnvelopeRecord(Nil, body.getBytes)

  private def out(s: SparkSession, rows: Seq[(String, String)]): DataFrame = {
    val sorted = rows.sortBy(_._1)
    s.createDataFrame(sorted).toDF("chk", "outcome").orderBy("chk")
  }

  private def constOracle(rows: Seq[(String, String)]): String =
    rows.sortBy(_._1)
      .map { case (c, o) => s"SELECT '$c' AS chk, '$o' AS outcome" }
      .mkString("", "\nUNION ALL\n", "\nORDER BY chk")

  private def demo(name: String, expected: Seq[(String, String)])(
      run: (SparkSession, StreamStore) => Seq[(String, String)]): QueryDef =
    QueryDef(name,
      (s, _) => out(s, run(s, freshStore(s))),
      Some(constOracle(expected)))

  def defs: Seq[QueryDef] = Seq(

    // A4 — match_seq_num CAS (streamer.rs:352-359)
    demo("e2e_a4_cas", Seq(
      "cas_at_tail" -> "ok:0..2",
      "cas_stale" -> "SeqNumMismatch(0,2)",
      "cas_next" -> "ok:2..3")) { (_, st) =>
      st.catalog.createStream("demo-basin1", "s")
      def fmt(r: Either[AppendError, AppendAck]) = r match {
        case Right(a) => s"ok:${a.start.seqNum}..${a.end.seqNum}"
        case Left(AppendError.SeqNumMismatch(m, a)) => s"SeqNumMismatch($m,$a)"
        case Left(e) => e.toString
      }
      Seq(
        "cas_at_tail" -> fmt(st.append("demo-basin1", "s",
          AppendInput(Seq(rec("a"), rec("b")), matchSeqNum = Some(0)), Some(1000))),
        "cas_stale" -> fmt(st.append("demo-basin1", "s",
          AppendInput(Seq(rec("c")), matchSeqNum = Some(0)), Some(1000))),
        "cas_next" -> fmt(st.append("demo-basin1", "s",
          AppendInput(Seq(rec("c")), matchSeqNum = Some(2)), Some(1000))))
    },

    // A5/A6 — fencing enforced only when provided; in-band fence command
    demo("e2e_a5_fencing", Seq(
      "fence_set" -> "ok",
      "no_token" -> "ok",
      "wrong_token" -> "FencingTokenMismatch(writer-1)",
      "right_token" -> "ok")) { (_, st) =>
      st.catalog.createStream("demo-basin1", "f")
      def fmt(r: Either[AppendError, AppendAck]) = r match {
        case Right(_) => "ok"
        case Left(AppendError.FencingTokenMismatch(cur)) => s"FencingTokenMismatch($cur)"
        case Left(e) => e.toString
      }
      Seq(
        "fence_set" -> fmt(st.append("demo-basin1", "f",
          AppendInput(Seq(FenceCommand("writer-1"))), Some(1000))),
        "no_token" -> fmt(st.append("demo-basin1", "f",
          AppendInput(Seq(rec("a"))), Some(1000))),
        "wrong_token" -> fmt(st.append("demo-basin1", "f",
          AppendInput(Seq(rec("b")), fencingToken = Some("writer-2")), Some(1000))),
        "right_token" -> fmt(st.append("demo-basin1", "f",
          AppendInput(Seq(rec("b")), fencingToken = Some("writer-1")), Some(1000))))
    },

    // A7 — trim: monotone, capped at own seq+1; tail survives
    demo("e2e_a7_trim", Seq(
      "after_trim5_first_visible" -> "5",
      "after_trim5_tail" -> "11",
      "trim_back_noop" -> "5",
      // seqs: records 0-9, trim@10, no-op trim@11, terminal trim@12 -> cap 13
      "terminal_cap" -> "13")) { (_, st) =>
      st.catalog.createStream("demo-basin1", "t")
      st.append("demo-basin1", "t", AppendInput((0 until 10).map(i => rec(s"r$i"))), Some(1000))
      st.append("demo-basin1", "t", AppendInput(Seq(TrimCommand(5))), Some(1000))
      val first = st.readBatch("demo-basin1", "t",
        ReadSpec(ReadStart(ReadFrom.SeqNum(0)))).toOption.get.head.seqNum
      val tail = st.checkTail("demo-basin1", "t").seqNum
      st.append("demo-basin1", "t", AppendInput(Seq(TrimCommand(2))), Some(1000))
      val noop = st.manifest("demo-basin1", "t").trimPoint
      st.append("demo-basin1", "t", AppendInput(Seq(TrimCommand(Long.MaxValue))), Some(1000))
      Seq(
        "after_trim5_first_visible" -> first.toString,
        "after_trim5_tail" -> tail.toString,
        "trim_back_noop" -> noop.toString,
        "terminal_cap" -> st.manifest("demo-basin1", "t").trimPoint.toString)
    },

    // A9 — batcher packing + match_seq_num chaining
    demo("e2e_a9_batcher", Seq(
      "sizes" -> "3,3,3,1",
      "match_seq_nums" -> "10,13,16,19",
      "oversize" -> "error")) { (_, _) =>
      val b = new Batcher(maxRecords = 3, initialMatchSeqNum = Some(10))
      val Right(out0) = b.batch(Seq.fill(10)(rec("x"))): @unchecked
      val over = new Batcher(maxBytes = 20).batch(Seq(rec("x" * 100)))
      Seq(
        "sizes" -> out0.map(_.records.size).mkString(","),
        "match_seq_nums" -> out0.map(_.matchSeqNum.get).mkString(","),
        "oversize" -> (if (over.isLeft) "error" else "accepted"))
    },

    // A13 — encryption round-trip; metering stays plaintext-sized
    demo("e2e_a13_encryption", Seq(
      "roundtrip" -> "secret-payload",
      "stored_differs" -> "true",
      "wrong_key" -> "auth_failed",
      "metered_plaintext" -> "22")) { (_, st) =>
      st.catalog.createStream("demo-basin1", "enc")
      val key = Array.fill(32)(0x24.toByte)
      st.append("demo-basin1", "enc", AppendInput(Seq(rec("secret-payload"))),
        Some(1000), Some(key))
      val raw = st.visible("demo-basin1", "enc").collect().head
      val plain = st.readBatch("demo-basin1", "enc",
        ReadSpec(ReadStart(ReadFrom.SeqNum(0))), cipher = Some(key))
        .toOption.get.head
      val wrong = try {
        st.readBatch("demo-basin1", "enc", ReadSpec(ReadStart(ReadFrom.SeqNum(0))),
          cipher = Some(Array.fill(32)(0x25.toByte)))
        "decrypted"
      } catch { case _: Throwable => "auth_failed" }
      Seq(
        "roundtrip" -> new String(plain.body),
        "stored_differs" -> (!java.util.Arrays.equals(
          raw.getAs[Array[Byte]](3), "secret-payload".getBytes)).toString,
        "wrong_key" -> wrong,
        "metered_plaintext" -> raw.getLong(4).toString)
    },

    // R6 — re-chunking caps
    demo("e2e_r6_rechunk", Seq("chunk_sizes" -> "1000,500")) { (_, st) =>
      st.catalog.createStream("demo-basin1", "ch")
      for (_ <- 0 until 2)
        st.append("demo-basin1", "ch", AppendInput(Seq.fill(750)(rec("t"))), Some(1000))
      val chunks = st.readChunked("demo-basin1", "ch",
        ReadSpec(ReadStart(ReadFrom.SeqNum(0)))).toOption.get
      Seq("chunk_sizes" -> chunks.map(_.size).mkString(","))
    },

    // T4 — terminal trim: deletion pending rejects; compact reclaims
    demo("e2e_t4_delete", Seq(
      "append_after_delete" -> "StreamDeletionPending",
      "catalog_after_compact" -> "gone")) { (_, st) =>
      st.catalog.createStream("demo-basin1", "del")
      st.append("demo-basin1", "del", AppendInput(Seq(rec("a"))), Some(1000))
      st.deleteStream("demo-basin1", "del")
      val rejected = st.append("demo-basin1", "del",
        AppendInput(Seq(rec("b"))), Some(1000)) match {
        case Left(AppendError.StreamDeletionPending) => "StreamDeletionPending"
        case other => other.toString
      }
      st.compact("demo-basin1", "del")
      Seq(
        "append_after_delete" -> rejected,
        "catalog_after_compact" ->
          (if (st.catalog.getStream("demo-basin1", "del").isEmpty) "gone" else "present"))
    },

    // C2-C4 — create idempotency, ensure outcomes, reconfigure patch
    demo("e2e_c2_c4_catalog", Seq(
      "create" -> "ok",
      "create_retry_same_token" -> "ok",
      "create_other_token" -> "StreamAlreadyExists",
      "ensure_noop" -> "Noop",
      "ensure_update" -> "Updated",
      "patch_result" -> "infinite")) { (_, st) =>
      def fmt(r: Either[String, _]) = r.fold(identity, _ => "ok")
      val a = st.catalog.createStream("demo-basin1", "c", requestToken = Some("t1"))
      val b = st.catalog.createStream("demo-basin1", "c", requestToken = Some("t1"))
      val c = st.catalog.createStream("demo-basin1", "c", requestToken = Some("t2"))
      val d = st.catalog.ensureStream("demo-basin1", "c", StreamConfig())
      val e = st.catalog.ensureStream("demo-basin1", "c",
        StreamConfig(deleteOnEmpty = Some(DeleteOnEmpty(60))))
      val f = st.catalog.reconfigureStream("demo-basin1", "c",
        StreamConfigPatch(retentionPolicy = Patch.Set(RetentionPolicy.Infinite)))
      Seq(
        "create" -> fmt(a), "create_retry_same_token" -> fmt(b),
        "create_other_token" -> fmt(c),
        "ensure_noop" -> d.toOption.get.toString.replace("EnsureOutcome", ""),
        "ensure_update" -> e.toOption.get.toString,
        "patch_result" -> (f.toOption.get.retentionPolicy match {
          case Some(RetentionPolicy.Infinite) => "infinite"
          case other => other.toString
        }))
    },

    // C6 — auto-create on append/read gated by basin flags (core.rs:326-391)
    demo("e2e_c6_auto_create", Seq(
      "append_missing_no_flag" -> "StreamNotFound",
      "read_missing_no_flag" -> "StreamNotFound",
      "not_provisioned" -> "true",
      "append_missing_flag" -> "ok:0..1",
      "provisioned_on_append" -> "true",
      "read_missing_flag_rows" -> "0",
      "provisioned_on_read" -> "true")) { (_, st) =>
      st.catalog.createBasin("demo-basin2",
        BasinConfig(
          defaultStreamConfig =
            StreamConfig(retentionPolicy = Some(RetentionPolicy.Infinite)),
          createStreamOnAppend = true, createStreamOnRead = true))
      val denied = st.append("demo-basin1", "nope",
        AppendInput(Seq(rec("a"))), Some(1000)) match {
        case Left(AppendError.StreamNotFound) => "StreamNotFound"
        case other => other.toString
      }
      val deniedRead = st.read("demo-basin1", "nope",
        ReadSpec(ReadStart(ReadFrom.SeqNum(0)))) match {
        case Left(e) if e.startsWith("StreamNotFound") => "StreamNotFound"
        case other => other.toString
      }
      val ok = st.append("demo-basin2", "auto-a",
        AppendInput(Seq(rec("a"))), Some(1000)) match {
        case Right(a) => s"ok:${a.start.seqNum}..${a.end.seqNum}"
        case Left(e) => e.toString
      }
      val readRows = st.read("demo-basin2", "auto-r",
        ReadSpec(ReadStart(ReadFrom.SeqNum(0))))
        .fold(e => e, df => df.count().toString)
      Seq(
        "append_missing_no_flag" -> denied,
        "read_missing_no_flag" -> deniedRead,
        "not_provisioned" ->
          st.catalog.getStream("demo-basin1", "nope").isEmpty.toString,
        "append_missing_flag" -> ok,
        "provisioned_on_append" ->
          st.catalog.getStream("demo-basin2", "auto-a").isDefined.toString,
        "read_missing_flag_rows" -> readRows,
        "provisioned_on_read" ->
          st.catalog.getStream("demo-basin2", "auto-r").isDefined.toString)
    },

    // C7 — access-token scope authorization matrix
    demo("e2e_c7_access", Seq(
      "read_op_in_scope" -> "true",
      "write_op_denied" -> "false",
      "basin_out_of_scope" -> "false",
      "expired" -> "false",
      "auto_prefix" -> "tenant42-orders")) { (_, _) =>
      val t = AccessToken("tok1", AccessTokenScope(
        basins = ResourceSet.Exact("prod-basin-1"),
        streams = ResourceSet.Prefix("app-"),
        opGroups = PermittedOperationGroups(accountRead = true)),
        expiresAtMs = Some(5000L))
      val auto = AccessToken("tok2", AccessTokenScope(
        streams = ResourceSet.Prefix("tenant42-")), autoPrefixStreams = true)
      Seq(
        "read_op_in_scope" -> t.authorize(Op.Read, "prod-basin-1", "app-x", 100).toString,
        "write_op_denied" -> t.authorize(Op.Append, "prod-basin-1", "app-x", 100).toString,
        "basin_out_of_scope" -> t.authorize(Op.Read, "other-basin1", "app-x", 100).toString,
        "expired" -> t.authorize(Op.Read, "prod-basin-1", "app-x", 5000).toString,
        "auto_prefix" -> auto.effectiveStreamName("orders"))
    }
  )
}
