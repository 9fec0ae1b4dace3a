package graft.log

import graft.model._

/** Declarative catalog configuration — the `s2 apply` / `s2 diff`
  * surface (reference cli/src/apply.rs:1-661 and cli/src/diff.rs)
  * over the C2/C3/C4 catalog operators: a JSON resource spec lists
  * basins, their configs, and per-basin streams; `plan` is the dry
  * run (per-entry Create / Update with field diffs / Unchanged) and
  * `apply` ensures the spec idempotently.
  *
  * Comparison semantics follow apply.rs:176-178: DEFAULTS ARE APPLIED
  * BEFORE COMPARISON — a spec that omits `retention_policy` matches
  * an existing config whose stored retention is the system default
  * (7 days), and an existing implicit default matches a spec that
  * states it explicitly. Diffs are reported per dotted field path
  * with formatted old/new values (diff_basin_config /
  * diff_stream_configs, apply.rs:339-430).
  *
  * Spec configs ride the catalog's own flattened codec
  * ([[ConfigCodec]] keys: storage_class, retention_age_secs,
  * timestamping_mode, timestamping_uncapped,
  * delete_on_empty_min_age_secs, + basin-level create_stream_on_*,
  * stream_cipher), so the JSON stays plain string maps.
  */
object CatalogApply {

  final case class StreamSpec(name: String,
                              config: Option[Map[String, String]] = None)
  final case class BasinSpec(name: String,
                             config: Option[Map[String, String]] = None,
                             streams: Seq[StreamSpec] = Nil)
  final case class ResourceSpec(basins: Seq[BasinSpec] = Nil)

  final case class FieldDiff(field: String, before: String, after: String)

  /** One plan/apply row. `kind` = basin | stream; `stream` empty for
    * basin rows; `action` = created | updated | unchanged. */
  final case class Entry(kind: String, basin: String, stream: String,
                         action: String, diffs: Seq[FieldDiff]) {
    def diffString: String =
      diffs.map(d => s"${d.field}:${d.before}->${d.after}").mkString(";")
  }

  def parse(json: String): ResourceSpec =
    Layout.fromJsonString[ResourceSpec](json)

  // ---- effective (defaulted) field views -------------------------------

  private def fmtRetention(r: RetentionPolicy): String = r match {
    case RetentionPolicy.Age(s) => s"${s}s"
    case RetentionPolicy.Infinite => "infinite"
  }

  /** Every stream-config field with system defaults applied — the
    * comparison AND display form (config.rs defaults: express,
    * 7-day age retention, client-prefer capped, delete-on-empty off).
    */
  private def effStream(c: StreamConfig): Seq[(String, String)] = {
    val t = c.timestamping.getOrElse(Timestamping())
    Seq(
      "storage_class" ->
        (if (c.storageClass.contains(StorageClass.Standard)) "standard"
         else "express"),
      "retention_policy" ->
        fmtRetention(c.retentionPolicy.getOrElse(RetentionPolicy.Default)),
      "timestamping.mode" -> (t.mode match {
        case TimestampingMode.ClientPrefer => "client-prefer"
        case TimestampingMode.ClientRequire => "client-require"
        case TimestampingMode.Arrival => "arrival"
      }),
      "timestamping.uncapped" -> t.uncapped.toString,
      "delete_on_empty.min_age" ->
        s"${c.deleteOnEmpty.getOrElse(DeleteOnEmpty()).minAgeSeconds}s")
  }

  private def effBasin(c: BasinConfig): Seq[(String, String)] =
    Seq(
      "stream_cipher" -> c.streamCipher.map(_.wireName).getOrElse("none"),
      "create_stream_on_append" -> c.createStreamOnAppend.toString,
      "create_stream_on_read" -> c.createStreamOnRead.toString) ++
      effStream(c.defaultStreamConfig)
        .map { case (f, v) => s"default_stream_config.$f" -> v }

  private def diffFields(existing: Seq[(String, String)],
                         desired: Seq[(String, String)]): Seq[FieldDiff] =
    existing.zip(desired).collect {
      case ((f, oldV), (_, newV)) if oldV != newV => FieldDiff(f, oldV, newV)
    }

  /** Create-row diffs: only the fields the SPEC sets, against empty
    * (spec_basin_fields / spec_stream_fields, apply.rs:432-500). */
  private def specFields(spec: Map[String, String],
                         eff: Seq[(String, String)],
                         prefixDefaults: Boolean): Seq[FieldDiff] = {
    val keyToField = Map(
      "storage_class" -> "storage_class",
      "retention_age_secs" -> "retention_policy",
      "timestamping_mode" -> "timestamping.mode",
      "timestamping_uncapped" -> "timestamping.uncapped",
      "delete_on_empty_min_age_secs" -> "delete_on_empty.min_age",
      "stream_cipher" -> "stream_cipher",
      "create_stream_on_append" -> "create_stream_on_append",
      "create_stream_on_read" -> "create_stream_on_read")
    val effMap = eff.toMap
    spec.keys.toSeq.sorted.flatMap { k =>
      keyToField.get(k).map { f0 =>
        val f =
          if (prefixDefaults && !f0.startsWith("create_stream") &&
              f0 != "stream_cipher") s"default_stream_config.$f0"
          else f0
        FieldDiff(f, "", effMap.getOrElse(f, ""))
      }
    }
  }

  // ---- plan (dry run) ---------------------------------------------------

  /** Dry run: what `apply` would do, touching nothing. */
  def plan(catalog: Catalog, spec: ResourceSpec): Seq[Entry] =
    spec.basins.flatMap { b =>
      val desired = ConfigCodec.decodeBasin(b.config.getOrElse(Map.empty))
      val basinEntry = catalog.getBasin(b.name) match {
        case None =>
          Entry("basin", b.name, "", "created",
            specFields(b.config.getOrElse(Map.empty), effBasin(desired),
              prefixDefaults = true))
        case Some(e) =>
          val existing = ConfigCodec.decodeBasin(e.config)
          val ds = diffFields(effBasin(existing), effBasin(desired))
          Entry("basin", b.name, "",
            if (ds.isEmpty) "unchanged" else "updated", ds)
      }
      basinEntry +: b.streams.map { s =>
        val desiredS = ConfigCodec.decode(s.config.getOrElse(Map.empty))
        catalog.getStream(b.name, s.name) match {
          case None =>
            Entry("stream", b.name, s.name, "created",
              specFields(s.config.getOrElse(Map.empty), effStream(desiredS),
                prefixDefaults = false))
          case Some(e) =>
            val existing = ConfigCodec.decode(e.config)
            val ds = diffFields(effStream(existing), effStream(desiredS))
            Entry("stream", b.name, s.name,
              if (ds.isEmpty) "unchanged" else "updated", ds)
        }
      }
    }

  // ---- apply ------------------------------------------------------------

  /** Ensure the spec: create missing resources, update effectively-
    * changed configs, leave effectively-unchanged ones alone (no
    * catalog rewrite — the skip is what makes re-apply a no-op even
    * when the spec spells a default the stored config omits). Returns
    * the same row shape as [[plan]] with the ACTUAL outcomes. */
  def apply(catalog: Catalog, spec: ResourceSpec): Seq[Entry] = {
    val planned = plan(catalog, spec)
    planned.foreach { e =>
      if (e.action != "unchanged") {
        val b = spec.basins.find(_.name == e.basin).get
        if (e.kind == "basin") {
          val out = catalog.ensureBasin(e.basin,
            ConfigCodec.decodeBasin(b.config.getOrElse(Map.empty)))
          out.left.foreach(err => throw new IllegalArgumentException(
            s"apply failed for basin ${e.basin}: $err"))
        } else {
          val s = b.streams.find(_.name == e.stream).get
          val out = catalog.ensureStream(e.basin, e.stream,
            ConfigCodec.decode(s.config.getOrElse(Map.empty)))
          out.left.foreach(err => throw new IllegalArgumentException(
            s"apply failed for stream ${e.basin}/${e.stream}: $err"))
        }
      }
    }
    planned
  }
}
