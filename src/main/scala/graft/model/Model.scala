package graft.model

/** Core data model of the graft property-graph engine.
  *
  * The reference (EBISPOT/GrEBI) streams row-oriented JSONL records with an
  * open, dynamic schema: any property key can appear on any node, every
  * property value is multi-valued, and each value is tagged with the
  * datasources/source-ids that asserted it (SURVEY.md §1.1; writer:
  * reference `03_merge/grebi_merge/src/main.rs:220-379`).
  *
  * Spark-first restatement (SURVEY.md §1.5): props live in a
  * `Map[String, Seq[...]]` column — NOT one column per property — so the
  * schema stays fixed while the key space is unbounded data. Values are
  * carried as canonical JSON-encoded strings plus a kind tag (the reference
  * also compares/joins on the string form). Pivoting to wide columns
  * happens only at sink time (Neo4j CSV / Solr docs).
  */
object Kind {
  val Str = "s"
  val Num = "n"
  val Bool = "b"
  val Null = "z"
  /** JSON object/array carried verbatim. */
  val Json = "j"
}

/** A property value as ingested, before provenance merging.
  * `qualifiers` models the reference's reified values
  * `{"grebi:value": v, "grebi:properties": {...}}`
  * (`grebi_shared/src/slice_merged_entity.rs:143-202`) — edge metadata that
  * travels on a node property until materialisation. */
final case class RawValue(
    value: String,
    kind: String,
    qualifiers: Map[String, Seq[String]])

object RawValue {
  def str(v: String): RawValue = RawValue(v, Kind.Str, Map.empty)
  def reified(v: String, quals: Map[String, Seq[String]]): RawValue =
    RawValue(v, Kind.Str, quals)
}

/** One node as emitted by an ingest adapter (SURVEY §2.1 S1–S13 all emit
  * this shape; cf. `01_ingest/grebi_transform_jsonl/src/main.rs:85-129`).
  * `ids` is the full identifier set (the `id` property may be an array). */
final case class IngestNode(
    ids: Seq[String],
    datasource: String,
    subgraph: String,
    types: Seq[String],
    props: Map[String, Seq[RawValue]])

/** A property value after merging, carrying full provenance
  * (`03_merge/grebi_merge/src/main.rs:303-360`). */
final case class PropValue(
    value: String,
    kind: String,
    datasources: Seq[String],
    sourceIds: Seq[String],
    qualifiers: Map[String, Seq[String]])

/** A clique-merged entity (`03_merge/grebi_merge/src/main.rs:220-379`). */
final case class MergedNode(
    nodeId: String,
    datasources: Seq[String],
    sourceIds: Seq[String],
    subgraph: String,
    props: Map[String, Seq[PropValue]])

/** A materialised edge (`05_materialise/grebi_materialise/src/main.rs:333-438`).
  * `edgeId` is a content hash — deterministic across runs and shuffles. */
final case class MaterialisedEdge(
    edgeId: String,
    edgeType: String,
    fromNodeId: String,
    toNodeId: String,
    datasources: Seq[String],
    subgraph: String,
    props: Map[String, Seq[String]])
