package graft

import graft.identity.{AssignIds, Groups}
import graft.index.Index
import graft.materialise.Materialise
import graft.merge.Merge
import graft.model.{IngestNode, MergedNode, RawValue}
import graft.query.Query
import graft.sinks.Sinks
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** End-to-end acceptance run on the FIXTURES.md §4 graph: genes →
  * has_phenotype → phenotypes → part_of → systems, with a cross-datasource
  * equivalence (mgi:g1 ≡ hgnc:h1). Mirrors the reference's de-facto
  * acceptance suite (the 4 golden Cypher queries run after every dataload,
  * `08_run_queries/run_queries.dockerpy:18-56`).
  */
class PipelineSpec extends SparkSpec {

  def n(ids: Seq[String], ds: String, types: Seq[String], props: (String, Seq[RawValue])*): IngestNode =
    IngestNode(ids, ds, "fixture", types, props.toMap)

  lazy val ingested: Seq[IngestNode] = Seq(
    // datasource A: mouse genes with phenotype links (reified p-values)
    n(Seq("mgi:g1", "hgnc:h1"), "dsA", Seq("biolink:Gene"),
      "grebi:name" -> Seq(RawValue.str("Pax6")),
      "biolink:has_phenotype" -> Seq(
        RawValue.reified("mp:p1", Map("pvalue" -> Seq("0.001"))),
        RawValue.reified("mp:p2", Map("pvalue" -> Seq("0.04"))))),
    n(Seq("mgi:g2"), "dsA", Seq("biolink:Gene"),
      "grebi:name" -> Seq(RawValue.str("Shh")),
      "biolink:has_phenotype" -> Seq(RawValue.str("mp:p2"), RawValue.str("mp:p3"))),
    n(Seq("mgi:g3"), "dsA", Seq("biolink:Gene"),
      "grebi:name" -> Seq(RawValue.str("Fgf8")),
      "biolink:has_phenotype" -> Seq(RawValue.str("mp:p4"))),
    // datasource B: phenotypes → systems; re-asserts g1 under its HGNC id
    n(Seq("hgnc:h1"), "dsB", Nil, "grebi:name" -> Seq(RawValue.str("PAX6"))),
    n(Seq("mp:p1"), "dsB", Seq("biolink:PhenotypicFeature"),
      "grebi:name" -> Seq(RawValue.str("small eyes")),
      "bfo:part_of" -> Seq(RawValue.str("uberon:s1"))),
    n(Seq("mp:p2"), "dsB", Seq("biolink:PhenotypicFeature"),
      "grebi:name" -> Seq(RawValue.str("absent cornea")),
      "bfo:part_of" -> Seq(RawValue.str("uberon:s1"))),
    n(Seq("mp:p3"), "dsB", Seq("biolink:PhenotypicFeature"),
      "grebi:name" -> Seq(RawValue.str("short tail")),
      "bfo:part_of" -> Seq(RawValue.str("uberon:s2"))),
    n(Seq("mp:p4"), "dsB", Seq("biolink:PhenotypicFeature"),
      "grebi:name" -> Seq(RawValue.str("kinked tail")),
      "bfo:part_of" -> Seq(RawValue.str("uberon:s2"))),
    n(Seq("uberon:s1"), "dsB", Seq("uberon:AnatomicalSystem"),
      "grebi:name" -> Seq(RawValue.str("visual system"))),
    n(Seq("uberon:s2"), "dsB", Seq("uberon:AnatomicalSystem"),
      "grebi:name" -> Seq(RawValue.str("skeletal system"))))

  lazy val merged: Dataset[MergedNode] = {
    import spark.implicits._
    val ds = ingested.toDS()
    val groups = Groups.fromIdSets(ds.map(_.ids).toDF("ids"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    Merge(spark, AssignIds(spark, ds, groups)).cache()
  }

  lazy val meta = Index.metadata(merged).cache()
  lazy val edges = Materialise.edges(merged, meta).cache()

  test("cross-datasource clique merges to one node") {
    val nodes = merged.collect()
    assert(nodes.length == 9) // 10 ingest records, g1+h1 merged
    val g1 = nodes.find(_.nodeId == "hgnc:h1").get // 'h' < 'm' at equal score
    assert(g1.datasources == Seq("dsA", "dsB"))
    assert(g1.props("grebi:name").map(_.value).sorted == Seq("PAX6", "Pax6"))
  }

  test("materialise: prop values that are node ids become edges") {
    val e = edges.collect()
    assert(e.count(_.getAs[String]("edgeType") == "biolink:has_phenotype") == 5)
    assert(e.count(_.getAs[String]("edgeType") == "bfo:part_of") == 4)
    // edge ids deterministic + unique
    assert(e.map(_.getAs[String]("edgeId")).distinct.length == e.length)
  }

  test("canonical query Q-A: phenotype count by system, ordered") {
    // genes -[has_phenotype]-> phenotype -[part_of]-> system, count genes per system
    val hp = edges.where(col("edgeType") === "biolink:has_phenotype")
      .select(col("fromNodeId").as("gene"), col("toNodeId").as("phenotype"))
    val po = edges.where(col("edgeType") === "bfo:part_of")
      .select(col("fromNodeId").as("phenotype"), col("toNodeId").as("system"))
    val out = hp.join(po, "phenotype")
      .groupBy("system").agg(countDistinct("gene").as("n_genes"))
      .orderBy(col("n_genes").desc, col("system"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("uberon:s1", 2L), ("uberon:s2", 2L)))
  }

  test("reified qualifiers surface as edge properties") {
    val withP = edges.where(col("qualifiersJson").contains("pvalue")).collect()
    assert(withP.length == 2)
  }

  test("display type is the globally rarest type") {
    val counts = Index.typeCounts(merged)
    val dt = Materialise.displayTypes(merged, counts)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dt("hgnc:h1") == "biolink:Gene")
    assert(dt("uberon:s1") == "uberon:AnatomicalSystem")
  }

  test("refs embed referenced-node metadata") {
    val r = Materialise.refs(merged, meta)
      .where(col("fromNodeId") === "hgnc:h1").collect()
    assert(r.length == 1)
    val m = r.head.getAs[Map[String, Any]]("refs")
    assert(m.keySet == Set("mp:p1", "mp:p2"))
  }

  test("search: weighted field scoring ranks exact over contains") {
    val flat = meta.withColumn("name", coalesce(col("name"), lit("")))
    val hits = Query.search(flat,
      Map("nodeId" -> 1000.0, "name" -> 900.0), "Pax6", "nodeId", size = 5)
      .collect()
    assert(hits.nonEmpty)
    assert(hits.head.getAs[String]("nodeId") == "hgnc:h1") // name exact (900) beats none
  }

  test("facets: a field's own filter is excluded from its counts") {
    val typed = meta.select(col("nodeId"),
      element_at(col("types"), 1).as("t"), element_at(col("datasources"), 1).as("d"))
    val f = Query.facets(typed, Map("t" -> Seq("biolink:Gene")), Seq("t", "d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // facet on t ignores the t filter → all types counted
    assert(f.contains(("t", "biolink:PhenotypicFeature", 4L)))
    // facet on d respects the t filter → only gene rows
    assert(f.filter(_._1 == "d").map(_._3).sum == 3L)
  }

  test("autocomplete: exact > prefix > word-prefix") {
    val names = Index.names(merged)
    val hits = Query.autocomplete(names, "s", size = 10).collect().map(_.getString(0))
    assert(hits.take(2).toSeq == Seq("Shh", "short tail")) // whole-string prefix tier (2.0), alphabetical
    assert(hits.contains("visual system")) // word-prefix tier
    val exact = Query.autocomplete(names, "small eyes", size = 3).collect()
    assert(exact.head.getString(0) == "small eyes" && exact.head.getDouble(1) == 10.0)
  }

  test("traversal: bounded BFS depth labelling") {
    import spark.implicits._
    val seeds = Seq("hgnc:h1").toDF("nodeId")
    val reach = Query.reachable(edges, seeds, Seq("biolink:has_phenotype", "bfo:part_of"), 3)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(reach == Map("hgnc:h1" -> 0, "mp:p1" -> 1, "mp:p2" -> 1, "uberon:s1" -> 2))
  }

  test("traversal terminates on cyclic graphs (visited-set dedup)") {
    import spark.implicits._
    val cyc = Seq(("a", "b", "t"), ("b", "c", "t"), ("c", "a", "t"))
      .toDF("fromNodeId", "toNodeId", "edgeType")
    val reach = Query.reachable(cyc, Seq("a").toDF("nodeId"), Nil, maxDepth = 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(reach == Map("a" -> 0, "b" -> 1, "c" -> 2)) // cycle does not revisit a
  }

  test("kv store sink: point lookup round-trips a deterministic record") {
    val path = java.nio.file.Files.createTempDirectory("kv").toString
    Sinks.writeKvStore(merged, path, buckets = 2)
    val got = Sinks.kvLookup(spark, path, "uberon:s1")
    assert(got.isDefined)
    assert(got.get.startsWith("""{"grebi:nodeId":"uberon:s1","grebi:datasources":["dsB"]"""))
    assert(Sinks.kvLookup(spark, path, "nope:0").isEmpty)
    // the one-shot write IS generation 0 of the generational layout, so
    // incremental refreshes append to the same store with no migration
    assert(new java.io.File(path, "gen=0").isDirectory)
    import spark.implicits._
    graft.sinks.KvGenStore.append(
      Seq(("uberon:s1", """{"v":"newer"}"""),
          ("uberon:s2", null.asInstanceOf[String])).toDF("key", "value"),
      path, buckets = 2)
    assert(Sinks.kvLookup(spark, path, "uberon:s1") === Some("""{"v":"newer"}"""),
      "kvLookup serves the newest generation, not gen=0")
    assert(Sinks.kvLookup(spark, path, "uberon:s2").isEmpty,
      "a NULL tombstone in a newer generation hides the base record")
  }

  test("neo4j csv sink: wide pivot with 0x1F arrays") {
    val counts = Index.typeCounts(merged)
    val dt = Materialise.displayTypes(merged, counts)
    val keys = Index.entityPropCounts(merged).collect().map(_.getString(0)).toSeq
    val csv = Sinks.neoNodesCsvFrame(merged, keys, dt)
    assert(csv.columns.contains("grebi:nodeId:ID") && csv.columns.contains(":LABEL"))
    val g1 = csv.where(col("grebi:nodeId:ID") === "hgnc:h1").collect().head
    assert(g1.getAs[String](":LABEL") == s"GraphNode${Sinks.ArraySep}biolink:Gene")
    assert(g1.getAs[String]("grebi:name").split(Sinks.ArraySep).sorted.toSeq == Seq("PAX6", "Pax6"))
  }

  test("neo4j csv bytes: reference escaping for quotes, newlines, tabs, backslashes") {
    import spark.implicits._
    import graft.model.{MergedNode, PropValue}
    def pv(v: String) = PropValue(v, "s", Seq("ds"), Nil, Map.empty)
    val nodes = Seq(MergedNode("x:1", Seq("ds"), Seq("x:1"), "fx",
      Map("grebi:type" -> Seq(pv("T")),
        "torture" -> Seq(pv("he\"llo, wor\nld"), pv("tab\there\\done"))))).toDS()
    val dt = Seq(("x:1", "T")).toDF("nodeId", "displayType")
    val dir = java.nio.file.Files.createTempDirectory("neo_csv").toString + "/out"
    Sinks.writeCsv(Sinks.neoNodesCsvFrame(nodes, Seq("torture"), dt).coalesce(1), dir)
    val part = new java.io.File(dir).listFiles().find(_.getName.startsWith("part-")).get
    val lines = java.nio.file.Files.readAllLines(part.toPath)
    // the embedded newline is \n-ESCAPED (grebi_make_neo_csv/src/main.rs:
    // 347-359), so the record stays on ONE line; quotes double; every
    // field is quoted
    assert(lines.size == 2)
    val sep = Sinks.ArraySep
    assert(lines.get(1) ==
      s""""x:1","GraphNode${sep}T","ds","fx","T","he""llo, wor\\nld${sep}tab\\there\\\\done"""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir).getParentFile)
  }

  test("per-prop self-referential exclusion matches the reference rule") {
    import spark.implicits._
    import graft.model.PropValue
    def pv(v: String) = PropValue(v, "s", Seq("ds"), Nil, Map.empty)
    val nodes = Seq(
      MergedNode("a:1", Seq("ds"), Seq("a:1"), "fx",
        Map("grebi:type" -> Seq(pv("T")),
          "self:loop" -> Seq(pv("a:1")),   // self-edge, excluded prop
          "keep:loop" -> Seq(pv("a:1")),   // self-edge, kept prop
          "link" -> Seq(pv("b:2")))),
      MergedNode("b:2", Seq("ds"), Seq("b:2"), "fx",
        Map("grebi:type" -> Seq(pv("T"))))).toDS()
    val metadata = Seq(("a:1", "A", Seq("T")), ("b:2", "B", Seq("T")))
      .toDF("nodeId", "name", "types")
    val perProp = Materialise.edges(nodes, metadata,
      selfReferentialProps = Some(Set("self:loop")))
      .select("edgeType").collect().map(_.getString(0)).sorted.toSeq
    // only the listed prop's self-edge drops; the other self-edge stays
    assert(perProp == Seq("keep:loop", "link"))
    val blanket = Materialise.edges(nodes, metadata)
      .select("edgeType").collect().map(_.getString(0)).toSeq
    assert(blanket == Seq("link"))
  }

  test("id-edge CSVs: one sourceId edge per source id, distinct Id nodes") {
    val idEdges = Sinks.neoIdEdgesCsvFrame(merged).collect()
    assert(idEdges.length == merged.collect().map(_.sourceIds.size).sum)
    assert(idEdges.exists(r => r.getString(0) == "hgnc:h1" && r.getString(2) == "mgi:g1"))
    val idNodes = Sinks.neoIdNodesCsvFrame(merged).collect()
    assert(idNodes.map(_.getString(0)).distinct.length == idNodes.length)
  }

  test("renderNode keeps JSON value types (numbers/bools unquoted)") {
    import graft.model.{Kind, PropValue}
    val n = graft.model.MergedNode("x:1", Seq("ds"), Seq("x:1"), "fx",
      Map("num" -> Seq(PropValue("42", Kind.Num, Seq("ds"), Nil, Map.empty)),
          "flag" -> Seq(PropValue("true", Kind.Bool, Seq("ds"), Nil, Map.empty)),
          "txt" -> Seq(PropValue("hi", Kind.Str, Seq("ds"), Nil, Map.empty))))
    val json = Sinks.renderNode(n)
    assert(json.contains("\"grebi:value\":42"))
    assert(json.contains("\"grebi:value\":true"))
    assert(json.contains("\"grebi:value\":\"hi\""))
    // still valid JSON
    org.json4s.jackson.JsonMethods.parse(json)
  }

  test("solr docs sink: __ keys, unwrapped values") {
    val docs = Sinks.solrDocs(merged).collect()
    val g1 = docs.find(_.contains("\"grebi__nodeId\":[\"hgnc:h1\"]")).get
    assert(g1.contains("\"biolink__has_phenotype\""))
    assert(!g1.replace("http://", "").contains("grebi:")) // all keys munged
  }
}
