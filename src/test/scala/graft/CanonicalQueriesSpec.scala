package graft

import graft.identity.{AssignIds, Groups}
import graft.index.Index
import graft.materialise.Materialise
import graft.merge.Merge
import graft.model.{IngestNode, MergedNode, RawValue}
import graft.query.Query
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** The reference's 4-query acceptance suite (FIXTURES.md §4, the
  * materialised Cypher queries in the reference's queries directory)
  * reproduced on a fixture graph shaped like the production one:
  * genes/orthologs/diseases/evidence/SNPs.
  */
class CanonicalQueriesSpec extends SparkSpec {

  def n(ids: Seq[String], ds: String, types: Seq[String], props: (String, Seq[RawValue])*): IngestNode =
    IngestNode(ids, ds, "fx", types, props.toMap)

  lazy val graphFixture: Seq[IngestNode] = Seq(
    // mouse genes, one with a human ortholog
    n(Seq("mgi:g1"), "impc", Seq("biolink:Gene"),
      "grebi:name" -> Seq(RawValue.str("Pax6")),
      "biolink:orthologous_to" -> Seq(RawValue.str("hgnc:8620"))),
    n(Seq("mgi:g2"), "impc", Seq("biolink:Gene"),
      "grebi:name" -> Seq(RawValue.str("Shh")),
      "biolink:orthologous_to" -> Seq(RawValue.str("hgnc:10848"))),
    // human genes
    n(Seq("hgnc:8620"), "hgnc", Seq("biolink:Gene"),
      "grebi:name" -> Seq(RawValue.str("PAX6"))),
    n(Seq("hgnc:10848"), "hgnc", Seq("biolink:Gene"),
      "grebi:name" -> Seq(RawValue.str("SHH"))),
    // diseases
    n(Seq("mondo:d1"), "mondo", Seq("biolink:Disease"),
      "grebi:name" -> Seq(RawValue.str("aniridia"))),
    n(Seq("mondo:d2"), "mondo", Seq("biolink:Disease"),
      "grebi:name" -> Seq(RawValue.str("holoprosencephaly"))),
    // OpenTargets-style evidence nodes (gene↔disease with a score)
    n(Seq("otar:ev1"), "otar", Seq("otar:Evidence"),
      "otar:targetId" -> Seq(RawValue.str("hgnc:8620")),
      "otar:diseaseId" -> Seq(RawValue.str("mondo:d1")),
      "otar:score" -> Seq(RawValue.str("0.93"))),
    n(Seq("otar:ev2"), "otar", Seq("otar:Evidence"),
      "otar:targetId" -> Seq(RawValue.str("hgnc:10848")),
      "otar:diseaseId" -> Seq(RawValue.str("mondo:d2")),
      "otar:score" -> Seq(RawValue.str("0.71"))),
    n(Seq("otar:ev3"), "otar", Seq("otar:Evidence"),
      "otar:targetId" -> Seq(RawValue.str("hgnc:8620")),
      "otar:diseaseId" -> Seq(RawValue.str("mondo:d2")),
      "otar:score" -> Seq(RawValue.str("0.12"))),
    // GWAS SNPs with reified associations to diseases
    n(Seq("gwas:rs1"), "gwas", Seq("gwas:SNP"),
      "gwas:associated_with" -> Seq(RawValue.reified("mondo:d1",
        Map("pvalue" -> Seq("0.00001"))))),
    n(Seq("gwas:rs2"), "gwas", Seq("gwas:SNP"),
      "gwas:associated_with" -> Seq(RawValue.reified("mondo:d2",
        Map("pvalue" -> Seq("0.004"))))))

  lazy val merged: Dataset[MergedNode] = {
    import spark.implicits._
    val ds = graphFixture.toDS()
    val groups = Groups.fromIdSets(ds.map(_.ids).toDF("ids"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    Merge(spark, AssignIds(spark, ds, groups)).cache()
  }
  lazy val meta = Index.metadata(merged).cache()
  lazy val edges = Materialise.edges(merged, meta).cache()

  test("Q-B: genes to diseases ranked by evidence score") {
    // evidence node → (targetId edge, diseaseId edge, score prop);
    // reference `queries/genes_to_diseases_ranked_by_otar_score.cypher`
    val s = spark
    import s.implicits._
    val target = edges.where(col("edgeType") === "otar:targetId")
      .select(col("fromNodeId").as("ev"), col("toNodeId").as("gene"))
    val disease = edges.where(col("edgeType") === "otar:diseaseId")
      .select(col("fromNodeId").as("ev"), col("toNodeId").as("disease"))
    val scores = merged.flatMap(m =>
        m.props.getOrElse("otar:score", Nil).headOption.map(v => (m.nodeId, v.value)))
      .toDF("ev", "score")
    val out = target.join(disease, "ev").join(scores, "ev")
      .select(col("gene"), col("disease"), col("score").cast("double").as("score"))
      .distinct()
      .orderBy(col("score").desc)
      .limit(10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("hgnc:8620", "mondo:d1", 0.93),
      ("hgnc:10848", "mondo:d2", 0.71),
      ("hgnc:8620", "mondo:d2", 0.12)))
  }

  test("Q-C: mouse genes to human diseases via orthologs") {
    // reference `queries/mouse_genes_to_human_diseases.cypher`
    val ortho = edges.where(col("edgeType") === "biolink:orthologous_to")
      .select(col("fromNodeId").as("mouse"), col("toNodeId").as("human"))
    val target = edges.where(col("edgeType") === "otar:targetId")
      .select(col("fromNodeId").as("ev"), col("toNodeId").as("human"))
    val disease = edges.where(col("edgeType") === "otar:diseaseId")
      .select(col("fromNodeId").as("ev"), col("toNodeId").as("disease"))
    val out = ortho.join(target, "human").join(disease, "ev")
      .select(col("mouse"), col("human"), col("disease")).distinct()
      .orderBy(col("mouse"), col("disease"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      ("mgi:g1", "hgnc:8620", "mondo:d1"),
      ("mgi:g1", "hgnc:8620", "mondo:d2"),
      ("mgi:g2", "hgnc:10848", "mondo:d2")))
  }

  test("Q-D: SNP to disease paths with p-values from reified edges") {
    // reference `queries/gwas_snps_to_human_diseases.cypher`
    val assoc = edges.where(col("edgeType") === "gwas:associated_with")
      .select(col("fromNodeId").as("snp"), col("toNodeId").as("disease"),
        get_json_object(col("qualifiersJson"), "$['pvalue'][0]").as("pvalue"))
    val named = assoc.join(meta.withColumnRenamed("nodeId", "disease"), "disease")
      .select(col("snp"), col("disease"), col("name"), col("pvalue"))
      .orderBy(col("snp"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(named.toSeq == Seq(
      ("gwas:rs1", "mondo:d1", "aniridia", "0.00001"),
      ("gwas:rs2", "mondo:d2", "holoprosencephaly", "0.004")))
  }

  test("Q-E: composed search page with facets and total") {
    val flat = meta.select(col("nodeId"),
      coalesce(col("name"), lit("")).as("name"),
      element_at(col("types"), 1).as("type"),
      element_at(col("datasources"), 1).as("ds"))
    val (hits, facetCounts, total) = Query.searchPage(
      flat, Map("nodeId" -> 1000.0, "name" -> 900.0), "hgnc:8620",
      filters = Map("type" -> Seq("biolink:Gene")),
      facetFields = Seq("type", "ds"), idCol = "nodeId", size = 5)
    assert(total == 1)
    assert(hits.collect().head.getAs[String]("nodeId") == "hgnc:8620")
    val f = facetCounts.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(f.contains(("type", "biolink:Gene", 1L))) // facet sees beyond its own filter
  }

  test("gwas 4-hop chain: alternation whitelist, reverse hop, and label filters all bind") {
    // hand fixture with one decoy per semantic axis of the notebook's
    // MATCH pattern (notebooks/gwas.ipynb): a wrong-typed hop-1 edge, an
    // out-of-whitelist hop-2 relation, a wrong-DIRECTION has_phenotype
    // edge at hop 3, and wrong node labels at the snp/assoc/allele ends
    import spark.implicits._
    val e = Seq(
      ("snp1", "dis1", "gwas:associated_with"),
      ("snp1", "dis1", "gwas:other_rel"),          // decoy edge type
      ("snpX", "dis1", "gwas:associated_with"),    // snpX not a gwas:SNP
      ("dis1", "ph1", "biolink:has_phenotype"),
      ("dis1", "ph2", "ro:causally_related_to"),
      ("dis1", "ph3", "ro:excluded_rel"),          // not in the alternation
      ("as1", "ph1", "biolink:has_phenotype"),     // the real reverse hop
      ("as2", "ph2", "biolink:has_phenotype"),     // as2 wrong label
      ("ph2", "as3", "biolink:has_phenotype"),     // wrong direction at hop 3
      ("as3", "dis1", "biolink:has_phenotype"),    // direct-route reverse hop
      ("as1", "al1", "impc:mouseAlleleId"),
      ("as1", "alX", "impc:mouseAlleleId"),        // alX wrong label
      ("as3", "al1", "impc:mouseAlleleId"))
      .toDF("fromNodeId", "toNodeId", "edgeType")
    val t = Seq(
      ("snp1", "gwas:SNP"), ("snpX", "other:Thing"),
      ("as1", "impc:GenePhenotypeAssociation"), ("as2", "impc:OtherAssoc"),
      ("as3", "impc:GenePhenotypeAssociation"),
      ("al1", "impc:Allele"), ("alX", "impc:Gene"))
      .toDF("nodeId", "nodeType")
    val seeds = t.where(col("nodeType") === "gwas:SNP").select(col("nodeId").as("snp"))
    val assocHop = Query.Hop(Seq("biolink:has_phenotype"), "in", "massoc",
      Some("impc:GenePhenotypeAssociation"))
    val alleleHop = Query.Hop(Seq("impc:mouseAlleleId"), "out", "allele", Some("impc:Allele"))
    val via = Query.matchChain(e, t, seeds, "snp", Seq(
      Query.Hop(Seq("gwas:associated_with"), "out", "disease"),
      Query.Hop(Seq("biolink:has_phenotype", "ro:causally_related_to",
        "ro:has_characteristic"), "out", "pheno"),
      assocHop, alleleHop))
      .select("snp", "disease", "pheno", "massoc", "allele")
      .as[(String, String, String, String, String)].collect().toSet
    assert(via === Set(("snp1", "dis1", "ph1", "as1", "al1")),
      s"via-disease chain matched the wrong paths: $via")
    val direct = Query.matchChain(e, t, seeds, "snp", Seq(
      Query.Hop(Seq("gwas:associated_with"), "out", "trait"),
      assocHop, alleleHop))
      .select("snp", "trait", "massoc", "allele")
      .as[(String, String, String, String)].collect().toSet
    assert(direct === Set(("snp1", "dis1", "as3", "al1")),
      s"direct chain matched the wrong paths: $direct")
  }

  test("Q-E: searchPage scans its input once (count fills the cache)") {
    import spark.implicits._
    val rowsRead = spark.sparkContext.longAccumulator("rowsRead")
    val base = meta.select(col("nodeId"),
        coalesce(col("name"), lit("")).as("name"),
        element_at(col("types"), 1).as("type"),
        element_at(col("datasources"), 1).as("ds"))
      .as[(String, String, String, String)]
      .map { r => rowsRead.add(1); r }
      .toDF("nodeId", "name", "type", "ds")
    val nInput = base.count()
    rowsRead.reset()
    val (hits, facetCounts, total) = Query.searchPage(
      base, Map("nodeId" -> 1000.0, "name" -> 900.0), "hgnc:8620",
      filters = Map("type" -> Seq("biolink:Gene")),
      facetFields = Seq("type", "ds"), idCol = "nodeId", size = 5)
    hits.collect(); facetCounts.collect()
    assert(total == 1)
    // one pass over the input: the persist fills on the count action, and
    // hits + both facet scans read the cache — without it this is ~4 passes
    assert(rowsRead.value == nInput,
      s"expected one scan ($nInput rows) but read ${rowsRead.value}")
  }
}
