package graft.ingest

import graft.SparkSpec
import graft.ingest.Ingest.TransformConfig

class IngestSpec extends SparkSpec {

  def fx(name: String): String =
    getClass.getClassLoader.getResource(s"fixtures/$name").getPath

  test("S7 generic jsonl: rename, inject type, key prefix, array fan-out") {
    val df = spark.read.json(fx("kgx_nodes.jsonl"))
    val nodes = Ingest.fromDataFrame(df, TransformConfig(
      idFields = Seq("geneAccessionId"),
      datasource = "impc", subgraph = "fx",
      injectTypes = Seq("biolink:Gene"),
      renameFields = Map("name" -> "grebi:name"),
      injectKeyPrefix = "impc:")).collect()
    assert(nodes.length == 2)
    val pax = nodes.find(_.ids == Seq("MGI:97490")).get
    assert(pax.types == Seq("biolink:Gene"))
    assert(pax.props("grebi:name").map(_.value) == Seq("Pax6"))
    assert(pax.props("impc:humanGeneOrthologues").map(_.value) == Seq("hgnc:8620", "hgnc:8621"))
    assert(pax.props("impc:pmId").map(_.value) == Seq("12345678"))
    assert(!pax.props.contains("impc:geneAccessionId")) // id key removed from props
  }

  test("S7 hash id injection is deterministic") {
    val df = spark.read.json(fx("kgx_nodes.jsonl"))
    val n1 = Ingest.fromDataFrame(df, TransformConfig(idFields = Nil,
      datasource = "d", subgraph = "s", injectHashId = true)).collect()
    val n2 = Ingest.fromDataFrame(df, TransformConfig(idFields = Nil,
      datasource = "d", subgraph = "s", injectHashId = true)).collect()
    assert(n1.map(_.ids).toSet == n2.map(_.ids).toSet)
    assert(n1.forall(_.ids.head.startsWith("hash:")))
  }

  test("S6 kgx edges: subject-keyed reified predicate") {
    val df = spark.read.json(fx("kgx_edges.jsonl"))
    val nodes = Ingest.fromKgxEdges(df, "kgx", "fx").collect()
    assert(nodes.length == 2)
    val pax = nodes.find(_.ids == Seq("MGI:97490")).get
    val v = pax.props("biolink:has_phenotype").head
    assert(v.value == "MP:0001286")
    assert(v.qualifiers("pvalue") == Seq("0.003"))
    assert(v.qualifiers("knowledge_source") == Seq("fixture"))
  }

  test("S5 sssom: curie_map contraction + reified mapping metadata") {
    val nodes = Ingest.fromSssom(spark, fx("mappings.sssom.tsv"), "sssom", "fx").collect()
    assert(nodes.length == 2)
    val mondo = nodes.find(_.ids == Seq("MONDO:0005044")).get // IRI contracted
    val v = mondo.props("skos:exactMatch").head
    assert(v.value == "EFO:0000537")
    assert(v.qualifiers("confidence") == Seq("0.99"))
    assert(nodes.exists(_.ids == Seq("MGI:97490"))) // identifiers.org IRI contracted
  }

  test("S3 tsv: multi-value split + empty drop (GWAS shape)") {
    val nodes = Ingest.fromTsv(spark, fx("assoc.tsv"),
      TransformConfig(idFields = Seq("SNPS"), datasource = "gwas", subgraph = "fx",
        injectTypes = Seq("gwas:SNP")),
      multiValueSep = Some(",")).collect()
    assert(nodes.length == 2)
    val rs = nodes.find(_.ids == Seq("rs1234")).get
    assert(rs.props("MAPPED_TRAIT_URI").map(_.value) ==
      Seq("http://www.ebi.ac.uk/efo/EFO_0000537", "http://www.ebi.ac.uk/efo/EFO_0001360"))
  }

  test("S12 nodes2edges: from/to props become a reified edge node") {
    val df = spark.read.json(fx("kgx_nodes.jsonl"))
    val base = Ingest.fromDataFrame(df, TransformConfig(
      idFields = Seq("geneAccessionId"), datasource = "impc", subgraph = "fx"))
    // re-key: orthologue edge gene→human gene
    val withId = base.map(n => n.copy(props = n.props.updated("self",
      Seq(graft.model.RawValue.str(n.ids.head)))))(base.encoder)
    val edges = Ingest.nodesToEdges(withId, "self", "humanGeneOrthologues",
      "biolink:orthologous_to").collect()
    assert(edges.length == 3) // 2 + 1 orthologues
    assert(edges.forall(_.props.contains("biolink:orthologous_to")))
  }

  test("S2 triples: subject grouping + OWL axiom reification collapse") {
    val triples = Ingest.parseNTriples(spark, fx("triples.nt"))
    assert(triples.count() == 11)
    val nodes = Ingest.fromTriples(triples, "rdf", "fx").collect()
    assert(nodes.length == 2) // axiom node folded away
    val t2d = nodes.find(_.ids == Seq("http://purl.obolibrary.org/obo/MONDO_0005044")).get
    assert(t2d.types == Seq("owl:Class"))
    assert(t2d.props("rdfs:label").map(_.value) == Seq("type 2 diabetes mellitus"))
    val sub = t2d.props("rdfs:subClassOf").head
    assert(sub.value == "http://purl.obolibrary.org/obo/MONDO_0005015")
    // one axiom with TWO values of the same annotation property: the
    // qualifier map must carry both (duplicate keys previously crashed)
    assert(sub.qualifiers == Map("oboInOwl:source" -> Seq("DOID:9352", "NCIT:C26747")))
  }

  test("S7 nested structs render as valid JSON; colliding keys merge") {
    import spark.implicits._
    // array inside a nested struct: previously leaked `WrappedArray(..)`
    val df = spark.read.json(Seq(
      """{"id":"x:1","meta":{"tags":["a","b"],"score":1.5,"n":3}}""").toDS())
    val n = Ingest.fromDataFrame(df, TransformConfig(
      idFields = Seq("id"), datasource = "d", subgraph = "s")).collect().head
    val json = n.props("meta").head.value
    val parsed = org.json4s.jackson.JsonMethods.parse(json) // must be valid JSON
    assert((parsed \ "tags") == org.json4s.JArray(List(
      org.json4s.JString("a"), org.json4s.JString("b"))))
    // two source keys renamed onto the same effective key MERGE lists
    val df2 = spark.read.json(Seq(
      """{"id":"x:2","label":"A","title":"B"}""").toDS())
    val n2 = Ingest.fromDataFrame(df2, TransformConfig(
      idFields = Seq("id"), datasource = "d", subgraph = "s",
      renameFields = Map("label" -> "grebi:name", "title" -> "grebi:name")))
      .collect().head
    assert(n2.props("grebi:name").map(_.value).sorted == Seq("A", "B"))
  }

  test("S4 gwas: filename routing, header asserts, reified associations") {
    val dir = java.nio.file.Files.createTempDirectory("gwas")
    def tsv(name: String, header: Seq[String], rows: Seq[Seq[String]]): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.writeString(p,
        (header +: rows).map(_.mkString("\t")).mkString("\n") + "\n")
      p.toString
    }
    // associations: row with two mapped traits and two reported genes
    val assocRow = Ingest.gwasAssociationHeaders.map {
      case "SNPS" => "rs123"
      case "MAPPED_TRAIT_URI" => "efo:1, efo:2"
      case "REPORTED GENE(S)" => "PAX6, SHH"
      case "MAPPED_GENE" => "PAX6"
      case "P-VALUE" => "0.00001"
      case "STUDY ACCESSION" => "GCST001"
      case "CNV" => "" // empty field drops
      case h => h.toLowerCase.take(5)
    }
    val assoc = Ingest.fromGwas(spark,
      tsv("gwas-catalog-associations.tsv", Ingest.gwasAssociationHeaders, Seq(assocRow)),
      "gwas").collect()
    assert(assoc.length == 1)
    val snp = assoc.head
    assert(snp.ids == Seq("rs123") && snp.types == Seq("gwas:SNP"))
    val assoc2 = snp.props("gwas:associated_with")
    assert(assoc2.map(_.value) == Seq("efo:1", "efo:2"))
    assert(assoc2.head.qualifiers("gwas:p_value") == Seq("0.00001"))
    assert(assoc2.head.qualifiers("gwas:reported_gene") == Seq("PAX6", "SHH"))
    assert(!assoc2.head.qualifiers.contains("gwas:cnv")) // empty dropped
    // studies layout routed by filename
    val studyRow = Ingest.gwasStudyHeaders.map {
      case "STUDY ACCESSION" => "GCST001"
      case "PUBMEDID" => "123"
      case h => h.toLowerCase.take(4)
    }
    val studies = Ingest.fromGwas(spark,
      tsv("gwas-catalog-studies.tsv", Ingest.gwasStudyHeaders, Seq(studyRow)),
      "gwas").collect()
    assert(studies.head.ids == Seq("GCST001"))
    assert(studies.head.types == Seq("gwas:Study"))
    assert(studies.head.props("gwas:pubmedid").map(_.value) == Seq("pmid:123"))
    // malformed header → loud rejection, like the reference's panic
    val bad = Ingest.gwasAssociationHeaders.updated(2, "WRONG")
    assertThrows[IllegalArgumentException] {
      Ingest.fromGwas(spark,
        tsv("gwas-catalog-associations-bad.tsv", bad, Seq(assocRow)), "gwas")
    }
    // unknown filename → rejection
    assertThrows[IllegalArgumentException] {
      Ingest.fromGwas(spark,
        tsv("mystery.tsv", Ingest.gwasStudyHeaders, Nil), "gwas")
    }
  }

  test("S10 metabolights xml: entries, refs, dates, fields, typing, chemical agg") {
    val xml =
      """<database><entries>
        |<entry id="MTBLS1"><name>Study &amp; one</name>
        |  <description>desc1</description>
        |  <cross_references><ref dbkey="chebi:1" dbname="ChEBI"/></cross_references>
        |  <dates><date type="submission" value="2020-01-02"/><date type="publication" value="2021-03-04"/></dates>
        |  <additional_fields><field name="organism">human</field><field name="organism">mouse</field></additional_fields>
        |</entry>
        |<entry id="MTBLC2"><name>caffeine</name>
        |  <cross_references><ref dbkey="chebi:27732"/><ref dbkey="pubchem:2519"/></cross_references>
        |  <additional_fields><field name="inchi">InChI=1S/C8H10N4O2</field><field name="formula">C8H10N4O2</field></additional_fields>
        |</entry>
        |</entries></database>""".stripMargin
    val nodes = Ingest.parseMetabolightsEntries(xml, "mtbls", "sg").toSeq
    assert(nodes.map(_.ids) == Seq(Seq("MTBLS1"), Seq("MTBLC2")))
    val study = nodes.head
    assert(study.types == Seq("metabolights:Study"))
    assert(study.props("grebi:name").map(_.value) == Seq("Study & one"))
    assert(study.props("grebi:description").map(_.value) == Seq("desc1"))
    assert(study.props("metabolights:ref").map(_.value) == Seq("chebi:1"))
    assert(study.props("metabolights:submission_date").map(_.value) == Seq("2020-01-02"))
    assert(study.props("metabolights:publication_date").map(_.value) == Seq("2021-03-04"))
    assert(study.props("metabolights:organism").map(_.value) == Seq("human", "mouse"))
    val chem = nodes(1)
    assert(chem.types == Seq("metabolights:Chemical"))
    assert(!chem.props.contains("grebi:description"))
    // chemical = refs ++ inchi ++ formula, in that order (ingest.py:40-45)
    assert(chem.props("metabolights:chemical").map(_.value) ==
      Seq("chebi:27732", "pubchem:2519", "InChI=1S/C8H10N4O2", "C8H10N4O2"))
    // unknown prefix is rejected loudly, like the reference's assert
    assertThrows[IllegalArgumentException] {
      Ingest.parseMetabolightsEntries(
        """<entries><entry id="XXX9"><name>n</name></entry></entries>""", "d", "s").toSeq
    }
  }

  test("S9 reactome: node/relationship records, equivalence derivation") {
    val trie = graft.curie.PrefixTrie(Map(
      "http://purl.obolibrary.org/obo/CHEBI_" -> "chebi:",
      "uniprot:" -> "up:"))
    val lines = Seq(
      // node whose url compacts to a curie and which carries a taxId
      """{"id":"42","type":"node","labels":["EntityWithAccessionedSequence","PhysicalEntity"],
        |"properties":{"displayName":"EGFR","url":"http://purl.obolibrary.org/obo/CHEBI_4534","taxId":"9606","stId":"R-HSA-179837"}}""".stripMargin.replace("\n", ""),
      // node whose identifier compacts
      """{"id":"43","type":"node","labels":["ReferenceEntity"],"properties":{"identifier":"uniprot:P00533"}}""",
      // node with nothing compactable -> no grebi:equivalentTo
      """{"id":"44","type":"node","labels":["Pathway"],"properties":{"displayName":"Signaling"}}""",
      // relationship: start-keyed node with reified end value, props on the node
      """{"id":"900","type":"relationship","label":"input","start":{"id":"42"},"end":{"id":"44"},"properties":{"order":1}}""")
    val dir = java.nio.file.Files.createTempDirectory("reactome")
    java.nio.file.Files.writeString(dir.resolve("dump.jsonl"), lines.mkString("\n"))
    val nodes = Ingest.fromReactome(spark, dir.toString, trie)
      .collect().sortBy(_.ids.head)
    assert(nodes.map(_.ids.head).toSeq ==
      Seq("reactome_42", "reactome_42", "reactome_43", "reactome_44"))
    val n42 = nodes.find(n => n.ids.head == "reactome_42" && n.types.nonEmpty).get
    assert(n42.types == Seq("reactome:EntityWithAccessionedSequence", "reactome:PhysicalEntity"))
    assert(n42.props("reactome:displayName").map(_.value) == Seq("EGFR"))
    assert(n42.props("grebi:equivalentTo").map(_.value) == Seq("chebi:4534", "ncbitaxon:9606"))
    val n43 = nodes.find(_.ids.head == "reactome_43").get
    assert(n43.props("grebi:equivalentTo").map(_.value) == Seq("up:P00533"))
    val n44 = nodes.find(_.ids.head == "reactome_44").get
    assert(!n44.props.contains("grebi:equivalentTo"))
    val rel = nodes.find(n => n.ids.head == "reactome_42" && n.types.isEmpty).get
    assert(rel.props("reactome:input").map(_.value) == Seq("reactome_44"))
    assert(rel.props("reactome:order").map(_.value) == Seq("1"))
    assertThrows[org.apache.spark.SparkException] { // wraps the IllegalArgumentException
      java.nio.file.Files.writeString(dir.resolve("bad.jsonl"),
        """{"id":"1","type":"mystery","properties":{}}""")
      Ingest.fromReactome(spark, dir.resolve("bad.jsonl").toString, trie).collect()
    }
  }

  test("S8 table: PK prefixing + FK rewrite to referenced ids") {
    import spark.implicits._
    val genes = Seq((1L, "Pax6"), (2L, "Shh")).toDF("gene_id", "symbol")
    val phenos = Seq((10L, 1L, "small eyes"), (11L, 2L, "polydactyly"))
      .toDF("phenotype_id", "gene_id", "label")
    val gn = Ingest.fromTable(genes, "genes", "gene_id", Map.empty, "db", "fx").collect()
    val pn = Ingest.fromTable(phenos, "phenotypes", "phenotype_id",
      Map("gene_id" -> "genes"), "db", "fx").collect()
    assert(gn.map(_.ids.head).toSet == Set("genes:1", "genes:2"))
    assert(gn.head.types == Seq("Gene"))
    val p10 = pn.find(_.ids == Seq("phenotypes:10")).get
    assert(p10.props("gene_id").map(_.value) == Seq("genes:1")) // FK → graph edge target
    assert(p10.types == Seq("Phenotype"))
  }
}
