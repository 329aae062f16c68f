package graft.ingest

import graft.SparkSpec

/** S2 front-end parsers ([[Rdf]]) + the rdf2jsonl nesting/exclusion
  * options on [[Ingest.fromTriples]]. */
class RdfSpec extends SparkSpec {

  private val Ex = "http://example.org/"
  private val RT = Rdf.RdfType

  // ------------------------------------------------------------- Turtle

  test("turtle: directives, pn names, literals, escapes, numbers, lists") {
    val ttl =
      """@prefix ex: <http://example.org/> .
        |PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |@base <http://base.org/dir/> .
        |# a comment
        |ex:s a ex:T1, ex:T2 ;
        |  ex:lit "plain" ;
        |  ex:esc "q\"uote\nlineA" ;
        |  ex:lang "hello"@en ;
        |  ex:dt "42"^^xsd:int ;
        |  ex:num 3.14 ;
        |  ex:neg -7 ;
        |  ex:exp 1.0e3 ;
        |  ex:flag true ;
        |  ex:rel <child> ;
        |  ex:frag <#f> .
        |_:b1 ex:knows _:b2 .
        |[ ex:p1 "inner" ] ex:p2 "outer" .
        |ex:list ex:items ( ex:a "x" 2 ) .
        |ex:long ex:t '''line1
        |"line2"''' .
        |""".stripMargin
    val got = Rdf.parseTurtleString(ttl, scope = "t").toSet
    val s = Ex + "s"
    assert(got.contains((s, RT, Ex + "T1")))
    assert(got.contains((s, RT, Ex + "T2")))
    assert(got.contains((s, Ex + "lit", "plain")))
    assert(got.contains((s, Ex + "esc", "q\"uote\nlineA")))
    assert(got.contains((s, Ex + "lang", "hello")))
    assert(got.contains((s, Ex + "dt", "42")))
    assert(got.contains((s, Ex + "num", "3.14")))
    assert(got.contains((s, Ex + "neg", "-7")))
    assert(got.contains((s, Ex + "exp", "1.0e3")))
    assert(got.contains((s, Ex + "flag", "true")))
    assert(got.contains((s, Ex + "rel", "http://base.org/dir/child")))
    assert(got.contains((s, Ex + "frag", "http://base.org/dir/#f")))
    // labelled blanks keep their (scoped) labels
    assert(got.contains(("_:tb1", Ex + "knows", "_:tb2")))
    // anonymous property list: same fresh subject on both triples
    val anon = got.collect { case (a, p, "inner") if p == Ex + "p1" => a }
    assert(anon.size == 1)
    assert(got.contains((anon.head, Ex + "p2", "outer")))
    // collection → rdf:first/rest chain ending in rdf:nil
    val head = got.collect { case (l, p, h) if l == Ex + "list" && p == Ex + "items" => h }.head
    def first(c: String) = got.collect { case (`c`, p, v) if p == Rdf.RdfFirst => v }.head
    def rest(c: String) = got.collect { case (`c`, p, v) if p == Rdf.RdfRest => v }.head
    assert(first(head) == Ex + "a")
    val c2 = rest(head)
    assert(first(c2) == "x")
    val c3 = rest(c2)
    assert(first(c3) == "2" && rest(c3) == Rdf.RdfNil)
    // long string in single-quote style
    assert(got.contains((Ex + "long", Ex + "t", "line1\n\"line2\"")))
    assert(got.size == 12 + 1 + 2 + 7 + 1)
  }

  test("turtle: 'a' before blank/literal objects and empty ';;' items") {
    val ttl =
      """PREFIX ex: <http://example.org/>
        |ex:s a _:b1 ;; ex:p "v" .
        |ex:abc a ex:T .
        |ex:amb ex:q ex:a .
        |""".stripMargin
    val got = Rdf.parseTurtleString(ttl, scope = "t").toSet
    assert(got.contains((Ex + "s", RT, "_:tb1")))
    assert(got.contains((Ex + "s", Ex + "p", "v")))
    assert(got.contains((Ex + "abc", RT, Ex + "T")))
    // 'a' as a prefixed-name LOCAL part is not the keyword
    assert(got.contains((Ex + "amb", Ex + "q", Ex + "a")))
  }

  test("rdf/xml: parseType=Literal keeps island text, emits no markup triples") {
    val xml =
      s"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         |         xmlns:ex="$Ex">
         |  <rdf:Description rdf:about="${Ex}n">
         |    <ex:note rdf:parseType="Literal">see <ex:b>this</ex:b> now</ex:note>
         |    <ex:name>plain</ex:name>
         |  </rdf:Description>
         |</rdf:RDF>""".stripMargin
    val got = Rdf.parseRdfXmlString(xml, scope = "x").toSet
    assert(got == Set(
      (Ex + "n", Ex + "note", "see this now"),
      (Ex + "n", Ex + "name", "plain")))
  }

  test("nquads: blank labels scope per source file") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("nqscope")
    java.nio.file.Files.writeString(dir.resolve("f1.nq"),
      s"""_:b1 <${Ex}p> "one" .\n""")
    java.nio.file.Files.writeString(dir.resolve("f2.nq"),
      s"""_:b1 <${Ex}p> "two" .\n""")
    try {
      val rows = Rdf.parseNQuads(spark, dir.toString).collect()
      val subjects = rows.map(_.getString(0)).distinct
      assert(rows.length == 2 && subjects.length == 2,
        s"blank _:b1 from two files must not collide: ${subjects.toSeq}")
      assert(subjects.forall(_.startsWith("_:")))
    } finally {
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("turtle: trailing-dot local names and sparql BASE") {
    val ttl =
      """PREFIX ex: <http://example.org/>
        |BASE <http://b.org/>
        |ex:n1.2 ex:next ex:n1 .
        |<rel> ex:p "v" .
        |""".stripMargin
    val got = Rdf.parseTurtleString(ttl, scope = "t").toSet
    // 'n1.2' keeps its inner dot; the statement '.' is not swallowed
    assert(got.contains((Ex + "n1.2", Ex + "next", Ex + "n1")))
    assert(got.contains(("http://b.org/rel", Ex + "p", "v")))
  }

  // ------------------------------------------------------------ RDF/XML

  test("rdf/xml: striped syntax, parseType Resource/Collection, rdf:li") {
    val xml =
      s"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         |         xmlns:ex="$Ex">
         |  <ex:Person rdf:about="${Ex}alice" ex:age="30">
         |    <ex:name>Alice</ex:name>
         |    <ex:knows rdf:resource="${Ex}bob"/>
         |    <ex:address rdf:parseType="Resource">
         |      <ex:city>Springfield</ex:city>
         |    </ex:address>
         |    <ex:pet>
         |      <ex:Dog rdf:about="${Ex}rex">
         |        <ex:name>Rex</ex:name>
         |      </ex:Dog>
         |    </ex:pet>
         |    <ex:nums rdf:parseType="Collection">
         |      <rdf:Description rdf:about="${Ex}n1"/>
         |      <rdf:Description rdf:about="${Ex}n2"/>
         |    </ex:nums>
         |  </ex:Person>
         |  <rdf:Description rdf:nodeID="b7">
         |    <rdf:li>first</rdf:li>
         |    <rdf:li>second</rdf:li>
         |  </rdf:Description>
         |</rdf:RDF>""".stripMargin
    val got = Rdf.parseRdfXmlString(xml, scope = "x").toSet
    val alice = Ex + "alice"
    assert(got.contains((alice, RT, Ex + "Person")))
    assert(got.contains((alice, Ex + "age", "30")))
    assert(got.contains((alice, Ex + "name", "Alice")))
    assert(got.contains((alice, Ex + "knows", Ex + "bob")))
    // parseType=Resource: implicit blank node
    val addr = got.collect { case (`alice`, p, b) if p == Ex + "address" => b }.head
    assert(addr.startsWith("_:x"))
    assert(got.contains((addr, Ex + "city", "Springfield")))
    // nested node element
    assert(got.contains((alice, Ex + "pet", Ex + "rex")))
    assert(got.contains((Ex + "rex", RT, Ex + "Dog")))
    assert(got.contains((Ex + "rex", Ex + "name", "Rex")))
    // parseType=Collection
    val head = got.collect { case (`alice`, p, h) if p == Ex + "nums" => h }.head
    def first(c: String) = got.collect { case (`c`, p, v) if p == Rdf.RdfFirst => v }.head
    def rest(c: String) = got.collect { case (`c`, p, v) if p == Rdf.RdfRest => v }.head
    assert(first(head) == Ex + "n1")
    assert(first(rest(head)) == Ex + "n2" && rest(rest(head)) == Rdf.RdfNil)
    // rdf:li counter on a nodeID subject
    assert(got.contains(("_:xb7", Rdf.RdfNs + "_1", "first")))
    assert(got.contains(("_:xb7", Rdf.RdfNs + "_2", "second")))
  }

  test("rdf/xml: rdf:ID, rdf:type attribute, typed literal content") {
    val xml =
      s"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         |         xmlns:ex="$Ex">
         |  <rdf:Description rdf:ID="frag" rdf:type="${Ex}T">
         |    <ex:size rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">7</ex:size>
         |  </rdf:Description>
         |</rdf:RDF>""".stripMargin
    val got = Rdf.parseRdfXmlString(xml, base = "http://b.org/doc", scope = "x").toSet
    assert(got == Set(
      ("http://b.org/doc#frag", RT, Ex + "T"),
      ("http://b.org/doc#frag", Ex + "size", "7")))
  }

  // ------------------------------------------------------------- NQuads

  test("nquads: named-graph filter, default graph, escapes, garbage lines") {
    assert(Rdf.parseQuadLine("""<a:s> <a:p> "v\t1"@en <a:g> .""") ==
      Some(("a:s", "a:p", "v\t1", Some("a:g"))))
    assert(Rdf.parseQuadLine("""<a:s> <a:p> "x"^^<a:dt> .""") ==
      Some(("a:s", "a:p", "x", None)))
    assert(Rdf.parseQuadLine("""_:b <a:p> <a:o> _:g .""") ==
      Some(("_:b", "a:p", "a:o", Some("_:g"))))
    assert(Rdf.parseQuadLine("# comment").isEmpty)
    assert(Rdf.parseQuadLine("").isEmpty)
    assert(Rdf.parseQuadLine("garbage line").isEmpty)

    val dir = java.nio.file.Files.createTempDirectory("nq")
    val f = dir.resolve("t.nq")
    java.nio.file.Files.writeString(f,
      s"""<${Ex}s1> <${Ex}p> "a" <${Ex}gA> .
         |<${Ex}s2> <${Ex}p> "b" <${Ex}gB> .
         |<${Ex}s3> <${Ex}p> "c" .
         |""".stripMargin)
    import scala.jdk.CollectionConverters._
    try {
      val all = Rdf.parseNQuads(spark, f.toString).collect()
      assert(all.length == 3) // empty filter keeps everything incl. default graph
      val onlyA = Rdf.parseNQuads(spark, f.toString, graphs = Seq(Ex + "gA")).collect()
      assert(onlyA.map(r => (r.getString(0), r.getString(2))).toSeq == Seq((Ex + "s1", "a")))
    } finally {
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  // ------------------------- fromTriples: nesting / exclusion options

  test("fromTriples: full-IRI owl axiom markers fold like prefixed ones") {
    import spark.implicits._
    val owl = "http://www.w3.org/2002/07/owl#"
    val triples = Seq(
      (Ex + "A", RT, owl + "Class"),
      (Ex + "A", Ex + "subClassOf", Ex + "B"),
      ("_:ax", RT, owl + "Axiom"),
      ("_:ax", owl + "annotatedSource", Ex + "A"),
      ("_:ax", owl + "annotatedProperty", Ex + "subClassOf"),
      ("_:ax", owl + "annotatedTarget", Ex + "B"),
      ("_:ax", Ex + "source", "DOID:1")).toDF("s", "p", "o")
    val nodes = Ingest.fromTriples(triples, "rdf", "fx", typePredicate = RT).collect()
    assert(nodes.length == 1)
    val a = nodes.head
    assert(a.types == Seq(owl + "Class"))
    val sub = a.props(Ex + "subClassOf").head
    assert(sub.value == Ex + "B")
    assert(sub.qualifiers == Map((Ex + "source") -> Seq("DOID:1")))
  }

  test("fromTriples: rdf:Statement reification folds too") {
    import spark.implicits._
    val rdf = Rdf.RdfNs
    val triples = Seq(
      (Ex + "A", Ex + "p", Ex + "B"),
      ("_:st", RT, rdf + "Statement"),
      ("_:st", rdf + "subject", Ex + "A"),
      ("_:st", rdf + "predicate", Ex + "p"),
      ("_:st", rdf + "object", Ex + "B"),
      ("_:st", Ex + "conf", "0.9")).toDF("s", "p", "o")
    val nodes = Ingest.fromTriples(triples, "rdf", "fx", typePredicate = RT).collect()
    assert(nodes.length == 1)
    assert(nodes.head.props(Ex + "p").head.qualifiers ==
      Map((Ex + "conf") -> Seq("0.9")))
  }

  test("fromTriples: blank-node subtrees nest as JSON, depth 2") {
    import spark.implicits._
    val triples = Seq(
      (Ex + "A", Ex + "restriction", "_:r1"),
      ("_:r1", Ex + "onProperty", Ex + "partOf"),
      ("_:r1", Ex + "someValuesFrom", "_:r2"),
      ("_:r2", Ex + "unionOf", Ex + "B"),
      (Ex + "A", Ex + "label", "thing A")).toDF("s", "p", "o")
    val nodes = Ingest.fromTriples(triples, "rdf", "fx", typePredicate = RT).collect()
    assert(nodes.length == 1) // blank subjects never emit top-level
    val a = nodes.head
    assert(a.props(Ex + "label").map(_.value) == Seq("thing A"))
    val nested = a.props(Ex + "restriction").head.value
    // inner blank _:r2 embeds as a raw JSON object, not a quoted string
    assert(nested ==
      s"""{"${Ex}onProperty":["${Ex}partOf"],"${Ex}someValuesFrom":[{"${Ex}unionOf":["${Ex}B"]}]}""")
  }

  test("fromTriples: nestPreds folds IRI subtrees; excludePreds drops records") {
    import spark.implicits._
    val triples = Seq(
      (Ex + "A", Ex + "evidence", Ex + "ev1"),
      (Ex + "ev1", Ex + "code", "ECO:1"),
      (Ex + "ev1", Ex + "src", "pmid:1"),
      (Ex + "A", Ex + "seeAlso", Ex + "junk"),
      (Ex + "junk", Ex + "label", "to drop"),
      (Ex + "B", Ex + "plain", Ex + "ev1")).toDF("s", "p", "o")
    val nodes = Ingest.fromTriples(triples, "rdf", "fx", typePredicate = RT,
      nestPreds = Set(Ex + "evidence"), excludePreds = Set(Ex + "seeAlso")).collect()
    val byId = nodes.map(n => n.ids.head -> n).toMap
    // ev1 nested into A and excluded at top level
    assert(!byId.contains(Ex + "ev1"))
    assert(byId(Ex + "A").props(Ex + "evidence").head.value ==
      s"""{"${Ex}code":["ECO:1"],"${Ex}src":["pmid:1"]}""")
    // junk's own record dropped, the referring edge keeps the plain IRI
    assert(!byId.contains(Ex + "junk"))
    assert(byId(Ex + "A").props(Ex + "seeAlso").head.value == Ex + "junk")
    // a NON-nest predicate pointing at the nested object keeps the IRI
    assert(byId(Ex + "B").props(Ex + "plain").head.value == Ex + "ev1")
  }

  test("fromTriples: pointer-predicate reification (chembl shape)") {
    import spark.implicits._
    val sio8 = "http://semanticscience.org/resource/SIO_000008"
    val sio300 = "http://semanticscience.org/resource/SIO_000300"
    val triples = Seq(
      (Ex + "act1", RT, Ex + "Activity"),
      (Ex + "act1", sio8, "_:m1"),
      ("_:m1", RT, Ex + "standardValue"),
      ("_:m1", sio300, "55.0"),
      ("_:m1", Ex + "units", "nM"),
      (Ex + "act1", Ex + "doc", Ex + "doc1"),
      (Ex + "doc1", Ex + "label", "drop me")).toDF("s", "p", "o")
    val nodes = Ingest.fromTriples(triples, "rdf", "fx", typePredicate = RT,
      reifPointerPreds = Set(sio8), reifValuePreds = Set(sio300),
      excludePreds = Set(Ex + "doc")).collect()
    val byId = nodes.map(n => n.ids.head -> n).toMap
    // the metadata record folded into act1: its TYPE became the
    // predicate, its value-predicate object the value, the rest
    // qualifiers; the metadata node itself emits nothing
    val act = byId(Ex + "act1")
    val sv = act.props(Ex + "standardValue").head
    assert(sv.value == "55.0")
    assert(sv.qualifiers == Map((Ex + "units") -> Seq("nM")))
    assert(!act.props.contains(sio8))
    assert(!byId.contains("_:m1"))
    // exclude-objects-of-predicate still drops doc1's own record
    assert(!byId.contains(Ex + "doc1"))
    assert(act.props(Ex + "doc").head.value == Ex + "doc1")
    assert(act.types == Seq(Ex + "Activity"))
  }

  test("fromTriples: pointer reification keeps ALL values; dangling pointers degrade to plain triples") {
    import spark.implicits._
    val sio8 = "http://semanticscience.org/resource/SIO_000008"
    val sio300 = "http://semanticscience.org/resource/SIO_000300"
    val triples = Seq(
      (Ex + "act1", sio8, "_:m1"),
      ("_:m1", RT, Ex + "standardValue"),
      ("_:m1", sio300, "55.0"),
      ("_:m1", sio300, "7.2"), // TWO values — both must survive
      (Ex + "act1", sio8, Ex + "nowhere"), // metadata record missing entirely
      (Ex + "act1", Ex + "label", "a1")).toDF("s", "p", "o")
    val nodes = Ingest.fromTriples(triples, "rdf", "fx", typePredicate = RT,
      reifPointerPreds = Set(sio8), reifValuePreds = Set(sio300)).collect()
    val act = nodes.find(_.ids.head == Ex + "act1").get
    assert(act.props(Ex + "standardValue").map(_.value).sorted == Seq("55.0", "7.2"))
    // the unresolvable pointer keeps its original triple instead of
    // silently vanishing
    assert(act.props(sio8).map(_.value) == Seq(Ex + "nowhere"))
  }

  test("fromTriples: typesAreGrebiTypes=false keeps rdf:type as a plain prop") {
    import spark.implicits._
    val triples = Seq(
      (Ex + "n1", RT, Ex + "T"),
      (Ex + "n1", Ex + "p", "v")).toDF("s", "p", "o")
    val nodes = Ingest.fromTriples(triples, "rdf", "fx", typePredicate = RT,
      typesAreGrebiTypes = false).collect()
    assert(nodes.length == 1)
    assert(nodes.head.types.isEmpty)
    assert(nodes.head.props(RT).map(_.value) == Seq(Ex + "T"))
  }

  test("turtle → fromTriples round-trip with axiom written in turtle") {
    val ttl =
      """@prefix owl: <http://www.w3.org/2002/07/owl#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |@prefix obo: <http://purl.obolibrary.org/obo/> .
        |@prefix oio: <http://www.geneontology.org/formats/oboInOwl#> .
        |obo:A rdfs:subClassOf obo:B ; rdfs:label "term A" .
        |[] a owl:Axiom ;
        |  owl:annotatedSource obo:A ;
        |  owl:annotatedProperty rdfs:subClassOf ;
        |  owl:annotatedTarget obo:B ;
        |  oio:source "DOID:1" .
        |""".stripMargin
    import spark.implicits._
    val df = Rdf.parseTurtleString(ttl, scope = "t").toDF("s", "p", "o")
    val nodes = Ingest.fromTriples(df, "rdf", "fx", typePredicate = RT).collect()
    assert(nodes.length == 1)
    val a = nodes.head
    assert(a.ids == Seq("http://purl.obolibrary.org/obo/A"))
    val sub = a.props("http://www.w3.org/2000/01/rdf-schema#subClassOf").head
    assert(sub.value == "http://purl.obolibrary.org/obo/B")
    assert(sub.qualifiers ==
      Map("http://www.geneontology.org/formats/oboInOwl#source" -> Seq("DOID:1")))
  }

  test("turtle: RDF-star quoted triples reify to the rdf:Statement mapping") {
    val ttl =
      s"""@prefix ex: <$Ex> .
         |ex:s ex:p ex:o .
         |<< ex:s ex:p ex:o >> ex:certainty "0.9" .
         |ex:w ex:saw << ex:s a ex:T >> .
         |""".stripMargin
    val got = Rdf.parseTurtleString(ttl, scope = "t")
    val triples = got.toSet
    // the base triple is asserted normally
    assert(triples.contains((Ex + "s", Ex + "p", Ex + "o")))
    // annotation lands on a statement node carrying the W3C reification
    val stmt = got.collect {
      case (n, p, v) if p == Ex + "certainty" && v == "0.9" => n
    }.head
    assert(triples.contains((stmt, Rdf.RdfType, Rdf.RdfStatement)))
    assert(triples.contains((stmt, Rdf.RdfSubject, Ex + "s")))
    assert(triples.contains((stmt, Rdf.RdfPredicate, Ex + "p")))
    assert(triples.contains((stmt, Rdf.RdfObject, Ex + "o")))
    // a quoted triple in OBJECT position: the object is the statement
    // node, whose rdf:predicate is rdf:type (the `a` keyword inside <<>>)
    val seen = got.collect { case (w, p, n) if w == Ex + "w" && p == Ex + "saw" => n }.head
    assert(triples.contains((seen, Rdf.RdfPredicate, Rdf.RdfType)))
    assert(triples.contains((seen, Rdf.RdfObject, Ex + "T")))
    // the quoted rdf:type triple itself is NOT asserted
    assert(!triples.contains((Ex + "s", Rdf.RdfType, Ex + "T")))
  }
}
