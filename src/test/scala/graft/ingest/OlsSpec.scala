package graft.ingest

import graft.SparkSpec

class OlsSpec extends SparkSpec {

  def fx(name: String): String =
    getClass.getClassLoader.getResource(s"fixtures/$name").getPath

  lazy val nodes = Ols.fromJsonl(spark, fx("ols_classes.jsonl"), "mondo", "fx").collect()

  test("safe label: prefix + underscored label; prefixed label falls back to curie") {
    assert(Ols.qualifiedSafeLabel(Some("MONDO:0005044"), None,
      Some("type 2 diabetes mellitus"), None) == "mondo:type_2_diabetes_mellitus")
    // the reference lowercases the prefix but compares case-SENSITIVELY,
    // so an uppercase-prefixed label does NOT fall back to the curie
    assert(Ols.qualifiedSafeLabel(Some("MONDO:0001"), None,
      Some("MONDO:0001"), None) == "mondo:MONDO_0001")
    assert(Ols.qualifiedSafeLabel(Some("mondo:0001"), None,
      Some("mondo:0001"), None) == "mondo:0001")
    assert(Ols.qualifiedSafeLabel(Some("0005015"), Some("mondo"),
      Some("diabetes mellitus"), None) == "mondo:diabetes_mellitus")
    assert(Ols.qualifiedSafeLabel(None, None, None, Some("http://x")) == "http://x")
  }

  test("obsolete and imported classes are skipped") {
    assert(nodes.length == 4)
    assert(!nodes.exists(_.props.get("ols:label").exists(_.exists(_.value == "gone"))))
  }

  test("reification objects become one reified value per axiom set") {
    val t2d = nodes.find(_.ids.head == "mondo:type_2_diabetes_mellitus").get
    val subs = t2d.props("rdfs:subClassOf")
    assert(subs.length == 2)
    assert(subs.forall(_.value == "MONDO:0005015"))
    assert(subs.map(_.qualifiers("oboInOwl:source")).toSet ==
      Set(Seq("DOID:9352"), Seq("NCIT:C26747")))
  }

  test("relatedTo regrouped by predicate; relatedFrom and noise dropped") {
    val t2d = nodes.find(_.ids.head == "mondo:type_2_diabetes_mellitus").get
    assert(t2d.props("ro:has_characteristic").map(_.value).sorted ==
      Seq("PATO:0000460", "PATO:0001997"))
    assert(!t2d.props.contains("ols:relatedFrom"))
    assert(!t2d.props.contains("ols:searchableAnnotationValues"))
  }

  test("unprefixed curie removed from props; id falls back through definedBy") {
    val dm = nodes.find(_.ids.head == "mondo:fallback_disease").get
    assert(!dm.props.contains("ols:curie"))
  }
}
