package graft.curie

import graft.SparkSpec
import graft.functions.NormalisePrefix
import org.apache.spark.sql.functions._

class CurieSpec extends SparkSpec {

  val trie = PrefixTrie(Map(
    "MGI:" -> "mgi:",
    "http://identifiers.org/mgi/" -> "mgi:",
    "http://identifiers.org/" -> "idorg:",
    "EFO:" -> "efo:",
    "MONDO:" -> "mondo:",
    "hgnc:" -> "hgnc:"))

  test("longest prefix wins") {
    assert(trie.rewrite("http://identifiers.org/mgi/97490") == "mgi:97490")
    assert(trie.rewrite("http://identifiers.org/chebi/1234") == "idorg:chebi/1234")
  }

  test("case-insensitive match, replacement verbatim") {
    assert(trie.rewrite("mgi:97490") == "mgi:97490")
    assert(trie.rewrite("Mgi:97490") == "mgi:97490")
    assert(trie.rewrite("efo:0000537") == "efo:0000537")
    assert(trie.rewrite("EFO:0000537") == "efo:0000537")
  }

  test("no match → unchanged") {
    assert(trie.rewrite("UBERON:0000467") == "UBERON:0000467")
    assert(trie.rewrite("") == "")
    assert(trie.rewrite("ünïcode:x") == "ünïcode:x")
  }

  test("NormalisePrefix expression rewrites inside a DataFrame plan") {
    import spark.implicits._
    val df = Seq("MGI:97490", "http://identifiers.org/mgi/97490", "zz:1")
      .toDF("id")
      .select(NormalisePrefix(col("id"), trie).as("norm"))
    assert(df.as[String].collect().toSeq == Seq("mgi:97490", "mgi:97490", "zz:1"))
  }

  test("NormalisePrefix survives codegen with nulls") {
    import spark.implicits._
    val df = Seq(Some("MGI:1"), None).toDF("id")
      .select(NormalisePrefix(col("id"), trie).as("norm"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq == Seq(Some("mgi:1"), None))
  }

  test("id score preference order and canonical pick") {
    assert(Ids.idScore("grebi:name") == Int.MinValue)
    assert(Ids.idScore("biolink:Gene") == Int.MinValue + 1000)
    assert(Ids.idScore("mondo:0005044") == -1000 - 5)
    assert(Ids.idScore("some random string") == -16)
    assert(Ids.canonical(Seq("rdfs:label", "grebi:name", "ols:label")) == "grebi:name")
    assert(Ids.canonical(Seq("zz:9", "aa:1")) == "aa:1")
    // IRIs are excluded from the curie-like bonus (reference main.rs:182)
    assert(Ids.canonical(Seq(
      "http://purl.obolibrary.org/obo/MONDO_0005044", "mondo:0005044")) == "mondo:0005044")
    // more alphabetic characters preferred (readable over numeric)
    assert(Ids.canonical(Seq("c:000000001", "alt:000000001")) == "alt:000000001")
  }

  test("all-numeric ids are invalid unless UUID-length") {
    assert(!Ids.isValidId("12345"))
    assert(Ids.isValidId("mgi:12345"))
    assert(!Ids.isValidId(""))
    // >= 16 digits is accepted as UUID-like (grebi_shared/src/lib.rs:10-13)
    assert(Ids.isValidId("1234567890123456"))
  }
}
