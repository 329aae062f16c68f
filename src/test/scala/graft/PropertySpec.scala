package graft

import graft.curie.{Ids, PrefixTrie}
import graft.core.Json
import graft.functions.RollingHash
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks of the pure kernels against naive reference
  * models — these functions anchor id semantics and hashing for the whole
  * engine, so they get generative coverage beyond the fixture cases. */
class PropertySpec extends AnyFunSuite {

  def checkProp(p: Prop): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(result.passed, result.status.toString)
  }

  val asciiStr: Gen[String] = Gen.listOf(Gen.choose(' ', '~')).map(_.mkString)
  val prefixGen: Gen[String] = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("PrefixTrie matches the naive longest-prefix model") {
    val mapGen = Gen.mapOf(Gen.zip(prefixGen, Gen.alphaStr))
    checkProp(Prop.forAll(mapGen, asciiStr) { (m, input) =>
      val trie = PrefixTrie(m)
      // longest match wins; among case-insensitively equal keys the
      // lexicographically largest wins (the trie's documented tie-break)
      val matches = m.keys.toSeq.filter(p => input.toLowerCase.startsWith(p.toLowerCase))
      val expected =
        if (matches.isEmpty) input
        else {
          val longest = matches.map(_.length).max
          val winner = matches.filter(_.length == longest).max
          m(winner) + input.substring(longest)
        }
      trie.rewrite(input) == expected
    })
  }

  test("RollingHash equals the BigInt model") {
    checkProp(Prop.forAll(asciiStr) { s =>
      val model = s.foldLeft(BigInt(0))((h, c) => (h * 31 + c.toInt) mod BigInt(2147483647))
      RollingHash.hash(s) == model.toLong
    })
  }

  test("Json.str output parses back to the input") {
    checkProp(Prop.forAll(asciiStr.map(s => s + "\"\\\n\t")) { s =>
      val parsed = org.json4s.jackson.JsonMethods.parse(Json.str(s))
      parsed == org.json4s.JString(s)
    })
  }

  test("canonical id is a member with the minimal (score, id) key") {
    val idGen = Gen.oneOf(
      Gen.const("grebi:x"), Gen.const("biolink:y"),
      prefixGen.map(p => s"$p:1234"), Gen.alphaStr.suchThat(_.nonEmpty))
    checkProp(Prop.forAll(Gen.nonEmptyListOf(idGen)) { ids =>
      val c = Ids.canonical(ids)
      ids.contains(c) && ids.map(i => (Ids.idScore(i), i)).min == ((Ids.idScore(c), c))
    })
  }

  test("trie rewrite is identity for inputs with no configured prefix") {
    checkProp(Prop.forAll(asciiStr.suchThat(s => !s.toLowerCase.startsWith("pre"))) { s =>
      PrefixTrie(Map("pre" -> "post:")).rewrite(s) == s
    })
  }
}
