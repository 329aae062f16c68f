package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Generative NQuads line coverage: random (s, p, o[, g]) terms — IRIs,
  * blank nodes, literals with the full escape set and optional
  * lang/datatype decoration — rendered with random whitespace and parsed
  * back through [[Rdf.parseQuadLine]]. Completes the fuzz trio
  * (RdfFuzzSpec: Turtle, RdfXmlFuzzSpec: RDF/XML). */
class NQuadsFuzzSpec extends AnyFunSuite {

  private val Ex = "http://example.org/fuzz#"

  test("quad-line scanner matches the generating model on 300 random lines") {
    val rng = new scala.util.Random(31337L)
    def iri() = Ex + "n" + rng.nextInt(50)
    def blank() = "_:b" + rng.nextInt(9)
    def ws() = Seq(" ", "  ", "\t", " \t ")(rng.nextInt(4))

    def literal(): (String, String) = {
      val raw = Seq.fill(rng.nextInt(10))(
        "aZ9 é\"\\\n\t\r€".charAt(rng.nextInt(11))).mkString
      val esc = raw.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case 'é' if rng.nextBoolean() => "\\u00E9"
        case c    => c.toString
      }
      val deco = rng.nextInt(3) match {
        case 0 => "@en-GB"
        case 1 => s"^^<${Ex}dt>"
        case _ => ""
      }
      (raw, "\"" + esc + "\"" + deco)
    }

    for (line <- 1 to 300) {
      val (s, sr) = if (rng.nextBoolean()) { val x = iri(); (x, s"<$x>") }
        else { val b = blank(); (b, b) }
      val p = iri()
      val (o, or) = rng.nextInt(3) match {
        case 0 => val x = iri(); (x, s"<$x>")
        case 1 => val b = blank(); (b, b)
        case _ => literal()
      }
      val g = if (rng.nextBoolean()) Some(iri()) else None
      val rendered = ws() + sr + ws() + s"<$p>" + ws() + or +
        g.map(x => ws() + s"<$x>").getOrElse("") + ws() + "." +
        (if (rng.nextBoolean()) " # trailing comment" else "")
      val got = Rdf.parseQuadLine(rendered)
      assert(got === Some((s, p, o, g)), s"line #$line: [$rendered]")
    }
  }

  test("garbage lines stream past as None") {
    for (bad <- Seq("", "   ", "# comment only", "<unterminated", "<a> <b>")) {
      assert(Rdf.parseQuadLine(bad).isEmpty, s"[$bad]")
    }
  }
}
