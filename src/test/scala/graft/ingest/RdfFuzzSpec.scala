package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Generative Turtle coverage: random documents over the deterministic
  * subset (IRIs, prefixed names, `a`, escaped short/long literals,
  * numeric/boolean abbreviations, object lists, predicate-object lists,
  * comments, random whitespace) rendered from a random model, asserting
  * the parse equals the model's triple set exactly. Blank nodes and
  * collections generate fresh labels (covered by RdfSpec's fixtures) so
  * they stay out of the fuzz subset. Seeded RNG → failures replay. */
class RdfFuzzSpec extends AnyFunSuite {

  private val Ex = "http://example.org/fuzz#"
  private val RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  test("turtle parser matches the generating model on 150 random documents") {
    val rng = new scala.util.Random(424242L)

    def local(): String = "n" + rng.nextInt(6)
    def iri(): String = Ex + local()
    def ws(): String = Seq(" ", "  ", "\n", "\n\t", " \n ")(rng.nextInt(5))

    // a literal value and its legal Turtle rendering
    def literal(): (String, String) = rng.nextInt(5) match {
      case 0 => // short string with the full escape set
        val raw = Seq.fill(rng.nextInt(8))(
          "aZ9 _é\"\\\n\t€".charAt(rng.nextInt(11))).mkString
        val esc = raw.flatMap {
          case '"'  => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\t' => "\\t"
          case c    => c.toString
        }
        (raw, "\"" + esc + "\"")
      case 1 => // long (triple-quoted) string: raw newlines/single quotes ok
        val raw = Seq.fill(rng.nextInt(6))(
          Seq("line", "mid\"q", "x", "")(rng.nextInt(4))).mkString("\n")
        (raw, "\"\"\"" + raw.replace("\\", "\\\\") + "\"\"\"")
      case 2 => // unicode escape form of a fixed char
        ("café", "\"caf\\u00E9\"")
      case 3 =>
        val n = rng.nextInt(2000) - 1000
        (n.toString, n.toString)
      case _ =>
        val b = rng.nextBoolean().toString
        (b, b)
    }

    def renderIri(full: String): String =
      if (!full.startsWith(Ex) || rng.nextBoolean()) s"<$full>"
      else "ex:" + full.stripPrefix(Ex)

    for (doc <- 1 to 150) {
      val nTriples = 1 + rng.nextInt(8)
      val model = (1 to nTriples).map { _ =>
        val s = iri()
        rng.nextInt(4) match {
          case 0 => (s, RT, iri(), "iri") // rendered as `a` sometimes
          case 1 => (s, iri(), iri(), "iri")
          case _ =>
            val (raw, rendered) = literal()
            (s, iri(), raw, rendered)
        }
      }
      // group consecutive same-subject triples with ';' half the time
      val sb = new StringBuilder
      sb.append(s"@prefix ex: <$Ex> .\n")
      var k = 0
      while (k < model.length) {
        val (s0, _, _, _) = model(k)
        val group = model.drop(k).takeWhile(_._1 == s0)
          .take(if (rng.nextBoolean()) 3 else 1)
        sb.append(renderIri(s0)).append(ws())
        group.zipWithIndex.foreach { case ((_, p, o, kind), gi) =>
          if (gi > 0) sb.append(" ;").append(ws())
          val pr = if (p == RT && rng.nextBoolean()) "a" else renderIri(p)
          val or = kind match {
            case "iri" => renderIri(o)
            case r     => r
          }
          sb.append(pr).append(ws()).append(or)
        }
        sb.append(ws()).append(".")
        if (rng.nextBoolean()) sb.append(" # comment ").append(rng.nextInt(100))
        sb.append("\n")
        k += group.length
      }
      val expected = model.map { case (s, p, o, _) => (s, p, o) }.toSet
      val got = Rdf.parseTurtleString(sb.toString, scope = "t").toSet
      assert(got === expected, s"doc #$doc:\n${sb.toString}")
    }
  }
}
