package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Generative RDF/XML coverage over the deterministic subset: random
  * striped documents — `rdf:Description` and typed node elements,
  * `rdf:about` subjects, property ATTRIBUTES, property elements with
  * `rdf:resource` or literal text (with XML entity escapes and
  * datatype/lang decorations), nested node elements — rendered from a
  * random model and parsed back to exactly the model's triples.
  * Anonymous/nodeID blank nodes generate fresh labels and stay in
  * RdfSpec's fixtures. Seeded RNG → failures replay. */
class RdfXmlFuzzSpec extends AnyFunSuite {

  private val Ex = "http://example.org/fuzz#"
  private val RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  test("rdf/xml parser matches the generating model on 120 random documents") {
    val rng = new scala.util.Random(777L)
    def local() = "n" + rng.nextInt(6)
    def iri() = Ex + local()

    def xmlEscape(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }
    def literal(): (String, String) = { // (raw value, escaped text)
      val raw = Seq.fill(rng.nextInt(10))(
        "aZ9 _é<>&\"€".charAt(rng.nextInt(11))).mkString
      (raw, xmlEscape(raw))
    }

    for (doc <- 1 to 120) {
      val model = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
      val sb = new StringBuilder
      sb.append("<?xml version=\"1.0\"?>\n")
      sb.append(s"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:ex="$Ex">\n""")
      for (_ <- 1 to (1 + rng.nextInt(4))) {
        val s0 = iri()
        val typed = rng.nextBoolean()
        val tag = if (typed) {
          val t = local()
          model += ((s0, RT, Ex + t)); s"ex:$t"
        } else "rdf:Description"
        sb.append(s"""  <$tag rdf:about="$s0"""")
        // property attributes (distinct names to keep XML legal)
        val attrProps = Seq.fill(rng.nextInt(3))(local()).distinct
        attrProps.foreach { p =>
          val (raw, esc) = literal()
          model += ((s0, Ex + p, raw))
          sb.append(s""" ex:$p="$esc"""")
        }
        sb.append(">\n")
        for (_ <- 0 until rng.nextInt(4)) {
          val p = local()
          rng.nextInt(4) match {
            case 0 => // resource reference
              val o = iri()
              model += ((s0, Ex + p, o))
              sb.append(s"""    <ex:$p rdf:resource="$o"/>\n""")
            case 1 => // literal text, optional datatype/lang decoration
              val (raw, esc) = literal()
              model += ((s0, Ex + p, raw))
              val deco = rng.nextInt(3) match {
                case 0 => s""" rdf:datatype="${Ex}dt""""
                case 1 => """ xml:lang="en""""
                case _ => ""
              }
              sb.append(s"    <ex:$p$deco>$esc</ex:$p>\n")
            case 2 => // nested node element
              val o = iri()
              val (raw, esc) = literal()
              val p2 = local()
              model += ((s0, Ex + p, o))
              model += ((o, Ex + p2, raw))
              sb.append(s"""    <ex:$p><rdf:Description rdf:about="$o"><ex:$p2>$esc</ex:$p2></rdf:Description></ex:$p>\n""")
            case _ => // empty literal
              model += ((s0, Ex + p, ""))
              sb.append(s"    <ex:$p></ex:$p>\n")
          }
        }
        sb.append(s"  </$tag>\n")
      }
      sb.append("</rdf:RDF>\n")
      val got = Rdf.parseRdfXmlString(sb.toString, scope = "x").toSet
      assert(got === model.toSet, s"doc #$doc:\n${sb.toString}")
    }
  }
}
