package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** S2 front-end — dependency-free RDF parsers for the three concrete
  * syntaxes the reference ingests (`01_ingest/grebi_rdf2jsonl/src/
  * main.rs:105-139`: `rdf_triples_xml`, `rdf_triples_turtle`,
  * `rdf_quads_nq` with an optional named-graph filter). Each parser emits
  * the `(s, p, o)` DataFrame that [[Ingest.fromTriples]] consumes, so the
  * triple-grouping / OWL-axiom-reification logic is shared across
  * syntaxes exactly as the reference shares its in-memory graph.
  *
  * Scale posture: Turtle and RDF/XML are whole-file grammars (prefix
  * declarations and XML namespaces are file-scoped), so those parse one
  * task per file via `wholeTextFiles` — a dump split across files
  * parallelises; a single giant file is bounded by one task, the same
  * envelope as the reference's single-process stdin parse. NQuads and
  * NTriples are line-delimited and stream through an ordinary distributed
  * text scan with no per-file state.
  *
  * Term conventions (shared with [[Ingest.parseNTriples]]): IRIs are raw
  * strings without angle brackets, literals are their lexical form
  * (language tags and datatypes dropped), blank nodes keep a `_:` prefix
  * and are scoped per source file so labels from different files never
  * collide when parsed into one DataFrame.
  */
object Rdf {

  val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val RdfType: String = RdfNs + "type"
  val RdfFirst: String = RdfNs + "first"
  val RdfRest: String = RdfNs + "rest"
  val RdfNil: String = RdfNs + "nil"
  val RdfStatement: String = RdfNs + "Statement"
  val RdfSubject: String = RdfNs + "subject"
  val RdfPredicate: String = RdfNs + "predicate"
  val RdfObject: String = RdfNs + "object"
  private val XmlNs = "http://www.w3.org/XML/1998/namespace"

  /** The reference parses with base `http://www.ebi.ac.uk/kg/`
    * (`main.rs:107,112`); ours is a parameter with a neutral default. */
  val DefaultBase = "http://example.org/base/"

  /** Distinct 16-hex (64-bit) scope per source file for blank-node
    * labels — wide enough that birthday collisions stay negligible even
    * across millions of input files. */
  private def scopeFor(path: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(path.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
  }

  // ---------------------------------------------------------------- Turtle

  /** Parse Turtle file(s) at `path` (a file, directory or glob) into an
    * (s, p, o) DataFrame — one parse task per file. */
  def parseTurtle(spark: SparkSession, path: String,
                  base: String = DefaultBase): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (p, text) => parseTurtleString(text, base, scopeFor(p)) }
      .toDF("s", "p", "o")
  }

  private[ingest] def parseTurtleString(
      text: String, base: String = DefaultBase,
      scope: String = "t"): Seq[(String, String, String)] =
    new TurtleParser(text, base, scope).parse()

  /** Recursive-descent Turtle parser (W3C Turtle grammar, the subset real
    * ontology dumps use): `@prefix`/`@base` + SPARQL-style `PREFIX`/`BASE`,
    * IRIs with `\u`/`\U` escapes, prefixed names with `\`-escaped locals,
    * `a`, predicate-object lists (`;`), object lists (`,`), short and
    * long (triple-quoted) strings in both quote styles with the full
    * escape set, language tags and datatypes (consumed, value kept
    * lexical), numeric and boolean abbreviations, labelled and anonymous
    * blank nodes, blank-node property lists `[ … ]`, and collections
    * `( … )` as rdf:first/rest/nil chains, and RDF-star quoted triples
    * (`<< s p o >>`, reified on parse to the W3C rdf:Statement mapping). */
  private final class TurtleParser(s: String, baseIri: String, scope: String) {
    private val out = ArrayBuffer.empty[(String, String, String)]
    private val prefixes = mutable.Map.empty[String, String]
    private var base = baseIri
    private var i = 0
    private var anonN = 0

    def parse(): Seq[(String, String, String)] = {
      while (hasMore) statement()
      out.toSeq
    }

    private def err(msg: String): Nothing = {
      val ctx = s.substring(math.max(0, i - 20), math.min(s.length, i + 20))
      throw new IllegalArgumentException(s"Turtle parse error at offset $i ($msg) near: …$ctx…")
    }

    private def eof: Boolean = i >= s.length
    private def peek: Char = s.charAt(i)

    private def skipWs(): Unit = {
      var go = true
      while (go) {
        while (!eof && Character.isWhitespace(peek)) i += 1
        if (!eof && peek == '#') { while (!eof && peek != '\n') i += 1 }
        else go = false
      }
    }

    private def hasMore: Boolean = { skipWs(); !eof }

    private def expect(c: Char): Unit = {
      skipWs()
      if (eof || peek != c) err(s"expected '$c'")
      i += 1
    }

    /** Case-insensitive keyword match at cursor, followed by whitespace. */
    private def atKeyword(kw: String): Boolean =
      i + kw.length < s.length &&
        s.regionMatches(true, i, kw, 0, kw.length) &&
        Character.isWhitespace(s.charAt(i + kw.length))

    private def statement(): Unit = {
      skipWs()
      if (peek == '@') {
        i += 1
        if (s.regionMatches(i, "prefix", 0, 6)) { i += 6; prefixDecl(); expect('.') }
        else if (s.regionMatches(i, "base", 0, 4)) { i += 4; baseDecl(); expect('.') }
        else err("unknown @directive")
      } else if (atKeyword("PREFIX")) { i += 6; prefixDecl() }
      else if (atKeyword("BASE")) { i += 4; baseDecl() }
      else {
        val subj = subject()
        predicateObjectList(subj)
        expect('.')
      }
    }

    private def prefixDecl(): Unit = {
      skipWs()
      val sb = new StringBuilder
      while (!eof && peek != ':') { sb.append(peek); i += 1 }
      expect(':')
      skipWs()
      if (eof || peek != '<') err("expected <iri> in prefix declaration")
      prefixes(sb.toString.trim) = iriRef()
    }

    private def baseDecl(): Unit = {
      skipWs()
      if (eof || peek != '<') err("expected <iri> in base declaration")
      base = iriRef()
    }

    /** `<...>` with \u/\U escapes, resolved against the base. */
    private def iriRef(): String = {
      if (peek != '<') err("expected '<'")
      i += 1
      val sb = new StringBuilder
      while (!eof && peek != '>') {
        if (peek == '\\' && i + 1 < s.length &&
            (s.charAt(i + 1) == 'u' || s.charAt(i + 1) == 'U')) {
          i += 1; unicodeEscape(sb)
        } else { sb.append(peek); i += 1 }
      }
      if (eof) err("unterminated IRI")
      i += 1
      resolve(sb.toString)
    }

    private def unicodeEscape(sb: StringBuilder): Unit = {
      val n = if (peek == 'u') 4 else 8
      if (i + n >= s.length) err("truncated unicode escape")
      val hex = s.substring(i + 1, i + 1 + n)
      sb.appendAll(Character.toChars(Integer.parseInt(hex, 16)))
      i += 1 + n
    }

    private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:.*".r
    private def resolve(ref: String): String =
      if (ref.isEmpty) base
      else if (SchemeRe.matches(ref)) ref
      else if (ref.startsWith("#")) base.takeWhile(_ != '#') + ref
      else if (ref.startsWith("//")) base.takeWhile(_ != ':') + ":" + ref
      else if (ref.startsWith("/")) {
        val schemeEnd = base.indexOf("://")
        if (schemeEnd < 0) base + ref
        else {
          val authEnd = base.indexOf('/', schemeEnd + 3)
          (if (authEnd < 0) base else base.substring(0, authEnd)) + ref
        }
      } else base + ref

    private def isLocalChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_' || c == '-' || c == '.' || c == '%'

    /** Prefixed name `pn:local` → expanded IRI. Trailing dots are pushed
      * back (they terminate the statement, not the name); `\`-escapes in
      * the local part are taken literally. */
    private def prefixedName(): String = {
      val p = new StringBuilder
      while (!eof && peek != ':' && (Character.isLetterOrDigit(peek) || peek == '_' || peek == '-' || peek == '.')) {
        p.append(peek); i += 1
      }
      expect(':')
      val ns = prefixes.getOrElse(p.toString,
        err(s"undeclared prefix '${p.toString}'"))
      val local = new StringBuilder
      var done = false
      while (!eof && !done) {
        if (peek == '\\' && i + 1 < s.length) { local.append(s.charAt(i + 1)); i += 2 }
        else if (isLocalChar(peek)) { local.append(peek); i += 1 }
        else done = true
      }
      // a '.' run at the end is statement punctuation, not name chars
      var l = local.toString
      while (l.nonEmpty && l.last == '.') { l = l.dropRight(1); i -= 1 }
      ns + l
    }

    private def iri(): String = {
      skipWs()
      if (peek == '<') iriRef() else prefixedName()
    }

    private def freshBlank(): String = { anonN += 1; s"_:${scope}g$anonN" }

    private def blankNodeLabel(): String = {
      i += 2 // "_:"
      val sb = new StringBuilder
      while (!eof && isLocalChar(peek)) { sb.append(peek); i += 1 }
      var l = sb.toString
      while (l.nonEmpty && l.last == '.') { l = l.dropRight(1); i -= 1 }
      s"_:${scope}$l"
    }

    /** Short or long string in either quote style; returns the lexical
      * value with escapes processed, then consumes (and drops) any
      * language tag or datatype suffix. */
    private def literal(): String = {
      val q = peek
      val long = s.regionMatches(i, "" + q + q + q, 0, 3)
      val sb = new StringBuilder
      if (long) {
        i += 3
        var done = false
        while (!done) {
          if (i >= s.length) err("unterminated long string")
          else if (s.regionMatches(i, "" + q + q + q, 0, 3)) { i += 3; done = true }
          else if (peek == '\\' && i + 1 < s.length) stringEscape(sb)
          else { sb.append(peek); i += 1 }
        }
      } else {
        i += 1
        var done = false
        while (!done) {
          if (eof) err("unterminated string")
          else if (peek == q) { i += 1; done = true }
          else if (peek == '\\' && i + 1 < s.length) stringEscape(sb)
          else { sb.append(peek); i += 1 }
        }
      }
      // language tag / datatype — consumed, value stays lexical
      if (!eof && peek == '@') {
        i += 1
        while (!eof && (Character.isLetterOrDigit(peek) || peek == '-')) i += 1
      } else if (i + 1 < s.length && peek == '^' && s.charAt(i + 1) == '^') {
        i += 2; iri()
      }
      sb.toString
    }

    private def stringEscape(sb: StringBuilder): Unit = {
      s.charAt(i + 1) match {
        case 't' => sb.append('\t'); i += 2
        case 'b' => sb.append('\b'); i += 2
        case 'n' => sb.append('\n'); i += 2
        case 'r' => sb.append('\r'); i += 2
        case 'f' => sb.append('\f'); i += 2
        case 'u' | 'U' => i += 1; unicodeEscape(sb)
        case c => sb.append(c); i += 2 // \" \' \\
      }
    }

    private def numericOrBoolean(): String = {
      if (atWord("true")) { i += 4; "true" }
      else if (atWord("false")) { i += 5; "false" }
      else {
        val sb = new StringBuilder
        if (peek == '+' || peek == '-') { sb.append(peek); i += 1 }
        while (!eof && Character.isDigit(peek)) { sb.append(peek); i += 1 }
        // '.' only joins the number when followed by a digit — otherwise it
        // is the statement terminator
        if (!eof && peek == '.' && i + 1 < s.length && Character.isDigit(s.charAt(i + 1))) {
          sb.append('.'); i += 1
          while (!eof && Character.isDigit(peek)) { sb.append(peek); i += 1 }
        }
        if (!eof && (peek == 'e' || peek == 'E')) {
          sb.append(peek); i += 1
          if (!eof && (peek == '+' || peek == '-')) { sb.append(peek); i += 1 }
          while (!eof && Character.isDigit(peek)) { sb.append(peek); i += 1 }
        }
        if (sb.isEmpty) err("expected a term")
        sb.toString
      }
    }

    private def atWord(w: String): Boolean =
      s.regionMatches(i, w, 0, w.length) &&
        (i + w.length >= s.length || !isLocalChar(s.charAt(i + w.length)))

    private def subject(): String = {
      skipWs()
      peek match {
        case '<' if i + 1 < s.length && s.charAt(i + 1) == '<' => quotedTriple()
        case '<' => iriRef()
        case '_' => blankNodeLabel()
        case '[' => anonOrPropertyList()
        case '(' => collection()
        case _ => prefixedName()
      }
    }

    /** RDF-star quoted triple `<< s p o >>`, REIFIED ON PARSE into the
      * W3C mapping — a fresh statement node with rdf:type rdf:Statement
      * and rdf:subject/predicate/object arcs — so downstream consumers
      * (including fromTriples' reification handling) see plain triples;
      * the asserted/quoted distinction is intentionally collapsed the
      * way the reference's reification model does. The quoted triple
      * itself is NOT asserted (RDF-star semantics). */
    private def quotedTriple(): String = {
      i += 2 // '<<'
      val qs = subject()
      val qp = verb()
      val qo = obj()
      skipWs()
      if (i + 1 >= s.length || peek != '>' || s.charAt(i + 1) != '>') err("expected '>>'")
      i += 2
      anonN += 1
      val node = "_:" + scope + "qt" + anonN
      out += ((node, RdfType, RdfStatement))
      out += ((node, RdfSubject, qs))
      out += ((node, RdfPredicate, qp))
      out += ((node, RdfObject, qo))
      node
    }

    private def anonOrPropertyList(): String = {
      i += 1 // '['
      val b = freshBlank()
      skipWs()
      if (!eof && peek == ']') { i += 1; b }
      else {
        predicateObjectList(b)
        expect(']')
        b
      }
    }

    private def collection(): String = {
      i += 1 // '('
      val items = ArrayBuffer.empty[String]
      skipWs()
      while (!eof && peek != ')') { items += obj(); skipWs() }
      expect(')')
      if (items.isEmpty) RdfNil
      else {
        val cells = items.map(_ => freshBlank())
        cells.indices.foreach { k =>
          out += ((cells(k), RdfFirst, items(k)))
          out += ((cells(k), RdfRest, if (k + 1 < cells.length) cells(k + 1) else RdfNil))
        }
        cells.head
      }
    }

    private def obj(): String = {
      skipWs()
      peek match {
        case '<' if i + 1 < s.length && s.charAt(i + 1) == '<' => quotedTriple()
        case '<' => iriRef()
        case '_' => blankNodeLabel()
        case '[' => anonOrPropertyList()
        case '(' => collection()
        case '"' | '\'' => literal()
        case c if Character.isDigit(c) || c == '+' || c == '-' ||
          (c == '.' && i + 1 < s.length && Character.isDigit(s.charAt(i + 1))) =>
          numericOrBoolean()
        case _ if atWord("true") || atWord("false") => numericOrBoolean()
        case _ => prefixedName()
      }
    }

    private def verb(): String = {
      skipWs()
      // 'a' is the rdf:type keyword iff the next char cannot continue a
      // prefixed name ('a:x' and 'abc:x' are names; 'a "lit"', 'a _:b',
      // 'a <iri>' are keyword uses)
      if (peek == 'a' && i + 1 < s.length && {
        val c = s.charAt(i + 1)
        !isLocalChar(c) && c != ':'
      }) { i += 1; RdfType }
      else iri()
    }

    private def predicateObjectList(subj: String): Unit = {
      var go = true
      while (go) {
        val p = verb()
        var more = true
        while (more) {
          out += ((subj, p, obj()))
          skipWs()
          if (!eof && peek == ',') i += 1 else more = false
        }
        skipWs()
        if (!eof && peek == ';') {
          // consecutive ';' separators are legal (empty items)
          while (!eof && peek == ';') { i += 1; skipWs() }
          if (eof || peek == '.' || peek == ']') go = false
        } else go = false
      }
    }
  }

  // --------------------------------------------------------------- RDF/XML

  /** Parse RDF/XML file(s) at `path` into an (s, p, o) DataFrame — one
    * StAX parse task per file (same distribution shape as the S10
    * metabolights reader, `Ingest.fromMetabolightsXml`). */
  def parseRdfXml(spark: SparkSession, path: String,
                  base: String = DefaultBase): DataFrame = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (p, xml) => parseRdfXmlString(xml, base, scopeFor(p)) }
      .toDF("s", "p", "o")
  }

  private sealed trait Frame
  /** A node element: children are property elements of `subj`. */
  private final class NodeF(val subj: String, var liCounter: Int = 0) extends Frame
  /** A property element: `text` accumulates the literal value unless a
    * child node element (or rdf:resource/nodeID attribute) set the
    * object. */
  private final class PropF(val subj: String, val pred: String,
                            var objectEmitted: Boolean) extends Frame {
    val text = new StringBuilder
  }
  /** rdf:parseType="Collection": children are node elements collected
    * into an rdf:first/rest chain at END. */
  private final class CollF(val subj: String, val pred: String) extends Frame {
    val items = ArrayBuffer.empty[String]
  }
  /** rdf:parseType="Literal": the XML island is absorbed — nested markup
    * tracked by depth, only its text content kept as the literal value. */
  private final class LitF(val subj: String, val pred: String) extends Frame {
    val text = new StringBuilder
    var depth = 0
  }
  private case object RootF extends Frame

  /** StAX RDF/XML parser covering the striped syntax real ontology dumps
    * use: `rdf:Description` and typed node elements, `rdf:about` /
    * `rdf:ID` / `rdf:nodeID` / anonymous subjects, property attributes,
    * property elements with `rdf:resource` / `rdf:nodeID` / literal
    * content / nested node elements, `rdf:parseType` Resource and
    * Collection, `rdf:li` → `rdf:_n`. `rdf:datatype` and `xml:lang` are
    * consumed (values stay lexical, matching the Turtle/NTriples paths);
    * `parseType="Literal"` keeps only the text content of the XML island. */
  private[ingest] def parseRdfXmlString(
      xml: String, base: String = DefaultBase,
      scope: String = "x"): Seq[(String, String, String)] = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants => C}
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(new java.io.StringReader(xml))
    val out = ArrayBuffer.empty[(String, String, String)]
    val stack = mutable.Stack.empty[Frame]
    var anonN = 0
    def freshBlank(): String = { anonN += 1; s"_:${scope}g$anonN" }
    val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:.*".r
    def resolve(ref: String): String =
      if (ref.isEmpty || SchemeRe.matches(ref)) (if (ref.isEmpty) base else ref)
      else if (ref.startsWith("#")) base.takeWhile(_ != '#') + ref
      else base + ref

    def attrMap(): Map[(String, String), String] =
      (0 until r.getAttributeCount).map { k =>
        (Option(r.getAttributeNamespace(k)).getOrElse(""), r.getAttributeLocalName(k)) ->
          r.getAttributeValue(k)
      }.toMap

    /** Start of a node element; returns its subject. */
    def nodeElement(parent: Option[(String, String)]): Unit = {
      val attrs = attrMap()
      val subj = attrs.get((RdfNs, "about")).map(resolve)
        .orElse(attrs.get((RdfNs, "ID")).map(id => base.takeWhile(_ != '#') + "#" + id))
        .orElse(attrs.get((RdfNs, "nodeID")).map(n => s"_:$scope$n"))
        .getOrElse(freshBlank())
      val ns = Option(r.getNamespaceURI).getOrElse("")
      if (!(ns == RdfNs && r.getLocalName == "Description"))
        out += ((subj, RdfType, ns + r.getLocalName))
      // property attributes (rdf:type resolves as a resource, others are
      // literals)
      attrs.foreach {
        case ((RdfNs, "type"), v) => out += ((subj, RdfType, resolve(v)))
        case ((RdfNs, _), _) => // syntax attributes
        case ((XmlNs, _), _) => // xml:lang / xml:base etc.
        case (("", _), _) => // non-namespaced attrs are not RDF
        case ((ans, local), v) => out += ((subj, ans + local, v))
      }
      parent.foreach { case (ps, pp) => out += ((ps, pp, subj)) }
      stack.push(new NodeF(subj))
    }

    def propertyElement(n: NodeF): Unit = {
      val ns = Option(r.getNamespaceURI).getOrElse("")
      val pred =
        if (ns == RdfNs && r.getLocalName == "li") {
          n.liCounter += 1; s"${RdfNs}_${n.liCounter}"
        } else ns + r.getLocalName
      val attrs = attrMap()
      attrs.get((RdfNs, "parseType")) match {
        case Some("Resource") =>
          val b = freshBlank()
          out += ((n.subj, pred, b))
          stack.push(new NodeF(b))
        case Some("Collection") =>
          stack.push(new CollF(n.subj, pred))
        case Some("Literal") =>
          stack.push(new LitF(n.subj, pred))
        case _ =>
          attrs.get((RdfNs, "resource")) match {
            case Some(res) =>
              out += ((n.subj, pred, resolve(res)))
              stack.push(new PropF(n.subj, pred, objectEmitted = true))
            case None => attrs.get((RdfNs, "nodeID")) match {
              case Some(nid) =>
                out += ((n.subj, pred, s"_:$scope$nid"))
                stack.push(new PropF(n.subj, pred, objectEmitted = true))
              case None =>
                stack.push(new PropF(n.subj, pred, objectEmitted = false))
            }
          }
      }
    }

    while (r.hasNext) {
      r.next() match {
        case C.START_ELEMENT =>
          val isRdfRoot = Option(r.getNamespaceURI).contains(RdfNs) && r.getLocalName == "RDF"
          if (stack.isEmpty) {
            if (isRdfRoot) stack.push(RootF) else nodeElement(None)
          } else stack.top match {
            case l: LitF => l.depth += 1 // markup inside the XML island
            case RootF => nodeElement(None)
            case p: PropF =>
              p.objectEmitted = true
              nodeElement(Some((p.subj, p.pred)))
            case c: CollF =>
              // capture the child's subject by peeking the frame nodeElement pushes
              nodeElement(None)
              stack.top match {
                case nf: NodeF => c.items += nf.subj
                case _ =>
              }
            case n: NodeF => propertyElement(n)
          }
        case C.CHARACTERS | C.CDATA =>
          if (stack.nonEmpty) stack.top match {
            case p: PropF if !p.objectEmitted => p.text.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
            case l: LitF => l.text.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
            case _ =>
          }
        case C.END_ELEMENT =>
          if (stack.nonEmpty) stack.top match {
            case l: LitF if l.depth > 0 =>
              l.depth -= 1 // closing a nested island element, frame stays
            case _ => stack.pop() match {
              case l: LitF => out += ((l.subj, l.pred, l.text.toString))
              case p: PropF =>
                if (!p.objectEmitted) out += ((p.subj, p.pred, p.text.toString))
              case c: CollF =>
                if (c.items.isEmpty) out += ((c.subj, c.pred, RdfNil))
                else {
                  val cells = c.items.map(_ => freshBlank())
                  out += ((c.subj, c.pred, cells.head))
                  cells.indices.foreach { k =>
                    out += ((cells(k), RdfFirst, c.items(k)))
                    out += ((cells(k), RdfRest,
                      if (k + 1 < cells.length) cells(k + 1) else RdfNil))
                  }
                }
              case _ => // NodeF / RootF carry no pending state
            }
          }
        case _ =>
      }
    }
    r.close()
    out.toSeq
  }

  // ---------------------------------------------------------------- NQuads

  /** Parse NQuads lines into an (s, p, o) DataFrame, keeping only the
    * named graphs in `graphs` (empty = keep everything, matching the
    * reference's `rdf_graph` filter, `main.rs:117-135`). Default-graph
    * triples (no 4th term) survive only the empty filter, like a quad
    * whose graph is not in the list. */
  def parseNQuads(spark: SparkSession, path: String,
                  graphs: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, input_file_name}
    val keep = graphs.toSet
    // blank-node labels scope per source file (same invariant as the
    // Turtle/RDF-XML paths) — the line scan stays distributed, the scope
    // hash is memoised per file within each partition
    spark.read.textFile(path)
      .select(col("value"), input_file_name().as("src"))
      .as[(String, String)]
      .mapPartitions { it =>
        var lastFile: String = null
        var lastScope: String = ""
        it.flatMap { case (line, src) =>
          if (src != lastFile) { lastFile = src; lastScope = scopeFor(src) }
          val scope = lastScope
          def scoped(t: String): String =
            if (t.startsWith("_:")) "_:" + scope + t.drop(2) else t
          parseQuadLine(line).collect {
            case (s, p, o, g) if keep.isEmpty || g.exists(keep.contains) =>
              (scoped(s), p, scoped(o))
          }
        }
      }.toDF("s", "p", "o")
  }

  /** Escape-aware scanner for one NTriples/NQuads line →
    * (s, p, o, graph?). Returns None for blank lines, comments and
    * malformed lines (the reference's line parsers also stream past
    * garbage rather than failing the load). */
  private[ingest] def parseQuadLine(
      line: String): Option[(String, String, String, Option[String])] = {
    var i = 0
    val n = line.length
    def skipWs(): Unit = { while (i < n && Character.isWhitespace(line.charAt(i))) i += 1 }

    /** One term at the cursor: returns (value, isIri) or None. */
    def term(): Option[(String, Boolean)] = {
      skipWs()
      if (i >= n) return None
      line.charAt(i) match {
        case '<' =>
          val end = line.indexOf('>', i + 1)
          if (end < 0) None else { val v = line.substring(i + 1, end); i = end + 1; Some((v, true)) }
        case '_' if i + 1 < n && line.charAt(i + 1) == ':' =>
          val st = i
          while (i < n && !Character.isWhitespace(line.charAt(i))) i += 1
          Some((line.substring(st, i), false))
        case '"' =>
          val sb = new StringBuilder
          i += 1
          var closed = false
          while (!closed && i < n) {
            line.charAt(i) match {
              case '\\' if i + 1 < n =>
                line.charAt(i + 1) match {
                  case 't' => sb.append('\t'); i += 2
                  case 'b' => sb.append('\b'); i += 2
                  case 'n' => sb.append('\n'); i += 2
                  case 'r' => sb.append('\r'); i += 2
                  case 'f' => sb.append('\f'); i += 2
                  case 'u' if i + 5 < n =>
                    sb.appendAll(Character.toChars(Integer.parseInt(line.substring(i + 2, i + 6), 16)))
                    i += 6
                  case 'U' if i + 9 < n =>
                    sb.appendAll(Character.toChars(Integer.parseInt(line.substring(i + 2, i + 10), 16)))
                    i += 10
                  case c => sb.append(c); i += 2
                }
              case '"' => closed = true; i += 1
              case c => sb.append(c); i += 1
            }
          }
          if (!closed) None
          else {
            // language tag / datatype suffix — consumed, dropped
            if (i < n && line.charAt(i) == '@') {
              i += 1
              while (i < n && !Character.isWhitespace(line.charAt(i))) i += 1
            } else if (i + 1 < n && line.charAt(i) == '^' && line.charAt(i + 1) == '^') {
              i += 2
              if (i < n && line.charAt(i) == '<') {
                val end = line.indexOf('>', i)
                i = if (end < 0) n else end + 1
              }
            }
            Some((sb.toString, false))
          }
        case _ => None
      }
    }

    skipWs()
    if (i >= n || line.charAt(i) == '#') return None
    for {
      (s, _) <- term()
      (p, pIri) <- term() if pIri
      (o, _) <- term()
    } yield {
      val g = term().map(_._1)
      (s, p, o, g)
    }
  }
}
