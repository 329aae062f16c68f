package graft.ingest

import scala.collection.mutable.ArrayBuffer

/** Minimal dependency-free XLSX sheet reader — an .xlsx file is a zip of
  * XML parts, so `java.util.zip` + StAX cover the subset the hett
  * pesticide registries use (shared strings, inline strings, raw
  * values). Used by the hett adapters ([[Ingest.fromHettPesticides]]),
  * whose reference counterparts read the same files via pandas
  * (`01_ingest/hett_pesticides_appril.py:15` etc.).
  */
object Xlsx {

  /** Parse the first worksheet into rows of cell strings (sparse cells
    * padded with ""). "First" is workbook order: `xl/workbook.xml`'s
    * leading `<sheet>`'s r:id resolved through
    * `xl/_rels/workbook.xml.rels` — after sheet deletion/reordering the
    * first sheet often is NOT the part named sheet1.xml (pandas, which
    * the hett adapters mirror, resolves the same way). Falls back to
    * `xl/worksheets/sheet1.xml` for minimal workbook-less fixtures. */
  def readRows(bytes: Array[Byte]): Seq[Seq[String]] = {
    val parts = scala.collection.mutable.Map.empty[String, Array[Byte]]
    // buffer only the parts sheet resolution can need — a real workbook
    // also carries styles/themes/media that would otherwise be
    // materialised for nothing
    def needed(n: String): Boolean =
      n == "xl/workbook.xml" || n == "xl/_rels/workbook.xml.rels" ||
        n == "xl/sharedStrings.xml" || n.startsWith("xl/worksheets/")
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory && needed(e.getName)) parts(e.getName) = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val sheetName = firstSheetPart(parts).getOrElse("xl/worksheets/sheet1.xml")
    parts.get(sheetName) match {
      case Some(b) => parseSheet(b, shared)
      case None => throw new IllegalArgumentException(s"not an xlsx: no $sheetName")
    }
  }

  /** Resolve the workbook-order first sheet's zip entry name, if the
    * workbook + rels parts are present and consistent. */
  private def firstSheetPart(parts: collection.Map[String, Array[Byte]]): Option[String] =
    for {
      wb <- parts.get("xl/workbook.xml")
      rels <- parts.get("xl/_rels/workbook.xml.rels")
      rid <- firstSheetRelId(wb)
      target <- relTarget(rels, rid)
    } yield {
      val t = target.stripPrefix("/")
      if (t.startsWith("xl/")) t else s"xl/$t"
    }

  /** The r:id of the first `<sheet>` in `xl/workbook.xml`. */
  private def firstSheetRelId(bytes: Array[Byte]): Option[String] = {
    import javax.xml.stream.{XMLStreamConstants => C}
    val r = xmlReader(bytes)
    try {
      while (r.hasNext) {
        if (r.next() == C.START_ELEMENT && r.getLocalName == "sheet") {
          // r:id lives in the relationships namespace; match the local
          // name so unprefixed fixtures resolve too
          val n = r.getAttributeCount
          var i = 0
          while (i < n) {
            if (r.getAttributeLocalName(i) == "id")
              return Some(r.getAttributeValue(i))
            i += 1
          }
        }
      }
      None
    } finally r.close()
  }

  /** `Relationship Id="…" Target="…"` lookup in workbook.xml.rels. */
  private def relTarget(bytes: Array[Byte], rid: String): Option[String] = {
    import javax.xml.stream.{XMLStreamConstants => C}
    val r = xmlReader(bytes)
    try {
      while (r.hasNext) {
        if (r.next() == C.START_ELEMENT && r.getLocalName == "Relationship" &&
            r.getAttributeValue(null, "Id") == rid)
          return Some(r.getAttributeValue(null, "Target"))
      }
      None
    } finally r.close()
  }

  private def xmlReader(bytes: Array[Byte]) = {
    import javax.xml.stream.XMLInputFactory
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
  }

  /** `<si>` entries; rich-text runs concatenate their `<t>` pieces. */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    import javax.xml.stream.{XMLStreamConstants => C}
    val r = xmlReader(bytes)
    val out = ArrayBuffer.empty[String]
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case C.START_ELEMENT => r.getLocalName match {
          case "si" => cur = new StringBuilder
          case "t" if cur != null => inT = true
          case _ =>
        }
        case C.CHARACTERS | C.CDATA if inT =>
          cur.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
        case C.END_ELEMENT => r.getLocalName match {
          case "t" => inT = false
          case "si" => out += cur.toString; cur = null
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    out.toIndexedSeq
  }

  /** "BC7" → 0-based column index 54. */
  private[ingest] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && Character.isLetter(ref.charAt(i))) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String]): Seq[Seq[String]] = {
    import javax.xml.stream.{XMLStreamConstants => C}
    val r = xmlReader(bytes)
    val rows = ArrayBuffer.empty[Seq[String]]
    var row: ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var value: StringBuilder = null
    var inV = false
    while (r.hasNext) {
      r.next() match {
        case C.START_ELEMENT => r.getLocalName match {
          case "row" => row = ArrayBuffer.empty[String]
          case "c" if row != null =>
            cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex)
              .getOrElse(row.length)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            value = new StringBuilder
          case "v" | "t" if value != null => inV = true
          case _ =>
        }
        case C.CHARACTERS | C.CDATA if inV =>
          value.appendAll(r.getTextCharacters, r.getTextStart, r.getTextLength)
        case C.END_ELEMENT => r.getLocalName match {
          case "v" | "t" => inV = false
          case "c" if row != null =>
            val raw = value.toString
            val v = cellType match {
              case "s" => shared.lift(raw.trim.toInt).getOrElse("")
              case _ => raw // "str", "inlineStr" (via <t>), numeric, bool
            }
            while (row.length < cellCol) row += "" // pad skipped cells
            if (cellCol >= 0 && cellCol < row.length) row(cellCol) = v else row += v
            value = null
          case "row" => rows += row.toSeq; row = null
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    rows.toSeq
  }
}
