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
    * padded with ""). */
  def readRows(bytes: Array[Byte]): Seq[Seq[String]] = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheet: Option[Array[Byte]] = None
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val name = e.getName
        if (name == "xl/sharedStrings.xml") shared = parseSharedStrings(zin.readAllBytes())
        else if (name == "xl/worksheets/sheet1.xml") sheet = Some(zin.readAllBytes())
        e = zin.getNextEntry
      }
    } finally zin.close()
    sheet match {
      case Some(b) => parseSheet(b, shared)
      case None => throw new IllegalArgumentException("not an xlsx: no xl/worksheets/sheet1.xml")
    }
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
