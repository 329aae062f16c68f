package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** The dependency-free XLSX reader + the hett pesticide adapters
  * (reference: `01_ingest/hett_pesticides_{appril,eu,gb}.py`). */
class XlsxSpec extends AnyFunSuite {

  /** Build a minimal real xlsx: a zip with sharedStrings + sheet1. */
  private def xlsx(rows: Seq[Seq[String]]): Array[Byte] = {
    val strings = rows.flatten.distinct
    val idx = strings.zipWithIndex.toMap
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val ss = strings.map(s => s"<si><t>${esc(s)}</t></si>")
      .mkString("""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""", "", "</sst>")
    def colRef(c: Int): String = {
      var n = c + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sheet = rows.zipWithIndex.map { case (cells, r) =>
      cells.zipWithIndex.collect { case (v, c) if v.nonEmpty =>
        s"""<c r="${colRef(c)}${r + 1}" t="s"><v>${idx(v)}</v></c>"""
      }.mkString(s"""<row r="${r + 1}">""", "", "</row>")
    }.mkString("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""",
      "", "</sheetData></worksheet>")
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    entry("xl/sharedStrings.xml", ss)
    entry("xl/worksheets/sheet1.xml", sheet)
    z.close()
    bos.toByteArray
  }

  test("xlsx reader: shared strings, sparse cells, column refs") {
    assert(Xlsx.colIndex("A1") == 0 && Xlsx.colIndex("Z3") == 25 && Xlsx.colIndex("AA1") == 26)
    val rows = Xlsx.readRows(xlsx(Seq(
      Seq("h1", "h2", "h3"),
      Seq("a", "", "c")))) // sparse middle cell
    assert(rows.length == 2)
    assert(rows.head == Seq("h1", "h2", "h3"))
    assert(rows(1) == Seq("a", "", "c"))
  }

  test("first sheet resolves via workbook.xml + rels, not the part name") {
    // workbook order says the first sheet is the part named sheet3.xml
    // (as after deleting/reordering sheets); sheet1.xml is a decoy
    val mkSheet: String => String = v =>
      s"""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="str"><v>$v</v></c></row></sheetData></worksheet>"""
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    entry("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Data" sheetId="7" r:id="rId2"/><sheet name="Old" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet3.xml"/></Relationships>""")
    entry("xl/worksheets/sheet1.xml", mkSheet("decoy"))
    entry("xl/worksheets/sheet3.xml", mkSheet("real"))
    z.close()
    assert(Xlsx.readRows(bos.toByteArray) == Seq(Seq("real")))
  }

  test("split parity: gb Category raw split, eu/appril strip but keep empties") {
    val gbRows = Seq(
      Seq("j"), Seq(""), Seq("j"),
      Seq("Substance Name", "Category (2021)"),
      Seq("glyphosate", "a, b,,c"))
    val g = Ingest.hettRecords(Xlsx.readRows(xlsx(gbRows)), "gb", "GB", "hett")
      .find(_.ids == Seq("glyphosate")).get
    // raw str.split(','): leading spaces and empty items survive
    assert(g.props("Category").map(_.value) == Seq("a", " b", "", "c"))

    val euRows = Seq(
      Seq("t"), Seq(""),
      Seq("Substance", "Authorised"),
      Seq("copper", "FR, ,DE,"))
    val c = Ingest.hettRecords(Xlsx.readRows(xlsx(euRows)), "eu", "EU", "hett")
      .find(_.ids == Seq("copper")).get
    // map(strip): items stripped, empties (incl. trailing) kept
    assert(c.props("Authorised").map(_.value) == Seq("FR", "", "DE", ""))
  }

  test("appril: renames, CAS extraction, chemical side-nodes, splits") {
    val rows = Seq(
      Seq("REG_NUM", "PRODUCT_NAME", "PESTS", "AIS"),
      Seq("123-45", "WeedAway", "aphids, mites", "glyphosate 1071-83-6 and 100-00-0"),
      Seq("678-90", "BugOff", "", ""))
    val nodes = Ingest.hettRecords(Xlsx.readRows(xlsx(rows)), "appril", "APPRIL", "hett")
    val byId = nodes.groupBy(_.ids.head)
    val p1 = byId("appril:123-45").head
    assert(p1.types == Seq("hett:PesticideProduct"))
    assert(p1.props("grebi:name").map(_.value) == Seq("WeedAway"))
    assert(p1.props("PESTS").map(_.value) == Seq("aphids", "mites"))
    assert(p1.props("hett:hasActiveIngredient").map(_.value) ==
      Seq("cas:1071-83-6", "cas:100-00-0"))
    assert(p1.props("REG_NUM").map(_.value) == Seq("123-45")) // column kept, like pandas
    // chemical side-nodes emitted per CAS hit
    assert(byId("cas:1071-83-6").head.types == Seq("grebi:Chemical"))
    // row without AIS: no chemicals, no ingredient prop
    assert(!byId("appril:678-90").head.props.contains("hett:hasActiveIngredient"))
  }

  test("gb: skiprows, Category collapse, IUPAC equivalences, empty-id drop") {
    val rows = Seq(
      Seq("junk"), Seq(""), Seq("also junk"), // 3 skipped rows
      Seq("Substance Name", "Category (2021)", "CAS Number", "IUPAC Name"),
      Seq("glyphosate", "herbicide,fungicide", "1071-83-6", "N-(phosphonomethyl)glycine or not applicable;other name"),
      Seq("", "orphan", "", "")) // empty id → dropped
    val nodes = Ingest.hettRecords(Xlsx.readRows(xlsx(rows)), "gb", "HETT_GB", "hett")
    val subs = nodes.filter(_.types == Seq("hett:AgroSubstance"))
    assert(subs.length == 1)
    val g = subs.head
    assert(g.ids == Seq("glyphosate"))
    assert(g.props("Category").map(_.value) == Seq("herbicide", "fungicide"))
    assert(g.props("CAS Number").map(_.value) == Seq("cas:1071-83-6"))
    // 'not applicable' filtered; the ' or ' and ';' separators both split
    assert(g.props("grebi:equivalentTo").map(_.value) ==
      Seq("N-(phosphonomethyl)glycine", "other name"))
  }

  test("eu: skiprows=2, Substance becomes id AND name, CAS replaced in place") {
    val rows = Seq(
      Seq("title"), Seq(""),
      Seq("Substance", "Authorised", "CAS Number"),
      Seq("copper", "FR, DE", "7440-50-8"))
    val nodes = Ingest.hettRecords(Xlsx.readRows(xlsx(rows)), "eu", "HETT_EU", "hett")
    val c = nodes.find(_.ids.head == "copper").get
    assert(c.props("grebi:name").map(_.value) == Seq("copper"))
    assert(c.props("Authorised").map(_.value) == Seq("FR", "DE"))
    assert(c.props("CAS Number").map(_.value) == Seq("cas:7440-50-8"))
    assert(nodes.exists(_.ids.head == "cas:7440-50-8"))
  }
}
