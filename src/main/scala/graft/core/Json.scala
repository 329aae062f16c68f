package graft.core

/** Minimal deterministic JSON rendering (sorted keys) — used wherever a
  * nested structure must act as a grouping/dedup key or a golden-file
  * byte-stable output (the reference asserts fixed key order everywhere,
  * e.g. `grebi_shared/src/slice_merged_entity.rs:45-75`). */
object Json {
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      // \b and \f shorthands match the reference's serde_json escaping —
      // / forms are valid JSON but not byte-identical
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def str(s: String): String = "\"" + escape(s) + "\""

  def strArray(vs: Seq[String]): String =
    vs.map(str).mkString("[", ",", "]")

  /** UTF-8 byte order (= code-point order) — what a Rust BTreeMap and
    * Spark's UTF8String binary comparison both use. Java String's natural
    * order compares UTF-16 units, which inverts supplementary characters
    * against U+E000..U+FFFF; every ordering that must agree with either
    * the reference or a Catalyst sort goes through this. */
  def utf8Compare(x: String, y: String): Int = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val cx = x.codePointAt(i); val cy = y.codePointAt(i)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
    }
    Integer.compare(x.length, y.length)
  }
  val utf8Ordering: Ordering[String] = (x, y) => utf8Compare(x, y)

  /** Canonical (sorted-key) object of string-array values. */
  def strMap(m: Map[String, Seq[String]]): String =
    m.toSeq.sortBy(_._1)(utf8Ordering)
      .map { case (k, vs) => str(k) + ":" + strArray(vs) }
      .mkString("{", ",", "}")
}
