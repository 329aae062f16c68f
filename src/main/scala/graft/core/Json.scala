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
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def str(s: String): String = "\"" + escape(s) + "\""

  def strArray(vs: Seq[String]): String =
    vs.map(str).mkString("[", ",", "]")

  /** Canonical (sorted-key) object of string-array values. */
  def strMap(m: Map[String, Seq[String]]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, vs) => str(k) + ":" + strArray(vs) }
      .mkString("{", ",", "}")
}
