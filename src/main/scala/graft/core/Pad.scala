package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The 9-digit zero-pad used to synthesise sortable node ids from integer
  * keys in the gate queries — ONE home (Spark column + DuckDB fragment)
  * because cross-module joins (e.g. traversal seeds vs graph ids) silently
  * break if two copies ever drift in width or fill. */
object Pad {
  def col9(c: Column): Column = lpad(c.cast("string"), 9, "0")
  def node(prefix: String, c: Column): Column = concat(lit(prefix), col9(c))
  def sql(col: String): String = s"lpad(CAST($col AS VARCHAR), 9, '0')"
}
