package graft.operators

import graft.core.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Generic data-profiling operator — the data-quality pass a training
  * pipeline runs before touching a new source: per-column row/null/
  * distinct counts plus min/max, emitted in long format so the output
  * schema is independent of the profiled table's schema (same open-schema
  * principle as the props map). One aggregation per column over a shared
  * cached scan; Spark runs them as parallel jobs.
  */
object Profiler {

  /** Long-format profile: (column, n_rows, n_null, n_distinct, min, max)
    * with min/max rendered as strings for schema stability.
    * ONE scan: all 5·N aggregates run in a single pass, then the
    * one-row result unpivots with stack() — no per-column rescan. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    require(columns.forall(c => !c.contains("`") && !c.contains("'")),
      "column names with quote characters are not supported by the stack unpivot")
    val aggs = columns.flatMap(c => Seq(
      count(lit(1)).as(s"${c}__n"),
      sum(col(c).isNull.cast("long")).as(s"${c}__null"),
      count_distinct(col(c)).as(s"${c}__dist"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${columns.length}, " + columns.map(c =>
      s"'$c', `${c}__n`, `${c}__null`, `${c}__dist`, `${c}__min`, `${c}__max`")
      .mkString(", ") +
      ") AS (column, n_rows, n_null, n_distinct, min_value, max_value)"
    row.selectExpr(stackExpr)
  }
}

object ProfilerOps extends QueryModule {

  /** p2 — EMBEDDING-column profile: per-DIMENSION stats over the vector
    * column (n, min, max, integer-exact sum and sum-of-squares over the
    * 1e3-quantized values) — the drift/health check a feature store runs
    * on every embedding refresh: a dimension whose range collapses or
    * whose second moment jumps flags a broken encoder upstream. One
    * posexplode + one groupBy(dim); integer sums keep it engine-exact
    * (mean/variance derive downstream as sum/n). */
  def profileEmbeddings(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(posexplode(graft.core.Exact.quantize(col("embedding"), 1000)))
      .groupBy(col("pos").as("dim"))
      .agg(count(lit(1)).as("n"), min(col("col")).as("min_q"),
        max(col("col")).as("max_q"), sum(col("col")).as("sum_q"),
        sum(col("col") * col("col")).as("sumsq_q"))
      .orderBy(col("dim"))

  val profileEmbeddingsSql: String =
    s"""SELECT i - 1 AS dim, count(*) AS n,
      |  min(v) AS min_q, max(v) AS max_q,
      |  CAST(sum(v) AS BIGINT) AS sum_q,
      |  CAST(sum(v * v) AS BIGINT) AS sumsq_q
      |FROM (
      |  SELECT unnest(${graft.core.Exact.sqlQuantize("embedding", 1000)}) AS v,
      |    unnest(generate_series(1, len(embedding))) AS i
      |  FROM embeddings)
      |GROUP BY i - 1 ORDER BY dim""".stripMargin

  /** p3 — CORRELATION SUFFICIENT STATISTICS: the five exact sums Pearson
    * r needs (n, Σx, Σy, Σxy, Σx², Σy²) per group, computed in decimal
    * fixed-point so they are engine-exact; the float division happens
    * downstream in whatever precision the consumer wants (r itself is a
    * ratio of these and would differ in the last ulp between engines).
    * The drift-vs-price-correlation health check a feature pipeline runs
    * per shard — one map-side-combined groupBy. Money values carry 2
    * decimals, so products stay inside DECIMAL(38, 6) with no rounding. */
  def correlationStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val x = col("l_quantity").cast(DecimalType(12, 2))
    val y = col("l_extendedprice").cast(DecimalType(12, 2))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast(DoubleType).as("sum_x"),
        sum(y).cast(DoubleType).as("sum_y"),
        sum(x * y).cast(DoubleType).as("sum_xy"),
        sum(x * x).cast(DoubleType).as("sum_x2"),
        sum(y * y).cast(DoubleType).as("sum_y2"))
      .orderBy(col("l_returnflag"))
  }

  val correlationStatsSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(x) AS DOUBLE) AS sum_x,
      |  CAST(sum(y) AS DOUBLE) AS sum_y,
      |  CAST(sum(x * y) AS DOUBLE) AS sum_xy,
      |  CAST(sum(x * x) AS DOUBLE) AS sum_x2,
      |  CAST(sum(y * y) AS DOUBLE) AS sum_y2
      |FROM (SELECT l_returnflag,
      |        CAST(l_quantity AS DECIMAL(12,2)) AS x,
      |        CAST(l_extendedprice AS DECIMAL(12,2)) AS y
      |      FROM lineitem)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  def profileCustomer(s: SparkSession, d: String): DataFrame =
    Profiler.profile(Tables.customer(s, d),
      Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
      .orderBy(col("column"))

  val profileCustomerSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |  CAST(sum(CAST($c IS NULL AS BIGINT)) AS BIGINT) AS n_null,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_value,
         |  CAST(max($c) AS VARCHAR) AS max_value
         |FROM customer""".stripMargin
    Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
      .map(one).mkString("\nUNION ALL\n") + "\nORDER BY \"column\""
  }

  override val defs: ListMap[String, QueryDef] = ListMap(
    "p1_profile_customer" -> QueryDef(profileCustomer, Some(profileCustomerSql)),
    "p2_profile_embeddings" -> QueryDef(profileEmbeddings, Some(profileEmbeddingsSql)),
    "p3_correlation_stats" -> QueryDef(correlationStats, Some(correlationStatsSql)),
  )
}
