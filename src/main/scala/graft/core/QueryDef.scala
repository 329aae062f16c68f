package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/** One driver-checkable operator: a Spark query over the TESTDATA tables
  * plus (where SQL-expressible) an ANSI-SQL oracle DuckDB runs on the same
  * parquet. Column names must match between the two (the driver sorts
  * columns by name before hashing). Queries tagged `bench` form the
  * headline benchmark set run at sf0.1; `deep` additionally marks the
  * expensive tail of that set (> ~2 s at sf0.1 — TUNING.md "Benchmark
  * lanes"), which dev loops can include/exclude via
  * `SPARK_GRAFT_BENCH_LANE`.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false,
    deep: Boolean = false)

trait QueryModule {
  /** Insertion-ordered so Verify/Bench output is stable. */
  def defs: ListMap[String, QueryDef]
}
