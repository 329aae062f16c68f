package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftglue.Glue

/** Column-level surface for Spark's INTERNAL Bloom-filter expressions —
  * the machinery behind runtime-filter join pruning
  * (`BloomFilterAggregate` / `BloomFilterMightContain`), which Spark
  * does not register as SQL functions. The engine uses them for
  * explicit semi-join pre-filtering at corpus scale (t32): build one
  * mergeable filter over the SMALL side, stream the huge side through a
  * row-local `might_contain` at the scan, then exact-join only the
  * survivors. False positives are removed by the exact join, so a Bloom
  * pre-filter never changes results — only shuffle volume. */
object Bloom {
  /** Aggregate: a Bloom filter (binary blob) over xxhash64(col). */
  def filterAgg(c: Column, estimatedItems: Long, numBits: Long): Column =
    Glue.column(new BloomFilterAggregate(
      Glue.expression(xxhash64(c)),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Row-local membership probe of `c` against the blob in `bloom`. */
  def mightContain(bloom: Column, c: Column): Column =
    Glue.column(BloomFilterMightContain(
      Glue.expression(bloom), Glue.expression(xxhash64(c))))
}
