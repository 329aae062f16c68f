package graft.operators

import graft.core.{QueryDef, QueryModule, Tables}
import graft.model.{IngestNode, RawValue}
import graft.pipeline.{Incremental, SubgraphConfig}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** inc1 gate — the incremental build ([[graft.pipeline.Incremental]])
  * driven over two update batches whose combined result has a closed
  * form: update 1 ingests every customer under two equivalent id schemes
  * (`c:` + `alt:`); update 2 ingests all orders (referencing the
  * NON-canonical `c:` id, so the incremental groups table must rewrite
  * values exactly like the batch assign) plus a second datasource adding
  * a segment property to even customers only (so odd customers' merged
  * rows must survive from generation 1 untouched). The oracle replays
  * the batch-build expectation — the gate passes only if
  * update(A); update(B) ≡ run(A ∪ B). */
object IncrementalOps extends QueryModule {

  private def node(prefix: String, c: Column): Column = graft.core.Pad.node(prefix, c)
  private val sqlPad = (col: String) => graft.core.Pad.sql(col)

  def incrementalBuild(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val config = SubgraphConfig(name = "tpch")
    val upd1 = Tables.customer(s, d)
      .select(node("c:", col("c_custkey")).as("id"), node("alt:", col("c_custkey")).as("alt"),
        col("c_name").as("nm"))
      .as[(String, String, String)]
      .map { case (id, alt, nm) =>
        IngestNode(Seq(id, alt), "ds_cust", "tpch", Seq("Customer"),
          Map("grebi:name" -> Seq(RawValue.str(nm))))
      }
    Incremental.update(s, config, dir, upd1)
    val ords = Tables.orders(s, d)
      .select(node("o:", col("o_orderkey")).as("id"), node("c:", col("o_custkey")).as("cust"))
      .as[(String, String)]
      .map { case (id, cust) =>
        IngestNode(Seq(id), "ds_ord", "tpch", Seq("Order"),
          Map("ord:customer" -> Seq(RawValue.str(cust))))
      }
    val segs = Tables.customer(s, d)
      .where(col("c_custkey") % 2 === 0)
      .select(node("c:", col("c_custkey")).as("id"), col("c_mktsegment").as("seg"))
      .as[(String, String)]
      .map { case (id, seg) =>
        // typeless record: merges into the typed customer clique (the
        // no-type drop applies to the MERGED node, as in batch)
        IngestNode(Seq(id), "ds_seg", "tpch", Nil,
          Map("segment" -> Seq(RawValue.str(seg))))
      }
    Incremental.update(s, config, dir, ords.union(segs))
    val out = Incremental.currentMerged(s, dir)
      .flatMap { m =>
        m.props.toSeq.flatMap { case (k, vs) =>
          vs.map(v => (m.nodeId, k, v.value, v.datasources.sorted.mkString(",")))
        }
      }
      .toDF("node_id", "key", "value", "datasources")
      .orderBy(col("node_id"), col("key"), col("value"))
      // the gate result must outlive the temp state dir
      .localCheckpoint()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    out
  }

  val incrementalBuildSql: String =
    s"""WITH c AS (
      |  SELECT 'alt:' || ${sqlPad("c_custkey")} AS alt, c_name, c_mktsegment, c_custkey
      |  FROM customer),
      |o AS (
      |  SELECT 'o:' || ${sqlPad("o_orderkey")} AS oid,
      |         'alt:' || ${sqlPad("o_custkey")} AS cust
      |  FROM orders)
      |SELECT node_id, key, value, datasources FROM (
      |  SELECT alt AS node_id, 'grebi:name' AS key, c_name AS value, 'ds_cust' AS datasources FROM c
      |  UNION ALL SELECT alt, 'grebi:type', 'Customer', 'ds_cust' FROM c
      |  UNION ALL SELECT alt, 'segment', c_mktsegment, 'ds_seg' FROM c WHERE c_custkey % 2 = 0
      |  UNION ALL SELECT oid, 'ord:customer', cust, 'ds_ord' FROM o
      |  UNION ALL SELECT oid, 'grebi:type', 'Order', 'ds_ord' FROM o
      |) ORDER BY node_id, key, value""".stripMargin

  override val defs: ListMap[String, QueryDef] = ListMap(
    "inc1_incremental_build" -> QueryDef(incrementalBuild, Some(incrementalBuildSql)),
  )
}
