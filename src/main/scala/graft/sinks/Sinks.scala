package graft.sinks

import graft.core.Json
import graft.model.MergedNode
import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StringType}

/** 06/07 sink parity (SURVEY §2.9 K1–K8): the open-schema props map is
  * pivoted to wide/flattened layouts only here, at the edge of the system —
  * inside the engine the schema stays fixed (map column), so these are the
  * only operators whose column set depends on the data.
  */
object Sinks {

  /** 0x1F unit separator — the Neo4j bulk-import array delimiter
    * (`neo4j_import.dockersh:19-27` `--array-delimiter=U+001F`). */
  val ArraySep = "\u001f"

  private def valuesOf(key: String): Column =
    transform(element_at(col("props"), key), v => v.getField("value"))

  /** K1 — Neo4j nodes CSV frame: one `string[]` column per observed
    * property (the two-pass open-schema pivot: key union first — here the
    * caller passes it from Index.entityPropCounts — then the wide
    * projection; `grebi_make_neo_csv/src/main.rs:62-70,96-114,174-274`).
    * Arrays are 0x1F-joined; `:LABEL` = GraphNode + each type. */
  def neoNodesCsvFrame(nodes: Dataset[MergedNode], propKeys: Seq[String],
                       displayTypes: DataFrame): DataFrame = {
    val base = nodes.toDF()
      .join(displayTypes, Seq("nodeId"), "left")
    val propCols = propKeys.sorted
      .filter(k => k != "grebi:type")
      .map(k => when(map_contains_key(col("props"), k),
        array_join(valuesOf(k), ArraySep)).otherwise(lit(null)).as(k))
    base.select(
      Seq(
        col("nodeId").as("grebi:nodeId:ID"),
        array_join(
          concat(array(lit("GraphNode")),
            coalesce(transform(element_at(col("props"), "grebi:type"),
              v => v.getField("value")), array())), ArraySep).as(":LABEL"),
        array_join(col("datasources"), ArraySep).as("grebi:datasources"),
        col("subgraph").as("grebi:subgraph"),
        col("displayType").as("grebi:displayType")) ++ propCols: _*)
  }

  /** K2/K3 — Neo4j edges CSV frame
    * (`grebi_make_neo_csv/src/main.rs:105-111,276-345`). */
  def neoEdgesCsvFrame(edges: DataFrame): DataFrame =
    edges.select(
      col("fromNodeId").as(":START_ID"),
      col("edgeType").as(":TYPE"),
      col("toNodeId").as(":END_ID"),
      col("edgeId").as("edge_id"),
      array_join(col("datasources"), ArraySep).as("grebi:datasources"),
      col("subgraph").as("grebi:subgraph"),
      array_join(col("fromSourceIds"), ArraySep).as("grebi:fromSourceIds"))

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true").option("escape", "\"")
      .csv(path)

  /** K5 — Solr-style flattened docs: provenance/reified wrappers
    * unwrapped, `:`→`__` in keys (`grebi_make_solr/src/main.rs:114-219`).
    * Emitted as JSONL with deterministic key order. */
  def solrDocs(nodes: Dataset[MergedNode]): Dataset[String] = {
    val s = nodes.sparkSession
    import s.implicits._
    nodes.map { n =>
      val flat: Map[String, Seq[String]] =
        Map("grebi__nodeId" -> Seq(n.nodeId),
            "grebi__datasources" -> n.datasources,
            "grebi__subgraph" -> Seq(n.subgraph)) ++
        n.props.map { case (k, vs) =>
          k.replace(":", "__") -> vs.map(_.value)
        }
      Json.strMap(flat)
    }
  }

  def writeSolr(nodes: Dataset[MergedNode], path: String): Unit =
    solrDocs(nodes).write.mode(SaveMode.Overwrite).text(path)

  /** K6 — id→record store: the RocksDB analog is a parquet table sorted
    * by key (`grebi_make_rocks/src/main.rs:41-77`); sortWithinPartitions
    * + range partitioning gives row-group min/max pruning, so a point
    * lookup reads one row group, not the table. */
  def writeKvStore(nodes: Dataset[MergedNode], path: String, buckets: Int = 32): Unit = {
    val s = nodes.sparkSession
    import s.implicits._
    nodes.map(n => (n.nodeId, renderNode(n)))
      .toDF("key", "value")
      .repartitionByRange(buckets, col("key"))
      .sortWithinPartitions("key")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def kvLookup(spark: org.apache.spark.sql.SparkSession, path: String, key: String): Option[String] = {
    val rows = spark.read.parquet(path).where(col("key") === key)
      .select("value").collect()
    rows.headOption.map(_.getString(0))
  }

  /** Render a value with its original JSON type (the reference carries
    * JSON scalar polymorphism through the pipeline, SURVEY §1.2): numbers
    * and booleans unquoted, nulls literal, nested JSON verbatim. */
  private def renderValue(value: String, kind: String): String = kind match {
    case graft.model.Kind.Num | graft.model.Kind.Bool | graft.model.Kind.Json => value
    case graft.model.Kind.Null => "null"
    case _ => Json.str(value)
  }

  /** K3 — sourceId edges (node → Id node) for the Neo4j id lookup core
    * (`grebi_make_neo_csv/src/main.rs:390-413`,
    * `grebi_make_neo_ids_csv/src/main.rs:5-31`). */
  def neoIdEdgesCsvFrame(nodes: Dataset[MergedNode]): DataFrame =
    nodes.toDF()
      .select(col("nodeId").as(":START_ID"), lit("id").as(":TYPE"),
        explode(col("sourceIds")).as(":END_ID"))

  def neoIdNodesCsvFrame(nodes: Dataset[MergedNode]): DataFrame =
    nodes.toDF()
      .select(explode(col("sourceIds")).as("id:ID"))
      .distinct()
      .withColumn(":LABEL", lit("Id"))

  /** Deterministic JSON rendering of a merged node — fixed special-key
    * order then sorted props, as the slicing readers require
    * (`grebi_shared/src/slice_merged_entity.rs:45-75`). */
  def renderNode(n: MergedNode): String = {
    val sb = new StringBuilder
    sb.append("{\"grebi:nodeId\":").append(Json.str(n.nodeId))
    sb.append(",\"grebi:datasources\":").append(Json.strArray(n.datasources))
    sb.append(",\"grebi:sourceIds\":").append(Json.strArray(n.sourceIds))
    sb.append(",\"grebi:subgraph\":").append(Json.str(n.subgraph))
    n.props.toSeq.sortBy(_._1).foreach { case (k, vs) =>
      sb.append(",").append(Json.str(k)).append(":[")
      vs.zipWithIndex.foreach { case (v, i) =>
        if (i > 0) sb.append(",")
        sb.append("{\"grebi:datasources\":").append(Json.strArray(v.datasources))
        sb.append(",\"grebi:sourceIds\":").append(Json.strArray(v.sourceIds))
        if (v.qualifiers.nonEmpty)
          sb.append(",\"grebi:properties\":").append(Json.strMap(v.qualifiers))
        sb.append(",\"grebi:value\":").append(renderValue(v.value, v.kind)).append("}")
      }
      sb.append("]")
    }
    sb.append("}").toString
  }
}
