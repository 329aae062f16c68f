package graft.index

import graft.model.MergedNode
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** 04_index parity (SURVEY §2.4 A2/A3, §1.4): the single stats pass over
  * merged entities that produces the metadata "dimension table", the
  * summary counts, and the sorted name/id lists.
  *
  * The reference does this in one 64 GB single-node pass
  * (`04_index/grebi_index/src/main.rs:54-242`); here each product is an
  * independent aggregation over the cached merged Dataset — Spark runs
  * them as parallel jobs off one shuffle-free scan each.
  */
object Index {

  /** metadata.jsonl analog (`grebi_index/src/main.rs:80-199`): the
    * projection joined against everywhere downstream. Broadcast-sized in
    * most deployments; at the extreme it stays a DataFrame and the
    * materialise joins shuffle instead (Catalyst decides by stats). */
  def metadata(nodes: Dataset[MergedNode]): DataFrame = {
    // Column-native since round 16 (was a typed map): over a cached or
    // parquet MergedNode source this prunes to (nodeId, datasources,
    // props) and stays in codegen, where the typed map deserialized every
    // whole record per metadata consumer. try_element_at because ANSI
    // map[key] throws on missing keys; types sort by array_sort's UTF-8
    // binary order (== DuckDB's and the reference BTreeMap's collation;
    // the old Scala `.sorted` compared UTF-16 units, which only disagrees
    // on astral-plane type names — none exist in any gate fixture).
    val typeVals = transform(
      try_element_at(col("props"), lit("grebi:type")), v => v.getField("value"))
    nodes.toDF().select(
      col("nodeId"),
      col("datasources"),
      coalesce(array_sort(array_distinct(typeVals)),
        array().cast("array<string>")).as("types"),
      get(try_element_at(col("props"), lit("grebi:name")), lit(0))
        .getField("value").as("name"))
  }

  /** Per-property assertion counts over entities (summary.json
    * `entity_props`, `grebi_index/src/main.rs:103-197`). */
  def entityPropCounts(nodes: Dataset[MergedNode]): DataFrame = {
    val s = nodes.sparkSession
    import s.implicits._
    nodes.flatMap(n => n.props.map { case (k, vs) => (k, vs.size.toLong) })
      .toDF("prop", "n")
      .groupBy("prop").agg(sum("n").as("count"))
  }

  /** Per-type entity counts (summary.json `types`). */
  def typeCounts(nodes: Dataset[MergedNode]): DataFrame = {
    val s = nodes.sparkSession
    import s.implicits._
    nodes.flatMap(_.props.getOrElse("grebi:type", Nil).map(_.value).distinct)
      .toDF("type")
      .groupBy("type").count()
  }

  /** names.txt analog: sorted distinct names+synonyms for autocomplete
    * (`grebi_index/src/main.rs:234-242`). */
  def names(nodes: Dataset[MergedNode],
            nameProps: Seq[String] = Seq("grebi:name", "grebi:synonym")): DataFrame = {
    val s = nodes.sparkSession
    import s.implicits._
    nodes.flatMap(n => nameProps.flatMap(p => n.props.getOrElse(p, Nil).map(_.value)))
      .toDF("name").distinct().orderBy("name")
  }

  /** ids.txt analog: sorted distinct source ids. */
  def sourceIds(nodes: Dataset[MergedNode]): DataFrame = {
    val s = nodes.sparkSession
    import s.implicits._
    nodes.flatMap(_.sourceIds).toDF("id").distinct().orderBy("id")
  }
}
