package graft.ingest

import graft.model.{IngestNode, Kind, RawValue}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest connectors (SURVEY §2.1 S1–S13). Every adapter emits the common
  * ingest-node shape (`Dataset[IngestNode]`) the identity/merge stages
  * consume — the Spark restatement of "all sources emit the common
  * Ingest-node JSONL on stdout" (the 01_ingest tool family).
  *
  * Design: each adapter is DataFrame-in → Dataset[IngestNode]-out, so the
  * source read (json/csv/parquet/jdbc) stays a normal Spark scan with
  * pushdown/pruning, and the only row-level code is the final shaping map.
  */
object Ingest {

  /** Adapter configuration mirroring grebi_transform_jsonl's flags
    * (`01_ingest/grebi_transform_jsonl/src/main.rs:36-183`). */
  final case class TransformConfig(
      idFields: Seq[String] = Seq("id"),
      datasource: String = "ds",
      subgraph: String = "sg",
      injectTypes: Seq[String] = Nil,
      renameFields: Map[String, String] = Map.empty,
      injectKeyPrefix: String = "",
      injectValuePrefix: Map[String, String] = Map.empty,
      injectHashId: Boolean = false,
      /** `--json-de-nest-field a.b`: replace the object value of field
        * `a` with its `b` subfield (arrays element-wise), per
        * `grebi_transform_jsonl/src/main.rs:67-72,135-150`. */
      deNestFields: Map[String, String] = Map.empty)

  /** Convert one source Row (any schema) into the open props map.
    * Scalars stringify with a kind tag; arrays fan out to one RawValue per
    * element; nested structs/maps are carried as canonical JSON (the
    * reference keeps unparsed JSON values the same way). */
  def rowToProps(row: Row): Map[String, Seq[RawValue]] = {
    val schema = row.schema
    schema.fields.iterator.zipWithIndex.flatMap { case (f, i) =>
      if (row.isNullAt(i)) None
      else Some(f.name -> anyToValues(row.get(i), f.dataType))
    }.toMap
  }

  private def anyToValues(v: Any, dt: DataType): Seq[RawValue] = dt match {
    case ArrayType(et, _) =>
      // Row arrays surface as mutable.ArraySeq in Scala 2.13 — use the
      // collection root type, then rebuild immutable.
      v.asInstanceOf[scala.collection.Seq[Any]].toSeq
        .filter(_ != null).flatMap(e => anyToValues(e, et))
    case _ => Seq(scalarToValue(v, dt))
  }

  private def scalarToValue(v: Any, dt: DataType): RawValue = dt match {
    case StringType => RawValue(v.toString, Kind.Str, Map.empty)
    case BooleanType => RawValue(v.toString, Kind.Bool, Map.empty)
    case _: NumericType =>
      val s = v match {
        case d: Double if d == d.floor && !d.isInfinite && math.abs(d) < 1e15 =>
          d.toLong.toString
        case other => other.toString
      }
      RawValue(s, Kind.Num, Map.empty)
    case st: StructType => RawValue(rowToJson(v.asInstanceOf[Row]), Kind.Json, Map.empty)
    case _ => RawValue(String.valueOf(v), Kind.Str, Map.empty)
  }

  private def rowToJson(r: Row): String = {
    val pairs = r.schema.fields.iterator.zipWithIndex.collect {
      case (f, i) if !r.isNullAt(i) =>
        graft.core.Json.str(f.name) + ":" + jsonValue(r.get(i), f.dataType)
    }
    pairs.mkString("{", ",", "}")
  }

  /** Render ANY field as syntactically valid JSON — arrays become JSON
    * arrays, dates/timestamps/etc. quote as strings, only finite numbers
    * and booleans stay bare. (A raw toString here previously leaked
    * `WrappedArray(a, b)` and bare dates into Kind.Json values, which the
    * sinks then emitted verbatim as unparseable JSONL.) */
  private def jsonValue(v: Any, dt: DataType): String = dt match {
    case StringType => graft.core.Json.str(v.toString)
    case st: StructType => rowToJson(v.asInstanceOf[Row])
    case ArrayType(et, _) =>
      v.asInstanceOf[scala.collection.Seq[Any]].toSeq
        .filter(_ != null).map(e => jsonValue(e, et))
        .mkString("[", ",", "]")
    case BooleanType => v.toString
    case _: NumericType =>
      val s = v.toString
      if (s == "NaN" || s.endsWith("Infinity")) graft.core.Json.str(s) else s
    case _ => graft.core.Json.str(String.valueOf(v))
  }

  /** S7 — generic adapter from ANY DataFrame (a `spark.read.json/csv/
    * parquet/jdbc` result) to ingest nodes, with the transform_jsonl
    * operations: field renames, type injection, key/value prefixing,
    * content-hash ids. */
  def fromDataFrame(df0: DataFrame, cfg: TransformConfig): Dataset[IngestNode] = {
    val spark = df0.sparkSession
    import spark.implicits._
    // de-nest happens at the Column level BEFORE row shaping, so the
    // planner prunes the unused subfields out of the scan
    val df = cfg.deNestFields.foldLeft(df0) { case (d, (field, sub)) =>
      d.schema.fields.find(_.name == field).map(_.dataType) match {
        case Some(_: StructType) => d.withColumn(field, col(field).getField(sub))
        case Some(ArrayType(_: StructType, _)) =>
          d.withColumn(field, transform(col(field), _.getField(sub)))
        case _ => d // scalar or absent: reference leaves the value as-is
      }
    }
    df.map { row =>
      val raw = rowToProps(row)
      // rename alias is taken VERBATIM — the key prefix only applies when no
      // rename matched, and never to the `id` field
      // (`grebi_transform_jsonl/src/main.rs:98-109`)
      def effectiveKey(k: String): String = cfg.renameFields.get(k) match {
        case Some(alias) => alias
        case None =>
          if (cfg.injectKeyPrefix.nonEmpty && k != "id" && !k.contains(":"))
            cfg.injectKeyPrefix + k
          else k
      }
      // fold, not map: two source keys can collide on the same effective
      // key (a rename landing on an existing column, or prefix-injection
      // producing a key the row already has) — their value lists must
      // MERGE, not last-write-win (same rule as AssignIds.assignOne)
      val renamed = raw.foldLeft(Map.empty[String, Seq[RawValue]]) {
        case (acc, (k, vs)) =>
          val vs1 = cfg.injectValuePrefix.get(k) match {
            case Some(p) => vs.map(v => v.copy(value = p + v.value))
            case None => vs
          }
          val key = effectiveKey(k)
          acc.updated(key, acc.getOrElse(key, Nil) ++ vs1)
      }
      val idKeys = cfg.idFields.map(effectiveKey)
      var ids = idKeys.flatMap(k => renamed.getOrElse(k, Nil).map(_.value))
      if (cfg.injectHashId || ids.isEmpty) {
        val content = renamed.toSeq.sortBy(_._1)
          .map { case (k, vs) => k + "=" + vs.map(_.value).sorted.mkString("|") }
          .mkString("")
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val hash = md.digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString
        ids = ids :+ s"hash:$hash"
      }
      IngestNode(ids.distinct, cfg.datasource, cfg.subgraph, cfg.injectTypes,
        renamed -- idKeys)
    }
  }

  /** S3 — TSV/CSV → ingest nodes (`grebi_tsv2jsonl/src/main.rs:23-126`):
    * `#`-comment skip, optional multi-value split, empty-field drop. */
  def fromTsv(spark: SparkSession, path: String, cfg: TransformConfig,
              sep: String = "\t", multiValueSep: Option[String] = None,
              columns: Option[Seq[String]] = None): Dataset[IngestNode] = {
    // `columns` = the reference's `--tsv-columns` (headerless files get
    // their column names from the command line)
    var df = columns match {
      case Some(cols) =>
        spark.read.option("sep", sep).option("header", "false").option("comment", "#")
          .csv(path).toDF(cols: _*)
      case None =>
        spark.read.option("sep", sep).option("header", "true").option("comment", "#")
          .csv(path)
    }
    multiValueSep.foreach { mv =>
      df = df.select(df.columns.map(c => split(col(c), java.util.regex.Pattern.quote(mv)).as(c)): _*)
    }
    // empty-field drop (`remove_empty_fields.rs`)
    val cleaned = df.select(df.schema.fields.map { f =>
      f.dataType match {
        case ArrayType(_, _) =>
          filter(col(f.name), v => v.isNotNull && v =!= "").as(f.name)
        case _ => when(col(f.name) === "", lit(null)).otherwise(col(f.name)).as(f.name)
      }
    }: _*)
    fromDataFrame(cleaned, cfg)
  }

  /** S6 — KGX edge records `{subject, predicate, object, <props>}` → a
    * node keyed by subject whose predicate property carries the object as
    * a reified value with the remaining columns as qualifiers
    * (`grebi_ingest_kgx_edges/src/main.rs:21-106`). */
  def fromKgxEdges(df: DataFrame, datasource: String, subgraph: String,
                   subjectCol: String = "subject", predicateCol: String = "predicate",
                   objectCol: String = "object"): Dataset[IngestNode] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.flatMap { row =>
      // skip malformed records (null/empty s-p-o) instead of failing the
      // stage — the reference streams past bad lines
      val props = rowToProps(row)
      for {
        subject <- props.get(subjectCol).flatMap(_.headOption).map(_.value)
        predicate <- props.get(predicateCol).flatMap(_.headOption).map(_.value)
        obj <- props.get(objectCol).flatMap(_.headOption).map(_.value)
      } yield {
        val quals = (props -- Seq(subjectCol, predicateCol, objectCol))
          .map { case (k, vs) => k -> vs.map(_.value) }
        IngestNode(Seq(subject), datasource, subgraph, Nil,
          Map(predicate -> Seq(RawValue.reified(obj, quals))))
      }
    }
  }

  /** S12 — nodes2edges: re-key a node stream so that a chosen from-field
    * becomes the id and a chosen to-field becomes a reified edge property
    * (`grebi_nodes2edges/src/main.rs:25-75`). */
  def nodesToEdges(nodes: Dataset[IngestNode], fromProp: String, toProp: String,
                   edgeType: String): Dataset[IngestNode] = {
    val spark = nodes.sparkSession
    import spark.implicits._
    nodes.flatMap { n =>
      for {
        from <- n.props.getOrElse(fromProp, Nil).map(_.value)
        to <- n.props.getOrElse(toProp, Nil).map(_.value)
      } yield {
        val rest = (n.props -- Seq(fromProp, toProp))
          .map { case (k, vs) => k -> vs.map(_.value) }
        IngestNode(Seq(from), n.datasource, n.subgraph, Nil,
          Map(edgeType -> Seq(RawValue.reified(to, rest))))
      }
    }
  }

  /** S5 — SSSOM mappings TSV with a YAML `curie_map` in `#` comments
    * (`grebi_ingest_sssom/src/main.rs:12-117`): each row becomes
    * `{id: subject, <predicate>: reified(object, other columns)}` with
    * IRIs contracted through the curie map. */
  def fromSssom(spark: SparkSession, path: String, datasource: String,
                subgraph: String): Dataset[IngestNode] = {
    import spark.implicits._
    // curie_map lives in the '#' header; small by construction — collect
    // ONLY the comment lines (a filter, not a head-N sample: a 200-line
    // limit both truncated long headers and, for a multi-file path,
    // sampled whichever file listed first). Like the reference CLI, one
    // call ingests one SSSOM file — its curie map must not leak onto
    // other files.
    val head = spark.read.text(path).as[String]
      .filter(_.startsWith("#")).collect()
    val curieMap = head.takeWhile(_.startsWith("#"))
      .map(_.drop(1).trim)
      .filter(l => l.contains(":") && !l.startsWith("curie_map"))
      .flatMap { l =>
        val i = l.indexOf(':')
        val (k, v) = (l.take(i).trim, l.drop(i + 1).trim.stripPrefix("\"").stripSuffix("\""))
        if (k.nonEmpty && v.startsWith("http")) Some(v -> (k + ":")) else None
      }.toMap
    val trie = graft.curie.PrefixTrie(curieMap)
    val rows = spark.read
      .option("sep", "\t").option("header", "true").option("comment", "#")
      .csv(path)
    rows.flatMap { row =>
      val props = rowToProps(row).map { case (k, vs) =>
        k -> vs.map(v => v.copy(value = trie.rewrite(v.value)))
      }
      for {
        subject <- props.get("subject_id").flatMap(_.headOption).map(_.value)
        predicate <- props.get("predicate_id").flatMap(_.headOption).map(_.value)
        obj <- props.get("object_id").flatMap(_.headOption).map(_.value)
      } yield {
        val quals = (props -- Seq("subject_id", "predicate_id", "object_id"))
          .map { case (k, vs) => k -> vs.map(_.value) }
        IngestNode(Seq(subject), datasource, subgraph, Nil,
          Map(predicate -> Seq(RawValue.reified(obj, quals))))
      }
    }
  }

  /** Accepted spellings of the six reification markers — the reference
    * compares full IRIs (`grebi_rdf2jsonl/src/main.rs:25-45`) and handles
    * BOTH owl:Axiom (annotatedSource/Property/Target) and rdf:Statement
    * (subject/predicate/object) reification via the same fold
    * (`main.rs:170-172`); pre-contracted fixtures use the prefixed
    * forms. Each alias maps to a canonical bucket name for the pivot. */
  private val reifMarkerAliases: Map[String, String] = {
    val owl = "http://www.w3.org/2002/07/owl#"
    val rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    Map(
      "owl:annotatedSource" -> "src", (owl + "annotatedSource") -> "src",
      "rdf:subject" -> "src", (rdf + "subject") -> "src",
      "owl:annotatedProperty" -> "prop", (owl + "annotatedProperty") -> "prop",
      "rdf:predicate" -> "prop", (rdf + "predicate") -> "prop",
      "owl:annotatedTarget" -> "tgt", (rdf + "object") -> "tgt",
      "rdf:object" -> "tgt", (owl + "annotatedTarget") -> "tgt")
  }

  /** Canonical (utf8-key-sorted, sorted value arrays) JSON for a nested
    * subtree: `{"pred":["v1","v2"],…}` — the shape `term_to_json`
    * (`main.rs:280-427`) emits for blank-node and nested objects, minus
    * the `id` key (the reference strips it on nested objects). A value
    * that is itself a serialized subtree embeds as a raw JSON object
    * (heuristic: starts with `{"` and ends with `}`), matching the
    * reference's recursive object nesting. */
  private def subtreeJson(rows: Seq[(String, String)]): String = {
    def renderValue(v: String): String =
      if (v.startsWith("{\"") && v.endsWith("}")) v else graft.core.Json.str(v)
    rows.groupBy(_._1).toSeq
      .sortWith((a, b) => graft.core.Json.utf8Compare(a._1, b._1) < 0)
      .map { case (p, vs) =>
        graft.core.Json.str(p) + ":" +
          vs.map(_._2).sortWith(graft.core.Json.utf8Compare(_, _) < 0)
            .map(renderValue).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
  }

  /** S2 — triples → subject-grouped nodes with reification collapse and
    * the rdf2jsonl nesting/exclusion options
    * (`grebi_rdf2jsonl/src/main.rs:130-181,230-427`). Input is a
    * (s, p, o) DataFrame from any triple source ([[parseNTriples]],
    * [[Rdf.parseTurtle]], [[Rdf.parseRdfXml]], [[Rdf.parseNQuads]]).
    *
    * Reference semantics reproduced:
    *   - owl:Axiom / rdf:Statement subjects fold their remaining props
    *     into qualifiers on the base triple — a self-join, not an in-RAM
    *     index (`populate_reifs`, main.rs:186-227).
    *   - `excludePreds` (= `--exclude-objects-of-predicate`): any object
    *     of such a predicate loses its own record; the referring triple
    *     keeps the plain value (main.rs:162-166,250-252).
    *   - `nestPreds` (= `--nest-objects-of-predicate`): objects of such
    *     predicates serialize their whole subtree as a JSON value on the
    *     referring property and are excluded at top level
    *     (main.rs:158-160,253-255,378-390).
    *   - blank-node objects ALWAYS nest as JSON subtrees, and non-IRI
    *     subjects never emit a top-level record (main.rs:246-248,394).
    *
    * Subtree serialization runs bottom-up as an iterative join: each
    * round serializes the blank subjects whose children are all resolved
    * and substitutes them into referring triples — O(subtree depth)
    * rounds (ontology blank structures are shallow: lists, restrictions);
    * rounds cap at `maxNestDepth`. Unlike the reference's whole-graph RAM
    * index, every step is a distributed join. */
  def fromTriples(triples: DataFrame, datasource: String, subgraph: String,
                  typePredicate: String = "rdf:type",
                  nestPreds: Set[String] = Set.empty,
                  excludePreds: Set[String] = Set.empty,
                  maxNestDepth: Int = 8,
                  /** `--reif-pointer-predicate` / `--reif-value-predicate`
                    * (main.rs:77-85,315-345): a pointer triple's object is
                    * a reification-metadata record whose TYPE is the
                    * actual predicate, whose value-predicate object is the
                    * actual value, and whose remaining props become
                    * qualifiers. (The reference's
                    * `--reif-predicate-predicate` flag is parsed but
                    * unused there — the rdf:type is what's read; same
                    * here via `typePredicate`.) */
                  reifPointerPreds: Set[String] = Set.empty,
                  reifValuePreds: Set[String] = Set.empty,
                  /** `--rdf-types-are-grebi-types` (main.rs:84,419-427):
                    * only when set do typePredicate values become grebi
                    * types; otherwise they stay ordinary property
                    * values. */
                  typesAreGrebiTypes: Boolean = true): Dataset[IngestNode] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val t = triples.select(col("s"), col("p"), col("o"))
    val markers = reifMarkerAliases
    val canonicalP = markers.foldLeft(lit(null).cast("string")) {
      case (acc, (alias, bucket)) => when(col("p") === alias, bucket).otherwise(acc)
    }
    val tc = t.withColumn("pc", canonicalP)
    val buckets = Seq("src", "prop", "tgt")
    val axioms = tc.where(col("pc").isNotNull)
      .groupBy("s").pivot("pc", buckets).agg(first("o"))
      .where(buckets.map(c => col(c).isNotNull).reduce(_ && _))
      .select(col("s").as("axiomId"), col("src"), col("prop"), col("tgt"))
    val axiomIds = axioms.select(col("axiomId")).distinct()
    // annotation props carried on the axiom node
    val annots = tc.join(axioms, tc("s") === axioms("axiomId"))
      .where(col("pc").isNull && col("p") =!= typePredicate)
      .select(col("src"), col("prop"), col("tgt"), col("p").as("qk"), col("o").as("qv"))
    val base = t.join(axiomIds, t("s") === axiomIds("axiomId"), "left_anti")
    // qualifiers are multi-valued: aggregate values PER KEY first, or
    // map_from_entries throws on duplicate keys (two axioms or one axiom
    // with two values of the same annotation property)
    val qualsPerKey = base
      .join(annots, base("s") === annots("src") && base("p") === annots("prop")
        && base("o") === annots("tgt"), "inner")
      .groupBy(col("s"), col("p"), col("o"), col("qk"))
      .agg(sort_array(collect_list(col("qv"))).as("qvs"))
      .groupBy(col("s"), col("p"), col("o"))
      .agg(map_from_entries(collect_list(struct(col("qk"), col("qvs")))).as("quals"))
    var cur = base.join(qualsPerKey, Seq("s", "p", "o"), "left")

    // --- exclude-objects-of-predicate: drop the object's own record
    if (excludePreds.nonEmpty) {
      val excluded = cur.where(col("p").isin(excludePreds.toSeq: _*))
        .select(col("o").as("xs")).distinct()
      cur = cur.join(excluded, cur("s") === excluded("xs"), "left_anti")
    }

    // --- pointer-predicate reification (before blank nesting, so the
    // metadata records are still addressable as subjects)
    if (reifPointerPreds.nonEmpty) {
      val rp = cur.where(col("p").isin(reifPointerPreds.toSeq: _*))
        .select(col("s"), col("p").as("origP"), col("o").as("mid"))
      val metaIds = rp.select(col("mid")).distinct()
      val meta = cur.join(metaIds, cur("s") === metaIds("mid"), "left_semi")
        .select(col("s").as("ms"), col("p").as("mp"), col("o").as("mo"))
      // actual predicate = the metadata record's (first) type; every
      // value-predicate object becomes one value row (the reference
      // carries the whole value array, main.rs:333-340)
      val actual = meta.where(col("mp") === typePredicate)
        .groupBy(col("ms")).agg(min(col("mo")).as("actualPred"))
      val values = meta.where(col("mp").isin(reifValuePreds.toSeq: _*))
        .select(col("ms"), col("mo").as("actualValue"))
      val rquals = meta
        .where(col("mp") =!= typePredicate && !col("mp").isin(reifValuePreds.toSeq: _*))
        .groupBy(col("ms"), col("mp"))
        .agg(sort_array(collect_list(col("mo"))).as("qvs"))
        .groupBy(col("ms"))
        .agg(map_from_entries(collect_list(struct(col("mp"), col("qvs")))).as("rquals"))
      // left joins: a pointer whose metadata record is missing its type
      // or value triple falls back to the plain (s, pointerPred, o)
      // triple instead of silently vanishing (the reference panics there,
      // main.rs:333 — we degrade gracefully but lose nothing)
      val reified = rp
        .join(actual, rp("mid") === actual("ms"), "left").drop("ms")
        .join(values, rp("mid") === values("ms"), "left").drop("ms")
        .join(rquals, rp("mid") === rquals("ms"), "left").drop("ms")
        .select(col("s"),
          coalesce(col("actualPred"), col("origP")).as("p"),
          coalesce(col("actualValue"), col("mid")).as("o"),
          when(col("actualPred").isNotNull && col("actualValue").isNotNull,
            col("rquals")).as("quals"))
      cur = cur.where(!col("p").isin(reifPointerPreds.toSeq: _*))
        .join(metaIds.withColumnRenamed("mid", "ms2"), cur("s") === col("ms2"), "left_anti")
        .union(reified)
    }

    val isBlank = (c: Column) => c.startsWith("_:")

    /** Serialize the given subjects' subtrees and return (subjId, json). */
    def serialize(subjects: DataFrame): DataFrame =
      cur.join(subjects, cur("s") === subjects("sid"), "left_semi")
        .select(col("s"), col("p"), col("o"))
        .as[(String, String, String)]
        .groupByKey(_._1)
        .mapGroups { (sid, it) => (sid, subtreeJson(it.map(r => (r._2, r._3)).toSeq)) }
        .toDF("sid", "json")

    // --- blank-node subtrees nest bottom-up. Each round's convergence
    // check is an action, so cur is checkpointed per round (and once up
    // front) — otherwise round k recomputes every prior round's joins
    // plus the whole axiom pipeline, O(depth²) work and unbounded plan
    // growth (same rule as ConnectedComponents.run's per-round
    // truncation).
    cur = cur.localCheckpoint()
    var depth = 0
    var done = false
    while (!done && depth < maxNestDepth) {
      val blankSubj = cur.where(isBlank(col("s"))).select(col("s").as("sid")).distinct()
      val unresolved = cur.where(isBlank(col("s")) && isBlank(col("o")))
        .select(col("s").as("sid")).distinct()
      val ready = blankSubj.except(unresolved)
      if (ready.isEmpty) done = true
      else {
        val ser = serialize(ready)
        cur = cur.join(ser.withColumnRenamed("sid", "rs"), cur("s") === col("rs"), "left_anti")
        cur = graft.core.Iterate.save(cur.join(ser, cur("o") === ser("sid"), "left")
          .select(col("s"), col("p"), coalesce(col("json"), col("o")).as("o"), col("quals")),
          0, depth)
        depth += 1
      }
    }

    // --- nest-objects-of-predicate: IRI targets serialize one level deep
    // and vanish from the top level (deeper nest-of-nest chains keep the
    // inner reference as a plain IRI — ontology configs nest depth-1
    // evidence/metadata objects)
    if (nestPreds.nonEmpty) {
      val targets = cur.where(col("p").isin(nestPreds.toSeq: _*))
        .select(col("o").as("sid")).distinct()
      val ser = serialize(targets)
      cur = cur.join(ser, cur("o") === ser("sid") &&
          col("p").isin(nestPreds.toSeq: _*), "left")
        .select(col("s"), col("p"), coalesce(col("json"), col("o")).as("o"), col("quals"))
      val tgt2 = targets.withColumnRenamed("sid", "ts")
      cur = cur.join(tgt2, cur("s") === tgt2("ts"), "left_anti")
    }

    cur.where(!isBlank(col("s")))
      .as[(String, String, String, Map[String, Seq[String]])]
      .groupByKey(_._1)
      .mapGroups { (subj, it) =>
        val props = it.toSeq.groupBy(_._2).map { case (p, rows) =>
          p -> rows.sortBy(_._3).map { case (_, _, o, q) =>
            if (q == null || q.isEmpty) RawValue.str(o) else RawValue.reified(o, q)
          }
        }
        // the reference keeps the rdf:type property in the record either
        // way; the flag only controls whether grebi types (the separate
        // `types` field here) are ALSO derived from it (main.rs:419-427)
        val types =
          if (typesAreGrebiTypes) props.getOrElse(typePredicate, Nil).map(_.value)
          else Nil
        IngestNode(Seq(subj), datasource, subgraph, types.toSeq, props)
      }
  }

  /** Minimal NTriples line parser → (s, p, o) DataFrame. Literals honour
    * backslash escapes: the scan stops at the first UNESCAPED quote and
    * \" \\ \n \t \r are unescaped (N-Triples string escape rules), so a
    * value like "say \"hi\"" survives intact. Language tags / datatype
    * suffixes after the closing quote are dropped, as before. */
  def parseNTriples(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val Line = """^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.*?)\s*\.\s*$""".r
    spark.read.textFile(path).flatMap {
      case Line(s, p, o) =>
        def literal(t: String): String = {
          val sb = new StringBuilder
          var i = 1 // skip opening quote
          var done = false
          while (!done && i < t.length) {
            t.charAt(i) match {
              case '\\' if i + 1 < t.length =>
                t.charAt(i + 1) match {
                  case 'n' => sb.append('\n')
                  case 't' => sb.append('\t')
                  case 'r' => sb.append('\r')
                  case c   => sb.append(c) // covers \" \\ and any other escaped char
                }
                i += 2
              case '"' => done = true
              case c   => sb.append(c); i += 1
            }
          }
          sb.toString
        }
        def term(t: String): String =
          if (t.startsWith("<")) t.stripPrefix("<").stripSuffix(">")
          else if (t.startsWith("\"")) literal(t)
          else t
        Some((term(s), term(p), term(o)))
      case _ => None
    }.toDF("s", "p", "o")
  }

  /** S4 — GWAS catalog TSV headers, asserted EXACTLY (order and count)
    * before any row is parsed (`grebi_ingest_gwas/src/check_headers.rs`):
    * the catalog occasionally reshapes its export, and silently parsing a
    * shifted layout poisons every downstream column. */
  val gwasAssociationHeaders: Seq[String] = Seq(
    "DATE ADDED TO CATALOG", "PUBMEDID", "FIRST AUTHOR", "DATE", "JOURNAL",
    "LINK", "STUDY", "DISEASE/TRAIT", "INITIAL SAMPLE SIZE",
    "REPLICATION SAMPLE SIZE", "REGION", "CHR_ID", "CHR_POS",
    "REPORTED GENE(S)", "MAPPED_GENE", "UPSTREAM_GENE_ID",
    "DOWNSTREAM_GENE_ID", "SNP_GENE_IDS", "UPSTREAM_GENE_DISTANCE",
    "DOWNSTREAM_GENE_DISTANCE", "STRONGEST SNP-RISK ALLELE", "SNPS",
    "MERGED", "SNP_ID_CURRENT", "CONTEXT", "INTERGENIC",
    "RISK ALLELE FREQUENCY", "P-VALUE", "PVALUE_MLOG", "P-VALUE (TEXT)",
    "OR or BETA", "95% CI (TEXT)", "PLATFORM [SNPS PASSING QC]", "CNV",
    "MAPPED_TRAIT", "MAPPED_TRAIT_URI", "STUDY ACCESSION",
    "GENOTYPING TECHNOLOGY")

  val gwasStudyHeaders: Seq[String] = Seq(
    "DATE ADDED TO CATALOG", "PUBMEDID", "FIRST AUTHOR", "DATE", "JOURNAL",
    "LINK", "STUDY", "DISEASE/TRAIT", "INITIAL SAMPLE SIZE",
    "REPLICATION SAMPLE SIZE", "PLATFORM [SNPS PASSING QC]",
    "ASSOCIATION COUNT", "MAPPED_TRAIT", "MAPPED_TRAIT_URI",
    "STUDY ACCESSION", "GENOTYPING TECHNOLOGY", "COHORT",
    "FULL SUMMARY STATISTICS", "SUMMARY STATS LOCATION")

  private[ingest] def checkGwasHeaders(got: Seq[String], expected: Seq[String]): Unit = {
    if (got.length != expected.length)
      throw new IllegalArgumentException(
        s"Expected ${expected.length} headers, but found ${got.length}")
    got.zip(expected).zipWithIndex.foreach { case ((g, e), n) =>
      if (g != e) throw new IllegalArgumentException(
        s"Expected header $n to be $e, but found $g")
    }
  }

  /** S4 — dedicated GWAS catalog adapter
    * (`grebi_ingest_gwas/src/main.rs:24-48`): the two export layouts are
    * routed by FILENAME (associations vs studies), headers are asserted,
    * anything else is rejected loudly. Associations become SNP nodes whose
    * `gwas:associated_with` values are reified per mapped trait with the
    * full association metadata as qualifiers
    * (`write_associations.rs:103-151`); studies become Study nodes
    * (`write_studies.rs:67-96`). Empty fields drop, arrays split on ", "
    * (`remove_empty_fields.rs`). */
  def fromGwas(spark: SparkSession, path: String, datasource: String,
               subgraph: String = "gwas"): Dataset[IngestNode] = {
    import spark.implicits._
    val fname = new java.io.File(path).getName
    val df = spark.read
      .option("sep", "\t").option("header", "true")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(path)
    def g(r: Row, c: String): String =
      Option(r.getAs[String](c)).getOrElse("")
    def list(s: String, sep: String = ", "): Seq[String] =
      s.split(java.util.regex.Pattern.quote(sep)).map(_.trim).filter(_.nonEmpty).toSeq
    def prop(k: String, vs: Seq[String]): Option[(String, Seq[RawValue])] = {
      val clean = vs.filter(_.nonEmpty)
      if (clean.isEmpty) None else Some(k -> clean.map(RawValue.str))
    }
    if (fname.contains("gwas-catalog-associations")) {
      checkGwasHeaders(df.columns.toSeq, gwasAssociationHeaders)
      df.map { r =>
        val quals: Map[String, Seq[String]] = Seq(
          "gwas:study" -> Seq(g(r, "STUDY ACCESSION")),
          "gwas:disease_trait" -> Seq(g(r, "DISEASE/TRAIT")),
          "gwas:initial_sample_size" -> Seq(g(r, "INITIAL SAMPLE SIZE")),
          "gwas:replication_sample_size" -> Seq(g(r, "REPLICATION SAMPLE SIZE")),
          "gwas:region" -> Seq(g(r, "REGION")),
          "gwas:chr_id" -> Seq(g(r, "CHR_ID")),
          "gwas:chr_pos" -> Seq(g(r, "CHR_POS")),
          "gwas:reported_gene" -> list(g(r, "REPORTED GENE(S)"), ","),
          "gwas:upstream_gene_distance" -> Seq(g(r, "UPSTREAM_GENE_DISTANCE")),
          "gwas:downstream_gene_distance" -> Seq(g(r, "DOWNSTREAM_GENE_DISTANCE")),
          "gwas:strongest_snp_risk_allele" -> Seq(g(r, "STRONGEST SNP-RISK ALLELE")),
          "gwas:snps" -> Seq(g(r, "SNPS")),
          "gwas:merged" -> Seq(g(r, "MERGED")),
          "gwas:snp_id_current" -> Seq(g(r, "SNP_ID_CURRENT")),
          "gwas:context" -> Seq(g(r, "CONTEXT")),
          "gwas:intergenic" -> Seq(g(r, "INTERGENIC")),
          "gwas:risk_allele_frequency" -> Seq(g(r, "RISK ALLELE FREQUENCY")),
          "gwas:p_value" -> Seq(g(r, "P-VALUE")),
          "gwas:pvalue_mlog" -> Seq(g(r, "PVALUE_MLOG")),
          "gwas:p_value_text" -> Seq(g(r, "P-VALUE (TEXT)")),
          "gwas:or_or_beta" -> Seq(g(r, "OR or BETA")),
          "gwas:ci_text" -> Seq(g(r, "95% CI (TEXT)")),
          "gwas:platform" -> Seq(g(r, "PLATFORM [SNPS PASSING QC]")),
          "gwas:cnv" -> Seq(g(r, "CNV")),
          "gwas:mapped_trait" -> Seq(g(r, "MAPPED_TRAIT_URI")),
          "gwas:mapped_trait_label" -> Seq(g(r, "MAPPED_TRAIT")),
          "gwas:genotyping_technology" -> Seq(g(r, "GENOTYPING TECHNOLOGY")))
          .map { case (k, vs) => k -> vs.filter(_.nonEmpty) }
          .filter(_._2.nonEmpty).toMap
        val associated = list(g(r, "MAPPED_TRAIT_URI"))
          .map(tr => RawValue.reified(tr, quals))
        val props = Seq(
          prop("rdf:type", Seq("so:0000694")),
          prop("gwas:mapped_gene", list(g(r, "MAPPED_GENE"))),
          prop("gwas:upstream_gene_id", Seq(g(r, "UPSTREAM_GENE_ID"))),
          prop("gwas:downstream_gene_id", Seq(g(r, "DOWNSTREAM_GENE_ID"))),
          prop("gwas:snp_gene_ids", list(g(r, "SNP_GENE_IDS")))).flatten.toMap ++
          (if (associated.isEmpty) Map.empty
           else Map("gwas:associated_with" -> associated))
        IngestNode(Seq(g(r, "SNPS")), datasource, subgraph, Seq("gwas:SNP"), props)
      }
    } else if (fname.contains("gwas-catalog-studies")) {
      checkGwasHeaders(df.columns.toSeq, gwasStudyHeaders)
      df.map { r =>
        val props = Seq(
          prop("rdf:type", Seq("http://edamontology.org/topic_3517")),
          prop("dcterms:created", Seq(g(r, "DATE ADDED TO CATALOG"))),
          prop("dcterms:creator", Seq(g(r, "FIRST AUTHOR"))),
          prop("dcterms:modified", Seq(g(r, "DATE"))),
          prop("gwas:journal", Seq(g(r, "JOURNAL"))),
          prop("gwas:pubmedid",
            Seq(g(r, "PUBMEDID")).filter(_.nonEmpty).map("pmid:" + _)),
          prop("dcterms:title", Seq(g(r, "STUDY"))),
          prop("gwas:disease_trait", Seq(g(r, "DISEASE/TRAIT"))),
          prop("gwas:initial_sample_size", Seq(g(r, "INITIAL SAMPLE SIZE"))),
          prop("gwas:replication_sample_size", Seq(g(r, "REPLICATION SAMPLE SIZE"))),
          prop("gwas:platform", Seq(g(r, "PLATFORM [SNPS PASSING QC]"))),
          prop("gwas:mapped_trait", Seq(g(r, "MAPPED_TRAIT_URI"))),
          prop("gwas:association_count", Seq(g(r, "ASSOCIATION COUNT"))),
          prop("gwas:genotyping_technology", Seq(g(r, "GENOTYPING TECHNOLOGY"))),
          prop("gwas:cohort", Seq(g(r, "COHORT"))),
          prop("gwas:full_summary_statistics", Seq(g(r, "FULL SUMMARY STATISTICS"))),
          prop("gwas:summary_stats_location", Seq(g(r, "SUMMARY STATS LOCATION")))).flatten.toMap
        IngestNode(Seq(g(r, "STUDY ACCESSION")), datasource, subgraph,
          Seq("gwas:Study"), props)
      }
    } else throw new IllegalArgumentException(s"GWAS ingest: Unknown filename: $fname")
  }

  /** S10 — MetaboLights eb-eye XML → nodes
    * (`01_ingest/grebi_ingest_metabolights/ingest.py:7-58`): each
    * `<entry id=…>` yields one node with `grebi:name`/`grebi:description`
    * from the child elements, `metabolights:ref` from every `<ref dbkey=…>`,
    * `metabolights:<type>_date` from `<date type=… value=…/>`,
    * `metabolights:<name>` from every `<field name=…>text</field>`, and
    * MTBLS→Study / MTBLC→Chemical typing (Chemical additionally gets
    * `metabolights:chemical` = refs ++ inchi ++ formula).
    *
    * Parse is a dependency-free StAX scan inside a distributed map — one
    * task per XML file (`wholeTextFiles`), so a dump split across many
    * files parallelises; a single giant file is bounded by one executor,
    * same as the reference's single-process stdin parse. */
  def fromMetabolightsXml(spark: SparkSession, path: String,
                          datasource: String = "metabolights",
                          subgraph: String = "metabolights"): Dataset[IngestNode] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path).map(_._2).toDS()
      .flatMap(xml => parseMetabolightsEntries(xml, datasource, subgraph))
  }

  private[ingest] def parseMetabolightsEntries(
      xml: String, datasource: String, subgraph: String): Iterator[IngestNode] = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants => C}
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(new java.io.StringReader(xml))
    val out = scala.collection.mutable.ArrayBuffer.empty[IngestNode]
    var id: String = null
    var name: Option[String] = None
    var desc: Option[String] = None
    val refs = scala.collection.mutable.ArrayBuffer.empty[String]
    val dates = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // field values accumulate per name in document order
    val fields = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    while (r.hasNext) {
      r.next() match {
        case C.START_ELEMENT => r.getLocalName match {
          case "entry" =>
            id = r.getAttributeValue(null, "id")
            name = None; desc = None; refs.clear(); dates.clear(); fields.clear()
          case "name" if id != null && name.isEmpty =>
            name = Some(r.getElementText)
          case "description" if id != null && desc.isEmpty =>
            desc = Some(r.getElementText)
          case "ref" if id != null =>
            refs += r.getAttributeValue(null, "dbkey")
          case "date" if id != null =>
            dates += ((r.getAttributeValue(null, "type"), r.getAttributeValue(null, "value")))
          case "field" if id != null =>
            val fn = r.getAttributeValue(null, "name")
            fields(fn) = fields.getOrElse(fn, Vector.empty) :+ r.getElementText
          case _ =>
        }
        case C.END_ELEMENT if r.getLocalName == "entry" && id != null =>
          out += metabolightsNode(id, name, desc, refs.toVector,
            dates.toVector, fields.toMap, datasource, subgraph)
          id = null
        case _ =>
      }
    }
    r.close()
    out.iterator
  }

  private def metabolightsNode(
      id: String, name: Option[String], desc: Option[String],
      refs: Vector[String], dates: Vector[(String, String)],
      fields: Map[String, Vector[String]],
      datasource: String, subgraph: String): IngestNode = {
    val base: Map[String, Seq[RawValue]] =
      name.map(v => "grebi:name" -> Seq(RawValue.str(v))).toMap ++
      desc.map(v => "grebi:description" -> Seq(RawValue.str(v))).toMap ++
      Map("metabolights:ref" -> refs.map(RawValue.str)) ++
      dates.map { case (t, v) => s"metabolights:${t}_date" -> Seq(RawValue.str(v)) }.toMap ++
      fields.map { case (k, vs) => s"metabolights:$k" -> vs.map(RawValue.str) }
    val (typ, props) =
      if (id.startsWith("MTBLS")) ("metabolights:Study", base)
      else if (id.startsWith("MTBLC")) {
        val chem = refs ++
          fields.getOrElse("inchi", Vector.empty) ++
          fields.getOrElse("formula", Vector.empty)
        ("metabolights:Chemical",
          base.updated("metabolights:chemical", chem.map(RawValue.str)))
      } else throw new IllegalArgumentException(
        s"unexpected metabolights entry id (not MTBLS*/MTBLC*): $id")
    IngestNode(Seq(id), datasource, subgraph, Seq(typ), props)
  }

  /** S9 — Reactome Neo4j-dump JSONL → nodes
    * (`01_ingest/grebi_ingest_reactome/src/main.rs:13-136`): `node`
    * records become reactome_<neoId> nodes with `reactome:`-prefixed
    * properties, `reactome:`-prefixed labels as types, and
    * `grebi:equivalentTo` derived by bioregistry-style prefix compaction
    * of the `url` and `identifier` properties plus `ncbitaxon:` from
    * `taxId`. `relationship` records become a node keyed by the START id
    * whose `reactome:<label>` property carries the END id as a reified
    * value. Anything else is rejected, as the reference panics.
    *
    * Faithful to the reference's LIVE semantics: the databaseName+identifier
    * fallback (main.rs:82-90) sits in a branch where `identifier` is
    * absent but then requires it present, so it never fires; and
    * relationship properties land on the node (main.rs:117-119) while the
    * reified value's qualifiers stay empty (the fresh `new_props` map).
    *
    * Jackson does the line parse — it ships with Spark, so no new
    * dependency; the scan is a plain distributed text read. */
  def fromReactome(spark: SparkSession, path: String, trie: graft.curie.PrefixTrie,
                   datasource: String = "reactome",
                   subgraph: String = "reactome"): Dataset[IngestNode] = {
    import spark.implicits._
    spark.read.textFile(path).mapPartitions { lines =>
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      lines.filter(_.trim.nonEmpty).map { l =>
        reactomeRecord(om.readTree(l), trie, datasource, subgraph)
      }
    }
  }

  private def reactomeRecord(j: com.fasterxml.jackson.databind.JsonNode,
                             trie: graft.curie.PrefixTrie,
                             datasource: String, subgraph: String): IngestNode = {
    import scala.jdk.CollectionConverters._
    def jv(v: com.fasterxml.jackson.databind.JsonNode): Seq[RawValue] =
      if (v.isArray) v.elements.asScala.flatMap(jv).toSeq
      else if (v.isTextual) Seq(RawValue.str(v.asText))
      else if (v.isNumber) Seq(RawValue(v.asText, Kind.Num, Map.empty))
      else if (v.isBoolean) Seq(RawValue(v.asText, Kind.Bool, Map.empty))
      else if (v.isNull) Nil
      else Seq(RawValue(v.toString, Kind.Json, Map.empty))
    def maybeReprefix(s: String): Option[String] = {
      val out = trie.rewrite(s)
      if (out == s) None else Some(out)
    }
    val neoId = j.get("id").asText
    val typ = j.get("type").asText
    val properties = j.get("properties")
    val propPairs = properties.fieldNames.asScala
      .map(k => s"reactome:$k" -> jv(properties.get(k))).toMap
    typ match {
      case "node" =>
        val labels = j.get("labels").elements.asScala.map(l => s"reactome:${l.asText}").toSeq
        def strProp(k: String): Option[String] =
          Option(properties.get(k)).filter(_.isTextual).map(_.asText)
        val equivalences =
          strProp("url").flatMap(maybeReprefix).toSeq ++
          strProp("identifier").flatMap(maybeReprefix).toSeq ++
          strProp("taxId").map("ncbitaxon:" + _).toSeq
        val props =
          if (equivalences.isEmpty) propPairs
          else propPairs.updated("grebi:equivalentTo", equivalences.map(RawValue.str))
        IngestNode(Seq(s"reactome_$neoId"), datasource, subgraph, labels, props)
      case "relationship" =>
        val label = j.get("label").asText
        val start = j.get("start").get("id").asText
        val end = j.get("end").get("id").asText
        IngestNode(Seq(s"reactome_$start"), datasource, subgraph, Nil,
          propPairs.updated(s"reactome:$label", Seq(RawValue.str(s"reactome_$end"))))
      case other => throw new IllegalArgumentException(s"Unknown type: $other")
    }
  }

  /** hett pesticide registries — the reference's three pandas-over-xlsx
    * scripts (`01_ingest/hett_pesticides_{appril,eu,gb}.py`) reproduced
    * over [[Xlsx.readRows]]: per-variant header offset, column renames,
    * id derivation, comma-splits, CAS-number extraction emitting
    * side-nodes typed grebi:Chemical, and the GB IUPAC equivalence
    * split. Key cleanup matches the scripts' `re.sub(r'[^\w\s:]','',k)`. */
  def fromHettPesticides(spark: SparkSession, path: String, variant: String,
                         datasource: String,
                         subgraph: String = "hett"): Dataset[IngestNode] = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) =>
        hettRecords(Xlsx.readRows(pds.toArray()), variant, datasource, subgraph)
      }.toDS()
  }

  private val CasRe = """\d{1,7}-\d{2}-\d""".r

  private[ingest] def hettRecords(rows: Seq[Seq[String]], variant: String,
                                  datasource: String,
                                  subgraph: String): Seq[IngestNode] = {
    val skip = variant match {
      case "appril" => 0
      case "eu" => 2 // skiprows=2 (hett_pesticides_eu.py:15)
      case "gb" => 3 // skiprows=3 (hett_pesticides_gb.py:15)
      case other => throw new IllegalArgumentException(s"unknown hett variant $other")
    }
    if (rows.length <= skip) return Nil
    def cleanKey(k: String): String = k.replaceAll("[^\\w\\s:]", "")
    var header = rows(skip).map(_.trim)
    if (variant == "gb")
      header = header.map(h => if (h.startsWith("Category")) "Category" else h)
    val (nameCol, typ) = variant match {
      case "appril" => ("PRODUCT_NAME", "hett:PesticideProduct")
      case _ => (if (variant == "eu") "Substance" else "Substance Name", "hett:AgroSubstance")
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[IngestNode]
    def chemicals(raw: String): Seq[String] = {
      val cas = CasRe.findAllIn(raw).map("cas:" + _).toSeq
      cas.foreach(c => out += IngestNode(Seq(c), datasource, subgraph,
        Seq("grebi:Chemical"), Map.empty))
      cas
    }
    rows.drop(skip + 1).foreach { cells =>
      // duplicate header names keep the LAST cell, like pandas to_dict
      val obj0 = header.zipAll(cells.take(header.length), "", "")
        .map { case (k, v) => k -> v.trim }
        .filter { case (k, v) => k.nonEmpty && v.nonEmpty }
        .toMap
      val id = variant match {
        case "appril" => obj0.get("REG_NUM").map("appril:" + _)
        case "eu" => obj0.get("Substance")
        case _ => obj0.get("Substance Name").filter(_.nonEmpty) // gb drops empty ids
      }
      id.foreach { recordId =>
        var props = obj0.map { case (k, vv) =>
          (if (k == nameCol) "grebi:name" else cleanKey(k)) -> Seq(vv)
        }
        // per-script split parity: Python str.split keeps empty items
        // (incl. trailing — hence limit -1); gb's Category is a RAW
        // split (hett_pesticides_gb.py:36 — no per-item strip), while
        // eu/appril map strip over the items but keep empties
        def split(k: String, strip: Boolean): Unit =
          props.get(k).foreach { vs =>
            val parts = vs.head.split(",", -1).toSeq
            props = props.updated(k, if (strip) parts.map(_.trim) else parts)
          }
        variant match {
          case "appril" =>
            split("PESTS", strip = true); split("SITES", strip = true)
            props.get("AIS").foreach { vs =>
              props = props.updated("hett:hasActiveIngredient", chemicals(vs.head))
            }
            props.get("INERTS").foreach { vs =>
              props = props.updated("hett:hasInertIngredient", chemicals(vs.head))
            }
          case "eu" =>
            split("Authorised", strip = true)
            props.get("CAS Number").foreach { vs =>
              props = props.updated("CAS Number", chemicals(vs.head))
            }
          case _ => // gb
            split("Category", strip = false)
            props.get("CAS Number").foreach { vs =>
              props = props.updated("CAS Number", chemicals(vs.head))
            }
            props.get("IUPAC Name").foreach { vs =>
              // hett_pesticides_gb.py:46-49 — strip items, drop only the
              // 'not …' placeholders; empty items survive
              val iupac = vs.head.split(", | or |;", -1).map(_.trim)
                .filter(i => !i.toLowerCase.startsWith("not "))
              props = props.updated("grebi:equivalentTo", iupac.toSeq)
            }
        }
        out += IngestNode(Seq(recordId), datasource, subgraph, Seq(typ),
          props.filter(_._2.nonEmpty)
            .map { case (k, vs) => k -> vs.map(RawValue.str) })
      }
    }
    out.toSeq
  }

  /** S8 — relational table → nodes: PK values become prefixed ids, FK
    * columns rewrite to the referenced table's prefixed id so the
    * materialise stage turns them into edges
    * (`grebi_ingest_sqlite/src/main.rs:22-150`; jdbc-sourced DataFrames
    * plug straight in). */
  def fromTable(df: DataFrame, table: String, pkCol: String,
                fkCols: Map[String, String], datasource: String,
                subgraph: String): Dataset[IngestNode] = {
    val typ = table.stripSuffix("s").capitalize
    val prefixed = df.select(df.columns.map { c =>
      if (c == pkCol) concat(lit(s"$table:"), col(c).cast("string")).as(c)
      else fkCols.get(c) match {
        case Some(refTable) => concat(lit(s"$refTable:"), col(c).cast("string")).as(c)
        case None => col(c)
      }
    }: _*)
    fromDataFrame(prefixed, TransformConfig(
      idFields = Seq(pkCol), datasource = datasource, subgraph = subgraph,
      injectTypes = Seq(typ)))
  }
}
