package graft.ingest

import graft.model.{IngestNode, RawValue}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** S1 — OLS ontology-class ingest (`01_ingest/grebi_ingest_ols/src/
  * main.rs:150-340`): defining-only / skip-obsolete filters, qualified
  * safe-label ids, unprefixed-curie removal, `ols:relatedTo` regrouped by
  * predicate, OLS reification objects (`ols:type:["reification"]` +
  * `ols:axioms`) flattened to one reified value per axiom set.
  *
  * Runs as a per-line JSON parse inside mapPartitions (jackson/json4s ship
  * with Spark) — the streaming-parser shape of the reference, but
  * partition-parallel.
  */
object Ols {

  /** Qualified safe label (`grebi_ingest_ols/src/main.rs:172-204`):
    * prefer the curie's prefix (or ols:definedBy); a label that is itself
    * prefixed falls back to the curie; otherwise prefix + ":" + label
    * with every non-alphanumeric ASCII byte replaced by '_'. */
  def qualifiedSafeLabel(curie: Option[String], definedBy: Option[String],
                         label: Option[String], iri: Option[String]): String = {
    val prefPrefix = curie match {
      case Some(c) if c.contains(":") => Some(c.split(":").head.toLowerCase)
      case _ => definedBy
    }
    prefPrefix match {
      case None => iri.orElse(curie).getOrElse("")
      case Some(p) =>
        label match {
          case Some(l) if !(l.startsWith(p + ":") || l.startsWith(p + "_")) =>
            p + ":" + l.map(ch =>
              if (ch.isLetterOrDigit && ch < 128) ch else '_')
          case _ => curie.getOrElse(iri.getOrElse(""))
        }
    }
  }

  private def strings(v: JValue): Seq[String] = v match {
    case JString(s) => Seq(s)
    case JArray(xs) => xs.flatMap(strings)
    case JBool(b) => Seq(b.toString)
    case JInt(i) => Seq(i.toString)
    case JDouble(d) => Seq(d.toString)
    case JObject(fields) =>
      fields.collectFirst { case ("ols:value", inner) => strings(inner) }.getOrElse(Nil)
    case _ => Nil
  }

  private def isReification(v: JValue): Boolean = v match {
    case JObject(fields) =>
      fields.collectFirst { case ("ols:type", t) => strings(t).contains("reification") }
        .getOrElse(false)
    case _ => false
  }

  private def toRawValues(v: JValue): Seq[RawValue] = v match {
    case JArray(xs) => xs.flatMap(toRawValues)
    case o: JObject if isReification(o) =>
      val value = strings(o \ "ols:value").headOption.getOrElse("")
      (o \ "ols:axioms") match {
        case JArray(sets) => sets.map {
          case JObject(fields) =>
            RawValue.reified(value,
              fields.map { case (k, fv) => k -> strings(fv) }.toMap)
          case _ => RawValue.str(value)
        }
        case _ => Seq(RawValue.str(value))
      }
    case JObject(_) => strings(v).map(RawValue.str)
    case other => strings(other).map(RawValue.str)
  }

  def fromJsonl(spark: SparkSession, path: String, datasource: String,
                subgraph: String, grebiType: String = "ols:Class",
                definingOnly: Boolean = true,
                skipObsolete: Boolean = true,
                /** `--ontologies` whitelist: keep only classes whose
                  * `ols:ontologyId` is listed (`grebi_ingest_ols/src/
                  * main.rs:45-47,84-86`); None = everything. */
                ontologies: Option[Set[String]] = None): Dataset[IngestNode] = {
    import spark.implicits._
    spark.read.textFile(path).mapPartitions { lines =>
      // skip blank/non-object lines (a trailing newline in a JSONL dump
      // would otherwise abort the whole stage with a ClassCastException)
      lines.filter(_.trim.nonEmpty).flatMap { line =>
        (JsonMethods.parse(line) match {
          case o: JObject => Some(o.obj.toMap)
          case _ => None // non-object line: skip, don't abort the stage
        }).flatMap { obj =>
        def first(k: String): Option[String] = obj.get(k).flatMap(strings(_).headOption)
        val imported = first("ols:imported").contains("true")
        val obsolete = first("ols:isObsolete").contains("true")
        val offList = ontologies.exists(allow =>
          !first("ols:ontologyId").exists(allow.contains))
        if ((definingOnly && imported) || (skipObsolete && obsolete) || offList) None
        else {
          val id = qualifiedSafeLabel(first("ols:curie"), first("ols:definedBy"),
            first("ols:label"), first("ols:iri"))
          // unprefixed curies/shortForms pollute the id space — drop them
          val cleaned = obj
            .filterNot { case (k, v) =>
              (k == "ols:curie" && !strings(v).headOption.exists(_.contains(":"))) ||
              (k == "ols:shortForm" && !strings(v).headOption.exists(_.contains("_"))) ||
              k == "ols:searchableAnnotationValues" || k == "ols:relatedFrom"
            }
          // relatedTo: [{ols:property, ols:value}] regrouped per predicate
          val related: Map[String, Seq[RawValue]] = cleaned.get("ols:relatedTo") match {
            case Some(JArray(xs)) =>
              xs.collect { case JObject(fields) =>
                val m = fields.toMap
                (strings(m.getOrElse("ols:property", JNothing)).headOption.getOrElse(""),
                 strings(m.getOrElse("ols:value", JNothing)).headOption.getOrElse(""))
              }.filter(p => p._1.nonEmpty && p._2.nonEmpty)
                .groupBy(_._1).map { case (p, vs) => p -> vs.map(v => RawValue.str(v._2)) }
            case _ => Map.empty
          }
          val props = (cleaned - "ols:relatedTo").map { case (k, v) =>
            k -> toRawValues(v)
          }.filter(_._2.nonEmpty) ++ related
          // identifier props (reference config `identifier_props`): the
          // safe label, curie and iri form one clique, so property values
          // citing the curie resolve to this node at materialise time
          val ids = (Seq(id) ++
            props.get("ols:curie").toSeq.flatten.map(_.value).filter(_.contains(":")) ++
            props.get("ols:iri").toSeq.flatten.map(_.value)).distinct
          Some(IngestNode(ids, datasource, subgraph, Seq(grebiType), props))
        }
        }
      }
    }
  }
}
