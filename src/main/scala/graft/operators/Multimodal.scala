package graft.operators

import graft.core.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct, and
  * decode/feature-extract runs as a batched partition-level operator —
  * exactly the shape a real decoder (codec library over `mapPartitions`,
  * or Arrow-batched UDFs) plugs into.
  *
  * The decode step itself is STUBBED with a deterministic fake (this
  * container carries no codec libraries): [[MediaStub.decode]] stands in
  * for the codec call; everything around it — the binary payload schema,
  * per-partition batching, metadata struct, and the downstream aggregation
  * — is real and oracle-checked. At scale the payload column dominates
  * bytes: the media table stays in its own parquet files so scans that
  * only need metadata never touch payload pages (columnar pruning).
  */
object Multimodal extends QueryModule {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
                               media_type: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
                                 media_type: String)

  object MediaStub {
    /** STUB decoder — a real implementation would hand `payload` to a
      * codec (JPEG decode, PCM resample, frame sample). Deterministic
      * fake: byte-sum checksum mod 997. The signature (bytes in, features
      * out, called once per batch iterator) is the real contract. */
    def decode(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      batch.map { m =>
        // checksum over Unicode CODEPOINTS of the decoded payload so the
        // SQL oracle's per-character ord() replays it beyond ASCII
        // (a UTF-8 byte sum would diverge on any multibyte character)
        val text = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
        var sum = 0L
        var i = 0
        while (i < text.length) {
          val cp = text.codePointAt(i)
          sum += cp
          i += Character.charCount(cp)
        }
        MediaFeatures(m.doc_id, m.payload.length.toLong, sum % 997, m.media_type)
      }
  }

  /** m1 — binary ingestion + batched stub-decode + metadata aggregation.
    * Documents stand in for media payloads (text bytes as the opaque
    * payload). */
  def mediaPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        concat(lit("text/"), col("lang")).as("media_type"))
      .as[MediaRecord]
    // partition-level batch decode — one stub call per partition iterator
    val features = media.mapPartitions(MediaStub.decode)
    features.toDF()
      .select(col("doc_id"), col("n_bytes"), col("checksum"), col("media_type"))
      .orderBy(col("doc_id"))
  }

  // 2000-char series bound = ~4× headroom over the longest generated doc
  // (577 chars at sf0.1); LEFT JOIN + coalesce keeps empty-text docs.
  val mediaPipelineSql: String =
    """WITH sums AS (
      |  SELECT doc_id, sum(ord(substr(text, g.i, 1))) AS cpsum
      |  FROM documents CROSS JOIN generate_series(1, 2000) g(i)
      |  WHERE g.i <= len(text)
      |  GROUP BY doc_id)
      |SELECT d.doc_id AS doc_id, octet_length(encode(d.text)) AS n_bytes,
      |  CAST(coalesce(s.cpsum, 0) % 997 AS BIGINT) AS checksum,
      |  'text/' || d.lang AS media_type
      |FROM documents d LEFT JOIN sums s ON s.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  override val defs: ListMap[String, QueryDef] = ListMap(
    "m1_media_pipeline" -> QueryDef(mediaPipeline, Some(mediaPipelineSql)),
  )
}
