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

  final case class FrameSample(doc_id: Long, frame_idx: Long, offset: Long,
                               n_chars: Long, checksum: Long)

  /** m2 — frame sampling: the video/audio "decode every k-th frame"
    * plumbing, over text payloads standing in for frame streams. The
    * payload splits into fixed 64-unit frames, every 4th frame is
    * sampled, and a per-frame feature (codepoint-sum checksum, the same
    * stub recipe as m1) is emitted with its index/offset/length metadata.
    * The shape is the real contract: batched partition-level iteration,
    * one output row per sampled frame, metadata columns the planner can
    * prune without touching payloads. */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val t = if (text == null) "" else text
        // frame boundaries in Unicode CODEPOINTS, like m1 and the oracle's
        // substr/len — UTF-16 units would shift every boundary and
        // checksum on the first astral character
        val cps = t.codePoints().toArray
        val nFrames = (cps.length + 63) / 64
        (0 until nFrames).iterator.filter(_ % 4 == 0).map { f =>
          val start = f * 64
          val end = math.min(start + 64, cps.length)
          var sum = 0L
          var i = start
          while (i < end) { sum += cps(i); i += 1 }
          FrameSample(id, f.toLong, start.toLong, (end - start).toLong, sum % 997)
        }
      })
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  // 2000-unit bound as in m1; (i-1)//64 is DuckDB integer division
  val frameSampleSql: String =
    """WITH chars AS (
      |  SELECT doc_id, g.i, ord(substr(text, g.i, 1)) AS c,
      |    CAST((g.i - 1) // 64 AS BIGINT) AS f
      |  FROM documents CROSS JOIN generate_series(1, 2000) g(i)
      |  WHERE g.i <= len(text))
      |SELECT doc_id, f AS frame_idx, f * 64 AS offset,
      |  count(*) AS n_chars, CAST(sum(c) % 997 AS BIGINT) AS checksum
      |FROM chars WHERE f % 4 = 0
      |GROUP BY doc_id, f ORDER BY doc_id, frame_idx""".stripMargin

  override val defs: ListMap[String, QueryDef] = ListMap(
    "m1_media_pipeline" -> QueryDef(mediaPipeline, Some(mediaPipelineSql)),
    "m2_frame_sample"   -> QueryDef(frameSample, Some(frameSampleSql)),
  )
}
