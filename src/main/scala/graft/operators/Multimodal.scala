package graft.operators

import graft.core.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap

/** Multimodal column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque `binary` columns with a typed metadata struct, and
  * decode/feature-extract runs as a batched partition-level operator.
  *
  * The decoders are REAL format parsers from [[graft.media.Codecs]] —
  * 24-bit BMP (header fields, row padding, BGR order, both row
  * orientations) and 16-bit PCM WAV (RIFF chunk walk, little-endian
  * signed samples) — plus UTF-8 for text payloads. At scale the payload
  * column dominates bytes: the media table stays in its own parquet
  * files so scans that only need metadata never touch payload pages
  * (columnar pruning).
  */
object Multimodal extends QueryModule {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte],
                               media_type: String)
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: Long,
                                 media_type: String)

  /** Text-payload decode: UTF-8 bytes → codepoint-sum feature. The
    * checksum runs over Unicode CODEPOINTS of the decoded payload so the
    * SQL oracle's per-character ord() replays it beyond ASCII (a UTF-8
    * byte sum would diverge on any multibyte character). */
  private def decodeTextBatch(batch: Iterator[MediaRecord]): Iterator[MediaFeatures] =
    batch.map { m =>
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

  /** m1 — binary ingestion + batched text decode + metadata aggregation.
    * Documents stand in for media payloads (UTF-8 bytes as the opaque
    * payload). */
  def mediaPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        concat(lit("text/"), col("lang")).as("media_type"))
      .as[MediaRecord]
    // partition-level batch decode — one call per partition iterator
    val features = media.mapPartitions(decodeTextBatch)
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

  final case class MediaFeat(doc_id: Long, media_type: String, meta: Long,
                             n_units: Long, checksum: Long)

  /** m3 — REAL binary decode: each doc synthesizes a genuine media file
    * distributed-side (even doc_id → 8×8 24-bit BMP, odd → mono 16-bit
    * PCM WAV whose length and sample rate vary per doc), and the decode
    * pass parses the actual bytes back through [[graft.media.Codecs]].
    * Features are ORDER-SENSITIVE (position-weighted checksums over the
    * decoded pixels / samples), so a row-orientation flip, padding slip,
    * BGR/RGB swap or endianness bug in either codec breaks the hash —
    * the oracle replays the closed-form pixel/sample values the encoder
    * was given, so only a faithful encode→decode round-trip matches. */
  /** Deterministic per-doc media synthesis shared by m3/m4: even doc_id →
    * 8×8 24-bit BMP, odd → mono 16-bit PCM WAV with per-doc length and
    * rate (the closed forms the oracles replay). */
  private def synthMedia(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        if (id % 2 == 0) {
          val bytes = graft.media.Codecs.encodeBmp(8, 8, (x, y) => {
            val idx = y * 8 + x
            (((id + 3 * idx) % 256).toInt, ((id + 5 * idx) % 251).toInt,
              ((id + 7 * idx) % 247).toInt)
          })
          MediaRecord(id, bytes, "image/bmp")
        } else {
          val n = (64 + id % 32).toInt
          val rate = (8000 + (id % 5) * 1000).toInt
          val samples = Array.tabulate(n)(i => (((id * 7 + i * 13) % 2003) - 1001).toShort)
          MediaRecord(id, graft.media.Codecs.encodeWavPcm16(rate, samples), "audio/wav")
        }
      }
  }

  def realDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = synthMedia(s, d)
    val features = media.mapPartitions(_.map { m =>
      m.media_type match {
        case "image/bmp" =>
          val img = graft.media.Codecs.decodeBmp(m.payload)
          var sum = 0L
          var idx = 0
          while (idx < img.pixels.length) {
            val p = img.pixels(idx)
            sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).toLong * (idx + 1)
            idx += 1
          }
          MediaFeat(m.doc_id, m.media_type, img.width.toLong,
            img.pixels.length.toLong, sum % 1000003)
        case _ =>
          val wav = graft.media.Codecs.decodeWavPcm16(m.payload)
          var sum = 0L
          var i = 0
          while (i < wav.samples.length) { sum += wav.samples(i).toLong * (i + 1); i += 1 }
          MediaFeat(m.doc_id, m.media_type, wav.sampleRate.toLong,
            wav.samples.length.toLong, ((sum % 1000003) + 1000003) % 1000003)
      }
    })
    features.toDF().orderBy(col("doc_id"))
  }

  val realDecodeSql: String =
    """WITH bmp AS (
      |  SELECT doc_id, CAST(sum(
      |      ((doc_id + 3*idx) % 256 + (doc_id + 5*idx) % 251 + (doc_id + 7*idx) % 247)
      |      * (idx + 1)) % 1000003 AS BIGINT) AS checksum
      |  FROM documents CROSS JOIN generate_series(0, 63) g(idx)
      |  WHERE doc_id % 2 = 0 GROUP BY doc_id),
      |wav AS (
      |  SELECT doc_id,
      |    CAST(((sum((((doc_id*7 + i*13) % 2003) - 1001) * (i + 1)) % 1000003)
      |      + 1000003) % 1000003 AS BIGINT) AS checksum,
      |    CAST(64 + doc_id % 32 AS BIGINT) AS n
      |  FROM documents CROSS JOIN generate_series(0, 95) g(i)
      |  WHERE doc_id % 2 = 1 AND i < 64 + doc_id % 32
      |  GROUP BY doc_id)
      |SELECT doc_id, 'image/bmp' AS media_type, CAST(8 AS BIGINT) AS meta,
      |  CAST(64 AS BIGINT) AS n_units, checksum FROM bmp
      |UNION ALL
      |SELECT doc_id, 'audio/wav', CAST(8000 + (doc_id % 5) * 1000 AS BIGINT), n, checksum FROM wav
      |ORDER BY doc_id""".stripMargin

  /** m4 — resize/resample through a DOUBLE codec round-trip: decode the
    * synthesized file, nearest-neighbour-resize the image to 4×4 (or
    * decimate the audio by 2), re-ENCODE the result, decode it again,
    * and checksum those pixels/samples. The oracle replays the closed
    * form of the resized signal, so a bug in the resize mapping OR in
    * either encode→decode direction (padding, BGR, endianness, rate
    * header) breaks the hash. This is the "resize / frame-rate" stage of
    * a multimodal training pipeline, batched per partition like every
    * media op. */
  def resizeDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val features = synthMedia(s, d).mapPartitions(_.map { m =>
      m.media_type match {
        case "image/bmp" =>
          val img = graft.media.Codecs.decodeBmp(m.payload)
          val small = graft.media.Codecs.resizeNearestBmp(img, 4, 4)
          val rt = graft.media.Codecs.decodeBmp(
            graft.media.Codecs.encodeBmp(small.width, small.height,
              (x, y) => { val p = small.pixels(y * small.width + x)
                ((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff) }))
          var sum = 0L
          var idx = 0
          while (idx < rt.pixels.length) {
            val p = rt.pixels(idx)
            sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).toLong * (idx + 1)
            idx += 1
          }
          MediaFeat(m.doc_id, m.media_type, rt.width.toLong,
            rt.pixels.length.toLong, sum % 1000003)
        case _ =>
          val wav = graft.media.Codecs.decodeWavPcm16(m.payload)
          val half = graft.media.Codecs.decimateWav(wav, 2)
          val rt = graft.media.Codecs.decodeWavPcm16(
            graft.media.Codecs.encodeWavPcm16(half.sampleRate, half.samples))
          var sum = 0L
          var i = 0
          while (i < rt.samples.length) { sum += rt.samples(i).toLong * (i + 1); i += 1 }
          MediaFeat(m.doc_id, m.media_type, rt.sampleRate.toLong,
            rt.samples.length.toLong, ((sum % 1000003) + 1000003) % 1000003)
      }
    })
    features.toDF().orderBy(col("doc_id"))
  }

  val resizeDecodeSql: String =
    """WITH bmp AS (
      |  SELECT doc_id, CAST(sum(
      |      ((doc_id + 3*s) % 256 + (doc_id + 5*s) % 251 + (doc_id + 7*s) % 247)
      |      * (idx + 1)) % 1000003 AS BIGINT) AS checksum
      |  FROM (SELECT doc_id, idx, 16*(idx // 4) + 2*(idx % 4) AS s
      |        FROM documents CROSS JOIN generate_series(0, 15) g(idx)
      |        WHERE doc_id % 2 = 0)
      |  GROUP BY doc_id),
      |wav AS (
      |  SELECT doc_id,
      |    CAST(((sum((((doc_id*7 + 2*i*13) % 2003) - 1001) * (i + 1)) % 1000003)
      |      + 1000003) % 1000003 AS BIGINT) AS checksum,
      |    CAST((64 + doc_id % 32 + 1) // 2 AS BIGINT) AS n
      |  FROM documents CROSS JOIN generate_series(0, 47) g(i)
      |  WHERE doc_id % 2 = 1 AND i < (64 + doc_id % 32 + 1) // 2
      |  GROUP BY doc_id)
      |SELECT doc_id, 'image/bmp' AS media_type, CAST(4 AS BIGINT) AS meta,
      |  CAST(16 AS BIGINT) AS n_units, checksum FROM bmp
      |UNION ALL
      |SELECT doc_id, 'audio/wav', CAST(4000 + (doc_id % 5) * 500 AS BIGINT), n, checksum FROM wav
      |ORDER BY doc_id""".stripMargin

  /** m5 — MEDIA DEDUP: the decode → content-fingerprint → exact-dedup
    * composition a multimodal training pipeline runs before captioning
    * (byte-identical files are the easy case; re-encoded copies share
    * pixels, not bytes, so the fingerprint must run over DECODED
    * content). Payload content here derives from `doc_id % 50`, so every
    * class has ~N/50 re-encodes; each is synthesized, decoded back
    * through the real BMP/WAV parsers, fingerprinted position-sensitively
    * (m3's checksum), and deduped d1-style: canonical = min doc_id per
    * (media_type, checksum). The oracle replays the closed-form content.
    * 50 is even, so a class is all-BMP or all-WAV (parity is stable). */
  def mediaDedup(s: SparkSession, d: String): DataFrame =
    mediaPrints(s, Tables.documents(s, d).select(col("doc_id")))
      .groupBy("media_type", "checksum")
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("media_type"), col("checksum"))

  /** The synth → REAL-codec decode → position-sensitive fingerprint
    * stage of [[mediaDedup]], over any `(doc_id)` frame — batch m5 and
    * streaming st34 share it verbatim (typed map/mapPartitions work
    * unchanged on a streaming Dataset, and the downstream
    * (media_type, checksum) min/count aggregation is a semigroup, so
    * the streaming state is one row per CONTENT CLASS, not per doc). */
  private[graft] def mediaPrints(s: SparkSession, ids: DataFrame): DataFrame = {
    import s.implicits._
    val media = ids.select(col("doc_id")).as[Long]
      .map { id =>
        val k = id % 50
        if (k % 2 == 0) {
          val bytes = graft.media.Codecs.encodeBmp(8, 8, (x, y) => {
            val idx = y * 8 + x
            (((k + 3 * idx) % 256).toInt, ((k + 5 * idx) % 251).toInt,
              ((k + 7 * idx) % 247).toInt)
          })
          MediaRecord(id, bytes, "image/bmp")
        } else {
          val n = (64 + k % 32).toInt
          val samples = Array.tabulate(n)(i => (((k * 7 + i * 13) % 2003) - 1001).toShort)
          MediaRecord(id, graft.media.Codecs.encodeWavPcm16(
            (8000 + (k % 5) * 1000).toInt, samples), "audio/wav")
        }
      }
    val prints = media.mapPartitions(_.map { m =>
      val checksum = m.media_type match {
        case "image/bmp" =>
          val img = graft.media.Codecs.decodeBmp(m.payload)
          var sum = 0L
          var idx = 0
          while (idx < img.pixels.length) {
            val p = img.pixels(idx)
            sum += (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)).toLong * (idx + 1)
            idx += 1
          }
          sum % 1000003
        case _ =>
          val wav = graft.media.Codecs.decodeWavPcm16(m.payload)
          var sum = 0L
          var i = 0
          while (i < wav.samples.length) { sum += wav.samples(i).toLong * (i + 1); i += 1 }
          ((sum % 1000003) + 1000003) % 1000003
      }
      (m.doc_id, m.media_type, checksum)
    }).toDF("doc_id", "media_type", "checksum")
    prints
  }

  val mediaDedupSql: String =
    """WITH kk AS (SELECT doc_id, doc_id % 50 AS k FROM documents),
      |bmp AS (
      |  SELECT k, CAST(sum(
      |      ((k + 3*idx) % 256 + (k + 5*idx) % 251 + (k + 7*idx) % 247)
      |      * (idx + 1)) % 1000003 AS BIGINT) AS checksum
      |  FROM (SELECT DISTINCT k FROM kk WHERE k % 2 = 0)
      |    CROSS JOIN generate_series(0, 63) g(idx)
      |  GROUP BY k),
      |wav AS (
      |  SELECT k, CAST(((sum((((k*7 + i*13) % 2003) - 1001) * (i + 1)) % 1000003)
      |      + 1000003) % 1000003 AS BIGINT) AS checksum
      |  FROM (SELECT DISTINCT k FROM kk WHERE k % 2 = 1)
      |    CROSS JOIN generate_series(0, 95) g(i)
      |  WHERE i < 64 + k % 32
      |  GROUP BY k),
      |cs AS (
      |  SELECT doc_id, 'image/bmp' AS media_type, b.checksum
      |  FROM kk JOIN bmp b USING (k)
      |  UNION ALL
      |  SELECT doc_id, 'audio/wav', w.checksum
      |  FROM kk JOIN wav w USING (k))
      |SELECT media_type, checksum, min(doc_id) AS canonical_id,
      |  count(*) AS n_copies
      |FROM cs GROUP BY media_type, checksum
      |ORDER BY media_type, checksum""".stripMargin

  /** m6 — SCENE DETECTION over a frame container: each doc synthesizes a
    * "video" (a length-prefixed container of real BMP frames — the
    * layout a custom binary column carries when frames ride through the
    * pipeline together), the decode pass walks the container parsing
    * every frame through the real BMP codec, and scene cuts are frames
    * whose summed pixel intensity jumps versus the previous frame — the
    * shot-boundary pass a video training pipeline runs before frame
    * sampling. Synthesis plants exactly one cut per doc at frame
    * `doc_id % 5 + 2` (intensity +120 mod 200, so the jump survives the
    * wrap in both directions); the oracle replays the closed form, so
    * only a faithful container walk + frame decode matches. */
  def sceneDetect(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val frames = 8
    val media = Tables.documents(s, d).select(col("doc_id")).as[Long]
      .map { id =>
        val cut = (id % 5).toInt + 2
        val fs = (0 until frames).map { f =>
          val v = ((id + (if (f >= cut) 120 else 0)) % 200).toInt
          graft.media.Codecs.encodeBmp(4, 4, (_, _) => (v, v, v))
        }
        val buf = java.nio.ByteBuffer.allocate(4 + fs.map(_.length + 4).sum)
        buf.putInt(fs.length)
        fs.foreach { b => buf.putInt(b.length); buf.put(b) }
        MediaRecord(id, buf.array(), "video/x-graft-frames")
      }
    media.mapPartitions(_.flatMap { m =>
      val buf = java.nio.ByteBuffer.wrap(m.payload)
      val n = buf.getInt()
      val sv = (0 until n).map { _ =>
        val len = buf.getInt()
        val fb = new Array[Byte](len)
        buf.get(fb)
        val img = graft.media.Codecs.decodeBmp(fb)
        img.pixels.foldLeft(0L)((acc, p) =>
          acc + ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff))
      }
      (1 until n).iterator
        .filter(f => math.abs(sv(f) - sv(f - 1)) > 1000L)
        .map(f => (m.doc_id, f, sv(f - 1), sv(f)))
    }).toDF("doc_id", "frame", "sv_prev", "sv")
      .orderBy(col("doc_id"), col("frame"))
  }

  val sceneDetectSql: String =
    """SELECT doc_id, CAST(doc_id % 5 + 2 AS INT) AS frame,
      |  CAST(48 * (doc_id % 200) AS BIGINT) AS sv_prev,
      |  CAST(48 * ((doc_id + 120) % 200) AS BIGINT) AS sv
      |FROM documents ORDER BY doc_id, frame""".stripMargin

  final case class Loudness(doc_id: Long, n_windows: Long, loud_idx: Long,
                            loud_energy: Long)

  /** m7 — LOUDNESS WINDOWS over the real WAV decode: every odd doc's
    * synthesized PCM file is parsed back through the codec, split into
    * 16-sample windows, and the loudest window (Σ sample², exact int64;
    * ties → lowest index) is reported with the window count — the
    * audio-segmentation primitive (VAD thresholding, clip selection) a
    * multimodal pipeline runs right after decode. Like m3, the features
    * are order-sensitive through the decoded bytes, so any codec slip
    * breaks the hash; the oracle replays the closed-form samples. */
  def loudnessWindows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    synthMedia(s, d)
      .filter(_.media_type == "audio/wav")
      .mapPartitions(_.map(m =>
        loudnessOf(m.doc_id, graft.media.Codecs.decodeWavPcm16(m.payload).samples)))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Loudest 16-sample window of one decoded PCM stream. A zero-sample
    * decode (empty/truncated payload through the shared codec path —
    * synthMedia never emits one, arbitrary inputs can) degrades to
    * `n_windows = 0` with a −1 sentinel index instead of throwing and
    * failing the whole job (MultimodalSpec pins it). */
  private[operators] def loudnessOf(docId: Long, samples: Array[Short]): Loudness = {
    val energies = samples.grouped(16)
      .map(_.foldLeft(0L)((a, v) => a + v.toLong * v)).toArray
    if (energies.isEmpty) Loudness(docId, 0L, -1L, 0L)
    else {
      var best = 0
      var i = 1
      while (i < energies.length) {
        if (energies(i) > energies(best)) best = i
        i += 1
      }
      Loudness(docId, energies.length.toLong, best.toLong, energies(best))
    }
  }

  val loudnessWindowsSql: String =
    """WITH s AS (
      |  SELECT doc_id, g.i, (((doc_id*7 + g.i*13) % 2003) - 1001) AS v,
      |    CAST(g.i // 16 AS BIGINT) AS wdw
      |  FROM documents CROSS JOIN generate_series(0, 95) g(i)
      |  WHERE doc_id % 2 = 1 AND g.i < 64 + doc_id % 32),
      |e AS (
      |  SELECT doc_id, wdw, CAST(sum(v * v) AS BIGINT) AS energy
      |  FROM s GROUP BY doc_id, wdw),
      |pick AS (
      |  SELECT doc_id, wdw, energy,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY energy DESC, wdw ASC) AS rn,
      |    count(*) OVER (PARTITION BY doc_id) AS nw
      |  FROM e)
      |SELECT doc_id, CAST(nw AS BIGINT) AS n_windows, wdw AS loud_idx,
      |  energy AS loud_energy
      |FROM pick WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** Per-image 56-bit dHash over the DECODED pixels: brightness =
    * r+g+b per pixel, one bit per adjacent-pixel comparison (8 rows × 7
    * columns). The standard perceptual gradient hash — robust to level
    * shifts, sensitive to edge structure — computed from the real BMP
    * decode so a codec bug changes the hashes. */
  private[operators] def imagePhashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    synthMedia(s, d).filter(_.media_type == "image/bmp").map { m =>
      val img = graft.media.Codecs.decodeBmp(m.payload)
      def gray(i: Int): Int = {
        val p = img.pixels(i)
        ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
      }
      var hash = 0L
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width - 1) {
          if (gray(y * img.width + x + 1) > gray(y * img.width + x))
            hash |= 1L << (y * (img.width - 1) + x)
          x += 1
        }
        y += 1
      }
      (m.doc_id, hash)
    }.toDF("doc_id", "hash")
  }

  /** m8 — PERCEPTUAL IMAGE-HASH NEAR-DUP PAIRS: d8's banded-SimHash
    * recipe applied to [[imagePhashes]] — 4 bands × 14 bits, Hamming
    * threshold 3, so by pigeonhole every qualifying pair shares an
    * untouched band and the banding is COMPLETE while never going
    * all-pairs. The band join rides [[Dedup.bandCandidates]]'s shared
    * hot-bucket guard (cap + star-to-minimum); verification is one
    * `bit_count(xor)` per candidate. The image twin of d4/d8: same
    * scale contract, pixels instead of tokens. */
  def imagePhashPairs(s: SparkSession, d: String): DataFrame = {
    val hashes = imagePhashes(s, d)
    val bands = hashes.select(col("doc_id"),
      explode(array((0 until 4).map(c =>
        concat_ws("|", lit(c.toString),
          shiftright(col("hash"), c * 14).bitwiseAND(lit(16383L)).cast("string"))): _*))
        .as("band"))
    Dedup.bandCandidates(bands, "doc_id")
      .join(hashes.select(col("doc_id").as("da"), col("hash").as("ha")), "da")
      .join(hashes.select(col("doc_id").as("db"), col("hash").as("hb")), "db")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .where(col("hamming") <= 3)
      .select(col("da"), col("db"), col("hamming"))
      .orderBy(col("da"), col("db"))
  }

  val imagePhashPairsSql: String =
    """WITH g AS (
      |  SELECT doc_id, idx,
      |    (doc_id + 3*idx) % 256 + (doc_id + 5*idx) % 251 + (doc_id + 7*idx) % 247 AS gray
      |  FROM documents CROSS JOIN generate_series(0, 63) gs(idx)
      |  WHERE doc_id % 2 = 0),
      |h AS (
      |  SELECT a.doc_id,
      |    CAST(coalesce(sum(CASE WHEN b.gray > a.gray
      |      THEN (CAST(1 AS BIGINT) << ((a.idx // 8) * 7 + a.idx % 8))
      |      ELSE 0 END), 0) AS BIGINT) AS hash
      |  FROM g a JOIN g b ON b.doc_id = a.doc_id AND b.idx = a.idx + 1
      |  WHERE a.idx % 8 < 7
      |  GROUP BY a.doc_id),
      |bands AS (
      |  SELECT doc_id, c, (hash >> (c * 14)) & 16383 AS bv
      |  FROM h CROSS JOIN generate_series(0, 3) gc(c)),
      |cand AS (
      |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
      |  FROM bands x JOIN bands y
      |    ON y.c = x.c AND y.bv = x.bv AND y.doc_id > x.doc_id)
      |SELECT da, db, CAST(bit_count(xor(ha.hash, hb.hash)) AS INT) AS hamming
      |FROM cand JOIN h ha ON ha.doc_id = da JOIN h hb ON hb.doc_id = db
      |WHERE bit_count(xor(ha.hash, hb.hash)) <= 3
      |ORDER BY da, db""".stripMargin

  /** m9 — AUDIO FINGERPRINT NEAR-DUP PAIRS: the audio twin of m8, and
    * the last modality in the d4/d8/m8 banded-Hamming family. Each odd
    * doc's PCM stream (REAL WAV decode, like m7) fingerprints as 56
    * sign bits — `bit i = sample(i) > 0`, the zero-crossing pattern —
    * a shape-not-level code (chromaprint's idea reduced to one band):
    * amplitude scaling preserves it, so re-encoded copies land ≤ a few
    * bits apart, while phase-shifted streams drift bit-by-bit (on the
    * synth corpus this grades pairs smoothly: ~3.3k of 31k possible
    * pairs qualify, not a degenerate all-match). Sign-pattern hashes
    * cluster far harder than pixel-gradient ones, so at larger SFs the
    * band buckets DO cross [[Dedup.HotBucketCap]] and the star-to-min
    * guard engages — the oracle mirrors the cap contract exactly
    * (capped candidates + ledgered overflow, never silent loss), which
    * is what keeps this gate honest at every SF where m8's dispersed
    * buckets never trip it. Pairing is m8's
    * recipe verbatim: 4 bands × 14 bits
    * (pigeonhole-complete at Hamming ≤ 3) through
    * [[Dedup.bandCandidates]]'s hot-bucket guard, one
    * `bit_count(xor)` verify per candidate. Every audio doc has ≥ 64
    * samples, so the 56-sample prefix the bits read always exists. */
  def audioFingerprintPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashes = synthMedia(s, d).filter(_.media_type == "audio/wav").map { m =>
      val v = graft.media.Codecs.decodeWavPcm16(m.payload).samples
      var hash = 0L
      var i = 0
      while (i < 56 && i < v.length) {
        if (v(i) > 0) hash |= 1L << i
        i += 1
      }
      (m.doc_id, hash)
    }.toDF("doc_id", "hash")
    val bands = hashes.select(col("doc_id"),
      explode(array((0 until 4).map(c =>
        concat_ws("|", lit(c.toString),
          shiftright(col("hash"), c * 14).bitwiseAND(lit(16383L)).cast("string"))): _*))
        .as("band"))
    Dedup.bandCandidates(bands, "doc_id")
      .join(hashes.select(col("doc_id").as("da"), col("hash").as("ha")), "da")
      .join(hashes.select(col("doc_id").as("db"), col("hash").as("hb")), "db")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .where(col("hamming") <= 3)
      .select(col("da"), col("db"), col("hamming"))
      .orderBy(col("da"), col("db"))
  }

  val audioFingerprintPairsSql: String =
    s"""WITH v AS (
      |  SELECT doc_id, i, (((doc_id*7 + i*13) % 2003) - 1001) AS s
      |  FROM documents CROSS JOIN generate_series(0, 55) gs(i)
      |  WHERE doc_id % 2 = 1),
      |h AS (
      |  SELECT doc_id,
      |    CAST(coalesce(sum(CASE WHEN s > 0
      |      THEN (CAST(1 AS BIGINT) << i) ELSE 0 END), 0) AS BIGINT) AS hash
      |  FROM v GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, c, (hash >> (c * 14)) & 16383 AS bv
      |  FROM h CROSS JOIN generate_series(0, 3) gc(c)),
      |sized AS (
      |  SELECT doc_id, c, bv,
      |    count(*) OVER (PARTITION BY c, bv) AS bn,
      |    min(doc_id) OVER (PARTITION BY c, bv) AS bmin
      |  FROM bands),
      |cand AS (
      |  SELECT DISTINCT da, db FROM (
      |    SELECT x.doc_id AS da, y.doc_id AS db
      |    FROM sized x JOIN sized y ON y.c = x.c AND y.bv = x.bv
      |      AND x.doc_id < y.doc_id AND x.bn <= ${Dedup.HotBucketCap}
      |    UNION ALL
      |    SELECT bmin, doc_id FROM sized WHERE bn > ${Dedup.HotBucketCap} AND doc_id != bmin))
      |SELECT da, db, CAST(bit_count(xor(ha.hash, hb.hash)) AS INT) AS hamming
      |FROM cand JOIN h ha ON ha.doc_id = da JOIN h hb ON hb.doc_id = db
      |WHERE bit_count(xor(ha.hash, hb.hash)) <= 3
      |ORDER BY da, db""".stripMargin

  override val defs: ListMap[String, QueryDef] = ListMap(
    "m1_media_pipeline" -> QueryDef(mediaPipeline, Some(mediaPipelineSql)),
    "m2_frame_sample"   -> QueryDef(frameSample, Some(frameSampleSql)),
    "m3_real_decode"    -> QueryDef(realDecode, Some(realDecodeSql)),
    "m4_resize_decode"  -> QueryDef(resizeDecode, Some(resizeDecodeSql)),
    "m5_media_dedup"    -> QueryDef(mediaDedup, Some(mediaDedupSql)),
    "m6_scene_detect"   -> QueryDef(sceneDetect, Some(sceneDetectSql)),
    "m7_loudness"       -> QueryDef(loudnessWindows, Some(loudnessWindowsSql)),
    "m8_image_phash"    -> QueryDef(imagePhashPairs, Some(imagePhashPairsSql)),
    "m9_audio_fingerprint" -> QueryDef(audioFingerprintPairs, Some(audioFingerprintPairsSql)),
  )
}
