package graft.ext

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/sampled/embedded on executors.
  *
  * The actual codec step is a clearly marked STUB (no image/audio
  * libraries ship in this container): `decodeStub` parses a
  * deterministic fake header instead of calling a real decoder. All the
  * Spark-side plumbing is real and tested — schema, binary payloads,
  * partition-parallel `mapPartitions` decode, per-frame explode shape,
  * fixed-width feature vectors — so swapping the stub body for a real
  * decoder (JNI/ImageIO/pandas-UDF on PySpark) changes no dataflow.
  */
object Multimodal {

  /** Media row: payload + envelope metadata. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded metadata (stub decoder output). */
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)

  /** Sampled frame: deterministic slice fingerprints. */
  case class Frame(media_id: Long, frame_idx: Int, frame_hash: String)

  private val kinds = Array("image", "audio", "video")

  /** Synthesize a media table from `documents`: payload = fake 12-byte
    * header ("GFT1" + dims) + the UTF-8 text bytes. Deterministic, so
    * every downstream op is reproducible. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    documents(s, d).select("doc_id", "text").as[(Long, String)].map {
      case (id, text) =>
        val kind = kinds((id % 3).toInt)
        val body = text.getBytes(StandardCharsets.UTF_8)
        val w = (64 + (id * 31) % 1024).toInt
        val h = (64 + (id * 17) % 768).toInt
        val header = Array[Byte]('G', 'F', 'T', '1',
          (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte,
          (body.length >> 8).toByte, body.length.toByte,
          (id % 3).toByte, 0)
        MediaRow(id, kind, header ++ body)
    }
  }

  /** STUB DECODER — replace with a real codec. Parses the fake "GFT1"
    * header; a real implementation would hand `payload` to an image/
    * audio library here. Runs per-partition on executors: the 100 TB
    * shape (no driver round-trips, payloads never collected). */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val p = m.payload
        require(p.length >= 12 && p(0) == 'G' && p(1) == 'F' && p(2) == 'T',
          s"bad media header for ${m.media_id}")
        val w = ((p(4) & 0xff) << 8) | (p(5) & 0xff)
        val h = ((p(6) & 0xff) << 8) | (p(7) & 0xff)
        val frames = if (m.kind == "video") 1 + (p.length % 7) else 1
        MediaMeta(m.media_id, m.kind, p.length.toLong, w, h, frames)
      }
    }
  }

  /** Frame sampling: deterministic byte-range slices hashed per frame
    * (the video-frame-extraction shape: one input row → n_frames rows). */
  def sampleFrames(media: Dataset[MediaRow], everyNBytes: Int = 64)
      : Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val body = m.payload.drop(12)
      val n = math.max(1, body.length / everyNBytes)
      (0 until n).map { i =>
        val slice = body.slice(i * everyNBytes, (i + 1) * everyNBytes)
        val digest = MessageDigest.getInstance("MD5").digest(slice)
        Frame(m.media_id, i, digest.map("%02x".format(_)).mkString.take(16))
      }
    }
  }

  /** Pseudo feature-extraction: fixed-width vector from payload hash
    * bytes, normalized — the embedding-column shape for the similarity
    * tier (real models would run here via a native scorer). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8)
      : DataFrame = {
    import media.sparkSession.implicits._
    media.map { m =>
      val digest = MessageDigest.getInstance("SHA-256").digest(m.payload)
      val raw = (0 until dim).map(i => (digest(i) & 0xff) / 255.0f)
      val norm = math.sqrt(raw.map(x => x * x).sum).toFloat max 1e-9f
      (m.media_id, raw.map(_ / norm).toArray)
    }.toDF("media_id", "features")
  }

  // ----------------------------------------------- driver-contract ops

  /** m70: media envelope metadata — the oracle-checkable plumbing layer
    * (byte counts + content hash over the synthesized payload text). */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(lit(kinds), (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      octet_length(col("text")).cast("bigint").as("body_bytes"),
      md5(col("text")).as("payload_md5"))
      .orderBy("media_id")

  val mediaMetaSql: String =
    """SELECT doc_id AS media_id,
      |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS kind,
      |  CAST(octet_length(text::BLOB) AS BIGINT) AS body_bytes,
      |  md5(text) AS payload_md5
      |FROM documents ORDER BY media_id""".stripMargin

  /** m71: decode + frame-sample through the real mapPartitions path.
    * Oracle-checked: the payload after the 12-byte header is the raw
    * UTF-8 text (pure ASCII in the fixtures, verified), so every frame
    * hash is md5 over a byte slice DuckDB reproduces with substring. */
  def mediaFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    sampleFrames(mediaTable(s, d)).toDF()
      .withColumn("frame_idx", col("frame_idx").cast("bigint"))
      .orderBy("media_id", "frame_idx")
  }

  val mediaFramesSql: String =
    """SELECT doc_id AS media_id, i AS frame_idx,
      |  substr(md5(substring(text, CAST(i * 64 + 1 AS INT), 64)), 1, 16)
      |    AS frame_hash
      |FROM (SELECT doc_id, text,
      |        unnest(range(0, greatest(length(text) // 64, 1))) AS i
      |      FROM documents)
      |ORDER BY media_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m70_media_meta"   -> mediaMeta _,
    "m71_media_frames" -> mediaFrames _,
  )

  val oracleSql: Map[String, String] = Map(
    "m70_media_meta"   -> mediaMetaSql,
    "m71_media_frames" -> mediaFramesSql,
  )
}
