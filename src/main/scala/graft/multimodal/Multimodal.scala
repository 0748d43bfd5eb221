package graft.multimodal

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded / feature-extracted / resized /
  * frame-sampled via `mapPartitions` over typed Datasets.
  *
  * The actual codec work is STUBBED (this container ships no image/audio
  * libraries): `fakeDecode` derives deterministic pseudo-metadata from an
  * md5 of the payload, clearly marked below. Everything AROUND the stub is
  * the real production shape — binary-safe schemas, per-partition batch
  * processing (one decoder init per partition, not per row), narrow
  * plan (no shuffle introduced by any stage), and explode-shaped frame
  * sampling — so swapping `fakeDecode` for javacv/ffmpeg is a local change.
  *
  * Scale: all four operators are per-row/narrow; a 100 TB corpus of binary
  * payloads distributes by input split. Keep payloads ≤ a few MB per row
  * (parquet row-group friendly); bigger media belongs in object storage
  * with the DataFrame carrying (uri, range) pointers instead — the same
  * operators then fetch in `mapPartitions` with pooled connections.
  */
object Multimodal {

  final case class Media(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class ImageMeta(doc_id: Long, media_type: String, n_bytes: Long,
                             width: Int, height: Int, n_channels: Int)
  final case class Frame(doc_id: Long, frame_idx: Int, frame_payload: Array[Byte])
  final case class MediaVec(doc_id: Long, embedding: Array[Float])

  /** ======= STUB ======= deterministic fake decoder: md5(payload) →
    * pseudo (width, height, channels). A real build replaces ONLY this. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val d = MessageDigest.getInstance("MD5").digest(payload)
    def u16(i: Int) = ((d(i) & 0xff) << 8 | (d(i + 1) & 0xff))
    (u16(0) % 1024 + 1, u16(2) % 1024 + 1, Array(1, 3, 4)(u16(4) % 3))
  }

  /** Decode metadata per payload. One decoder instance per PARTITION (the
    * digest here stands in for a codec context that is expensive to init). */
  def decodeMeta(media: Dataset[Media])(implicit spark: SparkSession): Dataset[ImageMeta] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here in a real decoder
      it.map { m =>
        val (w, h, c) = fakeDecode(m.payload)
        ImageMeta(m.doc_id, m.media_type, m.payload.length.toLong, w, h, c)
      }
    }
  }

  /** Resize: payload-in/payload-out, metadata updated. The stub keeps the
    * payload and clamps dims — the schema and batch shape are the point. */
  def resize(media: Dataset[Media], maxSide: Int)
            (implicit spark: SparkSession): Dataset[ImageMeta] = {
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val (w, h, c) = fakeDecode(m.payload)
      val scale = math.min(1.0, maxSide.toDouble / math.max(w, h))
      ImageMeta(m.doc_id, m.media_type, m.payload.length.toLong,
        math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt), c)
    })
  }

  /** Frame sampling for video payloads: emits `everyNth`-stride frames as
    * an exploded Dataset (stub: deterministic byte slices stand in for
    * decoded frames; frame count derives from payload size). */
  def sampleFrames(media: Dataset[Media], everyNth: Int)
                  (implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.filter(_.media_type == "video").mapPartitions(_.flatMap { m =>
      val nFrames = math.max(1, m.payload.length / 64) // STUB frame count
      (0 until nFrames by everyNth).map { i =>
        val from = (i * 64) % math.max(1, m.payload.length)
        val until = math.min(from + 64, m.payload.length)
        Frame(m.doc_id, i, m.payload.slice(from, until))
      }
    })
  }

  /** Feature extraction: payload → fixed-width float embedding (stub:
    * md5-chained PRN floats in [-1,1)); batch shape + vector schema real. */
  def extractFeatures(media: Dataset[Media], dim: Int = 64)
                     (implicit spark: SparkSession): Dataset[MediaVec] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map { m =>
        val vec = new Array[Float](dim)
        var seed = m.payload
        var i = 0
        while (i < dim) {
          seed = md.digest(seed)
          vec(i) = (((seed(0) & 0xff) << 8 | (seed(1) & 0xff)) / 32768.0f) - 1.0f
          i += 1
        }
        MediaVec(m.doc_id, vec)
      }
    }
  }
}
