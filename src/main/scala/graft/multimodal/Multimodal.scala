package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * as opaque binary columns + typed metadata, with decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The decode step is a clearly-marked DETERMINISTIC FAKE (this
  * container has no image/audio codecs); everything around it —
  * schemas, encoders, partitioning, per-partition batch shape,
  * row-explosion for frame sampling — is real Spark plumbing and
  * tested. Swapping `FakeCodec` for a JNI/javacv decoder changes no
  * plan shape.
  *
  * Scale notes (100 TB of media):
  *  - Binary payloads never enter a shuffle: stages are
  *    mapPartitions (narrow) over the scanned rows; only extracted
  *    features/metadata (small, fixed width) flow onward.
  *  - Decode is per-partition imperative work — the legitimate
  *    mapPartitions case (SURVEY §7 preference (d)): one codec
  *    context per partition, streamed row-by-row through an
  *    iterator, no per-row setup cost, bounded memory.
  *  - Frame sampling multiplies rows — do it AFTER filtering and
  *    BEFORE joining anything, and repartition by asset so one giant
  *    video can't skew a partition.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, sampleRate: Int,
    durationMs: Long, format: String)
  case class MediaAsset(asset_id: Long, kind: String, content: Array[Byte],
    meta: MediaMeta)
  case class MediaFeatures(asset_id: Long, kind: String, n_bytes: Long,
    histogram: Array[Double])
  case class Frame(asset_id: Long, frame_idx: Int, offset_ms: Long,
    content: Array[Byte])

  /** Deterministic fake codec — stands in for libjpeg/ffmpeg.
    * Byte-histogram "decode" is real byte-level work; pixel decode is
    * where a real codec would slot in.
    */
  object FakeCodec {
    /** STUB: a real impl would decode pixels; the fake folds bytes. */
    def decodeToFeatures(content: Array[Byte], bins: Int = 16): Array[Double] = {
      val hist = new Array[Double](bins)
      var i = 0
      while (i < content.length) {
        hist((content(i) & 0xff) % bins) += 1.0
        i += 1
      }
      if (content.length > 0) {
        var j = 0
        while (j < bins) { hist(j) /= content.length; j += 1 }
      }
      hist
    }

    /** STUB resize: real impl rescales pixels; fake rehashes bytes to
      * the target size deterministically.
      */
    def resize(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.min(w * h / 64 + 1, 4096))
      if (content.isEmpty) return out // zero-filled; nothing to sample
      var i = 0
      while (i < out.length) {
        out(i) = content(((i.toLong * 2654435761L) % content.length).toInt.abs)
        i += 1
      }
      out
    }
  }

  /** Synthesize a deterministic media-asset table from documents:
    * content bytes derive from the text, metadata from the id. The
    * generation rule is SQL-replicable so metadata queries can be
    * oracled.
    */
  def syntheticAssets(documents: DataFrame): Dataset[MediaAsset] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val meta = MediaMeta(
          width = 640 + (id % 4).toInt * 160,
          height = 360 + (id % 4).toInt * 90,
          sampleRate = if (kind == "audio") 16000 else 0,
          durationMs = if (kind == "image") 0L else 1000L + (id % 60) * 1000L,
          format = kind match {
            case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
          })
        MediaAsset(id, kind, text.getBytes("UTF-8"), meta)
      }
  }

  /** Feature extraction — one codec pass per partition, binary in /
    * fixed-width features out (the binary column dies here).
    */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition "codec init" happens here in a real impl
      it.map(a => MediaFeatures(a.asset_id, a.kind, a.content.length.toLong,
        FakeCodec.decodeToFeatures(a.content)))
    }
  }

  /** Resize stage: binary in / binary out per asset, metadata updated
    * to the target dimensions — the standalone form of the resize the
    * frame sampler applies per frame. Narrow mapPartitions like the
    * other codec stages: one codec context per partition, payloads
    * never shuffle.
    */
  def resizeAssets(assets: Dataset[MediaAsset], w: Int, h: Int): Dataset[MediaAsset] = {
    require(w > 0 && h > 0, s"target dimensions must be positive, got ${w}x$h")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map(a => a.copy(
        content = FakeCodec.resize(a.content, w, h),
        meta = a.meta.copy(width = w, height = h)))
    }
  }

  /** Frame sampling: one row per sampled frame at `everyMs` —
    * the UDTF/flatMap shape (row multiplication, narrow).
    */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long): Dataset[Frame] = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val n = math.max(1, (a.meta.durationMs / everyMs).toInt)
      (0 until n).iterator.map { i =>
        Frame(a.asset_id, i, i * everyMs,
          FakeCodec.resize(a.content, a.meta.width, a.meta.height))
      }
    }
  }

  /** Metadata rollup (oracle-able: generation rule is pure SQL). */
  def metadataStats(assets: Dataset[MediaAsset]): DataFrame =
    assets.toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(length(col("content"))).as("total_bytes"),
        sum(col("meta.durationMs")).as("total_duration_ms"),
        max(col("meta.width")).as("max_width"))
      .orderBy(col("kind"))
}
