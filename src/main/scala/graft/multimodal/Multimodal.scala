package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The Spark-side shape is real — binary columns, per-partition batch
  * decode with an injectable codec, frame sampling — while the codec
  * itself is a STUB (no image/audio libraries exist in this environment):
  * `stubDecoder` derives deterministic fake metadata from the bytes, so
  * the pipeline is testable end-to-end and the oracle can verify the
  * plumbing. Swapping `stubDecoder` for a JNI/javacpp codec changes no
  * plan shape: decode stays a narrow mapPartitions (operator preference
  * (d) — justified here because codecs are external native calls, not
  * expressible as Catalyst expressions).
  */
object Multimodal {

  final case class Asset(asset_id: Long, kind: String, bytes: Array[Byte])
  final case class AssetMeta(asset_id: Long, kind: String, n_bytes: Long,
                             width: Long, height: Long, channels: Long)

  /** A decoder turns one payload into (width, height, channels).
    * Real implementations: imageio/ffmpeg behind JNI. */
  type Decoder = Array[Byte] => (Long, Long, Long)

  /** STUB decoder — deterministic fake dimensions from a polynomial hash
    * of the payload bytes (matches graft.text.TextFunctions.polyHash for
    * ASCII payloads, so DuckDB can reproduce it). */
  val stubDecoder: Decoder = { bytes =>
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
    (16 + h % 624, 16 + (h / 624) % 464, 3L)
  }

  /** Synthesizes an asset table from a text corpus (the stand-in for an
    * ingested image/audio bucket): payload = utf-8 bytes, kind cycled by
    * id so each modality path gets traffic. */
  def assetsFromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "utf-8").as("bytes"))

  /** Batch decode: one decoder call per asset, executed per partition —
    * the shape a vectorized/native codec needs (amortized init per
    * partition, no per-row JNI setup). Narrow; no shuffle. */
  def decodeAssets(assets: DataFrame, decoder: Decoder = stubDecoder): Dataset[AssetMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("kind"), col("bytes")).as[Asset]
      .mapPartitions { it =>
        // per-partition codec init would go here
        it.map { a =>
          val (w, h, c) = decoder(a.bytes)
          AssetMeta(a.asset_id, a.kind, a.bytes.length.toLong, w, h, c)
        }
      }
  }

  /** STUB feature extractor: a deterministic `dim`-float vector derived
    * from the payload's polynomial hash (a real implementation embeds
    * with a vision/audio model — same output shape, same plumbing). The
    * result feeds graft.similarity.* directly (see SimilaritySpec). */
  def featureExtractStub(assets: DataFrame, dim: Int = 64): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("kind"), col("bytes")).as[Asset]
      .mapPartitions { it =>
        it.map { a =>
          var h = 0L
          var i = 0
          while (i < a.bytes.length) { h = (h * 31 + (a.bytes(i) & 0xff)) % 1000000007L; i += 1 }
          val vec = Array.tabulate(dim) { d =>
            (((h * (2 * d + 1) + 7919L * d) % 1000000007L) % 2001L - 1000L).toFloat / 1000f
          }
          (a.asset_id, a.kind, vec)
        }
      }
      .toDF("asset_id", "kind", "embedding")
  }

  /** Frame sampling for chunked media: every `stride`-th `frameSize`-byte
    * slice of the payload as its own row — pure column expressions
    * (substr on binary), so it stays in codegen and scales with no
    * driver involvement. */
  def sampleFrames(assets: DataFrame, frameSize: Int, stride: Int): DataFrame =
    assets
      .select(col("asset_id"), col("kind"),
        posexplode(
          transform(
            sequence(lit(0), floor((length(col("bytes")) - 1) / lit(frameSize * stride)).cast("int")),
            i => col("bytes").substr(i * lit(frameSize * stride) + 1, lit(frameSize))))
          .as(Seq("frame_idx", "frame_bytes")))
}
