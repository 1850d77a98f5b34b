package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch-decoded per partition.
  *
  * The decode kernels are STUBBED (deterministic fakes — the image/audio
  * codecs aren't in this container); the Spark-side contract is real:
  * schema, partition-level batching (decoder context built once per
  * partition, the Scala analogue of a mapInPandas batch), and the
  * feature-struct output shape downstream ops consume.
  */
object Multimodal {

  final case class MediaRow(media_ref: String, media_type: String, payload: Array[Byte])
  final case class MediaFeatures(media_ref: String, media_type: String,
                                 width: Int, height: Int, n_frames: Int,
                                 feature: Array[Float])

  /** Deterministic fake payloads for media refs (stands in for a blob-store
    * fetch; payload bytes derive from the ref hash). */
  def synthPayloads(spark: SparkSession, refs: DataFrame, refCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    refs.select(col(refCol).cast("string")).as[String].map { ref =>
      val h = ref.hashCode
      val mt = math.abs(h) % 3 match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val bytes = Array.tabulate(64 + math.abs(h % 64))(i => ((h >> (i % 24)) & 0xff).toByte)
      MediaRow(ref, mt, bytes)
    }
  }

  /** STUB decode kernel — a real deployment swaps `FakeCodec` for an actual
    * codec; everything around it (batching, schema, determinism) stays. */
  final class FakeCodec extends Serializable {
    def decode(r: MediaRow): MediaFeatures = {
      val h = java.util.Arrays.hashCode(r.payload)
      val w = 16 + math.abs(h % 1024)
      MediaFeatures(r.media_ref, r.media_type,
        width = w, height = 16 + math.abs((h >> 10) % 1024),
        n_frames = if (r.media_type == "video") 1 + math.abs(h % 300) else 1,
        feature = Array.tabulate(8)(i => ((h >> i) % 97) / 97.0f))
    }
  }

  /** Batched decode/feature-extract: one codec instance per partition
    * (model/codec init cost amortized over the partition, like mapInPandas
    * batches). */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val codec = new FakeCodec // per-partition init
      it.map(codec.decode)
    }
  }

  /** Frame sampling plumbing for video rows: explode a deterministic frame
    * index selection (every `stride`-th frame). */
  def sampleFrames(features: DataFrame, stride: Int = 30): DataFrame =
    features.filter(col("media_type") === "video")
      .select(col("media_ref"), explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
}
