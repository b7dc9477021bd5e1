package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media assets are
  * opaque `binary` columns + typed metadata; decode / feature-extraction
  * runs per-partition so decoder state (a codec, a model) is initialized
  * once per task, not per row — the Scala analog of a Pandas-UDF batch.
  *
  * The actual decoders are NOT available in this environment (no image /
  * audio libs), so [[decodeStub]] is a clearly-marked deterministic fake;
  * the Spark-side plumbing — schema, batch shape, partition sizing — is
  * real and tested.
  */
object Multimodal {

  /** An ingested asset: payload + metadata the pipeline carries along. */
  case class Asset(asset_id: Long, payload: Array[Byte], format: String, n_bytes: Long)

  /** Fixed-size fake "feature vector" per asset. */
  case class AssetFeatures(asset_id: Long, n_bytes: Long, features: Array[Float])

  /** Attach binary payload + metadata columns to a text-keyed table (the
    * harness has no real media files; text bytes stand in for the blob).
    */
  def withPayloadMeta(df: DataFrame): DataFrame =
    df.withColumn("payload", col("text").cast("binary"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("format", lit("text/plain"))

  /** STUB decode / feature-extract. Real implementation would open a codec
    * per partition and decode each payload; here the "features" are a
    * deterministic hash-derived vector so tests are stable. Marked clearly:
    * replace the body of `fakeDecode` with a real decoder when the codec
    * libraries are available.
    */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 8): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition init would go here (codec / model handle)
      it.map { a =>
        AssetFeatures(a.asset_id, a.n_bytes, fakeDecode(a.payload, dim))
      }
    }
  }

  /** STUB: deterministic stand-in for a media decoder (NOT a real decode). */
  private[graft] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      out(j) = (h % 1000).toFloat / 1000.0f
      j += 1
    }
    out
  }
}
