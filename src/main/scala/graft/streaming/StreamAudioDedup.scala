package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Dedup

/** Streaming perceptual AUDIO dedup: the ingest-side gate for audio
  * clips — the audio twin of [[StreamImageDedup]], catching the
  * volume-scaled and container-rewrapped copies exact byte dedup cannot
  * see before they land in the training corpus. The batch/index/replay
  * discipline lives in [[StreamMediaDedup]]; this front contributes the
  * energy-envelope hash ([[graft.expr.Exprs.ahash64]]) and
  * [[Dedup.ahashSurvivors]].
  *
  * Non-audio assets (garbage, images, sub-65-sample clips) hash to NULL
  * and PASS THROUGH to the corpus unexamined — this gate dedups audio,
  * media classification/garbage policy belongs upstream.
  */
object StreamAudioDedup {

  /** One micro-batch of the filter; exposed for direct testing. */
  def dedupBatch(batch: DataFrame, batchId: Long, corpusDir: String,
                 indexDir: String, maxHamming: Int = 3, blocks: Int = 4,
                 maxBucket: Int = 1000): Unit =
    StreamMediaDedup.dedupBatch(batch, batchId, corpusDir, indexDir,
      graft.expr.Exprs.ahash64,
      b => Dedup.ahashSurvivors(b, maxHamming, blocks, maxBucket),
      maxHamming, blocks, maxBucket)

  /** Start the resident filter over a streaming (asset_id, media) frame. */
  def start(assets: DataFrame, corpusDir: String, indexDir: String,
            checkpointDir: String, maxHamming: Int = 3, blocks: Int = 4,
            maxBucket: Int = 1000): StreamingQuery =
    StreamMediaDedup.start(assets, corpusDir, indexDir, checkpointDir,
      graft.expr.Exprs.ahash64,
      b => Dedup.ahashSurvivors(b, maxHamming, blocks, maxBucket),
      maxHamming, blocks, maxBucket)

  /** Read the admitted corpus (internal batch column dropped). */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame =
    StreamMediaDedup.corpus(spark, corpusDir)
}
