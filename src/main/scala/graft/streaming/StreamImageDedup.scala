package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Dedup

/** Streaming perceptual IMAGE dedup: the ingest-side dHash gate a
  * multimodal pipeline runs before frames/images land in the training
  * corpus — the image twin of [[StreamNearDedup]] (text MinHash). Each
  * micro-batch is (1) deduped within itself (greedy min-asset_id via
  * [[Dedup.dhashSurvivors]]), (2) deduped against the persisted
  * signature index of everything previously admitted
  * ([[Dedup.dhashIncremental]]), and (3) its survivors appended — media
  * to the corpus, 8-byte signatures to the index.
  *
  * Scale design: the cross-corpus step never re-reads or re-decodes
  * admitted MEDIA — the index carries one long per admitted image
  * (vs ~KB-MB of media bytes: the index is ~0.001% of corpus volume),
  * and the band-key equi-join shuffles only the batch side plus touched
  * postings. Decode happens exactly once per arriving asset, scan-side.
  *
  * Replay contract — the [[StreamNearDedup]] discipline verbatim: both
  * outputs are partitioned by `_batch` with dynamic partition overwrite,
  * and the index read excludes `_batch >= batchId` (partition-pruned),
  * so a replayed micro-batch sees exactly the index state earlier
  * batches produced, re-derives the identical admitted set, and
  * rewrites its own partition. Without the pruned read a replayed batch
  * would find its own signatures and drop everything as self-duplicate.
  *
  * Non-image assets (garbage, audio, undecodable, sub-9x8) hash to NULL
  * and PASS THROUGH to the corpus unexamined — this gate dedups images,
  * media classification/garbage policy belongs upstream.
  */
object StreamImageDedup {

  /** One micro-batch of the filter; exposed for direct testing. */
  def dedupBatch(batch: DataFrame, batchId: Long, corpusDir: String,
                 indexDir: String, maxHamming: Int = 3, blocks: Int = 4,
                 maxBucket: Int = 1000): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val b = batch.localCheckpoint(true) // pin: read multiple times below
    val local = Dedup.dhashSurvivors(b, maxHamming, blocks, maxBucket)
      .localCheckpoint(true) // sigs + anti-join + write below
    val sigs = local.select(col("asset_id"),
      graft.expr.Exprs.dhash64(col("media")).as("sig"))
      .where(col("sig").isNotNull)
    // existence-checked, never exception-guessed (the StreamNearDedup
    // round-6 lesson: a catch-all would swallow storage errors and admit
    // the batch without cross-corpus dedup)
    val indexPath = new org.apache.hadoop.fs.Path(indexDir)
    val fs = indexPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val index =
      if (fs.exists(indexPath))
        spark.read.parquet(indexDir).where(col("_batch") < batchId)
      else // first batch: no index yet
        sigs.limit(0).withColumn("_batch", lit(0L))
    val hits = Dedup.dhashIncremental(sigs, index, maxHamming, blocks, maxBucket)
    val dropIds = hits.select(col("new_id").as("asset_id")).distinct()
    val survivors = local.join(dropIds, Seq("asset_id"), "left_anti")
      .localCheckpoint(true) // materialize before touching output dirs
    writeDynamic(survivors.withColumn("_batch", lit(batchId)), corpusDir)
    writeDynamic(
      survivors.select(col("asset_id"),
          graft.expr.Exprs.dhash64(col("media")).as("sig"))
        .where(col("sig").isNotNull)
        .withColumn("_batch", lit(batchId)),
      indexDir)
  }

  private def writeDynamic(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode("overwrite").partitionBy("_batch").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Start the resident filter over a streaming (asset_id, media) frame. */
  def start(assets: DataFrame, corpusDir: String, indexDir: String,
            checkpointDir: String, maxHamming: Int = 3, blocks: Int = 4,
            maxBucket: Int = 1000): StreamingQuery =
    assets.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        dedupBatch(batch, batchId, corpusDir, indexDir, maxHamming, blocks, maxBucket)
      }
      .start()

  /** Read the admitted corpus (internal batch column dropped). */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(corpusDir).drop("_batch")
}
