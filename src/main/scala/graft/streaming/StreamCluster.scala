package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Similarity

/** Streaming embedding-cluster gate — [[Similarity.kmeansAssignFromIndex]]
  * as a resident query against a PERSISTED k-means index (cluster once,
  * assign forever — the saveLm/IVF discipline): vectors arrive on a
  * stream, each micro-batch assigns to its nearest training centroid,
  * and the batch splits:
  *
  *  - in-distribution vectors (dist² within the cluster's TRAINING
  *    radius) land in the corpus with their (cluster, dist2) coordinates
  *    — the cluster-balanced-sampling input;
  *  - OUTLIERS (beyond any training radius, or unassignable) go to
  *    quarantine: an embedding the training corpus never came near is
  *    exactly what a drift/poisoning review wants to see first.
  *
  * Assignment is per-vector against bounded broadcast state, so the gate
  * is STATELESS across batches; exactly-once comes from the `_batch`
  * dynamic-overwrite ledger discipline ([[StreamChat]] contract). */
object StreamCluster {

  /** One micro-batch against a LOADED index (the resident path — the
    * index is immutable while the query runs, so it is read once in
    * [[start]], never per batch). */
  def gateBatchWith(batch: DataFrame, batchId: Long,
                    idx: Similarity.KmeansIndex, corpusDir: String,
                    quarantineDir: String, idCol: String = "vec_id",
                    vecCol: String = "embedding"): Unit = {
    if (batch.isEmpty) return
    val assigned = Similarity
      .assignAgainstIndex(batch, idx, idCol, vecCol)
      .localCheckpoint(true) // read twice below
    StreamMediaDedup.writeDynamic(
      assigned.where(!col("outlier")).drop("outlier")
        .withColumn("_batch", lit(batchId)), corpusDir)
    StreamMediaDedup.writeDynamic(
      assigned.where(col("outlier")).drop("outlier")
        .withColumn("_batch", lit(batchId)), quarantineDir)
  }

  /** One-shot form for batch/replay callers: loads the index first. */
  def gateBatch(batch: DataFrame, batchId: Long, indexPath: String,
                corpusDir: String, quarantineDir: String,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): Unit =
    gateBatchWith(batch, batchId,
      Similarity.loadKmeansIndex(batch.sparkSession, indexPath),
      corpusDir, quarantineDir, idCol, vecCol)

  /** Start the resident gate over a streaming embedding frame. The
    * index loads ONCE here and every micro-batch closes over it. */
  def start(vecs: DataFrame, indexPath: String, corpusDir: String,
            quarantineDir: String, checkpointDir: String,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): StreamingQuery = {
    val idx = Similarity.loadKmeansIndex(vecs.sparkSession, indexPath)
    vecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        gateBatchWith(batch, batchId, idx, corpusDir, quarantineDir,
          idCol, vecCol)
      }
      .start()
  }

  /** Admitted vectors with their cluster coordinates. */
  def corpus(spark: SparkSession, corpusDir: String): DataFrame =
    spark.read.parquet(corpusDir).drop("_batch")

  /** The outlier quarantine. */
  def quarantine(spark: SparkSession, quarantineDir: String): DataFrame =
    spark.read.parquet(quarantineDir).drop("_batch")
}
