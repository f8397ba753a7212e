package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Similarity

/** Streaming ANN index maintenance: watch a directory for JSONL
  * embedding arrivals and keep the IVF+PQ serving tables fresh — the
  * embedding-side sibling of [[CorpusWatcher]] (which maintains the
  * inverted index the same way; reference trigger:
  * `filladdtrigger/main.py:5-22`).
  *
  * Train-once / serve-many made ONLINE: the coarse centroids and PQ
  * codebooks under `artifactsDir` stay FROZEN (one offline training
  * run, [[Similarity.kmeansModel]] / [[Similarity.pqModel]]); each
  * micro-batch encodes only its own vectors against them
  * ([[Similarity.encodeWithModel]] — two broadcast argmax joins, cost
  * linear in the batch, zero in the accumulated corpus) and appends
  * per-batch `batch_id=N` partitions to the assignment and code
  * tables. [[Similarity.ivfpqSearch]] / the `graft_ann_search` TVF
  * over the accumulated dirs then serve the fresh corpus with no
  * retraining and no raw-embedding scan. Retraining the quantizers
  * shifts every stored code, so it is an offline rebuild that swaps
  * `artifactsDir`, never an ingest-path step.
  *
  * Idempotence contract (same as [[CorpusWatcher.startJsonl]]'s
  * quarantine): per-batch partition dirs in overwrite mode — a batch
  * that fails mid-write and replays overwrites its own partitions
  * instead of appending duplicates. Rows that fail the envelope
  * (null `vec_id` or `embedding`) quarantine as JSON lines rather
  * than poisoning the encode.
  */
object EmbeddingIndexer {

  /** Start watching `watchDir` for JSONL embedding files
    * (`{"vec_id": 1, "embedding": [..]}` per line).
    *
    * @param artifactsDir parquet dirs `coarse_centroids` (cell_id,
    *   pos, centroid_v) and `codebooks` (subspace, cell_id, pos,
    *   centroid_v) — [[Similarity.kmeansModel]] / [[Similarity.pqModel]]
    *   output, written once by the offline training job
    * @param assignmentsDir accumulates (vec_id, cell_id, cos) under
    *   batch_id partitions — [[Similarity.ivfpqSearch]]'s inverted lists
    * @param codesDir accumulates (vec_id, subspace, code, d2) —
    *   the ADC scan table
    * @param m subspace count the codebooks were trained with
    * @param residual set when the stored artifacts are RESIDUAL-trained
    *   ([[Similarity.ivfpqResidualModel]]): encode subtracts each
    *   vector's coarse centroid before coding
    *   ([[Similarity.residualEncodeWithModel]]). The flag must match
    *   how the artifacts were trained — mixing frames would silently
    *   mis-code, which is why both artifact sets carry the same
    *   schemas but come from distinct model calls.
    */
  def startJsonl(
      spark: SparkSession,
      watchDir: String,
      artifactsDir: String,
      assignmentsDir: String,
      codesDir: String,
      checkpointDir: String,
      quarantineDir: String,
      m: Int = 4,
      residual: Boolean = false,
      availableNow: Boolean = true): StreamingQuery = {
    val emb = spark.readStream
      .format("json")
      .schema("vec_id BIGINT, embedding ARRAY<DOUBLE>")
      .load(watchDir)
    val writer = emb.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val session = batch.sparkSession
        val bad = batch.filter(col("vec_id").isNull || col("embedding").isNull)
          .select(to_json(struct(col("vec_id"), col("embedding"))).as("raw"))
        bad.write.mode("overwrite").parquet(s"$quarantineDir/batch_id=$batchId")
        // the batch feeds two encode scans (coarse + PQ): persist so
        // the JSON source is read once, release after both writes
        val clean = batch.filter(col("vec_id").isNotNull && col("embedding").isNotNull)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val encode =
          if (residual) Similarity.residualEncodeWithModel _
          else Similarity.encodeWithModel _
        val (assign, codes) = encode(
          clean,
          session.read.parquet(s"$artifactsDir/coarse_centroids"),
          session.read.parquet(s"$artifactsDir/codebooks"),
          m)
        assign.write.mode("overwrite").parquet(s"$assignmentsDir/batch_id=$batchId")
        codes.write.mode("overwrite").parquet(s"$codesDir/batch_id=$batchId")
        clean.unpersist(blocking = false)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
