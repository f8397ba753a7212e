package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for CPU-heavy per-row pipelines.
  *
  * A parquet scan's split count is bounded by its row groups: a corpus
  * written as one small file yields a ONE-task scan stage, and any
  * expensive generator pipeline stacked on it (tokenize → shingle →
  * hash, all narrow) serializes onto that single task no matter how
  * many cores the cluster has — measured 149 s single-task vs ~10 s
  * for the same work spread over 32 threads.
  *
  * [[ensure]] round-robin-repartitions the (cheap, raw) input up to
  * the cluster's default parallelism ONLY when the scan is under-split
  * by 2x or more. On a 100 TB corpus with thousands of splits it is a
  * no-op — the guard costs one plan inspection, not a shuffle. When it
  * does fire, it shuffles input bytes once, which the downstream
  * per-row work (regex + k hashes per token) dwarfs.
  */
object Parallelism {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val current = df.rdd.getNumPartitions // physical planning only, no job
    if (current * 2 <= target) df.repartition(target) else df
  }
}
