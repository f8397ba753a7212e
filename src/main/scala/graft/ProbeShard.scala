package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-level profiler for the sharded-bloom frontier (not
  * part of the driver contract). */
object ProbeShard {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/tmp/docs_sf1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SHARD $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      System.out.flush()
    }
    val pages = docs.select(col("doc_id"),
      concat(lit("https://h"), col("doc_id") % 500,
        lit(".example.org/d/"), col("doc_id")).as("url"),
      concat(
        lit("<a href=\"https://h"), col("doc_id") % 500,
        lit(".example.org/d/"), col("doc_id") + 500, lit("\">n</a>"),
        lit("<a href=\"https://h"), col("doc_id") % 500,
        lit(".example.org/hub\">h</a>")).as("text"))
    import graft.ops.Crawl
    // stage 1: the seen table build + count + per-shard counts
    val seen = graft.core.Materialize(
      pages.select(graft.functions.PlanSeal.seal(Crawl.urlParts(col("url"))).as("up"))
        .select(md5(col("up.canon_url")).as("url_key"),
          pmod(xxhash64(col("up.host")), lit(8)).cast("int").as("shard"))
        .where(col("url_key").isNotNull).distinct(),
      graft.core.Materialize.Persist)
    time("seen_counts")(seen.groupBy(col("shard")).agg(count(lit(1))).count())
    time("seen_count2")(seen.count())
    val t0 = System.nanoTime()
    (0 until 8).foreach { i =>
      val b = seen.where(col("shard") === i)
        .select(xxhash64(col("url_key")).as("h"))
        .stat.bloomFilter("h", 10000L, 0.01)
      println(s"SHARD filter_$i built bits=${b.bitSize()}")
    }
    println(f"SHARD filters_total ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    seen.unpersist()
    val ranks = spark.createDataFrame(Seq(("h1.example.org", 0.9))).toDF("node", "rank")
    time("full_sharded")(
      Crawl.crawlFrontierBloomSharded(pages, ranks, perHostCap = 10, shards = 8).count())
    time("full_sharded_salted")(
      Crawl.crawlFrontierBloomSharded(pages, ranks, perHostCap = 10, shards = 8,
        probePartitionsPerShard = 4).count())
    time("full_bloom")(
      Crawl.crawlFrontierBloom(pages, ranks, perHostCap = 10).count())
    // residency demonstration: after the shard routing, how many
    // DISTINCT shards does each probe partition carry? per-executor
    // filter residency = union over the partitions it holds, so
    // small per-partition counts = bounded executor heaps at 1e9 URLs
    for (k <- Seq(1, 4)) {
      val routed = Crawl.extractLinks(pages).where(col("link_url").isNotNull)
        .select(col("link_url"), col("link_host"))
        .withColumn("probe_shard", pmod(xxhash64(col("link_host")), lit(8)).cast("int"))
        // salt by URL, exactly as the production routing does — a
        // host-derived salt would keep each host in ONE partition and
        // measure a layout the engine doesn't ship
        .withColumn("probe_salt", pmod(xxhash64(col("link_url")), lit(k)).cast("int"))
      val parts =
        (if (k == 1) routed.repartition(8, col("probe_shard"))
         else routed.repartition(8 * k, col("probe_shard"), col("probe_salt")))
          .select("probe_shard").rdd.mapPartitionsWithIndex { (i, it) =>
            val s = scala.collection.mutable.SortedSet[Int]()
            it.foreach(r => s += r.getInt(0))
            Iterator((i, s.size, s.mkString("+")))
          }.collect()
      val occupied = parts.filter(_._2 > 0)
      println(s"SHARD residency k=$k parts=${parts.length} " +
        s"occupied=${occupied.length} maxShardsPerPart=${parts.map(_._2).max} " +
        occupied.map { case (i, n, s) => s"p$i:[$s]" }.mkString(" "))
    }
    spark.stop()
  }
}
