package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`)
  * covers sort-merge joins whose partition-size stats reveal the skew
  * at runtime; explicit salting remains the tool when the hot keys are
  * known or when the join must stay hash-partitioned end-to-end.
  */
object Skew {

  /** Skew-safe inner equi-join: fact ⋈ dim on `key`, where `dim` is too
    * big to broadcast and `key` is skewed on the fact side.
    *
    * The fact side gets a deterministic salt in [0, buckets) derived by
    * hashing `saltSource` (any fact column(s) roughly unique per row —
    * e.g. the fact's primary key); the dim side is replicated once per
    * salt value; the join key becomes (key, salt). A hot key's rows
    * then spread over `buckets` reducers instead of one straggler.
    * Cost: dim shuffle volume × buckets — size `buckets` to the skew
    * factor, not higher.
    *
    * Result equals the plain inner join (salting only re-routes rows).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int, saltSource: Column): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(buckets.toLong)).cast("int"))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
