package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Everything keys off a content-independent md5 of the row's id, so
  * (a) assignment is stable across runs, engines, and cluster layouts
  * (no rand(), no partition-dependent sampling), and (b) any engine
  * can reproduce the exact assignment — which is what the DuckDB
  * oracle checks. At 100 TB both operators are embarrassingly
  * parallel; stratified sampling shuffles once on the stratum key.
  */
object Sampling {

  /** Uniform bucket in [0, 100) from the id's md5 prefix (16 bits →
    * bias < 2^-9, identical hex/parse semantics in any engine). */
  private def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 100

  /** Train/val/test split: deterministic md5-bucket assignment.
    * Fractions are integer percentages summing to <= 100 (remainder →
    * test). */
  def trainValTest(df: DataFrame, idCol: String, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split $trainPct/$valPct")
    val b = hashBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Stratified deterministic sample: keep up to `perStratum` rows per
    * stratum, chosen by md5 order (a stable "random" order any engine
    * reproduces), ties broken by id. One shuffle on the stratum key. */
  def stratified(df: DataFrame, stratumCol: String, idCol: String, perStratum: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(stratumCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("int"))
      .filter(col("sample_rank") <= perStratum)
  }
}
