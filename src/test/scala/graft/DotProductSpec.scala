package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.plans.GraftExtensions
import SparkSpec.spark.implicits._

class DotProductSpec extends SparkSpec {

  test("native dot product is bit-identical to the HOF fold (100 random vectors)") {
    val rnd = new scala.util.Random(42) // seeded: reproducible
    val cases = (1 to 100).map { _ =>
      val n = 1 + rnd.nextInt(64)
      (Seq.fill(n)(rnd.nextDouble() * 20 - 10), Seq.fill(n)(rnd.nextDouble() * 20 - 10))
    }
    val rows = cases.toDF("a", "b").select(
      VectorFunctions.dotp(col("a"), col("b")),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    ).as[(Double, Double)].collect()
    rows.foreach { case (native, hof) =>
      // bit-identical, not approximately equal: same fold order
      assert(java.lang.Double.doubleToLongBits(native) ===
        java.lang.Double.doubleToLongBits(hof))
    }
  }

  test("null array yields null") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    val got = df.select(VectorFunctions.dotp(col("a"), col("b"))).as[Option[Double]].head()
    assert(got.isEmpty)
  }

  test("length-mismatched arrays yield null, not a truncated score") {
    import org.apache.spark.sql.functions.col
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 1.0))).toDF("a", "b")
    val got = df.select(graft.functions.VectorFunctions.dotp(col("a"), col("b")))
      .as[Option[Double]].head()
    assert(got === None)
  }

  test("graft_dot is SQL-callable after extension install") {
    GraftExtensions.install(spark)
    val got = spark.sql("SELECT graft_dot(array(1d, 2d, 3d), array(4d, 5d, 6d))")
      .as[Double].head()
    assert(got === 32.0)
  }

  test("float embeddings cast then dot: matches manual computation") {
    val df = Seq((Seq(0.5f, 0.25f), Seq(4.0f, 8.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.dotp(
      col("a").cast("array<double>"), col("b").cast("array<double>"))).as[Double].head()
    assert(got === 4.0)
  }
}
