package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (sbt forks a single
  * test JVM; Spark startup is ~5 s, so suites must not each build one).
  * Config mirrors Bench/Verify: nanos-as-long for the events table and
  * the InferFiltersFromGenerate exclusion (see Bench.scala).
  *
  * `SparkSpec.spark` is a stable identifier, so suites can
  * `import SparkSpec.spark.implicits._` at the top of the file.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // see Bench.scala: "formatted" UI plan descriptions walk deep
      // staged plan trees super-linearly, per action
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Base class: shared session + suite-scoped temp dirs. */
abstract class SparkSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark

  private val tempDirs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

  /** A temp directory deleted RECURSIVELY in afterAll — deleteOnExit
    * alone never removes a dir that tests wrote trees under (it only
    * deletes empty dirs), so each run would leak one. */
  protected def tempDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tempDirs.synchronized { tempDirs += p }
    p
  }

  override protected def afterAll(): Unit = {
    import scala.jdk.CollectionConverters._
    tempDirs.synchronized(tempDirs.toVector).foreach { p =>
      try {
        val walk = java.nio.file.Files.walk(p)
        try walk.iterator().asScala.toVector.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      } catch { case _: java.io.IOException => () }
    }
    super.afterAll()
  }
}
