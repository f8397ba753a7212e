package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the IEEE-754 sortable-key twist backing
  * [[TopKByScore]]'s double-score mode — pure JVM, no Spark session.
  * The heap's correctness rests entirely on two facts checked here over
  * 200k seeded-random bit patterns plus the structural edge cases:
  * signed-long comparison of keys matches double comparison, and the
  * encoding round-trips bit-exactly.
  */
class SortableKeyPropertySpec extends AnyFunSuite {

  private val edge = Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
    Double.PositiveInfinity, Double.NegativeInfinity, Double.MaxValue, Double.MinValue,
    1e-310, -1e-310, 1.0, -1.0, math.Pi, -math.Pi)

  // random IEEE bit patterns hit subnormals/exponent extremes that a
  // uniform [min,max] draw never reaches
  private def samples: Iterator[Double] = {
    val rnd = new scala.util.Random(97)
    edge.iterator ++ Iterator.fill(200000)(
      java.lang.Double.longBitsToDouble(rnd.nextLong())).filterNot(_.isNaN)
  }

  test("key comparison agrees with java.lang.Double.compare") {
    val xs = samples.toArray
    var i = 1
    while (i < xs.length) {
      val (a, b) = (xs(i - 1), xs(i))
      val keyCmp = java.lang.Long.compare(
        TopKByScore.sortableDoubleKey(a), TopKByScore.sortableDoubleKey(b))
      val dblCmp = java.lang.Double.compare(a, b)
      assert(Integer.signum(keyCmp) === Integer.signum(dblCmp),
        s"ordering mismatch for $a vs $b")
      i += 1
    }
  }

  test("encoding is a bit-exact involution") {
    samples.foreach { a =>
      val back = TopKByScore.doubleFromSortableKey(TopKByScore.sortableDoubleKey(a))
      assert(java.lang.Double.doubleToRawLongBits(back) ===
        java.lang.Double.doubleToRawLongBits(a), s"round-trip changed $a")
    }
  }
}
