package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document MinHash signature scanner — computes, from a
  * TOKEN array, all `k` signatures plus the distinct-shingle count in
  * one row-local pass:
  *
  *   - shingles: windows of `w` tokens joined by single spaces; a doc
  *     with fewer than `w` tokens contributes ONE shingle of all its
  *     tokens joined (the [[graft.ops.Dedup.shinglesFromTokens]]
  *     degenerate contract — every doc has at least one shingle,
  *     possibly `""`),
  *   - `sigs[s]` = the 32-char lowercase hex md5 of `s ++ ":" ++
  *     shingle`, minimized lexicographically over the doc's shingles —
  *     hex lexicographic order IS unsigned digest-byte order, so the
  *     min is tracked on raw digests and only the k winners are
  *     hex-encoded,
  *   - `n_sh` = the doc's DISTINCT shingle count (the length-ratio
  *     prefilter's Jaccard bound).
  *
  * Value-identical to the aggregate formulation
  * `groupBy(doc_id).agg(min(md5(concat(lit("s:"), shingle))) …)` over
  * the exploded shingle stream (duplicate shingles cannot change a
  * min) — the parity spec pins it — but PLAN-level better, not just
  * constant-factor better: signatures become a row-parallel
  * projection, so the explode, the per-occurrence rows, and the
  * groupBy SHUFFLE disappear from every MinHash consumer (bands,
  * candidate pairs, near-dup losers, the curation chain, the
  * streaming gate). Per-shingle work is the same k digests, now over
  * reused byte buffers instead of per-row interpreted concat/md5/min
  * expression trees.
  *
  * Output: `struct<sigs: array<string>, n_sh: int>`; null tokens
  * array → null.
  */
case class MinHashSigs(child: Expression, w: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1, s"w=$w must be >= 1")
  require(k >= 1, s"k=$k must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("sigs", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("n_sh", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  @transient private lazy val seedPrefixes: Array[Array[Byte]] =
    (0 until k).map(s => s"$s:".getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      // tokens are non-null by construction (TextNorm.tokens filters)
      toks(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = Array.fill(k)(null: Array[Byte])
    val seen = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder()

    def feedShingle(from: Int, len: Int): Unit = {
      // distinct count: the shingle as a string key (exact, the
      // array_distinct contract)
      sb.setLength(0)
      var j = 0
      while (j < len) {
        if (j > 0) sb.append(' ')
        sb.append(new String(toks(from + j), "UTF-8"))
        j += 1
      }
      seen.add(sb.toString)
      var s = 0
      while (s < k) {
        md.reset()
        md.update(seedPrefixes(s))
        var t = 0
        while (t < len) {
          if (t > 0) md.update(' '.toByte)
          md.update(toks(from + t))
          t += 1
        }
        val d = md.digest()
        val cur = mins(s)
        if (cur == null || unsignedLess(d, cur)) mins(s) = d
        s += 1
      }
    }

    if (n < w) feedShingle(0, n)
    else {
      var p = 0
      val last = n - w
      while (p <= last) { feedShingle(p, w); p += 1 }
    }
    val hex = "0123456789abcdef".toCharArray
    val sigs: Array[Any] = mins.map { d =>
      val out = new Array[Byte](32)
      var j = 0
      while (j < 16) {
        out(2 * j) = hex((d(j) & 0xf0) >> 4).toByte
        out(2 * j + 1) = hex(d(j) & 0x0f).toByte
        j += 1
      }
      UTF8String.fromBytes(out)
    }
    InternalRow(new GenericArrayData(sigs), seen.size)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
  override def prettyName: String = "minhash_sigs"
}

object MinHashSigs {
  /** `struct(sigs, n_sh)` over a token-array column. */
  def of(tokens: Column, w: Int, k: Int): Column =
    GraftSqlBridge.column(MinHashSigs(GraftSqlBridge.expression(tokens), w, k))
}
