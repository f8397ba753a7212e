package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** A HOST-SHARDED Bloom-filter set, shared executor-side: shard `i`
  * summarizes the seen keys of the hosts hashing to shard `i`, and a
  * probe touches exactly its own shard.
  *
  * Why not one [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
  * literal: at ~9.6 bits/key (fpp 1e-2) a 10⁹-URL seen set is a
  * ~1.2 GB byte array — embedded as a plan LITERAL it is copied by
  * every plan transform/canonicalization on the driver and stringified
  * into plan dumps, the practical ceiling [[graft.ops.Crawl.crawlFrontierBloom]]
  * documents. Here the serialized shards ride the codegen REFERENCE
  * array instead (the [[BpeEncoder]] convention): one Java-serialized
  * object per stage binary, never a plan literal — and each shard
  * deserializes lazily ON FIRST PROBE per executor, so driver-side
  * planning never materializes the probe-ready form at all. Build-side
  * peak allocation is one SHARD's filter, not the whole set's.
  *
  * Thread safety: the byte arrays are read-only; the lazy filter array
  * is initialized under the JVM's lazy-val lock and read-only after.
  */
final class ShardedBloomSet(val shards: Array[Array[Byte]]) extends Serializable {
  @transient private lazy val filters: Array[BloomFilter] =
    shards.map(b => BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))

  /** Probe shard `idx` for `hash` (an `xxhash64(url_key)` long). */
  def mightContain(idx: Int, hash: Long): Boolean =
    filters(idx).mightContainLong(hash)
}

/** Native probe expression: `(shard_idx INT, key_hash LONG) ->
  * BOOLEAN` against a fixed [[ShardedBloomSet]]. The shard index is a
  * CHILD expression (`pmod(xxhash64(host), n)` built from standard
  * functions), so the routing hash is Spark's own xxhash64 on both the
  * build and probe side by construction — no hash reimplementation to
  * drift. Codegen is a single virtual call; the expression stays
  * inside whole-stage codegen. */
case class ShardedBloomMightContain(
    left: Expression, right: Expression, blooms: ShardedBloomSet)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (int shard_idx, long hash), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_sharded_bloom_might_contain"

  override def nullSafeEval(idx: Any, hash: Any): Any =
    blooms.mightContain(idx.asInstanceOf[Int], hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shardedBlooms", blooms,
      classOf[ShardedBloomSet].getName)
    nullSafeCodeGen(ctx, ev, (i, h) => s"${ev.value} = $ref.mightContain($i, $h);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShardedBloomMightContain =
    copy(left = newLeft, right = newRight)
}
