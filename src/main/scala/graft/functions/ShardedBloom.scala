package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** One shard's serialized Bloom bytes — either inline (tests, small
  * seen-sets) or a torrent-broadcast handle (the scale path). With
  * handles, the stage binary serialized to every task carries only
  * the tiny `Broadcast` stubs; an executor FETCHES a shard's bytes
  * the first time one of its tasks dereferences that handle, so an
  * executor whose partitions were routed to shards {2, 7} never pulls
  * the other shards' bytes over the wire at all. */
sealed trait ShardBytes extends Serializable { def bytes: Array[Byte] }

final case class InlineShardBytes(bytes: Array[Byte]) extends ShardBytes

final case class BroadcastShardBytes(bc: Broadcast[Array[Byte]])
    extends ShardBytes {
  def bytes: Array[Byte] = bc.value
}

/** A HOST-SHARDED Bloom-filter set, shared executor-side: shard `i`
  * summarizes the seen keys of the hosts hashing to shard `i`, and a
  * probe touches exactly its own shard.
  *
  * Why not one [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
  * literal: at ~9.6 bits/key (fpp 1e-2) a 10⁹-URL seen set is a
  * ~1.2 GB byte array — embedded as a plan LITERAL it is copied by
  * every plan transform/canonicalization on the driver and stringified
  * into plan dumps, the practical ceiling [[graft.ops.Crawl.crawlFrontierBloom]]
  * documents. Here the shards ride the codegen REFERENCE array instead
  * (the [[BpeEncoder]] convention): never a plan literal, so
  * driver-side planning never materializes the probe-ready form.
  *
  * Residency is bounded PER SHARD, twice over:
  *  - each shard deserializes lazily AND INDEPENDENTLY on first probe
  *    of that shard (a per-index CAS slot, not one all-shards lazy
  *    val) — an executor materializes exactly the shards its
  *    partitions probe;
  *  - with [[BroadcastShardBytes]] even the serialized bytes live
  *    behind per-shard broadcast handles, so unprobed shards are
  *    never fetched into the executor at all.
  * Combined with probe-side routing (repartition candidates by the
  * same `pmod(xxhash64(host), shards)` the build used —
  * [[graft.ops.Crawl.crawlFrontierBloomSharded]]), per-executor peak
  * is `ceil(partitions_held / partitions) × set_bytes`, not
  * `set_bytes`: small-heap executors survive the 10⁹-URL design
  * point the single-filter form dies at.
  *
  * Thread safety: shard bytes are read-only; filter slots initialize
  * via CAS (a losing racer's duplicate deserialization is benign —
  * same bytes, same answers). */
final class ShardedBloomSet(val shards: Array[ShardBytes]) extends Serializable {

  /** Inline-bytes convenience (tests, small sets). */
  def this(raw: Array[Array[Byte]]) =
    this(raw.map(InlineShardBytes(_): ShardBytes))

  @transient private lazy val filters =
    new java.util.concurrent.atomic.AtomicReferenceArray[BloomFilter](shards.length)

  private def filter(idx: Int): BloomFilter = {
    val f = filters.get(idx)
    if (f != null) f
    else {
      val nf = BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(shards(idx).bytes))
      if (filters.compareAndSet(idx, null, nf)) nf else filters.get(idx)
    }
  }

  /** Probe shard `idx` for `hash` (an `xxhash64(url_key)` long). */
  def mightContain(idx: Int, hash: Long): Boolean =
    filter(idx).mightContainLong(hash)

  /** Which shards THIS JVM has deserialized — the residency claim's
    * observable (specs pin that routed probes materialize only their
    * own shards). */
  def materializedShards: Seq[Int] =
    (0 until shards.length).filter(i => filters.get(i) != null)
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
