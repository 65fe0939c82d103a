package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** SHARDED Bloom-filter membership — the carrier that takes the
  * bloom-pruned frontier anti-join past the single-filter size ceiling:
  * one monolithic filter for a ~10⁹-URL crawled set needs ~GBs of bits,
  * which neither one `Literal` nor the `maxNumBits` clamp allows, but K
  * hash-prefix shards (shard = `floorMod(xxhash64(url), K)`) are each
  * independently bounded, each sized for `n/K` keys, and a candidate
  * probes exactly ONE shard scan-side — the per-row work is identical
  * to the monolithic form (one hash, one filter probe). What sharding
  * does NOT lift is the TOTAL resident size: all K shards live in every
  * executor's heap (~n·ln(1/fpp)/(8·ln²2) bytes — ~1.8 GB at 10⁹ keys
  * / fpp 0.001, ~18 GB at 10¹⁰), so the family is scoped to ~10⁹ keys
  * at default fpp and the builder
  * ([[graft.pipeline.UrlOps.crawledUrlBloomShards]]) REFUSES past its
  * configurable total-bytes bound; the next decade probes an at-rest
  * bucketed membership store via a co-partitioned join instead.
  *
  * One-sided-error argument, per shard: every crawled URL was inserted
  * into the shard its hash selects, and a candidate probes that same
  * shard, so a MISS is definitive (no false negatives) and the overall
  * false-positive rate is the per-shard fpp — the
  * [[graft.pipeline.UrlOps.freshViaBloom]] pruning argument survives
  * sharding unchanged, for any K.
  *
  * The shards travel as ONE reference object (the [[MatVecFloor]]
  * `addReferenceObj` discipline): deserialized driver-side once,
  * shipped to executors inside the broadcast task binary — never as K
  * literal CASE arms (the r15 Janino-overflow class) and never
  * re-parsed per row. Child is the 64-bit hash (`xxhash64(url)` — the
  * same value inserted at build time by
  * [[graft.pipeline.UrlOps.crawledUrlBloomShards]]).
  */
object ShardedBloomKernel {
  /** True iff the shard selected by `floorMod(hash, K)` might contain
    * `hash`. K = filters.length ≥ 1.
    */
  def mightContain(filters: Array[BloomFilter], hash: Long): Boolean =
    filters(java.lang.Math.floorMod(hash, filters.length.toLong).toInt)
      .mightContainLong(hash)
}

/** `sharded_bloom_might_contain(hash)` over an embedded shard family —
  * see [[ShardedBloomKernel]]. NULL in, NULL out.
  */
case class ShardedBloomMightContain(child: Expression, shardBytes: Array[Array[Byte]])
    extends UnaryExpression {
  require(shardBytes != null && shardBytes.nonEmpty && shardBytes.forall(_.nonEmpty),
    "sharded_bloom_might_contain: empty shard family")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sharded_bloom_might_contain"

  // analysis-time, not construction-time: the child is unresolved until
  // the analyzer runs (the KmvDistinct checkInputDataTypes discipline)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sharded_bloom_might_contain: child must be the BIGINT xxhash64, got $other")
    }

  // parsed once driver-side; executors receive the parsed filters via
  // task-binary java serialization (BloomFilterImpl is Serializable)
  private lazy val filters: Array[BloomFilter] =
    shardBytes.map(b => BloomFilter.readFrom(new ByteArrayInputStream(b)))

  override def nullSafeEval(hash: Any): Any =
    ShardedBloomKernel.mightContain(filters, hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shardFilters", filters,
      "org.apache.spark.util.sketch.BloomFilter[]")
    nullSafeCodeGen(ctx, ev, h => s"""
      ${ev.value} = graft.functions.ShardedBloomKernel.mightContain($ref, $h);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShardedBloomMightContain {
  def of(hash: Column, shardBytes: Array[Array[Byte]]): Column =
    GraftSqlBridge.column(
      ShardedBloomMightContain(GraftSqlBridge.expression(hash), shardBytes))
}
