package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain` over a Spark BROADCAST Bloom filter.
  *
  * The eager Bloom probe ([[graft.ext.Dedup.bloomProbeEager]]) embeds
  * the serialized filter as a plan `Literal` — fine at kilobyte
  * sizes, but the literal is duplicated in the serialized plan per
  * referencing branch (the admission split references the probe in
  * two complement filters) and, in a streaming gate, re-shipped with
  * EVERY micro-batch's plan. Near the 256 MB sizing cap that is
  * pathological (ADVICE r9). This expression carries only the
  * broadcast HANDLE in the plan; the bytes move via torrent broadcast
  * once per executor lifetime, and deserialization is memoized per
  * broadcast id in an executor-local cache, so neither shipping nor
  * `BloomFilter.readFrom` is paid per task.
  *
  * Child is the 64-bit hash of the probed value (XxHash64, matching
  * the build side); null hash → null, like Spark's own
  * `BloomFilterMightContain`. Codegen'd via `addReferenceObj` — the
  * probe call stays inside whole-stage codegen.
  */
case class BloomMightContainBroadcast(bc: Broadcast[Array[Byte]],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain_bc needs a bigint hash child, got ${dt.catalogString}")
    }

  /** Executor-side probe — public so generated code can call it. */
  def probe(h: Long): Boolean =
    BloomMightContainBroadcast.filterFor(bc).mightContainLong(h)

  override def nullSafeEval(h: Any): Any = probe(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", this,
      classOf[BloomMightContainBroadcast].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBroadcast =
    copy(child = newChild)
}

object BloomMightContainBroadcast {
  /** Deserialized filters per broadcast id, executor-lifetime. Bounded:
    * a session cycling through many distinct large Blooms clears the
    * whole map rather than growing it (refilling is one readFrom per
    * executor, not per task — the cost being bounded is the point).
    */
  private val MaxCached = 64
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Long, BloomFilter]()

  private[functions] def filterFor(bc: Broadcast[Array[Byte]]): BloomFilter = {
    if (cache.size > MaxCached) cache.clear()
    cache.computeIfAbsent(bc.id,
      _ => BloomFilter.readFrom(new ByteArrayInputStream(bc.value)))
  }
}
