package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(hash)` over a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] (the public sketch API
  * behind `DataFrameStatFunctions.bloomFilter`), carried into the plan as
  * its serialized bytes. The probe is the map-side membership prefilter
  * of [[graft.ops.Dedup.dedupIncremental]]: rows whose hash is
  * definitely-absent from the filter skip the exact-confirm join (and
  * its shuffle) entirely; `mightContain = true` rows — true hits plus
  * the filter's false-positive rate — proceed to the join, so results
  * stay exact while the shuffle is bounded by the HIT volume, not the
  * batch.
  *
  * Mirrors the shape of Spark's internal runtime-filter expression
  * (`BloomFilterMightContain`, which is not public API): a native
  * expression with `doGenCode` probing the filter directly, so the scan
  * stage keeps whole-stage codegen — a Scala UDF here would both break
  * codegen and re-serialize the filter per task closure instead of once
  * per plan.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a long hash, got ${child.dataType.simpleString}")

  override def dataType: DataType = BooleanType

  // deserialized once per (driver plan, executor task-set) — NOT per row
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the filter rides the generated class's references array: one
    // deserialization per plan, probes inlined into the scan stage
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  /** Column entry point: probe `bloom` with the long-typed `hash`. */
  def probe(hash: Column, bloom: BloomFilter): Column = {
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    graftbridge.toColumn(BloomMightContain(graftbridge.toExpression(hash), bytes))
  }
}
