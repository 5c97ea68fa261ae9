package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, CreateNamedStruct, EqualTo, Expression, GreaterThan, If, ImplicitCastInputTypes, IsNull, Literal, Not, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructType}

/** `lww_max(ts_s, value)` — argmax under the lexicographic LWW order
  * (later raw timestamp wins, then larger value), returning the winning
  * `struct(ts_s, value)`.
  *
  * Why not `max_by(value, struct(ts_s, value))` / `max(struct(…))`: both
  * carry a STRUCT-typed aggregation buffer slot, which is not
  * UnsafeRow-mutable, so every LWW aggregate planned as partial/final
  * SortAggregate — two extra sorts per ingest-shaped query (the r12
  * `carbon_ingest` verdict finding; at 100× ingest volume the double
  * sort is the bottleneck). A first fix attempt packed the pair into one
  * `DECIMAL(38,0)` `max` — hash-aggregable, but >18-digit decimals are
  * BigDecimal-backed and the per-row pack arithmetic measured SLOWER
  * than the sorts it removed. This aggregate keeps the SAME total order
  * over two FLATTENED PRIMITIVE buffer slots `(long, double)` — mutable,
  * so the plan is codegen'd HashAggregate with map-side partial max, and
  * every update/merge is a primitive comparison.
  *
  * Declarative (pure expression algebra, like Spark's own `Max`): the
  * comparisons are Catalyst `GreaterThan` on long/double, so NaN
  * ordering matches the engine's native comparisons (NaN greatest).
  * Null contract, stated plainly: a row with a NULL ts or value is
  * IGNORED — whisper points cannot be null (the write paths require
  * non-null and carbon parse drops malformed lines), so a null row
  * must never displace a real winner. This deliberately differs from
  * `max_by(value, struct(ts, value))`, whose non-null struct key lets
  * a (ts, null) row WIN and emit null. Both buffer slots start null;
  * an all-null/empty group evaluates to a null struct pair. Input
  * types coerce like any numeric function (`ImplicitCastInputTypes` —
  * an INT ts or FLOAT value casts up instead of failing analysis, as
  * the max_by form this replaced accepted them).
  */
case class LwwMax(tsExpr: Expression, valueExpr: Expression)
    extends DeclarativeAggregate with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(tsExpr, valueExpr)

  // AbstractDataType is private[sql]; DataType is its public subtype and
  // a covariant override result is legal
  override def inputTypes: Seq[DataType] = Seq(LongType, DoubleType)

  override def nullable: Boolean = true

  override def dataType: DataType = new StructType()
    .add("ts_s", LongType).add("value", DoubleType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (tsExpr.dataType == LongType && valueExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lww_max expects (long, double), got " +
        s"(${tsExpr.dataType.simpleString}, ${valueExpr.dataType.simpleString})")

  private lazy val bTs = AttributeReference("lww_ts", LongType)()
  private lazy val bVal = AttributeReference("lww_val", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bTs, bVal)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, LongType), Literal(null, DoubleType))

  /** (nts, nval) displaces (ts, value) when the buffer is empty or the
    * candidate is lexicographically greater.
    */
  private def wins(nts: Expression, nval: Expression,
      ts: Expression, value: Expression): Expression =
    Or(IsNull(ts),
      Or(GreaterThan(nts, ts),
        And(EqualTo(nts, ts), GreaterThan(nval, value))))

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(Not(IsNull(tsExpr)), Not(IsNull(valueExpr)))
    val better = And(valid, wins(tsExpr, valueExpr, bTs, bVal))
    Seq(If(better, tsExpr, bTs), If(better, valueExpr, bVal))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val valid = Not(IsNull(bTs.right))
    val better = And(valid, wins(bTs.right, bVal.right, bTs.left, bVal.left))
    Seq(If(better, bTs.right, bTs.left), If(better, bVal.right, bVal.left))
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("ts_s"), bTs, Literal("value"), bVal))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LwwMax =
    copy(tsExpr = newChildren(0), valueExpr = newChildren(1))

  override def prettyName: String = "lww_max"
}

object LwwMax {

  /** Column entry point: `lwwMax(ts, value)` → `struct(ts_s, value)` of
    * the LWW winner.
    */
  def lwwMax(ts: Column, value: Column): Column =
    graftbridge.toColumn(
      LwwMax(graftbridge.toExpression(ts), graftbridge.toExpression(value))
        .toAggregateExpression())
}
