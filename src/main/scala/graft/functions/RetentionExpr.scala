package graft.functions

import graft.model.Retentions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `parse_retention('1s:1d,1m:30d,1h:5y')` as a SQL-callable Catalyst
  * expression: whisper's retention DSL (reference: whisper.go →
  * `ParseRetentionDefs`; SURVEY.md §1.2) parsed to
  * `array<struct<seconds_per_point int, number_of_points int>>`.
  * Parse-only, like the reference — whisper validates the LIST rules in
  * `Create`, not in the parser; malformed parts raise the parser's own
  * error. Config-plane (a literal argument constant-folds to a literal
  * header), so `CodegenFallback` costs nothing on any hot path.
  */
case class ParseRetentions(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_retention expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("seconds_per_point", IntegerType, nullable = false),
      StructField("number_of_points", IntegerType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val rets = Retentions.parseRetentionDefs(input.asInstanceOf[UTF8String].toString)
    new GenericArrayData(
      rets.map(r => InternalRow(r.secondsPerPoint, r.numberOfPoints)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): ParseRetentions =
    copy(child = newChild)

  override def prettyName: String = "parse_retention"
}
