package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `tokenize(text)` — table-generating function (UDTF): one output row
  * per token with its position. The BPE-ish pattern matches letter runs,
  * digit runs, or single other non-space characters — the same tokens
  * counted by q44.
  *
  * A custom Catalyst [[Generator]]: the planner places it in a
  * GenerateExec just like explode, so tokenization fans out inside the
  * scan stage — rows never materialize an intermediate array column.
  */
case class Tokenize(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  @transient private lazy val pattern: Pattern =
    Pattern.compile("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("token", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokenize requires string input, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val m = pattern.matcher(v.asInstanceOf[UTF8String].toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var pos = 0
    while (m.find()) {
      out += InternalRow(pos, UTF8String.fromString(m.group()))
      pos += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)

  override def prettyName: String = "tokenize"
}

object Tokenize {
  /** Column API: `df.select(col("id"), tokenize(col("text")))`. */
  def tokenize(c: Column): Column =
    GraftSqlBridge.toColumn(Tokenize(GraftSqlBridge.toExpression(c)))
}
