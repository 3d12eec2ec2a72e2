package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingles(text)` — one row per DISTINCT word-3-gram of the document.
  *
  * Semantics match the declarative original exactly (`split(text, ' ')`
  * keeping empty tokens, docs with <3 words emit nothing, first-occurrence
  * distinct), but as a single [[Generator]] pass: no words array column,
  * no interpreted `transform`/`slice`/`concat_ws` lambda chain, no
  * intermediate shingle array to `array_distinct` — the dominant
  * allocation cost of the dedup pipeline's scan stage (the same
  * interpreted-HOF trap the q46 dot product hit; see LongDotProduct).
  */
case class ShingleGen(child: Expression, distinct: Boolean = true)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles requires string input, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    // split(" ", -1) ≡ Spark's split(text, " "): empty tokens kept
    val words = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (words.length < 3) return Nil
    if (distinct) {
      val seen = new java.util.LinkedHashSet[String](words.length * 2)
      var i = 0
      while (i <= words.length - 3) {
        seen.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
        i += 1
      }
      val out = new Array[InternalRow](seen.size())
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = InternalRow(UTF8String.fromString(it.next())); j += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    } else {
      // every occurrence, document order — the q82 repetition signal
      // needs duplicate shingles (it MEASURES them); same single-pass
      // generator, no LinkedHashSet, no interpreted transform/slice/
      // concat_ws lambda chain
      val out = new Array[InternalRow](words.length - 2)
      var i = 0
      while (i <= words.length - 3) {
        out(i) = InternalRow(UTF8String.fromString(
          words(i) + " " + words(i + 1) + " " + words(i + 2)))
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGen =
    copy(child = newChild)

  override def prettyName: String = if (distinct) "shingles" else "shingles_all"
}

object ShingleGen {
  def shingles(c: Column): Column =
    GraftSqlBridge.toColumn(ShingleGen(GraftSqlBridge.toExpression(c)))

  /** One row per shingle OCCURRENCE (duplicates kept, document order). */
  def shinglesAll(c: Column): Column =
    GraftSqlBridge.toColumn(
      ShingleGen(GraftSqlBridge.toExpression(c), distinct = false))
}
