package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles over a token array, first-seen order —
  * semantically identical to
  * `array_distinct(transform(sequence(...), i => concat_ws(" ", slice(toks, i+1, n))))`
  * with the `< n`-tokens fallback of joining the whole array, but one
  * expression node and one pass: no per-shingle slice allocation, no
  * O(shingles²) array_distinct string comparisons. Tokenization stays
  * upstream (the regex `split` twin of the DuckDB oracle), so oracle
  * parity is untouched.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  private def joinRange(tokens: ArrayData, from: Int, until: Int): UTF8String = {
    val parts = new Array[UTF8String](until - from)
    var i = from
    while (i < until) {
      parts(i - from) =
        if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
      i += 1
    }
    UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
  }

  def compute(tokens: ArrayData): ArrayData = {
    val cnt = tokens.numElements()
    if (cnt < n) return new GenericArrayData(Array[Any](joinRange(tokens, 0, cnt)))
    val seen = new mutable.LinkedHashSet[UTF8String]
    var i = 0
    while (i + n <= cnt) {
      seen += joinRange(tokens, i, i + n)
      i += 1
    }
    new GenericArrayData(seen.toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngExpr", this, classOf[WordNGrams].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
