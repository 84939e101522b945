package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: word n-gram shingles of a space-separated
  * text — `shingles("a b c d", 2) = ["a b", "b c", "c d"]`, falling back to
  * `[text]` when the document has fewer than n tokens (and `[null]` for a
  * null document, matching the `when(...).otherwise(array(text))` of the
  * original composition).
  *
  * Exists because the equivalent higher-order-function composition
  * (`transform(sequence(0, size(toks)-n), i -> concat_ws(' ', slice(toks,
  * i+1, n)))`) is the hottest expression in the text tier (minhash,
  * winnowing, n-gram Jaccard, heavy hitters all shingle the corpus) and has
  * two structural costs Catalyst cannot remove:
  *
  *  1. HOF lambdas block subexpression elimination, so `slice(split(text))`
  *     re-splits the WHOLE document at every shingle position —
  *     O(tokens²) per document (measured 4× the entire explode pass at
  *     sf0.1);
  *  2. `HigherOrderFunction` is `CodegenFallback`, so the expression runs
  *     interpreted and breaks the WholeStageCodegen span it sits in.
  *
  * This expression makes one byte scan for separators and emits shingles as
  * zero-copy `UTF8String` slices of the input buffer (an n-gram of tokens
  * separated by single spaces IS a contiguous substring of the document —
  * the `split`/`concat_ws(" ")` round trip rebuilds byte-identical content,
  * including runs of empty tokens from consecutive separators). Output is
  * bit-identical to the composition (property-fuzzed in ShinglesSpec), so
  * every DuckDB oracle mirror built on the SQL form is unaffected.
  *
  * Reference analog: the shingling stage of its dedup surface; done the
  * Spark-native way (SURVEY.md §7.4 custom-Expression tier, the
  * [[CosineSimilarity]] pattern).
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingles requires a string argument, got ${child.dataType.simpleString}")

  // Never null: a null document yields [null], like array(text) does.
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "shingles"

  override def eval(input: InternalRow): Any =
    Shingles.compute(child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = c.code +
        code"""
          |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          |  graft.functions.Shingles.compute(${c.isNull} ? null : ${c.value}, $n);
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)
}

object Shingles {
  /** One pass: count separators, record token start offsets, emit each
    * shingle as a slice of the input bytes. A UTF-8 continuation byte can
    * never be 0x20, so the byte scan is multibyte-safe. Called from both
    * interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    if (s == null) return new GenericArrayData(Array[Any](null))
    val bytes = s.getBytes
    val len = bytes.length
    var tokens = 1
    var i = 0
    while (i < len) {
      if (bytes(i) == ' ') tokens += 1
      i += 1
    }
    if (tokens < n) return new GenericArrayData(Array[Any](s))
    // starts(j) = byte offset of token j; sentinel start of a virtual
    // token `tokens` makes every shingle end uniformly starts(k+n)-1.
    val starts = new Array[Int](tokens + 1)
    var j = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(j) = i + 1; j += 1 }
      i += 1
    }
    starts(tokens) = len + 1
    val out = new Array[Any](tokens - n + 1)
    var k = 0
    while (k < out.length) {
      val st = starts(k)
      out(k) = UTF8String.fromBytes(bytes, st, starts(k + n) - 1 - st)
      k += 1
    }
    new GenericArrayData(out)
  }
}
