package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for identifier tokenization — the hot-path
  * operation of the whole engine (every content line and every ±k context
  * string is tokenized; profiling showed `regexp_extract_all` dominating the
  * TF and extraction stages).
  *
  * Semantics are EXACTLY `regexp_extract_all(lower(s), '[a-z_][a-z0-9_]{2,}', 0)`
  * when `lowerOutput = true`, and `regexp_extract_all(s,
  * '[A-Za-z_][A-Za-z0-9_]{2,}', 0)` when false — property-tested against the
  * regexp form (CodeTokensSpec). Instead of a regex engine, one linear scan
  * over the UTF-8 bytes: maximal [0-9A-Za-z_] runs, clipped to start at the
  * first [A-Za-z_], emitted when ≥3 chars long. Non-ASCII bytes are
  * separators in both forms (ASCII-identifier corpora; a code point whose
  * LOWERCASE is ASCII, e.g. U+212A, would diverge from the lower()+regex
  * form — irrelevant for code corpora and absent from all oracles).
  *
  * Codegen: `doGenCode` emits a direct static call, so the expression stays
  * inside whole-stage codegen (no interpretation, no UDF boundary, no
  * per-row regex Matcher state).
  */
case class CodeTokens(child: Expression, lowerOutput: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"code_tokens needs a string child, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "code_tokens"

  override def nullSafeEval(input: Any): Any =
    CodeTokenizer.tokenize(input.asInstanceOf[UTF8String], lowerOutput)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CodeTokenizer.tokenize($c, $lowerOutput)")

  override protected def withNewChildInternal(newChild: Expression): CodeTokens =
    copy(child = newChild)
}

/** Static tokenizer so generated Java can call it directly. */
object CodeTokenizer {

  @inline private def isTokenChar(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9') || b == '_'

  @inline private def isStartChar(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || b == '_'

  def tokenize(s: UTF8String, lowerOutput: Boolean): ArrayData = {
    val n = s.numBytes()
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    while (i < n) {
      if (isTokenChar(s.getByte(i))) {
        // maximal token-char run [i, j); the regex starts matching at the
        // first start char of the run and greedily consumes to the run end
        var firstStart = -1
        var j = i
        while (j < n && isTokenChar(s.getByte(j))) {
          if (firstStart < 0 && isStartChar(s.getByte(j))) firstStart = j
          j += 1
        }
        if (firstStart >= 0 && j - firstStart >= 3) {
          val len = j - firstStart
          val arr = new Array[Byte](len)
          var k = 0
          while (k < len) {
            var c = s.getByte(firstStart + k)
            if (lowerOutput && c >= 'A' && c <= 'Z') c = (c + 32).toByte
            arr(k) = c
            k += 1
          }
          out.add(UTF8String.fromBytes(arr))
        }
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }

  /** Column form: the drop-in replacement for the regexp tokenizer. */
  def codeTokens(c: Column, lowerOutput: Boolean = true): Column =
    ColumnBridge.column(CodeTokens(ColumnBridge.expression(c), lowerOutput))
}
