package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native mention normalizer (E5) — one linear scan replacing the four-op
  * regexp chain
  * `trim(regexp_replace(regexp_replace(lower(regexp_replace(s,
  * "([a-z0-9])([A-Z])", "$1 $2")), "[_.]", " "), " +", " "))`,
  * which runs once per extracted mention (the second-hottest scalar after
  * tokenization). Semantics are identical on ASCII input (property-tested in
  * CodeTokensSpec against the regexp chain): camel boundaries split, `_`/`.`
  * fold to spaces, runs of spaces collapse, edges trim, ASCII letters
  * lowercase. Non-ASCII bytes pass through un-lowered (the regexp form would
  * lower them) — mention surfaces come from the ASCII identifier grammar, so
  * the divergence is unreachable in the engine paths; documented for direct
  * users.
  */
case class CodeNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"code_normalize needs a string child, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "code_normalize"

  override def nullSafeEval(input: Any): Any =
    CodeNormalizer.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CodeNormalizer.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): CodeNormalize =
    copy(child = newChild)
}

object CodeNormalizer {

  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    // worst case: a space inserted before every byte
    val out = new Array[Byte](2 * n)
    var o = 0
    var prev: Byte = 0          // previous ORIGINAL byte (camel rule context)
    var pendingSpace = false    // collapsed-space state; suppressed at start
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      if (c == '_' || c == '.' || c == ' ') {
        if (o > 0) pendingSpace = true // leading separators trim away
      } else {
        val isUpper = c >= 'A' && c <= 'Z'
        if (isUpper && ((prev >= 'a' && prev <= 'z') || (prev >= '0' && prev <= '9')))
          pendingSpace = true // camel boundary: [a-z0-9][A-Z]
        if (pendingSpace) { out(o) = ' '; o += 1; pendingSpace = false }
        out(o) = if (isUpper) (c + 32).toByte else c
        o += 1
      }
      prev = c
      i += 1
    }
    // trailing pendingSpace is exactly the trim
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  /** Column form: drop-in replacement for the regexp normalization chain. */
  def codeNormalize(c: Column): Column =
    ColumnBridge.column(CodeNormalize(ColumnBridge.expression(c)))
}
