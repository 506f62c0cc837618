package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.BooleanType

/** SparkSessionExtensions entry point: makes the native expressions usable
  * from SQL. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  *
  * SQL surface: `code_tokens(str)` (lowercased identifier tokens, ≡
  * regexp_extract_all(lower(str), '[a-z_][a-z0-9_]{2,}', 0)) and
  * `code_tokens(str, false)` (case-preserving form).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("code_tokens"),
      new ExpressionInfo(classOf[CodeTokens].getName, "code_tokens"),
      (children: Seq[Expression]) => children match {
        case Seq(c)                                      => CodeTokens(c)
        // only a non-null boolean literal selects the flag — anything else
        // (code_tokens(s, 1), a NULL literal, a non-literal) is the
        // documented usage error, not a silent lowerOutput=false
        case Seq(c, Literal(b: Boolean, BooleanType))    => CodeTokens(c, b)
        case _ => throw new IllegalArgumentException(
          "code_tokens(str[, lowerOutput: boolean literal])")
      }))
  }
}
