package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

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
        case Seq(c)                          => CodeTokens(c)
        case Seq(c, Literal(lower, _))       => CodeTokens(c, lower == true)
        case _ => throw new IllegalArgumentException(
          "code_tokens(str[, lowerOutput: boolean literal])")
      }))
  }
}
