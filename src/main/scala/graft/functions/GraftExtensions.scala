package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration: makes the engine's custom Catalyst
  * expressions available to pure SQL users
  * (`spark.sql("SELECT java_string_hash(id) ...")`) via the supported
  * injection point:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("java_string_hash"),
        new ExpressionInfo(
          classOf[JavaStringHash].getName,
          "java_string_hash"
        ),
        (children: Seq[Expression]) => JavaStringHash(children.head)
      )
    )
  }
}
