package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotExact, Md5Seeded60, SimHash64}

/** Session extension registering graft's native expressions for SQL
  * use (`spark.sql("SELECT simhash64(...)")`). Install either at
  * build time:
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or on a live session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private val functions: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"simhash64 expects exactly 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }),
    ("dot_exact",
      new ExpressionInfo(classOf[DotExact].getName, "dot_exact"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"dot_exact expects exactly 2 arguments, got ${exprs.length}")
        DotExact(exprs.head, exprs(1))
      }),
    ("md5_seeded60",
      new ExpressionInfo(classOf[Md5Seeded60].getName, "md5_seeded60"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"md5_seeded60 expects (seed, str), got ${exprs.length} args")
        val seed = exprs.head match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"md5_seeded60 seed must be an int literal, got $other")
        }
        Md5Seeded60(seed, exprs(1))
      }))

  /** Register on an existing session (temp functions). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
