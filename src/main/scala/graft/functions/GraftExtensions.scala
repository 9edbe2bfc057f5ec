package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the codegen vector kernels, so the
  * engine is reachable from plain `spark.sql(...)` / JDBC too. Two entry
  * points over the same function set:
  *
  *   - at session build:
  *     `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *     `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  *   - on a live session: `GraftExtensions.registerAll(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def binary(name: String, usage: String,
                     make: (Expression, Expression) => Expression): FunctionDescription =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
      { args =>
        require(args.length == 2, s"$name expects 2 arguments")
        make(args(0), args(1))
      })

  val functions: Seq[FunctionDescription] = Seq(
    binary("l2_dist",
      "l2_dist(a, b) - Euclidean distance of two float/double arrays",
      L2Distance.apply),
    binary("cosine_dist",
      "cosine_dist(a, b) - cosine distance with zero-norm guard",
      CosineDistance.apply),
    binary("dot_product",
      "dot_product(a, b) - inner product of two float/double arrays",
      DotProduct.apply),
    (FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "vec_norm",
        "vec_norm(a) - L2 norm of a float/double array"),
      { args: Seq[Expression] =>
        require(args.length == 1, "vec_norm expects 1 argument")
        VecNorm(args.head)
      }))

  /** Register the same functions into an already-built session. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
