package graft

import graft.functions.{FloatVecDot, SimHash64}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SQL surface for graft's custom Catalyst expressions: registers
  * `simhash64(array<string>)` and `vec_dot(array<float>, array<float>)`
  * in the function registry, so `spark.sql` queries and downstream
  * tools can call them. Install either via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * post-hoc with [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.simhashDescriptor)
    e.injectFunction(GraftFunctions.vecDotDescriptor)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  val simhashDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (children: Seq[Expression]) => SimHash64(children.head))

  val vecDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
    (children: Seq[Expression]) => FloatVecDot(children(0), children(1)))

  /** Register on an existing session (tests, REPLs). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "scala_udf")
  }
}
