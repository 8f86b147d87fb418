package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float vectors as a native Catalyst expression.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` —
  * each float is widened to double before multiplying and the fold is
  * sequential, so results are bitwise identical to the HOF formulation
  * (and to the DuckDB oracle's list_sum/list_transform arithmetic). The
  * difference is speed: a primitive loop over the unboxed array data
  * versus interpreted per-element lambda evaluation — the HOF path
  * dominated the similarity benchmarks.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires (array<float>, array<float>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x(i).toDouble * y(i).toDouble
      i += 1
    }
    acc
  }

  /** Real codegen: emits the same primitive loop inline, so the whole
    * similarity projection stays in one WholeStageCodegen span (no
    * interpreted-eval boundary around the hot loop).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatVecDot =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

object VecOps {
  /** Column API: sequential-fold double dot product of float vectors. */
  def vecDot(a: Column, b: Column): Column =
    GraftGlue.column(FloatVecDot(GraftGlue.expression(a), GraftGlue.expression(b)))

  /** Column API: index of the squared-L2-nearest centroid (ties →
    * lowest index).
    */
  def nearestCell(vec: Column, centroids: Array[Array[Float]]): Column =
    GraftGlue.column(NearestCell(GraftGlue.expression(vec), centroids))
}

/** Argmin-squared-L2 cell assignment against a centroid matrix held as a
  * REFERENCED OBJECT, not an expression tree: the earlier formulation
  * built `array(array(lit...))` per centroid — a k×dim nest of Literal
  * nodes that blows up planning/codegen at realistic IVF sizes
  * (thousands of cells × hundreds of dims → multi-MB plan per query).
  * Here the plan carries ONE node regardless of k; the matrix rides the
  * serialized task closure (Spark broadcasts task binaries per stage),
  * which is exactly how a broadcast centroid table would ship — without
  * the join + re-aggregation a relational argmin would need.
  *
  * Scoring matches the literal formulation bitwise: per cell,
  * `|c|² - 2·(v·c)` with floats widened to double and both sums folded
  * in ascending index order (|v|² is row-constant and irrelevant to the
  * argmin); strict `<` keeps the lowest cell id on ties, like the old
  * `array_min` over (score, cell) structs.
  */
case class NearestCell(child: Expression, centroids: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nearest_cell requires array<float>, got ${other.catalogString}")
    }

  // |c|² per cell, precomputed once per executor instead of per row
  @transient private lazy val centroidNormsSq: Array[Double] = NearestCell.normsSq(centroids)

  override def nullSafeEval(input: Any): Any =
    NearestCell.evalVec(input.asInstanceOf[ArrayData], centroids, centroidNormsSq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
    val nRef = ctx.addReferenceObj("centroidNormsSq", centroidNormsSq, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.NearestCell.evalVec($c, $cRef, $nRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
  override def prettyName: String = "nearest_cell"
}

object NearestCell {
  def normsSq(centroids: Array[Array[Float]]): Array[Double] =
    centroids.map { c =>
      var s = 0.0
      var j = 0
      while (j < c.length) { s += c(j).toDouble * c(j).toDouble; j += 1 }
      s
    }

  /** Static kernel shared by interpreted eval and generated code. */
  def evalVec(vec: ArrayData, centroids: Array[Array[Float]], normsSq: Array[Double]): Int = {
    val v = vec.toFloatArray()
    var best = Double.PositiveInfinity
    var bestCell = 0
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      val n = math.min(v.length, c.length)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j).toDouble * c(j).toDouble; j += 1 }
      val score = normsSq(i) - 2.0 * dot
      if (score < best) { best = score; bestCell = i }
      i += 1
    }
    bestCell
  }
}
