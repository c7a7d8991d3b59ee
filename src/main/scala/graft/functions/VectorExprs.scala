package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Custom Catalyst expressions for embedding math.
  *
  * Why custom: the equivalent built-in formulation — 64 chained
  * `element_at(...).cast(double) * ...` terms — produces an expression tree
  * whose generated code exceeds Janino's 64 KB method limit, so whole-stage
  * codegen falls back to interpreted eval (~6-10× slower on the similarity
  * joins). A single loop expression keeps the generated method tiny and stays
  * inside whole-stage codegen.
  *
  * Numeric contract (oracle parity): strictly sequential left-to-right
  * accumulation in double, each float element widened to double BEFORE the
  * multiply — bit-identical to both the explicit expression chain and the
  * DuckDB oracle SQL `CAST(v[1] AS DOUBLE)*CAST(w[1] AS DOUBLE) + ...`.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      acc += xs.getFloat(i).toDouble * ys.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of an array<float> column with a fixed double vector (e.g. an
  * LSH hyperplane). Same sequential-accumulation contract as
  * [[FloatVectorDot]]. */
case class FloatVectorDotConst(child: Expression, weights: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires array<float>, got $t")
    }

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), weights.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      acc += xs.getFloat(i).toDouble * weights(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $w.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ((double) $a.getFloat($i)) * $w[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  // Value-based identity: the default case-class equals/hashCode on an
  // Array member is REFERENCE identity, which (a) blocks common-subexpression
  // elimination and exchange reuse between structurally identical plans and
  // (b) makes plan canonicalization order-unstable — Catalyst sorts
  // commutative operands by hashCode, so an identity hash varies with
  // allocation history and flips plan fingerprints across sessions.
  override def equals(other: Any): Boolean = other match {
    case o: FloatVectorDotConst =>
      child == o.child && java.util.Arrays.equals(weights, o.weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
  def dotF(a: Column, b: Column): Column = toColumn(FloatVectorDot(toExpression(a), toExpression(b)))
  def dotConst(a: Column, w: Array[Double]): Column = toColumn(FloatVectorDotConst(toExpression(a), w))
}
