package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Product-quantization code assignment for ALL m subspaces in one compiled
  * loop: for each subspace s, the index of the codebook entry minimizing the
  * squared L2 distance to the vector's s-th slice (first-min-wins on ties —
  * the `array_position(d2, array_min(d2))` convention).
  *
  * Why custom: the equivalent built-in formulation — m × k explicit
  * `(element_at(e,i) − c)²` term chains (4·16·16 ≈ 3000 expression nodes) —
  * blows Janino's 64 KB method limit, so whole-stage codegen falls back to
  * interpreted eval over the whole corpus; this was the dominant cost of the
  * PQ family (sim_pq_adc 11 s at sf0.1). One loop expression keeps the
  * generated method tiny and inside whole-stage codegen.
  *
  * Numeric contract (oracle parity): per code, terms (e−c)² accumulate
  * strictly left-to-right in double from 0.0 (0.0 + t == t bit-exactly for
  * the non-negative squares), each float widened BEFORE the subtract —
  * bit-identical to the explicit chain and the DuckDB oracle's
  * `(CAST(e[i] AS DOUBLE) − c)*(CAST(e[i] AS DOUBLE) − c) + …`. Argmin
  * tracks strict `<`, so equal distances keep the LOWEST code, matching
  * `array_position`'s first-match semantics.
  *
  * Null contract: null array, short array, or any null element in the used
  * prefix → null (the fixture's embeddings are fixed-width non-null; this
  * expression never fabricates a code from partial data). */
case class PqEncodeCodes(child: Expression, cents: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = cents.length
  private val k = cents(0).length
  private val sub = cents(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
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
    if (xs.numElements() < m * sub) return null
    var i = 0
    while (i < m * sub) {
      if (xs.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cs = cents(s)
      var best = Double.MaxValue
      var arg = 0
      var j = 0
      while (j < k) {
        val c = cs(j)
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val e = xs.getFloat(s * sub + d).toDouble
          val t = e - c(d)
          acc += t * t
          d += 1
        }
        if (j == 0 || acc < best) { best = acc; arg = j }
        j += 1
      }
      codes(s) = arg
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("cents", cents, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val arg = ctx.freshName("arg")
      val codes = ctx.freshName("codes")
      val cs = ctx.freshName("cs")
      val cj = ctx.freshName("cj")
      val e = ctx.freshName("e")
      val t = ctx.freshName("t")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |if ($a.numElements() < ${m * sub}) { ${ev.isNull} = true; } else {
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < ${m * sub}; $i++) {
         |    if ($a.isNullAt($i)) { $anyNull = true; break; }
         |  }
         |  if ($anyNull) { ${ev.isNull} = true; } else {
         |    int[] $codes = new int[$m];
         |    for (int $s = 0; $s < $m; $s++) {
         |      double[][] $cs = $cref[$s];
         |      double $best = 0.0;
         |      int $arg = 0;
         |      for (int $j = 0; $j < $k; $j++) {
         |        double[] $cj = $cs[$j];
         |        double $acc = 0.0;
         |        for (int $d = 0; $d < $sub; $d++) {
         |          double $e = (double) $a.getFloat($s * $sub + $d);
         |          double $t = $e - $cj[$d];
         |          $acc += $t * $t;
         |        }
         |        if ($j == 0 || $acc < $best) { $best = $acc; $arg = $j; }
         |      }
         |      $codes[$s] = $arg;
         |    }
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  // Value-based identity over the codebook (the FloatVectorDotConst rule):
  // reference identity would block CSE/exchange reuse and destabilize plan
  // fingerprints, since Catalyst sorts commutative operands by hashCode.
  override def equals(other: Any): Boolean = other match {
    case o: PqEncodeCodes =>
      child == o.child &&
        java.util.Arrays.deepEquals(
          cents.asInstanceOf[Array[AnyRef]], o.cents.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(cents.asInstanceOf[Array[AnyRef]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeCodes {
  import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpression}
  def codes(a: Column, cents: Array[Array[Array[Double]]]): Column =
    toColumn(PqEncodeCodes(toExpression(a), cents))
}
