package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two ARRAY<BIGINT> vectors as a native
  * Catalyst expression with whole-stage codegen (SURVEY §7.4's promotion
  * path: built-in HOFs first, custom codegen'd Expression when bench
  * demands).
  *
  * The higher-order-function formulation
  * (aggregate(zip_with(a, b, _ * _), 0, _ + _)) evaluates its lambda
  * interpreted — one expression-tree walk per element per pair. This
  * expression compiles to a tight primitive loop inside the generated
  * code, which is what a 100 TB similarity scan runs all day.
  *
  * Contract — EXACTLY the HOF form's semantics, so the
  * [[graft.plans.PromoteDotProduct]] rewrite is sound in both eval
  * modes: null array -> null; unequal lengths -> null (zip_with pads
  * with nulls and a null product nullifies the sum); any null element ->
  * null (same reason); else the element-wise product-sum. The
  * null-element scan is skipped at codegen time when both inputs carry
  * containsNull = false.
  *
  * Overflow follows the matched arithmetic's eval mode:
  * `failOnError = false` wraps like LEGACY Multiply/Add;
  * `failOnError = true` raises the same ARITHMETIC_OVERFLOW error ANSI
  * Multiply/Add would (Spark 4 defaults to ANSI, so this is the common
  * promoted form) — including ORDER of effects: zip_with evaluates every
  * overlapping product eagerly, so a product overflow throws even when
  * an earlier element is null or the lengths differ, while the running
  * sum stops overflow-checking once a null element has nullified it
  * (acc + null = null). Exact-arithmetic checks cost one branch per
  * element that the JIT folds into the multiply — the loop stays
  * primitive.
  */
case class DotProductQ(left: Expression, right: Expression,
                       failOnError: Boolean = false)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType

  // Null even for non-null inputs (unequal lengths / null elements).
  override def nullable: Boolean = true

  override def prettyName: String = "graft_dotq"

  private def elementsNullable: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xn = x.numElements()
    val yn = y.numElements()
    if (!failOnError) {
      // LEGACY: no arithmetic can throw, so null short-circuits are safe.
      if (yn != xn) return null
      var sum = 0L
      var i = 0
      while (i < xn) {
        if (elementsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
        sum += x.getLong(i) * y.getLong(i)
        i += 1
      }
      sum
    } else {
      // ANSI: zip_with evaluates EVERY overlapping product eagerly, so a
      // product overflow throws even when an earlier element is null or
      // the lengths differ; the running sum stops overflow-checking once
      // nullified (acc + null = null), and padding nulls from unequal
      // lengths come after the overlap in index order.
      val n = math.min(xn, yn)
      var acc = 0L
      var accNull = false
      var i = 0
      try {
        while (i < n) {
          if (elementsNullable && (x.isNullAt(i) || y.isNullAt(i))) accNull = true
          else {
            val p = Math.multiplyExact(x.getLong(i), y.getLong(i))
            if (!accNull) acc = Math.addExact(acc, p)
          }
          i += 1
        }
      } catch {
        case _: ArithmeticException =>
          throw org.apache.spark.sql.GraftSqlBridge.overflowError()
      }
      if (accNull || xn != yn) null else acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      if (!failOnError) {
        // LEGACY: no arithmetic can throw — null short-circuits are safe.
        val nullElemCheck =
          if (elementsNullable)
            s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
          else ""
        s"""
           |int $n = $a.numElements();
           |if ($b.numElements() != $n) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $sum = 0L;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $nullElemCheck
           |    $sum += $a.getLong($i) * $b.getLong($i);
           |  }
           |  ${ev.value} = $sum;
           |}
         """.stripMargin
      } else {
        // ANSI: mirror nullSafeEval — every overlapping product is
        // overflow-checked (zip_with evaluates them eagerly) even after
        // a null element; the sum stops checking once nullified; padding
        // nulls from unequal lengths follow the overlap in index order.
        val xn = ctx.freshName("xn")
        val yn = ctx.freshName("yn")
        val accNull = ctx.freshName("accNull")
        val p = ctx.freshName("p")
        val nullElemCase =
          if (elementsNullable)
            s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { $accNull = true; } else"""
          else ""
        s"""
           |int $xn = $a.numElements();
           |int $yn = $b.numElements();
           |int $n = java.lang.Math.min($xn, $yn);
           |long $sum = 0L;
           |boolean $accNull = false;
           |try {
           |  for (int $i = 0; $i < $n; $i++) {
           |    $nullElemCase {
           |      long $p = java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i));
           |      if (!$accNull) { $sum = java.lang.Math.addExact($sum, $p); }
           |    }
           |  }
           |} catch (ArithmeticException e) {
           |  throw org.apache.spark.sql.GraftSqlBridge.overflowError();
           |}
           |if ($accNull || $xn != $yn) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $sum;
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductQ =
    copy(left = newLeft, right = newRight)
}
