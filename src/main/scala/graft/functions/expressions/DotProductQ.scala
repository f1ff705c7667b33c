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
  * promoted form). Exact-arithmetic checks cost one branch per element
  * that the JIT folds into the multiply — the loop stays primitive.
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
    val n = x.numElements()
    if (y.numElements() != n) return null
    var sum = 0L
    var i = 0
    try {
      while (i < n) {
        if (elementsNullable && (x.isNullAt(i) || y.isNullAt(i))) return null
        if (failOnError)
          sum = Math.addExact(sum, Math.multiplyExact(x.getLong(i), y.getLong(i)))
        else
          sum += x.getLong(i) * y.getLong(i)
        i += 1
      }
    } catch {
      case _: ArithmeticException =>
        throw org.apache.spark.sql.GraftSqlBridge.overflowError()
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val nullElemCheck =
        if (elementsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      val step =
        if (failOnError)
          s"$sum = java.lang.Math.addExact($sum, java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));"
        else
          s"$sum += $a.getLong($i) * $b.getLong($i);"
      val loop =
        s"""for (int $i = 0; $i < $n; $i++) {
           |  $nullElemCheck
           |  $step
           |}""".stripMargin
      val guardedLoop =
        if (failOnError)
          s"""try {
             |  $loop
             |} catch (ArithmeticException e) {
             |  throw org.apache.spark.sql.GraftSqlBridge.overflowError();
             |}""".stripMargin
        else loop
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sum = 0L;
         |  $guardedLoop
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProductQ =
    copy(left = newLeft, right = newRight)
}
