package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.functions.expressions.DotProductQ

/** Optimizer rule: rewrite the higher-order-function dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, x) => acc + x)
  *
  * over ARRAY<BIGINT> into the codegen'd [[DotProductQ]] kernel — the
  * HOF form evaluates its lambdas interpreted per element, the kernel is
  * a primitive loop inside whole-stage codegen (SURVEY §7.4's promotion
  * path, automated: user code written with public built-ins gets the
  * native kernel for free).
  *
  * Semantics: [[DotProductQ]] implements EXACTLY the HOF form's null
  * behavior (null array, unequal lengths, or any null element -> NULL),
  * so the rewrite is sound on any ARRAY<BIGINT> inputs, nullable
  * elements included (parquet scans surface containsNull = true even for
  * null-free data, so a containsNull guard would disable the rule
  * exactly where it matters). The OVERFLOW contract follows the matched
  * arithmetic's eval mode: LEGACY Multiply/Add -> wrapping kernel; ANSI
  * (Spark 4's default) -> overflow-checked kernel raising the same
  * ARITHMETIC_OVERFLOW error. Mixed modes or TRY (per-element NULL on
  * overflow, not expressible as one fused loop's contract) are left
  * untouched.
  */
object PromoteDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def longArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // Spark 4.1 wraps the arithmetic eval mode in NumericEvalContext
    // (evalMode + decimal-precision flag; the latter is irrelevant for
    // BIGINT arithmetic).
    case ArrayAggregate(
        ZipWith(a, b,
          LambdaFunction(Multiply(mx, my, mulCtx),
            Seq(xv: NamedLambdaVariable, yv: NamedLambdaVariable), _)),
        Literal(0L, LongType),
        LambdaFunction(Add(macc, mx2, addCtx),
          Seq(accv: NamedLambdaVariable, xv2: NamedLambdaVariable), _),
        LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
      if longArray(a) && longArray(b) &&
        mulCtx.evalMode == addCtx.evalMode && mulCtx.evalMode != EvalMode.TRY &&
        sameVar(mx, xv) && sameVar(my, yv) &&
        sameVar(macc, accv) && sameVar(mx2, xv2) && sameVar(fin, fv) =>
      DotProductQ(a, b, failOnError = mulCtx.evalMode == EvalMode.ANSI)
  }
}

/** spark.sql.extensions entry point: injects [[PromoteDotProduct]] and
  * registers the native kernel as the SQL function `graft_dotq` into
  * every session built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` —
  * SQL-only users get both the automatic promotion of the HOF pattern
  * and a direct spelling.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PromoteDotProduct)
    ext.injectFunction(GraftExtensions.dotqFunction)
    ext.injectFunction(GraftExtensions.jaroWinklerFunction)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import org.apache.spark.sql.internal.SQLConf

  /** The `graft_dotq` SQL registration triple (identifier, info,
    * builder) — shared between the extensions entry point and direct
    * `functionRegistry.registerFunction` callers.
    */
  val dotqFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dotq"),
    new ExpressionInfo(classOf[DotProductQ].getName, "graft_dotq",
      "graft_dotq(a, b) - exact BIGINT dot product of two ARRAY<BIGINT>; " +
        "NULL on null arrays, length mismatch or null elements; " +
        "overflow follows the session ANSI mode"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"graft_dotq expects 2 arguments, got ${children.size}")
      // Bind the overflow contract at resolution time from the session
      // ANSI mode — the same contract the promotion rule derives from
      // the matched arithmetic's eval mode.
      DotProductQ(children.head, children(1),
        failOnError = SQLConf.get.ansiEnabled)
    })

  /** The `graft_jaro_winkler` SQL registration triple — the fuzzy-match
    * scorer ([[graft.functions.expressions.JaroWinklerSim]]) for
    * SQL-only users; bit-identical to DuckDB's
    * jaro_winkler_similarity, so SQL written against either engine
    * scores the same.
    */
  val jaroWinklerFunction: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_jaro_winkler"),
    new ExpressionInfo(
      classOf[graft.functions.expressions.JaroWinklerSim].getName,
      "graft_jaro_winkler",
      "graft_jaro_winkler(a, b) - Jaro-Winkler similarity of two " +
        "STRINGs in [0,1]; NULL on null input; textbook semantics " +
        "(0.7 boost threshold, 4-char prefix cap, p=0.1)"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"graft_jaro_winkler expects 2 arguments, got ${children.size}")
      graft.functions.expressions.JaroWinklerSim(children.head, children(1))
    })
}
