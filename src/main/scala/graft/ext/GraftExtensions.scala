package graft.ext

import graft.functions.PolyHash
import graft.llm.TextAnalysis
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, Multiply, Pow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Session extension wiring for graft's native surface:
  *
  *   - `graft_polyhash(str[, mod])` as a SQL-callable function, so the
  *     engine's fingerprint/shingle hash is usable from `spark.sql`
  *     (and from SQL-only clients) with the identical semantics as the
  *     Column API
  *   - `SquarePowToMult`, an opt-in optimizer rule rewriting
  *     `pow(x, 2)` to `x * x` — squaring by multiplication stays exact
  *     IEEE and avoids the libm call. NOT enabled in the golden-parity
  *     paths: the reference computes Math.pow, and although pow(x,2)
  *     and x*x agree on every tested input, byte parity shouldn't
  *     depend on a libm implementation detail.
  *
  * Activate with:
  *   SparkSession.builder()...
  *     .withExtensions(new GraftExtensions()) // or
  *     .config("spark.sql.extensions", "graft.ext.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => PolyHash(s, TextAnalysis.FpMod)
        case Seq(s, Literal(m: Long, _)) => PolyHash(s, m)
        case Seq(s, Literal(m: Int, _)) => PolyHash(s, m.toLong)
        case _ => throw new IllegalArgumentException(
          "graft_polyhash(str[, mod literal]) expects 1 or 2 arguments")
      }))
    ext.injectOptimizerRule(_ => SquarePowToMult)
  }
}

/** Rewrites pow(x, 2.0) to x * x (exact, codegen-cheaper). */
object SquarePowToMult extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Pow(x, Literal(two: Double, DoubleType)) if two == 2.0 =>
        Multiply(x, x)
    }
}
