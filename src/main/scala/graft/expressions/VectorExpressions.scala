package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over ARRAY<FLOAT|DOUBLE>
  * columns — the hot path for the similarity-search operators.
  *
  * Why a custom Expression (SURVEY.md §7 M4): Spark's higher-order functions
  * (`zip_with`/`aggregate`) evaluate lambdas per element outside whole-stage
  * codegen; a fused single-pass loop with `doGenCode` is 1-2 orders faster
  * on 100 TB-scale scans and keeps the whole stage codegen'd.
  *
  * Semantics: elements are widened to double BEFORE any arithmetic;
  * accumulation is sequential left-to-right — bit-compatible with a
  * `list_reduce`-style fold over `CAST(v AS DOUBLE[])`, which is exactly how
  * the DuckDB oracles compute it. Zero-norm input → NULL (matches SQL
  * division-by-null conventions, never throws).
  */
abstract class VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def get(arr: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** Java source reading element i of `v` as double. */
  protected def getJava(v: String, isFloat: Boolean, i: String): String =
    if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
}

/** cosine_sim(a, b) = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = get(x, lf, i); val yv = get(y, rf, i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = elemIsFloat(left); val rf = elemIsFloat(right)
      // Locals MUST be freshName'd: with non-nullable children,
      // nullSafeCodeGen inlines this block without a scope wrapper, so two
      // instances in one operator would redefine the variable and kick the
      // whole stage out of codegen (janino "Redefinition of local").
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0, $na = 0.0, $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xv = ${getJava(a, lf, i)};
          double $yv = ${getJava(b, rf, i)};
          $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
        }
        if ($na == 0.0 || $nb == 0.0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot_product(a, b) — fused multiply-accumulate in double. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += get(x, lf, i) * get(y, rf, i); i += 1 }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lf = elemIsFloat(left); val rf = elemIsFloat(right)
      // freshName'd locals — see CosineSimilarity.doGenCode.
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        int $n = Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += (${getJava(a, lf, i)}) * (${getJava(b, rf, i)});
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Register SQL-callable forms (cosine_sim, dot_product) in the session's
    * function registry so both `expr(...)` and SQL text can use them. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Register once per session: createOrReplace on every query build
    // spams "replaced a previously registered function" warnings.
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"))) {
      reg.createOrReplaceTempFunction("cosine_sim",
        exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("dot_product",
        exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    }
  }

  /** Column API via the registered SQL functions (avoids private Column
    * constructors; call [[register]] first or use these helpers which
    * require registration to have happened on the active session). */
  def cosineSim(spark: SparkSession, a: String, b: String): Column = {
    register(spark)
    expr(s"cosine_sim($a, $b)")
  }
}
