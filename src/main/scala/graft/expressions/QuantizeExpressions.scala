package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Int8 scalar quantization for embedding columns — the shuffle-size lever
  * for similarity search at 100 TB (SURVEY.md §7 M4).
  *
  * A dim-64 FLOAT embedding is 256 bytes on the wire; its int8 form is
  * 64 bytes + one double scale. Every all-pairs / LSH-candidate shuffle
  * that moves codes instead of floats moves ~4x less data, and the int
  * dot-product kernel is branch-free codegen.
  *
  * Math: symmetric per-vector quantization. scale = maxAbs/127,
  * code[i] = round(v[i]/scale) in [-127, 127]. Cosine over quantized
  * vectors needs NO dequantization — the scales cancel:
  *   cos_q = sum(ca*cb) / (sqrt(sum(ca^2)) * sqrt(sum(cb^2)))
  * so [[QuantizedCosine]] is pure integer multiply-accumulate. The
  * quantization error on cosine is bounded (|err| <~ 2*sqrt(dim)/127 worst
  * case, ~0.01 in practice for dim 64) — callers that need EXACT results
  * use quantized cosine as a cheap prefilter with a margin, then verify
  * survivors against the float vectors (Similarity.quantizedNearDupPairs).
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def prettyName: String = "quantize_int8"

  override def dataType: DataType = QuantizeExpressions.quantizedType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val isFloat = elemIsFloat
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      val a = math.abs(v)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = if (maxAbs == 0.0) 0.0 else maxAbs / 127.0
    val codes = new Array[Byte](n)
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        codes(i) = math.round(v / scale).toByte
        i += 1
      }
    }
    InternalRow(scale, codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get =
        if (elemIsFloat) (i: String) => s"(double) $a.getFloat($i)"
        else (i: String) => s"$a.getDouble($i)"
      val rowCls = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
      // Locals MUST be freshName'd: when the expression's slot is
      // non-nullable, nullSafeCodeGen inlines this block WITHOUT a scope
      // wrapper, and two instances in one operator redefine the variable —
      // janino rejects the class and the whole stage silently falls back
      // to interpreted eval.
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs"); val av = ctx.freshName("av")
      val scale = ctx.freshName("scale"); val codes = ctx.freshName("codes")
      val fields = ctx.freshName("fields")
      s"""
        int $n = $a.numElements();
        double $maxAbs = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $av = Math.abs(${get(i)});
          if ($av > $maxAbs) $maxAbs = $av;
        }
        double $scale = $maxAbs == 0.0 ? 0.0 : $maxAbs / 127.0;
        byte[] $codes = new byte[$n];
        if ($scale > 0.0) {
          for (int $i = 0; $i < $n; $i++) {
            $codes[$i] = (byte) Math.round(${get(i)} / $scale);
          }
        }
        Object[] $fields = new Object[2];
        $fields[0] = $scale;
        $fields[1] = $codes;
        ${ev.value} = new $rowCls($fields);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** quantized_cosine(qa, qb) over two quantize_int8 structs — integer MAC,
  * scale-free (see [[QuantizeInt8]]). Zero-norm (all-zero codes) → NULL,
  * matching cosine_sim's convention.
  */
case class QuantizedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "quantized_cosine"

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case s: StructType =>
        s.length == 2 && s(1).dataType == BinaryType
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two quantize_int8 structs, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ca = a.asInstanceOf[InternalRow].getBinary(1)
    val cb = b.asInstanceOf[InternalRow].getBinary(1)
    val n = math.min(ca.length, cb.length)
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val x = ca(i).toLong; val y = cb(i).toLong
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0L || nb == 0L) null
    else java.lang.Double.valueOf(
      dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName'd locals — see QuantizeInt8.doGenCode.
      val ca = ctx.freshName("ca"); val cb = ctx.freshName("cb")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
        byte[] $ca = $a.getBinary(1);
        byte[] $cb = $b.getBinary(1);
        int $n = Math.min($ca.length, $cb.length);
        long $dot = 0L, $na = 0L, $nb = 0L;
        for (int $i = 0; $i < $n; $i++) {
          long $x = $ca[$i]; long $y = $cb[$i];
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        if ($na == 0L || $nb == 0L) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / (Math.sqrt((double) $na) * Math.sqrt((double) $nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizeExpressions {

  /** (scale DOUBLE, codes BINARY): codes are signed int8, scale dequantizes. */
  val quantizedType: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", BinaryType, nullable = false)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("quantize_int8"))) {
      reg.createOrReplaceTempFunction("quantize_int8",
        exprs => QuantizeInt8(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("quantized_cosine",
        exprs => QuantizedCosine(exprs(0), exprs(1)), "built-in")
    }
  }
}
