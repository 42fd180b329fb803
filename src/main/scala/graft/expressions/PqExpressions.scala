package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels — the memory lever for ANN at 100 TB
  * (complements the int8 path in [[QuantizeExpressions]]: int8 compresses
  * 4x, PQ compresses dim*4/m bytes-per-vector, 32x at dim=64/m=8).
  *
  * A vector splits into `m` subvectors of `dsub = dim/m` dims; each
  * subvector is replaced by the id (one byte, ks <= 256) of its nearest
  * centroid in that subspace's codebook. Search never decodes: a query
  * builds an m x ks lookup table of exact subspace dot products
  * driver-side, and a code's approximate dot product is m table lookups
  * (ADC — asymmetric distance computation, Jégou et al., TPAMI 2011).
  *
  * Codebooks/LUTs ride the expression as literals (addReferenceObj in
  * codegen) — scans stay shuffle-free and whole-stage-codegen'd; only
  * `m`-byte codes ever land in a shuffle or cache.
  */
case class PqEncode(child: Expression, codebooks: Array[Double],
                    m: Int, ks: Int, dsub: Int) extends UnaryExpression {

  override def prettyName: String = "pq_encode"

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${other.catalogString}")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** codebooks layout: [(j*ks + c)*dsub + d] for subspace j, centroid c,
    * dim d. Argmin by squared L2; ties take the FIRST centroid (strict <),
    * so assignment is deterministic and oracle-replicable. */
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val isFloat = elemIsFloat
    val code = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var bestC = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ks) {
        var d2 = 0.0; var d = 0
        val base = (j * ks + c) * dsub
        while (d < dsub) {
          val idx = j * dsub + d
          val v = if (idx < arr.numElements()) {
            if (isFloat) arr.getFloat(idx).toDouble else arr.getDouble(idx)
          } else 0.0
          val diff = v - codebooks(base + d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; bestC = c }
        c += 1
      }
      code(j) = bestC.toByte
      j += 1
    }
    code
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
      val get =
        if (elemIsFloat) (i: String) => s"(double) $a.getFloat($i)"
        else (i: String) => s"$a.getDouble($i)"
      // freshName'd locals — see QuantizeInt8.doGenCode.
      val code = ctx.freshName("code"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val bestC = ctx.freshName("bestC"); val bestD = ctx.freshName("bestD")
      val d2 = ctx.freshName("d2"); val base = ctx.freshName("base")
      val idx = ctx.freshName("idx"); val v = ctx.freshName("v")
      val diff = ctx.freshName("diff")
      s"""
        byte[] $code = new byte[$m];
        for (int $j = 0; $j < $m; $j++) {
          int $bestC = 0;
          double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $ks; $c++) {
            double $d2 = 0.0;
            int $base = ($j * $ks + $c) * $dsub;
            for (int $d = 0; $d < $dsub; $d++) {
              int $idx = $j * $dsub + $d;
              double $v = $idx < $a.numElements() ? ${get(idx)} : 0.0;
              double $diff = $v - $cb[$base + $d];
              $d2 += $diff * $diff;
            }
            if ($d2 < $bestD) { $bestD = $d2; $bestC = $c; }
          }
          $code[$j] = (byte) $bestC;
        }
        ${ev.value} = $code;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_adc_dot(code): approximate dot(query, vector) as m lookups into the
  * query's precomputed subspace dot-product table (flat [j*ks + code[j]]).
  * Branch-free, no decode, no shuffle — the LUT is a literal. */
case class PqAdcDot(child: Expression, lut: Array[Double],
                    m: Int, ks: Int) extends UnaryExpression {

  override def prettyName: String = "pq_adc_dot"

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY pq codes, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val code = input.asInstanceOf[Array[Byte]]
    var s = 0.0
    var j = 0
    val n = math.min(m, code.length)
    while (j < n) {
      s += lut(j * ks + (code(j) & 0xff))
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val t = ctx.addReferenceObj("pqLut", lut, "double[]")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      s"""
        double $s = 0.0;
        int $n = Math.min($m, $a.length);
        for (int $j = 0; $j < $n; $j++) {
          $s += $t[$j * $ks + ($a[$j] & 0xff)];
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
