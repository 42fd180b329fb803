package graft.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized [[BloomFilter]] — the broadcast-
  * size lever for set-membership prefilters at 100 TB.
  *
  * Shape: the small side (e.g. a benchmark shingle set) is summarized as a
  * Bloom filter (~`-1.44·log2(fpp)` BITS per item, so an fpp=0.01 filter
  * over 1 M shingles is ~1.2 MB vs tens of MB of strings), embedded in the
  * plan as a BINARY literal, and probed map-side on the big side's scan.
  * No false negatives — every true member passes — so an exact verify of
  * the survivors (a join against the real set) yields the exact answer
  * while only `matches + fpp·|bigSide|` rows reach the shuffle. Same
  * pattern Spark's own `InjectRuntimeFilter` applies to join keys
  * (public: `catalyst/optimizer/InjectRuntimeFilter.scala`); surfaced
  * here as a first-class expression so operators can prefilter on
  * NON-join-key derived values (shingles exploded from text).
  *
  * The filter deserializes once per task JVM (transient lazy), not per
  * row; the literal rides the stage's task binary, which Spark broadcasts
  * once per stage. Probes use the UTF-8 bytes of the string — the same
  * bytes `BloomFilter.putString` hashes on the build side.
  */
case class BloomMightContain(bloomBytes: Expression, value: Expression)
    extends BinaryExpression {

  override def left: Expression = bloomBytes
  override def right: Expression = value
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (bloomBytes.dataType, value.dataType) match {
      case (BinaryType, StringType) if bloomBytes.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (b, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (foldable BINARY, STRING), got " +
          s"(${b.catalogString}, ${v.catalogString})")
    }

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloomBytes.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: bloom filter bytes are null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Called from both interpreted eval and generated code. */
  def mightContain(v: UTF8String): Boolean =
    filter.mightContainBinary(v.getBytes)

  override def nullSafeEval(b: Any, v: Any): Any =
    mightContain(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.mightContain($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bloomBytes = newLeft, value = newRight)
}

object BloomExpressions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("bloom_might_contain"))) {
      reg.createOrReplaceTempFunction("bloom_might_contain",
        exprs => BloomMightContain(exprs(0), exprs(1)), "built-in")
    }
  }
}
