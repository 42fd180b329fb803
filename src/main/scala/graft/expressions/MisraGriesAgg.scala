package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a [[TypedImperativeAggregate]] —
  * the bounded-memory candidate pass for exact corpus-wide top-k at
  * 100 TB (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012).
  *
  * Why not a plain `groupBy(token).count()`: its map-side combine holds
  * one counter per DISTINCT key per partition, and on web-scale text the
  * long tail (urls, typos, hashes) makes per-partition distincts scale
  * with the data — memory and shuffle both corpus-proportional. This
  * sketch holds AT MOST `capacity` counters per partition and ships
  * exactly one ≤`capacity`-entry summary per partition to the final
  * merge, whatever the vocabulary size.
  *
  * Guarantee (survives any merge tree, so Spark's partial/final split and
  * nondeterministic merge ORDER are safe): every item with true count
  * > N/(capacity+1) is retained. Callers that need exactness re-count the
  * returned candidates exactly and top-k over that — see
  * [[graft.operators.HeavyHitters.topKNgrams]]; the result is provably
  * the true top-k whenever the k-th true count clears the threshold.
  *
  * Update is classic MG: hit → increment; miss with room → insert at 1;
  * miss when full → decrement ALL counters by 1, dropping zeros (each
  * decrement is funded by one prior increment, so total work is O(N)
  * amortized). Merge sums counters, then trims to `capacity` by
  * subtracting the (capacity+1)-th largest count from all (the PODS'12
  * rule — error stays ≤ N/(capacity+1) after any sequence of merges).
  *
  * eval returns the candidate ITEMS sorted (no counts): MG counts are
  * lower bounds, not usable as answers, and the two-pass caller re-counts
  * anyway. The candidate SET may vary with merge order at the trim
  * boundary; everything above the error threshold is present in every
  * ordering, which is what the exactness argument needs.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def prettyName: String = "mg_candidates"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.catalogString}")
    else if (capacity < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName capacity must be >= 1, got $capacity")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // toString copies out of the (reused) unsafe row buffer.
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None =>
          if (buf.size < capacity) buf.update(key, 1L)
          else {
            buf.mapValuesInPlace((_, c) => c - 1L)
            buf.filterInPlace((_, c) => c > 0L)
          }
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (k, c) => b1.update(k, b1.getOrElse(k, 0L) + c) }
    if (b1.size > capacity) {
      val cut = b1.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.filterInPlace((_, c) => c > 0L)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(buf.keysIterator.toArray.sorted
      .map(k => UTF8String.fromString(k).asInstanceOf[Any]))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object MisraGriesAgg {

  /** The capacity argument must be a foldable INT literal — it sizes
    * executor-side state, so a per-row value is meaningless. */
  private def extractCapacity(e: Expression): Int = {
    require(e.foldable && e.dataType == IntegerType,
      s"mg_candidates capacity must be a foldable INT, got $e")
    e.eval(null).asInstanceOf[Int]
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier("mg_candidates"))) {
      reg.createOrReplaceTempFunction("mg_candidates",
        exprs => MisraGriesAgg(exprs(0), extractCapacity(exprs(1))), "built-in")
    }
  }
}
