package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.registry.{CastKind, EndpointConfig, Registry}

/** T6 as ONE native Catalyst expression: MAP<STRING,STRING> record →
  * fully-typed struct of every registry column.
  *
  * Why not the composed-builtins mapper (registry/ColumnSpec.expr):
  *   - 89 columns × alias lists of element_at+trim+isin+regexp trees blow
  *     the generated doConsume past janino's 64KB method limit — the whole
  *     stage silently falls back to interpreted execution;
  *   - each element_at is an O(|map|) scan, so a record is traversed
  *     ~hundreds of times per row.
  * This expression generates a single static call (tiny codegen footprint —
  * whole-stage codegen survives) and traverses the record map ONCE,
  * claiming each output slot by best (lowest) alias priority with a
  * non-missing value.
  *
  * Semantics are identical to the column path and the reference
  * (pick-first-non-missing THEN cast, directory.py:126-238): both paths
  * are cross-checked on the pipeline fixture in PipelineSpec.
  */
case class MapRegistryRecord(child: Expression, endpointName: String)
    extends UnaryExpression {

  @transient private lazy val plan = RecordMapperPlan(Registry.endpoint(endpointName))

  override def prettyName: String = "map_registry_record"

  override def dataType: DataType = StructType(
    Registry.endpoint(endpointName).columns.map(c =>
      StructField(c.target, c.dataType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires MAP<STRING,STRING>, got ${other.catalogString}")
  }

  override def nullSafeEval(m: Any): Any = plan.eval(m.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, m => {
      val planRef = ctx.addReferenceObj("recordMapperPlan", plan,
        classOf[RecordMapperPlan].getName)
      s"${ev.value} = (InternalRow) $planRef.eval($m);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Driver-built, executor-shipped mapping plan. Alias lookup structures are
  * rebuilt lazily per executor (UTF8String-keyed for allocation-free probes). */
final class RecordMapperPlan(
    val targets: Array[String],
    val kinds: Array[Int],            // 0=int 1=double 2=string
    val aliasNames: Array[String],    // flattened alias table
    val aliasSlots: Array[Int],
    val aliasPriorities: Array[Int]) extends Serializable {

  import RecordMapperPlan._

  @transient private lazy val index: java.util.HashMap[UTF8String, Array[Long]] = {
    val tmp = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Long]]()
    var i = 0
    while (i < aliasNames.length) {
      tmp.computeIfAbsent(aliasNames(i), _ => scala.collection.mutable.ArrayBuffer()) +=
        ((aliasSlots(i).toLong << 32) | (aliasPriorities(i).toLong & 0xffffffffL))
      i += 1
    }
    val out = new java.util.HashMap[UTF8String, Array[Long]](tmp.size * 2)
    tmp.forEach((k, v) => out.put(UTF8String.fromString(k), v.toArray))
    out
  }

  def eval(m: MapData): InternalRow = {
    val n = targets.length
    val bestPrio = new Array[Int](n)
    java.util.Arrays.fill(bestPrio, Int.MaxValue)
    val picked = new Array[UTF8String](n)

    val keys = m.keyArray()
    val vals = m.valueArray()
    var i = 0
    val total = m.numElements()
    while (i < total) {
      if (!keys.isNullAt(i)) {
        val entries = index.get(keys.getUTF8String(i))
        if (entries != null) {
          val v = if (vals.isNullAt(i)) null else vals.getUTF8String(i)
          var j = 0
          while (j < entries.length) {
            val slot = (entries(j) >>> 32).toInt
            val prio = entries(j).toInt
            if (prio < bestPrio(slot)) {
              val cleaned = cleanValue(v)
              if (cleaned != null) {
                bestPrio(slot) = prio
                picked(slot) = cleaned
              }
            }
            j += 1
          }
        }
      }
      i += 1
    }

    val out = new Array[Any](n)
    var s = 0
    while (s < n) {
      val r = picked(s)
      if (r != null) out(s) = kinds(s) match {
        case KindInt => parseIntStrict(r)
        case KindDouble => parseDoubleSafe(r)
        case _ => r
      }
      s += 1
    }
    new GenericInternalRow(out)
  }
}

object RecordMapperPlan {
  val KindInt = 0
  val KindDouble = 1
  val KindString = 2

  def apply(endpoint: EndpointConfig): RecordMapperPlan = {
    val names = scala.collection.mutable.ArrayBuffer[String]()
    val slots = scala.collection.mutable.ArrayBuffer[Int]()
    val prios = scala.collection.mutable.ArrayBuffer[Int]()
    endpoint.columns.zipWithIndex.foreach { case (c, slot) =>
      c.aliases.zipWithIndex.foreach { case (a, prio) =>
        names += a; slots += slot; prios += prio
      }
    }
    new RecordMapperPlan(
      endpoint.columns.map(_.target).toArray,
      endpoint.columns.map(_.kind match {
        case CastKind.AsInt => KindInt
        case CastKind.AsDouble => KindDouble
        case CastKind.AsString => KindString
      }).toArray,
      names.toArray, slots.toArray, prios.toArray)
  }

  private val sentinels = Set("-1", "-2", "-3")

  /** T1/T5 on UTF8String: trim; empty/sentinel → null (missing). Matches
    * the Column path exactly (Spark `trim` = space-trim). */
  def cleanValue(v: UTF8String): UTF8String = {
    if (v == null) return null
    val t = v.trim()
    if (t.numBytes() == 0) return null
    val s = t.toString
    if (sentinels.contains(s)) null else t
  }

  /** T3 on the picked value: strict integer literal or null — mirrors
    * regexp '^[+-]?[0-9]+$' + non-ANSI int cast (overflow → null). */
  def parseIntStrict(t: UTF8String): Integer = {
    val s = t.toString
    var i = 0
    if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
    if (i >= s.length) return null
    var k = i
    while (k < s.length) {
      val c = s.charAt(k)
      if (c < '0' || c > '9') return null
      k += 1
    }
    try Integer.valueOf(java.lang.Integer.parseInt(s))
    catch { case _: NumberFormatException => null } // overflow → null
  }

  /** T4: non-ANSI double-cast semantics (malformed → null). */
  def parseDoubleSafe(t: UTF8String): java.lang.Double = {
    try java.lang.Double.valueOf(t.toString.trim)
    catch { case _: NumberFormatException => null }
  }
}
