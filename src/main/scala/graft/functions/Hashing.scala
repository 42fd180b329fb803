package graft.functions

import java.security.MessageDigest

import com.fasterxml.jackson.databind.{ObjectMapper, SerializationFeature}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** T10: canonical content hashing.
  *
  * Reference contract (/root/reference/etl/raw_io.py:57-70): sha1 over the
  * page serialized as JSON with sorted keys and compact separators, so the
  * digest is independent of JSON key order and whitespace. Non-JSON types are
  * coerced via str() (`default=str`) — for our string-payload pipeline that
  * case cannot arise (input is already JSON text).
  *
  * Two forms:
  *   - [[canonicalSha1]]: exact sorted-key semantics over arbitrary JSON
  *     text. Jackson-based UDF (Jackson ships with Spark). Used by RawStore
  *     where the reference's digest must be reproduced.
  *   - [[structSha1]]: `sha1(to_json(struct))` over a FIXED schema — structs
  *     serialize in schema order, so declaring canonical = schema order keeps
  *     the whole computation inside codegen (no UDF). Preferred for new
  *     tables we control (decision recorded in SURVEY.md §4).
  */
object Hashing {

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(SerializationFeature.ORDER_MAP_ENTRIES_BY_KEYS, true)
    m.setNodeFactory(new JsonNodeFactory(true)) // exact BigDecimals
    m
  }

  /** Sorted-key, compact-separator re-serialization of a JSON document. */
  def canonicalJson(jsonText: String): String = {
    // Jackson sorts map entries only for Java Maps, not ObjectNodes — round
    // trip through the untyped Object binding so objects become TreeMap-able.
    val obj = mapper.readValue(jsonText, classOf[Object])
    mapper.writeValueAsString(sortDeep(obj))
  }

  private def sortDeep(v: Object): Object = v match {
    case m: java.util.Map[_, _] =>
      val t = new java.util.TreeMap[String, Object]()
      m.forEach((k, v2) => t.put(String.valueOf(k), sortDeep(v2.asInstanceOf[Object])))
      t
    case l: java.util.List[_] =>
      val out = new java.util.ArrayList[Object](l.size())
      l.forEach(e => out.add(sortDeep(e.asInstanceOf[Object])))
      out
    case other => other
  }

  def sha1Hex(s: String): String =
    MessageDigest.getInstance("SHA-1").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Driver-side form used by the connector when building page rows. */
  def canonicalSha1String(jsonText: String): String =
    sha1Hex(canonicalJson(jsonText))

  /** Column form (UDF). Register once per session via [[register]]. */
  def canonicalSha1(c: Column)(implicit spark: SparkSession): Column = {
    register(spark)
    call_udf("canonical_sha1", c)
  }

  def register(spark: SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("canonical_sha1"))) {
      spark.udf.register("canonical_sha1",
        (s: String) => if (s == null) null else canonicalSha1String(s))
    }

  /** Codegen path: digest of a struct of columns in declared (schema) order. */
  def structSha1(cols: Column*): Column = sha1(to_json(struct(cols: _*)))
}
