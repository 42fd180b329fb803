package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.core.Tables

/** Schema contract over the driver-generated testdata fixtures.
  *
  * The reference plans exactly this class of test for its own inputs
  * ("alert if API fields drift", architecture.md:170-174). The round-7
  * events.parquet regeneration (TIMESTAMP(NANOS)-as-long → TIMESTAMP_NTZ
  * micros) surfaced as three distant stack traces and one silently-wrong
  * streaming result; this spec exists so the next fixture drift fails HERE,
  * with a one-line message naming the table.column and both encodings.
  */
class FixtureContractSpec extends SparkSpec {

  /** Expected Spark-read physical schema per fixture table, as
    * `col:TYPE` pairs (TYPE = Catalyst `DataType.sql`). Pinned to what the
    * round-8 driver actually generates; a regen that changes any physical
    * type must update this table CONSCIOUSLY, alongside whatever
    * normalization the new encoding needs.
    */
  private val expected: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey:INT", "r_name:STRING"),
    "nation" -> Seq("n_nationkey:INT", "n_name:STRING", "n_regionkey:INT"),
    "customer" -> Seq("c_custkey:BIGINT", "c_name:STRING",
      "c_nationkey:INT", "c_acctbal:DOUBLE", "c_mktsegment:STRING"),
    "supplier" -> Seq("s_suppkey:BIGINT", "s_name:STRING",
      "s_nationkey:INT", "s_acctbal:DOUBLE"),
    "part" -> Seq("p_partkey:BIGINT", "p_name:STRING", "p_brand:STRING",
      "p_type:STRING", "p_size:INT", "p_retailprice:DOUBLE"),
    "orders" -> Seq("o_orderkey:BIGINT", "o_custkey:BIGINT",
      "o_orderstatus:STRING", "o_totalprice:DOUBLE",
      "o_orderdate:TIMESTAMP_NTZ", "o_orderpriority:STRING"),
    "lineitem" -> Seq("l_orderkey:BIGINT", "l_partkey:BIGINT",
      "l_suppkey:BIGINT", "l_linenumber:INT", "l_quantity:DOUBLE",
      "l_extendedprice:DOUBLE", "l_discount:DOUBLE", "l_tax:DOUBLE",
      "l_returnflag:STRING", "l_linestatus:STRING",
      "l_shipdate:TIMESTAMP_NTZ"),
    "events" -> Seq("event_id:BIGINT", "ts:TIMESTAMP_NTZ", "user_id:BIGINT",
      "event_type:STRING", "value:DOUBLE", "props:STRING"),
    "documents" -> Seq("doc_id:BIGINT", "text:STRING", "lang:STRING",
      "source:STRING", "n_chars:BIGINT"),
    "embeddings" -> Seq("vec_id:BIGINT", "embedding:ARRAY<FLOAT>",
      "label:INT"))

  test("every fixture table matches its pinned physical schema") {
    val drifted = Tables.All.flatMap { t =>
      val actual = spark.read.parquet(s"${sf()}/$t.parquet")
        .schema.fields.map(f => s"${f.name}:${f.dataType.sql}").toSeq
      val exp = expected(t)
      if (actual == exp) Nil
      else {
        val pairs = exp.map(Option(_)).zipAll(actual.map(Option(_)), None, None)
        pairs.collect { case (e, a) if e != a =>
          s"$t.${a.orElse(e).get.takeWhile(_ != ':')}: " +
            s"expected ${e.getOrElse("<absent>")}, got ${a.getOrElse("<absent>")}"
        }
      }
    }
    assert(drifted.isEmpty,
      s"\nFIXTURE DRIFT — update Tables normalization + this contract:\n  " +
        drifted.mkString("\n  "))
  }

  test("events.ts physical encoding is one the loader normalizes") {
    val raw = spark.read.parquet(s"${sf()}/events.parquet").schema("ts").dataType
    assert(raw == TimestampNTZType,
      s"events.ts fixture encoding changed: now $raw (was TIMESTAMP_NTZ " +
        "micros in round 8; long nanos before round 7) — " +
        "Tables.normalizeEventTs must handle it")
    // Whatever the encoding, the loader's output contract is a session-TZ
    // TIMESTAMP — this is what every downstream time op depends on.
    assert(Tables.load(spark, sf(), "events").schema("ts").dataType
      == TimestampType)
  }
}
