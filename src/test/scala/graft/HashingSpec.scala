package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** T10: canonical hash must equal the reference's
  * `sha1(json.dumps(obj, sort_keys=True, separators=(",",":")))`
  * (/root/reference/etl/raw_io.py:57-70). Golden digests computed with
  * CPython's json+hashlib on the same inputs.
  */
class HashingSpec extends SparkSpec {
  import spark.implicits._

  private val nested = """[{"b":1,"a":"x"},{"z":null,"y":[3,2,{"q":true}]}]"""

  test("golden parity with Python json.dumps sorted/compact") {
    assert(Hashing.canonicalSha1String(nested)
      == "9e33b433b8951ec7008bacd6621b88cd3fd32098")
    assert(Hashing.canonicalSha1String(
      """{"unitid": 100654, "inst_name": "Alabama A & M University", "latitude": 34.783368}""")
      == "e391854c8873b9cfac7baacf15dae4cd49fc876f")
    assert(Hashing.canonicalSha1String("[]")
      == "97d170e1550eee4afc0af065b78cda302a97674c")
  }

  test("hash is invariant under key reordering and whitespace") {
    val reordered = """[ {"a":"x", "b":1}, {"y":[3,2,{"q":true}], "z":null} ]"""
    assert(Hashing.canonicalSha1String(nested)
      == Hashing.canonicalSha1String(reordered))
  }

  test("hash distinguishes different content") {
    val changed = """[{"b":2,"a":"x"},{"z":null,"y":[3,2,{"q":true}]}]"""
    assert(Hashing.canonicalSha1String(nested)
      != Hashing.canonicalSha1String(changed))
  }

  test("UDF column form matches driver-side form") {
    Hashing.register(spark)
    val got = Seq(Tuple1(nested)).toDF("payload")
      .select(call_udf("canonical_sha1", col("payload")).as("h"))
      .collect()(0).getString(0)
    assert(got == Hashing.canonicalSha1String(nested))
  }

  test("structSha1 is deterministic in schema order (codegen path)") {
    val df = Seq((1, "a"), (1, "a")).toDF("x", "y")
    val hs = df.select(Hashing.structSha1(col("x"), col("y")).as("h"))
      .collect().map(_.getString(0))
    assert(hs(0) == hs(1) && hs(0).length == 40)
  }
}
