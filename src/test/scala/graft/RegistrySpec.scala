package graft

import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

import graft.registry.{CastKind, Registry}

/** Registry contract tests mirroring the intent of the reference's planned
  * tests/test_registry.py (/root/reference/architecture.md:134-137): schema
  * shape, PK sanity, alias hygiene, type inventory (SURVEY §1.2: 66 INTEGER,
  * 22 TEXT, 2 DOUBLE for the directory endpoint).
  */
class RegistrySpec extends SparkSpec {

  private val dir = Registry.directory

  test("directory declares exactly the reference's 89-column contract") {
    // Counted directly from registry.py:49-161: 89 columns — 64 INTEGER,
    // 23 TEXT, 2 DOUBLE PRECISION. (SURVEY §1.2's 66/22 tally was off by
    // county_name/date_closed bookkeeping; the registry itself is truth.)
    assert(dir.columns.size == 89)
    assert(dir.columns.count(_.kind == CastKind.AsInt) == 64)
    assert(dir.columns.count(_.kind == CastKind.AsString) == 23)
    assert(dir.columns.count(_.kind == CastKind.AsDouble) == 2)
  }

  test("PK ⊆ schema, PK columns non-nullable, no duplicate targets") {
    val targets = dir.columns.map(_.target)
    assert(dir.primaryKey.forall(targets.contains))
    assert(dir.primaryKey == Seq("unitid", "year"))
    dir.primaryKey.foreach(k => assert(!dir.schema(k).nullable))
    assert(targets.distinct.size == targets.size)
  }

  test("every alias list starts with the target name or is the target") {
    dir.columns.foreach { c =>
      assert(c.aliases.nonEmpty)
      assert(c.aliases.head == c.target,
        s"${c.target}: primary alias should be the canonical field name")
    }
  }

  test("types: lat/long are the only doubles; date_closed stays TEXT") {
    assert(dir.schema("latitude").dataType == DoubleType)
    assert(dir.schema("longitude").dataType == DoubleType)
    assert(dir.schema("date_closed").dataType == StringType)
    assert(dir.schema("unitid").dataType == IntegerType)
  }

  test("unknown endpoint fails with the known-endpoints message") {
    val e = intercept[IllegalArgumentException](Registry.endpoint("nope"))
    assert(e.getMessage.contains("directory"))
  }
}
