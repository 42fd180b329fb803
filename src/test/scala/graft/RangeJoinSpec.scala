package graft

import graft.operators.RangeJoin

/** Banded range join == naive inequality join on a fixture with boundary
  * values, overlapping intervals, and band-straddling intervals. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches naive inequality join incl. boundaries and overlaps") {
    val points = Seq((1, 0.0), (2, 9.99), (3, 10.0), (4, 15.5), (5, 100.0))
      .toDF("pid", "v")
    val intervals = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 5.0, 99.9))
      .toDF("name", "lo", "hi")

    val banded = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi",
        bandWidth = 7.0)
      .select("pid", "name").as[(Int, String)].collect().toSet

    val naive = points.join(intervals,
        points("v") >= intervals("lo") && points("v") <= intervals("hi"))
      .select("pid", "name").as[(Int, String)].collect().toSet

    assert(banded == naive)
    assert(banded.contains((3, "a")) && banded.contains((3, "b"))) // inclusive
    assert(!banded.exists(_._1 == 5) || naive.exists(_._1 == 5))
  }
}
