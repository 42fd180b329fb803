package graft

import graft.functions.Winnowing

/** Winnowing guarantees on constructed docs: shared long substrings share a
  * fingerprint; disjoint texts don't collide; short docs still fingerprint. */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("docs sharing a >= k+w-1 substring share a fingerprint") {
    val shared = "the quick brown fox jumps over everything here"
    val docs = Seq(
      (1L, s"prefix AAA $shared suffix BBB"),
      (2L, s"totally different start $shared and another end"),
      (3L, "no overlap with the others at all in this one zzz qqq"))
      .toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(docs, "doc_id", "text")
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared substring must collide")
    assert((fps(1L) & fps(3L)).isEmpty, "disjoint texts must not collide")
  }

  test("short documents (< k chars) still produce one fingerprint") {
    val docs = Seq((1L, "tiny")).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(docs, "doc_id", "text").collect()
    assert(fps.length == 1)
  }

  test("fingerprints are deterministic") {
    val docs = Seq((1L, "some document body long enough for several windows"))
      .toDF("doc_id", "text")
    val a = Winnowing.fingerprints(docs, "doc_id", "text")
      .orderBy("fingerprint").collect().toSeq
    val b = Winnowing.fingerprints(docs, "doc_id", "text")
      .orderBy("fingerprint").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
