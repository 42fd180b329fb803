package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Salting

object Bench {

  /** Skew twins over events: the SAME logical work on a uniform key vs a
    * hot key (~30% of rows collapse onto one key), unmitigated vs
    * mitigated (salting; AQE skew-split covers the join). Joins force
    * sort-merge — the dim is small enough to broadcast, which would hide
    * the skew this suite exists to measure. Reported under "skew" (not
    * counted into "total", which stays round-over-round comparable);
    * the claim to check: mitigated hot-key runs within ~2x of the
    * uniform twin. */
  private def skewQueries(spark: SparkSession, sfDir: String)
      : Seq[(String, () => DataFrame)] = {
    def events = graft.core.Tables.load(spark, sfDir, "events")
    def uniform = events.withColumn("k", col("user_id").cast("long"))
    // Deterministic hot key: ~30% of rows land on k = -1.
    def hot = events.withColumn("k",
      when(pmod(hash(col("user_id")), lit(10)) < 3, lit(-1L))
        .otherwise(col("user_id").cast("long")))
    def dimOf(df: => DataFrame) = df.select("k").distinct()
      .withColumn("attr", pmod(col("k"), lit(97)))
    val aggPartial = Seq(sum(col("value")).as("s"), count(lit(1)).as("c"))
    val aggFinal = Seq(sum(col("s")).as("s"), sum(col("c")).as("c"))
    Seq(
      "skew_agg_uniform" -> (() =>
        uniform.groupBy("k").agg(sum(col("value")).as("s"), count(lit(1)).as("c"))),
      "skew_agg_hot_unsalted" -> (() =>
        hot.groupBy("k").agg(sum(col("value")).as("s"), count(lit(1)).as("c"))),
      "skew_agg_hot_salted" -> (() =>
        Salting.saltedAgg(hot, Seq("k"), buckets = 16, aggPartial, aggFinal)),
      "skew_join_uniform" -> (() =>
        uniform.join(dimOf(uniform).hint("merge"), "k")),
      "skew_join_hot_aqe" -> (() =>
        hot.join(dimOf(hot).hint("merge"), "k")),
      "skew_join_hot_salted" -> (() =>
        Salting.saltedJoin(hot, dimOf(hot).hint("merge"), "k", buckets = 16)))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = graft.core.GraftSession.tune(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup outside timing: JVM/codegen/filesystem-cache costs shouldn't
    // land on whichever query happens to run first.
    graft.core.Tables.All.foreach { t =>
      try graft.core.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // Pre-build the persisted BM25 index here too, timing it separately:
    // q89 exists to measure INDEXED SEARCH latency; folding the one-off
    // build into its first timed pass measured a write job instead. The
    // build cost still travels in the JSON (`bm25_index_build_sec`).
    val bm25BuildSec: Option[Double] =
      try {
        val t0 = System.nanoTime()
        graft.queries.RetrievalQueries.indexFor(spark, sfDir)
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] bm25 index prebuild FAILED: ${e.getMessage}")
        None
      }
    // Same discipline for the multimodal dedup signatures (q100/q102/
    // q103): the synth+decode+hash corpus pass is the one-off a dedup
    // pipeline persists; the queries measure the banded pair joins.
    val mediaSigBuildSec: Option[Double] =
      try {
        val t0 = System.nanoTime()
        graft.queries.StreamMultimodalQueries.signaturesFor(spark, sfDir)
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] media signature prebuild FAILED: ${e.getMessage}")
        None
      }
    // Local-iteration filter (comma-separated names); the driver never
    // sets it, so the recorded bench always covers the full surface.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val mainQs: Seq[(String, () => DataFrame)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) => name -> (() => fn(spark, sfDir)) }
    val skewQs =
      if (only.isEmpty) skewQueries(spark, sfDir)
      else Seq.empty[(String, () => DataFrame)]

    // Interleaved min-of-N: this box shows 2-3x wall-clock variance under
    // load, and back-to-back repeats of one query share whatever transient
    // the box is in. Full-suite passes put each query's repeats minutes
    // apart, so the per-query min across passes is the least-noisy
    // estimator of real plan cost (pass 1 additionally absorbs codegen).
    val timings = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    // Per-pass calibration probe: a fixed CPU-bound job whose cost is
    // data- and code-independent. Its per-pass times travel in the JSON so
    // a reader can tell "the code got slower" from "the box was loaded" —
    // sustained external load inflates probe and queries alike, and
    // min-of-N cannot remove what affects every pass.
    val probeTimes = scala.collection.mutable.ListBuffer[Double]()
    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    for (_ <- 1 to passes) {
      probeTimes += probe()
      for ((name, build) <- mainQs ++ skewQs) {
        val t0 = System.nanoTime()
        val ok =
          try { build().count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        // A failed query reports -1 so a crash can never masquerade as fast.
        val t = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        timings(name) = t :: timings(name)
      }
    }
    // A failed query reports null (never a number): a -1 sentinel inside
    // the timing maps silently SUBTRACTS from any consumer that sums or
    // averages them. The crash signal travels separately in "failed".
    def best(name: String): Option[Double] = {
      val ts = timings(name)
      if (ts.contains(-1.0)) None else Some(ts.min)
    }
    // MEDIAN is the regression-gate estimator: min-of-N is the best
    // plan-cost proxy on a quiet box, but a load transient during ONE
    // pass can still fake a cross-round regression (or hide one) in a
    // min — the median of interleaved passes is robust to a single
    // loaded pass, so round-over-round claims compare medians.
    def median(name: String): Option[Double] = {
      val ts = timings(name)
      if (ts.contains(-1.0)) None
      else Some(ts.sorted.apply(ts.size / 2))
    }
    def jsonMap(qs: Seq[(String, () => DataFrame)]): String =
      qs.map { case (k, _) =>
        s"\"" + k + "\":" + best(k).map(_.toString).getOrElse("null")
      }.mkString("{", ",", "}")
    def jsonMedianMap(qs: Seq[(String, () => DataFrame)]): String =
      qs.map { case (k, _) =>
        s"\"" + k + "\":" + median(k).map(t => f"$t%.3f").getOrElse("null")
      }.mkString("{", ",", "}")
    val failed = (mainQs ++ skewQs).collect {
      case (k, _) if best(k).isEmpty => k
    }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Per-query [min, median, max] across the interleaved passes: a
    // cross-round comparison can classify a swing as noise (spreads
    // overlap) vs a real plan change (disjoint spreads) without a rerun —
    // this box's idle-vs-loaded drift is ~25% (see probe_sec).
    def spreadJson(qs: Seq[(String, () => DataFrame)]): String =
      qs.map { case (k, _) =>
        if (best(k).isEmpty) s"\"" + k + "\":null"
        else {
          val ts = timings(k).sorted
          val med = ts(ts.size / 2)
          s"\"" + k + "\":[" + f"${ts.head}%.3f,$med%.3f,${ts.last}%.3f" + "]"
        }
      }.mkString("{", ",", "}")
    // Pass-1 time per query (timings are PREPENDED per pass, so pass 1 is
    // the list's last element): the honest COLD cost for queries whose
    // operators .cache() shared subtrees — later passes (and queries
    // sharing a canonically-equal cached plan, e.g. q38 reading q52's
    // fingerprint cache) read warm CacheManager entries, so their min
    // under-reports a cold run. Additions-only: travels in the file
    // sidecar, never the printed driver line.
    def pass1Json(qs: Seq[(String, () => DataFrame)]): String =
      qs.map { case (k, _) =>
        if (best(k).isEmpty) s"\"" + k + "\":null"
        else s"\"" + k + "\":" + f"${timings(k).last}%.3f"
      }.mkString("{", ",", "}")
    val total = mainQs.flatMap { case (k, _) => best(k) }.sum
    val probeJson = probeTimes.map(t => f"$t%.3f").mkString("[", ",", "]")
    // The full record (per-query spreads included) goes to a FILE: the
    // driver's stdout capture keeps only the tail of long lines, which
    // truncated BENCH_r05/r06 into unparseable fragments. The printed
    // line stays ONE JSON object (the driver contract) but drops the
    // spread maps so it fits the capture window; `bench_out.json` in the
    // repo carries everything for round-over-round comparison.
    val buildJson = bm25BuildSec.map(t => f"$t%.3f").getOrElse("null")
    val sigJson = mediaSigBuildSec.map(t => f"$t%.3f").getOrElse("null")
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(mainQs)},"queries_median":${jsonMedianMap(mainQs)},"queries_spread":${spreadJson(mainQs)},"queries_pass1":${pass1Json(mainQs)},"skew":${jsonMap(skewQs)},"skew_spread":${spreadJson(skewQs)},"failed":$failedJson,"passes":$passes,"probe_sec":$probeJson,"bm25_index_build_sec":$buildJson,"media_sig_build_sec":$sigJson,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(mainQs)},"skew":${jsonMap(skewQs)},"failed":$failedJson,"passes":$passes,"probe_sec":$probeJson,"bm25_index_build_sec":$buildJson,"media_sig_build_sec":$sigJson,"full":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
