package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.expressions.TextShingleExpressions
import graft.operators.Upsert

/** Differential + algebraic property tests (SURVEY §5):
  *
  *   - the native text kernels (winnow_fingerprints, word_shingles) are
  *     checked AGAINST the original array-lambda formulations they
  *     replaced, on random strings — the built-ins act as an executable
  *     spec for the hand-written single-pass code;
  *   - upsert is idempotent: upsert(upsert(x)) == upsert(x).
  */
class DifferentialPropertySpec extends SparkSpec {
  import spark.implicits._

  // Words over a tiny alphabet maximize collisions/repeats — the
  // interesting cases for shingles and window minima.
  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))

  // Shapes the generator can't produce: empty text, bare/consecutive/
  // leading/trailing separators (empty tokens), sub-k and sub-window
  // lengths, exact boundary lengths.
  private val edgeTexts: Seq[String] = Seq(
    "", " ", "  ", "a", "a  b", "  lead", "trail  ", "a b  c   d",
    "abcd", "a" * 4, "a" * 5, "a" * 7, "a" * 8)

  test("native winnow_fingerprints == array-lambda formulation (random texts)") {
    TextShingleExpressions.register(spark)
    val texts = (Gen.listOfN(60, textGen).sample.get ++ edgeTexts).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text")
    val k = 5; val w = 3

    val native = df.select(col("id"),
      explode(call_function("winnow_fingerprints", col("text"), lit(k), lit(w)))
        .as("fp")).distinct()

    // The replaced formulation, verbatim (interpreted lambdas — fine at
    // test scale; this is the executable spec).
    val nGrams = length(col("text")) - (k - 1)
    val grams = transform(sequence(lit(1), greatest(nGrams, lit(1))),
      i => md5(col("text").substr(i, lit(k))))
    val nWindows = size(grams) - (w - 1)
    val mins = transform(sequence(lit(1), greatest(nWindows, lit(1))),
      i => array_min(slice(grams, i, least(lit(w), size(grams)))))
    val lambda = df.select(col("id"),
      explode(array_distinct(mins)).as("fp")).distinct()

    assert(native.except(lambda).isEmpty && lambda.except(native).isEmpty)
  }

  test("native word_shingles == array-lambda formulation (random texts)") {
    TextShingleExpressions.register(spark)
    val texts = (Gen.listOfN(60, textGen).sample.get ++ edgeTexts).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text")
    val n = 3

    val native = df.select(col("id"),
      explode(call_function("word_shingles", col("text"), lit(n))).as("sh"))
      .distinct()

    val toks = split(col("text"), " ")
    val idxs = sequence(lit(1), size(toks) - (n - 1))
    val grams = transform(idxs, i =>
      concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))
    val lambda = df.select(col("id"),
      explode(when(size(toks) >= n, array_distinct(grams))
        .otherwise(array().cast("array<string>"))).as("sh"))
      .distinct()

    assert(native.except(lambda).isEmpty && lambda.except(native).isEmpty)
  }

  test("upsert is idempotent and last-write-wins (random batches)") {
    val rows = Gen.listOfN(80,
      for {
        k <- Gen.chooseNum(0, 9)
        v <- Gen.chooseNum(0, 999)
        ts <- Gen.chooseNum(0, 99)
      } yield (k, v, ts)).sample.get
      .zipWithIndex.map { case ((k, v, ts), i) => (k, v, ts * 1000 + i) }
    val df = rows.toDF("k", "v", "prec")

    val once = Upsert.dedupByKey(df, Seq("k"), Seq(col("prec")))
    val twice = Upsert.dedupByKey(once, Seq("k"), Seq(col("prec")))
    assert(once.collect().toSet == twice.collect().toSet)
    // exactly one row per key, and it carries the max precedence
    val got = once.select("k", "prec").as[(Int, Int)].collect().toMap
    val want = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._3).max }
    assert(got == want)
  }
}
