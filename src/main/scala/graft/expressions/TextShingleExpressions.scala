package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-fingerprint hot paths (winnowing,
  * word shingles).
  *
  * Why custom (SURVEY.md §7 M4 rationale): the array-lambda formulations
  * (`transform(sequence(...), i -> ...)`) evaluate the FULL inner
  * expression tree per element, interpreted, outside whole-stage codegen.
  * Worse, a lambda body that references a derived outer array (e.g.
  * `slice(grams, i, w)` where `grams` is itself a `transform`) recomputes
  * that whole array per element — winnowing's window minima degrade to
  * O(chars * window * chars) md5 calls per document. These expressions
  * compute the same results in one O(chars) pass per row and stay inside
  * whole-stage codegen (the generated code makes a single call on the
  * referenced expression object).
  *
  * Semantics are pinned to the built-in formulations they replace (and to
  * the DuckDB oracles): md5 hex is lowercase, and "minimum hash" is the
  * lexicographic min of hex strings == unsigned byte order of the raw
  * digests (hex encoding is monotone per nibble).
  */
object TextShingleHelpers {

  /** Unsigned lexicographic compare of two equal-length digests. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Winnowing fingerprints of `text`: md5 each char k-gram, keep the min
    * hash per sliding window of `w`, distinct (first-occurrence order).
    * Sliding minima via a monotonic deque — O(numChars) total. Matches
    * `transform(sequence(1, max(nGrams,1)), i -> md5(substr(text,i,k)))`
    * + per-window `array_min(slice(...))` + `array_distinct` exactly.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val n = math.max(text.numChars() - (k - 1), 1)
    val md = MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      digests(i) = md.digest(text.substringSQL(i + 1, k).getBytes)
      i += 1
    }
    val out = new java.util.LinkedHashSet[String]
    // deque of candidate indices, digests strictly increasing front→back
    val dq = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < n) {
      while (tail > head && cmp(digests(dq(tail - 1)), digests(i)) >= 0) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hex(digests(dq(head))))
      i += 1
    }
    if (n < w) out.add(hex(digests(dq(head)))) // single clamped window
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }

  /** ALL word n-grams in position order, duplicates kept — the multiset
    * twin of [[shingles]] for occurrence COUNTING (q72 heavy hitters),
    * where per-doc dedup would silently undercount repeated boilerplate
    * (the very thing a top-k n-gram query exists to find). */
  def ngramsAll(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    val arr = new Array[Any](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      arr(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(arr)
  }

  /** Distinct word n-gram shingles (first-occurrence order); fewer than n
    * tokens → empty. Tokenization matches `split(text, " ")` (regex split,
    * empty tokens kept) and shingle join matches `concat_ws(" ", ...)`. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(arr)
  }
}

/** winnow_fingerprints(text, k, w) → ARRAY<STRING> of distinct window-min
  * md5 hex fingerprints. k and w must be foldable ints. */
case class WinnowFingerprintsExpr(first: Expression, second: Expression,
                                  third: Expression) extends TernaryExpression {

  override def prettyName: String = "winnow_fingerprints"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == IntegerType &&
        third.dataType == IntegerType && second.foldable && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, foldable INT k, foldable INT w)")

  @transient private lazy val k: Int =
    second.eval(null).asInstanceOf[Int]
  @transient private lazy val w: Int =
    third.eval(null).asInstanceOf[Int]

  /** Generated-code entry point (k/w baked in at plan time). */
  def compute(text: UTF8String): ArrayData =
    TextShingleHelpers.winnow(text, k, w)

  override def nullSafeEval(text: Any, kv: Any, wv: Any): Any =
    TextShingleHelpers.winnow(text.asInstanceOf[UTF8String],
      kv.asInstanceOf[Int], wv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _, _) => {
      val ref = ctx.addReferenceObj("winnowExpr", this, classOf[WinnowFingerprintsExpr].getName)
      s"${ev.value} = $ref.compute($text);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** word_shingles(text, n) → ARRAY<STRING> of distinct word n-grams. */
case class WordShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "word_shingles"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, foldable INT n)")

  @transient private lazy val n: Int = right.eval(null).asInstanceOf[Int]

  def compute(text: UTF8String): ArrayData = TextShingleHelpers.shingles(text, n)

  override def nullSafeEval(text: Any, nv: Any): Any =
    TextShingleHelpers.shingles(text.asInstanceOf[UTF8String],
      nv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _) => {
      val ref = ctx.addReferenceObj("shingleExpr", this, classOf[WordShinglesExpr].getName)
      s"${ev.value} = $ref.compute($text);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** word_ngrams(text, n) → ARRAY<STRING> of ALL word n-grams in position
  * order, duplicates kept (the counting twin of word_shingles). */
case class WordNgramsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "word_ngrams"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType &&
        right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, foldable INT n)")

  @transient private lazy val n: Int = right.eval(null).asInstanceOf[Int]

  def compute(text: UTF8String): ArrayData = TextShingleHelpers.ngramsAll(text, n)

  override def nullSafeEval(text: Any, nv: Any): Any =
    TextShingleHelpers.ngramsAll(text.asInstanceOf[UTF8String],
      nv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (text, _) => {
      val ref = ctx.addReferenceObj("ngramsExpr", this, classOf[WordNgramsExpr].getName)
      s"${ev.value} = $ref.compute($text);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** simhash64_doc(text) → the 64-bit SimHash of one document, inline.
  *
  * Same bit contract as the former explode + 64-sum-aggregation pipeline
  * (token bit j = bit j%4 of md5-hex nibble j/4; per-occurrence +/-1 sums;
  * signature bit set where the sum is positive — what the q24 DuckDB
  * oracle independently recomputes), but as ONE projection: the old shape
  * shuffled every token through a per-doc groupBy; a signature is a pure
  * function of the row, so at 100 TB that shuffle was pure waste. Codegen
  * emits a static call into [[SimHash64Expr.compute]] — the
  * whole-stage-codegen span stays unbroken, like the shingle kernels. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash64_doc"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${dt.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    compute(text.asInstanceOf[UTF8String])

  def compute(text: UTF8String): Long = SimHash64Expr.compute(text.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val ref = ctx.addReferenceObj("simhashExpr", this, classOf[SimHash64Expr].getName)
      s"${ev.value} = $ref.compute($text);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64Expr {

  private val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** The SimHash kernel, shared with the streaming dedup path. */
  def compute(text: String): Long = {
    val md = md5.get()
    val sums = new Array[Int](64)
    text.split(" ").foreach { t =>
      if (t.nonEmpty) {
        val d = md.digest(t.getBytes("UTF-8"))
        md.reset()
        var j = 0
        while (j < 64) {
          // hex char j/4 of the digest = nibble (high, low alternating)
          val byte = d((j / 4) / 2) & 0xff
          val nib = if ((j / 4) % 2 == 0) byte >> 4 else byte & 0xf
          if (((nib >> (j % 4)) & 1) == 1) sums(j) += 1 else sums(j) -= 1
          j += 1
        }
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (sums(j) > 0) sig += (1L << j); j += 1 }
    sig
  }
}

/** minhash_sigs(shingles ARRAY<STRING>, numHashes, seed) → ARRAY<BIGINT>.
  *
  * MinHash signature of one document's shingle set, inline: base hash =
  * first 7 md5-hex chars of the shingle (28-bit, like the Column
  * pipeline's conv(substring(md5, 1, 7), 16, 10)), then numHashes
  * universal hashes (a*x + b) mod 2^31-1 with (a, b) drawn
  * deterministically from `seed` — bit-identical to the former
  * explode + 32-min-aggregation pipeline, whose groupBy shuffled every
  * (doc, shingle) row to compute a value that is a pure function of the
  * document. Inputs must be non-empty (the old pipeline emitted no row
  * for shingle-less docs; callers filter size > 0 to preserve that). */
case class MinHashSigsExpr(first: Expression, second: Expression,
                           third: Expression) extends TernaryExpression {

  override def prettyName: String = "minhash_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRING>, INT, INT|BIGINT)")
    }

  @transient private lazy val coefficients: Array[(Long, Long)] = {
    val n = second.eval().asInstanceOf[Int]
    val seed = third.eval() match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l.longValue()
    }
    MinHashSigsExpr.coeffs(n, seed)
  }

  override protected def nullSafeEval(sh: Any, n: Any, seed: Any): Any =
    compute(sh.asInstanceOf[ArrayData])

  def compute(sh: ArrayData): ArrayData = {
    val cs = coefficients
    val mins = Array.fill(cs.length)(Long.MaxValue)
    val md = MinHashSigsExpr.md5.get()
    var i = 0
    val n = sh.numElements()
    while (i < n) {
      val d = md.digest(sh.getUTF8String(i).getBytes)
      md.reset()
      // first 7 hex chars = first 3.5 bytes, big-endian nibbles
      val x = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
      var c = 0
      while (c < cs.length) {
        val v = (x * cs(c)._1 + cs(c)._2) % MinHashSigsExpr.MersennePrime31
        if (v < mins(c)) mins(c) = v
        c += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, _, _) => {
      val ref = ctx.addReferenceObj("minhashExpr", this, classOf[MinHashSigsExpr].getName)
      s"${ev.value} = $ref.compute($sh);"
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object MinHashSigsExpr {

  private[graft] val MersennePrime31 = 2147483647L // 2^31 - 1

  private[expressions] val md5 = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Universal-hash coefficients, deterministic from `seed` — the single
    * source both the expression and any oracle generator draw from. */
  def coeffs(numHashes: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numHashes)(
      (1L + rnd.nextInt(Int.MaxValue - 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
  }
}

object TextShingleExpressions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst
        .FunctionIdentifier("winnow_fingerprints"))) {
      reg.createOrReplaceTempFunction("winnow_fingerprints",
        exprs => WinnowFingerprintsExpr(exprs(0), exprs(1), exprs(2)), "built-in")
      reg.createOrReplaceTempFunction("word_shingles",
        exprs => WordShinglesExpr(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("word_ngrams",
        exprs => WordNgramsExpr(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("simhash64_doc",
        exprs => SimHash64Expr(exprs(0)), "built-in")
      reg.createOrReplaceTempFunction("minhash_sigs",
        exprs => MinHashSigsExpr(exprs(0), exprs(1), exprs(2)), "built-in")
    }
  }
}
