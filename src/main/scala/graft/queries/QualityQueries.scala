package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.TextAnalysis
import graft.operators.{BpeTokenizer, CorpusLm, HeavyHitters, QualityClassifier}

/** Corpus-quality queries beyond the per-row q29 filters: Gopher-style
  * repetition statistics and CCNet-style corpus-LM scoring. Both are
  * pure-SQL-expressible, so the DuckDB oracle mirrors every formula
  * exactly (integer counts, double division, round(6) at the edge).
  */
object QualityQueries extends QueryFamily {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val q57 = QueryDef(
    "q57_repetition_stats",
    "Gopher-style repetition filters: distinct-token ratio and the " +
      "fraction of bigram slots taken by the single most frequent bigram " +
      "(boilerplate/template detector). Token stats are a projection; " +
      "only the slim (doc_id, bigram) pairs reach the counting shuffle, " +
      "and both aggregations plus the join share the doc_id partitioning.",
    (s, dir) => {
      val toks = split(col("text"), " ")
      val base = docs(s, dir).select(
        col("doc_id"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        TextAnalysis.bigrams(col("text")).as("bgs"))
      val top = base
        .select(col("doc_id"), explode(col("bgs")).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).cast(IntegerType).as("top_bigram_count"))
      base.join(top, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          col("n_tokens"),
          col("n_distinct"),
          round(col("n_distinct").cast(DoubleType) / col("n_tokens"), 6)
            .as("distinct_ratio"),
          coalesce(col("top_bigram_count"), lit(0)).as("top_bigram_count"),
          round(coalesce(col("top_bigram_count"), lit(0)).cast(DoubleType) /
            nullif(col("n_tokens") - 1, lit(0)), 6).as("top_bigram_frac"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      big AS (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(a), 1)),
                 i -> a[i] || ' ' || a[i+1])) AS bg
        FROM t),
      cnt AS (SELECT doc_id, bg, count(*) AS c FROM big GROUP BY 1, 2),
      top AS (SELECT doc_id, max(c) AS top_bigram_count FROM cnt GROUP BY 1)
      SELECT t.doc_id,
             CAST(len(a) AS INTEGER) AS n_tokens,
             CAST(len(list_distinct(a)) AS INTEGER) AS n_distinct,
             round(len(list_distinct(a)) * 1.0 / len(a), 6) AS distinct_ratio,
             CAST(coalesce(top_bigram_count, 0) AS INTEGER) AS top_bigram_count,
             round(coalesce(top_bigram_count, 0) * 1.0
               / nullif(len(a) - 1, 0), 6) AS top_bigram_frac
      FROM t LEFT JOIN top USING (doc_id)
      ORDER BY doc_id"""))

  private val q58 = QueryDef(
    "q58_unigram_logprob",
    "Corpus unigram-LM scoring (the CCNet quality signal): p(token) = " +
      "corpus count / corpus total, documents score avg and min ln p. " +
      "The vocabulary aggregate is bounded by word-type count (Heaps' " +
      "law), so it broadcasts and the corpus-side join is map-local.",
    (s, dir) => CorpusLm.unigramLogProb(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
      tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM vocab)
      SELECT doc_id,
             CAST(count(*) AS INTEGER) AS n_tokens,
             round(avg(ln(cnt / total)), 6) AS avg_logp,
             round(min(ln(cnt / total)), 6) AS min_logp
      FROM toks JOIN vocab USING (tok) CROSS JOIN tot
      GROUP BY doc_id
      ORDER BY doc_id"""))

  private val q65 = QueryDef(
    "q65_dup_ngram_fraction",
    "Corpus-duplicate n-gram fraction (Gopher/RefinedWeb filter family): " +
      "per document, the share of its distinct 3-gram shingles that also " +
      "appear in at least one other document — the ACROSS-corpus twin of " +
      "q57's within-doc repetition stats. Shingle DF aggregate is " +
      "map-side combinable and vocabulary-bounded; the duplicate set " +
      "joins back shingle-keyed (co-partitioned, never broadcast).",
    (s, dir) => graft.operators.Dedup.dupNgramStats(
        docs(s, dir), "doc_id", "text", n = 3)
      .orderBy("doc_id"),
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(a) - 1, 1)),
                 i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle
             FROM toks),
      dfc AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
      perdoc AS (SELECT doc_id, count(*) AS n_shingles,
                        sum(CASE WHEN dfc.df >= 2 THEN 1 ELSE 0 END) AS n_dup
                 FROM sh JOIN dfc USING (shingle)
                 GROUP BY doc_id)
      SELECT doc_id, CAST(n_shingles AS INTEGER) AS n_shingles,
             round(n_dup * 1.0 / n_shingles, 6) AS dup_ngram_frac
      FROM perdoc
      ORDER BY doc_id"""))

  private val q67 = QueryDef(
    "q67_bigram_logprob",
    "Interpolated bigram-LM scoring (KenLM-lite upgrade of q58): " +
      "p(w|prev) = 0.75*c(prev,w)/c(prev) + 0.25*c(w)/N, documents " +
      "score avg and min ln p over bigram positions. Word and bigram " +
      "vocabularies are both Heaps-bounded broadcastable aggregates; " +
      "the corpus-side joins are map-local.",
    (s, dir) => CorpusLm.bigramLogProb(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      uni AS (SELECT tok, count(*) AS ucnt FROM toks GROUP BY 1),
      tot AS (SELECT CAST(sum(ucnt) AS DOUBLE) AS total FROM uni),
      t AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      bgx AS (SELECT doc_id,
                unnest(list_transform(range(1, greatest(len(a), 1)),
                  i -> a[i] || ' ' || a[i+1])) AS bg
              FROM t),
      sp AS (SELECT doc_id,
                    string_split(bg, ' ')[1] AS prev,
                    string_split(bg, ' ')[2] AS cur
             FROM bgx),
      bi AS (SELECT prev, cur, count(*) AS bcnt FROM sp GROUP BY 1, 2),
      scored AS (
        SELECT doc_id,
               ln(0.75 * (CAST(bcnt AS DOUBLE) / CAST(p.ucnt AS DOUBLE))
                  + 0.25 * (CAST(c.ucnt AS DOUBLE) / total)) AS logp
        FROM sp
        JOIN bi USING (prev, cur)
        JOIN uni p ON sp.prev = p.tok
        JOIN uni c ON sp.cur = c.tok
        CROSS JOIN tot)
      SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
             round(avg(logp), 6) AS avg_logp,
             round(min(logp), 6) AS min_logp
      FROM scored
      GROUP BY doc_id
      ORDER BY doc_id"""))

  private val q68 = QueryDef(
    "q68_perplexity_buckets",
    "CCNet's head/middle/tail split: documents bucket by corpus-LM score " +
      "terciles (head = least surprising third). Thresholds come from " +
      "ONE exact-percentile aggregate (q35a's percentile/quantile_cont " +
      "parity) broadcast back over a map-only comparison — no global " +
      "ntile window serializing the corpus through one partition.",
    (s, dir) => {
      val scored = CorpusLm.unigramLogProb(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("avg_logp"))
      val th = scored.agg(
        percentile(col("avg_logp"), lit(1.0 / 3)).as("t_tail"),
        percentile(col("avg_logp"), lit(2.0 / 3)).as("t_mid"))
      scored.crossJoin(broadcast(th))
        .withColumn("ppl_bucket",
          when(col("avg_logp") > col("t_mid"), "head")
            .when(col("avg_logp") > col("t_tail"), "middle")
            .otherwise("tail"))
        .select("doc_id", "avg_logp", "ppl_bucket")
        .orderBy("doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
      tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM vocab),
      scored AS (
        SELECT doc_id, round(avg(ln(cnt / total)), 6) AS avg_logp
        FROM toks JOIN vocab USING (tok) CROSS JOIN tot
        GROUP BY doc_id),
      th AS (SELECT quantile_cont(avg_logp, 1.0/3) AS t_tail,
                    quantile_cont(avg_logp, 2.0/3) AS t_mid
             FROM scored)
      SELECT doc_id, avg_logp,
             CASE WHEN avg_logp > t_mid THEN 'head'
                  WHEN avg_logp > t_tail THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM scored CROSS JOIN th
      ORDER BY doc_id"""))

  private val q69 = QueryDef(
    "q69_source_mix",
    "Provenance mix / data-card summary: per (source, lang) document " +
      "count, total whitespace tokens, and mean quality — the table " +
      "every training-data release publishes. One map-side-combinable " +
      "aggregation over projections; zero joins.",
    (s, dir) => docs(s, dir)
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).cast(IntegerType).as("docs"),
        sum(TextAnalysis.tokenCountWs(col("text"))).cast(LongType)
          .as("total_tokens"),
        round(avg(TextAnalysis.qualityScore(col("text"))), 6)
          .as("mean_quality"))
      .orderBy("source", "lang"),
    Some(s"""
      WITH t AS (
        SELECT source, lang,
               CASE WHEN length(text) = 0 THEN 0
                    ELSE length(text) - length(replace(text, ' ', '')) + 1
                    END AS n_tok,
               len(list_filter(string_split(text, ' '),
                   x -> x IN (${TextQueries.stopListSql}))) AS n_stop,
               length(text) - length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                 AS n_nonalpha,
               length(text) AS n_char
        FROM documents),
      q AS (
        SELECT source, lang, n_tok,
               round(least(n_tok / 50.0, 1.0) * 0.4
                   + least(n_stop * 1.0 / nullif(n_tok, 0) * 5.0, 1.0) * 0.3
                   + greatest(0.0, 1.0 - n_nonalpha * 1.0 / nullif(n_char, 0) * 5.0) * 0.3,
                 6) AS quality
        FROM t)
      SELECT source, lang,
             CAST(count(*) AS INTEGER) AS docs,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             round(avg(quality), 6) AS mean_quality
      FROM q
      GROUP BY source, lang
      ORDER BY source, lang"""))

  /** Top-k boilerplate n-grams. Exactness argument: at sf0.1 the corpus
    * has ~256k trigram instances over ~27k distinct, so the MG retention
    * threshold N/(capacity+1) ≈ 16 sits below the rank-50 count (20) —
    * every true top-50 trigram is guaranteed into the candidate set for
    * ANY merge order, and the exact re-count ranks them; the hash-match
    * against the brute-force oracle is the per-run proof. */
  private val q72 = QueryDef(
    "q72_top_ngrams",
    "Exact corpus-wide top-50 3-grams via the two-pass Misra-Gries " +
      "shape: a bounded-memory candidate sketch (native " +
      "TypedImperativeAggregate, <= 16384 counters per partition, one " +
      "summary per partition shuffled — vocabulary-independent, unlike " +
      "a raw groupBy whose combine state tracks web-scale long tails), " +
      "then an exact broadcast-semi-join re-count of candidates only.",
    (s, dir) => HeavyHitters.topKNgrams(docs(s, dir), "text",
        n = 3, k = 50, capacity = 16384),
    Some("""
      WITH t AS (SELECT string_split(text, ' ') AS a FROM documents),
      g AS (SELECT unnest(list_transform(range(1, greatest(len(a) - 1, 1)),
              i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS ngram
            FROM t)
      SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
      FROM g GROUP BY ngram
      ORDER BY cnt DESC, ngram
      LIMIT 50"""))

  /** q84's gate being distilled: the q29 composite at a threshold chosen
    * for class balance on the fixture corpus (~30/70 at 0.78). */
  private def gateLabel: org.apache.spark.sql.Column =
    TextAnalysis.qualityScore(col("text")) >= 0.78

  /** Driver-side twin of the q84 pipeline (q39/q60's pattern): retrain
    * the SAME deterministic model — trainSample is a fixed-order GD over
    * a hash-ordered sample, so both calls produce bit-identical weights —
    * then re-score from the Spark-computed feature vectors with
    * [[QualityClassifier.scoreOf]]'s identical left-fold dot, and inject
    * the expected rows as VALUES. */
  private def classifierOracle(s: SparkSession, dir: String): String = {
    val d = docs(s, dir)
    val m = QualityClassifier.trainSample(d, "doc_id", "text", gateLabel)
    val rows = d.select(col("doc_id"),
        array(QualityClassifier.featureCols(col("text")): _*).as("x"),
        gateLabel.cast("int").as("label"))
      .collect()
      .map { r =>
        val sc = QualityClassifier.scoreOf(r.getSeq[Double](1).toArray, m)
        (r.getLong(0), r.getInt(2), sc, if (sc >= 0.5) 1 else 0)
      }
    val values = rows
      .map { case (id, y, sc, p) => s"($id, $y, $sc, $p)" }.mkString(", ")
    s"""
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             CAST(label AS INTEGER) AS label,
             CAST(score AS DOUBLE) AS score,
             CAST(pred AS INTEGER) AS pred
      FROM (VALUES $values) t(doc_id, label, score, pred)
      ORDER BY doc_id"""
  }

  private val q84 = QueryDef(
    "q84_quality_classifier",
    "Distilled quality classifier (CCNet/fastText pattern): logistic " +
      "model over 5 cheap surface features, trained by deterministic " +
      "fixed-order GD on a bounded hash-ordered sample (the expensive " +
      "q29 gate provides the labels), then the whole corpus scored by " +
      "ONE literal-weights codegen projection — no shuffle, no join. " +
      "The distributed-GD trainer (one map-side-combinable aggregate " +
      "per iteration) is the scale path, spec'd for agreement. Oracle " +
      "generated at Verify time by retraining the identical model " +
      "driver-side.",
    (s, dir) => {
      val d = docs(s, dir)
      val m = QualityClassifier.trainSample(d, "doc_id", "text", gateLabel)
      QualityClassifier.score(d, "text", m)
        .select(col("doc_id"), gateLabel.cast("int").as("label"),
          col("score"), (col("score") >= 0.5).cast("int").as("pred"))
        .orderBy("doc_id")
    },
    None,
    oracleGen = Some(classifierOracle))

  /** Driver-side twin of q86 (q84's pattern): retrain the SAME
    * deterministic codec — the merge loop is a pure function of the
    * word-count aggregate with explicit tie-breaks — then re-encode every
    * document with the same BpeCodec methods the codegen expression
    * calls, and inject the expected rows as VALUES. What this verifies is
    * the DISTRIBUTED part: the codegen projection must deliver every row
    * through UTF8String/ArrayData conversion unmangled. */
  private def bpeOracle(s: SparkSession, dir: String): String = {
    val d = docs(s, dir)
    val codec = BpeTokenizer.train(d, "text", numMerges = 50)
    val md = java.security.MessageDigest.getInstance("MD5")
    val rows = d.select("doc_id", "text").collect().map { r =>
      val toks = codec.encodeText(r.getString(1))
      val sig = md.digest(toks.mkString("").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (r.getLong(0), toks.length, sig)
    }
    val values = rows
      .map { case (id, n, sig) => s"($id, $n, '$sig')" }.mkString(", ")
    s"""
      SELECT CAST(doc_id AS BIGINT) AS doc_id,
             CAST(n_bpe AS INTEGER) AS n_bpe,
             CAST(bpe_sig AS VARCHAR) AS bpe_sig
      FROM (VALUES $values) t(doc_id, n_bpe, bpe_sig)
      ORDER BY doc_id"""
  }

  private val q86 = QueryDef(
    "q86_bpe_tokenize",
    "BPE tokenizer trained IN the engine (Sennrich 2016, the HF/" +
      "sentencepiece two-phase shape): ONE map-side-combinable " +
      "word-count aggregate (Heaps-bounded — merges are a function of " +
      "the word table, so 100 TB trains from the same aggregate), " +
      "deterministic driver merge loop (exact counts, lexicographic " +
      "tie-break), then the whole corpus tokenized by ONE codegen " +
      "projection with the codec riding as a reference object. Output: " +
      "per-doc token count + md5 signature of the token stream. Oracle " +
      "retrains the identical codec driver-side and re-encodes.",
    (s, dir) => {
      val codec = BpeTokenizer.train(docs(s, dir), "text", numMerges = 50)
      BpeTokenizer.encode(docs(s, dir), "text", codec)
        .select(col("doc_id"),
          size(col("bpe")).as("n_bpe"),
          md5(concat_ws("", col("bpe")).cast("binary")).as("bpe_sig"))
        .orderBy("doc_id")
    },
    None,
    oracleGen = Some(bpeOracle))

  override val defs: Seq[QueryDef] =
    Seq(q57, q58, q65, q67, q68, q69, q72, q84, q86)
}
