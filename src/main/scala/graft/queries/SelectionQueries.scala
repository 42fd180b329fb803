package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.TextAnalysis
import graft.operators.{Dedup, Dsir, IvfIndex, Mixture, PqIndex, TrainingOrder}

/** Dataset-selection queries — the steps that decide WHICH documents make
  * the training set: benchmark decontamination, per-language stratified
  * sampling, and quality-ordered token-budget selection. Every formula is
  * mirrored exactly in the DuckDB oracle (md5 for cross-engine determinism,
  * integer token counts, round-6 doubles at the edge).
  */
object SelectionQueries extends QueryFamily {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** The DuckDB twin of [[graft.operators.Dedup.shingles]] (n=3) as a CTE
    * body over `src` — same list-range construction as q22's oracle. */
  private def shingleSql(src: String): String =
    s"""SELECT DISTINCT doc_id,
       unnest(list_transform(range(1, greatest(len(a) - 1, 1)),
         i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle
       FROM (SELECT doc_id, string_split(text, ' ') AS a FROM $src)"""

  private val q54 = QueryDef(
    "q54_decontaminate",
    "Benchmark decontamination: flag training docs sharing >= 3 distinct " +
      "3-gram shingles with any benchmark doc (benchmark = doc_id % 50 = " +
      "0, a deterministic stand-in eval set). The bench shingle index " +
      "broadcasts — benchmarks are MBs against a 100 TB corpus — so the " +
      "training scan is map-local and only matched candidate pairs reach " +
      "the counting shuffle.",
    (s, dir) => {
      val d = docs(s, dir)
      Dedup.crossNgramOverlap(
          d.where(col("doc_id") % 50 =!= 0),
          d.where(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 3, minShared = 3L)
        .orderBy("train_id", "bench_id")
    },
    Some(s"""
      WITH train_sh AS (
        ${shingleSql("(SELECT * FROM documents WHERE doc_id % 50 <> 0)")}),
      bench_sh AS (
        ${shingleSql("(SELECT * FROM documents WHERE doc_id % 50 = 0)")})
      SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
             count(*) AS shared_ngrams
      FROM train_sh t JOIN bench_sh b ON t.shingle = b.shingle
      GROUP BY 1, 2
      HAVING count(*) >= 3
      ORDER BY train_id, bench_id"""))

  private val q55 = QueryDef(
    "q55_stratified_sample",
    "Per-language stratified sample: 50 docs per lang, chosen by md5-hash " +
      "order — deterministic across runs, engines, and cluster sizes " +
      "(md5 hex strings sort identically everywhere). The rank<=k filter " +
      "on the row_number window executes as a per-partition group limit " +
      "(WindowGroupLimit), so no language group is ever fully sorted.",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast(StringType)), col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("lang"))
        .withColumn("rk", row_number().over(w).cast(IntegerType))
        .where(col("rk") <= 50)
        .orderBy("lang", "rk")
    },
    Some("""
      SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
      FROM documents
      QUALIFY rk <= 50
      ORDER BY lang, rk"""))

  private val q56 = QueryDef(
    "q56_token_budget_select",
    "Quality-ordered token-budget selection: per language, take documents " +
      "in descending quality order (q29's composite score, doc_id " +
      "tie-break) while the running token total stays within a 5000-token " +
      "budget — greedy data selection under a compute budget, as one " +
      "declarative cumulative-sum window.",
    (s, dir) => {
      val scored = docs(s, dir).select(
        col("doc_id"), col("lang"),
        TextAnalysis.tokenCountWs(col("text")).as("n_tokens"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("quality").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      scored.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .where(col("cum_tokens") <= 5000)
        .orderBy("lang", "cum_tokens", "doc_id")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, lang, text,
               CASE WHEN length(text) = 0 THEN 0
                    ELSE length(text) - length(replace(text, ' ', '')) + 1
                    END AS n_tok,
               length(replace(text, ' ', '')) AS n_nonspace,
               len(list_filter(string_split(text, ' '),
                   x -> x IN (${TextQueries.stopListSql}))) AS n_stop,
               length(text) - length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                 AS n_nonalpha
        FROM documents),
      scored AS (
        SELECT doc_id, lang,
               CAST(n_tok AS INTEGER) AS n_tokens,
               round(least(n_tok / 50.0, 1.0) * 0.4
                   + least(n_stop * 1.0 / nullif(n_tok, 0) * 5.0, 1.0) * 0.3
                   + greatest(0.0, 1.0 - n_nonalpha * 1.0 / nullif(length(text), 0) * 5.0) * 0.3,
                 6) AS quality
        FROM t),
      cum AS (
        SELECT doc_id, lang, n_tokens, quality,
               CAST(sum(n_tokens) OVER (PARTITION BY lang
                 ORDER BY quality DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum_tokens
        FROM scored)
      SELECT * FROM cum
      WHERE cum_tokens <= 5000
      ORDER BY lang, cum_tokens, doc_id"""))

  private val q62 = QueryDef(
    "q62_temperature_resample",
    "Temperature-based language rebalancing (the mC4/XLM-R alpha-sampling " +
      "recipe): sampling weight q_l ∝ (n_l/N)^0.3, per-language " +
      "acceptance rate min(1, q_l·T/n_l) against a T = N/2 budget, and a " +
      "deterministic md5 acceptance coin per document — hash-based, so " +
      "the kept set is stable across runs, engines, and cluster sizes. " +
      "The rate computation is a window over the 5-row language dim " +
      "(rounded once at the edge); the corpus-side join broadcasts it.",
    (s, dir) => {
      import graft.functions.Curation
      val wAll = Window.partitionBy() // 5-row lang dim — never corpus-wide
      val rates = docs(s, dir).groupBy("lang")
        .agg(count(lit(1)).as("n_l"))
        .withColumn("n", sum(col("n_l")).over(wAll))
        .withColumn("w", pow(col("n_l").cast(DoubleType) / col("n"), 0.3))
        .withColumn("rate", round(
          least(lit(1.0),
            col("w") / sum(col("w")).over(wAll) * (lit(0.5) * col("n"))
              / col("n_l")), 6))
        .select("lang", "rate")
      docs(s, dir)
        .select(col("doc_id"), col("lang"),
          Curation.hashUniform(col("doc_id")).as("u"))
        .join(broadcast(rates), "lang")
        .where(col("u") < col("rate"))
        .select("doc_id", "lang", "u", "rate")
        .orderBy("doc_id")
    },
    Some("""
      WITH stats AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
      tot AS (SELECT lang, n_l, sum(n_l) OVER () AS n,
                     pow(n_l * 1.0 / sum(n_l) OVER (), 0.3) AS w
              FROM stats),
      rates AS (SELECT lang,
                       round(least(1.0, w / sum(w) OVER () * (0.5 * n) / n_l),
                         6) AS rate
                FROM tot),
      u AS (SELECT doc_id, lang,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                     AS INTEGER) / 65536.0 AS u
            FROM documents)
      SELECT u.doc_id, u.lang, u.u, r.rate
      FROM u JOIN rates r USING (lang)
      WHERE u.u < r.rate
      ORDER BY doc_id"""))

  /** Driver-side twin of q66: retrain the deterministic IVF model, assign
    * every vector (PqIndex.assignOf mirrors the engine argmax), order
    * within each cluster by (md5 hex of the id string, id) — the same
    * layout-invariant coin the engine uses — and inject the per-cluster
    * quota as VALUES. */
  private def clusterSampleOracle(s: SparkSession, dir: String): String = {
    val e = Tables.load(s, dir, "embeddings")
    val ivf = IvfIndex.train(e, "vec_id", "embedding", k = 16)
    val rows = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    val expected = rows
      .groupBy { case (_, v) => PqIndex.assignOf(ivf, v) }
      .toSeq.flatMap { case (c, rs) =>
        rs.map(_._1).sortBy(id => (md5hex(id.toString), id))
          .take(10).zipWithIndex
          .map { case (id, i) => (id, c, i + 1) }
      }
    val values = expected
      .map { case (id, c, rk) => s"($id, $c, $rk)" }.mkString(", ")
    s"""
      SELECT CAST(vec_id AS BIGINT) AS vec_id,
             CAST(ivf_cluster AS INTEGER) AS ivf_cluster,
             CAST(rk AS INTEGER) AS rk
      FROM (VALUES $values) t(vec_id, ivf_cluster, rk)
      ORDER BY ivf_cluster, rk"""
  }

  private val q66 = QueryDef(
    "q66_cluster_balanced_sample",
    "Cluster-balanced sampling (the SemDeDup-family diversity quota): " +
      "assign every embedding to its IVF cell (one codegen projection, " +
      "no shuffle), then keep 10 per cell by md5-hash order — a " +
      "topic-balanced subsample that over-represents rare clusters " +
      "instead of mirroring the corpus head. The rank<=k filter executes " +
      "as WindowGroupLimit (q55's shape) keyed on the cluster id; at " +
      "100 TB the window co-locates with the partitionBy(ivf_cluster) " +
      "layout. Oracle retrains the deterministic model driver-side.",
    (s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val ivf = IvfIndex.train(e, "vec_id", "embedding", k = 16)
      val w = Window.partitionBy(col("ivf_cluster"))
        .orderBy(md5(col("vec_id").cast(StringType)), col("vec_id"))
      IvfIndex.assign(s, e, "embedding", ivf)
        .select(col("vec_id"), col("ivf_cluster"))
        .withColumn("rk", row_number().over(w).cast(IntegerType))
        .where(col("rk") <= 10)
        .orderBy("ivf_cluster", "rk")
    },
    None,
    oracleGen = Some(clusterSampleOracle))

  /** Same decontamination answer as q54 through the GB-scale-benchmark
    * path: the bench shingle set rides as a Bloom filter (hashes, not
    * strings) probed map-side in codegen; survivors are verified exactly
    * by the equi-join, so the q54 oracle applies unchanged — the
    * hash-match IS the proof that the prefilter loses nothing. */
  private val q71 = QueryDef(
    "q71_decontaminate_bloom",
    "Bloom-prefiltered benchmark decontamination: identical output to " +
      "q54 (same oracle SQL) via Dedup.crossNgramOverlapBloom — for " +
      "eval suites too large to broadcast as a string-keyed index, the " +
      "bench side becomes a ~10-bits-per-shingle Bloom filter and only " +
      "matches + fpp*corpus survivor rows reach the verify join.",
    (s, dir) => {
      val d = docs(s, dir)
      Dedup.crossNgramOverlapBloom(
          d.where(col("doc_id") % 50 =!= 0),
          d.where(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 3, minShared = 3L)
        .orderBy("train_id", "bench_id")
    },
    q54.oracle)

  private val q78 = QueryDef(
    "q78_epoch_order",
    "Deterministic epoch shuffle + shard assignment (the materialized " +
      "data-loader order): shard and within-shard order both derive from " +
      "md5('epoch:doc_id'), so the training order is byte-reproducible " +
      "across runs, engines, and input partitionings, and each epoch is " +
      "an independent permutation. One shard-partitioned window carries " +
      "position and cumulative token offset together; text never moves.",
    (s, dir) => TrainingOrder.epochOrder(docs(s, dir), "doc_id", "text",
        epoch = 0, shards = 8)
      .orderBy("shard", "pos"),
    Some("""
      WITH b AS (
        SELECT doc_id,
               md5('0:' || CAST(doc_id AS VARCHAR)) AS coin,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        FROM documents),
      s AS (
        SELECT doc_id, coin, n_tokens,
               CAST(('0x' || substr(coin, 1, 4)) AS INTEGER) % 8 AS shard
        FROM b)
      SELECT doc_id, shard,
             CAST(row_number() OVER
               (PARTITION BY shard ORDER BY coin, doc_id) - 1 AS INTEGER)
               AS pos,
             n_tokens,
             CAST(coalesce(sum(n_tokens) OVER
               (PARTITION BY shard ORDER BY coin, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS token_offset
      FROM s
      ORDER BY shard, pos"""))

  private val q83 = QueryDef(
    "q83_dsir_resample",
    "DSIR importance resampling (Xie et al. 2023): select raw docs that " +
      "look like the target domain (lang='en') by the likelihood ratio " +
      "of two Laplace-smoothed unigram LMs over the joint vocabulary, " +
      "then Gumbel top-k (sampling w/o replacement prop. to exp(logw) — " +
      "resampling matches the target distribution where plain top-k " +
      "collapses onto extreme docs). Vocab aggregates are Heaps-bounded " +
      "broadcasts, the corpus token join is map-local, selection is " +
      "TakeOrdered; the Gumbel coin is q62's deterministic md5 uniform " +
      "at the grid midpoint.",
    (s, dir) => Dsir.resampleTopK(docs(s, dir), "doc_id", "text",
      targetPred = col("lang") === "en", k = 100),
    Some("""
      WITH toks AS (
        SELECT doc_id, (lang = 'en') AS tgt,
               unnest(string_split(text, ' ')) AS tok
        FROM documents),
      raw AS (
        SELECT tok, count(*) AS cr,
               sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
        FROM toks GROUP BY 1),
      consts AS (
        SELECT count(*) AS v, sum(cr) AS nr, sum(ct) AS nt FROM raw),
      w AS (
        SELECT t.doc_id, CAST(count(*) AS INTEGER) AS n_tokens,
               sum(ln(CAST(r.ct + 1 AS DOUBLE) / CAST(c.nt + c.v AS DOUBLE))
                 - ln(CAST(r.cr + 1 AS DOUBLE) / CAST(c.nr + c.v AS DOUBLE)))
                 AS logw
        FROM toks t JOIN raw r USING (tok) CROSS JOIN consts c
        GROUP BY 1),
      keyed AS (
        SELECT doc_id, n_tokens, round(logw, 6) AS logw,
               round(logw - ln(-ln(
                 (CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                    AS INTEGER) AS DOUBLE) + 0.5) / 65536.0)), 6) AS gkey
        FROM w)
      SELECT doc_id, n_tokens, logw, gkey
      FROM keyed
      ORDER BY gkey DESC, doc_id
      LIMIT 100"""))

  /** Per-source epoch weights for q88 — literal on both engines. Covers
    * every regime: >2 (full copies + fraction), exactly 1, sub-1
    * (weight IS a subsample), and an exact integer (no fractional
    * draw). Sources are the fixture's src0..src19. */
  private val mixtureWeights: Seq[(String, Double)] =
    (0 until 20).map { i =>
      val w = (i % 5) match {
        case 0 => 2.3
        case 1 => 1.0
        case 2 => 0.44
        case 3 => 3.0
        case 4 => 1.6
      }
      (s"src$i", w)
    }

  private val q88 = QueryDef(
    "q88_mixture_epochs",
    "Fractional-epoch training-mixture materialization (the GPT-3 " +
      "Table 2.2 shape: a 2.3-weight source contributes 2 full copies " +
      "plus a deterministic 30% of itself once more; 0.44 IS a 44% " +
      "subsample). The fractional draw uses the md5 coin, so the " +
      "mixture is identical across runs/engines/partitionings. Weights " +
      "broadcast; copies are a map-only explode(sequence) — no shuffle.",
    (s, dir) => Mixture.materializeEpochs(docs(s, dir), "doc_id", "source",
        mixtureWeights)
      .orderBy("doc_id", "epoch"),
    Some(s"""
      WITH wt(source, w) AS (VALUES
        ${mixtureWeights.map { case (src, w) => s"('$src', $w)" }
          .mkString(", ")}),
      c AS (
        SELECT d.doc_id, d.source,
               CAST(floor(w) +
                 (CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                        1, 4)) AS INTEGER) / 65536.0 < w - floor(w)
                       THEN 1 ELSE 0 END) AS INTEGER) AS n
        FROM documents d JOIN wt USING (source))
      SELECT doc_id, source, CAST(unnest(generate_series(1, n)) AS INTEGER)
               AS epoch
      FROM c
      WHERE n > 0
      ORDER BY doc_id, epoch"""))

  override val defs: Seq[QueryDef] =
    Seq(q54, q55, q56, q62, q66, q71, q78, q83, q88)
}
