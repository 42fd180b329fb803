package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Dedup

/** North-star dedup surface over the `documents` table.
  *
  * Oracle strategy: exact dedup / fingerprint / pairwise Jaccard are fully
  * SQL-expressible in DuckDB. The MinHash+LSH operator is verified against
  * the SAME exact-Jaccard oracle: with 32 hashes in 16 bands of 2 the
  * probability of missing a pair at the 0.8 threshold is ~6e-8, and every
  * candidate is exactness-verified, so LSH output ≡ exact output. SimHash
  * derives its bits from md5 nibbles, which DuckDB reproduces exactly —
  * q24 is fully DuckDB-oracled (banding + in-join hamming filter).
  */
object DedupQueries extends QueryFamily {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** documents plus injected exact duplicates (every 10th doc re-appears
    * under doc_id+1000000) — the corpus has no natural exact dups. */
  private def withInjected(d: DataFrame): DataFrame =
    d.select("doc_id", "text").unionByName(
      d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))

  private val q20 = QueryDef(
    "q20_dedup_exact",
    "Exact dedup by content hash: identical texts grouped, smallest doc_id " +
      "kept, group size reported. Duplicates injected deterministically " +
      "(corpus has none).",
    (s, dir) => Dedup.exactGroups(withInjected(docs(s, dir)), "doc_id", "text")
      .orderBy("keep_id"),
    Some("""
      WITH aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id % 10 = 0)
      SELECT min(doc_id) AS keep_id, count(*) AS dup_count,
             md5(text) AS content_hash
      FROM aug
      GROUP BY md5(text)
      ORDER BY keep_id"""))

  private val q21 = QueryDef(
    "q21_dedup_fingerprint",
    "Document fingerprinting: md5 over whitespace-normalized, lowercased " +
      "text — the canonical-content digest form of exact dedup.",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"),
        md5(trim(regexp_replace(lower(col("text")), " +", " ")))
          .as("fingerprint"))
      .orderBy("doc_id"),
    Some("""
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), ' +', ' ', 'g')))
               AS fingerprint
      FROM documents
      ORDER BY doc_id"""))

  private val jaccardOracle = """
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(a) - 1, 1)),
                 i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle
             FROM toks),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      pairs AS (SELECT s1.doc_id AS id_a, s2.doc_id AS id_b,
                       count(*) AS inter
                FROM sh s1 JOIN sh s2
                  ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
                GROUP BY 1, 2)
      SELECT id_a, id_b,
             round(inter * 1.0 / (na.n + nb.n - inter), 6) AS jaccard
      FROM pairs
      JOIN sizes na ON id_a = na.doc_id
      JOIN sizes nb ON id_b = nb.doc_id
      WHERE inter * 1.0 / (na.n + nb.n - inter) >= 0.8
      ORDER BY id_a, id_b"""

  private val q22 = QueryDef(
    "q22_ngram_jaccard_pairs",
    "Exact near-dup pairs: 3-gram shingle Jaccard >= 0.8 via an inverted " +
      "shingle index self-join (only docs sharing a shingle ever meet — " +
      "no cartesian).",
    (s, dir) => Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
        n = 3, threshold = 0.8)
      .orderBy("id_a", "id_b"),
    Some(jaccardOracle))

  private val q23 = QueryDef(
    "q23_minhash_lsh_pairs",
    "MinHash(32)+LSH(16 bands of 2) candidates, exact-Jaccard-verified at " +
      "0.8 — output equals the exact pair set (miss prob ~6e-8) at bucketed " +
      "cost. Same oracle as q22 by construction.",
    (s, dir) => Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        n = 3, numHashes = 32, rowsPerBand = 2, threshold = 0.8)
      .orderBy("id_a", "id_b"),
    Some(jaccardOracle))

  /** DuckDB twin of [[Dedup.simhash64]] + hamming<=3 pairing. The engine
    * uses pigeonhole banding to FIND the pairs but banding is exact for
    * the radius (any pair within hamming h matches on >= 1 of h+1 bands),
    * so the oracle can pair all-ways: same signature bits (md5 nibbles),
    * same pair set. Signature is a 64-char bit string on the SQL side —
    * DuckDB BIGINT can't shift into bit 63 — and `hamming()` counts
    * differing positions, which equals bit_count(xor) on the Spark side. */
  private def simhashOracle: String = {
    val bitSums = (0 until 64).map { j =>
      val nib = s"(strpos('0123456789abcdef', substr(h, ${j / 4 + 1}, 1)) - 1)"
      s"sum(CASE WHEN (($nib >> ${j % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS b$j"
    }.mkString(", ")
    val sigChars = (0 until 64)
      .map(j => s"CASE WHEN b$j > 0 THEN '1' ELSE '0' END").mkString(" || ")
    s"""
      WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
      th AS (SELECT doc_id, md5(t) AS h FROM tok WHERE t != ''),
      bits AS (SELECT doc_id, $bitSums FROM th GROUP BY doc_id),
      sig AS (SELECT doc_id, $sigChars AS s FROM bits),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(hamming(a.s, b.s) AS INTEGER) AS hamming
                FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
      SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
      ORDER BY id_a, id_b"""
  }

  private val q24 = QueryDef(
    "q24_simhash_pairs",
    "SimHash(64-bit, md5-nibble token bits) near-dup pairs at hamming<=3 " +
      "via pigeonhole banding (exact for the radius). Signature bits are " +
      "md5-derived so the DuckDB oracle computes the identical signatures " +
      "and pair set; semantics additionally pinned in DedupSpec.",
    (s, dir) => Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxHamming = 3)
      .orderBy("id_a", "id_b"),
    Some(simhashOracle))

  /** DuckDB twin of [[Dedup.connectedComponents]] over the q22 pair set:
    * a recursive CTE floods labels along the (symmetric) dup edges, and
    * min(label) per vertex is the component minimum — the same fixpoint
    * the engine's min-label propagation reaches. */
  private val clustersOracle = """
      WITH RECURSIVE
      toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(a) - 1, 1)),
                 i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle
             FROM toks),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      pairs AS (SELECT s1.doc_id AS id_a, s2.doc_id AS id_b,
                       count(*) AS inter
                FROM sh s1 JOIN sh s2
                  ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
                GROUP BY 1, 2),
      dup AS (SELECT id_a, id_b
              FROM pairs
              JOIN sizes na ON id_a = na.doc_id
              JOIN sizes nb ON id_b = nb.doc_id
              WHERE inter * 1.0 / (na.n + nb.n - inter) >= 0.8),
      edges AS (SELECT id_a AS src, id_b AS dst FROM dup
                UNION
                SELECT id_b AS src, id_a AS dst FROM dup),
      walk(id, comp) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id)
      SELECT id AS doc_id, min(comp) AS cluster_id
      FROM walk
      GROUP BY id
      ORDER BY doc_id"""

  private val q49 = QueryDef(
    "q49_dup_clusters",
    "Duplicate-cluster resolution: connected components over the exact " +
      "3-gram-Jaccard pair set (q22) via iterative min-label propagation " +
      "— one shuffle per round, O(cluster diameter) rounds, checkpoint-" +
      "truncated lineage, monotone-sum early stop. cluster_id = smallest " +
      "doc_id in the component; the DuckDB oracle reaches the same " +
      "fixpoint with a recursive CTE.",
    (s, dir) => Dedup.connectedComponents(
        Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text",
          n = 3, threshold = 0.8),
        "id_a", "id_b")
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
      .orderBy("doc_id"),
    Some(clustersOracle))

  private val q63 = QueryDef(
    "q63_keep_best_per_cluster",
    "Quality-priority dedup: within each duplicate cluster (q49's " +
      "components; singletons are their own cluster via the left join + " +
      "coalesce the operator contract requires), keep the HIGHEST-quality " +
      "document (q29's score, doc_id tie-break) instead of q53's " +
      "smallest-id representative — what a production pipeline actually " +
      "wants from dedup. Ranking and cluster size share one " +
      "cluster-keyed window shuffle.",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val clusters = Dedup.connectedComponents(
          Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8),
          "id_a", "id_b")
        .select(col("id").as("doc_id"), col("comp"))
      // Widened: the quality kernel otherwise runs on the one-file scan's
      // single task (graft.core.Par scaladoc); the cluster join below is
      // broadcast-sized, so nothing re-spreads it before the window.
      val labeled = graft.core.Par.widen(d).select(col("doc_id"),
          graft.functions.TextAnalysis.qualityScore(col("text")).as("quality"))
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("comp"), col("doc_id")))
      val byCluster = Window.partitionBy(col("cluster_id"))
      labeled
        .withColumn("rn", row_number().over(
          byCluster.orderBy(col("quality").desc, col("doc_id"))))
        .withColumn("cluster_size",
          count(lit(1)).over(byCluster).cast("int"))
        .where(col("rn") === 1)
        .select(col("cluster_id"), col("doc_id").as("kept_id"),
          col("quality"), col("cluster_size"))
        .orderBy("cluster_id")
    },
    Some(s"""
      WITH RECURSIVE
      toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(a) - 1, 1)),
                 i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle
             FROM toks),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      prs AS (SELECT s1.doc_id AS id_a, s2.doc_id AS id_b, count(*) AS inter
              FROM sh s1 JOIN sh s2
                ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
              GROUP BY 1, 2),
      dup AS (SELECT id_a, id_b
              FROM prs
              JOIN sizes na ON id_a = na.doc_id
              JOIN sizes nb ON id_b = nb.doc_id
              WHERE inter * 1.0 / (na.n + nb.n - inter) >= 0.8),
      edges AS (SELECT id_a AS src, id_b AS dst FROM dup
                UNION
                SELECT id_b AS src, id_a AS dst FROM dup),
      walk(id, comp) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id),
      comps AS (SELECT id AS doc_id, min(comp) AS comp FROM walk GROUP BY id),
      t AS (
        SELECT doc_id, text,
               CASE WHEN length(text) = 0 THEN 0
                    ELSE length(text) - length(replace(text, ' ', '')) + 1
                    END AS n_tok,
               len(list_filter(string_split(text, ' '),
                   x -> x IN (${TextQueries.stopListSql}))) AS n_stop,
               length(text) - length(regexp_replace(text, '[^A-Za-z ]', '', 'g'))
                 AS n_nonalpha
        FROM documents),
      q AS (
        SELECT doc_id,
               round(least(n_tok / 50.0, 1.0) * 0.4
                   + least(n_stop * 1.0 / nullif(n_tok, 0) * 5.0, 1.0) * 0.3
                   + greatest(0.0, 1.0 - n_nonalpha * 1.0 / nullif(length(text), 0) * 5.0) * 0.3,
                 6) AS quality
        FROM t),
      lab AS (SELECT d.doc_id, q.quality,
                     coalesce(c.comp, d.doc_id) AS cluster_id
              FROM documents d
              JOIN q USING (doc_id)
              LEFT JOIN comps c ON c.doc_id = d.doc_id),
      sel AS (SELECT cluster_id, doc_id, quality,
                     row_number() OVER (PARTITION BY cluster_id
                       ORDER BY quality DESC, doc_id) AS rn,
                     count(*) OVER (PARTITION BY cluster_id) AS cluster_size
              FROM lab)
      SELECT cluster_id, doc_id AS kept_id, quality,
             CAST(cluster_size AS INTEGER) AS cluster_size
      FROM sel WHERE rn = 1
      ORDER BY cluster_id"""))

  private val q75 = QueryDef(
    "q75_remove_dup_spans",
    "Exact duplicated-span REMOVAL (Lee et al. 2022 ExactSubstr family, " +
      "word-granular): every 4-token window whose text occurs more than " +
      "once in the corpus keeps only its globally-first occurrence " +
      "(min (doc_id, pos)); all other occurrences drop their tokens and " +
      "the survivors re-join. The cleaning step whose damage q65 only " +
      "measures. Gram stats are one map-side-combinable aggregate; the " +
      "removable set joins back gram-keyed then id-keyed; token filtering " +
      "is map-only.",
    (s, dir) => Dedup.removeDupSpans(docs(s, dir), "doc_id", "text", n = 4)
      .orderBy("doc_id"),
    Some("""
      WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      occ AS (
        SELECT doc_id, u.pos, u.gram FROM (
          SELECT doc_id,
                 unnest(list_transform(range(1, greatest(len(a) - 2, 1)),
                   i -> struct_pack(pos := i - 1,
                     gram := a[i] || ' ' || a[i+1] || ' ' || a[i+2]
                             || ' ' || a[i+3]))) AS u
          FROM toks)),
      stats AS (SELECT gram, count(*) AS cnt FROM occ GROUP BY gram),
      firsts AS (
        SELECT gram, doc_id AS f_id, pos AS f_pos FROM (
          SELECT gram, doc_id, pos,
                 row_number() OVER (PARTITION BY gram
                   ORDER BY doc_id, pos) AS rn
          FROM occ) WHERE rn = 1),
      removable AS (
        SELECT o.doc_id, o.pos
        FROM occ o JOIN stats USING (gram) JOIN firsts USING (gram)
        WHERE stats.cnt >= 2 AND NOT (o.doc_id = f_id AND o.pos = f_pos)),
      starts AS (SELECT doc_id, list_sort(list(pos)) AS ss
                 FROM removable GROUP BY doc_id),
      kept AS (
        SELECT t.doc_id, t.a,
               CASE WHEN st.ss IS NULL THEN t.a
                    ELSE list_filter(t.a, (x, i) ->
                      len(list_filter(st.ss,
                        s -> s <= i - 1 AND i - 1 < s + 4)) = 0)
                    END AS k
        FROM toks t LEFT JOIN starts st USING (doc_id))
      SELECT doc_id, coalesce(array_to_string(k, ' '), '') AS clean_text,
             CAST(len(a) - len(k) AS INTEGER) AS n_removed
      FROM kept
      ORDER BY doc_id"""))

  private val q77 = QueryDef(
    "q77_incremental_dedup",
    "Incremental cross-corpus dedup (continual-ingest shape): flag each " +
      "incoming doc (source longer than 'srcN', i.e. src10-src19) that " +
      "near-dups any doc of the existing corpus (src0-src9) at exact " +
      "3-gram Jaccard >= 0.8, found via MinHash(32)+LSH(16x2) new-vs-" +
      "existing band join — the existing side's signatures are computed " +
      "once and reusable per batch, so each ingest costs the BATCH, not " +
      "the union.",
    (s, dir) => {
      val d = docs(s, dir)
      Dedup.minhashLshPairsAgainst(
          d.where(length(col("source")) === 4),
          d.where(length(col("source")) > 4),
          "doc_id", "text", n = 3, numHashes = 32, rowsPerBand = 2,
          threshold = 0.8)
        .orderBy("id_new", "id_ref")
    },
    Some("""
      WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS a
                    FROM documents),
      sh AS (SELECT DISTINCT doc_id, source,
               unnest(list_transform(range(1, greatest(len(a) - 1, 1)),
                 i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle
             FROM toks),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      pairs AS (SELECT s1.doc_id AS id_new, s2.doc_id AS id_ref,
                       count(*) AS inter
                FROM sh s1 JOIN sh s2 ON s1.shingle = s2.shingle
                WHERE len(s1.source) > 4 AND len(s2.source) = 4
                GROUP BY 1, 2)
      SELECT id_new, id_ref,
             round(inter * 1.0 / (na.n + nb.n - inter), 6) AS jaccard
      FROM pairs
      JOIN sizes na ON id_new = na.doc_id
      JOIN sizes nb ON id_ref = nb.doc_id
      WHERE inter * 1.0 / (na.n + nb.n - inter) >= 0.8
      ORDER BY id_new, id_ref"""))

  private val q85 = QueryDef(
    "q85_leakage_safe_split",
    "Leakage-safe train/val/test split: q41's deterministic md5 bucket " +
      "applied to the duplicate-CLUSTER representative (q49's connected " +
      "components; singletons are their own cluster) instead of the " +
      "doc_id, so near-duplicates can never straddle a split boundary — " +
      "the eval-contamination failure mode of naive per-doc splits. " +
      "Stable across runs, engines, partitionings, and re-ingests; one " +
      "extra broadcast-size join over q41's map-only plan.",
    (s, dir) => {
      import graft.functions.Curation
      val d = docs(s, dir)
      val clusters = Dedup.connectedComponents(
          Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.8),
          "id_a", "id_b")
        .select(col("id").as("doc_id"), col("comp"))
      d.select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("comp"), col("doc_id")))
        .select(col("doc_id"), col("cluster_id"),
          Curation.splitLabel(col("cluster_id")).as("split"))
        .orderBy("doc_id")
    },
    Some("""
      WITH RECURSIVE
      toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
      sh AS (SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, greatest(len(a) - 1, 1)),
                 i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2])) AS shingle
             FROM toks),
      sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      prs AS (SELECT s1.doc_id AS id_a, s2.doc_id AS id_b, count(*) AS inter
              FROM sh s1 JOIN sh s2
                ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
              GROUP BY 1, 2),
      dup AS (SELECT id_a, id_b
              FROM prs
              JOIN sizes na ON id_a = na.doc_id
              JOIN sizes nb ON id_b = nb.doc_id
              WHERE inter * 1.0 / (na.n + nb.n - inter) >= 0.8),
      edges AS (SELECT id_a AS src, id_b AS dst FROM dup
                UNION
                SELECT id_b AS src, id_a AS dst FROM dup),
      walk(id, comp) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.id),
      comps AS (SELECT id AS doc_id, min(comp) AS comp FROM walk GROUP BY id),
      lab AS (SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster_id
              FROM documents d LEFT JOIN comps c USING (doc_id)),
      b AS (SELECT doc_id, cluster_id,
              CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 4))
                AS INTEGER) % 100 AS bucket
            FROM lab)
      SELECT doc_id, cluster_id,
             CASE WHEN bucket < 90 THEN 'train'
                  WHEN bucket < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM b
      ORDER BY doc_id"""))

  override val defs: Seq[QueryDef] =
    Seq(q20, q21, q22, q23, q24, q49, q63, q75, q77, q85)
}
