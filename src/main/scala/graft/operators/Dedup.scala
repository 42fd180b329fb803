package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expressions.{BloomExpressions, TextShingleExpressions}

/** Deduplication operators for large-scale text corpora — the training-data
  * pipeline extensions (BASELINE.json north star), built as pure
  * DataFrame transforms so every stage is one declarative plan:
  *
  *   - [[exactGroups]]: exact dedup by content hash (hash-groupBy).
  *   - [[ngramJaccardPairs]]: exact pairwise n-gram Jaccard via a
  *     length-filtered shingle-inverted-index self-join (no cartesian
  *     product: only docs sharing a shingle AND of Jaccard-compatible
  *     set sizes ever meet).
  *   - [[minhashLshPairs]]: MinHash signatures + banded LSH bucketing +
  *     exact-Jaccard verification of candidates. The scale path: candidate
  *     generation touches only same-bucket docs; verification touches only
  *     candidates.
  *   - [[simhash64]] / [[simhashPairs]]: 64-bit SimHash with pigeonhole
  *     band bucketing for hamming-distance candidates.
  *
  * Scale notes (100 TB): every join here is equi-keyed (shingle, bucket,
  * pair) — hash-shuffleable, AQE-skew-splittable. Hot shingles (stopword
  * runs) are the known skew source; [[ngramJaccardPairs]] takes an optional
  * document-frequency cap that drops shingles appearing in more than
  * `maxShingleDf` docs — ultra-common shingles contribute almost no Jaccard
  * signal but dominate pair-generation cost.
  */
object Dedup {

  /** Word n-gram shingle set per document: (id, shingle), distinct.
    * Shingle i = words[i..i+n-1] joined by single spaces; documents shorter
    * than n words produce no shingles.
    *
    * Runs as the native [[graft.expressions.WordShinglesExpr]] — one pass
    * per document inside whole-stage codegen, instead of an interpreted
    * array lambda that re-split the text per shingle position. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    TextShingleExpressions.register(df.sparkSession)
    graft.core.Par.widen(df).select(col(idCol),
        explode(call_function("word_shingles", col(textCol), lit(n)))
          .as("shingle"))
      .distinct()
  }

  /** Benchmark decontamination: n-gram overlap between a training corpus
    * and a benchmark/eval set — the standard pre-training hygiene step
    * (flag a training doc when it shares >= `minShared` distinct n-grams
    * with any single benchmark doc). Returns
    * (train_id, bench_id, shared_ngrams) for every flagged pair.
    *
    * Scale shape: benchmark sets are small by nature (MBs against a
    * 100 TB corpus), so the bench shingle index BROADCASTS — the
    * training-side scan is map-local (no shuffle of corpus shingles);
    * only matched (train, bench) candidate rows reach the counting
    * shuffle, which is keyed on the pair. */
  def crossNgramOverlap(train: DataFrame, bench: DataFrame,
                        idCol: String, textCol: String,
                        n: Int = 3, minShared: Long = 2L): DataFrame = {
    val st = shingles(train, idCol, textCol, n)
      .select(col(idCol).as("train_id"), col("shingle"))
    val sb = shingles(bench, idCol, textCol, n)
      .select(col(idCol).as("bench_id"), col("shingle"))
    st.join(broadcast(sb), "shingle")
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)
  }

  /** Bloom-prefiltered decontamination — IDENTICAL output to
    * [[crossNgramOverlap]] (no false negatives in the Bloom filter, and
    * the verify join discards its false positives; parity pinned in
    * DedupSpec), for benchmark suites too large to broadcast as a
    * string-keyed hash index.
    *
    * Scale shape: [[crossNgramOverlap]] broadcasts the bench shingle
    * STRINGS — fine for MB-scale benchmarks, but a full eval-suite
    * sweep (every benchmark + test split an org guards against) can
    * reach GBs of distinct shingles, past any sane
    * `autoBroadcastJoinThreshold`. Here the bench side is summarized as
    * a Bloom filter (~1.2 MB per million shingles at fpp=0.01 — the
    * strings' hashes, not the strings), the 100 TB training scan probes
    * it map-side inside codegen ([[graft.expressions.BloomMightContain]]),
    * and only `matches + fpp·|corpus shingles|` survivor rows reach the
    * equi-join that verifies exactly. The filter itself is built
    * DISTRIBUTED (`stat.bloomFilter` tree-aggregates partial filters) —
    * no shingle collect. */
  def crossNgramOverlapBloom(train: DataFrame, bench: DataFrame,
                             idCol: String, textCol: String,
                             n: Int = 3, minShared: Long = 2L,
                             fpp: Double = 0.01): DataFrame = {
    BloomExpressions.register(train.sparkSession)
    val st = shingles(train, idCol, textCol, n)
      .select(col(idCol).as("train_id"), col("shingle"))
    // Bench side is materialized once — it feeds the distinct count, the
    // filter build, and the verify join (the connectedComponents lesson:
    // never let three consumers re-execute the upstream explode).
    val sb = shingles(bench, idCol, textCol, n)
      .select(col(idCol).as("bench_id"), col("shingle"))
      .localCheckpoint(true)
    val bytes = bloomOf(sb, "shingle", fpp)
    st.where(call_function("bloom_might_contain", lit(bytes), col("shingle")))
      .join(sb, "shingle")
      .groupBy("train_id", "bench_id")
      .agg(count(lit(1)).as("shared_ngrams"))
      .where(col("shared_ngrams") >= minShared)
  }

  /** Serialized Bloom filter over the DISTINCT values of `valueCol`,
    * built distributed (`stat.bloomFilter` tree-aggregates partial
    * filters — no value collect); ~10 bits per item at fpp=0.01.
    * Probe with [[graft.expressions.BloomMightContain]]. */
  def bloomOf(df: DataFrame, valueCol: String, fpp: Double = 0.01): Array[Byte] = {
    val d = df.select(valueCol).distinct()
    val expected = math.max(d.count(), 1L)
    val bf = d.stat.bloomFilter(col(valueCol), expected, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Bloom summary of a benchmark set's n-gram shingles — the artifact a
    * decontamination gate ships to ingest (see
    * [[graft.streaming.StreamingCuration.decontaminationGate]]): built
    * batch-side whenever the eval suite changes, probed per incoming doc. */
  def benchBloom(bench: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, fpp: Double = 0.01): Array[Byte] =
    bloomOf(shingles(bench, idCol, textCol, n), "shingle", fpp)

  /** Exact dedup: group identical content, keep the smallest id.
    * Returns (keep_id, dup_count, content_hash). */
  def exactGroups(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .select("keep_id", "dup_count", "content_hash")

  /** Duplicate-cluster resolution: connected components over an undirected
    * pair list — the step that turns pairwise near-dup output (q22/q23/
    * q24/q27 shapes) into "keep one representative per duplicate cluster".
    * Returns (id, comp) where comp = the smallest id in the component,
    * for every id that appears in a pair.
    *
    * Iterative min-label propagation: each round pushes labels across
    * edges and takes the per-vertex min — ONE shuffle per round,
    * converging in O(component diameter) rounds (near-dup clusters are
    * shallow; transitive chains longer than a handful of hops are rare by
    * construction of a similarity threshold). Scale mechanics:
    * lineage is truncated each round (localCheckpoint) so the plan does
    * not grow with iterations, and early stop uses the monotone
    * sum-of-labels invariant — labels only ever decrease, so an unchanged
    * sum IS the fixpoint; that check is one scalar action per round, no
    * driver-side data. maxIters bounds pathological chains; hitting the
    * bound throws rather than silently returning unconverged clusters.
    *
    * SIZE-ADAPTIVE: a near-dup pair graph is usually orders of magnitude
    * smaller than its corpus (only the duplicates appear). Below
    * `driverEdgeLimit` edges the components are solved with a driver
    * union-find — bounded memory (≈16 B/edge), one job, no iteration —
    * the same bounded-driver-work pattern as the IVF trainer. Above it,
    * the distributed min-label loop runs. Identical output either way
    * (pinned in DedupSpec).
    *
    * OUTPUT CONTRACT: labels are emitted only for ids that appear in
    * `pairs` — singleton documents (no near-dup edge) are absent.
    * Consumers wanting every document (e.g. q53's keep-one-per-cluster
    * pruning) must left-join the corpus back and treat a null component
    * as its own singleton cluster. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 25,
                          driverEdgeLimit: Long = 1000000L): DataFrame = {
    val a = col(aCol).cast(LongType)
    val b = col(bCol).cast(LongType)
    // Materialize the edge set ONCE (it's slim — two longs per edge):
    // the size gate, the driver collect, and the distributed union all
    // reuse it. Without this the upstream pair join — the expensive part
    // of every near-dup pipeline — re-executes 2-3x.
    val undirected = pairs
      .select(a.as("src"), b.as("dst"))
      .distinct()
      .localCheckpoint(true)

    if (undirected.count() <= driverEdgeLimit)
      return driverComponents(pairs.sparkSession, undirected)

    val edges = undirected
      .union(undirected.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var prevSum: java.math.BigDecimal = null
    var round = 0
    var converged = false
    while (!converged) {
      require(round < maxIters,
        s"connectedComponents: no fixpoint after $maxIters rounds")
      val prop = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp"))
        .union(labels)
        .groupBy("id").agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      val s = prop.agg(sum(col("comp").cast(DecimalType(38, 0))))
        .head().getDecimal(0)
      converged = s == prevSum
      prevSum = s
      labels = prop
      round += 1
    }
    labels
  }

  /** Driver union-find for the small-graph path: min-root union keeps
    * every root at its component's minimum id, so `find` after all
    * unions IS the min-label fixpoint the distributed loop reaches. */
  private def driverComponents(spark: org.apache.spark.sql.SparkSession,
                               undirected: DataFrame): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    undirected.collect().foreach { row =>
      val s = row.getLong(0); val d = row.getLong(1)
      parent.getOrElseUpdate(s, s)
      parent.getOrElseUpdate(d, d)
      val rs = find(s); val rd = find(d)
      if (rs != rd) { if (rs < rd) parent(rd) = rs else parent(rs) = rd }
    }
    parent.keys.toSeq.sorted.map(v => (v, find(v))).toDF("id", "comp")
  }

  /** Corpus-duplicate n-gram fraction (the Gopher/RefinedWeb "duplicate
    * n-grams" quality filter; reference anchor: the same cheap-statistics
    * discipline as etl/mappers/directory.py:30-119, lifted to corpus
    * scope): for each document, the fraction of its DISTINCT n-gram
    * shingles that also occur in at least one OTHER document. The
    * ACROSS-corpus twin of the within-doc repetition stats (q57) — high
    * values flag boilerplate/template content that per-doc stats miss.
    *
    * Scale shape: shingle set (native kernel, distinct per doc) →
    * document-frequency aggregate (map-side combinable; bounded by
    * shingle vocabulary, not corpus size) → shingle-keyed semi-join back
    * (co-partitions with the aggregate — no broadcast of the
    * corpus-sized duplicate set) → one per-doc count. Docs shorter than
    * n words have no shingles and are excluded, like [[shingles]]. */
  def dupNgramStats(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, roundTo: Int = 6): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val dup = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
      .where(col("__df") >= 2).select("shingle")
    val perDoc = sh.groupBy(idCol).agg(count(lit(1)).as("n_shingles"))
    val dupPerDoc = sh.join(dup, Seq("shingle"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("__n_dup"))
    perDoc.join(dupPerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles").cast("int").as("n_shingles"),
        round(coalesce(col("__n_dup"), lit(0L)) / col("n_shingles"), roundTo)
          .as("dup_ngram_frac"))
  }

  /** Exact duplicated-span REMOVAL — the cleaning step whose damage
    * [[dupNgramStats]] only measures (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": remove every occurrence
    * of a duplicated substring except one; word-granular here, span = n
    * consecutive tokens).
    *
    * Any n-token window whose exact text occurs more than once in the
    * corpus (across documents or repeated within one) is a duplicated
    * span. The globally FIRST occurrence — min (id, pos) — is canonical
    * and keeps its tokens; every other occurrence drops the n tokens it
    * covers, and the survivors re-join with single spaces. A canonical
    * span's token can still fall to a DIFFERENT overlapping removable
    * span: inherent to span-granular removal, and replicated exactly by
    * the oracle.
    *
    * Scale shape: occurrences are one posexplode of the codegen'd
    * `word_ngrams` multiset; gram stats (count + min(struct(id, pos)))
    * are one map-side-combinable gram-keyed aggregate; removable
    * occurrences join back gram-keyed (equi-join, never broadcast) and
    * collapse to a per-doc sorted start list that rejoins id-keyed;
    * token filtering is a map-only array pass. The occurrence table is
    * cached for its two consumers at test scale — at 100 TB materialize
    * it once instead ([[dupNgramStats]]' note applies verbatim). Nothing
    * is corpus-proportional on the driver. */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
                     n: Int = 4): DataFrame = {
    TextShingleExpressions.register(df.sparkSession)
    val occ = df.select(col(idCol),
        posexplode(call_function("word_ngrams", col(textCol), lit(n)))
          .as(Seq("pos", "gram")))
      .cache()
    val stats = occ.groupBy("gram").agg(
      count(lit(1)).as("__cnt"),
      min(struct(col(idCol), col("pos"))).as("__first"))
    val removable = occ.join(stats, Seq("gram"))
      .where(col("__cnt") >= 2 &&
        !(col(idCol) === col(s"__first.$idCol") &&
          col("pos") === col("__first.pos")))
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("pos"))).as("__starts"))
    df.join(removable, Seq(idCol), "left")
      .withColumn("__tok", split(col(textCol), " "))
      .withColumn("__kept",
        when(col("__starts").isNull, col("__tok")).otherwise(
          filter(col("__tok"), (_, p) =>
            !exists(col("__starts"), s => s <= p && p < s + lit(n)))))
      .select(col(idCol),
        concat_ws(" ", col("__kept")).as("clean_text"),
        (size(col("__tok")) - size(col("__kept"))).cast("int")
          .as("n_removed"))
  }

  /** Exact pairwise n-gram Jaccard over an inverted shingle index:
    * (id_a < id_b, jaccard) for pairs with jaccard >= threshold.
    *
    * The self-join carries each side's set size and applies the exact
    * LENGTH FILTER of the set-similarity-join literature (Arasu et al.
    * 2006 SSJoin; Bayardo et al. 2007 AllPairs) INSIDE the join:
    * J(A,B) >= t implies |A∩B| >= t·|A∪B| >= t·max(|A|,|B|), and
    * |A∩B| <= min(|A|,|B|), so every qualifying pair satisfies
    * min(|A|,|B|) >= t·max(|A|,|B|) — pairs of too-different sizes are
    * culled BEFORE the candidate multiset is shuffled and aggregated
    * (measured at sf0.1, t=0.8: 1.27M candidate rows -> 469k, 1.13M
    * distinct pairs -> 402k). The epsilon term only ever WEAKENS the
    * cut — double rounding of t·max must never cull a boundary pair
    * exact arithmetic admits — so output is identical to the unfiltered
    * join (parity pinned in DedupSpec, plus the q22/q49/q53/q63/q85
    * oracles). Sizes ride the join rows into the pair aggregate as
    * grouping keys, so the Jaccard needs no post-aggregate size joins.
    *
    * The size table joins UNHINTED: one row per doc, so the planner
    * broadcasts it at bench scale and shuffle-joins the corpus-sized
    * version at 100 TB — both shapes correct.
    *
    * PPJoin/AllPairs PREFIX filtering (index only each doc's
    * (1-t)·|A|+1 globally-rarest shingles for candidate generation) was
    * implemented, oracle-verified, and measured this round — and
    * REJECTED on this corpus: the rarity-ordered prefixes did identify
    * the candidate docs (2.3k of 5k at sf0.1), but the survivors' index
    * slice still self-joined to the same 1.25M-row candidate multiset
    * (the corpus is uniformly template-similar — collision mass
    * concentrates exactly in the docs any correct prefix filter must
    * keep), while the filter itself added a df aggregate plus a
    * doc-keyed window per run; every variant measured at or above the
    * exhaustive join. The length filter is the member of the same
    * exact-filter family whose cut actually bites here; see
    * OPTIMIZATION_r16.md for the full measurement trail. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.8,
                        maxShingleDf: Option[Int] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val sh = shingles(df, idCol, textCol, n).cache()
    val shFiltered = maxShingleDf match {
      case Some(cap) =>
        val rare = sh.groupBy("shingle").count().where(col("count") <= cap)
          .select("shingle")
        sh.join(broadcast(rare), Seq("shingle"), "left_semi")
      case None => sh
    }
    // FULL set sizes: the Jaccard denominator is over the unfiltered
    // sets, exactly as before the hot-shingle cap drops index rows.
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    // Cached: BOTH self-join sides consume the size-annotated index;
    // uncached, each side re-runs the sizes aggregate + attach join
    // over the shingle cache (measured +0.7s per query at sf0.1).
    val shS = shFiltered.join(sizes, idCol).cache()
    val nA = col("a.n_sh"); val nB = col("b.n_sh")
    val lengthOk = least(nA, nB).cast("double") >=
      lit(threshold) * greatest(nA, nB) -
      lit(1e-9) * greatest(nA, nB) - lit(1e-9)
    val inter = shS.as("a").join(shS.as("b"),
        col("a.shingle") === col("b.shingle")
          && col(s"a.$idCol") < col(s"b.$idCol") && lengthOk)
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        nA.as("n_a"), nB.as("n_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard",
        col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** The unfiltered formulation — the exhaustive inverted-index
    * self-join (every shared shingle generates a candidate row, no
    * length cut). Kept ONLY as the parity oracle for
    * [[ngramJaccardPairs]]'s in-join candidate pruning (DedupSpec); no
    * query path calls it. */
  private[graft] def ngramJaccardPairsExhaustive(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val shFiltered = maxShingleDf match {
      case Some(cap) =>
        val rare = sh.groupBy("shingle").count().where(col("count") <= cap)
          .select("shingle")
        sh.join(broadcast(rare), Seq("shingle"), "left_semi")
      case None => sh
    }
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val inter = shFiltered.as("a").join(shFiltered.as("b"),
        col("a.shingle") === col("b.shingle")
          && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    jaccardFilter(inter, sizes, idCol, threshold)
  }

  private def jaccardFilter(inter: DataFrame, sizes: DataFrame, idCol: String,
                            threshold: Double): DataFrame = {
    val sa = sizes.select(col(idCol).as("id_a"), col("n_sh").as("n_a"))
    val sb = sizes.select(col(idCol).as("id_b"), col("n_sh").as("n_b"))
    inter.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard",
        col("inter") / (col("n_a") + col("n_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signature per document: (id, sig ARRAY<BIGINT> of length
    * `numHashes`). ONE codegen'd projection (MinHashSigsExpr) — the
    * signature is a pure function of the document's shingle set, and the
    * earlier explode + numHashes-min groupBy shuffled every (doc, shingle)
    * row to compute it. Base hash (28-bit md5-hex prefix) and universal
    * hashes are bit-identical to that pipeline. Docs with no shingles
    * emit no row, matching the explode path's contract. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 32,
                        seed: Long = 42L): DataFrame = {
    TextShingleExpressions.register(df.sparkSession)
    df.select(col(idCol),
        call_function("word_shingles", col(textCol), lit(n)).as("__sh"))
      .where(size(col("__sh")) > 0)
      .select(col(idCol),
        call_function("minhash_sigs", col("__sh"), lit(numHashes),
          lit(seed)).as("sig"))
  }

  /** MinHash LSH near-dup pairs, verified with exact Jaccard.
    *
    * Bands of `rowsPerBand` signature slots; docs sharing any full band
    * land in a bucket; same-bucket pairs are candidates; candidates are
    * verified against the exact shingle Jaccard >= threshold. With
    * numHashes=32, rowsPerBand=2 (16 bands), P(miss) at s=0.8 is
    * (1-0.64)^16 ≈ 6e-8 — the verified output is the exact pair set with
    * overwhelming probability, at a fraction of the all-pairs cost. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 2,
                      threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand
    // Signatures come from the fused per-row kernel (no shuffle); the
    // exploded shingle pass below is cached because candidate
    // VERIFICATION still needs the inverted (id, shingle) index twice
    // (sizes + intersection join).
    val sh = shingles(df, idCol, textCol, n).cache()
    val sigs = minhashSignatures(df, idCol, textCol, n, numHashes, seed)
    // Cached: both sides of the band self-join consume it, and uncached
    // each side re-runs the fused shingle+minhash kernel over the whole
    // corpus. Slim rows (id, band, key) — numBands per doc.
    val bands = bandKeys(sigs, idCol, numBands, rowsPerBand).cache()

    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()

    // Exact verification of candidates only.
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val shA = sh.select(col(idCol).as("id_a"), col("shingle"))
    val shB = sh.select(col(idCol).as("id_b"), col("shingle"))
    val inter = candidates
      .join(shA, "id_a").join(shB, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    jaccardFilter(inter, sizes, idCol, threshold)
  }

  /** (id, band, key) LSH bucket keys from a minhash-signature table —
    * one banded posexplode, payload-free (ids + band keys only reach the
    * bucket join). Shared with the streaming gate
    * ([[graft.streaming.StreamingDedup.crossDedupGate]]) so both paths
    * bucket identically. */
  private[graft] def bandKeys(sigs: DataFrame, idCol: String, numBands: Int,
                              rowsPerBand: Int): DataFrame =
    sigs.select(col(idCol), posexplode(
        array((0 until numBands).map { b =>
          struct(lit(b).as("band"),
            concat_ws(":", (0 until rowsPerBand).map(r =>
              element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("key"))
        }: _*)).as(Seq("__pos", "bk")))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))

  /** Incremental (cross-corpus) MinHash LSH dedup: flag each INCOMING doc
    * that near-dups (exact shingle Jaccard >= threshold) any doc of the
    * EXISTING corpus — the continual-ingest shape, where the training set
    * is already deduped and each new crawl batch is checked AGAINST it
    * instead of re-deduping the union (a (N+M)² restart at 100 TB; this
    * is M·selectivity).
    *
    * Same signature/band/verify machinery as [[minhashLshPairs]], but the
    * band join is new-vs-existing only (no self-pairs on either side):
    * at scale the existing corpus's signatures and band keys are computed
    * ONCE at its own dedup time and persisted partitioned by (band, key),
    * so an incoming batch bands map-locally and the bucket join shuffles
    * only the (usually much smaller) new side. Returns
    * (id_new, id_ref, jaccard); ids need not be disjoint across corpora —
    * sides are tracked positionally, not by comparison. */
  def minhashLshPairsAgainst(existing: DataFrame, incoming: DataFrame,
                             idCol: String, textCol: String,
                             n: Int = 3, numHashes: Int = 32,
                             rowsPerBand: Int = 2, threshold: Double = 0.8,
                             seed: Long = 42L): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand
    val shNew = shingles(incoming, idCol, textCol, n).cache()
    val shRef = shingles(existing, idCol, textCol, n).cache()
    val bandsNew = bandKeys(
      minhashSignatures(incoming, idCol, textCol, n, numHashes, seed),
      idCol, numBands, rowsPerBand)
    val bandsRef = bandKeys(
      minhashSignatures(existing, idCol, textCol, n, numHashes, seed),
      idCol, numBands, rowsPerBand)

    val candidates = bandsNew.as("x").join(bandsRef.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key"))
      .select(col(s"x.$idCol").as("id_new"), col(s"y.$idCol").as("id_ref"))
      .distinct()

    // Exact verification of candidates only, sizes per side.
    val inter = candidates
      .join(shNew.select(col(idCol).as("id_new"), col("shingle")), "id_new")
      .join(shRef.select(col(idCol).as("id_ref"), col("shingle")),
        Seq("id_ref", "shingle"))
      .groupBy("id_new", "id_ref").agg(count(lit(1)).as("inter"))
    val szNew = shNew.groupBy(idCol).agg(count(lit(1)).as("n_new"))
      .select(col(idCol).as("id_new"), col("n_new"))
    val szRef = shRef.groupBy(idCol).agg(count(lit(1)).as("n_ref"))
      .select(col(idCol).as("id_ref"), col("n_ref"))
    inter.join(szNew, "id_new").join(szRef, "id_ref")
      .withColumn("jaccard",
        col("inter") / (col("n_new") + col("n_ref") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_ref"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash per document over whitespace tokens weighted by
    * frequency. Token bits come from the 16 hex nibbles of md5(token)
    * (bit j = bit j%4 of nibble j/4) — engine-portable, so a SQL oracle
    * can derive the identical signature (md5 is the one cryptographic
    * hash every engine exposes with identical output; xxhash64 is not). */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    TextShingleExpressions.register(df.sparkSession)
    // One codegen'd projection per row (SimHash64Expr) — a signature is a
    // pure function of the document, and the earlier explode + 64-sum
    // groupBy shuffled every token to compute it. The filter preserves
    // that pipeline's contract: docs with no non-empty token (null or
    // all-space text) produced no rows then, so they produce none now.
    graft.core.Par.widen(df)
      .where(trim(col(textCol).cast(StringType)) =!= "")
      .select(col(idCol),
        call_function("simhash64_doc", col(textCol)).as("simhash"))
  }

  /** Near-dup pairs with hamming(simhash) <= maxHamming, via pigeonhole
    * banding: split 64 bits into `maxHamming+1` bands — any pair within
    * the radius matches exactly on at least one band. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame =
    hammingPairs64(simhash64(df, idCol, textCol), idCol, "simhash",
      maxHamming)

  /** Pigeonhole-banded near-dup pairs over ANY 64-bit signature column
    * (text SimHash, image dHash, audio fingerprint ...): split the 64
    * bits into `maxHamming + 1` bands — a pair within the radius agrees
    * exactly on at least one band, so candidates come from an equi-join
    * on (band, band-bits), never all-pairs. `alsoOn` adds extra
    * equality columns to the join (and the output) — e.g. a frame index,
    * so video frames only pair with the SAME-position frame. */
  def hammingPairs64(hashes: DataFrame, idCol: String, hashCol: String,
                     maxHamming: Int,
                     alsoOn: Seq[String] = Nil): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "radius must be in [0, 64)")
    val numBands = maxHamming + 1
    val width = 64 / numBands
    def bandKey(h: Column, b: Int): Column =
      shiftright(h, b * width).bitwiseAND((1L << width) - 1)
    // Widened: signature tables are slim (often one file), and the band
    // self-join's probe side evaluates the in-join hamming filter over
    // every raw bucket collision — on clustered corpora the dominant
    // cost — in ITS scan partitions (graft.core.Par scaladoc).
    val bands = graft.core.Par.widen(hashes).select(
      (Seq(col(idCol), col(hashCol)) ++ alsoOn.map(col) :+ posexplode(
        array((0 until numBands).map(bandKey(col(hashCol), _)): _*))
        .as(Seq("band", "key"))): _*)
    // Hamming filter INSIDE the join: rejected pairs never reach the
    // output. CANONICAL-BAND emission kills the cross-band duplicates
    // at the source: a pair within the radius matches on >= 1 band
    // (pigeonhole), and both hashes sit in the joined row, so "this is
    // the pair's FIRST matching band" is just one more join-side
    // predicate (least over the per-band xor-segment tests) — each
    // qualifying pair emits EXACTLY once and the distinct() that used
    // to dedup band collisions (a full extra wide exchange on the
    // candidate set, the dominant cost on clustered corpora) vanishes.
    val xor = col(s"x.$hashCol").bitwiseXOR(col(s"y.$hashCol"))
    val firstMatchingBand = least((0 until numBands).map { b =>
      when(bandKey(xor, b) === 0, lit(b))
    }: _*)
    val joinCond = (Seq(
      col("x.band") === col("y.band"), col("x.key") === col("y.key"),
      col(s"x.$idCol") < col(s"y.$idCol"),
      bit_count(xor) <= maxHamming,
      col("x.band") === firstMatchingBand) ++
      alsoOn.map(k => col(s"x.$k") === col(s"y.$k"))).reduce(_ && _)
    bands.as("x").join(bands.as("y"), joinCond)
      .select(Seq(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b")) ++
        alsoOn.map(k => col(s"x.$k")) :+
        bit_count(xor).as("hamming"): _*)
  }

  /** Video near-dup pairs from per-frame signatures: frames pair only at
    * the SAME frame index (the banded join with `alsoOn`), and a pair of
    * VIDEOS is a near-dup when at least `minMatching` of their aligned
    * frames land within the radius — the frame-voting scheme video
    * dedup pipelines use so one corrupted frame can't split a dup pair
    * and one coincidental frame can't join a false one. */
  def videoNearDupPairs(frameHashes: DataFrame, idCol: String,
                        frameCol: String, hashCol: String,
                        maxHamming: Int, minMatching: Int): DataFrame =
    hammingPairs64(frameHashes, idCol, hashCol, maxHamming,
      alsoOn = Seq(frameCol))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_matching"),
        max(col("hamming")).cast("int").as("max_hamming"))
      .where(col("n_matching") >= minMatching)
}
