package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Par
import graft.expressions.{QuantizeExpressions, VectorExpressions}

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  *   - [[topKNeighbors]]: brute-force cosine top-k against one query vector
  *     — the exactness baseline. One scan, no shuffle until the top-k
  *     (TakeOrdered) reduction; the query vector travels as a literal.
  *   - [[cosineNearDupPairs]]: exact all-pairs cosine >= threshold, as a
  *     plain `id_a < id_b` broadcast-nested-loop join — O(n²) by
  *     definition and kept ONLY as the exactness baseline the scale paths
  *     verify against (PlanGuard-allowlisted). At scale use
  *     [[blockedNearDupPairs]] (exact, equi-keyed block grid) or
  *     [[lshNearDupPairs]] (approximate, banded).
  *   - [[lshNearDupPairs]]: random-hyperplane LSH — b bands of r sign bits;
  *     same-band docs become candidates; candidates verified with exact
  *     cosine. Recall at cos=c per band-hit prob p=(1-acos(c)/pi)^r:
  *     1-(1-p)^b. Hyperplanes are deterministic from `seed`.
  *
  * All cosine math goes through the codegen'd [[graft.expressions.CosineSimilarity]]
  * (double-widened, sequential accumulation — oracle-bit-compatible).
  */
object Similarity {

  private def cos(spark: SparkSession, a: String, b: String): Column =
    VectorExpressions.cosineSim(spark, a, b)

  /** Top-k nearest by cosine to the vector of `queryId`. */
  def topKNeighbors(spark: SparkSession, df: DataFrame, idCol: String,
                    vecCol: String, queryId: Long, k: Int,
                    roundTo: Int = 6): DataFrame = {
    val q = df.where(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    df.crossJoin(broadcast(q))
      .select(col(idCol),
        round(cos(spark, vecCol, "__qv"), roundTo).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Similarity JOIN: top-k nearest per query vector, for a SET of query
    * ids — the batch form of [[topKNeighbors]]. Queries broadcast (they
    * are the small side by construction); one corpus scan computes every
    * (query, candidate) cosine; ranking shuffles by query id — balanced
    * whenever the query set is non-trivial, which is exactly when the
    * batch form matters. Ranks on the ROUNDED cosine with id tie-break so
    * engine boundaries agree. Self-matches (qid == id) rank first at
    * cosine 1.0 — callers filter if unwanted (deterministic either way). */
  def batchTopKNeighbors(spark: SparkSession, df: DataFrame, idCol: String,
                         vecCol: String, queryIds: Seq[Long], k: Int,
                         roundTo: Int = 6): DataFrame = {
    val q = df.where(col(idCol).isin(queryIds.map(Long.box): _*))
      .select(col(idCol).as("qid"), col(vecCol).as("__qv"))
    val ranked = df.crossJoin(broadcast(q))
      .select(col("qid"), col(idCol),
        round(cos(spark, vecCol, "__qv"), roundTo).as("cosine"))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("cosine").desc, col(idCol))))
    ranked.where(col("__rn") <= k).drop("__rn")
  }

  /** Exact all-pairs cosine near-dup: (id_a < id_b, cosine >= threshold).
    * Threshold compares the ROUNDED value so engine boundaries agree. */
  def cosineNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
                         vecCol: String, threshold: Double,
                         roundTo: Int = 6): DataFrame = {
    // The probe (stream) side of the nested-loop pair join does ALL the
    // n²/2 cosine work in its own partitions; a one-file corpus would
    // run it on a single task (Par.widen scaladoc).
    val a = Par.widen(df).select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", round(cos(spark, "__va", "__vb"), roundTo))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Exact near-dup via an int8-quantized prefilter: identical OUTPUT to
    * [[cosineNearDupPairs]], ~4x less shuffle. The all-pairs join moves
    * (id, scale, 1-byte-per-dim codes) instead of 4-byte floats; the
    * integer quantized_cosine kernel prefilters at `threshold - margin`;
    * only survivors re-join the float vectors for exact verification.
    *
    * SOUNDNESS PRECONDITION: `margin` must dominate the corpus's actual
    * quantization error on cosine. The 0.05 default holds for roughly
    * isotropic embeddings (the test corpus measures < 0.02), but
    * heavy-tailed per-vector coordinates — one dominant spike crushes
    * every other code toward zero — can push the error past 0.13
    * (QuantizeSpec pins both regimes). When the distribution is unknown,
    * measure: pass `margin = measuredQuantizationMargin(...) * safety`.
    */
  def quantizedNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
                            vecCol: String, threshold: Double,
                            margin: Double = 0.05,
                            roundTo: Int = 6): DataFrame = {
    QuantizeExpressions.register(spark)
    // Widened for the same single-task-probe reason as cosineNearDupPairs
    // (the int8 prefilter evaluates inside the pair join, on q's
    // partitioning).
    val q = Par.widen(df).select(col(idCol),
      call_function("quantize_int8", col(vecCol)).as("__q"))
    val a = q.select(col(idCol).as("id_a"), col("__q").as("__qa"))
    val b = q.select(col(idCol).as("id_b"), col("__q").as("__qb"))
    val cand = a.join(b, col("id_a") < col("id_b"))
      .where(call_function("quantized_cosine", col("__qa"), col("__qb"))
        >= threshold - margin)
      .select("id_a", "id_b")
    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine", round(cos(spark, "__va", "__vb"), roundTo))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Exact near-dup via block-grid pair enumeration: identical OUTPUT to
    * [[cosineNearDupPairs]] with neither a BroadcastNestedLoop nor a
    * CartesianProduct in the plan. Each row gets a block `pmod(hash(id),
    * blocks)`; the unordered block grid has `blocks*(blocks+1)/2` cells
    * and every unordered row pair meets in EXACTLY one cell (row in block
    * i replicates to cells (i, j>=i) as the left side and (i<=j, j) as the
    * right side), so the cell id is a plain equi-join key: the executor
    * holding a cell sees only its two blocks, work spreads evenly across
    * `cells` tasks, and shuffle volume is `n*(blocks+1)` rows of ~72-byte
    * int8 codes — the float vectors never enter the pair join.
    *
    * Why this over LSH banding for the EXACT join: at low thresholds the
    * banded candidate stream exceeds all-pairs (at t=0.42, a 2-sign-bit
    * band key collides on ~25% of random pairs, so 24 bands evaluate ~6x
    * the n^2/2 pairs this grid evaluates once each; the LSH exponent
    * rho = ln(p1)/ln(p2) ~ 0.65 at t=0.42 says no banding parameters
    * recover more than a marginal factor). Banding wins on HIGH-threshold
    * approximate joins — that path is [[lshNearDupPairs]] (q27).
    *
    * Per-pair cost is the int8 `quantized_cosine` prefilter at
    * `threshold - margin` (same soundness precondition as
    * [[quantizedNearDupPairs]]); only survivors join back to the float
    * vectors for exact verification. */
  def blockedNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
                          vecCol: String, threshold: Double,
                          margin: Double = 0.05, blocks: Int = 16,
                          roundTo: Int = 6): DataFrame = {
    require(blocks >= 1)
    QuantizeExpressions.register(spark)
    val b = lit(blocks)
    // Widened: when the planner broadcasts one grid side, the cell join
    // and its in-join prefilter run on the OTHER side's scan partitions.
    val q = Par.widen(df).select(col(idCol).as("__id"),
        call_function("quantize_int8", col(vecCol)).as("__q"))
      .withColumn("__blk", pmod(hash(col("__id")), b))
    // Left side of cell (i, j): rows of block i, for every j in [i, blocks).
    val lhs = q.withColumn("__cell",
      explode(transform(sequence(col("__blk"), b - 1),
        j => col("__blk") * b + j)))
    // Right side of cell (i, j): rows of block j, for every i in [0, j].
    val rhs = q.withColumn("__cell",
      explode(transform(sequence(lit(0), col("__blk")),
        i => i * b + col("__blk"))))
    // Off-diagonal cells see each unordered pair once (arbitrary order —
    // canonicalized by least/greatest); diagonal cells see both orders,
    // so there id < id breaks the tie. quantized prefilter evaluates
    // INSIDE the join: the raw pair stream is never materialized.
    val cand = lhs.as("x").join(rhs.as("y"),
        col("x.__cell") === col("y.__cell")
          && (col("x.__blk") < col("y.__blk")
            || col("x.__id") < col("y.__id"))
          && call_function("quantized_cosine", col("x.__q"), col("y.__q"))
            >= threshold - margin)
      .select(least(col("x.__id"), col("y.__id")).as("id_a"),
        greatest(col("x.__id"), col("y.__id")).as("id_b"))
    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine", round(cos(spark, "__va", "__vb"), roundTo))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Exact k-nearest-neighbor graph: every vector's top-k neighbors by
    * cosine, built on the SAME block grid as [[blockedNearDupPairs]] (each
    * unordered pair meets in exactly one equi-join cell, so the n²/2
    * cosine evaluations spread evenly across cells² tasks with no BNL).
    * Unlike the threshold join there is no prefilter — top-k needs every
    * score — so the full vectors ride the (bounded, n·(blocks+1)-row)
    * grid shuffle and each cosine is computed ONCE per unordered pair.
    *
    * The reduction is two-level, the aggregation-tree shape that survives
    * scale: a cell-local top-k window first (it reuses the join's cell
    * partitioning — `__cell` alone already clusters `(__cell, src)`, so
    * NO extra shuffle, just an in-partition sort) cuts the stream from
    * n²/2 scored pairs to ≤ n·blocks·k candidate edges; only those reach
    * the global per-src window. Ties break on (cosine desc, dst asc) —
    * total order, engine-independent after round(6).
    *
    * Exact by construction — the brute-force baseline and the oracle for
    * approximate kNN-graph builds (IVF/LSH). At 100 TB corpus sizes use
    * those; this operator is the right EXACT shape when n² work is the
    * contract (e.g. dedup-audit corpora, ≤ tens of millions of rows on a
    * real cluster). */
  def knnGraph(spark: SparkSession, df: DataFrame, idCol: String,
               vecCol: String, k: Int, blocks: Int = 8,
               roundTo: Int = 6): DataFrame = {
    require(k >= 1 && blocks >= 1)
    VectorExpressions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val b = lit(blocks)
    val q = df.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__blk", pmod(hash(col("__id")), b))
    val lhs = q.withColumn("__cell",
      explode(transform(sequence(col("__blk"), b - 1),
        j => col("__blk") * b + j)))
    val rhs = q.withColumn("__cell",
      explode(transform(sequence(lit(0), col("__blk")),
        i => i * b + col("__blk"))))
    // hint("merge"): a broadcast grid join would leave the output in the
    // probe side's scan partitioning, forcing the cell-local window to
    // shuffle the FULL directed-edge stream (2 rows per scored pair);
    // sort-merge shuffles only the n*(blocks+1) replicated inputs by
    // __cell, and the window below then reuses that partitioning freely.
    // (A shuffle_hash hint was MEASURED here in the r15 optimization
    // pass and lost ~25%: the per-cell hash-map build over float-array
    // rows costs more than SMJ's two input sorts buy back.)
    //
    // The explicit repartition(par, __cell) pins the exchange width: AQE
    // coalesces shuffles by BYTES, and the replicated grid inputs are
    // tiny (n·(blocks+1) slim rows) while each joined row fans out into
    // a |block|² cosine workload — measured at sf0.1, AQE coalesced this
    // join to 4 partitions and the n²/2 scoring ran on 4 of 32 cores.
    // A keyed repartition with an explicit count is exempt from AQE
    // coalescing and scales with the session (defaultParallelism), not
    // with a constant.
    val par = spark.sparkContext.defaultParallelism
    val pairs = lhs.repartition(par, col("__cell")).as("x")
      .join(rhs.repartition(par, col("__cell")).as("y").hint("merge"),
        col("x.__cell") === col("y.__cell")
          && (col("x.__blk") < col("y.__blk")
            || col("x.__id") < col("y.__id")))
      .select(col("x.__cell").as("__cell"),
        col("x.__id").as("__ida"), col("y.__id").as("__idb"),
        round(coalesce(call_function("cosine_sim", col("x.__v"), col("y.__v")),
          lit(-2.0)), roundTo).as("cosine"))
    // Each scored pair is an edge in both directions; the cell-local
    // window prunes to k per (cell, src) without leaving the join's
    // partitioning, then the global window ranks the survivors.
    val directed = pairs.select(col("__cell"), col("cosine"),
        explode(array(
          struct(col("__ida").as("src"), col("__idb").as("dst")),
          struct(col("__idb").as("src"), col("__ida").as("dst")))).as("e"))
      .select(col("__cell"), col("e.src").as("src"), col("e.dst").as("dst"),
        col("cosine"))
    val local = Window.partitionBy(col("__cell"), col("src"))
      .orderBy(col("cosine").desc, col("dst"))
    val global = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("dst"))
    directed
      .withColumn("__lrk", row_number().over(local))
      .where(col("__lrk") <= k)
      .withColumn("rk", row_number().over(global).cast(IntegerType))
      .where(col("rk") <= k)
      .select("src", "dst", "cosine", "rk")
  }

  /** One NN-descent refinement round (Dong et al., WWW 2011) over an
    * approximate kNN graph: "a neighbor of a neighbor is likely a
    * neighbor" — the candidate set becomes current edges ∪ reverse edges
    * ∪ neighbors-of-neighbors (one self-join of the undirected edge list
    * on the shared midpoint), rescored exactly, per-src top-k recomputed.
    * Turns a locality-bounded IVF graph ([[IvfIndex.knnGraphApprox]])
    * into state-of-practice: candidates escape the probed cells through
    * graph hops, recall delta measured in IvfSpec.
    *
    * Scale shape: the edge list is n·k rows, the NoN self-join emits
    * ≤ 4·n·k² candidates — everything equi-keyed (midpoint, then the
    * (src,dst) distinct, then two id-keyed vector joins that co-locate
    * with an id-clustered layout), no pair work ever touches n².
    * Refined top-k over a candidate SUPERSET of the input graph can only
    * improve: refining an already-exact graph is a fixpoint (pinned in
    * IvfSpec). Deterministic — same round(6) + (cosine desc, dst)
    * total order as [[knnGraph]], so a Verify oracle replays it. */
  def knnGraphRefine(spark: SparkSession, df: DataFrame, idCol: String,
                     vecCol: String, graph: DataFrame, k: Int,
                     roundTo: Int = 6, rounds: Int = 1): DataFrame = {
    require(rounds >= 1)
    VectorExpressions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val vs = df.select(col(idCol).as("src"), col(vecCol).as("__vs"))
    val vd = df.select(col(idCol).as("dst"), col(vecCol).as("__vd"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cosine").desc, col("dst"))
    def oneRound(g: DataFrame): DataFrame = {
      // Materialize the input edge list ONCE per round (slim — two ids
      // per edge): undirected feeds both sides of the NoN self-join plus
      // the candidate union, and without the checkpoint the upstream
      // graph build — the expensive part — re-executes for each consumer
      // (the connectedComponents lesson, Dedup.scala). Between rounds
      // the checkpoint also caps lineage growth.
      val e = g.select(col("src"), col("dst")).localCheckpoint(true)
      val undirected = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      val non = undirected.as("a").join(undirected.as("b"),
          col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      val cands = undirected.unionByName(non)
        .where(col("src") =!= col("dst"))
        .distinct()
      cands.join(vs, "src").join(vd, "dst")
        .withColumn("cosine",
          round(coalesce(cos(spark, "__vs", "__vd"), lit(-2.0)), roundTo))
        .withColumn("rk", row_number().over(w).cast(IntegerType))
        .where(col("rk") <= k)
        .select("src", "dst", "cosine", "rk")
    }
    (1 to rounds).foldLeft(graph)((g, _) => oneRound(g))
  }

  /** Measured max |quantized_cosine − cosine| over all pairs of a bounded
    * deterministic sample — the empirical basis for a SOUND prefilter
    * margin when the embedding distribution is unknown (see the
    * [[quantizedNearDupPairs]] precondition). Cost: sampleN² pair
    * evaluations on `sampleN` (default 512) hash-chosen vectors — driver
    * returns one double; the corpus is never fully paired. */
  def measuredQuantizationMargin(spark: SparkSession, df: DataFrame,
                                 idCol: String, vecCol: String,
                                 sampleN: Int = 512): Double = {
    QuantizeExpressions.register(spark)
    VectorExpressions.register(spark)
    val s = df
      .orderBy(abs(hash(col(idCol))), col(idCol)).limit(sampleN)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        call_function("quantize_int8", col(vecCol)).as("q"))
    val a = s.select(col("id").as("id_a"), col("v").as("va"), col("q").as("qa"))
    val b = s.select(col("id").as("id_b"), col("v").as("vb"), col("q").as("qb"))
    val err = a.join(b, col("id_a") < col("id_b"))
      .select(abs(call_function("quantized_cosine", col("qa"), col("qb"))
        - call_function("cosine_sim", col("va"), col("vb"))).as("err"))
      .agg(max("err"))
      .head()
    if (err.isNullAt(0)) 0.0 else err.getDouble(0)
  }

  /** Deterministic unit-free hyperplanes: coefficients from a seeded RNG.
    * `private[graft]` so the oracle-SQL generator can inject the IDENTICAL
    * plane literals into DuckDB and replicate the band candidate set. */
  private[graft] def hyperplanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane LSH near-dup: bucketed candidates verified exactly.
    * Approximate — misses a >=threshold pair with prob (1-p^r)^b.
    *
    * Candidate pairs pass the int8 `quantized_cosine` prefilter (at
    * `threshold - margin`, sound per QuantizeSpec's error bound) BEFORE
    * the distinct: at moderate thresholds band buckets are big and the
    * raw candidate stream is the dominant cost — filtering it with the
    * integer kernel first means the distinct shuffle and the exact
    * verify joins only ever see near-threshold survivors. */
  def lshNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
                      vecCol: String, threshold: Double, dim: Int,
                      numPlanes: Int = 32, rowsPerBand: Int = 2,
                      seed: Long = 42L, roundTo: Int = 6,
                      margin: Double = 0.05): DataFrame = {
    require(numPlanes % rowsPerBand == 0)
    val numBands = numPlanes / rowsPerBand
    val planes = hyperplanes(numPlanes, dim, seed)

    VectorExpressions.register(spark)
    // Sign bit per plane: dot(v, plane) >= 0. Planes are literals — the
    // whole signature computes in one codegen'd projection, no shuffle.
    val planeCols = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.toIndexedSeq.map(lit): _*)
      when(call_function("dot_product", col(vecCol), planeLit) >= 0, 1)
        .otherwise(0).as(s"__bit$i")
    }
    // Widened: the band self-join's probe side evaluates the quantized
    // prefilter over every raw bucket collision in ITS partitions — the
    // dominant cost at moderate thresholds (see scaladoc).
    val withBits = Par.widen(df)
      .select((col(idCol) +: col(vecCol) +: planeCols.toSeq): _*)

    // Bands travel WITHOUT the float vectors (a 64-float payload through
    // a numBands-way explode + self-join would multiply the dominant
    // shuffle) but WITH the int8 codes: ~72 bytes/row buys evaluating the
    // quantized prefilter INSIDE the band self-join, so the raw collision
    // stream — the largest intermediate at moderate thresholds — is never
    // shuffled again through code-lookup joins before the distinct.
    QuantizeExpressions.register(spark)
    val bands = withBits
      .withColumn("__q", call_function("quantize_int8", col(vecCol)))
      .select(col(idCol), col("__q"), posexplode(
        array((0 until numBands).map { bnd =>
          concat_ws("", (0 until rowsPerBand).map(r =>
            col(s"__bit${bnd * rowsPerBand + r}")): _*)
        }: _*)).as(Seq("band", "key")))

    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key")
          && col(s"x.$idCol") < col(s"y.$idCol")
          && call_function("quantized_cosine", col("x.__q"), col("y.__q"))
            >= threshold - margin)
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()

    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine", round(cos(spark, "__va", "__vb"), roundTo))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

}
