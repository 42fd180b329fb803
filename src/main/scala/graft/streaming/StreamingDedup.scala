package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Near-dup dedup ON INGEST: SimHash + pigeonhole banding with per-bucket
  * state. An arriving document is flagged when its 64-bit SimHash is
  * within `maxHamming` of any previously seen document — without ever
  * re-scanning the corpus, which is the property that matters when the
  * corpus is 100 TB and the stream is a trickle.
  *
  * Shape: signature computed inline per record (no shuffle), each doc
  * exploded into maxHamming+1 band buckets (pigeonhole: any pair within
  * the radius matches exactly on >= 1 band — same banding as the batch
  * [[graft.operators.Dedup.simhashPairs]]), and per-bucket
  * `flatMapGroupsWithState` keeps the signatures seen in that bucket.
  * One stateful operator, keyed on the bucket — state per key is the
  * bucket's (id, sig) list, and the per-record work is a hamming scan of
  * one 16-bit bucket, not the corpus.
  *
  * Decision semantics: a doc matches the SMALLEST earlier id within the
  * radius (earlier = already in state from a previous batch, or ahead of
  * it in doc_id order within the same batch — so an id-ordered replay
  * reproduces batch semantics exactly; out-of-order streams resolve to
  * first-arrival-wins per bucket). A doc collides in several buckets →
  * several candidate rows; [[duplicates]] combines them (min id wins —
  * and since every within-radius pair shares >= 1 bucket, that min is
  * the GLOBAL min matching id, equal to the batch answer).
  *
  * State growth is the deliberate trade: NoTimeout here (the equivalence
  * specs need exactness); production trickle ingest bounds it with
  * `GroupStateTimeout.ProcessingTimeTimeout` + state TTL, accepting that
  * a doc can only be matched against the retained window.
  */
object StreamingDedup {

  final case class DocSig(doc_id: Long, simhash: Long)
  final case class BucketRow(bucket: Long, doc_id: Long, simhash: Long)
  final case class BucketState(ids: List[Long], sigs: List[Long])
  final case class Decision(doc_id: Long, dup_of: Long, hamming: Int)

  /** The shared SimHash kernel ([[graft.expressions.SimHash64Expr]]) —
    * the same bits the batch Column path and the q24 DuckDB oracle
    * compute; a streaming record needs its signature inline. */
  def simhash64Scala(text: String): Long =
    graft.expressions.SimHash64Expr.compute(text)

  /** Per-bucket candidate decisions for a (possibly streaming) document
    * frame. Emits one row per (doc, matching bucket); combine with
    * [[duplicates]]. Works identically on a batch frame (state starts
    * empty, one invocation per bucket) — the equivalence the spec pins. */
  def decisions(docs: DataFrame, idCol: String, textCol: String,
                maxHamming: Int = 3): Dataset[Decision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val numBands = maxHamming + 1
    val width = 64 / numBands
    require(numBands * width == 64,
      s"maxHamming+1 = $numBands bands must tile 64 bits exactly")

    val sigs = docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) => DocSig(id, simhash64Scala(text)) }

    val buckets = sigs.flatMap { d =>
      (0 until numBands).map { b =>
        val key = (d.simhash >>> (b * width)) & ((1L << width) - 1)
        BucketRow((b.toLong << width) | key, d.doc_id, d.simhash)
      }
    }

    buckets.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, Decision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows: Iterator[BucketRow], state: GroupState[BucketState]) =>
          val st = state.getOption.getOrElse(BucketState(Nil, Nil))
          var ids = st.ids
          var sgs = st.sigs
          val out = List.newBuilder[Decision]
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            var best = -1L
            var bestH = 0
            var is = ids; var ss = sgs
            while (is.nonEmpty) {
              val id = is.head
              if (id != r.doc_id) {
                val h = java.lang.Long.bitCount(ss.head ^ r.simhash)
                if (h <= maxHamming && (best < 0 || id < best)) {
                  best = id; bestH = h
                }
              }
              is = is.tail; ss = ss.tail
            }
            if (best >= 0) out += Decision(r.doc_id, best, bestH)
            ids = r.doc_id :: ids
            sgs = r.simhash :: sgs
          }
          state.update(BucketState(ids, sgs))
          out.result().iterator
      }
  }

  /** Combine per-bucket candidates: one row per duplicate doc, matched to
    * the smallest seen id within the radius (with that pair's hamming —
    * identical in every shared bucket). Batch combine — run it on the
    * sink table of the streaming query, or directly in batch mode. */
  def duplicates(decisions: DataFrame): DataFrame =
    decisions.groupBy("doc_id")
      .agg(min(struct(col("dup_of"), col("hamming"))).as("m"))
      .select(col("doc_id"), col("m.dup_of").as("dup_of"),
        col("m.hamming").as("hamming"))

  /** Streaming twin of [[graft.operators.Dedup.minhashLshPairsAgainst]]:
    * gate an INCOMING stream against a STATIC already-deduped corpus.
    * Each arriving doc computes its shingles + minhash signature inline
    * (codegen projections — streaming-safe), explodes into band keys,
    * and stream-static equi-joins the corpus's precomputed band keys;
    * candidates verify with EXACT Jaccard against the corpus doc's
    * distinct-shingle array (which rides the second stream-static join
    * as a column — no stream-stream join, no shuffle of the stream
    * beyond the joins). Emits (id_new, id_ref, jaccard) for matches at
    * `threshold`; rejects-at-ingest follows by anti-joining the source.
    *
    * Identical banding + verification math to the batch operator, so
    * streamed == batch row-for-row (pinned in StreamingCrossDedupSpec).
    * At 100 TB the static prep (band keys, shingle arrays) is computed
    * once at the corpus's own dedup time and read from its clustered
    * table; the per-batch cost is the BATCH side only. The
    * `dropDuplicates` collapsing multi-band collisions is the one
    * stateful operator — bounded by matched pairs, with the usual
    * watermark/TTL lever on a continuous stream. */
  def crossDedupGate(incoming: DataFrame, existing: DataFrame,
                     idCol: String, textCol: String,
                     n: Int = 3, numHashes: Int = 32, rowsPerBand: Int = 2,
                     threshold: Double = 0.8, seed: Long = 42L): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val numBands = numHashes / rowsPerBand
    graft.expressions.TextShingleExpressions.register(incoming.sparkSession)

    val refBands = graft.operators.Dedup.bandKeys(
        graft.operators.Dedup.minhashSignatures(existing, idCol, textCol,
          n, numHashes, seed), idCol, numBands, rowsPerBand)
      .select(col(idCol).as("id_ref"), col("band"), col("key"))
    val refSh = existing
      .select(col(idCol).as("id_ref"),
        array_distinct(call_function("word_shingles", col(textCol), lit(n)))
          .as("__sh_ref"))
      .where(size(col("__sh_ref")) > 0)

    val bandStructs = array((0 until numBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(":", (0 until rowsPerBand).map(r =>
          element_at(col("__sig"), b * rowsPerBand + r + 1)): _*).as("key"))
    }: _*)
    val newSide = incoming
      .select(col(idCol).as("id_new"),
        call_function("word_shingles", col(textCol), lit(n)).as("__raw"))
      .where(size(col("__raw")) > 0)
      .select(col("id_new"), array_distinct(col("__raw")).as("__sh_new"),
        call_function("minhash_sigs", col("__raw"), lit(numHashes),
          lit(seed)).as("__sig"))
      .select(col("id_new"), col("__sh_new"),
        explode(bandStructs).as("bk"))
      .select(col("id_new"), col("__sh_new"),
        col("bk.band").as("band"), col("bk.key").as("key"))

    newSide.join(refBands, Seq("band", "key"))
      .join(refSh, "id_ref")
      .withColumn("__inter",
        size(array_intersect(col("__sh_new"), col("__sh_ref"))))
      .withColumn("jaccard", col("__inter") /
        (size(col("__sh_new")) + size(col("__sh_ref")) - col("__inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_new"), col("id_ref"),
        round(col("jaccard"), 6).as("jaccard"))
      .dropDuplicates("id_new", "id_ref")
  }
}
