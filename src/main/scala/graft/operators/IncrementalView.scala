package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.store.MergeStore

/** Incremental maintenance of a materialized aggregate view — the 100 TB
  * answer to the reference's full-recompute view refresh
  * (`sql/views.sql`, rebuilt per load; our [[graft.views.GoldViews]]
  * keeps that shape as Q13). A gold KPI view over a 100 TB fact table
  * cannot be re-aggregated because one trickle merge landed; the classic
  * IVM result (Gupta & Mumick, "Maintenance of Materialized Views",
  * 1995) is that distributive aggregates (COUNT, SUM — and AVG as
  * SUM/COUNT) are maintained exactly from the CHANGE DELTA alone:
  *
  *   ΔV(g) = Σ_changes weight · measure,  weight = +1 for an arriving
  *   row (insert / update post-image), −1 for a departing one (delete /
  *   update PRE-image)
  *
  * which is why [[graft.store.MergeStore.changes]] grew
  * `includePreimages` — subtraction needs the superseded row.
  *
  * Scale shape: the delta scans ONLY the files unique to the version
  * span (changes()' file-pruning argument), aggregates map-side to one
  * row per TOUCHED group, and the view update is a MergeStore merge /
  * delete keyed on the group columns — file-granular on the view. A
  * refresh after a trickle merge therefore costs O(changed files) +
  * O(touched groups), independent of both table and view cardinality.
  *
  * Exactness: sums accumulate in DECIMAL(30,4) (cast per row from the
  * source column), so partial-aggregation order and the
  * full-vs-incremental path cannot diverge by float association — the
  * q04 house convention. [[readView]] surfaces doubles at the edge.
  * Group-by keys must be non-null (they key the view's MergeStore
  * merges); null-key facts belong in a sentinel group upstream.
  */
object IncrementalView {

  /** View definition: `groupBy` keys + COUNT(*) as `countCol` + one
    * exact SUM per (source column, output alias), optionally over a
    * filtered source (`SELECT ... WHERE filter GROUP BY ...`).
    *
    * Selection commutes with the delta algebra row-by-row: the filter
    * is applied to each change row BEFORE weighting, so an update that
    * moves a row INTO the selection contributes only its post-image
    * (+1, a view insert), one moving OUT only its pre-image (−1), one
    * staying inside contributes both (±measure), and one outside
    * contributes nothing — exactly σ-view maintenance. The filter must
    * be deterministic and reference only row columns. */
  final case class IvmSpec(groupBy: Seq[String],
                           sums: Seq[(String, String)],
                           countCol: String = "n_rows",
                           filter: Option[Column] = None,
                           mins: Seq[(String, String)] = Nil,
                           maxs: Seq[(String, String)] = Nil,
                           enrich: DataFrame => DataFrame = identity,
                           avgs: Seq[(String, String)] = Nil) {
    require(groupBy.nonEmpty, "IVM view needs group-by keys")
    private val aliases =
      (sums ++ mins ++ maxs ++ avgs).map(_._2) :+ countCol
    require(aliases.distinct.size == aliases.size,
      "duplicate output aliases")

    /** AVG is fully distributive once desugared: each avg maintains a
      * hidden exact SUM and a hidden NON-NULL COUNT (COUNT(x), not
      * COUNT(*) — SQL AVG skips nulls), both plain ±-weighted decimal
      * accumulators; [[readView]] surfaces sum/count as the double AVG.
      * These are the materialized columns backing each declared sum AND
      * each avg: (alias, per-row measure). */
    private[IncrementalView] def accumulators: Seq[(String, Column)] =
      sums.map { case (src, out) => out -> measure(src) } ++
        avgs.flatMap { case (src, out) => Seq(
          s"__avg_sum_$out" -> measure(src),
          s"__avg_cnt_$out" ->
            when(col(src).isNotNull, lit(1)).otherwise(lit(0)).cast(SumType))
        }
    /** MIN/MAX are only SEMI-maintainable (arrivals can only strengthen
      * an extremum; a departure may remove it, and only the base data
      * knows the runner-up) — with extremes, refresh recomputes
      * departure-touched groups from the source snapshot. */
    def hasExtremes: Boolean = mins.nonEmpty || maxs.nonEmpty
    /** NULL-safe selection: NULL keeps a row out of the view (SQL WHERE
      * semantics), applied identically on full and delta paths. */
    def selected(df: DataFrame): DataFrame =
      filter.map(f => df.where(coalesce(f, lit(false)))).getOrElse(df)
    /** `enrich` then `filter` — every row the aggregate sees, on full,
      * delta, and recompute paths alike. `enrich` must be ROW-LOCAL: a
      * DETERMINISTIC function of each input row alone, producing zero
      * or more output rows (all carrying `_change_type` through when
      * present). That admits two big view families:
      *
      *   - JOIN views: a left join against a broadcast-sized STATIC
      *     dimension (1 → 1). Dimension churn is out of scope by
      *     construction — a changed dim row silently changes history's
      *     enrichment; rebuild the view when a dimension changes (the
      *     Kimball Type-1 trade-off).
      *   - FLATMAP views: a deterministic explode (1 → n), e.g. text →
      *     tokens — corpus STATISTICS (vocabulary counts, n-gram
      *     frequencies) maintained incrementally from the document
      *     feed, because a pre-image explodes into exactly the rows its
      *     arrival did, so subtraction cancels token-for-token.
      *
      * Either way the invariant is the same: enrich(pre-image) must
      * equal what enrich(that row) produced when it arrived. */
    def prepared(df: DataFrame): DataFrame = selected(enrich(df))
  }

  final case class RefreshStats(fromVersion: Int, toVersion: Int,
                                groupsUpserted: Long, groupsDeleted: Long)

  private val SumType = DecimalType(30, 4)
  private val ExtType = DecimalType(20, 4)
  private def measure(src: String): Column = col(src).cast(ExtType)

  /** Aggregate an already-prepared (enriched + filtered) row set. */
  private def aggregateState(preparedDf: DataFrame,
                             spec: IvmSpec): DataFrame =
    preparedDf.groupBy(spec.groupBy.map(col): _*)
      .agg(count(lit(1)).as(spec.countCol),
        spec.accumulators.map { case (out, m) =>
          sum(m).cast(SumType).as(out) } ++
        spec.mins.map { case (src, out) =>
          min(measure(src)).cast(ExtType).as(out) } ++
        spec.maxs.map { case (src, out) =>
          max(measure(src)).cast(ExtType).as(out) }: _*)

  /** The view's contents computed from scratch — the definition the
    * incremental path must match bit-for-bit (spec-pinned). */
  def fullState(df: DataFrame, spec: IvmSpec): DataFrame =
    aggregateState(spec.prepared(df), spec)

  /** Per-group delta from a pre-image-bearing change feed: one
    * map-side-combinable aggregate over the span's changed rows. With
    * extremes, also carries the arriving-rows-only min/max candidates
    * (`__arr_*`) and a `__has_dep` flag marking groups any row departed
    * from — [[applyDeltaToStore]] recomputes those from the source. */
  def deltaState(changes: DataFrame, spec: IvmSpec): DataFrame = {
    val w = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(concat(lit("IVM: unknown change type "),
        col("_change_type")))) // loud on a feed built without pre-images
    val extremeAggs =
      if (!spec.hasExtremes) Nil
      else spec.mins.map { case (src, out) =>
        min(when(col("__w") > 0, measure(src))).cast(ExtType)
          .as(s"__arr_$out") } ++
        spec.maxs.map { case (src, out) =>
          max(when(col("__w") > 0, measure(src))).cast(ExtType)
            .as(s"__arr_$out") } ++
        Seq(max(when(col("__w") < 0, 1).otherwise(0)).as("__has_dep"))
    spec.prepared(changes).withColumn("__w", w)
      .groupBy(spec.groupBy.map(col): _*)
      .agg(sum(col("__w")).cast(LongType).as(spec.countCol),
        spec.accumulators.map { case (out, m) =>
          sum(m * col("__w")).cast(SumType).as(out) } ++
          extremeAggs: _*)
  }

  /** state ⊕ delta, pure-DataFrame: full outer join on the group keys,
    * coalesced exact addition, groups whose count reaches 0 dropped.
    * The algebra the materialized [[refresh]] applies via MergeStore.
    * With extremes this is valid ONLY for arrival-only groups (mins via
    * least(state, arrivals), etc.) — departure-touched groups must be
    * recomputed, which [[applyDeltaToStore]] routes. */
  def applyDelta(state: DataFrame, delta: DataFrame,
                 spec: IvmSpec): DataFrame = {
    val valueCols = spec.countCol +: spec.accumulators.map(_._1)
    val d0 = if (delta.columns.contains("__has_dep"))
      delta.drop("__has_dep") else delta
    val d = valueCols.foldLeft(d0)((df, c) => df.withColumnRenamed(c, s"__d_$c"))
    val joined = state.join(d, spec.groupBy, "full_outer")
    val merged = joined.select(
      spec.groupBy.map(col) ++
        Seq((coalesce(col(spec.countCol), lit(0L)) +
          coalesce(col(s"__d_${spec.countCol}"), lit(0L))).as(spec.countCol)) ++
        spec.accumulators.map { case (out, _) =>
          (coalesce(col(out), lit(0).cast(SumType)) +
            coalesce(col(s"__d_$out"), lit(0).cast(SumType)))
            .cast(SumType).as(out) } ++
        // least/greatest skip nulls: a new group takes the arrival
        // extremum, an untouched-extremum group keeps the state's.
        spec.mins.map { case (_, out) =>
          least(col(out), col(s"__arr_$out")).cast(ExtType).as(out) } ++
        spec.maxs.map { case (_, out) =>
          greatest(col(out), col(s"__arr_$out")).cast(ExtType).as(out) }: _*)
    merged.where(col(spec.countCol) > 0)
  }

  /** Manifest-metadata key holding the applied source version. The
    * marker rides INSIDE the view table's own commit (MergeStore
    * manifest metadata — Delta's txnVersion idiom), so "delta applied"
    * and "high-water mark advanced" are one atomic CAS write: no crash
    * window can leave the data merged but the marker stale, which is
    * what made a redelivered foreachBatch batch double-apply. */
  private[graft] val AppliedKey = "ivm.applied"

  /** Source version the view currently reflects — read from the newest
    * manifest carrying [[AppliedKey]] (a compaction or other non-IVM
    * commit to the view doesn't carry it; walk back past those). */
  def appliedVersion(viewTarget: String): Int = {
    require(MergeStore.version(viewTarget).isDefined,
      s"no committed view at $viewTarget")
    MergeStore.markerValue(viewTarget, AppliedKey).map(_.toInt)
      .getOrElse(sys.error(
        s"$viewTarget carries no $AppliedKey marker — not an IVM view " +
          "(or every marked manifest was vacuumed; rebuild with initView)"))
  }

  /** Materialize the view from the source table's head snapshot — the
    * one full aggregation the view ever runs. The applied marker
    * commits atomically with the data (manifest metadata). */
  def initView(spark: SparkSession, sourceTarget: String,
               viewTarget: String, spec: IvmSpec,
               numFiles: Int = 4): Int = {
    val head = MergeStore.version(sourceTarget)
      .getOrElse(sys.error(s"no committed version at $sourceTarget"))
    MergeStore.init(spark,
      fullState(MergeStore.read(spark, sourceTarget, Some(head)), spec),
      viewTarget, numFiles, clusterBy = spec.groupBy,
      meta = Map(AppliedKey -> head.toString))
    head
  }

  /** Advance the view to the source head by applying the change feed of
    * the unapplied span. Reads current state ONLY for touched groups
    * (semi-join on the delta's keys), merges updated groups, deletes
    * emptied ones, then records the new high-water mark. No-op when
    * already current. */
  def refresh(spark: SparkSession, sourceTarget: String,
              viewTarget: String, spec: IvmSpec): RefreshStats = {
    val last = appliedVersion(viewTarget)
    val head = MergeStore.version(sourceTarget)
      .getOrElse(sys.error(s"no committed version at $sourceTarget"))
    if (head == last) return RefreshStats(last, head, 0L, 0L)
    require(head > last, s"view at $viewTarget is ahead of its source")
    // The +1/−1 weight algebra is pk-independent (every arriving row
    // counts +1 and departing −1 whatever the classification), so ANY
    // physical column keys the feed — it must be a TABLE column though,
    // never a groupBy name, which may be an enriched (dimension) one.
    val anyKey = Seq(MergeStore.read(spark, sourceTarget).columns.head)
    val feed = MergeStore.changes(spark, sourceTarget, last, head,
      pk = anyKey, includePreimages = true)
    val (nUp, del) = applyDeltaToStore(spark, viewTarget,
      deltaState(feed, spec), spec, head, Some(sourceTarget),
      expectedApplied = Some(last))
    RefreshStats(last, head, nUp, del)
  }

  /** Merge a computed per-group delta into the materialized view and
    * advance the high-water marker to `newVersion` — the store side of a
    * refresh, shared with [[graft.streaming.StreamingIvm]]'s per-micro-
    * batch application. Reads current state only for touched groups;
    * returns (groups merged, groups deleted).
    *
    * Extremes routing: with min/max in the spec, groups any row
    * DEPARTED from (`__has_dep`) are recomputed from the source
    * snapshot PINNED AT `newVersion` (reading head would leak
    * not-yet-applied commits into those groups) — a semi-join-filtered
    * scan, pruned by the source's group clustering; arrival-only groups
    * stay on the pure delta path. `source` is required then; the
    * vacuum retention window must cover consumer lag, as for any
    * pinned reader.
    *
    * `expectedApplied` is the marker value this delta was computed FROM
    * (the span's base): the commit then carries a [[MergeStore
    * .MarkerGuard]] that re-verifies the high-water mark inside every
    * OCC attempt and drops the batch whole — returning (0, 0) — if ANY
    * rival maintainer moved it, even to a sub-span of this one. Pass
    * None only when no rival maintainer can exist (then only a marker
    * already covering `newVersion` drops the batch). */
  def applyDeltaToStore(spark: SparkSession, viewTarget: String,
                        deltaDf: DataFrame, spec: IvmSpec,
                        newVersion: Int,
                        source: Option[String] = None,
                        expectedApplied: Option[Int] = None): (Long, Long) = {
    val delta = deltaDf.cache()
    try {
      val (arrDelta, depKeys) =
        if (!spec.hasExtremes) (delta, None)
        else (delta.where(col("__has_dep") === 0),
          Some(delta.where(col("__has_dep") === 1)
            .select(spec.groupBy.map(col): _*)))
      // Manifest-pruned touched-group read: the view is group-clustered
      // with group-key stats, so a delta touching few groups reads few
      // view files — not every live one.
      val touched = MergeStore.scanForKeys(spark, viewTarget,
        arrDelta.select(spec.groupBy.map(col): _*), spec.groupBy)
      val nextArr = applyDelta(touched, arrDelta, spec)
      val recomputed = depKeys.map { keys =>
        val src = source.getOrElse(sys.error(
          "IVM with min/max needs the source table to recompute " +
            "departure-touched groups"))
        // Enrich BEFORE the key semi-join: group keys may themselves be
        // enriched (dimension) columns.
        aggregateState(
          spec.prepared(MergeStore.read(spark, src, Some(newVersion)))
            .join(keys, spec.groupBy, "left_semi"), spec)
      }
      val next = recomputed.map(nextArr.unionByName(_)).getOrElse(nextArr)
        .cache()
      try {
        // Arrival-only groups can never empty; candidates are the
        // delta's groups (pure path) or the recomputed set (extremes).
        val candidates = depKeys.getOrElse(
          delta.select(spec.groupBy.map(col): _*))
        val emptied = candidates.join(
          next.select(spec.groupBy.map(col): _*), spec.groupBy, "left_anti")
        // ONE commit: merged groups + emptied-group deletes + the
        // applied marker, all behind the same manifest CAS — a crash
        // either applied the whole batch (marker advanced, replay
        // dropped by the high-water guard) or none of it (marker stale,
        // replay re-applies cleanly). An empty delta still commits a
        // metadata-only version so the marker advances past the span.
        // The MarkerGuard re-verifies the high-water mark INSIDE every
        // OCC attempt: a rival maintainer (an always-on stream racing a
        // scheduled refresh) that moved the marker makes the losing
        // writer's retry a dropped replay instead of a double-apply —
        // the caller-side appliedVersion read alone is check-then-act
        // and cannot survive the retry path.
        val stats = MergeStore.applyChanges(spark, viewTarget,
          upserts = next, deleteKeys = emptied, pk = spec.groupBy,
          meta = Map(AppliedKey -> newVersion.toString), maxRetries = 3,
          guard = Some(MergeStore.MarkerGuard(AppliedKey, newVersion.toLong,
            expectedApplied.map(_.toLong))))
        if (stats.skippedReplay) (0L, 0L)
        else (stats.rowsUpserted, stats.rowsDeleted)
      } finally next.unpersist()
    } finally delta.unpersist()
  }

  /** View-table maintenance: every refresh commits one new view version
    * (small replacement files + superseded ones kept for time travel),
    * so a long-lived view accretes files and manifests like any
    * trickle-written table. This is MergeStore.maintain's job — with
    * one view-specific requirement: the compaction commit must CARRY
    * the applied marker forward (a bare compact writes no metadata,
    * and a following vacuum could then drop every marked manifest,
    * destroying the high-water mark). Compacts to `targetFiles`
    * group-clustered files when the live count exceeds
    * `maxLiveFiles` (default 4× target), then vacuums superseded
    * files; returns true iff a compaction ran. */
  def maintainView(spark: SparkSession, viewTarget: String, spec: IvmSpec,
                   targetFiles: Int = 4, maxLiveFiles: Int = 0,
                   retainVersions: Int = 1,
                   vacuumGraceMillis: Long =
                     MergeStore.DefaultVacuumGraceMillis): Boolean = {
    val cap = if (maxLiveFiles > 0) maxLiveFiles else 4 * targetFiles
    if (MergeStore.liveFiles(viewTarget).size <= cap) false
    else {
      val applied = appliedVersion(viewTarget)
      MergeStore.compact(spark, viewTarget, targetFiles,
        clusterBy = spec.groupBy,
        meta = Map(AppliedKey -> applied.toString))
      MergeStore.vacuum(viewTarget, retainVersions, vacuumGraceMillis)
      true
    }
  }

  /** The view for consumers: exact decimal sums/extremes surfaced as
    * DOUBLE (the q04 edge convention); each AVG surfaced as its exact
    * hidden sum over its exact hidden non-null count — both cast to
    * double FIRST so one IEEE division decides the value on every
    * engine; NULL when the group holds no non-null measure (SQL AVG). */
  def readView(spark: SparkSession, viewTarget: String,
               spec: IvmSpec): DataFrame =
    MergeStore.read(spark, viewTarget).select(
      spec.groupBy.map(col) ++ Seq(col(spec.countCol)) ++
        (spec.sums ++ spec.mins ++ spec.maxs).map { case (_, out) =>
          col(out).cast("double").as(out) } ++
        spec.avgs.map { case (_, out) =>
          when(col(s"__avg_cnt_$out") === 0, lit(null))
            .otherwise(col(s"__avg_sum_$out").cast("double") /
              col(s"__avg_cnt_$out").cast("double"))
            .as(out) }: _*)

  // ------------------------------------------------------------------
  // COUNT(DISTINCT x) — exact, as a COMPOSITION of the machinery above
  // (the classic IVM reduction): maintain a sub-view grouped by
  // (groupBy ++ x) — each live sub-view row IS one distinct (group, x)
  // pair, born when its first contributing fact arrives and dying with
  // its last via the ordinary count-reaches-zero rule — then roll the
  // distinct count up as a count of sub-view rows per group at READ
  // time. The roll-up aggregates the view (tiny), never the facts, and
  // both levels advance from the SAME change feed through refresh().
  // ------------------------------------------------------------------

  /** Spec for the (group, x) sub-view backing an exact per-group
    * COUNT(DISTINCT `distinctCol`). NULLs don't count (SQL semantics):
    * the selection filters them before weighting, identically on full
    * and delta paths. Compose with a row-local `enrich` exactly as for
    * any other view (flatmap enrichment counts distinct TOKENS, etc.). */
  def distinctCountSpec(groupBy: Seq[String], distinctCol: String,
                        enrich: DataFrame => DataFrame = identity): IvmSpec =
    IvmSpec(groupBy :+ distinctCol, sums = Nil,
      filter = Some(col(distinctCol).isNotNull), enrich = enrich)

  /** Read a [[distinctCountSpec]] sub-view as (groupBy, `outCol` =
    * COUNT(DISTINCT x)). Groups with zero distinct values are absent —
    * the same group-death convention as every other view.
    *
    * SQL-parity caveat: plain `GROUP BY g` with COUNT(DISTINCT x)
    * RETURNS a group whose x values are all NULL (count 0), while this
    * roll-up omits it — the sub-view's NULL filter means no (g, x)
    * rows exist to witness the group. The q110 oracle agrees only
    * because its distinct column is non-null by schema; pinning
    * against a SQL oracle over a NULLABLE column needs `groupRoster`:
    * the set of groups that should exist (e.g. a companion COUNT(*)
    * view's keys), left-joined so zero-distinct groups surface with
    * `outCol` = 0 exactly as SQL returns them. */
  def readDistinctCount(spark: SparkSession, viewTarget: String,
                        groupBy: Seq[String],
                        outCol: String = "n_distinct",
                        groupRoster: Option[DataFrame] = None): DataFrame = {
    val counts = MergeStore.read(spark, viewTarget)
      .groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).cast(LongType).as(outCol))
    groupRoster match {
      case None => counts
      case Some(roster) =>
        roster.select(groupBy.map(col): _*).distinct()
          .join(counts, groupBy, "left_outer")
          .select(groupBy.map(col) :+
            coalesce(col(outCol), lit(0L)).cast(LongType).as(outCol): _*)
    }
  }
}
