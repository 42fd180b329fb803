package graft.store

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.broadcast

import graft.streaming.MergeStoreCdc

/** The change feed as a SQL table-valued function — Delta's
  * `table_changes('t', from, to)` spelling (reference consumers are
  * pure SQL, `architecture.md:152-158`), registered by
  * [[GraftSqlExtensions]] through `injectTableFunction`:
  *
  * {{{
  *   SELECT * FROM table_changes('db.t', 2)          -- v2..head
  *   SELECT * FROM table_changes('db.t', 2, 5)       -- v2..v5 inclusive
  *   SELECT * FROM table_changes('db.t', 2, 5, 'id') -- explicit keys
  *   SELECT * FROM table_changes('db.t',             -- timestamp bounds
  *     '2026-08-01 00:00:00', TIMESTAMP'2026-08-16 12:00:00')
  * }}}
  *
  * Timestamp bounds (Delta CDF's spelling) resolve against the
  * IN-COMMIT timestamps the manifest records — a `from` timestamp is
  * the first commit at or after it, a `to` the last at or before —
  * so the spans survive mtime-rewriting copies and restores.
  *
  * Rows are [[MergeStoreCdc.changesByCommit]]'s typed feed — the table
  * columns plus `_change_type` (insert/update/delete), `_commit_version`
  * (exact per-commit attribution), and `_commit_timestamp` (Delta's CDF
  * shape, joined from the commit log — a metadata-sized broadcast).
  * Version bounds are INCLUSIVE on both ends, Delta's contract.
  *
  * This is a TVF, not a `CALL` procedure, deliberately: procedures
  * return driver-materialized `LocalScan` rows (right for maintenance
  * results, wrong for data), while the TVF returns the feed's LOGICAL
  * PLAN — Catalyst plans the per-commit file-pruned scans, so tailing a
  * trickle-merged 100 TB table costs the trickle, and the result
  * composes with any downstream SQL (joins, aggregation, MERGE USING).
  *
  * Key columns come from the table's durable `graft.pk` policy
  * (`CREATE TABLE ... TBLPROPERTIES('graft.pk'='id')` or
  * `ALTER TABLE ... SET TBLPROPERTIES`), overridable by the optional
  * 4th argument — the feed classifies insert/update/delete against
  * them, exactly like the Scala `changeFeed` API. */
object GraftTableChanges {

  /** Registration triple for `SparkSessionExtensions.injectTableFunction`. */
  private[store] val registration: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan) = (
    FunctionIdentifier("table_changes"),
    new ExpressionInfo(GraftTableChanges.getClass.getName,
      "table_changes"),
    (args: Seq[Expression]) => plan(args))

  private def evalLit(args: Seq[Expression], i: Int, what: String): Any = {
    val e = args(i)
    require(e.foldable,
      s"table_changes: $what must be a literal; got ${e.sql}")
    val v = e.eval()
    require(v != null, s"table_changes: $what must not be NULL")
    v
  }

  private def strArg(args: Seq[Expression], i: Int, what: String): String =
    evalLit(args, i, what).toString

  private def intArg(args: Seq[Expression], i: Int, what: String): Int =
    evalLit(args, i, what) match {
      case n: Int => n
      case n: Long =>
        require(n == n.toInt,
          s"table_changes: $what $n does not fit in an Int version")
        n.toInt
      case n: Short => n.toInt
      case n: Byte => n.toInt
      case other => sys.error(
        s"table_changes: $what must be an integer version; got $other")
    }

  /** A bound argument: an integer VERSION, or — Delta CDF's timestamp
    * spelling, durable now that commits stamp their own instants — a
    * TIMESTAMP literal / a timestamp-parseable string. A `from`
    * timestamp resolves to the FIRST commit at or after it, a `to`
    * timestamp to the LAST commit at or before it (Delta's contract).
    * Returns the resolved version. */
  private def boundArg(args: Seq[Expression], i: Int, what: String,
                       path: String, isFrom: Boolean): Int = {
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType,
      StringType}
    val e = args(i)
    val v = evalLit(args, i, what)
    (v, e.dataType) match {
      case (micros: Long, TimestampType | TimestampNTZType) =>
        tsVersion(path, micros / 1000L, what, isFrom)
      case (s: org.apache.spark.unsafe.types.UTF8String, StringType)
          if s.toString.exists(c => c == '-' || c == ':') =>
        tsVersion(path, parseTsMillis(s.toString, what), what, isFrom)
      case _ => intArg(args, i, what)
    }
  }

  /** Shared timestamp-literal parse for procedure arguments
    * (restore/clone by timestamp). */
  private[store] def parseTsMillisArg(s: String): Long =
    parseTsMillis(s, "timestamp")

  private def parseTsMillis(s: String, what: String): Long = {
    val t = s.trim
    try {
      if (t.contains("T")) java.time.Instant.parse(
        if (t.endsWith("Z") || t.contains("+")) t else t + "Z")
        .toEpochMilli
      else if (t.contains(":")) java.sql.Timestamp.valueOf(t).getTime
      else java.sql.Timestamp.valueOf(
        java.time.LocalDate.parse(t).atStartOfDay()).getTime
    } catch {
      case _: RuntimeException => sys.error(
        s"table_changes: $what '$s' is neither an integer version nor " +
          "a timestamp ('yyyy-MM-dd[ HH:mm:ss]' or ISO-8601)")
    }
  }

  private def tsVersion(path: String, ms: Long, what: String,
                        isFrom: Boolean): Int = {
    val h = MergeStore.history(path)
    require(h.nonEmpty, s"no committed version at $path")
    if (isFrom)
      h.collectFirst { case (v, t) if t >= ms && v >= 1 => v }
        .getOrElse(sys.error(
          s"table_changes: $what timestamp is after the last commit " +
            s"(${new java.sql.Timestamp(h.last._2)})"))
    else
      h.takeWhile(_._2 <= ms).lastOption.map(_._1).getOrElse(sys.error(
        s"table_changes: $what timestamp predates the first retained " +
          s"commit (${new java.sql.Timestamp(h.head._2)})"))
  }

  private[store] def plan(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 2 && args.length <= 4,
      "table_changes(table, from_version[, to_version[, 'pk,cols']])")
    val spark = SparkSession.active
    val path = GraftCatalog.resolvePath(spark, strArg(args, 0, "table"))
    val head = MergeStore.version(path)
      .getOrElse(sys.error(s"no committed version at $path"))
    val from = boundArg(args, 1, "from_version", path, isFrom = true)
    val to = if (args.length >= 3)
      boundArg(args, 2, "to_version", path, isFrom = false) else head
    require(from >= 1,
      "table_changes: from_version must be >= 1 — v0 is the initial " +
        "snapshot (read it with VERSION AS OF 0), commits after it are " +
        "the feed")
    require(to >= from,
      s"table_changes: empty span [$from, $to]")
    require(to <= head,
      s"table_changes: to_version $to is past the head ($head)")
    val pk =
      if (args.length >= 4)
        strArg(args, 3, "pk").split(',').toSeq.map(_.trim)
          .filter(_.nonEmpty)
      else MergeStore.tablePk(path)
    require(pk.nonEmpty,
      "table_changes needs the table's key columns — declare " +
        "TBLPROPERTIES('graft.pk'='...') on the table or pass them as " +
        "the 4th argument")
    val feed = MergeStoreCdc.changesByCommit(spark, path, pk,
      includePreimages = false, from - 1, to)
    // _commit_timestamp from the commit log: one row per version in
    // the span — metadata-sized by construction, broadcast.
    val times = MergeStore.history(path)
      .filter { case (v, _) => v >= from && v <= to }
      .map { case (v, ms) => (v.toLong, new java.sql.Timestamp(ms)) }
    val lookup = spark.createDataFrame(times)
      .toDF(MergeStoreCdc.CommitVersionCol, "_commit_timestamp")
    feed.join(broadcast(lookup),
        Seq(MergeStoreCdc.CommitVersionCol), "left")
      .select((feed.columns :+ "_commit_timestamp")
        .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      .queryExecution.logical
  }
}
