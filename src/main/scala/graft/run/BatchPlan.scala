package graft.run

import org.apache.spark.sql.SparkSession

import graft.core.Settings
import graft.registry.Registry
import graft.sources.HttpPagedSource.Transport
import graft.store.{CoreSink, LineageLog}

/** The `config/endpoints.yaml` batch run plan the reference lists as
  * optional and never ships (/root/reference/architecture.md:132). A plan
  * names endpoints and year ranges; running it drives the full
  * EP1 → EP2 pipeline ([[Runner.loadEndpointYears]]) per entry, in order,
  * with lineage per entry.
  *
  * Format (the YAML subset such a file actually needs — parsed here
  * without a YAML dependency, since the classpath is fixed):
  * {{{
  * # comments and blank lines ignored
  * plan:
  *   - endpoint: directory
  *     years: 2010-2023
  *   - endpoint: admissions
  *     years: 2018          # single year
  *   - endpoint: finance
  *     years: 2015-2023
  *     sink: merge          # file-granular COW instead of partition rewrite
  * }}}
  *
  * Validation is fail-fast at parse time: unknown endpoint names and
  * malformed year ranges throw BEFORE any fetch runs (P5 contract —
  * a typo must not surface after three endpoints already loaded).
  */
object BatchPlan {

  final case class Entry(endpoint: String, yearStart: Int, yearEnd: Int,
                         sink: CoreSink = CoreSink.Partition)

  private val EndpointLine = """^-\s*endpoint:\s*(\S+)$""".r
  private val YearsRange = """^years:\s*(\d{4})\s*-\s*(\d{4})$""".r
  private val YearsSingle = """^years:\s*(\d{4})$""".r
  private val SinkLine = """^sink:\s*(\S+)$""".r

  def parse(text: String): Seq[Entry] = {
    val lines = text.linesIterator
      .map(_.takeWhile(_ != '#').trim)
      .filter(_.nonEmpty)
      .filterNot(_ == "plan:")
      .toSeq
    val entries = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pending: Option[String] = None
    // `sink:` may precede or follow the entry's `years:` line; it binds to
    // the entry being parsed either way, and CoreSink.parse throws on a
    // typo before any fetch (P5).
    var pendingSink: Option[CoreSink] = None
    var lastClosed = false // last entry in `entries` may still take a sink:
    var lastSinkSet = false
    lines.foreach {
      case EndpointLine(name) =>
        require(pending.isEmpty,
          s"endpoint '${pending.get}' has no years: line")
        Registry.endpoint(name) // unknown name throws with the known list
        pending = Some(name)
        lastClosed = true
      case YearsRange(a, b) =>
        val (s, e) = (a.toInt, b.toInt)
        require(s <= e, s"years range $s-$e is inverted")
        entries += Entry(pending.getOrElse(
          throw new IllegalArgumentException(s"years: $a-$b outside an entry")),
          s, e, pendingSink.getOrElse(CoreSink.Partition))
        lastSinkSet = pendingSink.isDefined
        pending = None; pendingSink = None; lastClosed = false
      case YearsSingle(a) =>
        entries += Entry(pending.getOrElse(
          throw new IllegalArgumentException(s"years: $a outside an entry")),
          a.toInt, a.toInt, pendingSink.getOrElse(CoreSink.Partition))
        lastSinkSet = pendingSink.isDefined
        pending = None; pendingSink = None; lastClosed = false
      case SinkLine(s) =>
        val sink = CoreSink.parse(s)
        if (pending.isDefined) {
          require(pendingSink.isEmpty,
            s"endpoint '${pending.get}' has two sink: lines")
          pendingSink = Some(sink)
        } else {
          require(entries.nonEmpty && !lastClosed,
            s"sink: $s outside an entry")
          require(!lastSinkSet,
            s"endpoint '${entries.last.endpoint}' has two sink: lines")
          entries(entries.size - 1) = entries.last.copy(sink = sink)
          lastSinkSet = true
        }
      case other =>
        throw new IllegalArgumentException(s"unrecognized plan line: '$other'")
    }
    require(pending.isEmpty, s"endpoint '${pending.get}' has no years: line")
    val out = entries.toSeq
    require(out.nonEmpty, "plan has no entries")
    out
  }

  def parseFile(path: String): Seq[Entry] =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Run every entry in order. Entries are independent loads; a failure
    * stops the batch (the already-written entries remain committed and
    * idempotently rerunnable — P3). */
  def run(spark: SparkSession, settings: Settings, transport: Transport,
          plan: Seq[Entry]): Seq[LineageLog.LoadLogEntry] =
    plan.map { e =>
      Runner.loadEndpointYears(spark, Registry.endpoint(e.endpoint),
        settings, transport, e.yearStart, e.yearEnd, e.sink)
    }
}
