package graft.run

import org.apache.spark.sql.SparkSession

import graft.core.Settings
import graft.registry.Registry
import graft.sources.HttpPagedSource.Transport
import graft.store.LineageLog

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
  * }}}
  *
  * Validation is fail-fast at parse time: unknown endpoint names and
  * malformed year ranges throw BEFORE any fetch runs (P5 contract —
  * a typo must not surface after three endpoints already loaded).
  */
object BatchPlan {

  final case class Entry(endpoint: String, yearStart: Int, yearEnd: Int)

  private val EndpointLine = """^-\s*endpoint:\s*(\S+)$""".r
  private val YearsRange = """^years:\s*(\d{4})\s*-\s*(\d{4})$""".r
  private val YearsSingle = """^years:\s*(\d{4})$""".r

  def parse(text: String): Seq[Entry] = {
    val lines = text.linesIterator
      .map(_.takeWhile(_ != '#').trim)
      .filter(_.nonEmpty)
      .filterNot(_ == "plan:")
      .toSeq
    val entries = Seq.newBuilder[Entry]
    var pending: Option[String] = None
    lines.foreach {
      case EndpointLine(name) =>
        require(pending.isEmpty,
          s"endpoint '${pending.get}' has no years: line")
        Registry.endpoint(name) // unknown name throws with the known list
        pending = Some(name)
      case YearsRange(a, b) =>
        val (s, e) = (a.toInt, b.toInt)
        require(s <= e, s"years range $s-$e is inverted")
        entries += Entry(pending.getOrElse(
          throw new IllegalArgumentException(s"years: $a-$b outside an entry")),
          s, e)
        pending = None
      case YearsSingle(a) =>
        entries += Entry(pending.getOrElse(
          throw new IllegalArgumentException(s"years: $a outside an entry")),
          a.toInt, a.toInt)
        pending = None
      case other =>
        throw new IllegalArgumentException(s"unrecognized plan line: '$other'")
    }
    require(pending.isEmpty, s"endpoint '${pending.get}' has no years: line")
    val out = entries.result()
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
        settings, transport, e.yearStart, e.yearEnd)
    }
}
