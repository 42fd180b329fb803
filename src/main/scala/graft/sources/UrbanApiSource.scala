package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.Settings
import graft.registry.Registry
import graft.run.Runner

/** DataSource V2 connector for the paginated Urban-style JSON API —
  * `spark.read.format("urbanapi")` (SURVEY §7 M3: the planner-visible form
  * of S2; the driver-side fetch in HttpPagedSource remains the simple path).
  *
  * One InputPartition per requested year: years fetch in parallel across
  * executors, each inside its own rate limit — the distributed analogue of
  * the reference's sequential year loop (10_load_endpoint.ipynb cell 3).
  * Output schema = the raw page-row schema, so the scan feeds RawStore
  * directly.
  *
  * Options: endpoint (registry name), years ("2010-2014" or "2010,2012"),
  * apiBase, pageSize, rps, maxRetries, transport (name of a transport
  * registered in [[UrbanApiTransports]] — tests inject fakes; single-JVM
  * only, a cluster deployment would name a transport class instead).
  */
class UrbanApiTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "urbanapi"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Runner.rawPageSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new UrbanApiTable(properties.asScala.toMap)
}

/** Test/deployment seam: named transports resolvable from readers. */
object UrbanApiTransports {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, HttpPagedSource.Transport]()

  def register(name: String, t: HttpPagedSource.Transport): Unit =
    registry.put(name, t)

  def resolve(name: Option[String], settings: Settings): HttpPagedSource.Transport =
    name match {
      case Some(n) =>
        Option(registry.get(n)).getOrElse(
          throw new IllegalArgumentException(s"Unknown transport '$n'"))
      case None => new HttpPagedSource.JavaHttpTransport(settings)
    }
}

private[sources] final case class UrbanApiConfig(
    endpoint: String, years: Seq[Int], apiBase: String, pageSize: Int,
    rps: Double, maxRetries: Int, transportName: Option[String]) {

  def settings: Settings = Settings(
    apiBase = apiBase, warehouseRoot = "/unused", rateLimitRps = rps,
    maxRetries = maxRetries, rawPageSize = pageSize)
}

private[sources] object UrbanApiConfig {
  def fromOptions(o: Map[String, String]): UrbanApiConfig = {
    def req(k: String) = o.getOrElse(k,
      throw new IllegalArgumentException(s"urbanapi: missing option '$k'"))
    val years = req("years") match {
      case r if r.contains("-") =>
        val Array(a, b) = r.split("-"); (a.trim.toInt to b.trim.toInt).toSeq
      case csv => csv.split(",").map(_.trim.toInt).toSeq
    }
    UrbanApiConfig(
      endpoint = req("endpoint"),
      years = years,
      apiBase = req("apibase"),
      pageSize = o.get("pagesize").map(_.toInt).getOrElse(500),
      rps = o.get("rps").map(_.toDouble).getOrElse(4.0),
      maxRetries = o.get("maxretries").map(_.toInt).getOrElse(3),
      transportName = o.get("transport"))
  }
}

private[sources] class UrbanApiTable(options: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = s"urbanapi/${options.getOrElse("endpoint", "?")}"
  override def schema(): StructType = Runner.rawPageSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = options ++ caseInsensitive.asScala.map { case (k, v) => k.toLowerCase -> v }
    new UrbanApiScanBuilder(UrbanApiConfig.fromOptions(merged))
  }
}

private[sources] class UrbanApiScanBuilder(cfg: UrbanApiConfig)
    extends ScanBuilder with Scan with Batch {

  override def build(): Scan = this
  override def readSchema(): StructType = Runner.rawPageSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"urbanapi endpoint=${cfg.endpoint} years=${cfg.years.mkString(",")}"

  // One partition per year: the unit of parallel fetch AND of downstream
  // partition-overwrite writes.
  override def planInputPartitions(): Array[InputPartition] =
    cfg.years.map(y => UrbanApiInputPartition(y): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new UrbanApiReaderFactory(cfg)
}

private[sources] final case class UrbanApiInputPartition(year: Int)
    extends InputPartition

private[sources] class UrbanApiReaderFactory(cfg: UrbanApiConfig)
    extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new UrbanApiPartitionReader(cfg, p.asInstanceOf[UrbanApiInputPartition].year)
}

private[sources] class UrbanApiPartitionReader(cfg: UrbanApiConfig, year: Int)
    extends PartitionReader[InternalRow] {

  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(Runner.rawPageSchema)

  private lazy val rows: Iterator[InternalRow] = {
    val endpoint = Registry.endpoint(cfg.endpoint)
    val settings = cfg.settings
    val transport = UrbanApiTransports.resolve(cfg.transportName, settings)
    val pages = HttpPagedSource.fetchYearPages(
      transport, settings, endpoint.path, year)
    val records = HttpPagedSource.concatRecords(pages)
    Runner.buildPageRows(endpoint, settings, year, records)
      .iterator.map(r => toCatalyst(r).asInstanceOf[InternalRow])
  }

  private var current: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
