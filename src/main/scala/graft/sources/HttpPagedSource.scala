package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

import graft.core.Settings

/** S1+S2+P1+P2+T12: the paginated HTTP API source.
  *
  * Reference behavior reproduced exactly
  * (/root/reference/etl/http.py:36-124):
  *   - single GET with raise-for-status, ≤ maxRetries attempts, exponential
  *     backoff sleep 2^attempt seconds between failures (http.py:64-79);
  *   - endpoint URL built as {base}/{path}/{year}/ with slash normalization
  *     (http.py:96-104);
  *   - pagination: follow the response's `next` link — absolute or relative
  *     — until null, concatenating each page's `results` array
  *     (http.py:106-121);
  *   - rate limit: sleep 1/rps seconds between page requests (http.py:121).
  *
  * The transport is pluggable so tests (and the bounded-batch Structured
  * Streaming wrapper) inject a fake without sockets. Fetch is driver-side by
  * design — the reference API is one rate-limited sequential stream; the
  * parallelism opportunity at scale is per-year fan-out, which the Runner
  * does by looping years into independent Spark writes.
  */
object HttpPagedSource {

  /** Minimal GET transport: returns the response body or throws. */
  trait Transport {
    def get(url: String): String
  }

  final class JavaHttpTransport(settings: Settings) extends Transport {
    private val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(settings.requestTimeoutSeconds.toLong))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()

    override def get(url: String): String = {
      val req = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofSeconds(settings.requestTimeoutSeconds.toLong))
        .header("User-Agent", settings.userAgent)
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new RuntimeException(s"HTTP ${resp.statusCode()} for $url")
      resp.body()
    }
  }

  private val mapper = new ObjectMapper()

  /** P1: retry with exponential backoff (sleep 2^attempt, warn per failure,
    * raise after exhaustion — http.py:64-79). */
  def getWithRetries(transport: Transport, url: String, maxRetries: Int,
                     sleeper: Long => Unit = ms => Thread.sleep(ms)): String = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxRetries) {
      try return transport.get(url)
      catch {
        case e: Throwable =>
          last = e
          attempt += 1
          System.err.println(
            s"[http] attempt $attempt/$maxRetries failed for $url: ${e.getMessage}")
          if (attempt < maxRetries) sleeper(math.pow(2, attempt).toLong * 1000)
      }
    }
    throw new RuntimeException(
      s"GET $url failed after $maxRetries attempts", last)
  }

  /** T12: {base}/{path}/{year}/ with slash normalization (http.py:96-104). */
  def endpointUrl(base: String, path: String, year: Int): String =
    s"${base.stripSuffix("/")}/${path.stripPrefix("/").stripSuffix("/")}/$year/"

  /** T12: `next` may be absolute or relative (http.py:118). */
  def resolveNext(base: String, next: String): String =
    if (next.startsWith("http://") || next.startsWith("https://")) next
    else s"${base.stripSuffix("/")}/${next.stripPrefix("/")}"

  /** One fetched page: raw `results` array re-serialized as JSON text plus
    * the URL it came from. */
  final case class FetchedPage(url: String, resultsJson: String, recordCount: Int)

  /** S2: fetch every page for (endpointPath, year), following `next` links,
    * rate-limiting between pages. Returns pages in fetch order.
    * Non-array `results` → TypeError contract (raw_io.py:156-157). */
  def fetchYearPages(transport: Transport, settings: Settings,
                     endpointPath: String, year: Int,
                     sleeper: Long => Unit = ms => Thread.sleep(ms)): Seq[FetchedPage] = {
    val pages = Seq.newBuilder[FetchedPage]
    var url = endpointUrl(settings.apiBase, endpointPath, year)
    var first = true
    while (url != null) {
      if (!first && settings.rateLimitRps > 0)
        sleeper((1000.0 / settings.rateLimitRps).toLong)
      first = false
      val body = getWithRetries(transport, url, settings.maxRetries, sleeper)
      val root = mapper.readTree(body)
      val results = root.get("results")
      if (results == null || !results.isArray)
        throw new IllegalStateException(
          s"Expected array 'results' from $url, got: " +
            (if (results == null) "absent" else results.getNodeType.toString))
      pages += FetchedPage(url, mapper.writeValueAsString(results), results.size())
      val next = root.get("next")
      url = if (next == null || next.isNull) null
            else resolveNext(settings.apiBase, next.asText())
    }
    pages.result()
  }

  /** Flatten fetched pages into one concatenated record array (the
    * fetch_endpoint_data return shape, http.py:85-124). */
  def concatRecords(pages: Seq[FetchedPage]): String = {
    val arrays = pages.map(p => mapper.readTree(p.resultsJson))
    val all = mapper.createArrayNode()
    arrays.foreach(a => a.forEach(n => { all.add(n); () }))
    mapper.writeValueAsString(all)
  }
}
