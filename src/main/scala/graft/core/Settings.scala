package graft.core

/** Engine settings — same keys, defaults, and fail-fast contract as the
  * reference's env-driven frozen dataclass (/root/reference/etl/config.py:109-136;
  * required-fail-fast at config.py:93-95).
  *
  * DB connection settings have no analogue here (storage is a filesystem
  * warehouse root instead of a Postgres URL).
  */
final case class Settings(
    apiBase: String,
    warehouseRoot: String,
    requestTimeoutSeconds: Int = 30,
    rateLimitRps: Double = 4.0,
    maxRetries: Int = 3,
    rawPageSize: Int = 500,
    userAgent: String = "graft-etl/0.1")

object Settings {

  /** Build from environment, failing fast on missing required keys
    * (config.py:93-95 contract). */
  def fromEnv(env: Map[String, String] = sys.env): Settings = {
    def required(k: String): String = env.getOrElse(k,
      throw new RuntimeException(s"Missing required environment variable: $k"))
    Settings(
      apiBase = required("GRAFT_API_BASE"),
      warehouseRoot = required("GRAFT_WAREHOUSE_ROOT"),
      requestTimeoutSeconds = env.get("REQUEST_TIMEOUT_SECONDS").map(_.toInt).getOrElse(30),
      rateLimitRps = env.get("RATE_LIMIT_RPS").map(_.toDouble).getOrElse(4.0),
      maxRetries = env.get("MAX_RETRIES").map(_.toInt).getOrElse(3),
      rawPageSize = env.get("RAW_PAGE_SIZE").map(_.toInt).getOrElse(500),
      userAgent = env.getOrElse("GRAFT_USER_AGENT", "graft-etl/0.1"))
  }

  /** Credential-masking dump (config.py:139-154): never log secrets. */
  def masked(s: Settings): String =
    s"Settings(apiBase=${s.apiBase}, warehouseRoot=${s.warehouseRoot}, " +
      s"timeout=${s.requestTimeoutSeconds}s, rps=${s.rateLimitRps}, " +
      s"retries=${s.maxRetries}, pageSize=${s.rawPageSize})"
}
