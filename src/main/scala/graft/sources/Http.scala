package graft.sources

/** Shared HTTP plumbing for the REST-catalog consumers. Every
  * synchronous catalog round trip carries explicit connect/request
  * timeouts so a stalled endpoint fails loudly instead of hanging the
  * caller — the `rest_view(...)`/`iceberg_rest_scan(...)` SQL rewrites
  * fire their GETs at parse time, where an unbounded wait would wedge
  * the whole statement. */
object Http {
  val connectTimeout: java.time.Duration = java.time.Duration.ofSeconds(5)
  val requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(30)

  lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(connectTimeout)
      .build()

  /** A request builder for `url` with the request timeout pre-set. */
  def request(url: String): java.net.http.HttpRequest.Builder =
    java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(requestTimeout)
}
