package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** The reference's cursor-following ingest loop (reference
  * `ingest.py:82-125`), ported against a pluggable page client so the
  * driver-side control flow — first-request params, Link-header cursor
  * chase, 422 stop, empty-page stop, PR exclusion, created-from local
  * filter, `since` (updated-time) incremental pull — exists and is testable
  * in a zero-egress environment. A real HTTP client would implement
  * [[PageClient]] with requests + the Link header; the bundled
  * [[FilePageClient]] serves pages from a directory.
  *
  * The loop is deliberately driver-side and sequential, like the reference:
  * cursor pagination is inherently serial. Scale-out happens per-repo (one
  * loop per repo, embarrassingly parallel) and everything downstream of the
  * bronze file is Spark.
  */
object PaginatedIngest {

  /** One page: HTTP-ish status, raw JSON item strings, next-page cursor
    * (None = last page — the absent `Link: rel="next"`).
    */
  final case class PageResponse(status: Int, items: Seq[String],
                                next: Option[String], body: String = "")

  trait PageClient {
    /** `params` only accompany the FIRST request (reference
      * `ingest.py:95-99`); cursor URLs carry their own state.
      */
    def get(url: String, params: Map[String, String]): PageResponse
  }

  final case class IngestStats(saved: Long, pages: Int, stopped422: Boolean)

  private val mapper = new ObjectMapper()

  /** Run the pagination loop: follow cursors from `startUrl`, drop pull
    * requests and rows created before `createdFrom`, append survivors as
    * JSONL to `outFile`. Returns counts + whether a 422 ended the walk.
    */
  def ingest(client: PageClient, startUrl: String,
             perPage: Int = 100,
             since: Option[String] = None,
             createdFrom: Option[String] = None,
             outFile: Path): IngestStats = {
    val params = Map("state" -> "all", "per_page" -> perPage.toString) ++
      since.map("since" -> _)
    val out = Files.newBufferedWriter(outFile, StandardCharsets.UTF_8)
    try {
      var url: Option[String] = Some(startUrl)
      var first = true
      var saved = 0L
      var pages = 0
      var got422 = false
      while (url.isDefined) {
        val resp = client.get(url.get, if (first) params else Map.empty)
        first = false
        if (resp.status == 422) {
          // e.g. GitHub's 1000-result search cap: report and stop cleanly,
          // keeping everything already saved (reference `ingest.py:101-104`)
          got422 = true
          url = None
        } else if (resp.status != 200) {
          throw new RuntimeException(s"ingest: HTTP ${resp.status}: ${resp.body}")
        } else if (resp.items.isEmpty) {
          url = None
        } else {
          pages += 1
          resp.items.foreach { line =>
            val node = mapper.readTree(line)
            val isPr = node.has("pull_request") // excluded (ingest.py:112)
            val keep = !isPr && (createdFrom match {
              case Some(floor) =>
                val c = Option(node.get("created_at")).map(_.asText(""))
                c.exists(_.take(10) >= floor.take(10)) // ISO dates compare lexically
              case None => true
            })
            if (keep) { out.write(line); out.newLine(); saved += 1 }
          }
          url = resp.next
        }
      }
      IngestStats(saved, pages, got422)
    } finally out.close()
  }

  /** Incremental watermark for `since`: the max `updated_at` across the
    * bronze runs already on disk (S5) — the next pull asks only for issues
    * updated after what we have. Plain file scan, driver-side, like the
    * reference's bookkeeping.
    */
  def sinceWatermark(bronzeDir: Path): Option[String] = {
    if (!Files.isDirectory(bronzeDir)) return None
    val runs = Files.list(bronzeDir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("issues_") &&
        p.getFileName.toString.endsWith(".jsonl"))
      .toSeq
    val updates = for {
      run <- runs
      line <- Files.readAllLines(run, StandardCharsets.UTF_8).asScala
      if line.nonEmpty
      u <- Option(mapper.readTree(line).get("updated_at")).map(_.asText())
      if u.nonEmpty
    } yield u
    if (updates.isEmpty) None else Some(updates.max) // ISO-8601 sorts lexically
  }

  /** File-backed page server: the DATASET is every `<dir>/page_<k>.jsonl`
    * concatenated in order; `<dir>/page_<n>.422` makes the n-th REQUEST
    * answer 422 with the file's text as body (e.g. GitHub's result cap).
    *
    * Crucially it behaves like the real API: `since` filters the dataset
    * SERVER-SIDE and pagination happens over the filtered stream — so an
    * empty items array really does mean "end of results", the invariant
    * the reference's `if not items: break` loop depends on (a client that
    * filtered per fixed page would emit empty intermediate pages and make
    * that loop silently drop everything after them). Like the real API,
    * the `next` cursor URL carries the query state forward, so follow-up
    * requests need no params (reference `ingest.py:98-99`).
    */
  final class FilePageClient(dir: Path) extends PageClient {
    def startUrl: String = "page_0"

    private def parse(url: String): (Int, Map[String, String]) =
      url.split("\\?", 2) match {
        case Array(page) => (page.stripPrefix("page_").toInt, Map.empty)
        case Array(page, qs) =>
          (page.stripPrefix("page_").toInt,
            qs.split("&").iterator.map(_.split("=", 2))
              .collect { case Array(k, v) => k -> v }.toMap)
      }

    private def dataset(since: Option[String]): Seq[String] = {
      val files = Iterator.from(0)
        .map(i => dir.resolve(s"page_$i.jsonl"))
        .takeWhile(Files.exists(_)).toSeq
      files.flatMap(f => Files.readAllLines(f, StandardCharsets.UTF_8).asScala)
        .filter(_.nonEmpty)
        .filter { l =>
          since.forall { s =>
            Option(mapper.readTree(l).get("updated_at"))
              .exists(_.asText("") >= s)
          }
        }
    }

    def get(url: String, params: Map[String, String]): PageResponse = {
      val (n, urlParams) = parse(url)
      val p = params ++ urlParams // cursor state wins, as in a real next-URL
      val errFile = dir.resolve(s"page_$n.422")
      if (Files.exists(errFile))
        return PageResponse(422, Nil, None,
          new String(Files.readAllBytes(errFile), StandardCharsets.UTF_8))
      val cap = p.get("per_page").map(_.toInt).getOrElse(100)
      val rows = dataset(p.get("since"))
      val chunk = rows.slice(n * cap, (n + 1) * cap)
      val next = {
        val qs = p.map { case (k, v) => s"$k=$v" }.mkString("&")
        val tail = if (qs.isEmpty) "" else s"?$qs"
        val more = rows.size > (n + 1) * cap ||
          Files.exists(dir.resolve(s"page_${n + 1}.422"))
        if (more) Some(s"page_${n + 1}$tail") else None
      }
      PageResponse(200, chunk, next)
    }
  }

  object FilePageClient {
    def apply(dir: String): FilePageClient = new FilePageClient(Paths.get(dir))
  }

  /** Production-shaped [[PageClient]] over `java.net.http`: GETs the URL
    * (first-request `params` appended as an encoded query string), follows
    * the RFC-8288 `Link: <…>; rel="next"` header for the cursor — exactly
    * the header the reference's loop chases (reference `ingest.py:98-99`)
    * — and returns the body's JSON array elements as compact item strings.
    * Non-array bodies (error objects) yield no items; the status + body
    * pass through so [[ingest]]'s 422/raise branches behave identically to
    * the file-backed client. `headers` carries auth/Accept (e.g.
    * `Authorization: Bearer <token>`, `Accept: application/vnd.github+json`).
    *
    * Zero-egress note: integration-tested against a local
    * `com.sun.net.httpserver` stub (HttpIngestSpec) serving Link chains,
    * 422s, and label pages; the wire behavior is the standard library's.
    */
  final class HttpPageClient(
      headers: Map[String, String] = Map.empty,
      timeout: java.time.Duration = java.time.Duration.ofSeconds(30))
    extends PageClient {

    private val http = java.net.http.HttpClient.newBuilder()
      .connectTimeout(timeout)
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()

    private def enc(s: String): String =
      java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)

    /** `<url>; rel="next"` segment of a Link header, if present. */
    private[sources] def nextFromLink(link: Option[String]): Option[String] =
      link.flatMap { l =>
        l.split(",").iterator.map(_.trim).collectFirst {
          case seg if seg.contains("rel=\"next\"") &&
            seg.startsWith("<") && seg.contains(">") =>
            seg.substring(1, seg.indexOf('>'))
        }
      }

    def get(url: String, params: Map[String, String]): PageResponse = {
      val full =
        if (params.isEmpty) url
        else {
          val qs = params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }
            .mkString("&")
          url + (if (url.contains("?")) "&" else "?") + qs
        }
      val req = headers.foldLeft(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(full))
          .timeout(timeout).GET()) { case (b, (k, v)) => b.header(k, v) }
      val resp = http.send(req.build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val body = resp.body()
      val items =
        if (resp.statusCode() != 200) Nil
        else {
          val node = try mapper.readTree(body) catch { case _: Exception => null }
          if (node != null && node.isArray)
            node.elements().asScala.map(_.toString).toSeq
          else Nil
        }
      import scala.jdk.OptionConverters._
      PageResponse(resp.statusCode(), items,
        nextFromLink(resp.headers().firstValue("Link").toScala), body)
    }
  }

  /** The labels-endpoint loop (reference `silver.py:20-38`): PAGE-NUMBER
    * pagination — no cursor chase — requesting `page_0, page_1, …` until
    * an empty page or a short page (`len(items) < per_page`) ends the
    * walk; a non-200 raises like `raise_for_status`. Items are label
    * objects; a null/absent `description` becomes "" (the reference's
    * `or ""`). Later pages win duplicate names, matching dict insertion.
    *
    * `urlFor` maps the 0-based loop index to the request URL — the default
    * fits [[FilePageClient]]; against HTTP pass e.g.
    * `n => s"$base/labels?page=${n + 1}"` (GitHub pages are 1-indexed).
    */
  def fetchLabelDescriptions(client: PageClient,
                             perPage: Int = 100,
                             urlFor: Int => String = n => s"page_$n"
                            ): Seq[(String, String)] = {
    val params = Map("per_page" -> perPage.toString)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var n = 0
    var done = false
    while (!done) {
      val resp = client.get(urlFor(n), params)
      if (resp.status != 200)
        throw new RuntimeException(
          s"labels page $n returned HTTP ${resp.status}: ${resp.body}")
      val items = resp.items
      items.foreach { raw =>
        val node = mapper.readTree(raw)
        Option(node.get("name")).map(_.asText()).filter(_.nonEmpty).foreach {
          name =>
            val desc = Option(node.get("description"))
              .filterNot(_.isNull).map(_.asText()).getOrElse("")
            out(name) = desc
        }
      }
      done = items.isEmpty || items.size < perPage
      n += 1
    }
    out.toSeq
  }
}
