package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PaginatedIngest
import graft.sources.PaginatedIngest.HttpPageClient

/** End-to-end exercise of [[HttpPageClient]] against a real local HTTP
  * server (`com.sun.net.httpserver`, JDK built-in — zero egress): RFC-8288
  * `Link: rel="next"` cursor chase, first-request-only params, 422 stop,
  * raise on other non-200s, and the page-number labels loop (reference
  * `ingest.py:93-125`, `silver.py:20-38`).
  */
class HttpIngestSpec extends AnyFunSuite {

  private def issue(id: Int, created: String, pr: Boolean = false): String = {
    val prField = if (pr) """, "pull_request": {"url": "x"}""" else ""
    s"""{"id": $id, "created_at": "${created}T00:00:00Z", "updated_at": "${created}T00:00:00Z"$prField}"""
  }

  /** One router handler on "/" (HttpServer context matching is by prefix,
    * so sibling paths like /p1, /p10 need a single dispatch point).
    */
  private def withServer(route: (HttpExchange, String) => Unit)
                        (f: (String, collection.Seq[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = collection.mutable.ArrayBuffer.empty[String]
    server.createContext("/", (ex: HttpExchange) => {
      seen.synchronized { seen += ex.getRequestURI.toString }
      try route(ex, ex.getRequestURI.getPath) finally ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", seen)
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int, body: String,
                      link: Option[String] = None): Unit = {
    link.foreach(l => ex.getResponseHeaders.add("Link", l))
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }

  test("Link-header cursor chase: params on first request only, filters applied, clean stop") {
    withServer { (ex, path) =>
      path match {
        case "/issues" =>
          respond(ex, 200, s"[${issue(1, "2021-05-01")}, ${issue(2, "2021-06-01", pr = true)}]",
            link = Some(s"""<http://${ex.getRequestHeaders.getFirst("Host")}/p2>; rel="next", <http://x/last>; rel="last""""))
        case "/p2" =>
          respond(ex, 200, s"[${issue(3, "2019-01-01")}, ${issue(4, "2021-07-01")}]")
        case other => respond(ex, 404, s"no route $other")
      }
    } { (base, seen) =>
      val out = Files.createTempDirectory("http_ingest").resolve("run.jsonl")
      val stats = PaginatedIngest.ingest(new HttpPageClient(), s"$base/issues",
        perPage = 2, createdFrom = Some("2020-01-01"), outFile = out)
      // PR (id 2) excluded, pre-floor (id 3) excluded; both pages walked
      assert(stats.saved == 2 && stats.pages == 2 && !stats.stopped422)
      val ids = Files.readAllLines(out, StandardCharsets.UTF_8)
      assert(ids.size == 2 && ids.get(0).contains("\"id\":1") &&
        ids.get(1).contains("\"id\":4"))
      // request 1 carries the params; request 2 is the bare next-URL
      assert(seen.head.contains("per_page=2") && seen.head.contains("state=all"))
      assert(seen(1) == "/p2")
    }
  }

  test("422 mid-walk stops cleanly and keeps prior pages (GitHub result cap)") {
    withServer { (ex, path) =>
      path match {
        case "/issues" =>
          respond(ex, 200, s"[${issue(1, "2021-05-01")}]",
            link = Some(s"""<http://${ex.getRequestHeaders.getFirst("Host")}/p2>; rel="next""""))
        case "/p2" => respond(ex, 422, """{"message": "result cap"}""")
        case other => respond(ex, 404, s"no route $other")
      }
    } { (base, _) =>
      val out = Files.createTempDirectory("http_ingest").resolve("run.jsonl")
      val stats = PaginatedIngest.ingest(new HttpPageClient(), s"$base/issues",
        outFile = out)
      assert(stats.saved == 1 && stats.stopped422)
    }
  }

  test("non-200/422 raises with the response body (raise_for_status)") {
    withServer { (ex, _) => respond(ex, 500, "boom") } { (base, _) =>
      val out = Files.createTempDirectory("http_ingest").resolve("run.jsonl")
      val e = intercept[RuntimeException] {
        PaginatedIngest.ingest(new HttpPageClient(), s"$base/issues", outFile = out)
      }
      assert(e.getMessage.contains("500") && e.getMessage.contains("boom"))
    }
  }

  test("labels page-number loop over HTTP: short-page stop, null desc, later page wins") {
    withServer { (ex, path) =>
      val page = Option(ex.getRequestURI.getQuery).toSeq
        .flatMap(_.split("&")).collectFirst {
          case kv if kv.startsWith("page=") => kv.stripPrefix("page=").toInt
        }.getOrElse(-1)
      (path, page) match {
        case ("/labels", 1) => respond(ex, 200,
          """[{"name": "bug", "description": "defect"}, {"name": "ui", "description": null}]""")
        case ("/labels", 2) => respond(ex, 200,
          """[{"name": "bug", "description": "defect v2"}]""") // short → stop
        case _ => respond(ex, 404, "no route")
      }
    } { (base, seen) =>
      val got = PaginatedIngest.fetchLabelDescriptions(new HttpPageClient(),
        perPage = 2, urlFor = n => s"$base/labels?page=${n + 1}")
      assert(got == Seq("bug" -> "defect v2", "ui" -> ""))
      assert(seen.size == 2) // the short page ended the walk
    }
  }

  test("auth/accept headers reach the wire") {
    val header = new java.util.concurrent.atomic.AtomicReference[String]()
    withServer { (ex, _) =>
      header.set(ex.getRequestHeaders.getFirst("Authorization"))
      respond(ex, 200, "[]")
    } { (base, _) =>
      val client = new HttpPageClient(headers = Map(
        "Authorization" -> "Bearer test-token",
        "Accept" -> "application/vnd.github+json"))
      val resp = client.get(s"$base/issues", Map.empty)
      assert(resp.status == 200 && resp.items.isEmpty)
      assert(header.get() == "Bearer test-token")
    }
  }
}
