package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PaginatedIngest
import graft.sources.PaginatedIngest.FilePageClient

/** Cursor-pagination ingest loop (reference `ingest.py:82-125`): cursor
  * chase, 422 stop, empty-page stop, PR exclusion, created-from floor,
  * `since` incremental pull, and the S5 high-watermark helper. Pure
  * driver-side — no SparkSession needed.
  */
class PaginatedIngestSpec extends AnyFunSuite {

  private def issue(id: Int, created: String, updated: String,
                    pr: Boolean = false): String = {
    val prField = if (pr) """, "pull_request": {"url": "x"}""" else ""
    s"""{"id": $id, "created_at": "${created}T00:00:00Z", "updated_at": "${updated}T00:00:00Z"$prField}"""
  }

  private def writePages(pages: Seq[Seq[String]]): Path = {
    val dir = Files.createTempDirectory("pages")
    pages.zipWithIndex.foreach { case (lines, i) =>
      Files.write(dir.resolve(s"page_$i.jsonl"),
        lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    dir
  }

  private def run(dir: Path, since: Option[String] = None,
                  createdFrom: Option[String] = None,
                  perPage: Int = 100): (PaginatedIngest.IngestStats, Seq[String]) = {
    val out = Files.createTempFile("bronze", ".jsonl")
    val client = new FilePageClient(dir)
    val stats = PaginatedIngest.ingest(client, client.startUrl,
      perPage = perPage, since = since, createdFrom = createdFrom, outFile = out)
    (stats, Files.readAllLines(out, StandardCharsets.UTF_8)
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty))
  }

  test("follows the cursor chain across pages and stops at the last page") {
    val dir = writePages(Seq(
      Seq(issue(1, "2024-01-01", "2024-01-05")),
      Seq(issue(2, "2024-01-02", "2024-01-06")),
      Seq(issue(3, "2024-01-03", "2024-01-07"))))
    val (stats, lines) = run(dir, perPage = 1)
    assert(stats == PaginatedIngest.IngestStats(3, 3, stopped422 = false))
    assert(lines.size == 3)
  }

  test("422 mid-walk stops cleanly and keeps pages already saved") {
    val dir = writePages(Seq(
      Seq(issue(1, "2024-01-01", "2024-01-05")),
      Seq(issue(2, "2024-01-02", "2024-01-06"))))
    Files.write(dir.resolve("page_2.422"),
      "pagination limited".getBytes(StandardCharsets.UTF_8))
    // request 2 answers 422; requests 0 and 1 each served one row
    val (stats, lines) = run(dir, perPage = 1)
    assert(stats.stopped422 && stats.saved == 2 && lines.size == 2)
  }

  test("pull requests are excluded; created_from floors on created date") {
    val dir = writePages(Seq(Seq(
      issue(1, "2024-01-01", "2024-02-01"),
      issue(2, "2023-12-31", "2024-02-01"),            // before the floor
      issue(3, "2024-01-02", "2024-02-01", pr = true)  // a PR
    )))
    val (stats, lines) = run(dir, createdFrom = Some("2024-01-01"))
    assert(stats.saved == 1)
    assert(lines.head.contains("\"id\": 1"))
  }

  test("since param rides the cursor URL: later pages stay filtered") {
    val dir = writePages(Seq(
      Seq(issue(1, "2024-01-01", "2024-01-01"),
        issue(2, "2024-01-01", "2024-03-01")),
      Seq(issue(3, "2024-01-01", "2024-01-02"),
        issue(4, "2024-01-01", "2024-04-01"))))
    val (stats, lines) = run(dir, since = Some("2024-02-01T00:00:00Z"))
    assert(stats.saved == 2) // only the two updated after the watermark
    assert(lines.forall(l => l.contains("\"id\": 2") || l.contains("\"id\": 4")))
  }

  test("since filters the dataset BEFORE pagination — no empty intermediate pages") {
    // the real API repaginates the filtered result set, so `empty items ==
    // end` holds; rows matching the watermark must survive no matter which
    // original file they sat in (a per-page filter would silently drop
    // everything after the first all-filtered page)
    val dir = writePages(Seq(
      Seq(issue(1, "2024-01-01", "2024-01-01")),  // all filtered out
      Seq(issue(2, "2024-01-01", "2024-03-01"))))
    val (stats, lines) = run(dir, since = Some("2024-02-01T00:00:00Z"))
    assert(stats.saved == 1 && stats.pages == 1)
    assert(lines.head.contains("\"id\": 2"))
  }

  test("per_page caps each page; the walk continues to the rest") {
    val dir = writePages(Seq(Seq(
      issue(1, "2024-01-01", "2024-01-01"),
      issue(2, "2024-01-01", "2024-01-01"))))
    val (stats, _) = run(dir, perPage = 1)
    assert(stats.saved == 2 && stats.pages == 2)
  }

  test("label fetch paginates by page number, short page ends the walk") {
    // reference silver.py:20-38: page += 1 until empty/short page; null
    // description → "" (the `or ""`); later pages win duplicate names
    val dir = Files.createTempDirectory("labels")
    Files.write(dir.resolve("page_0.jsonl"), Seq(
      """{"name": "Bug", "description": "broken"}""",
      """{"name": "Docs", "description": null}""",
      """{"name": "Dup", "description": "first"}""").mkString("\n").getBytes)
    Files.write(dir.resolve("page_1.jsonl"), Seq(
      """{"name": "Dup", "description": "second"}""",
      """{"description": "nameless, skipped"}""").mkString("\n").getBytes)
    val got = PaginatedIngest.fetchLabelDescriptions(
      PaginatedIngest.FilePageClient(dir.toString), perPage = 3)
    assert(got === Seq("Bug" -> "broken", "Docs" -> "", "Dup" -> "second"))
  }

  test("label fetch raises on a non-200 page, like raise_for_status") {
    val dir = Files.createTempDirectory("labels422")
    Files.write(dir.resolve("page_0.422"), "validation failed".getBytes)
    val e = intercept[RuntimeException] {
      PaginatedIngest.fetchLabelDescriptions(
        PaginatedIngest.FilePageClient(dir.toString))
    }
    assert(e.getMessage.contains("422"))
  }

  test("sinceWatermark returns the max updated_at across bronze runs (S5)") {
    val dir = Files.createTempDirectory("bronze")
    Files.write(dir.resolve("issues_20240101_000000.jsonl"),
      Seq(issue(1, "2024-01-01", "2024-01-05"),
        issue(2, "2024-01-01", "2024-02-01")).mkString("\n").getBytes)
    Files.write(dir.resolve("issues_20240201_000000.jsonl"),
      issue(3, "2024-01-01", "2024-01-20").getBytes)
    assert(PaginatedIngest.sinceWatermark(dir).contains("2024-02-01T00:00:00Z"))
    assert(PaginatedIngest.sinceWatermark(
      Files.createTempDirectory("empty")).isEmpty)
  }
}
