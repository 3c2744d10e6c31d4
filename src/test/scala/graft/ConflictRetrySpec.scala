package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Optimistic-concurrency recompute retries: the combinator's contract
  * (only ConcurrentWriteException retries, bounded attempts, other
  * failures propagate) and the end-to-end two-writer merge race — both
  * upserts must land, serialized, with a dense ledger.
  */
class ConflictRetrySpec extends SparkSpec {

  private def table(root: String) = VersionedTable(spark, root)

  test("withConflictRetry retries conflicts, bounds attempts, and lets " +
    "other failures propagate untouched") {
    import spark.implicits._
    val root = Files.createTempDirectory("retry").resolve("t").toString
    val vt = table(root)
    vt.overwrite(Seq((1L, "a")).toDF("id", "v"))

    // two injected conflicts, then success
    var calls = 0
    val got = vt.withConflictRetry(maxAttempts = 3) {
      calls += 1
      if (calls < 3)
        throw new VersionedTable.ConcurrentWriteException("injected", null)
      42
    }
    assert(got == 42 && calls == 3)

    // attempts exhausted: the conflict surfaces
    intercept[VersionedTable.ConcurrentWriteException] {
      vt.withConflictRetry(maxAttempts = 2) {
        throw new VersionedTable.ConcurrentWriteException("always", null)
      }
    }

    // a non-conflict failure is NEVER retried (a disk/permission error
    // must not be replayed as if it were a concurrent writer)
    var once = 0
    intercept[IllegalStateException] {
      vt.withConflictRetry(maxAttempts = 5) {
        once += 1
        throw new IllegalStateException("disk on fire")
      }
    }
    assert(once == 1)
  }

  test("compaction rebase guard: pure appends commute, anything touching " +
    "the inputs or table metadata does not") {
    import VersionedTable.Manifest
    val small = Seq("data/s1", "data/s2")
    val read = Manifest(3L, "append", 100L, Seq("data/big", "data/s1",
      "data/s2"), schemaJson = Some("{s}"), dirRows = Map("data/big" -> 99L))
    def head(dirs: Seq[String], schema: Option[String] = Some("{s}"),
             dvs: Seq[String] = Nil,
             colMap: Seq[(String, String)] = Nil) =
      Manifest(4L, "append", 200L, dirs, schemaJson = schema, dvs = dvs,
        colMap = colMap)
    import java.nio.file.Files
    val vt = table(Files.createTempDirectory("rb").resolve("t").toString)
    // a pure append (new dir, inputs intact) commutes
    assert(vt.compactionRebaseSafe(small, read,
      head(read.dataDirs :+ "data/new")))
    // winner rewrote an input dir
    assert(!vt.compactionRebaseSafe(small, read,
      head(Seq("data/big", "data/s1", "data/merged"))))
    // schema / colMap / DV changes all fail the guard
    assert(!vt.compactionRebaseSafe(small, read,
      head(read.dataDirs :+ "data/new", schema = Some("{s2}"))))
    assert(!vt.compactionRebaseSafe(small, read,
      head(read.dataDirs :+ "data/new", colMap = Seq("a" -> "b"))))
    assert(!vt.compactionRebaseSafe(small, read,
      head(read.dataDirs :+ "data/new", dvs = Seq("dv/x"))))
  }

  test("rebasedCompaction re-expresses the commit against the winner's " +
    "head: winner's dirs carry, inputs drop, output lands") {
    import VersionedTable.{DirWrite, Manifest}
    val small = Seq("data/s1", "data/s2")
    val w = DirWrite("data/packed", Map("data/packed" -> Map.empty),
      rows = 10L, nulls = Map.empty)
    val headM = Manifest(4L, "append", 200L,
      Seq("data/big", "data/s1", "data/s2", "data/new"),
      stats = Map("data/big" -> Map.empty, "data/s1" -> Map.empty,
        "data/new" -> Map.empty),
      schemaJson = Some("{s}"),
      dirRows = Map("data/big" -> 99L, "data/s1" -> 3L, "data/new" -> 5L))
    import java.nio.file.Files
    val vt = table(Files.createTempDirectory("rb2").resolve("t").toString)
    val r = vt.rebasedCompaction(small, w, headM)
    assert(r.version == 5L && r.operation == "compact_small")
    assert(r.dataDirs == Seq("data/big", "data/new", "data/packed"))
    assert(r.stats.keySet == Set("data/big", "data/new", "data/packed"))
    assert(r.dirRows == Map("data/big" -> 99L, "data/new" -> 5L,
      "data/packed" -> 10L))
  }

  test("compactSmallRetrying races a live appender: all rows survive, " +
    "ledger dense, small dirs consolidated") {
    import spark.implicits._
    val root = Files.createTempDirectory("rb3").resolve("t").toString
    val seedVt = table(root)
    (1 to 4).foreach(i =>
      seedVt.append(Seq((i.toLong, s"v$i")).toDF("id", "v")))

    val start = new CountDownLatch(2)
    val done = new CountDownLatch(2)
    @volatile var failure: Option[Throwable] = None
    def run(body: VersionedTable => Unit): Thread = {
      val t = new Thread(() => {
        try {
          val vt = table(root)
          start.countDown(); start.await()
          body(vt)
        } catch { case e: Throwable => failure = Some(e) }
        finally done.countDown()
      })
      t.start(); t
    }
    run(vt => (100 to 104).foreach(i =>
      vt.appendRetrying(Seq((i.toLong, s"v$i")).toDF("id", "v"),
        maxAttempts = 20)))
    run(vt => { vt.compactSmallRetrying(minRows = 1000L, maxAttempts = 20); () })
    assert(done.await(180, TimeUnit.SECONDS), "threads timed out")
    failure.foreach(throw _)

    val vt = table(root)
    val n = vt.versions.size
    assert(vt.versions == (0L until n.toLong), s"dense: ${vt.versions}")
    val ids = vt.read().select("id").collect().map(_.getLong(0)).toSet
    assert(ids == ((1 to 4).map(_.toLong) ++
      (100 to 104).map(_.toLong)).toSet, s"all rows must survive: $ids")
    // and packing small dirs after the dust settles leaves ONE dir
    vt.compactSmallRetrying(minRows = 1000L, maxAttempts = 5)
    val m = table(root).history().head
    assert(m.dataDirs.size == 1, s"post-pack dirs: ${m.dataDirs}")
  }

  test("two concurrent mergeRetrying writers: both upserts land, " +
    "serialized into a dense ledger") {
    import spark.implicits._
    val root = Files.createTempDirectory("retry2").resolve("t").toString
    table(root).overwrite(
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "ts"))

    val start = new CountDownLatch(2)
    val done = new CountDownLatch(2)
    @volatile var failure: Option[Throwable] = None
    def writer(rows: Seq[(Long, String, Long)]): Thread = {
      val t = new Thread(() => {
        try {
          // a fresh handle per thread: separate caches, same log root
          val vt = table(root)
          start.countDown(); start.await()
          vt.mergeRetrying(rows.toDF("id", "v", "ts"),
            keyCols = Seq("id"), orderCol = "ts", maxAttempts = 10)
        } catch { case e: Throwable => failure = Some(e) }
        finally done.countDown()
      })
      t.start(); t
    }
    writer(Seq((1L, "a2", 2L), (3L, "c", 2L)))
    writer(Seq((2L, "b2", 2L), (4L, "d", 2L)))
    assert(done.await(180, TimeUnit.SECONDS), "writers timed out")
    failure.foreach(throw _)

    val vt = table(root)
    assert(vt.versions == (0L to 2L), s"dense ledger: ${vt.versions}")
    val state = vt.read().collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    assert(state == Map(1L -> "a2", 2L -> "b2", 3L -> "c", 4L -> "d"),
      s"both upserts must land: $state")
  }
}
