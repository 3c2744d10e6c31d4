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
