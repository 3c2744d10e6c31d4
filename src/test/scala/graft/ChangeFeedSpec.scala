package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{ChangeFeed, VersionedTable}

/** Consumer-group contract: initial snapshot as inserts, offset advance
  * only after a successful callback (at-least-once), no-op when caught up,
  * seek, and exactly-one offset winner under a racing commit.
  */
class ChangeFeedSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("cf_spec").resolve("tbl").toString

  private def df(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("id", "payload", "updated_at")
  }

  test("bootstrap delivers the snapshot as inserts; then only deltas; no-op when caught up") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L), (2L, "b", 10L)))
    var seen = Seq.empty[(String, String)]
    def drain(): Option[(Long, Long)] =
      ChangeFeed.consume(spark, vt, "g1", Seq("id")) { (chg, _, _) =>
        seen = chg.orderBy("id", "_change_type").collect()
          .map(r => (r.getAs[String]("payload"), r.getAs[String]("_change_type")))
          .toSeq
      }
    assert(drain().contains((-1L, 0L)))
    assert(seen == Seq(("a", "insert"), ("b", "insert")))
    assert(ChangeFeed.position(spark, vt, "g1").contains(0L))

    // caught up: callback NOT invoked
    seen = Seq(("sentinel", ""))
    assert(drain().isEmpty && seen == Seq(("sentinel", "")))

    vt.merge(df((1L, "a2", 20L), (3L, "c", 20L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    assert(drain().contains((0L, 1L)))
    assert(seen == Seq(("a2", "update_postimage"), ("a", "update_preimage"),
      ("c", "insert")))
  }

  test("failed callback leaves the offset unmoved — the range redelivers") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L)))
    intercept[RuntimeException] {
      ChangeFeed.consume(spark, vt, "g2", Seq("id")) { (_, _, _) =>
        throw new RuntimeException("sink down")
      }
    }
    assert(ChangeFeed.position(spark, vt, "g2").isEmpty)
    var n = 0L
    ChangeFeed.consume(spark, vt, "g2", Seq("id")) { (chg, _, _) => n = chg.count() }
    assert(n == 1L && ChangeFeed.position(spark, vt, "g2").contains(0L))
  }

  test("seek starts a group at a chosen version; groups are independent") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L)))
    vt.append(df((2L, "b", 11L)))
    // consume-from-now: seek to latest, next consume sees only the delete
    ChangeFeed.seek(spark, vt, "g3", vt.latestVersion.get)
    vt.delete(col("id") === 1L)
    var types = Seq.empty[String]
    ChangeFeed.consume(spark, vt, "g3", Seq("id")) { (chg, _, _) =>
      types = chg.collect().map(_.getAs[String]("_change_type")).toSeq
    }
    assert(types == Seq("delete"))
    // a fresh group still bootstraps from the full current snapshot
    var rows = 0L
    ChangeFeed.consume(spark, vt, "g4", Seq("id")) { (chg, _, _) => rows = chg.count() }
    assert(rows == 1L)
  }

  test("racing offset commit: exactly one winner per sequence number") {
    val vt = VersionedTable(spark, freshRoot())
    vt.overwrite(df((1L, "a", 10L)))
    ChangeFeed.consume(spark, vt, "g5", Seq("id")) { (_, _, _) => () }
    vt.append(df((2L, "b", 11L)))
    // two consumers read the same position, both process, one offset wins:
    // simulate the loser by seeking the SAME next seq the winner takes
    intercept[VersionedTable.ConcurrentWriteException] {
      ChangeFeed.consume(spark, vt, "g5", Seq("id")) { (_, _, _) =>
        // mid-flight, a concurrent consumer commits the next offset first
        ChangeFeed.seek(spark, vt, "g5", vt.latestVersion.get)
      }
    }
    // regardless of who won, the group position is the latest version and
    // a further consume is a no-op
    assert(ChangeFeed.position(spark, vt, "g5").contains(vt.latestVersion.get))
    assert(ChangeFeed.consume(spark, vt, "g5", Seq("id"))((_, _, _) => ()).isEmpty)
  }
}
