package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Epoch shuffle and source interleaving: valid permutations, seed
  * sensitivity, partition invariance, and the closed-form interleave
  * position against a direct lexicographic sort.
  */
class EpochOrderSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq.tabulate(300) { i =>
    (i.toLong, s"src${i % 7}")
  }.toDF("doc_id", "source")

  test("epochOrder is a permutation of 0..n-1 and partition-invariant") {
    val a = Sampling.epochOrder(docs.repartition(1), "doc_id", "e1")
      .select("doc_id", "epoch_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.epochOrder(docs.repartition(17), "doc_id", "e1")
      .select("doc_id", "epoch_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.toSeq.sorted == (0L until 300L))
  }

  test("different seeds give different permutations") {
    val a = Sampling.epochOrder(docs, "doc_id", "e1")
      .select("doc_id", "epoch_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.epochOrder(docs, "doc_id", "e2")
      .select("doc_id", "epoch_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a != b)
  }

  test("interleave position equals the direct (rank, source) sort") {
    val got = Sampling.interleaveBySource(docs, "doc_id", "source", "e1")
      .select("doc_id", "source", "rank_in_source", "interleave_pos")
      .collect()
      .map(r => (r.getLong(2), r.getString(1), r.getLong(0), r.getLong(3)))
    val expected = got.sortBy(t => (t._1, t._2)).zipWithIndex
      .map { case ((_, _, id, _), i) => id -> i.toLong }.toMap
    got.foreach { case (_, _, id, pos) =>
      assert(pos == expected(id), s"doc $id: got $pos want ${expected(id)}")
    }
  }

  test("null-source rows rank instead of dropping, nulls-first") {
    val withNulls = Seq.tabulate(60) { i =>
      (i.toLong, if (i % 3 == 0) null else s"src${i % 2}")
    }.toDF("doc_id", "source")
    val got = Sampling.interleaveBySource(withNulls, "doc_id", "source", "e1")
      .select("doc_id", "source", "rank_in_source", "interleave_pos")
      .collect()
      .map(r => (r.getLong(2), Option(r.getString(1)), r.getLong(0),
        r.getLong(3)))
    // no silent drops: every input row comes back, positions are 0..n-1
    assert(got.length == 60)
    assert(got.map(_._4).sorted.toSeq == (0L until 60L))
    // position == the direct (rank, source NULLS FIRST) sort
    val expected = got
      .sortBy(t => (t._1, t._2.isDefined, t._2.getOrElse("")))
      .zipWithIndex.map { case ((_, _, id, _), i) => id -> i.toLong }.toMap
    got.foreach { case (_, _, id, pos) =>
      assert(pos == expected(id), s"doc $id: got $pos want ${expected(id)}")
    }
  }

  test("round-robin: first k positions hit k distinct sources") {
    val got = Sampling.interleaveBySource(docs, "doc_id", "source", "e1")
      .orderBy("interleave_pos").limit(7)
      .select("source").as[String].collect()
    assert(got.toSet.size == 7) // one of each of the 7 sources
  }
}
