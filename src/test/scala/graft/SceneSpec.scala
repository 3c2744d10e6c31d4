package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Scene segmentation invariants: the scene table tiles each media's
  * frames exactly (no gap, no overlap), scene count = cut count + 1,
  * and both ops agree on the same threshold.
  */
class SceneSpec extends SparkSpec {

  test("scenes tile the frames and agree with the cut counts") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val media = Multimodal.syntheticGifMedia(docs)
    val cuts = Multimodal.sceneCuts(media, threshold = 0.5)
    val scenes = Multimodal.sceneTable(media, threshold = 0.5)
      .localCheckpoint(true)
    // scene frame totals == media frame totals; scenes == cuts + 1
    val joined = scenes.groupBy("media_id")
      .agg(sum(col("n_frames")).as("sf"), count(lit(1)).as("ns"),
        min(col("start_frame")).as("lo"), max(col("end_frame")).as("hi"))
      .join(cuts, "media_id")
    assert(joined.filter(col("sf") =!= col("n_frames")).count() == 0)
    assert(joined.filter(col("ns") =!= col("n_cuts") + 1).count() == 0)
    // intervals cover [0, n_frames-1] with no overlap: total length of
    // intervals equals the frame count AND they span the full range
    assert(joined.filter(col("lo") =!= 0L ||
      col("hi") =!= col("n_frames") - 1L).count() == 0)
    val badLen = scenes
      .filter(col("end_frame") - col("start_frame") + 1 =!= col("n_frames"))
      .count()
    assert(badLen == 0) // each scene is one contiguous frame interval
  }
}
