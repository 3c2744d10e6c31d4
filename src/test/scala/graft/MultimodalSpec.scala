package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageDecode, MediaRow}

/** Real-codec contract for the multimodal decode path: `javax.imageio`
  * round-trips (PNG exact, JPEG dims), undecodable payloads hit the md5
  * fallback, and the distributed path equals the local decode per row.
  */
class MultimodalSpec extends SparkSpec {

  private def png(w: Int, h: Int, g: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w; b <- 0 until 3) r.setSample(x, y, b, g)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("PNG round-trip decodes exact dims, band count, and solid-fill brightness") {
    val meta = ImageDecode.tryDecode(MediaRow(7L, "image", png(20, 31, 100))).get
    assert(meta.width == 20 && meta.height == 31 && meta.channels == 3)
    assert(meta.brightness == 100.0 / 255.0) // exact: every sample is 100
  }

  test("JPEG payloads decode through the same path (dims exact; lossy pixels sane)") {
    val img = new java.awt.image.BufferedImage(
      24, 18, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val r = img.getRaster
    for (y <- 0 until 18; x <- 0 until 24; b <- 0 until 3) r.setSample(x, y, b, 128)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val meta = ImageDecode.tryDecode(MediaRow(1L, "image", bos.toByteArray)).get
    assert(meta.width == 24 && meta.height == 18 && meta.channels == 3)
    assert(math.abs(meta.brightness - 128.0 / 255.0) < 0.02) // lossy, near
  }

  test("undecodable bytes fall back to the deterministic md5 stub") {
    val garbage = MediaRow(3L, "image", "not an image at all".getBytes("UTF-8"))
    assert(ImageDecode.tryDecode(garbage).isEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    val viaDecode = ImageDecode.decode(garbage, md)
    val viaStub = ImageDecode.stub(garbage, md)
    assert(viaDecode == viaStub)
    assert(viaDecode.channels == 3 &&
      viaDecode.width >= 64 && viaDecode.width <= 191)
  }

  test("WAV round-trip decodes exact rate, channels, frames, integer-micros duration") {
    val fmt = new javax.sound.sampled.AudioFormat(12000f, 16, 2, true, false)
    val pcm = new Array[Byte](500 * fmt.getFrameSize)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 500L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val meta = Multimodal.AudioDecode
      .tryDecode(MediaRow(5L, "audio", bos.toByteArray)).get
    assert(meta.sample_rate == 12000 && meta.channels == 2)
    assert(meta.frames == 500L)
    assert(meta.duration_us == 500L * 1000000L / 12000L) // floor division
  }

  test("undecodable audio bytes fall back to the md5 stub") {
    val garbage = MediaRow(9L, "audio", "definitely not audio".getBytes("UTF-8"))
    assert(Multimodal.AudioDecode.tryDecode(garbage).isEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    val meta = Multimodal.AudioDecode.decode(garbage, md)
    assert(meta.sample_rate == 8000 && meta.channels == 1)
    assert(meta.frames >= 64 && meta.frames <= 191)
  }

  test("sample-level PCM decode: exact peak / mean|x| / RMS, stereo included") {
    import spark.implicits._
    // stereo: L = +2000, R = -1000 on every frame → samples interleave
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 2, true, false)
    val frames = 300
    val pcm = new Array[Byte](frames * 4)
    for (i <- 0 until frames) {
      pcm(4 * i) = (2000 & 0xff).toByte
      pcm(4 * i + 1) = ((2000 >> 8) & 0xff).toByte
      pcm(4 * i + 2) = ((-1000) & 0xff).toByte
      pcm(4 * i + 3) = (((-1000) >> 8) & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val out = Multimodal.decodeAudioFeatures(
      Seq(MediaRow(1L, "audio", bos.toByteArray)).toDS()).collect().head
    assert(out.n_samples == 2L * frames) // both channels' samples counted
    assert(out.peak == 2000)
    assert(out.mean_abs == (2000.0 + 1000.0) / 2)
    assert(out.rms == math.sqrt((2000.0 * 2000 + 1000.0 * 1000) / 2))
  }

  test("multi-frame GIF round-trip decodes every frame's dims and brightness") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val frames = Multimodal
      .decodeGifFrames(Multimodal.syntheticGifMedia(docs))
      .collect().groupBy(_.media_id)
    assert(frames.size == 50)
    for (id <- 0L until 50L) {
      val fs = frames(id).sortBy(_.frame_idx)
      assert(fs.length == 2 + (id % 7).toInt, s"frame count of $id")
      fs.foreach { f =>
        assert(f.width == 16 + (id % 13).toInt, s"width of $id/${f.frame_idx}")
        assert(f.height == 16 + ((id * 5) % 11).toInt,
          s"height of $id/${f.frame_idx}")
        val g = ((id * 31 + f.frame_idx * 41) % 256).toInt
        // solid fill survives GIF palette quantization exactly
        assert(f.brightness == g / 255.0, s"brightness of $id/${f.frame_idx}")
      }
    }
  }

  test("sampleFrames keeps every step-th decoded frame only") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val sampled = Multimodal
      .sampleFrames(Multimodal.syntheticGifMedia(docs), step = 2)
      .select("media_id", "frame_idx").as[(Long, Int)].collect()
    assert(sampled.forall(_._2 % 2 == 0))
    val perDoc = sampled.groupBy(_._1).view.mapValues(_.length).toMap
    for (id <- 0L until 30L) {
      val n = 2 + (id % 7).toInt
      assert(perDoc(id) == (n + 1) / 2, s"sampled count of $id")
    }
  }

  test("distributed decode over generated PNGs equals the closed-form metadata") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Multimodal.decodedPngFeatures(spark, docs)
      .orderBy("media_id").collect()
    assert(out.length == 200)
    out.foreach { row =>
      val id = row.getLong(0)
      assert(row.getInt(1) == 16 + (id % 17).toInt, s"width of $id")
      assert(row.getInt(2) == 16 + ((id * 7) % 23).toInt, s"height of $id")
      assert(row.getInt(3) == 3)
      val expected = BigDecimal((id % 256).toInt / 255.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getDouble(4) == expected, s"brightness of $id")
    }
  }

  test("perceptual hash: byte-distinct within class, exactly one phash per class") {
    import spark.implicits._
    val docs = (0L until 160L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = Multimodal.syntheticPatternPngMedia(docs, nClasses = 8)
      .collect()
    // the noise pixel makes same-class payloads byte-different, so an
    // exact-byte fingerprint CANNOT produce the 8-class grouping
    val byteGroups = media.groupBy(m => m.content.toSeq).size
    assert(byteGroups > 8, s"expected byte-distinct payloads, got $byteGroups")
    val hashed = Multimodal
      .imagePerceptualHash(spark.createDataset(media.toSeq))
      .collect().map(h => h.media_id -> h.phash).toMap
    // every class collapses to one hash; all 8 classes separate
    val byClass = hashed.groupBy { case (id, _) => id % 8 }
      .map { case (c, m) => c -> m.values.toSet }
    byClass.foreach { case (c, hs) =>
      assert(hs.size == 1, s"class $c split into ${hs.size} hashes")
    }
    assert(byClass.values.map(_.head).toSet.size == 8,
      "two classes collided on the same phash")
  }

  test("phashCanonical: components path == exact-group fast path; best copy wins") {
    import spark.implicits._
    val docs = (0L until 160L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = Multimodal.syntheticPatternPngMedia(docs, nClasses = 8)
    val viaComponents = Multimodal.phashCanonical(media, maxHamming = 0)
    // degenerate fast path at maxHamming=0: clusters ARE exact phash
    // groups — min-id cluster label + mean-luma argmax, no pair join
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(desc("q"), col("media_id"))
    val groups = Multimodal.imagePerceptualHash(media).toDF()
      .withColumn("cluster_id",
        min(col("media_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("phash")))
    val viaGroups = groups
      .join(Multimodal.imageMeanLuma(media).toDF()
        .select(col("media_id"), round(col("mean_luma"), 6).as("q")), "media_id")
      .withColumn("_rn", row_number().over(w))
    val reps = viaGroups.filter(col("_rn") === 1)
      .select(col("cluster_id"), col("media_id").as("canonical_id"))
    val expected = groups.select("media_id", "cluster_id").join(reps, "cluster_id")
      .select("media_id", "cluster_id", "canonical_id")
    assert(viaComponents.exceptAll(expected).isEmpty &&
      expected.exceptAll(viaComponents).isEmpty)
    // the canonical is the BEST copy, not the oldest: at least one
    // cluster's winner must not be its min id (noise-pixel luck)
    val notOldest = viaComponents
      .groupBy("cluster_id").agg(min(col("media_id")).as("mn"),
        first(col("canonical_id")).as("cid"))
      .filter(col("cid") =!= col("mn")).count()
    assert(notOldest > 0, "every winner was the min id — quality never decided")
  }

  test("audioSegments tile the file and reconcile with audioActivity") {
    import spark.implicits._
    val docs = (0L until 120L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val media = Multimodal.syntheticToneWavMedia(docs)
    val segs = Multimodal.audioSegments(media, 100, 500L).collect()
      .groupBy(_.media_id)
    val act = Multimodal.audioActivity(media, 100, 500L).collect()
      .map(a => a.media_id -> a).toMap
    assert(segs.keySet == act.keySet)
    segs.foreach { case (id, ss) =>
      val sorted = ss.sortBy(_.segment_idx)
      // contiguous tiling from sample 0, alternating states
      assert(sorted.head.start_sample == 0L)
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.end_sample == y.start_sample, s"gap in media $id")
          assert(x.active != y.active, s"non-alternating run in media $id")
        case _ =>
      }
      val a = act(id)
      assert(sorted.map(_.n_windows).sum == a.n_windows)
      assert(sorted.filter(_.active).map(_.n_windows).sum == a.n_active)
      // the loader contract: trim_end is the end of the last active run
      val lastActive = sorted.filter(_.active).lastOption
      assert(lastActive.map(_.end_sample).getOrElse(0L) == a.trim_end_sample ||
        (lastActive.exists(s => s.segment_idx == sorted.last.segment_idx) &&
          a.trim_end_sample >= lastActive.get.start_sample))
    }
  }
}
