package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` + typed metadata.
  *
  * Decode is REAL for raster formats the JDK ships codecs for (PNG, JPEG,
  * GIF, BMP via `javax.imageio` — no external dependency, works offline):
  * [[ImageDecode.decode]] parses the payload and computes width/height/
  * channel-count plus mean-sample brightness from the actual pixels.
  * Payloads no installed codec recognizes fall back to a deterministic
  * md5-derived pseudo-metadata stub, so the binary→metadata contract (and
  * its oracles) holds for arbitrary bytes — the audio/video analogue of
  * the same plumbing would slot its codec into the same fallback chain.
  *
  * Scale notes: decode runs in `mapPartitions` so codec state is amortized
  * per partition and rows stream through without materializing the
  * partition; the IMAGE/GIF generators fan their doc-id frame out of an
  * under-parallel scan first (ScanParallel, guide §2.5 — the id exchange
  * is 8 bytes/row while PNG/GIF encode+decode downstream is the family's
  * whole CPU; paired A/B: scene cuts 3.35→0.95 s). The WAV generators
  * deliberately do NOT spread: PCM encode/parse is so cheap that 32-way
  * task overhead across the queries' later tiny stages LOSES 2.5–3×
  * (paired A/B: the whole audio family 3.4→9.1 s when spread). No-op at
  * scale either way; `ImageIO` disk caching is
  * disabled (in-memory streams only —
  * executor-local /tmp churn at 100 TB would dominate). Binary payloads
  * stay columnar at rest (parquet binary) and should be size-bucketed
  * (`spark.sql.files.maxPartitionBytes`) so one task never holds more than
  * a few hundred MB of media.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, content: Array[Byte])
  final case class ImageMeta(media_id: Long, width: Int, height: Int,
                             channels: Int, brightness: Double)

  object ImageDecode {

    /** Real decode via the JDK's ImageIO: dimensions and band count from
      * the decoded raster, brightness = mean of ALL samples (every band,
      * every pixel) / 255 — exact for solid fills, well-defined for
      * anything. Returns None when no installed reader claims the bytes.
      */
    def tryDecode(m: MediaRow): Option[ImageMeta] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content))
        catch { case _: Exception => null }
      Option(img).map { i =>
        val raster = i.getRaster
        val bands = raster.getNumBands
        var sum = 0.0
        var n = 0L
        var y = 0
        while (y < i.getHeight) {
          var x = 0
          while (x < i.getWidth) {
            var b = 0
            while (b < bands) { sum += raster.getSample(x, y, b); n += 1; b += 1 }
            x += 1
          }
          y += 1
        }
        ImageMeta(m.media_id, i.getWidth, i.getHeight, bands,
          if (n == 0) 0.0 else sum / n / 255.0)
      }
    }

    /** Fallback pseudo-metadata for undecodable payloads, derived from
      * md5(content): width = 64 + (h[0] & 127), height = 64 + (h[1] & 127),
      * channels = 3, brightness = (h[2] & 255) / 255. Deterministic, so
      * the contract stays DuckDB-verifiable for arbitrary bytes.
      */
    def stub(m: MediaRow, md: MessageDigest): ImageMeta = {
      val h = md.digest(m.content)
      ImageMeta(m.media_id,
        64 + (h(0) & 0x7f),
        64 + (h(1) & 0x7f),
        3,
        (h(2) & 0xff) / 255.0)
    }

    /** Real decode when a codec claims the bytes, stub otherwise. */
    def decode(m: MediaRow, md: MessageDigest): ImageMeta =
      tryDecode(m).getOrElse(stub(m, md))
  }

  /** Per-partition decode: codec state (digest for the fallback, ImageIO
    * cache mode) initialized once per partition, not per row.
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams only
      val md = MessageDigest.getInstance("MD5") // codec init, once/partition
      it.map(m => ImageDecode.decode(m, md))
    }
  }

  /** documents → media table (text bytes as payload), the test stand-in for
    * a real binary column; exercises the undecodable-payload fallback.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("image").as("kind"),
      encode(col("text"), "UTF-8").as("content"))
      .as[MediaRow]
  }

  /** documents → REAL PNG payloads, generated per partition: a solid-gray
    * image whose dimensions and gray level are closed-form functions of
    * doc_id — so an oracle knows the decoded metadata by construction
    * while the bytes still round-trip through an actual PNG encode/decode.
    * Raster writes only (no AWT Graphics), headless-safe.
    */
  def syntheticPngMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    ScanParallel.fanOut(docs.select(col("doc_id")), Seq(col("doc_id")))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = 16 + (id % 17).toInt
        val h = 16 + ((id * 7) % 23).toInt
        val g = (id % 256).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < 3) { raster.setSample(x, y, b, g); b += 1 }
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id, "image", bos.toByteArray)
      }
    }
  }

  final case class AudioMeta(media_id: Long, sample_rate: Int, channels: Int,
                             frames: Long, duration_us: Long)

  object AudioDecode {

    /** Real audio-container decode via the JDK's `javax.sound.sampled`
      * (WAV/AIFF/AU — no external dependency): sample rate, channel count,
      * and frame length from the actual file header; duration in integer
      * micros (`frames * 1e6 / rate`, floor — exact long arithmetic, so
      * oracles replay it with integer division). None when no installed
      * reader claims the bytes.
      */
    def tryDecode(m: MediaRow): Option[AudioMeta] =
      try {
        val aff = javax.sound.sampled.AudioSystem
          .getAudioFileFormat(new java.io.ByteArrayInputStream(m.content))
        val fmt = aff.getFormat
        val rate = math.round(fmt.getSampleRate)
        val frames = aff.getFrameLength.toLong
        Some(AudioMeta(m.media_id, rate, fmt.getChannels, frames,
          if (rate > 0) frames * 1000000L / rate else 0L))
      } catch { case _: Exception => None }

    /** md5-derived fallback for undecodable payloads (same discipline as
      * [[ImageDecode.stub]]): rate 8000, mono, frames = 64 + (h[0] & 127).
      */
    def stub(m: MediaRow, md: MessageDigest): AudioMeta = {
      val h = md.digest(m.content)
      val frames = 64L + (h(0) & 0x7f)
      AudioMeta(m.media_id, 8000, 1, frames, frames * 1000000L / 8000L)
    }

    def decode(m: MediaRow, md: MessageDigest): AudioMeta =
      tryDecode(m).getOrElse(stub(m, md))
  }

  /** Per-partition audio decode — same contract as [[decodeImages]]. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.map(m => AudioDecode.decode(m, md))
    }
  }

  /** documents → REAL WAV payloads (16-bit PCM silence), generated per
    * partition with closed-form rate/channels/frames from doc_id — the
    * audio twin of [[syntheticPngMedia]]: bytes round-trip through an
    * actual WAV encode so the oracle verifies real header decode.
    */
  def syntheticWavMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val rate = 8000 + (id % 4).toInt * 4000
        val channels = 1 + (id % 2).toInt
        val frames = 400 + (id % 600).toInt
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, channels, true, false)
        val pcm = new Array[Byte](frames * fmt.getFrameSize)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRow(id, "audio", bos.toByteArray)
      }
    }
  }

  /** End-to-end REAL audio decode: documents → generated WAVs → meta. */
  def decodedWavFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeAudio(syntheticWavMedia(docs)).toDF()

  final case class AudioFeatures(media_id: Long, n_samples: Long, peak: Int,
                                 mean_abs: Double, rms: Double)

  /** REAL sample-level audio decode — the feature-extract step beyond
    * [[AudioDecode]]'s header parse: stream the PCM payload through
    * `AudioInputStream`, parse each 16-bit little-endian signed sample,
    * and reduce to per-file signal statistics (peak, mean |x|, RMS). All
    * accumulation is exact integer arithmetic (Σ|s| and Σs² of 16-bit
    * samples stay far under 2^63 for any realistic clip); the two float
    * divisions happen once per FILE, so both engines land identical
    * doubles. Per-partition codec init; samples stream through a fixed
    * 8 KiB buffer — a file's audio is never materialized.
    */
  def decodeAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(m.content))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
            s"media ${m.media_id}: only 16-bit little-endian PCM supported")
          // AudioInputStream.read returns an integral number of FRAMES
          // (frame size is a multiple of 2 bytes at 16-bit), so samples
          // never split across reads
          val buf = new Array[Byte](8192)
          var n = 0L; var peak = 0; var sumAbs = 0L; var sumSq = 0L
          var read = ais.read(buf)
          while (read > 0) {
            var i = 0
            while (i + 1 < read) {
              val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort.toInt
              val a = math.abs(s)
              n += 1; sumAbs += a; sumSq += a.toLong * a
              if (a > peak) peak = a
              i += 2
            }
            read = ais.read(buf)
          }
          AudioFeatures(m.media_id, n, peak,
            if (n == 0) 0.0 else sumAbs.toDouble / n,
            if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n))
        } finally ais.close()
      }
    }
  }

  /** documents → REAL tone WAVs with closed-form signal statistics: a
    * three-phase 16-bit mono clip per doc — `h = frames/4` samples at
    * +A, `h` at −A, the rest silence — so peak = A, mean|x| = 2hA/n, and
    * RMS = A·√(2h/n) are exact functions of (A, frames), while the bytes
    * still round-trip a real WAV encode and a real sample-level parse.
    */
  def syntheticToneWavMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val amp = 1000 + (id % 20).toInt * 500
        val frames = 400 + (id % 600).toInt
        val h = frames / 4
        val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
        val pcm = new Array[Byte](frames * 2)
        var i = 0
        while (i < 2 * h) {
          val s = if (i < h) amp else -amp
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRow(id, "audio", bos.toByteArray)
      }
    }
  }

  final case class FrameMeta(media_id: Long, frame_idx: Int, width: Int,
                             height: Int, brightness: Double)

  /** documents → REAL multi-frame GIF payloads: each doc becomes an
    * animated GIF of `2 + doc_id % 7` solid-gray frames whose dims and
    * per-frame gray level are closed-form functions of (doc_id, frame) —
    * the moving-picture analogue of [[syntheticPngMedia]]. The JDK's GIF
    * writer supports sequences natively (`canWriteSequence`), and a
    * solid-color frame survives the palette quantization exactly, so the
    * oracle knows every decoded frame's metadata by construction while
    * the bytes still round-trip a real multi-frame container encode.
    */
  def syntheticGifMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    ScanParallel.fanOut(docs.select(col("doc_id")), Seq(col("doc_id")))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val w = 16 + (id % 13).toInt
        val h = 16 + ((id * 5) % 11).toInt
        val nFrames = 2 + (id % 7).toInt
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        val writer =
          javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val g = ((id * 31 + f * 41) % 256).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var b = 0
              while (b < 3) { raster.setSample(x, y, b, g); b += 1 }
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), null)
          f += 1
        }
        writer.endWriteSequence()
        writer.dispose()
        ios.close()
        MediaRow(id, "video", bos.toByteArray)
      }
    }
  }

  /** REAL per-frame decode of multi-frame containers (GIF via the JDK
    * reader): frame count from `getNumImages`, each frame read
    * individually, brightness = mean over pixels of (r+g+b)/3 via
    * `getRGB` — GIF decodes to an indexed raster whose SAMPLES are
    * palette indices, so pixel values must come from the color-converted
    * RGB, not `raster.getSample`. Per-partition reader init, in-memory
    * streams, frames stream through the iterator without materializing a
    * partition's media.
    */
  def decodeGifFrames(media: Dataset[MediaRow]): Dataset[FrameMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { m =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(m.content))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Iterator.empty }
        else {
          val reader = readers.next()
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          val out = (0 until n).map { f =>
            val img = reader.read(f)
            var sum = 0.0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                  (rgb & 0xff)) / 3.0
                x += 1
              }
              y += 1
            }
            val px = img.getWidth.toLong * img.getHeight
            FrameMeta(m.media_id, f, img.getWidth, img.getHeight,
              if (px == 0) 0.0 else sum / px / 255.0)
          }
          reader.dispose()
          iis.close()
          out.iterator
        }
      }
    }
  }

  /** REAL audio resample by integer decimation (the audio twin of
    * [[resizeMeta]], but byte-level, not metadata-level): parse the
    * 16-bit mono PCM payload, keep every `factor`-th sample, and
    * re-encode a genuine WAV at `rate/factor` — downstream consumers
    * (including [[decodeAudioFeatures]]) see a normal, smaller file.
    * Streaming parse per partition; a clip is held only as its decimated
    * samples. Proper band-limited resampling needs a filter kernel no
    * JDK codec ships; decimation is the honest in-sandbox step and the
    * plumbing (schema, batching, re-encode) is what transfers.
    */
  def resampleDecimate(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, "decimation factor must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(m.content))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1,
            s"media ${m.media_id}: decimation expects 16-bit LE mono PCM")
          val kept = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var idx = 0L
          var read = ais.read(buf)
          while (read > 0) {
            var i = 0
            while (i + 1 < read) {
              if (idx % factor == 0) { kept.write(buf(i)); kept.write(buf(i + 1)) }
              idx += 1
              i += 2
            }
            read = ais.read(buf)
          }
          val outRate = fmt.getSampleRate / factor
          val outFmt = new javax.sound.sampled.AudioFormat(
            outRate, 16, 1, true, false)
          val pcm = kept.toByteArray
          val outAis = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), outFmt, pcm.length / 2L)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(outAis,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaRow(m.media_id, m.kind, bos.toByteArray)
        } finally ais.close()
      }
    }
  }

  /** Frame sampling for video media, on REAL decoded frames: every
    * `step`-th frame of each container, with its decoded metadata. The
    * decode is per-partition streaming; sampling is a plain filter on the
    * decoded frame index.
    */
  def sampleFrames(media: Dataset[MediaRow], step: Int): DataFrame =
    decodeGifFrames(media).toDF()
      .filter(pmod(col("frame_idx"), lit(step)) === 0)
      .withColumn("brightness", round(col("brightness"), 6))

  final case class AudioActivity(media_id: Long, n_windows: Long,
                                 n_active: Long, trim_end_sample: Long,
                                 silence_ratio: Double)

  /** VAD-style activity segmentation over REAL decoded PCM — the audio
    * twin of [[sceneCuts]] and the trim every ASR/TTS curation pass
    * runs (trailing silence is free tokens wasted): fixed
    * `windowSamples`-sample energy windows, a window is ACTIVE iff its
    * energy exceeds the threshold — compared as the all-integer
    * `sumSq > thr² · window` so the boundary replays engine-exactly
    * (no float RMS in the decision). Per media: window count, active
    * count, the trim point (end sample of the last active window — a
    * loader keeps `[0, trim_end)`), and the silence ratio. One
    * per-partition streaming decode, bounded state (five longs), one
    * output row per media.
    */
  def audioActivity(media: Dataset[MediaRow], windowSamples: Int = 100,
                    threshold: Long = 500L): Dataset[AudioActivity] = {
    import media.sparkSession.implicits._
    val thrSq = threshold * threshold * windowSamples
    media.mapPartitions { it =>
      it.map { m =>
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(m.content))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1,
            s"media ${m.media_id}: activity expects 16-bit LE mono PCM")
          val buf = new Array[Byte](8192)
          var inWin = 0; var sumSq = 0L
          var nWin = 0L; var nActive = 0L; var lastActive = -1L
          def closeWindow(): Unit = {
            if (inWin > 0) {
              if (sumSq > thrSq) { nActive += 1; lastActive = nWin }
              nWin += 1; inWin = 0; sumSq = 0L
            }
          }
          var read = ais.read(buf)
          while (read > 0) {
            var i = 0
            while (i + 1 < read) {
              val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort.toLong
              sumSq += s * s; inWin += 1
              if (inWin == windowSamples) closeWindow()
              i += 2
            }
            read = ais.read(buf)
          }
          closeWindow() // the short tail window, if any
          AudioActivity(m.media_id, nWin, nActive,
            if (lastActive < 0) 0L else (lastActive + 1L) * windowSamples,
            if (nWin == 0) 0.0
            else math.round((1.0 - nActive.toDouble / nWin) * 1e6) / 1e6)
        } finally ais.close()
      }
    }
  }

  final case class AudioSegment(media_id: Long, segment_idx: Long,
                                active: Boolean, start_sample: Long,
                                end_sample: Long, n_windows: Long)

  /** The per-(media, segment) table [[audioActivity]]'s decision implies —
    * what an ASR/TTS clip loader actually consumes (the audio twin of
    * [[sceneTable]] refining [[sceneCuts]]): one row per contiguous run
    * of same-state energy windows, with the sample interval
    * `[start_sample, end_sample)` the loader seeks to. Same all-integer
    * `sumSq > thr²·window` decision as [[audioActivity]], same streaming
    * decode; state per file is one open run (four longs + a flag), one
    * output row per state change — a voiced/silence alternation pattern
    * costs rows proportional to its segments, never its samples.
    */
  def audioSegments(media: Dataset[MediaRow], windowSamples: Int = 100,
                    threshold: Long = 500L): Dataset[AudioSegment] = {
    import media.sparkSession.implicits._
    val thrSq = threshold * threshold * windowSamples
    media.mapPartitions { it =>
      it.flatMap { m =>
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(m.content))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
            fmt.getChannels == 1,
            s"media ${m.media_id}: segmentation expects 16-bit LE mono PCM")
          val buf = new Array[Byte](8192)
          val out = scala.collection.mutable.ListBuffer.empty[AudioSegment]
          var inWin = 0; var sumSq = 0L
          var nWin = 0L; var nSamples = 0L
          // open run state: segIdx valid only when runWins > 0
          var segIdx = 0L; var runActive = false
          var runStartWin = 0L; var runWins = 0L
          def closeRun(endSample: Long): Unit =
            if (runWins > 0) {
              out += AudioSegment(m.media_id, segIdx, runActive,
                runStartWin * windowSamples, endSample, runWins)
              segIdx += 1; runWins = 0
            }
          def closeWindow(): Unit = if (inWin > 0) {
            val active = sumSq > thrSq
            if (runWins > 0 && active != runActive)
              closeRun(nWin * windowSamples)
            if (runWins == 0) { runActive = active; runStartWin = nWin }
            runWins += 1
            nWin += 1; inWin = 0; sumSq = 0L
          }
          var read = ais.read(buf)
          while (read > 0) {
            var i = 0
            while (i + 1 < read) {
              val s = ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort.toLong
              sumSq += s * s; inWin += 1; nSamples += 1
              if (inWin == windowSamples) closeWindow()
              i += 2
            }
            read = ais.read(buf)
          }
          closeWindow()       // the short tail window, if any
          closeRun(nSamples)  // final run ends at the true sample count
          out.toList
        } finally ais.close()
      }
    }
  }

  /** Shot/scene-cut detection over decoded frames — the video-curation
    * segmenter (training clips cut at shot boundaries, not mid-pan): a
    * cut wherever the inter-frame brightness delta exceeds `threshold`
    * (the scalar standing in for the frame-histogram distance a real
    * detector uses, per this file's stub discipline — the Spark-side
    * shape is the real one). Per media: frame count, cut count, and mean
    * scene length. Scale: the lag window partitions BY MEDIA (frames of
    * one container are already co-located by the per-partition decode);
    * skew is bounded by the longest video.
    */
  def sceneCuts(media: Dataset[MediaRow], threshold: Double): DataFrame = {
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    val frames = decodeGifFrames(media).toDF()
      .withColumn("brightness", round(col("brightness"), 6))
    val prev = lag(col("brightness"), 1).over(w)
    frames
      .withColumn("cut",
        when(prev.isNotNull && abs(col("brightness") - prev) > threshold,
          1L).otherwise(0L))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"), sum(col("cut")).as("n_cuts"),
        round(count(lit(1)).cast("double") /
          (sum(col("cut")) + lit(1L)).cast("double"), 6)
          .as("avg_scene_len"))
  }

  /** The clip manifest [[sceneCuts]]' boundaries imply — what a video
    * trainer actually consumes: one row per (media, scene) with the
    * frame interval, so a clip loader seeks (media_id, start_frame) and
    * reads `n_frames` frames with no side state. scene_idx is the
    * running count of cuts at-or-before each frame (a per-media window
    * cumsum — partitioned, never global).
    */
  def sceneTable(media: Dataset[MediaRow], threshold: Double): DataFrame = {
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    val frames = decodeGifFrames(media).toDF()
      .withColumn("brightness", round(col("brightness"), 6))
    val prev = lag(col("brightness"), 1).over(w)
    frames
      .withColumn("cut",
        when(prev.isNotNull && abs(col("brightness") - prev) > threshold,
          1L).otherwise(0L))
      .withColumn("scene_idx", sum(col("cut"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("media_id", "scene_idx")
      .agg(min(col("frame_idx")).cast("long").as("start_frame"),
        max(col("frame_idx")).cast("long").as("end_frame"),
        count(lit(1)).as("n_frames"))
  }

  /** Metadata-level resize: scale dims to fit `maxSide`, preserving aspect
    * ratio (integer floor), never upscaling.
    */
  def resizeMeta(meta: DataFrame, maxSide: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scale = when(longest > maxSide,
      lit(maxSide.toDouble) / longest.cast("double")).otherwise(1.0)
    meta
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** End-to-end: documents → media → decode (fallback path) → features. */
  def imageFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeImages(mediaFromDocuments(docs)).toDF()
      .withColumn("brightness", round(col("brightness"), 6))

  /** End-to-end REAL decode: documents → generated PNGs → ImageIO → meta. */
  def decodedPngFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeImages(syntheticPngMedia(docs)).toDF()
      .withColumn("brightness", round(col("brightness"), 6))

  final case class ImageHash(media_id: Long, phash: Long)

  /** documents → 32×32 half-plane-pattern PNGs: the pattern class
    * `doc_id % nClasses` picks the split line's slope, and ONE per-doc
    * noise pixel (position a function of doc_id) perturbs the bytes — so
    * images within a class are byte-DIFFERENT but perceptually identical.
    * Exact-byte dedup can't group them; a perceptual hash must.
    */
  def syntheticPatternPngMedia(docs: DataFrame,
                               nClasses: Int = 8): Dataset[MediaRow] = {
    require(nClasses >= 2 && nClasses <= 16)
    import docs.sparkSession.implicits._
    ScanParallel.fanOut(docs.select(col("doc_id")), Seq(col("doc_id")))
      .as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val c = (id % nClasses).toInt
        val img = new java.awt.image.BufferedImage(
          32, 32, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        val raster = img.getRaster
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            // distinct slope per class, line through the grid center; the
            // pattern is constant on 4×4 blocks, so every 8×8 aHash cell
            // is uniformly 0 or 255 and one noise pixel (±8 on a cell
            // average, ±0.125 on the grid mean) can never flip a bit
            val bx = x / 4; val by = y / 4
            val v = if ((c + 1) * bx - (nClasses - c) * by >=
              ((c + 1) - (nClasses - c)) * 4) 255 else 0
            var b = 0
            while (b < 3) { raster.setSample(x, y, b, v); b += 1 }
            x += 1
          }
          y += 1
        }
        // byte-level noise: one mid-gray pixel at a doc-specific position
        val nx = ((id * 13) % 32).toInt; val ny = ((id * 7) % 32).toInt
        var b = 0
        while (b < 3) { raster.setSample(nx, ny, b, 128); b += 1 }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRow(id, "image", bos.toByteArray)
      }
    }
  }

  /** 64-bit average-hash over REAL decoded pixels: green channel averaged
    * into an 8×8 grid of equal blocks, bit j set iff cell j ≥ the grid
    * mean — the classic aHash, robust to single-pixel noise and
    * re-encoding, which is exactly what byte-fingerprint dedup is not.
    * Map-side only (per-partition codec init, no shuffle); undecodable
    * payloads hash to the md5 stub's first 8 bytes so the contract stays
    * total.
    */
  private def decodeImg(content: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    catch { case _: Exception => null }

  /** The aHash of one decoded image (or the md5 stub of the raw bytes when
    * `img` is null) — the per-row body [[imagePerceptualHash]] and the
    * fused [[imageHashLuma]] share, so the two can never drift.
    */
  private def phashOf(img: java.awt.image.BufferedImage,
                      content: Array[Byte], md: MessageDigest): Long =
    if (img == null) {
      val d = md.digest(content)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v
    } else {
      val raster = img.getRaster
      val gBand = if (raster.getNumBands > 1) 1 else 0
      val w = img.getWidth; val hgt = img.getHeight
      val cells = new Array[Double](64)
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          // equal blocks by index range — works for any image size
          val x0 = cx * w / 8; val x1 = (cx + 1) * w / 8
          val y0 = cy * hgt / 8; val y1 = (cy + 1) * hgt / 8
          var sum = 0.0; var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              sum += raster.getSample(x, y, gBand); n += 1; x += 1
            }
            y += 1
          }
          cells(cy * 8 + cx) = if (n == 0) 0.0 else sum / n
          cx += 1
        }
        cy += 1
      }
      val mean = cells.sum / 64.0
      var v = 0L
      var j = 0
      while (j < 64) { if (cells(j) >= mean) v |= (1L << j); j += 1 }
      v
    }

  /** Mean green-channel sample of one decoded image; −1 for undecodable —
    * shared by [[imageMeanLuma]] and [[imageHashLuma]].
    */
  private def lumaOf(img: java.awt.image.BufferedImage): Double =
    if (img == null) -1.0 else {
      val raster = img.getRaster
      val gBand = if (raster.getNumBands > 1) 1 else 0
      val w = img.getWidth; val hgt = img.getHeight
      var sum = 0.0
      var y = 0
      while (y < hgt) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, gBand); x += 1 }
        y += 1
      }
      if (w * hgt == 0) -1.0 else sum / (w.toLong * hgt)
    }

  def imagePerceptualHash(media: Dataset[MediaRow]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = MessageDigest.getInstance("MD5")
      it.map(m => ImageHash(m.media_id, phashOf(decodeImg(m.content), m.content, md)))
    }
  }

  final case class ImageLuma(media_id: Long, mean_luma: Double)

  /** Mean green-channel sample per image — the quality scalar the
    * canonical-representative selection ranks on (brighter = the copy
    * without dark noise here; in production swap in resolution, sharpness,
    * or a learned scorer — the argmax plumbing is identical). Map-side
    * decode, no shuffle; undecodable payloads score −1 so they can never
    * win a cluster that has a decodable member.
    */
  def imageMeanLuma(media: Dataset[MediaRow]): Dataset[ImageLuma] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(m => ImageLuma(m.media_id, lumaOf(decodeImg(m.content))))
    }
  }

  final case class ImageHashLuma(media_id: Long, phash: Long, mean_luma: Double)

  /** aHash + quality scalar in ONE decode pass — the fused prep for
    * [[phashCanonical]], whose separate hash and luma passes each
    * re-generated and re-decoded every payload (the dominant cost of the
    * query is the codec work, so halving the passes halves it). Per-row
    * bodies are the exact helpers the single-metric ops use.
    */
  def imageHashLuma(media: Dataset[MediaRow]): Dataset[ImageHashLuma] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = MessageDigest.getInstance("MD5")
      it.map { m =>
        val img = decodeImg(m.content)
        ImageHashLuma(m.media_id, phashOf(img, m.content, md), lumaOf(img))
      }
    }
  }

  /** Near-dup image pairs with Hamming(phash) ≤ `maxHamming` via 16-bit
    * band join over the 64-bit aHash — [[graft.operators.Dedup.simhashPairs]]'
    * pigeonhole discipline on the image signature (maxHamming < 4 bands
    * guarantees one equal band). Candidates come only from shared bands;
    * the exact bit_count verify runs on candidates, never all pairs.
    */
  def imagePhashPairs(media: Dataset[MediaRow], maxHamming: Int = 0): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      "maxHamming must be in [0, 4): 4 bands of 16 bits pigeonhole up to 3 flips")
    phashPairsFromHashes(
      imagePerceptualHash(media).toDF().localCheckpoint(true), maxHamming)
  }

  /** The banded pair join of [[imagePhashPairs]] over an ALREADY-computed
    * (and materialized) (media_id, phash) frame — callers that computed
    * the hashes in a fused pass ([[phashCanonical]]) must not pay a second
    * decode just to band them.
    */
  private def phashPairsFromHashes(sh: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      "maxHamming must be in [0, 4): 4 bands of 16 bits pigeonhole up to 3 flips")
    val mask = (1L << 16) - 1
    val chunks = (0 until 4).map(c =>
      struct(lit(c).as("c"),
        shiftright(col("phash"), c * 16).bitwiseAND(lit(mask)).as("v")))
    val banded = sh
      .select(col("media_id"), col("phash"), explode(array(chunks: _*)).as("b"))
      .select(col("media_id"), col("phash"), col("b.c").as("c"), col("b.v").as("v"))
    banded.as("x").join(banded.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a"), col("y.media_id").as("b"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Canonical-representative image dedup — [[imagePhashPairs]] clusters ×
    * quality argmax, the image-side analogue of
    * [[graft.operators.CorpusPipeline.canonicalize]]: every media row maps
    * to the BEST copy ([[imageMeanLuma]], ties id-ascending) in its
    * perceptual-hash near-dup cluster. Returns
    * (media_id, cluster_id, canonical_id).
    */
  def phashCanonical(media: Dataset[MediaRow], maxHamming: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE generate+decode pass serves the id frame, the banded pair join,
    // and the quality argmax — the previous shape re-ran the media source
    // (and the codec) for each of the three
    val hl = imageHashLuma(media).toDF().localCheckpoint(true)
    val ids = hl.select(col("media_id"))
    val pairs = phashPairsFromHashes(
      hl.select("media_id", "phash"), maxHamming).select("a", "b")
    val clusters = graft.operators.Components.clusters(
      ids, pairs, idCol = "media_id")
    val quality = hl
      .select(col("media_id"), round(col("mean_luma"), 6).as("q"))
    val w = Window.partitionBy("cluster_id").orderBy(desc("q"), col("media_id"))
    val reps = clusters.join(quality, "media_id")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("cluster_id"), col("media_id").as("canonical_id"))
    clusters.join(reps, "cluster_id")
      .select(col("media_id"), col("cluster_id"), col("canonical_id"))
  }
}
