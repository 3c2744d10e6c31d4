package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.Multimodal

/** Multimodal queries. Decode runs in typed `mapPartitions` on the Spark
  * side; mm_image_decode drives the REAL `javax.imageio` codec over
  * generated PNGs (metadata known by construction), while mm_image_meta /
  * mm_resize / mm_frame_sample feed text bytes — no codec claims them, so
  * they pin the md5-derived fallback, which the oracle recomputes in SQL
  * (payload bytes included: md5(text::BLOB) in DuckDB hashes the same
  * UTF-8 bytes Spark's `encode(text,'UTF-8')` produces).
  */
object MultimodalQueries {

  private def hexByte(pos: Int): String =
    s"('0x' || substring(md5(text), ${pos * 2 + 1}, 2))::BIGINT"

  val defs: Map[String, QueryDef] = Map(

    // REAL codec round-trip: solid-gray PNGs generated per partition with
    // closed-form dims/gray-level from doc_id, encoded with ImageIO, then
    // decoded back through the same mapPartitions contract — the oracle
    // knows width/height/brightness by construction, so a hash match
    // proves actual pixel decode, not just plumbing
    "mm_image_decode" -> QueryDef(
      build = (s, dir) =>
        Multimodal.decodedPngFeatures(s, Tables.documents(s, dir)),
      oracle = Some(
        """SELECT doc_id AS media_id,
          |       CAST(16 + doc_id % 17 AS INT) AS width,
          |       CAST(16 + (doc_id * 7) % 23 AS INT) AS height,
          |       3 AS channels,
          |       round((doc_id % 256) / 255.0, 6) AS brightness
          |FROM documents""".stripMargin)
    ),

    // audio twin of mm_image_decode: 16-bit PCM WAVs with closed-form
    // rate/channels/frames from doc_id, written with javax.sound.sampled
    // and decoded back through the same per-partition contract; duration
    // is exact integer micros, so DuckDB replays it with // division
    "mm_audio_meta" -> QueryDef(
      build = (s, dir) =>
        Multimodal.decodedWavFeatures(s, Tables.documents(s, dir)),
      oracle = Some(
        """SELECT doc_id AS media_id,
          |       CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
          |       CAST(1 + doc_id % 2 AS INT) AS channels,
          |       CAST(400 + doc_id % 600 AS BIGINT) AS frames,
          |       CAST((400 + doc_id % 600) * 1000000 // (8000 + (doc_id % 4) * 4000) AS BIGINT) AS duration_us
          |FROM documents""".stripMargin)
    ),

    // sample-level audio decode (the feature-extract step beyond
    // mm_audio_meta's header parse): three-phase tone WAVs with
    // closed-form peak/mean|x|/RMS — h = frames/4 at +A, h at −A, rest
    // silence — byte-parsed back sample by sample. Exact-integer Σ|s|
    // and Σs² (far under 2^53), one float division per file, so both
    // engines land identical doubles.
    "mm_audio_features" -> QueryDef(
      build = (s, dir) => graft.QueryDef.round6(
        Multimodal.decodeAudioFeatures(
          Multimodal.syntheticToneWavMedia(Tables.documents(s, dir))).toDF()),
      oracle = Some(
        """SELECT doc_id AS media_id,
          |       CAST(400 + doc_id % 600 AS BIGINT) AS n_samples,
          |       CAST(1000 + (doc_id % 20) * 500 AS INT) AS peak,
          |       round(2.0 * ((400 + doc_id % 600) // 4)
          |             * (1000 + (doc_id % 20) * 500)
          |             / CAST(400 + doc_id % 600 AS DOUBLE), 6) AS mean_abs,
          |       round(sqrt(2.0 * ((400 + doc_id % 600) // 4)
          |                  * (1000 + (doc_id % 20) * 500)
          |                  * (1000 + (doc_id % 20) * 500)
          |                  / CAST(400 + doc_id % 600 AS DOUBLE)), 6) AS rms
          |FROM documents""".stripMargin)
    ),

    // byte-level audio resample: decimate-by-2 the tone clips, re-encode
    // a REAL half-rate WAV, decode it back sample-by-sample. Closed form:
    // evens in [0,2h) number exactly h, so kept = (n+1)//2 samples with
    // Σ|s| = A·h and Σs² = A²·h — exact integers, one division each.
    "mm_audio_resample" -> QueryDef(
      build = (s, dir) => graft.QueryDef.round6(
        Multimodal.decodeAudioFeatures(
          Multimodal.resampleDecimate(
            Multimodal.syntheticToneWavMedia(Tables.documents(s, dir)),
            factor = 2)).toDF()),
      oracle = Some(
        """SELECT doc_id AS media_id,
          |       CAST((400 + doc_id % 600 + 1) // 2 AS BIGINT) AS n_samples,
          |       CAST(1000 + (doc_id % 20) * 500 AS INT) AS peak,
          |       round(CAST((1000 + (doc_id % 20) * 500)
          |                  * ((400 + doc_id % 600) // 4) AS DOUBLE)
          |             / ((400 + doc_id % 600 + 1) // 2), 6) AS mean_abs,
          |       round(sqrt(CAST((1000 + (doc_id % 20) * 500)
          |                       * (1000 + (doc_id % 20) * 500)
          |                       * ((400 + doc_id % 600) // 4) AS DOUBLE)
          |                  / ((400 + doc_id % 600 + 1) // 2)), 6) AS rms
          |FROM documents""".stripMargin)
    ),

    "mm_image_meta" -> QueryDef(
      build = (s, dir) =>
        Multimodal.imageFeatures(s, Tables.documents(s, dir)),
      oracle = Some(
        s"""SELECT doc_id AS media_id,
           |       CAST(64 + (${hexByte(0)} & 127) AS INT) AS width,
           |       CAST(64 + (${hexByte(1)} & 127) AS INT) AS height,
           |       3 AS channels,
           |       round((${hexByte(2)} & 255) / 255.0, 6) AS brightness
           |FROM documents""".stripMargin)
    ),

    // metadata-level resize: fit-to-maxSide with aspect preserved, never
    // upscaling — the planning half of a real resize (pixel work happens in
    // the decode stub's place)
    "mm_resize" -> QueryDef(
      build = (s, dir) => Multimodal.resizeMeta(
          Multimodal.imageFeatures(s, Tables.documents(s, dir)), maxSide = 96)
        .select("media_id", "width", "height", "out_width", "out_height"),
      oracle = Some(
        s"""WITH meta AS (
           |  SELECT doc_id AS media_id,
           |         CAST(64 + (${hexByte(0)} & 127) AS INT) AS width,
           |         CAST(64 + (${hexByte(1)} & 127) AS INT) AS height
           |  FROM documents
           |)
           |SELECT media_id, width, height,
           |       CAST(floor(width * CASE WHEN greatest(width, height) > 96
           |            THEN 96.0 / greatest(width, height) ELSE 1.0 END) AS INT) AS out_width,
           |       CAST(floor(height * CASE WHEN greatest(width, height) > 96
           |            THEN 96.0 / greatest(width, height) ELSE 1.0 END) AS INT) AS out_height
           |FROM meta""".stripMargin)
    ),

    // REAL multi-frame decode: animated GIFs generated per partition
    // (2 + doc_id % 7 solid-gray frames, dims and per-frame gray level
    // closed-form in (doc_id, frame)), round-tripped through the JDK's
    // sequence writer + frame-by-frame reader, every 2nd frame sampled.
    // The oracle recomputes the decoded frame metadata by construction —
    // a hash match proves actual per-frame pixel decode (brightness
    // comes from getRGB over the palette-decoded raster), not plumbing.
    // shot/scene-cut detection — the video-curation segmenter (training
    // clips cut at shot boundaries): inter-frame brightness delta > 0.5
    // marks a cut; per media the frame count, cut count, and mean scene
    // length. The synthetic frames' mod-256 brightness walk wraps once
    // or twice per container, so real cut signal exists at any SF; the
    // oracle replays the identical lag-delta window.
    "mm_scene_cuts" -> QueryDef(
      build = (s, dir) => Multimodal.sceneCuts(
        Multimodal.syntheticGifMedia(Tables.documents(s, dir)),
        threshold = 0.5),
      oracle = Some(
        """WITH meta AS (
          |  SELECT doc_id AS media_id,
          |         CAST(2 + doc_id % 7 AS INT) AS nframes
          |  FROM documents),
          |f AS (
          |  SELECT media_id,
          |         CAST(unnest(range(0, nframes)) AS INT) AS frame_idx,
          |         round(((media_id * 31 + unnest(range(0, nframes)) * 41)
          |                % 256) / 255.0, 6) AS brightness
          |  FROM meta),
          |d AS (
          |  SELECT media_id, brightness,
          |         lag(brightness) OVER (PARTITION BY media_id
          |                               ORDER BY frame_idx) AS prev
          |  FROM f)
          |SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
          |       CAST(sum(CASE WHEN prev IS NOT NULL
          |                      AND abs(brightness - prev) > 0.5
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
          |       round(CAST(count(*) AS DOUBLE)
          |             / CAST(sum(CASE WHEN prev IS NOT NULL
          |                          AND abs(brightness - prev) > 0.5
          |                         THEN 1 ELSE 0 END) + 1 AS DOUBLE), 6)
          |         AS avg_scene_len
          |FROM d GROUP BY media_id""".stripMargin)
    ),

    // the clip manifest the cuts imply — one row per (media, scene)
    // with the frame interval: a clip loader seeks (media_id,
    // start_frame) and reads n_frames with no side state. scene_idx is
    // a per-media window cumsum of the cut flags (partitioned, never
    // global).
    "mm_scene_table" -> QueryDef(
      build = (s, dir) => Multimodal.sceneTable(
        Multimodal.syntheticGifMedia(Tables.documents(s, dir)),
        threshold = 0.5),
      oracle = Some(
        """WITH meta AS (
          |  SELECT doc_id AS media_id,
          |         CAST(2 + doc_id % 7 AS INT) AS nframes
          |  FROM documents),
          |f AS (
          |  SELECT media_id,
          |         CAST(unnest(range(0, nframes)) AS INT) AS frame_idx,
          |         round(((media_id * 31 + unnest(range(0, nframes)) * 41)
          |                % 256) / 255.0, 6) AS brightness
          |  FROM meta),
          |d AS (
          |  SELECT media_id, frame_idx, brightness,
          |         lag(brightness) OVER (PARTITION BY media_id
          |                               ORDER BY frame_idx) AS prev
          |  FROM f),
          |c AS (
          |  SELECT media_id, frame_idx,
          |         CASE WHEN prev IS NOT NULL AND abs(brightness - prev) > 0.5
          |              THEN 1 ELSE 0 END AS cut
          |  FROM d),
          |s AS (
          |  SELECT media_id, frame_idx,
          |         CAST(sum(cut) OVER (PARTITION BY media_id ORDER BY frame_idx
          |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
          |           AS scene_idx
          |  FROM c)
          |SELECT media_id, scene_idx,
          |       CAST(min(frame_idx) AS BIGINT) AS start_frame,
          |       CAST(max(frame_idx) AS BIGINT) AS end_frame,
          |       CAST(count(*) AS BIGINT) AS n_frames
          |FROM s GROUP BY media_id, scene_idx""".stripMargin)
    ),

    // VAD-style activity segmentation on REAL decoded PCM — the trim
    // every ASR/TTS curation pass runs (trailing silence is wasted
    // tokens): 100-sample energy windows, active iff the all-integer
    // sumSq > thr²·window (no float RMS in the decision, so the
    // boundary replays engine-exactly). The tone WAVs' closed-form
    // phase layout (2·(frames/4) active samples, then silence) gives
    // the oracle an exact arithmetic replay including the partial
    // boundary window's A²·k energy test.
    "mm_audio_vad" -> QueryDef(
      build = (s, dir) => Multimodal.audioActivity(
        Multimodal.syntheticToneWavMedia(Tables.documents(s, dir)),
        windowSamples = 100, threshold = 500L).toDF(),
      oracle = Some(
        """WITH p AS (
          |  SELECT doc_id AS media_id,
          |         CAST(400 + doc_id % 600 AS BIGINT) AS f,
          |         CAST(1000 + (doc_id % 20) * 500 AS BIGINT) AS a,
          |         CAST(2 * ((400 + doc_id % 600) // 4) AS BIGINT) AS act
          |  FROM documents),
          |w AS (
          |  SELECT media_id, (f + 99) // 100 AS nw,
          |         act // 100 AS nfull, act % 100 AS k, a
          |  FROM p),
          |r AS (
          |  SELECT media_id, nw,
          |         nfull + CASE WHEN k > 0 AND a * a * k > 25000000
          |                      THEN 1 ELSE 0 END AS na
          |  FROM w)
          |SELECT media_id, CAST(nw AS BIGINT) AS n_windows,
          |       CAST(na AS BIGINT) AS n_active,
          |       CAST(CASE WHEN na > 0 THEN na * 100 ELSE 0 END AS BIGINT)
          |         AS trim_end_sample,
          |       round(1.0 - CAST(na AS DOUBLE) / CAST(nw AS DOUBLE), 6)
          |         AS silence_ratio
          |FROM r""".stripMargin)
    ),

    // the per-(media, segment) interval table the VAD decision implies —
    // what a clip loader consumes (X294's refinement of X293, applied to
    // X295): one row per contiguous same-state window run with its
    // [start_sample, end_sample) interval. The tone WAVs play an active
    // prefix then silence, so the closed-form replay is the active run
    // [0, na·window) (boundary window active iff a²·k beats the integer
    // threshold) and the silent run [na·window, f).
    "mm_audio_segments" -> QueryDef(
      build = (s, dir) => Multimodal.audioSegments(
        Multimodal.syntheticToneWavMedia(Tables.documents(s, dir)),
        windowSamples = 100, threshold = 500L).toDF(),
      oracle = Some(
        """WITH p AS (
          |  SELECT doc_id AS media_id,
          |         CAST(400 + doc_id % 600 AS BIGINT) AS f,
          |         CAST(1000 + (doc_id % 20) * 500 AS BIGINT) AS a,
          |         CAST(2 * ((400 + doc_id % 600) // 4) AS BIGINT) AS act
          |  FROM documents),
          |w AS (
          |  SELECT media_id, f, (f + 99) // 100 AS nw,
          |         act // 100 AS nfull, act % 100 AS k, a
          |  FROM p),
          |r AS (
          |  SELECT media_id, f, nw,
          |         nfull + CASE WHEN k > 0 AND a * a * k > 25000000
          |                      THEN 1 ELSE 0 END AS na
          |  FROM w)
          |SELECT media_id, CAST(0 AS BIGINT) AS segment_idx, TRUE AS active,
          |       CAST(0 AS BIGINT) AS start_sample,
          |       CAST(CASE WHEN na = nw THEN f ELSE na * 100 END AS BIGINT)
          |         AS end_sample,
          |       CAST(na AS BIGINT) AS n_windows
          |FROM r WHERE na > 0
          |UNION ALL
          |SELECT media_id,
          |       CAST(CASE WHEN na > 0 THEN 1 ELSE 0 END AS BIGINT),
          |       FALSE, CAST(na * 100 AS BIGINT), CAST(f AS BIGINT),
          |       CAST(nw - na AS BIGINT)
          |FROM r WHERE na < nw""".stripMargin)
    ),

    "mm_frame_sample" -> QueryDef(
      build = (s, dir) => Multimodal.sampleFrames(
        Multimodal.syntheticGifMedia(Tables.documents(s, dir)), step = 2),
      oracle = Some(
        """WITH meta AS (
          |  SELECT doc_id AS media_id,
          |         CAST(2 + doc_id % 7 AS INT) AS nframes,
          |         CAST(16 + doc_id % 13 AS INT) AS width,
          |         CAST(16 + (doc_id * 5) % 11 AS INT) AS height
          |  FROM documents
          |)
          |SELECT media_id,
          |       CAST(unnest(range(0, nframes, 2)) AS INT) AS frame_idx,
          |       width, height,
          |       round(((media_id * 31 + unnest(range(0, nframes, 2)) * 41)
          |              % 256) / 255.0, 6) AS brightness
          |FROM meta""".stripMargin)
    ),

    // PERCEPTUAL image dedup over real decoded pixels: half-plane-pattern
    // PNGs whose class (doc_id % 8) fixes the look while a per-doc noise
    // pixel makes every payload byte-distinct — exact-byte fingerprinting
    // groups nothing, the 8×8 average-hash must collapse each class to one
    // group. The oracle knows the class partition by construction, so the
    // hash match proves the aHash both merges within-class noise AND
    // separates all 8 slopes. Map-side decode + one hash-agg on the 64-bit
    // phash: the image twin of dedup_exact_groups' fingerprint plan.
    // canonical-representative image dedup — the mm analogue of
    // corpus_canonical, closing the "dedup every modality" story: banded
    // phash candidates → bit_count verify → connected components →
    // mean-luma quality argmax. maxHamming=0 because the synthetic slope
    // classes sit 1 aHash bit apart BY CONSTRUCTION (the banded join still
    // generates those 1-bit cross-class candidates — 3 of 4 bands match —
    // and the verify step rejects them, so candidate generation, verify,
    // and components all do real work). The oracle replays the winner
    // arithmetically: within a class, the doc whose noise pixel landed on
    // a dark pattern pixel gained +128 grid-sum (brighter = best copy),
    // and the noise position is a pure function of doc_id.
    "mm_dedup_canonical" -> QueryDef(
      build = (s, dir) => {
        val media = Multimodal.syntheticPatternPngMedia(
          Tables.documents(s, dir), nClasses = 8)
        Multimodal.phashCanonical(media, maxHamming = 0)
          .orderBy("media_id")
      },
      oracle = Some(
        """WITH q AS (
          |  SELECT doc_id, doc_id % 8 AS cls,
          |         CASE WHEN (doc_id % 8 + 1) * (((doc_id * 13) % 32) // 4)
          |                   - (8 - doc_id % 8) * (((doc_id * 7) % 32) // 4)
          |                   >= ((doc_id % 8 + 1) - (8 - doc_id % 8)) * 4
          |              THEN 1 ELSE 0 END AS noise_on_bright
          |  FROM documents),
          |cl AS (
          |  SELECT doc_id, noise_on_bright,
          |         min(doc_id) OVER (PARTITION BY cls) AS cluster_id
          |  FROM q),
          |ranked AS (
          |  SELECT doc_id, cluster_id,
          |         row_number() OVER (PARTITION BY cluster_id
          |           ORDER BY noise_on_bright, doc_id) AS rn
          |  FROM cl)
          |SELECT c.doc_id AS media_id, c.cluster_id,
          |       r.doc_id AS canonical_id
          |FROM ranked c JOIN ranked r
          |  ON c.cluster_id = r.cluster_id AND r.rn = 1
          |ORDER BY media_id""".stripMargin),
      // headline (r16): the multimodal family's heaviest query — decode +
      // pHash + canonicalize over generated PNGs — gets a driver-side
      // regression guard; the r15 codec fan-out wins were only covered by
      // the oracle, not the bench
      headline = true
    ),

    "mm_phash_dedup" -> QueryDef(
      build = (s, dir) => {
        val media = Multimodal.syntheticPatternPngMedia(
          Tables.documents(s, dir), nClasses = 8)
        Multimodal.imagePerceptualHash(media).toDF()
          .groupBy("phash")
          .agg(min(col("media_id")).as("keep_id"),
            count(lit(1)).as("n_members"))
          .select("keep_id", "n_members")
      },
      oracle = Some(
        """SELECT min(doc_id) AS keep_id, count(*) AS n_members
          |FROM documents GROUP BY doc_id % 8""".stripMargin)
    )
  )
}
