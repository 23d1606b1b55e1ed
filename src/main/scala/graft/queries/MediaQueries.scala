package graft.queries

import graft.operators.media.{AudioMetadataRefiner, AudioQualityRefiner, VideoMetadataRefiner}
import graft.sources.SyntheticMedia
import org.apache.spark.sql.functions._

/** Audio/video metadata + quality gates over the [[SyntheticMedia]]
  * fixture. The VALUES oracles below are written BY HAND from the
  * fixture spec arithmetic (SyntheticMedia's scaladoc) — frames/rate,
  * ticks/timescale, and the closed-form PCM stats of the constant test
  * patterns — so they are independent of the Scala parsers they check
  * (same standard as image_metadata).
  */
object MediaQueries {

  // Audio spec: channels = 1 + id%2, rate = {8000,10000,40000}(id%3),
  // frames = (id+1)*rate/100 → duration = (id+1)/100 exactly. MP3 row:
  // the fixture header encodes rate index 0 (44100) in stereo mode;
  // FLAC row: STREAMINFO literally encodes 22050/1ch/16bps/44100
  // samples → 2.0 s. All hand-derived from the container specs.
  private val audioMetaValues = """  (CAST(0 AS BIGINT), 'WAV', 1, 8000, 16, CAST(80 AS BIGINT), CAST(0.01 AS DOUBLE)),
  (CAST(1 AS BIGINT), 'WAV', 2, 10000, 16, CAST(200 AS BIGINT), CAST(0.02 AS DOUBLE)),
  (CAST(2 AS BIGINT), 'WAV', 1, 40000, 16, CAST(1200 AS BIGINT), CAST(0.03 AS DOUBLE)),
  (CAST(3 AS BIGINT), 'WAV', 2, 8000, 16, CAST(320 AS BIGINT), CAST(0.04 AS DOUBLE)),
  (CAST(4 AS BIGINT), 'WAV', 1, 10000, 16, CAST(500 AS BIGINT), CAST(0.05 AS DOUBLE)),
  (CAST(5 AS BIGINT), 'WAV', 2, 40000, 16, CAST(2400 AS BIGINT), CAST(0.06 AS DOUBLE)),
  (CAST(6 AS BIGINT), 'MP3', 2, 44100, 0, CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE)),
  (CAST(7 AS BIGINT), 'FLAC', 1, 22050, 16, CAST(44100 AS BIGINT), CAST(2.0 AS DOUBLE)),
  (CAST(8 AS BIGINT), 'ERROR', 0, 0, 0, CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE)),
  (CAST(9 AS BIGINT), 'ERROR', 0, 0, 0, CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE))"""

  // Quality patterns are constants, so the PCM stats are closed-form:
  // all-zero → silence; all-32767 → rms 32767/32768 = 0.999969482421875
  // (clipping); all-8192 → rms 8192/32768 = 0.25; ±16384 → rms 0.5;
  // garbage → the refiner's (0,0,0) defaults.
  private val audioQualityValues = """  (CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)),
  (CAST(1 AS BIGINT), CAST(0.999969 AS DOUBLE), CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
  (CAST(2 AS BIGINT), CAST(0.25 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
  (CAST(3 AS BIGINT), CAST(0.5 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
  (CAST(4 AS BIGINT), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE))"""

  // Video spec: timescale = {600,1000,90000}(id%3), durationTicks =
  // timescale*(id+2)/2 → duration = (id+2)/2 exactly, tracks = 1+id%3;
  // garbage/null ids (6, 7) → all-null parse.
  private val videoMetaValues = """  (CAST(0 AS BIGINT), 'MP4', 'isom', CAST(600 AS BIGINT), CAST(1.0 AS DOUBLE), 1),
  (CAST(1 AS BIGINT), 'MP4', 'isom', CAST(1000 AS BIGINT), CAST(1.5 AS DOUBLE), 2),
  (CAST(2 AS BIGINT), 'MP4', 'isom', CAST(90000 AS BIGINT), CAST(2.0 AS DOUBLE), 3),
  (CAST(3 AS BIGINT), 'MP4', 'isom', CAST(600 AS BIGINT), CAST(2.5 AS DOUBLE), 1),
  (CAST(4 AS BIGINT), 'MP4', 'isom', CAST(1000 AS BIGINT), CAST(3.0 AS DOUBLE), 2),
  (CAST(5 AS BIGINT), 'MP4', 'mp42', CAST(600 AS BIGINT), CAST(1.0 AS DOUBLE), 1),
  (CAST(6 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER)),
  (CAST(7 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER))"""

  val queries: Seq[OracleQuery] = Seq(

    OracleQuery("audio_metadata",
      (s, _) => new AudioMetadataRefiner("audio")(SyntheticMedia.audioDf(s))
        .select(col("id"), col("audio_format"), col("audio_channels"),
          col("audio_sample_rate"), col("audio_bits_per_sample"),
          col("audio_n_samples"),
          round(col("audio_duration_sec"), 6).as("audio_duration_sec"))
        .orderBy(col("id")),
      Some(s"""SELECT * FROM (VALUES
              |$audioMetaValues
              |) AS t(id, audio_format, audio_channels, audio_sample_rate,
              |       audio_bits_per_sample, audio_n_samples, audio_duration_sec)
              |ORDER BY id""".stripMargin)),

    OracleQuery("audio_quality",
      (s, _) => new AudioQualityRefiner("audio")(SyntheticMedia.qualityDf(s))
        .select(col("id"), round(col("audio_rms"), 6).as("audio_rms"),
          round(col("audio_clipping_ratio"), 6).as("audio_clipping_ratio"),
          round(col("audio_silence_ratio"), 6).as("audio_silence_ratio"))
        .orderBy(col("id")),
      Some(s"""SELECT * FROM (VALUES
              |$audioQualityValues
              |) AS t(id, audio_rms, audio_clipping_ratio, audio_silence_ratio)
              |ORDER BY id""".stripMargin)),

    OracleQuery("video_metadata",
      (s, _) => new VideoMetadataRefiner("video")(SyntheticMedia.videoDf(s))
        .select(col("id"), col("video_format"), col("video_brand"),
          col("video_timescale"),
          round(col("video_duration_sec"), 6).as("video_duration_sec"),
          col("video_track_count"))
        .orderBy(col("id")),
      Some(s"""SELECT * FROM (VALUES
              |$videoMetaValues
              |) AS t(id, video_format, video_brand, video_timescale,
              |       video_duration_sec, video_track_count)
              |ORDER BY id""".stripMargin)))
}
