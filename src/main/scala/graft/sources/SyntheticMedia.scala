package graft.sources

import graft.operators.media.AudioOps
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic synthetic audio/video fixture — the multimodal twin of
  * [[SyntheticImages]] (the reference generates its media fixtures in
  * its own tests the same way). Every header field is integer-specified
  * below, so the metadata the parsers recover is derivable BY HAND from
  * this spec — the audio/video oracle VALUES in
  * [[graft.queries.MediaQueries]] are written from the spec arithmetic,
  * not from running the parsers.
  *
  * Audio spec (id 0..9), container = WAV 16-bit PCM unless noted:
  *  - id 0..5: channels = 1 + id % 2, sampleRate = {8000, 10000, 40000}(id % 3),
  *    frames = (id + 1) * sampleRate / 100  → duration = (id + 1)/100 s exactly
  *    (sample content: seeded LCG noise, irrelevant to metadata)
  *  - id 6: minimal MP3 (empty ID3v2 tag + MPEG-1 Layer III frame
  *    header: 44100 Hz stereo) — frame-header fields parsed for real
  *  - id 7: minimal FLAC (STREAMINFO: 22050 Hz, 1 ch, 16 bps,
  *    44100 samples → 2.0 s) — STREAMINFO parsed for real
  *  - id 8: garbage bytes ((i*17 + 3) % 256 over 64 bytes) → ERROR row
  *  - id 9: null audio struct → ERROR row
  *
  * Audio-quality spec (id 0..4), 1000 frames mono at 8000 Hz:
  *  - id 0: all zeros            → rms 0,            clip 0, silence 1
  *  - id 1: all 32767            → rms 32767/32768,  clip 1, silence 0
  *  - id 2: all 8192             → rms 0.25,         clip 0, silence 0
  *  - id 3: alternating ±16384   → rms 0.5,          clip 0, silence 0
  *  - id 4: garbage bytes        → (0, 0, 0) defaults
  *
  * Video spec (id 0..7), container = ISO-BMFF (ftyp + moov/mvhd + trak):
  *  - id 0..4: mvhd version = id % 2, timescale = {600, 1000, 90000}(id % 3),
  *    durationTicks = timescale * (id + 2) / 2 → duration = (id + 2)/2 s
  *    exactly, tracks = 1 + id % 3, brand "isom"
  *  - id 5: brand "mp42", v0, timescale 600, 1.0 s, 1 track
  *  - id 6: garbage bytes ((i*13 + 5) % 256 over 64 bytes) → null row
  *  - id 7: null video struct → null row
  */
object SyntheticMedia {

  // ---- audio ----

  val AudioN = 10

  def audioRates(id: Long): Int = Seq(8000, 10000, 40000)((id % 3).toInt)

  def audioBytes(id: Long): Array[Byte] = id match {
    case i if i <= 5 =>
      val rate = audioRates(i)
      AudioOps.synthWav(seed = i * 31 + 7, channels = 1 + (i % 2).toInt,
        sampleRate = rate, nSamples = ((i + 1) * rate / 100).toInt)
    case 6 => AudioOps.synthMp3(sampleRate = 44100, mono = false)
    case 7 => AudioOps.synthFlac(sampleRate = 22050, channels = 1, bps = 16,
      totalSamples = 44100L)
    case 8 => Array.tabulate(64)(i => ((i * 17 + 3) % 256).toByte)
    case _ => null
  }

  def qualityBytes(id: Long): Array[Byte] = id match {
    case 0 => AudioOps.synthWavSamples(1, 8000, Array.fill[Short](1000)(0))
    case 1 => AudioOps.synthWavSamples(1, 8000, Array.fill[Short](1000)(32767))
    case 2 => AudioOps.synthWavSamples(1, 8000, Array.fill[Short](1000)(8192))
    case 3 => AudioOps.synthWavSamples(1, 8000,
      Array.tabulate[Short](1000)(i => if (i % 2 == 0) 16384 else -16384))
    case _ => Array.tabulate(64)(i => ((i * 17 + 3) % 256).toByte)
  }

  val audioSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("audio", StructType(Seq(
      StructField("bytes", BinaryType, nullable = true))), nullable = true)))

  def audioDf(spark: SparkSession): DataFrame = {
    val rows = (0L until AudioN).map { id =>
      val b = audioBytes(id)
      if (b == null) Row(id, null) else Row(id, Row(b))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), audioSchema)
  }

  def qualityDf(spark: SparkSession): DataFrame = {
    val rows = (0L until 5L).map(id => Row(id, Row(qualityBytes(id))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), audioSchema)
  }

  // ---- video ----

  val VideoN = 8

  private def be32b(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xFF).toByte, ((v >>> 16) & 0xFF).toByte,
    ((v >>> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be64b(v: Long): Array[Byte] = be32b(v >>> 32) ++ be32b(v & 0xFFFFFFFFL)

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32b(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload

  /** Minimal ISO-BMFF file: ftyp(brand) + moov(mvhd + tracks × trak). */
  def synthMp4(brand: String, version: Int, timescale: Long, durationTicks: Long,
      tracks: Int): Array[Byte] = {
    val mvhdPayload =
      if (version == 1)
        Array[Byte](1, 0, 0, 0) ++ be64b(0) ++ be64b(0) ++
          be32b(timescale) ++ be64b(durationTicks)
      else
        Array[Byte](0, 0, 0, 0) ++ be32b(0) ++ be32b(0) ++
          be32b(timescale) ++ be32b(durationTicks)
    val moov = box("moov",
      box("mvhd", mvhdPayload) ++
        (0 until tracks).map(_ => box("trak", Array.empty[Byte]))
          .foldLeft(Array.empty[Byte])(_ ++ _))
    box("ftyp", brand.getBytes("US-ASCII") ++ be32b(0)) ++ moov
  }

  def videoTimescale(id: Long): Long = Seq(600L, 1000L, 90000L)((id % 3).toInt)

  def videoBytes(id: Long): Array[Byte] = id match {
    case i if i <= 4 =>
      val ts = videoTimescale(i)
      synthMp4("isom", (i % 2).toInt, ts, ts * (i + 2) / 2, 1 + (i % 3).toInt)
    case 5 => synthMp4("mp42", 0, 600, 600, 1)
    case 6 => Array.tabulate(64)(i => ((i * 13 + 5) % 256).toByte)
    case _ => null
  }

  val videoSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("video", StructType(Seq(
      StructField("bytes", BinaryType, nullable = true))), nullable = true)))

  def videoDf(spark: SparkSession): DataFrame = {
    val rows = (0L until VideoN).map { id =>
      val b = videoBytes(id)
      if (b == null) Row(id, null) else Row(id, Row(b))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), videoSchema)
  }
}
