package graft.operators.media

import graft.core.Operator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio as an opaque binary column with typed metadata — the multimodal
  * pattern of the engine (image family: graft.operators.image). WAV/RIFF
  * headers are parsed for real (canonical PCM layout); compressed codecs
  * (mp3/flac) are detected by magic number only, with decode left to a
  * pluggable backend exactly like the image encoder SPI — the decoder
  * libraries don't ship in this environment.
  */
object AudioOps {

  final case class AudioMeta(
      format: String, channels: Int, sampleRate: Int,
      bitsPerSample: Int, nSamples: Long, durationSec: Double)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  /** Total parse: None for null/garbage/truncated input. */
  def parse(bytes: Array[Byte]): Option[AudioMeta] = {
    if (bytes == null || bytes.length < 4) return None
    try {
      if (bytes.length >= 12 &&
          bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
          bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') {
        // walk RIFF chunks for fmt + data
        var pos = 12
        var channels = 0; var rate = 0; var bps = 0; var dataLen = -1L
        while (pos + 8 <= bytes.length && (channels == 0 || dataLen < 0)) {
          val id = new String(bytes, pos, 4, "US-ASCII")
          val len = le32(bytes, pos + 4)
          if (id == "fmt " && pos + 24 <= bytes.length) {
            channels = le16(bytes, pos + 10)
            rate = le32(bytes, pos + 12).toInt
            bps = le16(bytes, pos + 22)
          } else if (id == "data") dataLen = len
          pos += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
        }
        if (channels <= 0 || rate <= 0 || bps <= 0 || dataLen < 0) None
        else {
          val nSamples = dataLen / (channels * bps / 8)
          Some(AudioMeta("WAV", channels, rate, bps, nSamples, nSamples.toDouble / rate))
        }
      } else if (bytes.length > 3 &&
          ((bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') ||
            ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xE0) == 0xE0))) {
        // real MPEG frame-header parse (public spec): skip an ID3v2 tag
        // (syncsafe 28-bit size at bytes 6-9), find the first frame
        // sync, read samplerate/channel-mode from the header. Sample
        // counts need a full frame walk (decode SPI); zeros there.
        Some(parseMp3Header(bytes).getOrElse(AudioMeta("MP3", 0, 0, 0, 0L, 0.0)))
      } else if (bytes.length > 3 && bytes(0) == 'f' && bytes(1) == 'L' &&
          bytes(2) == 'a' && bytes(3) == 'C') {
        // real STREAMINFO parse (public spec): rate (20 bits), channels
        // (3 bits + 1), bits/sample (5 bits + 1), total samples (36 bits)
        Some(parseFlacStreamInfo(bytes).getOrElse(AudioMeta("FLAC", 0, 0, 0, 0L, 0.0)))
      } else None
    } catch { case _: Throwable => None }
  }

  // MPEG-1 Layer III tables (public spec)
  private val Mp3SampleRates = Array(44100, 48000, 32000)

  private def parseMp3Header(bytes: Array[Byte]): Option[AudioMeta] = {
    var pos = 0
    if (bytes.length > 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      // ID3v2 size: 4 syncsafe bytes (7 bits each) at offset 6
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      pos = 10 + size
    }
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xFF) == 0xFF && (bytes(pos + 1) & 0xE0) == 0xE0) {
        val version = (bytes(pos + 1) >> 3) & 0x3 // 3 = MPEG-1
        val layer = (bytes(pos + 1) >> 1) & 0x3   // 1 = Layer III
        val srIdx = (bytes(pos + 2) >> 2) & 0x3
        val mode = (bytes(pos + 3) >> 6) & 0x3    // 3 = mono
        if (version == 3 && layer == 1 && srIdx < 3) {
          val channels = if (mode == 3) 1 else 2
          return Some(AudioMeta("MP3", channels, Mp3SampleRates(srIdx), 0, 0L, 0.0))
        }
        return None // sync found but not a supported MPEG-1 L3 header
      }
      pos += 1
    }
    None
  }

  private def parseFlacStreamInfo(bytes: Array[Byte]): Option[AudioMeta] = {
    // metadata block header at 4: 1 byte (last-bit | type), 3-byte length;
    // STREAMINFO (type 0) payload: 10 bytes of block/frame sizes, then
    // rate/channels/bps/totals packed into the next 8 bytes
    if (bytes.length < 8 + 34) return None
    if ((bytes(4) & 0x7F) != 0) return None
    val len = ((bytes(5) & 0xFF) << 16) | ((bytes(6) & 0xFF) << 8) | (bytes(7) & 0xFF)
    if (len < 34) return None
    val p = 8 + 10
    val rate = ((bytes(p) & 0xFF) << 12) | ((bytes(p + 1) & 0xFF) << 4) |
      ((bytes(p + 2) & 0xFF) >> 4)
    val channels = ((bytes(p + 2) >> 1) & 0x7) + 1
    val bps = (((bytes(p + 2) & 0x1) << 4) | ((bytes(p + 3) & 0xFF) >> 4)) + 1
    val total = ((bytes(p + 3) & 0xFL) << 32) |
      ((bytes(p + 4) & 0xFFL) << 24) | ((bytes(p + 5) & 0xFFL) << 16) |
      ((bytes(p + 6) & 0xFFL) << 8) | (bytes(p + 7) & 0xFFL)
    if (rate <= 0) return None
    Some(AudioMeta("FLAC", channels, rate, bps, total, total.toDouble / rate))
  }

  /** Minimal valid MP3: 10-byte empty ID3v2 tag + one MPEG-1 Layer III
    * frame header (sampleRate from the spec table, stereo/mono mode).
    */
  def synthMp3(sampleRate: Int, mono: Boolean): Array[Byte] = {
    val srIdx = Mp3SampleRates.indexOf(sampleRate)
    require(srIdx >= 0, s"unsupported mp3 rate $sampleRate")
    val h1 = 0xFB // MPEG-1, Layer III, no CRC
    val h2 = (9 << 4) | (srIdx << 2) // bitrate idx 9 (128k), srIdx, no pad
    val h3 = if (mono) 0xC0 else 0x00
    "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 0, 0, 0) ++
      Array(0xFF.toByte, h1.toByte, h2.toByte, h3.toByte) ++ new Array[Byte](16)
  }

  /** Minimal valid FLAC: magic + last-block STREAMINFO with the given
    * stream parameters (zeros for the block/frame-size fields and md5).
    */
  def synthFlac(sampleRate: Int, channels: Int, bps: Int, totalSamples: Long): Array[Byte] = {
    val info = new Array[Byte](34)
    info(10) = ((sampleRate >> 12) & 0xFF).toByte
    info(11) = ((sampleRate >> 4) & 0xFF).toByte
    info(12) = (((sampleRate & 0xF) << 4) | (((channels - 1) & 0x7) << 1) |
      (((bps - 1) >> 4) & 0x1)).toByte
    info(13) = ((((bps - 1) & 0xF) << 4) | ((totalSamples >> 32) & 0xF)).toInt.toByte
    info(14) = ((totalSamples >> 24) & 0xFF).toByte
    info(15) = ((totalSamples >> 16) & 0xFF).toByte
    info(16) = ((totalSamples >> 8) & 0xFF).toByte
    info(17) = (totalSamples & 0xFF).toByte
    "fLaC".getBytes("US-ASCII") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++ info
  }

  /** Deterministic synthetic WAV (16-bit PCM, seeded LCG samples). */
  def synthWav(seed: Long, channels: Int, sampleRate: Int, nSamples: Int): Array[Byte] = {
    var s = seed
    synthWavSamples(channels, sampleRate, Array.fill(nSamples * channels) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 48) & 0xFFFF).toShort
    })
  }

  /** WAV container around caller-supplied 16-bit PCM samples. */
  def synthWavSamples(channels: Int, sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  final case class PcmStats(rms: Double, clippingRatio: Double, silenceRatio: Double)

  /** Content metrics over real 16-bit PCM: normalized RMS level, fraction
    * of near-full-scale samples (clipping), fraction of near-zero samples
    * (silence) — the standard cheap audio-quality signals for training-
    * data filtering. None for non-WAV or malformed input.
    */
  def pcmStats(bytes: Array[Byte]): Option[PcmStats] =
    parse(bytes).filter(m => m.format == "WAV" && m.bitsPerSample == 16).flatMap { m =>
      try {
        // locate the data chunk again and walk the samples
        var pos = 12
        var dataPos = -1; var dataLen = 0
        while (pos + 8 <= bytes.length && dataPos < 0) {
          val id = new String(bytes, pos, 4, "US-ASCII")
          val len = le32(bytes, pos + 4).toInt
          if (id == "data") { dataPos = pos + 8; dataLen = math.min(len, bytes.length - dataPos) }
          pos += 8 + len + (len & 1)
        }
        if (dataPos < 0) return None
        val n = dataLen / 2
        if (n == 0) return Some(PcmStats(0.0, 0.0, 1.0))
        var sumSq = 0.0
        var clipped = 0L; var silent = 0L
        var i = 0
        while (i < n) {
          val v = (le16(bytes, dataPos + i * 2).toShort).toInt
          val x = v / 32768.0
          sumSq += x * x
          if (math.abs(v) >= 32700) clipped += 1
          if (math.abs(v) < 328) silent += 1
          i += 1
        }
        Some(PcmStats(math.sqrt(sumSq / n), clipped.toDouble / n, silent.toDouble / n))
      } catch { case _: Throwable => None }
    }

  val pcmStatsUdf = udf((bytes: Array[Byte]) =>
    pcmStats(bytes) match {
      case Some(s) => (s.rms, s.clippingRatio, s.silenceRatio)
      case None    => (0.0, 0.0, 0.0)
    })

  val metaUdf = udf((bytes: Array[Byte]) =>
    parse(bytes) match {
      case Some(m) => (m.format, m.channels, m.sampleRate, m.bitsPerSample, m.nSamples,
        m.durationSec)
      case None    => ("ERROR", 0, 0, 0, 0L, 0.0)
    })
}

/** Adds `audio_rms`, `audio_clipping_ratio`, `audio_silence_ratio` from
  * real PCM decode of WAV payloads; non-decodable input → zeros (total).
  */
final class AudioQualityRefiner(audioCol: String = "audio") extends Operator {
  val name = "audio_quality"

  def apply(df: DataFrame): DataFrame = build(df, lit(true))

  /** Disposition mode: the full-payload PCM walk is the expensive part —
    * rows already rejected upstream skip it (CaseWhen short-circuits).
    */
  override def applyGated(df: DataFrame, alive: org.apache.spark.sql.Column): DataFrame =
    build(df, alive)

  private def build(df: DataFrame, alive: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("_aq", when(alive, AudioOps.pcmStatsUdf(col(s"$audioCol.bytes"))))
      .withColumn("audio_rms", col("_aq._1"))
      .withColumn("audio_clipping_ratio", col("_aq._2"))
      .withColumn("audio_silence_ratio", col("_aq._3"))
      .drop("_aq")
}

/** Adds `audio_format/_channels/_sample_rate/_bits_per_sample/_n_samples/
  * _duration_sec` from an `audio.bytes` column; parse failure → ERROR row
  * defaults (same total-function contract as the image refiners).
  */
final class AudioMetadataRefiner(audioCol: String = "audio") extends Operator {
  val name = "audio_metadata"

  def apply(df: DataFrame): DataFrame = build(df, lit(true))

  override def applyGated(df: DataFrame, alive: org.apache.spark.sql.Column): DataFrame =
    build(df, alive)

  private def build(df: DataFrame, alive: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("_am", when(alive, AudioOps.metaUdf(col(s"$audioCol.bytes"))))
      .withColumn("audio_format", col("_am._1"))
      .withColumn("audio_channels", col("_am._2"))
      .withColumn("audio_sample_rate", col("_am._3"))
      .withColumn("audio_bits_per_sample", col("_am._4"))
      .withColumn("audio_n_samples", col("_am._5"))
      .withColumn("audio_duration_sec", col("_am._6"))
      .drop("_am")
}
