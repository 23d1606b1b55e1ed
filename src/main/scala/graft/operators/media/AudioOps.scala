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
        Some(AudioMeta("MP3", 0, 0, 0, 0L, 0.0)) // magic only; decode via SPI
      } else if (bytes.length > 3 && bytes(0) == 'f' && bytes(1) == 'L' &&
          bytes(2) == 'a' && bytes(3) == 'C') {
        Some(AudioMeta("FLAC", 0, 0, 0, 0L, 0.0))
      } else None
    } catch { case _: Throwable => None }
  }

  /** Deterministic synthetic WAV (16-bit PCM square-ish wave) for tests. */
  def synthWav(seed: Long, channels: Int, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * channels * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var s = seed
    (0 until nSamples * channels).foreach { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      out.putShort(((s >>> 48) & 0xFFFF).toShort)
    }
    out.array()
  }

  val metaUdf = udf((bytes: Array[Byte]) =>
    parse(bytes) match {
      case Some(m) => (m.format, m.channels, m.sampleRate, m.bitsPerSample, m.nSamples,
        m.durationSec)
      case None    => ("ERROR", 0, 0, 0, 0L, 0.0)
    })
}

/** Adds `audio_format/_channels/_sample_rate/_bits_per_sample/_n_samples/
  * _duration_sec` from an `audio.bytes` column; parse failure → ERROR row
  * defaults (same total-function contract as the image refiners).
  */
final class AudioMetadataRefiner(audioCol: String = "audio") extends Operator {
  val name = "audio_metadata"
  def apply(df: DataFrame): DataFrame =
    df.withColumn("_am", AudioOps.metaUdf(col(s"$audioCol.bytes")))
      .withColumn("audio_format", col("_am._1"))
      .withColumn("audio_channels", col("_am._2"))
      .withColumn("audio_sample_rate", col("_am._3"))
      .withColumn("audio_bits_per_sample", col("_am._4"))
      .withColumn("audio_n_samples", col("_am._5"))
      .withColumn("audio_duration_sec", col("_am._6"))
      .drop("_am")
}
