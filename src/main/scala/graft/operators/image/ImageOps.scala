package graft.operators.image

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** CPU image kernels: decode, metadata, technical quality (blockiness /
  * compression / Shannon entropy), and a DCT perceptual hash.
  *
  * Ports the semantics of the reference's accelerated image kernels
  * (reference: src/image_ops.rs:13-146 — the canonical batch
  * implementation its Python operators delegate to): integer (r+g+b)/3
  * gray, u16/u32 integer accumulation with the same truncating divisions,
  * 8-px block boundaries capped at 64 samples per axis, per-channel
  * 256-bin Shannon entropy averaged over RGB, decode failure → zero
  * scores, never throws (image_metadata.py:49-53 total-function contract).
  *
  * The perceptual hash is OUR canonical algorithm (classic DCT phash:
  * gray → 64×64 box resize → DCT-II → 16×16 low-frequency block > median
  * → 256-bit hex). The reference's primary alg is the `image_hasher`
  * crate's DoubleGradient (image_ops.rs:152-156) whose bit layout is
  * crate-internal; SURVEY.md §7.4 records the decision to declare ours
  * canonical and parity-test self-consistency + dedup behavior instead
  * (its Python fallback is the same DCT construction we implement).
  *
  * Everything here is a plain JVM function wrapped in a UDF — decode cost
  * dominates, so expression codegen buys nothing; the operators keep image
  * bytes out of downstream stages (column pruning) which is the actual
  * 100 TB concern (SURVEY.md §7.2 M4).
  */
object ImageOps {

  final case class Decoded(width: Int, height: Int, format: String, rgb: Array[Int])

  /** Total decode: None for null/garbage/truncated input. `rgb` is
    * row-major packed 0xRRGGBB.
    */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.isEmpty) return None
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val format = reader.getFormatName.toUpperCase match {
          case "JPG" => "JPEG"
          case f     => f
        }
        val img = reader.read(0)
        val w = img.getWidth
        val h = img.getHeight
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        while (i < rgb.length) { rgb(i) = rgb(i) & 0xFFFFFF; i += 1 }
        Some(Decoded(w, h, format, rgb))
      } finally reader.dispose()
    } catch {
      case _: Throwable => None
    } finally {
      if (iis != null) try iis.close() catch { case _: Throwable => () }
    }
  }

  @inline private def gray(p: Int): Int =
    (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3

  /** Blockiness of the 8-px JPEG block grid — exact integer semantics of
    * detect_compression_artifacts_from_rgb (image_ops.rs:51-108): u16 gray
    * thirds, per-boundary `sum / width` truncating division, ≤64 sampled
    * boundaries per axis, mean of the two axis means / 255.
    */
  def blockiness(d: Decoded): Double = {
    val blockSize = 8
    val maxSamples = 64
    val w = d.width; val h = d.height
    val hBlocks = math.min(math.max(h - 1, 0) / blockSize, maxSamples)
    val wBlocks = math.min(math.max(w - 1, 0) / blockSize, maxSamples)
    var vSum = 0L; var vCount = 0
    var i = 0
    while (i < hBlocks) {
      val y = i * blockSize
      if (y + 1 < h) {
        var sum = 0L
        var x = 0
        while (x < w) {
          val g1 = gray(d.rgb(y * w + x))
          val g2 = gray(d.rgb((y + 1) * w + x))
          sum += math.abs(g1 - g2)
          x += 1
        }
        vSum += sum / w
        vCount += 1
      }
      i += 1
    }
    var hSum = 0L; var hCount = 0
    var j = 0
    while (j < wBlocks) {
      val x = j * blockSize
      if (x + 1 < w) {
        var sum = 0L
        var y = 0
        while (y < h) {
          val g1 = gray(d.rgb(y * w + x))
          val g2 = gray(d.rgb(y * w + x + 1))
          sum += math.abs(g1 - g2)
          y += 1
        }
        hSum += sum / h
        hCount += 1
      }
      j += 1
    }
    if (vCount > 0 && hCount > 0) {
      val vAvg = vSum.toDouble / vCount / 255.0
      val hAvg = hSum.toDouble / hCount / 255.0
      (vAvg + hAvg) / 2.0
    } else 0.0
  }

  /** `clamp(blockiness*0.6 + (1 - min(1, bytes/(3wh) * 2))*0.4, 0, 1)` —
    * image_ops.rs:110-122. */
  def compressionArtifacts(d: Decoded, byteLen: Int): Double = {
    val uncompressed = d.width.toLong * d.height * 3
    val ratio = if (uncompressed > 0) byteLen.toDouble / uncompressed else 1.0
    val compressionScore = 1.0 - math.min(1.0, ratio * 2.0)
    val artifact = blockiness(d) * 0.6 + compressionScore * 0.4
    math.min(1.0, math.max(0.0, artifact))
  }

  /** Mean per-channel Shannon entropy over 256-bin histograms —
    * calculate_entropy_from_rgb (image_ops.rs:13-48), ascending-bin
    * accumulation order so doubles match the numpy twin bit-for-bit.
    */
  def entropy(d: Decoded): Double = {
    val r = new Array[Long](256); val g = new Array[Long](256); val b = new Array[Long](256)
    var i = 0
    while (i < d.rgb.length) {
      val p = d.rgb(i)
      r((p >> 16) & 0xFF) += 1
      g((p >> 8) & 0xFF) += 1
      b(p & 0xFF) += 1
      i += 1
    }
    val total = d.rgb.length
    if (total == 0) return 0.0
    val invTotal = 1.0 / total
    def channel(counts: Array[Long]): Double = {
      var e = 0.0
      var k = 0
      while (k < 256) {
        val c = counts(k)
        if (c > 0) {
          val p = c * invTotal
          e -= p * (math.log(p) / math.log(2.0))
        }
        k += 1
      }
      e
    }
    (channel(r) + channel(g) + channel(b)) / 3.0
  }

  // ---- perceptual hash (canonical DCT construction) ----

  private val PhashResize = 64
  private val PhashBits = 16 // 16×16 low-freq block → 256-bit hash

  private lazy val dctCos: Array[Array[Double]] = {
    val n = PhashResize
    Array.tabulate(n, n)((u, x) => math.cos(math.Pi * (2 * x + 1) * u / (2.0 * n)))
  }

  /** 256-bit DCT phash as a 64-char hex string; None for undecodable input. */
  def phash(bytes: Array[Byte]): Option[String] = decode(bytes).map(phashOf)

  def phashOf(d: Decoded): String = {
    val n = PhashResize
    // integer gray, box-resize to n×n (mean over the source box, double)
    val small = new Array[Double](n * n)
    var by = 0
    while (by < n) {
      val y0 = by * d.height / n
      val y1 = math.max((by + 1) * d.height / n, y0 + 1)
      var bx = 0
      while (bx < n) {
        val x0 = bx * d.width / n
        val x1 = math.max((bx + 1) * d.width / n, x0 + 1)
        var sum = 0L; var cnt = 0
        var y = y0
        while (y < math.min(y1, d.height)) {
          var x = x0
          while (x < math.min(x1, d.width)) {
            sum += gray(d.rgb(y * d.width + x)); cnt += 1
            x += 1
          }
          y += 1
        }
        small(by * n + bx) = if (cnt > 0) sum.toDouble / cnt else 0.0
        bx += 1
      }
      by += 1
    }
    // separable DCT-II, rows then columns, only the low PhashBits outputs
    val rows = new Array[Double](n * PhashBits) // rows[y][v]
    var y = 0
    while (y < n) {
      var v = 0
      while (v < PhashBits) {
        var acc = 0.0
        var x = 0
        while (x < n) { acc += small(y * n + x) * dctCos(v)(x); x += 1 }
        rows(y * PhashBits + v) = acc
        v += 1
      }
      y += 1
    }
    val freq = new Array[Double](PhashBits * PhashBits) // freq[u][v]
    var u = 0
    while (u < PhashBits) {
      var v = 0
      while (v < PhashBits) {
        var acc = 0.0
        var yy = 0
        while (yy < n) { acc += rows(yy * PhashBits + v) * dctCos(u)(yy); yy += 1 }
        freq(u * PhashBits + v) = acc
        v += 1
      }
      u += 1
    }
    val sorted = freq.sorted
    val median = (sorted(freq.length / 2 - 1) + sorted(freq.length / 2)) / 2.0
    val sb = new StringBuilder(PhashBits * PhashBits / 4)
    var nibble = 0; var bitsIn = 0
    var k = 0
    while (k < freq.length) {
      nibble = (nibble << 1) | (if (freq(k) > median) 1 else 0)
      bitsIn += 1
      if (bitsIn == 4) { sb.append("0123456789abcdef".charAt(nibble)); nibble = 0; bitsIn = 0 }
      k += 1
    }
    sb.toString
  }

  /** Double-gradient hash — the reference's PRIMARY phash algorithm
    * class (image_hasher DoubleGradient, src/image_ops.rs:149-174):
    * horizontal dHash over a 9×8 gray resize plus vertical dHash over
    * 8×9, 64+64 = 128 bits as a 32-hex-char string. Same algorithm
    * FAMILY as the crate; exact bit parity with its output is out of
    * scope because the crate's resize interpolation differs from our
    * deterministic integer box resize (documented deviation, SURVEY
    * §7.4 — use one system's hashes consistently).
    */
  def doubleGradientHash(bytes: Array[Byte]): Option[String] =
    decode(bytes).map { d =>
      def grayResize(ow: Int, oh: Int): Array[Int] = {
        val r = boxResize(d, ow, oh)
        r.rgb.map(gray)
      }
      val sb = new StringBuilder(32)
      var nibble = 0; var bitsIn = 0
      @inline def push(bit: Boolean): Unit = {
        nibble = (nibble << 1) | (if (bit) 1 else 0)
        bitsIn += 1
        if (bitsIn == 4) { sb.append("0123456789abcdef".charAt(nibble)); nibble = 0; bitsIn = 0 }
      }
      val hz = grayResize(9, 8) // horizontal gradients: 8 bits per row
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) { push(hz(y * 9 + x) < hz(y * 9 + x + 1)); x += 1 }
        y += 1
      }
      val vt = grayResize(8, 9) // vertical gradients: 8 bits per column
      var x = 0
      while (x < 8) {
        var yy = 0
        while (yy < 8) { push(vt(yy * 8 + x) < vt((yy + 1) * 8 + x)); yy += 1 }
        x += 1
      }
      sb.toString
    }

  /** RGB box resize (per-channel mean over the source box — the color
    * version of the phash gray resize; deterministic integer boxes).
    */
  def boxResize(d: Decoded, ow: Int, oh: Int): Decoded = {
    val out = new Array[Int](ow * oh)
    var by = 0
    while (by < oh) {
      val y0 = by * d.height / oh
      val y1 = math.max((by + 1) * d.height / oh, y0 + 1)
      var bx = 0
      while (bx < ow) {
        val x0 = bx * d.width / ow
        val x1 = math.max((bx + 1) * d.width / ow, x0 + 1)
        var r = 0L; var g = 0L; var b = 0L; var cnt = 0
        var y = y0
        while (y < math.min(y1, d.height)) {
          var x = x0
          while (x < math.min(x1, d.width)) {
            val p = d.rgb(y * d.width + x)
            r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
            cnt += 1
            x += 1
          }
          y += 1
        }
        out(by * ow + bx) =
          if (cnt == 0) 0
          else (((r / cnt).toInt << 16) | ((g / cnt).toInt << 8) | (b / cnt).toInt)
        bx += 1
      }
      by += 1
    }
    Decoded(ow, oh, "PNG", out)
  }

  /** Resize to (w, h) and re-encode as PNG; undecodable input → null. */
  def resizeUdf(w: Int, h: Int) = udf((bytes: Array[Byte]) =>
    decode(bytes).map { d =>
      val r = boxResize(d, w, h)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, r.rgb, 0, w)
      val baos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", baos)
      baos.toByteArray
    }.orNull)

  def hamming(hexA: String, hexB: String): Int =
    hexA.zip(hexB).map { case (a, b) =>
      java.lang.Integer.bitCount(Integer.parseInt(a.toString, 16) ^ Integer.parseInt(b.toString, 16))
    }.sum

  // ---- UDF surface ----

  /** (width, height, format) or (0, 0, "ERROR") — file size is handled
    * natively with octet_length, no UDF needed. */
  val metadataUdf = udf((bytes: Array[Byte]) =>
    decode(bytes) match {
      case Some(d) => (d.width, d.height, d.format)
      case None    => (0, 0, "ERROR")
    })

  /** (compression_artifacts, information_entropy); failure → (0.0, 0.0). */
  val qualityUdf = udf((bytes: Array[Byte]) =>
    decode(bytes) match {
      case Some(d) => (compressionArtifacts(d, bytes.length), entropy(d))
      case None    => (0.0, 0.0)
    })

  /** Blockiness alone (pixel-pure — no dependence on encoded size). */
  val blockinessUdf = udf((bytes: Array[Byte]) =>
    decode(bytes).map(blockiness).getOrElse(0.0))

  /** Hex phash or null for undecodable input (callers fall back to id). */
  val phashUdf = udf((bytes: Array[Byte]) => phash(bytes).orNull)

  /** Hex double-gradient hash or null for undecodable input. */
  val doubleGradientUdf = udf((bytes: Array[Byte]) => doubleGradientHash(bytes).orNull)
}
