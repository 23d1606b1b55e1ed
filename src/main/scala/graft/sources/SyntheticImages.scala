package graft.sources

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic synthetic image fixture (the image tables the reference
  * generates in its own tests, tests/test_rust_accelerated_ops.py:20-56 —
  * here with a fully integer-specified pixel function so an independent
  * numpy implementation reproduces the pixels exactly; PNG is lossless,
  * so decoded pixels == generated pixels and every pixel-pure metric is
  * cross-checkable without sharing the encoder).
  *
  * Spec (id in 0..59):
  *  - pattern p = id % 4: 0 solid, 1 gradient, 2 checkerboard, 3 LCG noise
  *  - size: w = 48 + (id % 5) * 30, h = 48 + (id % 3) * 56
  *  - solid:    r=(id*37+11)%256, g=(id*59+23)%256, b=(id*83+47)%256
  *  - gradient: v=(x*255)/(w-1);  r=v, g=(v+id*7)%256, b=255-v
  *  - checker:  c1=(id*41)%256, c2=255-c1; r=g=b = if ((x/8+y/8)%2==0) c1 else c2
  *  - noise:    s0=(id*2654435761L)&0xFFFFFFFF; per channel draw in
  *              row-major (y,x,[r,g,b]) order: s=(1103515245*s+12345)&0x7FFFFFFF;
  *              value = s % 256
  *  - id 50..53: exact pixel duplicates of ids 1, 2, 3, 6 (planted dups)
  *  - id 54,55: undecodable garbage bytes ((i*31+id)%256 over 100 bytes)
  *  - id 56,57: null image struct
  *  - id 58,59: JPEG-encoded (checkerboard (58) / noise (59) patterns
  *    per id % 4); everything else PNG
  */
object SyntheticImages {

  val N = 60
  val GarbageIds: Set[Long] = Set(54L, 55L)
  val NullIds: Set[Long] = Set(56L, 57L)
  val JpegIds: Set[Long] = Set(58L, 59L)
  val DupOf: Map[Long, Long] = Map(50L -> 1L, 51L -> 2L, 52L -> 3L, 53L -> 6L)

  def dims(id: Long): (Int, Int) =
    ((48 + (id % 5) * 30).toInt, (48 + (id % 3) * 56).toInt)

  /** Packed 0xRRGGBB pixel array, row-major, for a drawable id. */
  def pixels(id0: Long): (Int, Int, Array[Int]) = {
    val id = DupOf.getOrElse(id0, id0)
    val (w, h) = dims(id)
    val out = new Array[Int](w * h)
    val p = (id % 4).toInt
    var s = (id * 2654435761L) & 0xFFFFFFFFL
    @inline def draw(): Int = {
      s = (1103515245L * s + 12345L) & 0x7FFFFFFFL
      (s % 256).toInt
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = p match {
          case 0 => (((id * 37 + 11) % 256).toInt, ((id * 59 + 23) % 256).toInt, ((id * 83 + 47) % 256).toInt)
          case 1 =>
            val v = (x * 255) / (w - 1)
            (v, ((v + id * 7) % 256).toInt, 255 - v)
          case 2 =>
            val c1 = ((id * 41) % 256).toInt
            val c = if ((x / 8 + y / 8) % 2 == 0) c1 else 255 - c1
            (c, c, c)
          case _ => (draw(), draw(), draw())
        }
        out(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    (w, h, out)
  }

  def encode(id: Long): Array[Byte] = {
    if (GarbageIds(id)) return Array.tabulate(100)(i => ((i * 31 + id) % 256).toByte)
    val (w, h, px) = pixels(id)
    encodeAs(w, h, px, if (JpegIds(id)) "jpg" else "png")
  }

  /** Perturbed near-duplicate of a drawable id: every `step`-th pixel
    * nudged +`delta` per channel (clamped) — visually identical; phash
    * hamming lands in the 2–8 band on fixture content (measured), below
    * the ≥ 10 cross-image floor.
    */
  def perturbed(id: Long, step: Int, delta: Int): Array[Byte] = {
    val (w, h, px) = pixels(id)
    val p2 = px.zipWithIndex.map { case (p, i) =>
      if (i % step == 0) {
        val r = math.min(((p >> 16) & 0xFF) + delta, 255)
        val g = math.min(((p >> 8) & 0xFF) + delta, 255)
        val b = math.min((p & 0xFF) + delta, 255)
        (r << 16) | (g << 8) | b
      } else p
    }
    encodeAs(w, h, p2, "png")
  }

  /** Encode arbitrary packed-RGB pixels (test helper for perturbations). */
  def encodeAs(w: Int, h: Int, px: Array[Int], format: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, format, baos)
    baos.toByteArray
  }

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("image", StructType(Seq(
      StructField("bytes", BinaryType, nullable = true))), nullable = true)))

  /** The fixture table: (id, image{bytes}) — HF image-record shape. */
  def df(spark: SparkSession): DataFrame = {
    val rows = (0L until N).map { id =>
      if (NullIds(id)) Row(id, null)
      else Row(id, Row(encode(id)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }
}
