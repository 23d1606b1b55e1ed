package graft

import graft.operators.image.ImageOps
import graft.sources.SyntheticImages

/** Single-thread microprofile of the phash pipeline stages — builder
  * tool for the decode/DCT optimization work (Test/runMain
  * graft.PhashProfile). Not part of the suite.
  */
object PhashProfile {
  def main(args: Array[String]): Unit = {
    val ids = (0L until 60L).filter(i =>
      !SyntheticImages.NullIds(i) && !SyntheticImages.GarbageIds(i))
    val bytes = ids.map(SyntheticImages.encode).toArray
    val decoded = bytes.flatMap(ImageOps.decode)

    def time(label: String, reps: Int)(f: => Unit): Unit = {
      f // warmup
      f
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      val per = sec / (reps * bytes.length)
      println(f"$label%-22s ${sec}%7.3f s  ${per * 1e6}%8.1f us/img  ${1 / per}%9.0f img/s/core")
    }

    time("decode", 20)(bytes.foreach(ImageOps.decode))
    time("phashOf(decoded)", 20)(decoded.foreach(ImageOps.phashOf))
    time("full phash", 20)(bytes.foreach(ImageOps.phash))
  }
}
