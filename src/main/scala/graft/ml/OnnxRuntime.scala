package graft.ml

import graft.operators.image.{ImageEncoder, ImageOps}

/** Optional onnxruntime bridge behind the same [[ImageEncoder]] SPI as
  * the pure-Scala interpreter — the path to running REAL vision towers
  * (Conv/attention graphs the MLP interpreter refuses) when the
  * onnxruntime-java jar is on the classpath. Everything is
  * reflection-loaded so this build keeps ZERO added dependencies
  * (the reference runs its towers in-process the same way,
  * image_clip_embedding.py:20-169 — model residency per worker; here
  * the session is a per-executor lazy val).
  *
  * Selection contract ([[ImageEncoders.onnx]]): runtime present →
  * [[OnnxRuntimeEncoder]]; absent → [[OnnxImageEncoder]] (interpreter).
  * Constructing the runtime encoder without the jar fails loudly at
  * first use, naming the missing class — never silently wrong.
  */
object ImageEncoders {

  /** True when ai.onnxruntime is on the classpath. */
  def runtimeAvailable: Boolean =
    try { Class.forName("ai.onnxruntime.OrtEnvironment"); true }
    catch { case _: ClassNotFoundException => false }

  /** Best available ONNX execution for `modelBytes`: the onnxruntime
    * session when its jar ships, else the pure-Scala interpreter.
    * `dim` is required for the runtime path (the zero-vector width for
    * failed decodes); the interpreter derives it from the graph.
    */
  def onnx(modelName: String, modelBytes: Array[Byte], side: Int = 16,
      dim: Int = 0): ImageEncoder =
    if (runtimeAvailable) new OnnxRuntimeEncoder(modelName, modelBytes, side, dim)
    else new OnnxImageEncoder(modelName, modelBytes, side)
}

/** onnxruntime-backed encoder, fully reflective: decode → gray
  * box-resize to side×side → [0,1] float32 → OrtSession batch run.
  * The preprocessing is identical to [[OnnxImageEncoder]] so the two
  * backends are drop-in interchangeable on MLP-class graphs.
  *
  * @param dim embedding width (used for the zero vector on decode
  *            failure; must match the model's output width)
  */
final class OnnxRuntimeEncoder(
    val modelName: String,
    modelBytes: Array[Byte],
    side: Int = 16,
    val dim: Int = 0) extends ImageEncoder {

  require(dim > 0,
    "OnnxRuntimeEncoder needs the model's output dim (zero-vector width)")

  // All runtime classes resolve lazily per executor; a missing jar
  // surfaces as one clear error at first batch, not a linkage crash.
  @transient private lazy val session: AnyRef = {
    val envCls =
      try Class.forName("ai.onnxruntime.OrtEnvironment")
      catch {
        case _: ClassNotFoundException => throw new IllegalStateException(
          "onnxruntime not on the classpath (ai.onnxruntime.OrtEnvironment); " +
            "add the onnxruntime-java jar or use the interpreter via ImageEncoders.onnx")
      }
    val env = envCls.getMethod("getEnvironment").invoke(null)
    envCls.getMethod("createSession", classOf[Array[Byte]])
      .invoke(env, modelBytes)
  }

  @transient private lazy val inputName: String = {
    val names = session.getClass.getMethod("getInputNames").invoke(session)
      .asInstanceOf[java.util.Set[String]]
    names.iterator().next()
  }

  private def preprocess(bytes: Array[Byte]): Option[Array[Float]] =
    ImageOps.decode(bytes).map { d =>
      val r = ImageOps.boxResize(d, side, side)
      r.rgb.map { p =>
        val gray = (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
        gray / 255.0f
      }
    }

  def encodeBatch(images: Seq[Array[Byte]]): Seq[Array[Float]] = {
    val pre = images.map(b => if (b == null || b.isEmpty) None else preprocess(b))
    val feed = pre.flatten.toArray
    val out: Array[Array[Float]] =
      if (feed.isEmpty) Array.empty
      else {
        val sess = session // resolve FIRST: carries the guarded classpath check
        val envCls = Class.forName("ai.onnxruntime.OrtEnvironment")
        val env = envCls.getMethod("getEnvironment").invoke(null)
        val tensorCls = Class.forName("ai.onnxruntime.OnnxTensor")
        val tensor = tensorCls
          .getMethod("createTensor", envCls, classOf[Object])
          .invoke(null, env, feed)
        try {
          val result = sess.getClass
            .getMethod("run", classOf[java.util.Map[String, _]])
            .invoke(sess, java.util.Collections.singletonMap(inputName, tensor))
          try {
            val first = result.getClass.getMethod("get", classOf[Int])
              .invoke(result, Integer.valueOf(0))
            first.getClass.getMethod("getValue").invoke(first)
              .asInstanceOf[Array[Array[Float]]]
          } finally result.getClass.getMethod("close").invoke(result)
        } finally tensor.getClass.getMethod("close").invoke(tensor)
      }
    var i = 0
    pre.map {
      case Some(_) => val v = out(i); i += 1; v
      case None    => new Array[Float](dim)
    }
  }
}
