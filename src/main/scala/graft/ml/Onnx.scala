package graft.ml

import graft.operators.image.{ImageEncoder, ImageOps}

/** Minimal ONNX model loader + interpreter for MLP-class graphs —
  * enough to run a real exported encoder head behind the
  * [[graft.operators.image.ImageEncoder]] SPI with ZERO added
  * dependencies (this environment ships no onnxruntime; the ONNX wire
  * format is protobuf, whose encoding and the onnx.proto field numbers
  * are public spec).
  *
  * Supported ops: MatMul (2-D), Gemm (alpha/beta/transB — the form
  * torch exports nn.Linear as), Add/Sub/Mul/Div (row-broadcast or
  * same-shape), Relu, Sigmoid, Tanh, Erf, Exp, Sqrt, Neg, Softmax
  * (last axis), LayerNormalization (last axis), Identity. Initializers
  * may carry weights in `float_data` or little-endian `raw_data`;
  * numeric node attributes (f/i) are parsed. Graphs are evaluated in
  * node order (ONNX requires topological order). Anything outside this
  * subset fails loudly at load — a real onnxruntime-backed encoder
  * ([[OnnxRuntimeEncoder]]) plugs in behind the same [[ImageEncoder]]
  * trait when available.
  */
object Onnx {

  // ---- protobuf wire-format reader (varint / 64-bit / length-delimited / 32-bit) ----

  final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        val b = buf(pos); pos += 1
        acc |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
      }
      acc
    }
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    def bytes(): Array[Byte] = {
      val len = varint().toInt
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + len); pos += len; out
    }
    def sub(): Reader = { val len = varint().toInt; val r = new Reader(buf, pos, pos + len); pos += len; r }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val len = varint().toInt; pos += len // varint() moves pos: evaluate first
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
    def fixed32(): Int = {
      val v = (buf(pos) & 0xFF) | ((buf(pos + 1) & 0xFF) << 8) |
        ((buf(pos + 2) & 0xFF) << 16) | ((buf(pos + 3) & 0xFF) << 24)
      pos += 4; v
    }
  }

  final case class Tensor(dims: Seq[Int], data: Array[Float])
  final case class Node(opType: String, inputs: Seq[String], outputs: Seq[String],
      attrs: Map[String, Double] = Map.empty)
  final case class Graph(
      nodes: Seq[Node], initializers: Map[String, Tensor],
      inputName: String, outputName: String)

  // onnx.proto field numbers (public schema):
  // ModelProto.graph = 7; GraphProto.node = 1, .initializer = 5,
  // .input = 11, .output = 12; NodeProto.input = 1, .output = 2,
  // .op_type = 4; TensorProto.dims = 1, .data_type = 2, .float_data = 4,
  // .name = 8, .raw_data = 9; ValueInfoProto.name = 1.

  def parse(model: Array[Byte]): Graph =
    try parse0(model)
    catch {
      case e: IllegalArgumentException => throw e
      case e @ (_: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException |
                _: java.nio.BufferUnderflowException) =>
        // truncated or non-protobuf input walks off the buffer — surface
        // one clear configuration error instead of a raw index crash
        throw new IllegalArgumentException(
          s"malformed ONNX model (${model.length} bytes): ${e.getClass.getSimpleName}", e)
    }

  private def parse0(model: Array[Byte]): Graph = {
    var graph: Reader = null
    val top = new Reader(model, 0, model.length)
    while (top.hasMore) {
      val (f, w) = top.tag()
      if (f == 7 && w == 2) graph = top.sub() else top.skip(w)
    }
    require(graph != null, "ModelProto has no graph")

    val nodes = Seq.newBuilder[Node]
    val inits = Map.newBuilder[String, Tensor]
    var inputName = ""
    var outputName = ""

    def parseValueInfoName(r: Reader): String = {
      var n = ""
      while (r.hasMore) {
        val (f, w) = r.tag()
        if (f == 1 && w == 2) n = new String(r.bytes(), "UTF-8") else r.skip(w)
      }
      n
    }

    // AttributeProto: name = 1, f = 2 (fixed32 float), i = 3 (varint int64)
    def parseAttr(r: Reader): Option[(String, Double)] = {
      var name = ""; var value: Option[Double] = None
      while (r.hasMore) {
        val (f, w) = r.tag()
        (f, w) match {
          case (1, 2) => name = new String(r.bytes(), "UTF-8")
          case (2, 5) => value = Some(java.lang.Float.intBitsToFloat(r.fixed32()).toDouble)
          case (3, 0) => value = Some(r.varint().toDouble)
          case _      => r.skip(w)
        }
      }
      value.filter(_ => name.nonEmpty).map(name -> _)
    }

    def parseNode(r: Reader): Node = {
      val ins = Seq.newBuilder[String]; val outs = Seq.newBuilder[String]; var op = ""
      val attrs = Map.newBuilder[String, Double]
      while (r.hasMore) {
        val (f, w) = r.tag()
        (f, w) match {
          case (1, 2) => ins += new String(r.bytes(), "UTF-8")
          case (2, 2) => outs += new String(r.bytes(), "UTF-8")
          case (4, 2) => op = new String(r.bytes(), "UTF-8")
          case (5, 2) => parseAttr(r.sub()).foreach(attrs += _)
          case _      => r.skip(w)
        }
      }
      Node(op, ins.result(), outs.result(), attrs.result())
    }

    def parseTensor(r: Reader): (String, Tensor) = {
      val dims = Seq.newBuilder[Int]
      val floats = Seq.newBuilder[Float]
      var raw: Array[Byte] = null
      var name = ""
      var dtype = 1L
      while (r.hasMore) {
        val (f, w) = r.tag()
        (f, w) match {
          case (1, 0) => dims += r.varint().toInt
          case (1, 2) => val s = r.sub(); while (s.hasMore) dims += s.varint().toInt // packed
          case (2, 0) => dtype = r.varint()
          case (4, 5) => floats += java.lang.Float.intBitsToFloat(r.fixed32())
          case (4, 2) => val s = r.sub(); while (s.hasMore) floats += java.lang.Float.intBitsToFloat(s.fixed32()) // packed
          case (8, 2) => name = new String(r.bytes(), "UTF-8")
          case (9, 2) => raw = r.bytes()
          case _      => r.skip(w)
        }
      }
      require(dtype == 1L, s"initializer $name: only FLOAT tensors supported, got data_type=$dtype")
      val data =
        if (raw != null) {
          val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          Array.fill(raw.length / 4)(bb.getFloat())
        } else floats.result().toArray
      (name, Tensor(dims.result(), data))
    }

    while (graph.hasMore) {
      val (f, w) = graph.tag()
      (f, w) match {
        case (1, 2)  => nodes += parseNode(graph.sub())
        case (5, 2)  => inits += parseTensor(graph.sub())
        case (11, 2) => val n = parseValueInfoName(graph.sub()); if (inputName.isEmpty) inputName = n
        case (12, 2) => outputName = parseValueInfoName(graph.sub())
        case _       => graph.skip(w)
      }
    }
    val g = Graph(nodes.result(), inits.result(), inputName, outputName)
    // the graph input may also be listed among initializers' names in
    // some exporters; the first input NOT an initializer is the feed
    val feed = (g.nodes.flatMap(_.inputs).distinct.filterNot(g.initializers.contains)
      .filterNot(n => g.nodes.exists(_.outputs.contains(n))))
    Graph(g.nodes, g.initializers,
      if (g.inputName.nonEmpty && !g.initializers.contains(g.inputName)) g.inputName
      else feed.headOption.getOrElse(g.inputName),
      g.outputName)
  }

  /** A loaded, runnable MLP-class session. */
  final class Session(val graph: Graph) extends Serializable {
    private val supported = Set("MatMul", "Gemm", "Add", "Sub", "Mul", "Div",
      "Relu", "Sigmoid", "Tanh", "Erf", "Exp", "Sqrt", "Neg",
      "Softmax", "LayerNormalization", "Identity")
    graph.nodes.foreach(n => require(supported(n.opType),
      s"unsupported op ${n.opType} (supported: ${supported.mkString(", ")})"))

    /** Output width of the final weighted layer (for dim checks) —
      * a Gemm with transB carries its weight as (out × in), so the
      * output width is dims.head there, dims.last everywhere else.
      */
    lazy val outputDim: Int = {
      graph.nodes.reverseIterator.flatMap { n =>
        n.inputs.flatMap(graph.initializers.get).headOption.map { t =>
          if (n.opType == "Gemm" && n.attrs.getOrElse("transB", 0.0) != 0.0 && t.dims.size == 2)
            t.dims.head
          else t.dims.last
        }
      }.next()
    }

    /** Evaluate one batch: (B × inDim) → (B × outDim), row-major. */
    def run(batch: Array[Array[Float]]): Array[Array[Float]] = {
      if (batch.isEmpty) return Array.empty
      var env = Map[String, Array[Array[Float]]](graph.inputName -> batch)
      def resolve(name: String): Array[Array[Float]] =
        env.getOrElse(name, graph.initializers.get(name) match {
          case Some(t) if t.dims.size == 2 => t.data.grouped(t.dims(1)).toArray
          case Some(t)                     => Array(t.data)
          case None => throw new IllegalArgumentException(s"unbound tensor $name")
        })
      def matmul(a: Array[Array[Float]], b: Array[Array[Float]], alpha: Float): Array[Array[Float]] = {
        val k = b.length; val m = b.head.length
        a.map { row =>
          require(row.length == k, s"MatMul dim mismatch: ${row.length} vs $k")
          val o = new Array[Float](m)
          var j = 0
          while (j < m) {
            var acc = 0.0f; var i = 0
            while (i < k) { acc += row(i) * b(i)(j); i += 1 }
            o(j) = alpha * acc; j += 1
          }
          o
        }
      }
      // same-shape or row-broadcast (1×m) elementwise combine
      def elementwise(a: Array[Array[Float]], b: Array[Array[Float]],
          f: (Float, Float) => Float): Array[Array[Float]] =
        if (b.length == 1) a.map(row => row.indices.map(i => f(row(i), b(0)(i))).toArray)
        else a.zip(b).map { case (x, y) => x.indices.map(i => f(x(i), y(i))).toArray }
      // Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 ≈ 1 float32 ulp)
      def erf(x: Double): Double = {
        val s = if (x < 0) -1.0 else 1.0
        val t = 1.0 / (1.0 + 0.3275911 * math.abs(x))
        val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
          - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
        s * y
      }
      graph.nodes.foreach { n =>
        val out = n.opType match {
          case "MatMul" =>
            matmul(resolve(n.inputs.head), resolve(n.inputs(1)), 1.0f)
          case "Gemm" =>
            // Y = alpha·A·B(ᵀ) + beta·C — torch's nn.Linear export shape
            // (transB = 1, C = bias). transA unsupported: A is the batch.
            require(n.attrs.getOrElse("transA", 0.0) == 0.0, "Gemm transA unsupported")
            val alpha = n.attrs.getOrElse("alpha", 1.0).toFloat
            val beta = n.attrs.getOrElse("beta", 1.0).toFloat
            val b0 = resolve(n.inputs(1))
            val b = if (n.attrs.getOrElse("transB", 0.0) != 0.0) {
              Array.tabulate(b0.head.length, b0.length)((i, j) => b0(j)(i))
            } else b0
            val ab = matmul(resolve(n.inputs.head), b, alpha)
            if (n.inputs.size > 2 && n.inputs(2).nonEmpty)
              elementwise(ab, resolve(n.inputs(2)), (x, c) => x + beta * c)
            else ab
          case "Add" => elementwise(resolve(n.inputs.head), resolve(n.inputs(1)), _ + _)
          case "Sub" => elementwise(resolve(n.inputs.head), resolve(n.inputs(1)), _ - _)
          case "Mul" => elementwise(resolve(n.inputs.head), resolve(n.inputs(1)), _ * _)
          case "Div" => elementwise(resolve(n.inputs.head), resolve(n.inputs(1)), _ / _)
          case "Relu" => resolve(n.inputs.head).map(_.map(v => if (v > 0f) v else 0f))
          case "Sigmoid" => resolve(n.inputs.head).map(_.map(v => (1.0 / (1.0 + math.exp(-v))).toFloat))
          case "Tanh" => resolve(n.inputs.head).map(_.map(v => math.tanh(v).toFloat))
          case "Erf" => resolve(n.inputs.head).map(_.map(v => erf(v).toFloat))
          case "Exp" => resolve(n.inputs.head).map(_.map(v => math.exp(v).toFloat))
          case "Sqrt" => resolve(n.inputs.head).map(_.map(v => math.sqrt(v).toFloat))
          case "Neg" => resolve(n.inputs.head).map(_.map(v => -v))
          case "Softmax" =>
            // 2-D row vectors: only the last axis makes sense here
            val axis = n.attrs.getOrElse("axis", -1.0)
            require(axis == -1.0 || axis == 1.0, s"Softmax axis $axis unsupported (last only)")
            resolve(n.inputs.head).map { row =>
              val mx = row.max
              val exps = row.map(v => math.exp((v - mx).toDouble))
              val sum = exps.sum
              exps.map(e => (e / sum).toFloat)
            }
          case "LayerNormalization" =>
            // last-axis normalization: (x − mean)/sqrt(var + eps)·scale + bias
            val axis = n.attrs.getOrElse("axis", -1.0)
            require(axis == -1.0 || axis == 1.0, s"LayerNormalization axis $axis unsupported (last only)")
            val eps = n.attrs.getOrElse("epsilon", 1e-5)
            val scale = resolve(n.inputs(1)).head
            val bias = if (n.inputs.size > 2 && n.inputs(2).nonEmpty)
              Some(resolve(n.inputs(2)).head) else None
            resolve(n.inputs.head).map { row =>
              val m = row.foldLeft(0.0)(_ + _) / row.length
              val va = row.foldLeft(0.0)((a, x) => a + (x - m) * (x - m)) / row.length
              val inv = 1.0 / math.sqrt(va + eps)
              Array.tabulate(row.length) { i =>
                val v = (row(i) - m) * inv * scale(i)
                (bias.map(b => v + b(i)).getOrElse(v)).toFloat
              }
            }
          case "Identity" => resolve(n.inputs.head)
        }
        env += n.outputs.head -> out
      }
      env(if (graph.outputName.nonEmpty) graph.outputName else graph.nodes.last.outputs.head)
    }
  }

  def load(model: Array[Byte]): Session = new Session(parse(model))
}

/** R4/R5 encoder running a REAL serialized ONNX graph behind the SPI:
  * decode → deterministic gray box-resize to `side×side` → [0,1]
  * normalize → flatten → session batch → `dim` floats per image.
  * Undecodable input yields the zero vector (refiner contract). The
  * model bytes ride the closure (broadcast by Spark's task serializer);
  * the session parses once per executor (lazy val).
  */
final class OnnxImageEncoder(
    val modelName: String,
    modelBytes: Array[Byte],
    side: Int = 16) extends ImageEncoder {

  @transient private lazy val session = Onnx.load(modelBytes)

  lazy val dim: Int = Onnx.load(modelBytes).outputDim

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
    val out = if (feed.isEmpty) Array.empty[Array[Float]] else session.run(feed)
    var i = 0
    pre.map {
      case Some(_) => val v = out(i); i += 1; v
      case None    => new Array[Float](dim)
    }
  }
}
