package graft.ml

/** Dense MLP forward pass in plain JVM code — the scoring-head math of
  * the reference's embedding-consuming refiners (AestheticMLP is an
  * activation-free linear stack 768→1024→128→64→16→1,
  * image_aesthetic_quality.py:45-68; the AIGC head is
  * Linear+ReLU stacks with a sigmoid output, image_aigc_detector.py /
  * models/image_aigc_detector/trainer.py:180-226). Dropout/BatchNorm are
  * inference-time no-ops and are omitted.
  *
  * Weights are pluggable; [[Mlp.seeded]] builds a deterministic
  * seeded-weight network (the container has no model zoo — real exported
  * weights load through the same structure). Accumulation is
  * left-to-right per neuron (bias first, then inputs ascending), and
  * [[Mlp.forwardSql]] emits a DuckDB expression with the identical term
  * order, so scores are oracle-checkable bit-for-bit (modulo exp()'s
  * last ulp, absorbed by round-6).
  */
final case class MlpLayer(w: Array[Array[Double]], b: Array[Double], activation: String) {
  require(w.length == b.length)
  def outDim: Int = w.length
  def inDim: Int = w(0).length
}

final class Mlp(val layers: Seq[MlpLayer]) extends Serializable {
  require(layers.nonEmpty)
  def inputDim: Int = layers.head.inDim
  def outputDim: Int = layers.last.outDim

  private def act(name: String, v: Double): Double = name match {
    case "identity" => v
    case "relu"     => math.max(0.0, v)
    case "sigmoid"  => 1.0 / (1.0 + math.exp(-v))
    case other      => throw new IllegalArgumentException(s"unknown activation $other")
  }

  def forward(x: Array[Double]): Array[Double] = {
    var cur = x
    layers.foreach { l =>
      val next = new Array[Double](l.outDim)
      var j = 0
      while (j < l.outDim) {
        var acc = l.b(j)
        var i = 0
        while (i < l.inDim) { acc += l.w(j)(i) * cur(i); i += 1 }
        next(j) = act(l.activation, acc)
        j += 1
      }
      cur = next
    }
    cur
  }

  /** Scalar (single-output) forward. */
  def score(x: Array[Double]): Double = forward(x)(0)
}

object Mlp {

  /** Deterministic seeded weights in [-0.5, 0.5); hidden layers get
    * `hiddenActivation`, the last layer `lastActivation`.
    */
  def seeded(dims: Seq[Int], seed: Long,
      hiddenActivation: String = "relu", lastActivation: String = "identity"): Mlp = {
    require(dims.size >= 2)
    val rnd = new scala.util.Random(seed)
    val layers = dims.sliding(2).toSeq.zipWithIndex.map { case (Seq(in, out), idx) =>
      val w = Array.fill(out, in)(rnd.nextDouble() - 0.5)
      val b = Array.fill(out)(rnd.nextDouble() - 0.5)
      val a = if (idx == dims.size - 2) lastActivation else hiddenActivation
      MlpLayer(w, b, a)
    }
    new Mlp(layers)
  }

  private def lit(d: Double): String = s"CAST(${d} AS DOUBLE)"

  private def actSql(name: String, e: String): String = name match {
    case "identity" => e
    case "relu"     => s"greatest(${lit(0.0)}, $e)"
    case "sigmoid"  => s"(${lit(1.0)} / (${lit(1.0)} + exp(-($e))))"
  }

  /** DuckDB expression computing `mlp.score(inputExpr)` with identical
    * term order: neuron = (bias + w1*x1 + w2*x2 + …). The first layer
    * indexes the list column; later layers reference each hidden
    * expression exactly once, so size stays linear in parameter count.
    */
  def forwardSql(mlp: Mlp, inputExpr: String): String = {
    require(mlp.outputDim == 1, "SQL twin covers single-output heads")
    var cur: Seq[String] = (1 to mlp.inputDim).map(i => s"CAST($inputExpr[$i] AS DOUBLE)")
    mlp.layers.foreach { l =>
      cur = (0 until l.outDim).map { j =>
        val terms = (0 until l.inDim).map(i => s"${lit(l.w(j)(i))} * (${cur(i)})")
        actSql(l.activation, s"(${(lit(l.b(j)) +: terms).mkString(" + ")})")
      }
    }
    cur.head
  }
}
