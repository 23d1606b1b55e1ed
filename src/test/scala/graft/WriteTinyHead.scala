package graft

import java.nio.file.{Files, Paths}

/** Generates `src/main/resources/graft/tiny_head.onnx` — a REAL
  * serialized graph in the shape modern exporters emit: torch-style
  * Gemm(transB, bias) layers, LayerNormalization, a composed exact
  * GELU (Div → Erf → Add → Mul → Mul), and a Softmax head:
  *
  *   x(256) → Gemm(w1 16×256ᵀ, b1) → LayerNorm(s, lb, ε=1e-5)
  *          → gelu: h/√2 → Erf → +1 → ×h → ×0.5
  *          → Gemm(w2 12×16ᵀ, b2) → Softmax → y(12)
  *
  * Weights are seeded (Random(2026)). The independent numpy twin
  * (tools/gen_embed_oracle.py) parses this file with its own protobuf
  * walker and recomputes the `image_gelu_head_embed` oracle VALUES.
  * Run with `sbt "Test/runMain graft.WriteTinyHead"`; commit the output.
  */
object WriteTinyHead {
  import OnnxTestModel._

  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(2026L)
    def mat(r: Int, c: Int) = Array.fill(r * c)((rnd.nextFloat() - 0.5f) * 0.6f)
    def vec(n: Int) = Array.fill(n)((rnd.nextFloat() - 0.5f) * 0.2f)

    val inDim = 256; val hidden = 16; val outDim = 12
    val g = new W
    g.msg(1, node("Gemm", Seq("x", "w1", "b1"), Seq("h0"),
      fAttrs = Seq("alpha" -> 1.0f, "beta" -> 1.0f), iAttrs = Seq("transB" -> 1L)))
    g.msg(1, node("LayerNormalization", Seq("h0", "s", "lb"), Seq("h1"),
      fAttrs = Seq("epsilon" -> 1e-5f), iAttrs = Seq("axis" -> -1L)))
    g.msg(1, node("Div", Seq("h1", "sqrt2"), Seq("d")))
    g.msg(1, node("Erf", Seq("d"), Seq("e")))
    g.msg(1, node("Add", Seq("e", "ones"), Seq("a")))
    g.msg(1, node("Mul", Seq("a", "h1"), Seq("m")))
    g.msg(1, node("Mul", Seq("m", "halves"), Seq("gl")))
    g.msg(1, node("Gemm", Seq("gl", "w2", "b2"), Seq("z"),
      iAttrs = Seq("transB" -> 1L)))
    g.msg(1, node("Softmax", Seq("z"), Seq("y"), iAttrs = Seq("axis" -> -1L)))
    g.msg(5, tensor("w1", Seq(hidden, inDim), mat(hidden, inDim), raw = true))
    g.msg(5, tensor("b1", Seq(hidden), vec(hidden), raw = false))
    g.msg(5, tensor("s", Seq(hidden), Array.fill(hidden)(1f + (rnd.nextFloat() - 0.5f) * 0.4f), raw = false))
    g.msg(5, tensor("lb", Seq(hidden), vec(hidden), raw = false))
    g.msg(5, tensor("sqrt2", Seq(1, hidden), Array.fill(hidden)(math.sqrt(2.0).toFloat), raw = false))
    g.msg(5, tensor("ones", Seq(1, hidden), Array.fill(hidden)(1f), raw = false))
    g.msg(5, tensor("halves", Seq(1, hidden), Array.fill(hidden)(0.5f), raw = false))
    g.msg(5, tensor("w2", Seq(outDim, hidden), mat(outDim, hidden), raw = true))
    g.msg(5, tensor("b2", Seq(outDim), vec(outDim), raw = false))
    g.str(2, "graft_tiny_head")
    g.msg(11, valueInfo("x")); g.msg(12, valueInfo("y"))
    val model = new W
    model.tag(1, 0).varint(8)
    model.msg(7, g)
    val out = Paths.get("src", "main", "resources", "graft", "tiny_head.onnx")
    Files.createDirectories(out.getParent)
    Files.write(out, model.result)
    println(s"wrote ${Files.size(out)} bytes to $out")
  }
}
