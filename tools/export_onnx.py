#!/usr/bin/env python3
"""Export reference-format model checkpoints to SPI-loadable ONNX.

The engine's image-inference operators load any .onnx file through the
ImageEncoder SPI (`model_path`/`model_resource` params): onnxruntime via
the reflection bridge when its jar is on the classpath, the built-in
pure-JVM interpreter otherwise (graft/ml/Onnx.scala — MLP-class ops:
Gemm/MatMul, elementwise, Relu/Sigmoid/Tanh/Erf, Softmax, LayerNorm).
This script converts the reference's checkpoint formats into that file.

Modes
-----
quality   Convert a MultiHeadQualityAssessmentModel checkpoint
          (reference mega_data_factory: models/image_quality_assessment/
          trainer.py:203-311, the Z-Image degradation scorer;
          checkpoints/multihead_quality_model.pth) into ONE degradation
          head as ONNX: channel-attention gate (Linear 256->64 -> ReLU ->
          Linear 64->256 -> Sigmoid -> Mul) followed by the head stack
          (Linear 256->256 -> ReLU -> Linear 256->128 -> ReLU ->
          Linear 128->1 -> Sigmoid; Dropout is an inference no-op).
          Input is the backbone's pooled 256-dim feature vector. Every
          emitted op sits inside the pure-JVM interpreter's subset, so
          the exported head runs WITHOUT onnxruntime. The reference's
          "overall" score is the weighted sum of the four heads
          (trainer.py degradation_weights [0.2, 0.3, 0.25, 0.25]) —
          export each head and combine downstream. Requires torch (to
          read the .pth) only.

clip      Export a CLIP vision tower (the reference's
          ImageClipEmbeddingRefiner backbone, operators/refiners/
          image_clip_embedding.py) with torch.onnx.export via open_clip.
          Conv/attention ops land OUTSIDE the interpreter subset: the
          Spark side then needs the onnxruntime jar on the executor
          classpath (the reflection bridge picks it up automatically).
          Requires torch + open_clip_torch.

siglip    Same, for a SigLIP tower via transformers (the reference's
          ImageSigLIPEmbeddingRefiner). Requires torch + transformers.

tiny-head Dependency-free smoke path (pure stdlib): emits the EXACT
          quality-head architecture above with seeded tiny weights, so
          the export format is testable in environments without torch.
          RunnerSpec drives this mode end-to-end through `model_path`.

Examples
--------
  python3 tools/export_onnx.py quality \
      --checkpoint checkpoints/multihead_quality_model.pth \
      --head blurriness --out blurriness_head.onnx
  python3 tools/export_onnx.py clip --model ViT-L-14 --pretrained openai \
      --out clip_vision.onnx
  python3 tools/export_onnx.py tiny-head --in-dim 256 --hidden 16 \
      --out-dim 12 --seed 7 --out /tmp/tiny.onnx
"""
import argparse
import random
import struct
import sys

# ---------------- protobuf wire-format writer (pure stdlib) ----------------
# onnx.proto field numbers (public schema): ModelProto.ir_version = 1,
# .graph = 7, .opset_import = 8 (OperatorSetIdProto.domain = 1,
# .version = 2); GraphProto.node = 1, .name = 2, .initializer = 5,
# .input = 11, .output = 12; ValueInfoProto.name = 1, .type = 2;
# TypeProto.tensor_type = 1 (Tensor.elem_type = 1, .shape = 2;
# TensorShapeProto.dim = 1, Dimension.dim_value = 1, .dim_param = 3);
# NodeProto.input = 1, .output = 2,
# .op_type = 4, .attribute = 5; AttributeProto.name = 1, .f = 2, .i = 3,
# .type = 20 (FLOAT=1, INT=2); TensorProto.dims = 1, .data_type = 2
# (FLOAT=1), .float_data = 4 (packed), .name = 8, .raw_data = 9.


class W:
    def __init__(self):
        self.buf = bytearray()

    def varint(self, v):
        while v & ~0x7F:
            self.buf.append((v & 0x7F) | 0x80)
            v >>= 7
        self.buf.append(v)
        return self

    def tag(self, field, wire):
        return self.varint((field << 3) | wire)

    def bytes_(self, field, b):
        self.tag(field, 2).varint(len(b))
        self.buf += b
        return self

    def str_(self, field, s):
        return self.bytes_(field, s.encode("utf-8"))

    def msg(self, field, m):
        return self.bytes_(field, bytes(m.buf))


def tensor(name, dims, data):
    w = W()
    for d in dims:
        w.tag(1, 0).varint(d)
    w.tag(2, 0).varint(1)  # data_type = FLOAT
    w.bytes_(9, struct.pack(f"<{len(data)}f", *data))  # raw_data
    w.str_(8, name)
    return w


def node(op, ins, outs, f_attrs=(), i_attrs=()):
    w = W()
    for i in ins:
        w.str_(1, i)
    for o in outs:
        w.str_(2, o)
    w.str_(4, op)
    for n, v in f_attrs:
        a = W().str_(1, n)
        a.tag(2, 5)
        a.buf += struct.pack("<f", v)
        a.tag(20, 0).varint(1)
        w.msg(5, a)
    for n, v in i_attrs:
        w.msg(5, W().str_(1, n).tag(3, 0).varint(v).tag(20, 0).varint(2))
    return w


def value_info(name, dims):
    """ValueInfoProto with a full tensor TypeProto — onnxruntime rejects
    graph inputs/outputs without elem_type+shape at session creation, so
    typed ValueInfos are required for the runtime-bridge deployments (the
    pure-JVM interpreter only reads the name and skips the rest).
    dims entries: int -> dim_value, str -> dim_param (symbolic batch)."""
    shape = W()
    for d in dims:
        if isinstance(d, str):
            shape.msg(1, W().str_(3, d))   # Dimension.dim_param = 3
        else:
            shape.msg(1, W().tag(1, 0).varint(d))  # Dimension.dim_value = 1
    tt = W()
    tt.tag(1, 0).varint(1)  # Tensor.elem_type = FLOAT
    tt.msg(2, shape)        # Tensor.shape
    return W().str_(1, name).msg(2, W().msg(1, tt))  # type.tensor_type


def model_bytes(graph_name, nodes, initializers, in_name, in_dims, out_name, out_dims):
    g = W()
    for n in nodes:
        g.msg(1, n)
    g.str_(2, graph_name)
    for t in initializers:
        g.msg(5, t)
    g.msg(11, value_info(in_name, in_dims))
    g.msg(12, value_info(out_name, out_dims))
    m = W()
    m.tag(1, 0).varint(8)  # ir_version
    # opset_import {domain: "" (default), version: 13} — mandatory per the
    # ONNX spec; onnxruntime refuses models without it
    m.msg(8, W().tag(2, 0).varint(13))
    m.msg(7, g)
    return bytes(m.buf)


# ------------- the quality model's attention + head as a graph -------------


def head_graph(name, aw1, ab1, aw2, ab2, w1, b1, w2, b2, w3, b3):
    """Channel attention gate then one prediction head. Weight matrices
    are torch nn.Linear layout [out, in]; Gemm(transB=1) consumes that
    directly, matching how torch.onnx exports Linear."""
    gemm = lambda i, w, b, o: node(
        "Gemm", [i, w, b], [o],
        f_attrs=[("alpha", 1.0), ("beta", 1.0)], i_attrs=[("transB", 1)])
    nodes = [
        gemm("x", "aw1", "ab1", "a0"),
        node("Relu", ["a0"], ["a1"]),
        gemm("a1", "aw2", "ab2", "a2"),
        node("Sigmoid", ["a2"], ["gate"]),
        node("Mul", ["x", "gate"], ["f"]),
        gemm("f", "w1", "b1", "h0"),
        node("Relu", ["h0"], ["h1"]),
        gemm("h1", "w2", "b2", "h2"),
        node("Relu", ["h2"], ["h3"]),
        gemm("h3", "w3", "b3", "z"),
        node("Sigmoid", ["z"], ["y"]),
    ]
    inits = [
        tensor("aw1", [len(aw1), len(aw1[0])], [v for r in aw1 for v in r]),
        tensor("ab1", [len(ab1)], ab1),
        tensor("aw2", [len(aw2), len(aw2[0])], [v for r in aw2 for v in r]),
        tensor("ab2", [len(ab2)], ab2),
        tensor("w1", [len(w1), len(w1[0])], [v for r in w1 for v in r]),
        tensor("b1", [len(b1)], b1),
        tensor("w2", [len(w2), len(w2[0])], [v for r in w2 for v in r]),
        tensor("b2", [len(b2)], b2),
        tensor("w3", [len(w3), len(w3[0])], [v for r in w3 for v in r]),
        tensor("b3", [len(b3)], b3),
    ]
    return model_bytes(name, nodes, inits,
                       "x", ["N", len(aw1[0])], "y", ["N", len(b3)])


def cmd_tiny_head(args):
    rnd = random.Random(args.seed)
    mat = lambda r, c: [[(rnd.random() - 0.5) * 0.6 for _ in range(c)] for _ in range(r)]
    vec = lambda n: [(rnd.random() - 0.5) * 0.2 for _ in range(n)]
    d, h, o = args.in_dim, args.hidden, args.out_dim
    att = d // 4 if d >= 4 else 1
    blob = head_graph(
        "graft_exported_head",
        mat(att, d), vec(att), mat(d, att), vec(d),       # attention gate
        mat(h, d), vec(h), mat(h // 2, h), vec(h // 2),   # head hidden stack
        mat(o, h // 2), vec(o))                           # final projection
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob)} bytes to {args.out} "
          f"(attention {d}->{att}->{d}, head {d}->{h}->{h // 2}->{o})")


def cmd_quality(args):
    try:
        import torch
    except ImportError:
        sys.exit("quality mode reads a .pth checkpoint and needs torch installed")
    # weights_only=True (torch >= 1.13): never unpickle arbitrary code from
    # the checkpoint. Full-checkpoint forms (tensors + primitive metadata)
    # load fine under it; the model_state_dict is extracted after.
    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]  # full-checkpoint form (inference.py:224)
    head = f"head_{args.head}"
    get = lambda k: sd[k].numpy().tolist()
    blob = head_graph(
        f"mdf_quality_{args.head}",
        get("channel_attention.0.weight"), get("channel_attention.0.bias"),
        get("channel_attention.2.weight"), get("channel_attention.2.bias"),
        # Sequential indices skip the inference-no-op Dropout layers
        get(f"{head}.0.weight"), get(f"{head}.0.bias"),
        get(f"{head}.3.weight"), get(f"{head}.3.bias"),
        get(f"{head}.6.weight"), get(f"{head}.6.bias"))
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob)} bytes to {args.out} ({head} + channel attention)")


def cmd_tower(args, family):
    try:
        import torch
    except ImportError:
        sys.exit(f"{family} mode needs torch installed")
    if family == "clip":
        import open_clip
        model, _, _ = open_clip.create_model_and_transforms(
            args.model, pretrained=args.pretrained)
        tower = model.visual
        side = tower.image_size[0] if isinstance(tower.image_size, tuple) else tower.image_size
    else:
        from transformers import AutoModel
        tower = AutoModel.from_pretrained(args.model).vision_model
        side = tower.config.image_size
    tower.eval()
    dummy = torch.zeros(1, 3, side, side)
    torch.onnx.export(
        tower, dummy, args.out, input_names=["x"], output_names=["y"],
        dynamic_axes={"x": {0: "batch"}, "y": {0: "batch"}})
    print(f"wrote {args.out}; conv/attention ops need the onnxruntime jar "
          f"on the Spark classpath (the reflection bridge loads it)")


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="mode", required=True)

    q = sub.add_parser("quality")
    q.add_argument("--checkpoint", required=True)
    q.add_argument("--head", default="blurriness",
                   choices=["color_cast", "blurriness", "watermark", "noise"])
    q.add_argument("--out", required=True)

    c = sub.add_parser("clip")
    c.add_argument("--model", default="ViT-L-14")
    c.add_argument("--pretrained", default="openai")
    c.add_argument("--out", required=True)

    s = sub.add_parser("siglip")
    s.add_argument("--model", default="google/siglip-so400m-patch14-384")
    s.add_argument("--out", required=True)

    t = sub.add_parser("tiny-head")
    t.add_argument("--in-dim", type=int, default=256)
    t.add_argument("--hidden", type=int, default=16)
    t.add_argument("--out-dim", type=int, default=12)
    t.add_argument("--seed", type=int, default=7)
    t.add_argument("--out", required=True)

    args = p.parse_args()
    if args.mode == "quality":
        cmd_quality(args)
    elif args.mode in ("clip", "siglip"):
        cmd_tower(args, args.mode)
    else:
        cmd_tiny_head(args)


if __name__ == "__main__":
    main()
