#!/usr/bin/env python3
"""Independent (numpy) twin for the clip/siglip embedding oracles.

Recomputes, WITHOUT running any Scala code:
  - image_clip_embed: the HashProjectionEncoder spec (FNV-1a 64 seed over
    the encoded image bytes -> LCG unit draws -> float32 L2 normalize)
    over the committed fixture bytes in tools/fixture_images/ (which
    FixtureDriftSpec pins byte-identical to the live generator).
  - image_siglip_embed: decode -> 16x16 integer box-resize -> gray ->
    /255 float32 -> the serialized MLP graph in
    src/main/resources/graft/tiny_encoder.onnx, parsed HERE by a
    from-scratch protobuf wire-format walker -> float32 forward pass ->
    float32 L2 normalize. PNG pixels are regenerated from the integer
    fixture spec (PNG is lossless); the two JPEG ids use the committed
    .rgb decode dumps (the JPEG codec is the one component taken as
    given).

Float32 semantics are part of the spec and replicated exactly:
sequential multiply-accumulate per output unit, float64 sum-of-squares
-> float32 sqrt for the norm, float32 division. Emits the two SQL
VALUES blocks embedded in queries/InferenceQueries.scala.

Usage: python3 tools/gen_embed_oracle.py [--check]
  --check: diff the emitted blocks against the ones currently embedded
           in InferenceQueries.scala and exit nonzero on mismatch.
"""
import math
import os
import re
import struct
import sys
from decimal import Decimal, ROUND_HALF_UP

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
FIXTURES = os.path.join(HERE, "fixture_images")
ONNX_PATH = os.path.join(REPO, "src", "main", "resources", "graft", "tiny_encoder.onnx")
HEAD_PATH = os.path.join(REPO, "src", "main", "resources", "graft", "tiny_head.onnx")
QUERIES = os.path.join(REPO, "src", "main", "scala", "graft", "queries", "InferenceQueries.scala")

N = 60
GARBAGE = {54, 55}
NULLS = {56, 57}
JPEG = {58, 59}
DUP_OF = {50: 1, 51: 2, 52: 3, 53: 6}

M64 = (1 << 64) - 1


# ---------------------------------------------------------------- fixtures

def dims(i):
    return 48 + (i % 5) * 30, 48 + (i % 3) * 56


def pixels(i0):
    """Row-major (r, g, b) tuples from the integer fixture spec."""
    i = DUP_OF.get(i0, i0)
    w, h = dims(i)
    p = i % 4
    s = (i * 2654435761) & 0xFFFFFFFF
    out = []

    def draw():
        nonlocal s
        s = (1103515245 * s + 12345) & 0x7FFFFFFF
        return s % 256

    for y in range(h):
        for x in range(w):
            if p == 0:
                rgb = ((i * 37 + 11) % 256, (i * 59 + 23) % 256, (i * 83 + 47) % 256)
            elif p == 1:
                v = (x * 255) // (w - 1)
                rgb = (v, (v + i * 7) % 256, 255 - v)
            elif p == 2:
                c1 = (i * 41) % 256
                c = c1 if ((x // 8 + y // 8) % 2 == 0) else 255 - c1
                rgb = (c, c, c)
            else:
                rgb = (draw(), draw(), draw())
            out.append(rgb)
    return w, h, out


def encoded_bytes(i):
    """The exact bytes the encoders see: committed dump for drawable ids,
    spec-regenerated garbage for 54/55, None for the null ids."""
    if i in NULLS:
        return None
    if i in GARBAGE:
        return bytes((j * 31 + i) % 256 for j in range(100))
    with open(os.path.join(FIXTURES, "img_%d.bin" % i), "rb") as f:
        return f.read()


def decoded_pixels(i):
    """(w, h, [(r,g,b)...]) as the JVM decoder would see them: the spec
    pixels for lossless PNG ids, the committed .rgb dump for JPEG ids,
    None for garbage (undecodable) and null ids."""
    if i in NULLS or i in GARBAGE:
        return None
    if i in JPEG:
        with open(os.path.join(FIXTURES, "img_%d.rgb" % i)) as f:
            head = f.readline().split()
            w, h = int(head[0]), int(head[1])
            px = [int(line) for line in f if line.strip()]
        assert len(px) == w * h, "img_%d.rgb truncated" % i
        return w, h, [((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF) for p in px]
    return pixels(i)


# ------------------------------------------------------- clip (hash) encoder

def clip_raw(data, dim=16):
    """HashProjectionEncoder spec: FNV-1a 64 over bytes, then an LCG draw
    per component: v = float32((s >>> 33) / 2^31 - 0.5)."""
    h = 0xcbf29ce484222325
    for b in data:
        h = ((h ^ b) * 0x100000001b3) & M64
    out = np.empty(dim, dtype=np.float32)
    s = h
    for k in range(dim):
        s = (s * 6364136223846793005 + 1442695040888963407) & M64
        out[k] = np.float32((s >> 33) / 2147483648.0 - 0.5)
    return out


# ----------------------------------------------------- siglip preprocessing

def box_resize_gray(w, h, px, side=16):
    """Integer box-resize (per-channel truncating mean) to side x side,
    then gray = (r + g + b) // 3, then /255 as float32 — the
    OnnxImageEncoder.preprocess spec."""
    feed = np.empty(side * side, dtype=np.float32)
    for by in range(side):
        y0 = by * h // side
        y1 = max((by + 1) * h // side, y0 + 1)
        for bx in range(side):
            x0 = bx * w // side
            x1 = max((bx + 1) * w // side, x0 + 1)
            r = g = b = cnt = 0
            for y in range(y0, min(y1, h)):
                for x in range(x0, min(x1, w)):
                    pr, pg, pb = px[y * w + x]
                    r += pr
                    g += pg
                    b += pb
                    cnt += 1
            if cnt == 0:
                gray = 0
            else:
                gray = ((r // cnt) + (g // cnt) + (b // cnt)) // 3
            feed[by * side + bx] = np.float32(gray / 255.0)
    return feed


# ------------------------------------------- from-scratch ONNX wire reader

class Reader:
    """Minimal protobuf wire-format walker (public encoding spec)."""

    def __init__(self, buf, pos=0, end=None):
        self.buf = buf
        self.pos = pos
        self.end = len(buf) if end is None else end

    def has_more(self):
        return self.pos < self.end

    def varint(self):
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return acc
            shift += 7

    def tag(self):
        t = self.varint()
        return t >> 3, t & 7

    def bytes_(self):
        ln = self.varint()
        out = self.buf[self.pos:self.pos + ln]
        self.pos += ln
        return out

    def sub(self):
        ln = self.varint()
        r = Reader(self.buf, self.pos, self.pos + ln)
        self.pos += ln
        return r

    def fixed32f(self):
        v = struct.unpack_from("<f", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def skip(self, wire):
        if wire == 0:
            self.varint()
        elif wire == 1:
            self.pos += 8
        elif wire == 2:
            ln = self.varint()  # evaluate FIRST: varint() moves pos
            self.pos += ln
        elif wire == 5:
            self.pos += 4
        else:
            raise ValueError("unsupported wire type %d" % wire)


def parse_onnx(model):
    """onnx.proto public field numbers: ModelProto.graph=7;
    GraphProto.node=1, .initializer=5, .input=11, .output=12;
    NodeProto.input=1, .output=2, .op_type=4; TensorProto.dims=1,
    .data_type=2, .float_data=4, .name=8, .raw_data=9;
    ValueInfoProto.name=1."""
    top = Reader(model)
    graph = None
    while top.has_more():
        f, w = top.tag()
        if f == 7 and w == 2:
            graph = top.sub()
        else:
            top.skip(w)
    assert graph is not None, "ModelProto has no graph"

    nodes, inits = [], {}
    input_name, output_name = "", ""

    def value_info_name(r):
        n = ""
        while r.has_more():
            f, w = r.tag()
            if f == 1 and w == 2:
                n = r.bytes_().decode("utf-8")
            else:
                r.skip(w)
        return n

    def parse_attr(r):
        # AttributeProto: name = 1, f = 2 (fixed32 float), i = 3 (varint int64)
        name, value = "", None
        while r.has_more():
            f, w = r.tag()
            if f == 1 and w == 2:
                name = r.bytes_().decode("utf-8")
            elif f == 2 and w == 5:
                value = float(r.fixed32f())
            elif f == 3 and w == 0:
                v = r.varint()
                if v >= 1 << 63:
                    v -= 1 << 64  # int64 two's complement (e.g. axis = -1)
                value = float(v)
            else:
                r.skip(w)
        return (name, value) if name and value is not None else None

    def parse_node(r):
        ins, outs, op, attrs = [], [], "", {}
        while r.has_more():
            f, w = r.tag()
            if f == 1 and w == 2:
                ins.append(r.bytes_().decode("utf-8"))
            elif f == 2 and w == 2:
                outs.append(r.bytes_().decode("utf-8"))
            elif f == 4 and w == 2:
                op = r.bytes_().decode("utf-8")
            elif f == 5 and w == 2:
                a = parse_attr(r.sub())
                if a:
                    attrs[a[0]] = a[1]
            else:
                r.skip(w)
        return op, ins, outs, attrs

    def parse_tensor(r):
        tdims, floats, raw, name, dtype = [], [], None, "", 1
        while r.has_more():
            f, w = r.tag()
            if f == 1 and w == 0:
                tdims.append(r.varint())
            elif f == 1 and w == 2:
                s = r.sub()
                while s.has_more():
                    tdims.append(s.varint())
            elif f == 2 and w == 0:
                dtype = r.varint()
            elif f == 4 and w == 5:
                floats.append(r.fixed32f())
            elif f == 4 and w == 2:
                s = r.sub()
                while s.has_more():
                    floats.append(s.fixed32f())
            elif f == 8 and w == 2:
                name = r.bytes_().decode("utf-8")
            elif f == 9 and w == 2:
                raw = r.bytes_()
            else:
                r.skip(w)
        assert dtype == 1, "only FLOAT tensors supported"
        if raw is not None:
            data = np.frombuffer(raw, dtype="<f4").astype(np.float32)
        else:
            data = np.array(floats, dtype=np.float32)
        if len(tdims) == 2:
            data = data.reshape(tdims[0], tdims[1])
        return name, data

    while graph.has_more():
        f, w = graph.tag()
        if f == 1 and w == 2:
            nodes.append(parse_node(graph.sub()))
        elif f == 5 and w == 2:
            name, data = parse_tensor(graph.sub())
            inits[name] = data
        elif f == 11 and w == 2:
            n = value_info_name(graph.sub())
            if not input_name:
                input_name = n
        elif f == 12 and w == 2:
            output_name = value_info_name(graph.sub())
        else:
            graph.skip(w)

    if not input_name or input_name in inits:
        produced = {o for _, _, outs, _ in nodes for o in outs}
        for _, ins, _, _ in nodes:
            for n in ins:
                if n not in inits and n not in produced:
                    input_name = n
                    break
            if input_name and input_name not in inits:
                break
    return nodes, inits, input_name, output_name


def onnx_forward(nodes, inits, input_name, output_name, x):
    """Float32 forward pass of one row vector with SEQUENTIAL
    multiply-accumulate per output unit (acc_j = fold_i acc_j + x_i*W_ij,
    each op rounded to float32), matching the interpreter spec."""
    env = {input_name: x.astype(np.float32)}

    def resolve(n):
        if n in env:
            return env[n]
        return inits[n]

    def matmul(a, bm, alpha):
        k, m = bm.shape
        assert a.shape[0] == k, "MatMul dim mismatch"
        acc = np.zeros(m, dtype=np.float32)
        for i in range(k):
            acc = (acc + a[i] * bm[i, :]).astype(np.float32)
        # interpreter spec: alpha multiplies AFTER accumulation, in f32
        return (np.float32(alpha) * acc).astype(np.float32)

    def rowvec(b):
        return b.reshape(-1) if b.ndim > 1 else b

    def erf_as(x):
        # Abramowitz-Stegun 7.1.26 in float64, EXACT constant/op order of
        # the interpreter (part of the spec)
        sgn = -1.0 if x < 0 else 1.0
        t = 1.0 / (1.0 + 0.3275911 * abs(x))
        y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
                    - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
        return sgn * y

    for op, ins, outs, attrs in nodes:
        if op == "MatMul":
            out = matmul(resolve(ins[0]), resolve(ins[1]), 1.0)
        elif op == "Gemm":
            assert attrs.get("transA", 0.0) == 0.0, "Gemm transA unsupported"
            alpha = attrs.get("alpha", 1.0)
            beta = np.float32(attrs.get("beta", 1.0))
            b0 = resolve(ins[1])
            bm = b0.T.copy() if attrs.get("transB", 0.0) != 0.0 else b0
            ab = matmul(resolve(ins[0]), bm, alpha)
            if len(ins) > 2 and ins[2]:
                c = rowvec(resolve(ins[2]))
                ab = (ab + (beta * c).astype(np.float32)).astype(np.float32)
            out = ab
        elif op == "Add":
            out = (resolve(ins[0]) + rowvec(resolve(ins[1]))).astype(np.float32)
        elif op == "Sub":
            out = (resolve(ins[0]) - rowvec(resolve(ins[1]))).astype(np.float32)
        elif op == "Mul":
            out = (resolve(ins[0]) * rowvec(resolve(ins[1]))).astype(np.float32)
        elif op == "Div":
            out = (resolve(ins[0]) / rowvec(resolve(ins[1]))).astype(np.float32)
        elif op == "Relu":
            out = np.maximum(resolve(ins[0]), np.float32(0))
        elif op == "Sigmoid":
            v = resolve(ins[0]).astype(np.float64)
            out = (1.0 / (1.0 + np.exp(-v))).astype(np.float32)
        elif op == "Tanh":
            out = np.tanh(resolve(ins[0]).astype(np.float64)).astype(np.float32)
        elif op == "Erf":
            out = np.array([np.float32(erf_as(float(v))) for v in resolve(ins[0])],
                           dtype=np.float32)
        elif op == "Exp":
            out = np.array([np.float32(math.exp(float(v))) for v in resolve(ins[0])],
                           dtype=np.float32)
        elif op == "Sqrt":
            out = np.array([np.float32(math.sqrt(float(v))) for v in resolve(ins[0])],
                           dtype=np.float32)
        elif op == "Neg":
            out = (-resolve(ins[0])).astype(np.float32)
        elif op == "Softmax":
            axis = attrs.get("axis", -1.0)
            assert axis in (-1.0, 1.0), "Softmax axis unsupported"
            row = resolve(ins[0])
            mx = np.float32(row.max())
            # interpreter spec: (v - mx) subtracts in FLOAT32, exp in f64
            exps = [math.exp(float(np.float32(v) - mx)) for v in row]
            sm = 0.0
            for e in exps:
                sm += e
            out = np.array([np.float32(e / sm) for e in exps], dtype=np.float32)
        elif op == "LayerNormalization":
            axis = attrs.get("axis", -1.0)
            assert axis in (-1.0, 1.0), "LayerNormalization axis unsupported"
            eps = attrs.get("epsilon", 1e-5)
            row = resolve(ins[0])
            scale = rowvec(resolve(ins[1]))
            bias = rowvec(resolve(ins[2])) if len(ins) > 2 and ins[2] else None
            m = 0.0
            for v in row:
                m += float(v)
            m /= len(row)
            va = 0.0
            for v in row:
                va += (float(v) - m) * (float(v) - m)
            va /= len(row)
            inv = 1.0 / math.sqrt(va + eps)
            vals = []
            for i in range(len(row)):
                v = (float(row[i]) - m) * inv * float(scale[i])
                if bias is not None:
                    v = v + float(bias[i])
                vals.append(np.float32(v))
            out = np.array(vals, dtype=np.float32)
        elif op == "Identity":
            out = resolve(ins[0])
        else:
            raise ValueError("unsupported op %s" % op)
        env[outs[0]] = out
    return env[output_name if output_name else nodes[-1][2][0]]


# ------------------------------------------------------------ gate algebra

def l2_normalize_f32(v):
    """Refiner spec: n = float32(sqrt(float64 sum of float64(x)^2)),
    then float32 x / n; zero vector stays zero."""
    acc = 0.0
    for x in v:
        acc += float(x) * float(x)
    n = np.float32(math.sqrt(acc))
    if n == np.float32(0):
        return v
    return (v / n).astype(np.float32)


def r6(v):
    # Spark round(col, 6): BigDecimal HALF_UP over the double's shortest repr
    return Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def gate_row(i, v):
    """(id, emb_norm, c0..c3) — double-cast floats, sequential double
    sum of squares, round 6."""
    acc = 0.0
    for x in v:
        d = float(x)
        acc = acc + d * d
    cols = [math.sqrt(acc)] + [float(v[k]) for k in range(4)]
    return "  (CAST(%d AS BIGINT), %s)" % (
        i, ", ".join("CAST(%s AS DOUBLE)" % r6(c) for c in cols))


# ------------------------------------------------------------------- main

def clip_values():
    rows = []
    for i in range(N):
        data = encoded_bytes(i)
        if data is None:
            v = np.zeros(16, dtype=np.float32)
        else:
            v = l2_normalize_f32(clip_raw(data))
        rows.append(gate_row(i, v))
    return ",\n".join(rows)


def model_values(path):
    with open(path, "rb") as f:
        nodes, inits, input_name, output_name = parse_onnx(f.read())
    # output width: probe with a zero row (dims follow the graph)
    out_dim = len(onnx_forward(nodes, inits, input_name, output_name,
                               np.zeros(256, dtype=np.float32)))
    rows = []
    for i in range(N):
        d = decoded_pixels(i)
        if d is None:
            v = np.zeros(out_dim, dtype=np.float32)
        else:
            w, h, px = d
            feed = box_resize_gray(w, h, px)
            v = l2_normalize_f32(
                onnx_forward(nodes, inits, input_name, output_name, feed))
        rows.append(gate_row(i, v))
    return ",\n".join(rows)


def embedded_block(src, var):
    m = re.search(r'private val %s = """(.*?)"""' % var, src, re.S)
    assert m, "no %s block in InferenceQueries.scala" % var
    return m.group(1)


def main():
    clip = clip_values()
    siglip = model_values(ONNX_PATH)
    head = model_values(HEAD_PATH) if os.path.exists(HEAD_PATH) else None
    if "--check" in sys.argv:
        with open(QUERIES) as f:
            src = f.read()
        ok = True
        blocks = [("clipEmbedValues", clip), ("siglipEmbedValues", siglip)]
        if head is not None:
            blocks.append(("headEmbedValues", head))
        for name, mine in blocks:
            theirs = embedded_block(src, name)
            if theirs.strip() != mine.strip():
                ok = False
                a = [l for l in theirs.strip().splitlines()]
                b = [l for l in mine.strip().splitlines()]
                print("MISMATCH in %s (%d vs %d rows):" % (name, len(a), len(b)))
                for x, y in zip(a, b):
                    if x.strip() != y.strip():
                        print("  embedded: %s" % x.strip())
                        print("  twin:     %s" % y.strip())
            else:
                print("%s: twin matches embedded block (%d rows)"
                      % (name, len(mine.splitlines())))
        sys.exit(0 if ok else 1)
    print("-- image_clip_embed")
    print(clip)
    print("-- image_siglip_embed")
    print(siglip)
    if head is not None:
        print("-- image_gelu_head_embed")
        print(head)


if __name__ == "__main__":
    main()
