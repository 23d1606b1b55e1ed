#!/usr/bin/env python3
"""Independent (numpy) twin of graft.sources.SyntheticImages +
graft.operators.image.ImageOps pixel-pure metrics. Emits the SQL VALUES
literals embedded in queries/ImageQueries.scala — the parity idea of the
reference's Python-vs-Rust tests (tests/test_image_technical_quality.py),
applied across languages at fixture-authoring time.

Usage: python3 tools/gen_image_oracle.py
"""
import math
from decimal import Decimal, ROUND_HALF_UP

N = 60
GARBAGE = {54, 55}
NULLS = {56, 57}
JPEG = {58, 59}
DUP_OF = {50: 1, 51: 2, 52: 3, 53: 6}


def dims(i):
    return 48 + (i % 5) * 30, 48 + (i % 3) * 56


def pixels(i0):
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


def entropy(px):
    counts = [[0] * 256 for _ in range(3)]
    for rgb in px:
        for c in range(3):
            counts[c][rgb[c]] += 1
    total = len(px)
    if total == 0:
        return 0.0
    inv = 1.0 / total
    es = []
    for c in range(3):
        e = 0.0
        for k in range(256):
            n = counts[c][k]
            if n > 0:
                p = n * inv
                e -= p * (math.log(p) / math.log(2.0))
        es.append(e)
    return (es[0] + es[1] + es[2]) / 3.0


def blockiness(w, h, px):
    def gray(rgb):
        return (rgb[0] + rgb[1] + rgb[2]) // 3

    block, max_samples = 8, 64
    h_blocks = min(max(h - 1, 0) // block, max_samples)
    w_blocks = min(max(w - 1, 0) // block, max_samples)
    v_sum = v_cnt = 0
    for i in range(h_blocks):
        y = i * block
        if y + 1 < h:
            srow = sum(abs(gray(px[y * w + x]) - gray(px[(y + 1) * w + x])) for x in range(w))
            v_sum += srow // w
            v_cnt += 1
    h_sum = h_cnt = 0
    for j in range(w_blocks):
        x = j * block
        if x + 1 < w:
            scol = sum(abs(gray(px[y * w + x]) - gray(px[y * w + x + 1])) for y in range(h))
            h_sum += scol // h
            h_cnt += 1
    if v_cnt and h_cnt:
        return (v_sum / v_cnt / 255.0 + h_sum / h_cnt / 255.0) / 2.0
    return 0.0


def r6(v):
    # Spark round(col, 6): BigDecimal HALF_UP over the double's shortest repr
    return Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def main():
    meta_rows, ent_rows, blk_rows, keep_ids, vd_rows = [], [], [], [], []
    for i in range(N):
        if i in GARBAGE or i in NULLS:
            meta_rows.append((i, 0, 0, "ERROR"))
            if i <= 57:
                ent_rows.append((i, 0.0))
                blk_rows.append((i, 0.0))
            continue
        w, h, px = pixels(i)
        meta_rows.append((i, w, h, "JPEG" if i in JPEG else "PNG"))
        if i <= 57:
            e = entropy(px)
            b = blockiness(w, h, px)
            ent_rows.append((i, e))
            blk_rows.append((i, b))
            if i <= 53:
                # VisualDegradationsRefiner stub heads: (e/8, b, 0, 1-e/8);
                # overall = 0.2*h0 + 0.3*h1 + 0.25*h2 + 0.25*h3 — the exact
                # FP expression order of InferenceRefiners.scala
                h0 = e / 8.0
                h1 = b
                h2 = 0.0
                h3 = 1.0 - e / 8.0
                vd_rows.append((i, 0.2 * h0 + 0.3 * h1 + 0.25 * h2 + 0.25 * h3))
            # filter config 64/64/0.8/3.0; artifacts never reaches 0.8 on
            # this fixture (max blockiness*0.6 + 0.4 < 0.8), so the
            # decision is width/height/entropy
            if w >= 64 and h >= 64 and e >= 3.0:
                keep_ids.append(i)

    print("-- image_metadata")
    print(",\n".join(
        f"  (CAST({i} AS BIGINT), {w}, {h}, '{f}')" for i, w, h, f in meta_rows))
    print("-- image_entropy")
    print(",\n".join(
        f"  (CAST({i} AS BIGINT), CAST({r6(e)} AS DOUBLE))" for i, e in ent_rows))
    print("-- image_blockiness")
    print(",\n".join(
        f"  (CAST({i} AS BIGINT), CAST({r6(b)} AS DOUBLE))" for i, b in blk_rows))
    print("-- image_quality_filter keep ids")
    print(",\n".join(f"  (CAST({i} AS BIGINT))" for i in keep_ids))
    print("-- image_degradations overall (id <= 53)")
    print(",\n".join(
        f"  (CAST({i} AS BIGINT), CAST({r6(v)} AS DOUBLE))" for i, v in vd_rows))


if __name__ == "__main__":
    main()
