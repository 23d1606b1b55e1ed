#!/usr/bin/env python3
"""Independent (Python zlib) twin for the compression_ratio oracle.

Recomputes, WITHOUT running any Scala code:
  - the SyntheticTexts fixture strings (the integer/ASCII spec in
    src/main/scala/graft/sources/SyntheticTexts.scala, re-implemented
    here from the spec);
  - their Deflate-compressed length at the kernel's pinned level
    (BEST_SPEED = zlib level 1 — Java's Deflater and CPython's zlib both
    bind madler zlib with the same defaults, verified byte-equal on
    ASCII, unicode, empty, runs and LCG noise);
  - ratio = compressed/raw rounded like Spark round(col, 6)
    (HALF_UP over the double's shortest repr), empty text -> 1.0;
  - the CompressionRatioFilter keep set at the default [0.25, 0.95].

Emits the two SQL VALUES blocks embedded in
src/main/scala/graft/queries/SearchGraphQueries.scala.

Usage: python3 tools/gen_compression_oracle.py [--check]
  --check: diff the emitted blocks against the ones currently embedded
           in SearchGraphQueries.scala and exit nonzero on mismatch.
"""
import os
import re
import sys
import zlib
from decimal import Decimal, ROUND_HALF_UP

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
QUERIES = os.path.join(REPO, "src", "main", "scala", "graft", "queries",
                       "SearchGraphQueries.scala")

N = 60

WORDS = [
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "data", "pipeline", "filter", "quality", "corpus", "token", "model", "train",
    "large", "scale", "spark", "shuffle", "partition", "join", "hash", "text",
    "document", "sample", "weight", "score", "clean", "dedup", "batch", "stream",
    "and", "with", "from", "into", "while", "where", "when", "then",
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "one", "two", "three", "four", "five", "six", "seven", "eight",
    "red", "green", "blue", "cyan", "magenta", "yellow", "black", "white",
]

B64 = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"

UNICODE24 = ("café résumé naïve "
             "日本語テキスト "
             "кириллица "
             "straße — für über")
UNICODE49 = ("日本語 " * 12) + "éééé end"


def text(doc_id):
    if doc_id == 24:
        return UNICODE24
    if doc_id == 49:
        return UNICODE49
    s = (doc_id * 2654435761) & 0xFFFFFFFF

    def draw():
        nonlocal s
        s = (1103515245 * s + 12345) & 0x7FFFFFFF
        return s % 64

    kind = doc_id % 5
    if kind == 0:
        n = 40 + (doc_id % 7) * 25
        out = []
        for i in range(n):
            if i > 0:
                out.append(" ")
            out.append(WORDS[draw()])
            if i % 13 == 12:
                out.append(".")
        return "".join(out)
    if kind == 1:
        unit = "<tr><td>row %d</td><td>value</td></tr>\n" % doc_id
        return unit * (20 + doc_id % 9)
    if kind == 2:
        # high-bit draw: the LCG's low 6 bits are short-period (see the
        # Scala spec comment), so %64 on raw state would be compressible
        n = 200 + (doc_id % 11) * 37
        out = []
        for _ in range(n):
            s = (1103515245 * s + 12345) & 0x7FFFFFFF
            out.append(B64[(s >> 10) % 64])
        return "".join(out)
    if kind == 3:
        parts = ["ha" * (30 + doc_id % 5), " "]
        for i in range(8):
            if i > 0:
                parts.append(" ")
            parts.append(WORDS[draw()])
        return "".join(parts)
    if doc_id == 4:
        return ""
    if doc_id == 9:
        return "x"
    return "short doc %d" % doc_id


def r6(v):
    # Spark round(col, 6): BigDecimal HALF_UP over the double's shortest repr
    return Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def rows():
    # keep BOTH the raw ratio (the kernel's keep predicate compares the
    # UNROUNDED value against [0.25, 0.95]) and the rounded display value
    out = []
    for i in range(N):
        b = text(i).encode("utf-8")
        if not b:
            ratio = 1.0
        else:
            ratio = len(zlib.compress(b, 1)) / len(b)
        out.append((i, len(b), r6(ratio), ratio))
    return out


def ratio_block(rs):
    return ",\n".join(
        "  (CAST(%d AS BIGINT), CAST(%d AS BIGINT), CAST(%s AS DOUBLE))"
        % (i, n, r) for i, n, r, _ in rs)


def keep_block(rs, lo=0.25, hi=0.95):
    # decide from the RAW ratio, exactly like DeflateKeep
    # (kernels.scala: r >= minRatio && r <= maxRatio on the unrounded
    # double) — deciding from the rounded value would disagree with the
    # Spark side for any ratio within 5e-7 of a band edge
    kept = [i for i, _, _, raw in rs if lo <= raw <= hi]
    return ",\n".join("  (CAST(%d AS BIGINT))" % i for i in kept)


def main():
    rs = rows()
    blocks = {
        "compressionRatioValues": ratio_block(rs),
        "compressionKeepValues": keep_block(rs),
    }
    if "--check" in sys.argv:
        src = open(QUERIES, encoding="utf-8").read()
        ok = True
        for name, want in blocks.items():
            m = re.search(r'private val %s = """(.*?)"""' % name, src, re.S)
            if not m:
                print("MISSING block %s in SearchGraphQueries.scala" % name)
                ok = False
            elif m.group(1).strip("\n") != want:
                print("DRIFT in %s" % name)
                ok = False
            else:
                print("OK %s" % name)
        sys.exit(0 if ok else 1)
    for name, blk in blocks.items():
        print("  private val %s = \"\"\"%s\"\"\"\n" % (name, blk))


if __name__ == "__main__":
    main()
