#!/usr/bin/env python3
"""Dev prototype for the q58 mirror oracle: replicate the engine's
synthetic-PNG -> luma -> pooled-feature -> phash -> hamming-pair
pipeline in exact IEEE float32 arithmetic (numpy), so the DuckDB SQL
twin can be validated against it step by step before registration.

Pipeline mirrored (Media.scala):
  pixels : scala.util.Random(media_id).nextInt(0x1000000) x 1024
           (Java LCG; PNG round-trip is lossless so decode == generate)
  luma   : (0.299f*r + 0.587f*g + 0.114f*b) / 255.0f   (float32 each op)
  pooled : out[i%64] += luma[i] sequentially (float32), /= 16.0f
  phash  : bit i set iff feature[i] > mean(feature)  (double mean)
  pairs  : id1 < id2, bit_count(xor) <= 7
"""
import sys
import numpy as np

MASK48 = (1 << 48) - 1
MUL, ADD = 0x5DEECE66D, 0xB


def pixels(seed):
    s = (seed ^ MUL) & MASK48
    out = np.empty(1024, dtype=np.int64)
    for i in range(1024):
        s = (s * MUL + ADD) & MASK48
        out[i] = s >> 24
    return out


def phash(seed):
    rgb = pixels(seed)
    r = ((rgb >> 16) & 0xFF).astype(np.float32)
    g = ((rgb >> 8) & 0xFF).astype(np.float32)
    b = (rgb & 0xFF).astype(np.float32)
    lum = (np.float32(0.299) * r + np.float32(0.587) * g
           + np.float32(0.114) * b) / np.float32(255.0)
    out = np.zeros(64, dtype=np.float32)
    for i in range(1024):
        out[i % 64] += lum[i]
    out = out / np.float32(16.0)
    mean = 0.0
    for v in out:
        mean += float(v)
    mean /= 64.0
    h = 0
    for i in range(64):
        if float(out[i]) > mean:
            h |= 1 << i
    return h


def corpus(n):
    ids = [i for i in range(n) if i % 3 == 0]
    ids += [i + 1000000 for i in range(n) if i % 21 == 0]
    return {i: phash(i if i < 1000000 else i - 1000000) for i in ids}


def pairs(n):
    h = corpus(n)
    ids = sorted(h)
    out = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d = bin(h[ids[a]] ^ h[ids[b]]).count("1")
            if d <= 7:
                out.append((ids[a], ids[b], d))
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 90
    for t in pairs(n):
        print(*t)
