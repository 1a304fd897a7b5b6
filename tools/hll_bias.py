#!/usr/bin/env python3
"""Derive the mid-range HLL bias table (HLL++ style, Heule et al. 2013,
"HyperLogLog in Practice": raw estimates in (2.5m, ~5m) are biased high;
the fix is an empirically derived raw->bias lookup).

We derive our OWN table by replaying the engine's EXACT register pipeline
(md5 60-bit token hash -> j = h % m, w = h // m, rho = shift - bitlen(w),
shift = 61 - log2(m)) over synthetic universes of known cardinality, many
trials each, and tabulating mean (raw_estimate, raw_estimate - n) knots.
The knots are emitted as Scala literals for graft.ops.Sketch.hllBiasTable
and are shared verbatim with the DuckDB oracle SQL - the same discipline
as the linear-counting table (no transcendentals at query time).

Usage: hll_bias.py            # prints the Scala literal tables
"""
import hashlib


def alpha(m):
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def raw_estimate(tokens, m):
    shift = 61 - (m.bit_length() - 1)
    regs = {}
    for t in tokens:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        j, w = h % m, h // m
        rho = shift - w.bit_length()  # bitlen(0) == 0 -> all-zeros window
        regs[j] = max(regs.get(j, 0), rho)
    sp = sum(1 << (shift - regs.get(j, 0)) if j in regs else 1 << shift
             for j in range(m))
    return alpha(m) * m * m * (1 << shift) / sp


def table(m, trials=60):
    lo, hi, steps = int(2.0 * m), int(7.0 * m), 24
    knots = []
    for k in range(steps + 1):
        n = lo + (hi - lo) * k // steps
        raws = []
        for t in range(trials):
            toks = [f"v{m}_{t}_{i}" for i in range(n)]
            raws.append(raw_estimate(toks, m))
        mean_raw = sum(raws) / len(raws)
        knots.append((round(mean_raw, 6), round(mean_raw - n, 6)))
    return knots


if __name__ == "__main__":
    for m in (16, 64, 256):
        ks = table(m)
        print(f"  // m = {m}: (mean raw estimate, mean bias) knots, "
              f"n in [2m, 7m], 60 trials each")
        print(f"  private val biasKnots{m}: Seq[(Double, Double)] = Seq(")
        print("    " + ", ".join(f"({a}, {b})" for a, b in ks) + ")")
