#!/usr/bin/env python3
"""Third-engine statistical audit.

The DuckDB oracle gate cannot catch a formula that is wrong IDENTICALLY in
both engines (proven by the round-9 drift chi-square bug: a spurious
x(n1+n2) factor survived three oracle-green rounds because the oracle SQL
replayed the same algebra as the Spark query). This tool recomputes every
statistical query's output with INDEPENDENT textbook algebra in
numpy/pandas — not a translation of either the Scala or the oracle SQL —
and diffs it against the engine's parquet output from graft.Verify.

Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_r10"
    python3 tools/stat_audit.py /root/testdata/sf0.01 /tmp/verify_r10

Writes STAT_AUDIT.md (query -> max abs diff -> verdict) in the cwd.

Discipline: each audit function derives its statistic from the published
definition (citations inline).  Input selection (which table/columns/
filters/rounding) is taken from the query's declared contract; the
FORMULA is never copied from the implementation.
"""
import sys, os, math, json
import numpy as np
import pandas as pd
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r10"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = os.path.join(SF_DIR, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def table(name):
    return con.execute(f"SELECT * FROM {name}").df()


def engine_out(name):
    """Read the engine's Verify output for a query (a parquet dir)."""
    d = os.path.join(OUT_DIR, name)
    if not os.path.isdir(d):
        return None
    return pd.read_parquet(d)


AUDITS = {}   # name -> (fn() -> expected DataFrame, atol, orderless)

def audit(name, atol=1.1e-6, orderless=False):
    """Register an audit. Default atol absorbs the engine's round(x, 6)
    presentation (<= 5e-7) plus fixed-point quantization of its exact-
    decimal pipelines; a wrong formula is off by orders of magnitude more
    (the round-9 chi2 bug was off ~1.2e5x). Large unrounded columns are
    covered by the relative term in compare().

    orderless=True compares as a MULTISET: both frames are sorted by ALL
    columns before the positional walk. For queries whose presentation
    sort leaves tie order unpinned (flf_format's duplicate
    (l_orderkey, l_linenumber) keys). Only sound when every column is
    discrete (int/str/bool) so the canonical sort is exact — a float
    sort key could misalign ties that differ inside the tolerance."""
    def reg(fn):
        AUDITS[name] = (fn, atol, orderless)
        return fn
    return reg


def compare(name, expected, got, float_tol=1.1e-6, rel_tol=1e-7,
            orderless=False):
    """Column-name-sorted compare; floats flag when BOTH the absolute diff
    exceeds float_tol AND the relative diff exceeds rel_tol; rest exact.
    orderless canonically sorts both frames by all columns first (see
    audit()). Returns (verdict, max_abs_diff, detail)."""
    if got is None:
        return ("MISSING", None, "no engine output")
    exp = expected.reset_index(drop=True)
    g = got.reset_index(drop=True)
    ecols, gcols = sorted(exp.columns), sorted(g.columns)
    if ecols != gcols:
        return ("SCHEMA", None, f"cols expected {ecols} got {gcols}")
    if orderless:
        exp = exp.sort_values(ecols, kind="mergesort").reset_index(drop=True)
        g = g.sort_values(gcols, kind="mergesort").reset_index(drop=True)
    if len(exp) != len(g):
        return ("ROWS", None, f"rows expected {len(exp)} got {len(g)}")
    maxd = 0.0
    for c in ecols:
        e, a = exp[c], g[c]
        if pd.api.types.is_float_dtype(e) or pd.api.types.is_float_dtype(a):
            e = pd.to_numeric(e, errors="coerce").astype(float)
            a = pd.to_numeric(a, errors="coerce").astype(float)
            nan_mismatch = (e.isna() != a.isna())
            if nan_mismatch.any():
                i = int(np.argmax(nan_mismatch.values))
                return ("DIFF", math.inf,
                        f"null mismatch col {c} row {i}: exp {e[i]} got {a[i]}")
            d = (e - a).abs().fillna(0.0)
            rel = d / np.maximum(e.abs().fillna(0.0), 1e-300)
            if len(d):
                bad = (d > float_tol) & (rel > rel_tol)
                # report the scale-normalized diff: |e-a| / max(1, |e|)
                dm = float((d / np.maximum(e.abs().fillna(0.0), 1.0)).max())
                maxd = max(maxd, dm)
                if bad.any():
                    i = int(np.argmax(bad.values))
                    return ("DIFF", float(d[i]),
                            f"col {c} row {i}: exp {e[i]!r} got {a[i]!r}")
        else:
            ee = e.astype(object).where(~pd.isna(e), None)
            aa = a.astype(object).where(~pd.isna(a), None)
            neq = [i for i in range(len(ee)) if ee[i] != aa[i]]
            if neq:
                i = neq[0]
                return ("DIFF", math.inf,
                        f"col {c} row {i}: exp {ee[i]!r} got {aa[i]!r}")
    return ("OK", maxd, "")


# ---------------------------------------------------------------------------
# shared helpers (textbook machinery, written from definitions)

def rankdata_avg(x):
    """Average ranks (1-based) with ties sharing the mean rank — the
    standard midrank used by Mann-Whitney / Kruskal-Wallis / Spearman."""
    x = np.asarray(x)
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), dtype=float)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def norm_cdf(z):
    return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))


def norm_ppf(p):
    """Inverse standard normal CDF via bisection on erf (deterministic,
    no scipy). Accurate to ~1e-13."""
    lo, hi = -40.0, 40.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if norm_cdf(mid) < p:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def chi2_sf(x, k):
    """Chi-square survival function P(X_k > x).

    For even k: closed form exp(-x/2) * sum_{i<k/2} (x/2)^i / i!.
    For odd k: recurrence from erfc.  (Abramowitz & Stegun 26.4.)
    """
    if x < 0:
        return 1.0
    if k % 2 == 0:
        s, term = 0.0, 1.0
        for i in range(k // 2):
            if i > 0:
                term *= (x / 2.0) / i
            s += term
        return min(1.0, math.exp(-x / 2.0) * s)
    # odd dof: P(X_1 > x) = erfc(sqrt(x/2)); recurrence
    # P(X_{k+2} > x) = P(X_k > x) + (x/2)^{k/2} e^{-x/2} / Gamma(k/2+1)
    p = math.erfc(math.sqrt(x / 2.0))
    g = math.sqrt(math.pi)  # Gamma(1/2)
    half = 0.5
    for kk in range(1, k, 2):
        g *= half + (kk - 1) / 2.0 + 0.0  # Gamma(kk/2 + 1) built up
        p += (x / 2.0) ** (kk / 2.0) * math.exp(-x / 2.0) / g
    return min(1.0, p)


def students_t_sf(t, df):
    """Student's t survival function via the regularized incomplete beta:
    P(T > t) = I_{df/(df+t^2)}(df/2, 1/2) / 2 for t >= 0."""
    x = df / (df + t * t)
    ib = betainc_reg(df / 2.0, 0.5, x)
    return ib / 2.0 if t >= 0 else 1.0 - ib / 2.0


def f_sf(f, d1, d2):
    """F survival function: P(F > f) = I_{d2/(d2+d1 f)}(d2/2, d1/2)."""
    if f <= 0:
        return 1.0
    x = d2 / (d2 + d1 * f)
    return betainc_reg(d2 / 2.0, d1 / 2.0, x)


def betainc_reg(a, b, x):
    """Regularized incomplete beta I_x(a,b) by Lentz continued fraction
    (Numerical Recipes 6.4)."""
    if x <= 0:
        return 0.0
    if x >= 1:
        return 1.0
    lbeta = math.lgamma(a) + math.lgamma(b) - math.lgamma(a + b)
    front = math.exp(math.log(x) * a + math.log(1 - x) * b - lbeta) / a
    # continued fraction for I_x(a,b) valid when x < (a+1)/(a+b+2)
    if x < (a + 1) / (a + b + 2):
        return front * _betacf(a, b, x)
    return 1.0 - betainc_reg(b, a, 1.0 - x)


def _betacf(a, b, x):
    MAXIT, EPS, FPMIN = 300, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def r6(x):
    """DuckDB/Spark round(x, 6): half away from zero."""
    if x is None or (isinstance(x, float) and math.isnan(x)):
        return x
    return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)


def rn(x, n):
    return math.floor(abs(x) * 10**n + 0.5) / 10**n * (1 if x >= 0 else -1)


# ---------------------------------------------------------------------------
# main

def main():
    rows = []
    names = sorted(AUDITS)
    if ONLY:
        names = [n for n in names if n in ONLY]
    for name in names:
        try:
            fn, atol, orderless = AUDITS[name]
            exp = fn()
            verdict, maxd, detail = compare(name, exp, engine_out(name),
                                            float_tol=atol,
                                            orderless=orderless)
        except Exception as e:
            import traceback
            verdict, maxd, detail = ("ERR", None,
                                     f"{type(e).__name__}: {e} @ {traceback.format_exc(limit=2).splitlines()[-2].strip()}")
        rows.append((name, verdict, maxd, detail))
        flag = "" if verdict == "OK" else "  <<<<"
        print(f"{name:35s} {verdict:8s} "
              f"{('%.2e' % maxd) if maxd is not None else '-':10s} {detail[:120]}{flag}")
    bad = [r for r in rows if r[1] != "OK"]
    print(f"\n{len(rows) - len(bad)}/{len(rows)} OK, {len(bad)} flagged")
    return rows, bad


def md5h60(v):
    """Engine's portable 60-bit hash: first 15 hex chars of md5(str(v))."""
    import hashlib
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


if __name__ == "__main__":
    # audits live in stat_audits.py (same dir); they import this module's
    # helpers, which is safe here because all definitions precede this line
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # make `import stat_audit` inside stat_audits resolve to THIS module
    # instance (not a second copy with an empty AUDITS registry)
    sys.modules["stat_audit"] = sys.modules[__name__]
    import stat_audits  # noqa: F401  (registers via AUDITS)
    rows, bad = main()
    if ONLY:
        # A filtered run must never clobber the committed full-table audit
        # (the round-10 end-of-round snapshot did exactly that): print only.
        print(f"(subset run: {len(rows)} of {len(AUDITS)} audits; "
              "STAT_AUDIT.md NOT rewritten)")
        sys.exit(1 if bad else 0)
    md = ["# STAT_AUDIT — third-engine statistical audit",
          "",
          f"Engine outputs from `graft.Verify` at `{SF_DIR}`; every statistic",
          "recomputed with independent textbook algebra (numpy/float64, no",
          "scipy in this image) by `tools/stat_audit.py`. `max_scaled_diff`",
          "= max over float cells of |expected-got| / max(1, |expected|)",
          "after column-name-sorted alignment; non-float columns compare",
          "exactly.",
          "", "| query | verdict | max_scaled_diff | detail |", "|---|---|---|---|"]
    for name, verdict, maxd, detail in rows:
        md.append(f"| {name} | {verdict} | "
                  f"{('%.2e' % maxd) if maxd is not None else '-'} | {detail[:90]} |")
    md.append("")
    md.append(f"**{len(rows) - len(bad)}/{len(rows)} OK, {len(bad)} flagged**")
    with open("STAT_AUDIT.md", "w") as f:
        f.write("\n".join(md) + "\n")
    sys.exit(1 if bad else 0)
