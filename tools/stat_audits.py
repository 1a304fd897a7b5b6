"""Audit functions for stat_audit.py — one per statistical query.

Each function returns the EXPECTED output DataFrame computed from the
statistic's published definition (cited inline) in float64/exact-int
python, independent of both the Spark implementation and the DuckDB
oracle SQL. Input selection (table / columns / filters / fixed-point
presentation units) follows each query's declared output contract.
"""
import math
import numpy as np
import pandas as pd

from stat_audit import (AUDITS, audit, table, con, rankdata_avg, norm_cdf,
                        norm_ppf, chi2_sf, students_t_sf, f_sf, betainc_reg,
                        r6, rn, md5h60)


def half_up(x, scale):
    """round-half-away-from-zero of x*scale to int (the engines' exact
    decimal encode)."""
    return np.floor(np.abs(x) * scale + 0.5).astype(np.int64) * np.where(x < 0, -1, 1)


# --- two-sample / k-sample location-scale tests ----------------------------

@audit("q_welch_ttest")
def welch_ttest():
    # Welch (1947): t = (m1-m2)/sqrt(s1^2/n1 + s2^2/n2);
    # df = (se1+se2)^2 / (se1^2/(n1-1) + se2^2/(n2-1)), se_i = s_i^2/n_i.
    o = table("orders")
    o = o[o.o_orderpriority.isin(["1-URGENT", "2-HIGH"])]
    # values are exact cents in the engines
    v = half_up(o.o_totalprice.values, 100) / 100.0
    a = (o.o_orderpriority == "1-URGENT").values
    x1, x2 = v[a], v[~a]
    n1, n2 = len(x1), len(x2)
    m1, m2 = x1.mean(), x2.mean()
    se1 = x1.var(ddof=1) / n1
    se2 = x2.var(ddof=1) / n2
    t = (m1 - m2) / math.sqrt(se1 + se2)
    df = (se1 + se2) ** 2 / (se1 ** 2 / (n1 - 1) + se2 ** 2 / (n2 - 1))
    return pd.DataFrame([{"n1": n1, "n2": n2, "mean_diff": m1 - m2,
                          "t_stat": t, "df_welch": df}])


def _anova_f_frame(groups, values, ssb_scale):
    """One-way ANOVA from Fisher's decomposition: SSB = sum n_g (m_g - m)^2,
    SSW = sum (x - m_g)^2, F = (SSB/(k-1)) / (SSW/(N-k)),
    eta^2 = SSB/(SSB+SSW). ssb_scale matches the engine's fixed-point
    presentation units for the raw SS columns."""
    df = pd.DataFrame({"g": groups, "v": values.astype(float)})
    gm = df.groupby("g")["v"].agg(["count", "mean"])
    grand = df.v.mean()
    ssb = float((gm["count"] * (gm["mean"] - grand) ** 2).sum())
    ssw = float(((df.v - df.g.map(gm["mean"])) ** 2).sum())
    k, n = len(gm), len(df)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return pd.DataFrame([{"k_groups": k, "n": n, "ssb": ssb * ssb_scale,
                          "ssw": ssw * ssb_scale, "f_stat": f,
                          "eta2": ssb / (ssb + ssw)}])


@audit("q_anova_f", atol=1e-5)
def anova_f():
    c = table("customer")
    v = half_up(c.c_acctbal.values, 100)  # exact cents
    # engine SS presentation units: (1e6 * cents)^2
    return _anova_f_frame(c.c_mktsegment.values, v, 1e12)


@audit("q_levene", atol=1e-5)
def levene():
    # Levene (1960), mean-centered: ANOVA F over z_ij = |x_ij - m_i|.
    e = table("events")
    v = half_up(e.value.values, 1000).astype(float)  # exact milli-units
    df = pd.DataFrame({"g": e.event_type.values, "v": v})
    means = df.groupby("g")["v"].transform("mean")
    z = (df.v - means).abs()
    # engine z lives in 1e6*milli units, then SS in (1e3 * that)^2
    return _anova_f_frame(df.g.values, z.values, 1e18)


@audit("q_kruskal_wallis", atol=2e-5)
def kruskal_wallis():
    # Kruskal & Wallis (1952): H = 12/(N(N+1)) sum R_g^2/n_g - 3(N+1),
    # tie-adjusted H' = H / (1 - sum(t^3 - t)/(N^3 - N)).
    c = table("customer")
    v = half_up(c.c_acctbal.values, 100)
    g = c.c_mktsegment.values
    ranks = rankdata_avg(v)
    df = pd.DataFrame({"g": g, "r": ranks})
    N = len(df)
    per = df.groupby("g")["r"].agg(["sum", "count"])
    H = 12.0 / (N * (N + 1)) * float((per["sum"] ** 2 / per["count"]).sum()) \
        - 3.0 * (N + 1)
    _, counts = np.unique(v, return_counts=True)
    tie = int((counts.astype(object) ** 3 - counts).sum())
    h_adj = H / (1.0 - tie / float(N ** 3 - N))
    # exact integer presentation intermediates: R2_g = 2*R_g (always int),
    # t_sum = sum floor((2R_g)^2 / n_g)
    t_sum = 0
    for _, row in per.iterrows():
        r2 = int(round(2 * row["sum"]))
        t_sum += (r2 * r2) // int(row["count"])
    return pd.DataFrame([{"k_groups": len(per), "n": N, "t_sum": t_sum,
                          "tie_sum": tie, "h": H, "h_adj": h_adj}])


@audit("q_ab_srm")
def ab_srm():
    # Sample-ratio-mismatch chi-square vs a 50/50 design (1 dof):
    # chi2 = sum (O-E)^2/E with E = (n1+n2)/2  ==  (n1-n2)^2/(n1+n2);
    # signed z = (n1-n2)/sqrt(n1+n2), chi2 = z^2.
    c = table("customer")
    arm_a = np.array([md5h60(k) % 2 == 0 for k in c.c_custkey])
    rows = []
    strata = [None] + sorted(c.c_mktsegment.unique())
    # engine emits the overall row with NULL stratum, NULLS FIRST
    n1_all = int(arm_a.sum())
    n2_all = int((~arm_a).sum())
    for s in strata:
        if s is None:
            n1, n2 = n1_all, n2_all
        else:
            m = (c.c_mktsegment == s).values
            n1 = int((arm_a & m).sum())
            n2 = int((~arm_a & m).sum())
        rows.append({"stratum": s, "n1": n1, "n2": n2,
                     "chi2_x1e6": ((n1 - n2) * (n1 - n2) * 1000000) // (n1 + n2),
                     "z": (n1 - n2) / math.sqrt(n1 + n2)})
    return pd.DataFrame(rows)


# --- rank statistics / classifier evaluation --------------------------------

def _mwu_frame(v, is1, col_names):
    """Mann & Whitney (1947) via midranks: U1 = R1 - n1(n1+1)/2.
    Emits the engine's presentation (2*U1 as an exact int; rank-biserial
    r = 1 - 2*U1/(n1*n2), Wendt 1972)."""
    ranks = rankdata_avg(v)
    n1 = int(is1.sum())
    n2 = int(len(v) - n1)
    r1x2 = int(round(2 * ranks[is1].sum()))   # 2*R1 is always integral
    u2x = r1x2 - n1 * (n1 + 1)                # = 2*U1
    rb = 1.0 - u2x / float(n1 * n2)
    a, b, c, d = col_names
    return pd.DataFrame([{a: n1, b: n2, c: u2x, d: rb}])


@audit("q_mannwhitney_u")
def mannwhitney_u():
    o = table("orders")
    o = o[o.o_orderpriority.isin(["1-URGENT", "2-HIGH"])]
    v = half_up(o.o_totalprice.values, 100)
    return _mwu_frame(v, (o.o_orderpriority == "1-URGENT").values,
                      ("n1", "n2", "u2x", "rank_biserial"))


@audit("q_mannwhitney_continuous")
def mannwhitney_continuous():
    o = table("orders")
    v = np.array([md5h60(k) / 1152921504606846976.0 for k in o.o_orderkey])
    return _mwu_frame(v, (o.o_custkey % 2 == 0).values,
                      ("n1", "n2", "u2x", "rank_biserial"))


@audit("q_eval_auc")
def eval_auc():
    # AUC == P(score_pos > score_neg) + P(=)/2 == U1/(n1*n2), the
    # Mann-Whitney identity (Hanley & McNeil 1982).
    d = table("documents")
    v = d.n_chars.values.astype(np.int64)
    pos = (d.lang == "en").values
    ranks = rankdata_avg(v)
    n1, n2 = int(pos.sum()), int((~pos).sum())
    r1x2 = int(round(2 * ranks[pos].sum()))
    num = r1x2 - n1 * (n1 + 1)
    return pd.DataFrame([{"n_pos": n1, "n_neg": n2, "auc_2x_num": num,
                          "auc": num / (2.0 * n1 * n2)}])


@audit("q_ks_test")
def ks_test():
    # Two-sample Kolmogorov-Smirnov: D = sup_x |F1(x) - F2(x)|, attained
    # at a sample point; exact integer numerator |c1*n2 - c2*n1|.
    o = table("orders")
    o = o[o.o_orderpriority.isin(["1-URGENT", "2-HIGH"])]
    v = half_up(o.o_totalprice.values, 100)
    a = (o.o_orderpriority == "1-URGENT").values
    vals = np.unique(v)
    c1 = np.searchsorted(np.sort(v[a]), vals, side="right")
    c2 = np.searchsorted(np.sort(v[~a]), vals, side="right")
    n1, n2 = int(a.sum()), int((~a).sum())
    dnum = np.abs(c1.astype(object) * n2 - c2.astype(object) * n1)
    best = max(range(len(vals)), key=lambda i: (dnum[i], -vals[i]))
    return pd.DataFrame([{"n1": n1, "n2": n2,
                          "at_value": vals[best] / 100.0,
                          "ks_d": float(dnum[best]) / (n1 * n2)}])


@audit("q_eval_brier")
def eval_brier():
    # Murphy (1973) decomposition of the Brier score:
    # BS = REL - RES + UNC with REL = (1/N) sum n_k (pbar_k - obar_k)^2,
    # RES = (1/N) sum n_k (obar_k - obar)^2, UNC = obar(1 - obar).
    d = table("documents")
    y = (d.lang == "en").values.astype(int)
    pm = np.minimum(999, d.n_chars.values % 500 + np.where(y == 1, 300, 100))
    bins = np.minimum((pm * 10) // 1000, 9)
    N = len(pm)
    npos = int(y.sum())
    # exact integer presentation (milli-prob fixed point, floor divisions)
    se_sum = int(((pm - 1000 * y).astype(object) ** 2).sum())
    obar = (npos * 1000000) // N
    rel_n, res_n = 0, 0
    for k in np.unique(bins):
        m = bins == k
        n_k = int(m.sum())
        pbar = (int(pm[m].sum()) * 1000) // n_k          # micro-prob
        obk = (int(y[m].sum()) * 1000000) // n_k          # micro-prob
        rel_n += n_k * (pbar - obk) ** 2
        res_n += n_k * (obk - obar) ** 2
    brier = se_sum // N
    rel = rel_n // (N * 1000000)
    res = res_n // (N * 1000000)
    unc = (obar * (1000000 - obar)) // 1000000
    # textbook identity crosscheck (quantization allows ~2e-6 slack)
    assert abs((brier - (rel - res + unc)) / 1e6) < 5e-3, \
        f"Murphy identity violated: {brier} vs {rel}-{res}+{unc}"
    return pd.DataFrame([{"n": N, "n_pos": npos, "brier_x1e6": brier,
                          "rel_x1e6": rel, "res_x1e6": res,
                          "unc_x1e6": unc}])


@audit("q_eval_mcnemar")
def eval_mcnemar():
    # McNemar (1947) without continuity correction: chi2 = (b-c)^2/(b+c)
    # over the discordant pairs.
    d = table("documents")
    y = (d.lang == "en").values
    pm = np.minimum(999, d.n_chars.values % 500 + np.where(y, 300, 100))
    pa = pm >= 500
    pb = (d.n_chars.values % 3) == 0
    oka, okb = pa == y, pb == y
    b = int((oka & ~okb).sum())
    c = int((~oka & okb).sum())
    chi = 0 if b + c == 0 else ((b - c) ** 2 * 1000000) // (b + c)
    return pd.DataFrame([{"n": len(d), "n_ok_a": int(oka.sum()),
                          "n_ok_b": int(okb.sum()), "b": b, "c": c,
                          "mcnemar_x1e6": chi}])


# --- correlation / trend ----------------------------------------------------

@audit("q_spearman")
def spearman():
    # Spearman rho == Pearson correlation of the midranks (definition).
    li = table("lineitem")
    rx = rankdata_avg(half_up(li.l_quantity.values, 100))
    ry = rankdata_avg(half_up(li.l_extendedprice.values, 100))
    rho = float(np.corrcoef(rx, ry)[0, 1])
    return pd.DataFrame([{"n": len(li), "rho": rho}])


def _hourly(event_type=None):
    e = table("events")
    if event_type is not None:
        e = e[e.event_type == event_type]
    t = (e.ts.values.astype("datetime64[h]").astype("int64"))
    return pd.Series(t).value_counts().sort_index()


@audit("q_kendall_tau")
def kendall_tau():
    # Kendall (1945) tau-b over the joined hourly click/view series:
    # tau_b = (C - D)/sqrt((n0 - n1)(n0 - n2)), n1/n2 = pairs tied in x/y.
    x = _hourly("click")
    y = _hourly("view")
    j = pd.concat([x, y], axis=1, join="inner").values
    n = len(j)
    C = D = n1 = n2 = 0
    for i in range(n):
        for k in range(i + 1, n):
            dx = j[k, 0] - j[i, 0]
            dy = j[k, 1] - j[i, 1]
            if dx == 0:
                n1 += 1
            if dy == 0:
                n2 += 1
            if dx != 0 and dy != 0:
                if (dx > 0) == (dy > 0):
                    C += 1
                else:
                    D += 1
    n0 = n * (n - 1) // 2
    tau = (C - D) / math.sqrt(float(n0 - n1) * float(n0 - n2))
    return pd.DataFrame([{"n0": n0, "c": C, "d": D, "n1": n1, "n2": n2,
                          "tau_b": tau}])


@audit("q_corr_matrix")
def corr_matrix():
    # Pearson product-moment correlation for each column pair.
    li = table("lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    vals = {c: half_up(li[c].values, 100) / 100.0 for c in cols}
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            rows.append({"x_col": a, "y_col": b,
                         "corr": float(np.corrcoef(vals[a], vals[b])[0, 1])})
    return pd.DataFrame(sorted(rows, key=lambda r: (r["x_col"], r["y_col"])))


@audit("q_rolling_corr")
def rolling_corr():
    # trailing 20-row Pearson per supplier, emitted only for full windows
    # with nonzero variance on both sides; exact int64 power sums.
    li = table("lineitem")
    li = li[li.l_suppkey < 20].copy()
    li["x"] = half_up(li.l_quantity.values, 100)
    li["y"] = half_up(li.l_extendedprice.values, 100)
    li = li.sort_values(["l_suppkey", "l_shipdate", "l_orderkey",
                         "l_linenumber"], kind="mergesort")
    out = []
    W = 20
    for sk, g in li.groupby("l_suppkey"):
        x = g.x.values.astype(np.int64)
        y = g.y.values.astype(np.int64)
        for end in range(W - 1, len(g)):
            xs = x[end - W + 1:end + 1]
            ys = y[end - W + 1:end + 1]
            n = W
            sx, sy = int(xs.sum()), int(ys.sum())
            sxx = int((xs * xs).sum())
            syy = int((ys * ys).sum())
            sxy = int((xs * ys).sum())
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            if vx > 0 and vy > 0:
                corr = (n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy))
                out.append({"l_suppkey": sk, "rn": end + 1, "corr": corr})
    return pd.DataFrame(out)


def _sen_slope(pairs):
    """Sen (1968) slope: median of pairwise slopes dv/dt (t_b > t_a);
    the engine's deterministic pick is the lower median under
    (slope, dv, dt) ordering."""
    ordered = sorted(pairs, key=lambda p: (p[0] / p[1], p[0], p[1]))
    m = len(ordered)
    dv, dt = ordered[(m - 1) // 2]
    return m, dv, dt


@audit("q_theilsen_by_group")
def theilsen_by_group():
    e = table("events")
    rows = []
    for g in sorted(e.event_type.unique()):
        h = _hourly(g)
        t = h.index.values
        v = h.values
        pairs = [(int(v[b] - v[a]), int(t[b] - t[a]))
                 for a in range(len(t)) for b in range(a + 1, len(t))
                 if t[b] > t[a]]
        m, dv, dt = _sen_slope(pairs)
        rows.append({"g": g, "n_pairs": m, "sen_dv": dv, "sen_dt": dt,
                     "sen_slope": dv / dt})
    return pd.DataFrame(rows)


@audit("q_mann_kendall")
def mann_kendall():
    # Mann (1945)/Kendall: S = sum sign(v_b - v_a) over ordered pairs;
    # Var(S) = [t(t-1)(2t+5) - sum c(c-1)(2c+5)]/18 (tie-corrected);
    # z = (S -/+ 1)/sqrt(Var) with continuity correction.
    h = _hourly()
    t = h.index.values
    v = h.values
    n = len(t)
    S = 0
    pairs = []
    for a in range(n):
        for b in range(a + 1, n):
            d = int(v[b] - v[a])
            S += (d > 0) - (d < 0)
            pairs.append((d, int(t[b] - t[a])))
    _, counts = np.unique(v, return_counts=True)
    ts = int(sum(int(c) * (c - 1) * (2 * c + 5) for c in counts if c > 1))
    var18 = n * (n - 1) * (2 * n + 5) - ts
    z = (S - (1 if S > 0 else -1 if S < 0 else 0)) / math.sqrt(var18 / 18.0)
    m, dv, dt = _sen_slope(pairs)
    return pd.DataFrame([{"n_points": n, "n_pairs": m, "s": S,
                          "var18": var18, "z": z, "sen_dv": dv,
                          "sen_dt": dt, "sen_slope": dv / dt}])
