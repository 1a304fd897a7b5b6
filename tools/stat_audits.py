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


# --- time series ------------------------------------------------------------

def _acf_lags(max_lag=6):
    """Pairwise-complete Pearson autocorrelation: corr(v_t, v_{t+lag})
    over pairs where both hours exist (the series' declared acf form)."""
    h = _hourly()
    idx = {int(t): float(v) for t, v in h.items()}
    out = []
    for lag in range(1, max_lag + 1):
        xs, ys = [], []
        for t, v in idx.items():
            if t + lag in idx:
                xs.append(v)
                ys.append(idx[t + lag])
        out.append((lag, len(xs), float(np.corrcoef(xs, ys)[0, 1])))
    return out


@audit("q_acf_hourly")
def acf_hourly():
    return pd.DataFrame([{"lag": l, "n_pairs": n, "acf": a}
                         for l, n, a in _acf_lags()])


@audit("q_pacf_hourly", atol=1e-5)
def pacf_hourly():
    # Levinson-Durbin recursion (Durbin 1960): kappa_m = (r_m -
    # sum_j phi_{m-1,j} r_{m-j}) / e_{m-1}; pacf_m = kappa_m. The engine
    # feeds the 6dp-rounded acf values into the recursion (presentation
    # contract), so the audit does too.
    acf = [r6(a) for _, _, a in _acf_lags()]
    r = acf
    phis = [r[0]]
    e = 1.0 - r[0] * r[0]
    pacfs = [r[0]]
    for m in range(1, 6):
        kap = (r[m] - sum(phis[j] * r[m - 1 - j] for j in range(m))) / e
        phis = [phis[j] - kap * phis[m - 1 - j] for j in range(m)] + [kap]
        e *= (1.0 - kap * kap)
        pacfs.append(kap)
    return pd.DataFrame([{"lag": l + 1, "acf": acf[l], "pacf": pacfs[l]}
                         for l in range(6)])


@audit("q_runs_test", atol=2e-6)
def runs_test():
    # Wald-Wolfowitz (1940) runs test above/below the mean:
    # E[R] = 1 + 2 n1 n2/(n1+n2),
    # Var[R] = 2 n1 n2 (2 n1 n2 - n1 - n2) / ((n1+n2)^2 (n1+n2-1)).
    h = _hourly()
    v = h.values.astype(np.int64)
    n = len(v)
    sv = int(v.sum())
    hi = v * n > sv
    runs = 1 + int((hi[1:] != hi[:-1]).sum())
    n1, n2 = int(hi.sum()), int((~hi).sum())
    # engine's exact fixed-point presentation (nested floor divisions)
    e_x1e6 = 1000000 + (2 * n1 * n2 * 1000000) // (n1 + n2)
    v_x1e6 = ((2 * n1 * n2 * 1000000) // ((n1 + n2) * (n1 + n2))) \
        * (2 * n1 * n2 - n1 - n2) // max(n1 + n2 - 1, 1)
    z = (runs * 1000000 - e_x1e6) / math.sqrt(v_x1e6 * 1e6)
    # textbook crosscheck on the float form
    E = 1 + 2 * n1 * n2 / (n1 + n2)
    V = 2 * n1 * n2 * (2 * n1 * n2 - n1 - n2) / ((n1 + n2) ** 2 * (n1 + n2 - 1))
    assert abs(z - (runs - E) / math.sqrt(V)) < 1e-3, (z, (runs - E) / math.sqrt(V))
    return pd.DataFrame([{"n1": n1, "n2": n2, "runs": runs,
                          "e_x1e6": e_x1e6, "v_x1e6": v_x1e6, "z": z}])


@audit("q_cusum_changepoint")
def cusum_changepoint():
    # CUSUM changepoint location: argmax_i |S_i - (i/n) S_n| (Page 1954 /
    # Pettitt-style cumulative deviation), reported with the max statistic.
    e = table("events").sort_values(["user_id", "ts", "event_id"],
                                    kind="mergesort")
    rows = []
    for uid, g in e.groupby("user_id"):
        v = half_up(g.value.values, 1e6)
        n = len(v)
        c = np.cumsum([int(x) for x in v])
        t = int(c[-1])
        d = [abs(n * int(c[i]) - (i + 1) * t) for i in range(n)]
        best = max(range(n), key=lambda i: (d[i], -(i + 1)))
        rows.append({"user_id": uid, "n": n, "cp_pos": best + 1,
                     "cp_stat": d[best] / (n * 1e6)})
    return pd.DataFrame(rows)


@audit("q_ewma_events")
def ewma_events():
    # EWMA with alpha = 0.5 seeded at the first observation:
    # e_1 = x_1, e_k = (1-alpha) e_{k-1} + alpha x_k.
    e = table("events").sort_values(["user_id", "ts", "event_id"],
                                    kind="mergesort")
    rows = []
    for uid, g in e.groupby("user_id"):
        xs = g.value.values
        acc = float(xs[0])
        for x in xs[1:]:
            acc = acc * 0.5 + float(x) * 0.5
        rows.append({"user_id": uid, "n": len(xs), "ewma": rn(acc, 6)})
    return pd.DataFrame(rows)


@audit("q_seasonal_decomp")
def seasonal_decomp():
    # Classical additive decomposition: trend by centered 2x24 moving
    # average (weights 1,2,...,2,1 over t-12..t+12, denominator 48);
    # seasonal index = mean detrended value per phase (t mod 24).
    h = _hourly()
    idx = {int(t): int(v) for t, v in h.items()}
    phases = {}
    for t, v in idx.items():
        neigh = [(k, idx.get(t + k)) for k in range(-12, 13)]
        if any(nv is None for _, nv in neigh):
            continue
        s2p = sum((1 if abs(k) == 12 else 2) * nv for k, nv in neigh)
        trend_fp = (s2p * 1000000) // 48
        d_fp = v * 1000000 - trend_fp
        phases.setdefault(t % 24, []).append(d_fp)
    rows = []
    for ph in sorted(phases):
        ds = phases[ph]
        rows.append({"phase": ph, "n_points": len(ds), "d_sum": sum(ds),
                     "seasonal": sum(ds) / (len(ds) * 1e6)})
    return pd.DataFrame(rows)


# --- survival / causal -------------------------------------------------------

def _durations():
    """Per-user duration in whole hours between first and last event, and
    the event indicator (users still active in the final window are
    censored)."""
    e = table("events")
    g = e.groupby("user_id").agg(mn=("ts", "min"), mx=("ts", "max"))
    mn_us = g.mn.values.astype("datetime64[us]").astype("int64")
    mx_us = g.mx.values.astype("datetime64[us]").astype("int64")
    t = (mx_us - mn_us) // 3600000000
    ev = g.mx.values < np.datetime64("2024-01-29")
    return g.index.values, t, ev


@audit("q_km_survival")
def km_survival():
    # Kaplan & Meier (1958): S(t) = prod_{t_i <= t} (1 - d_i / n_i) with
    # n_i the at-risk count just before t_i (deaths and censorings both
    # leave the risk set).
    _, t, ev = _durations()
    df = pd.DataFrame({"t": t, "d": ev.astype(int)})
    g = df.groupby("t").agg(d=("d", "sum"), c=("d", "size")).sort_index()
    n = len(df)
    out = []
    s = 1.0
    at_risk = n
    for ti, row in g.iterrows():
        s *= (1.0 - float(row.d) / at_risk)
        out.append({"t": ti, "d": int(row.d), "n_risk": at_risk, "s_t": s})
        at_risk -= int(row.c)
    return pd.DataFrame(out)


@audit("q_logrank", atol=2e-6)
def logrank():
    # Mantel (1966) log-rank: O_a - E_a with E_a = sum d_j n_aj / n_j,
    # V = sum d_j (n_j - d_j)/(n_j - 1) * (n_aj/n_j) (1 - n_aj/n_j);
    # chi2 = (O_a - E_a)^2 / V on 1 dof. All subjects are events here.
    uid, t, _ = _durations()
    a = uid % 2 == 0
    df = pd.DataFrame({"t": t, "a": a})
    g = df.groupby("t").agg(c=("a", "size"), ca=("a", "sum")).sort_index()
    nn, na = len(df), int(a.sum())
    nr, nra = nn, na
    o_a, e_fp, v_fp = 0, 0, 0
    for _, row in g.iterrows():
        dd, da = int(row.c), int(row.ca)   # everyone at t is an event
        o_a += da
        e_fp += (dd * nra * 1000000) // nr
        v_fp += ((dd * (nr - dd) * 1000000) // max(nr - 1, 1)) \
            * nra // nr * (nr - nra) // nr
        nr -= int(row.c)
        nra -= int(row.ca)
    chi2 = (o_a * 1000000 - e_fp) ** 2 / (v_fp * 1e6)
    return pd.DataFrame([{"n": nn, "n_a": na, "o_a": o_a,
                          "e_a_x1e6": e_fp, "v_x1e6": v_fp,
                          "logrank_chi2": chi2}])


@audit("q_causal_did")
def causal_did():
    # Difference-in-differences (Card & Krueger 1994 form):
    # DID = (mean_T,post - mean_T,pre) - (mean_C,post - mean_C,pre).
    e = table("events")
    treat = (e.user_id % 2 == 0).values
    post = (e.ts >= np.datetime64("2024-01-16")).values
    v = half_up(e.value.values, 1e6) / 1e6
    def m(sel):
        return float(v[sel].mean())
    dt = m(treat & post) - m(treat & ~post)
    dc = m(~treat & post) - m(~treat & ~post)
    return pd.DataFrame([{"n_total": len(e), "delta_treat": dt,
                          "delta_control": dc, "did": dt - dc}])


@audit("q_cuped")
def cuped():
    # CUPED (Deng, Xu, Kohavi & Walker 2013): theta = Cov(X,Y)/Var(X);
    # variance ratio Var(Y - theta X)/Var(Y) = 1 - rho^2.
    e = table("events")
    pre = (e.ts < np.datetime64("2024-01-16")).values
    cents = half_up(e.value.values, 100)
    df = pd.DataFrame({"u": e.user_id.values,
                       "x": np.where(pre, cents, 0),
                       "y": np.where(~pre, cents, 0)})
    g = df.groupby("u").agg(x=("x", "sum"), y=("y", "sum"))
    x, y = g.x.values.astype(float), g.y.values.astype(float)
    cov = ((x - x.mean()) * (y - y.mean())).sum()
    vx = ((x - x.mean()) ** 2).sum()
    vy = ((y - y.mean()) ** 2).sum()
    rho2 = cov * cov / (vx * vy)
    return pd.DataFrame([{"n": len(g), "theta": cov / vx,
                          "var_ratio": 1.0 - rho2}])


@audit("q_causal_iv")
def causal_iv():
    # Wald (1940) instrumental-variable estimator:
    # beta_IV = (E[Y|Z=1]-E[Y|Z=0]) / (E[X|Z=1]-E[X|Z=0]).
    e = table("events")
    g = e.groupby("user_id").agg(
        x=("event_type", lambda s: int((s == "view").sum())),
        y=("event_type", lambda s: int((s == "purchase").sum())))
    z = np.array([md5h60(u) % 2 == 0 for u in g.index])
    x, y = g.x.values, g.y.values
    n1, n0 = int(z.sum()), int((~z).sum())
    fs = x[z].mean() - x[~z].mean()
    itt = y[z].mean() - y[~z].mean()
    return pd.DataFrame([{"n1": n1, "n0": n0, "first_stage": fs,
                          "itt": itt,
                          "beta_iv": (itt / fs) if fs != 0 else None}])


@audit("q_causal_rdd", atol=2.1e-6)
def causal_rdd():
    # Sharp regression discontinuity (Thistlethwaite & Campbell 1960):
    # separate OLS on each side of the cutoff within the bandwidth;
    # effect = intercept_right - intercept_left at x = 0.
    c = table("customer")
    o = table("orders").groupby("o_custkey").size()
    x = half_up(c.c_acctbal.values, 100)
    y = c.c_custkey.map(o).fillna(0).values.astype(int)
    band = (x >= -200000) & (x <= 200000)
    rows = {"bandwidth": 200000}
    for side, tag in ((x[band] >= 0, "r"), (x[band] < 0, "l")):
        xs = x[band][side].astype(float)
        ys = y[band][side].astype(float)
        n = len(xs)
        den = n * (xs * xs).sum() - xs.sum() ** 2
        b = (n * (xs * ys).sum() - xs.sum() * ys.sum()) / den
        a = (ys.sum() * (xs * xs).sum() - xs.sum() * (xs * ys).sum()) / den
        rows[f"n_{tag}"] = n
        rows[f"a_{tag}"] = a
        rows[f"b_{tag}"] = b
    rows["rdd_effect"] = rows["a_r"] - rows["a_l"]
    return pd.DataFrame([rows])


# --- drift / distribution distances ------------------------------------------

def _two_sample_chi2_contrib(o1, o2):
    """Pearson two-sample homogeneity chi-square, per-bin contribution,
    computed DIRECTLY as sum over both samples of (O-E)^2/E with
    E_sb = n_s * (o1_b + o2_b) / (n1 + n2) — the definition, not the
    cross-product shortcut (this is the check that would have caught the
    round-9 x(n1+n2) bug)."""
    n1, n2 = o1.sum(), o2.sum()
    N = n1 + n2
    out = []
    for a, b in zip(o1, o2):
        c = a + b
        e1, e2 = n1 * c / N, n2 * c / N
        out.append((a - e1) ** 2 / e1 + (b - e2) ** 2 / e2)
    return np.array(out), int(n1), int(n2)


@audit("q_drift_chisq")
def drift_chisq():
    o = table("orders")
    bins = sorted(o.o_orderpriority.unique())
    h1 = o[o.o_orderkey % 17 != 5].o_orderpriority.value_counts()
    h2 = o[o.o_orderkey % 11 != 3].o_orderpriority.value_counts()
    o1 = np.array([int(h1.get(b, 0)) for b in bins])
    o2 = np.array([int(h2.get(b, 0)) for b in bins])
    contrib, _, _ = _two_sample_chi2_contrib(o1, o2)
    return pd.DataFrame({"bin": bins, "o1": o1, "o2": o2,
                         "contrib": contrib})


@audit("q_psi_deciles", atol=5e-6)
def psi_deciles():
    # Population stability index: PSI = sum (p_b - q_b) ln(p_b / q_b)
    # over bins where both proportions are positive.
    o = table("orders")
    cents = half_up(o.o_totalprice.values, 100)
    b = np.minimum(cents // 5000000, 9)
    even = (o.o_orderkey % 2 == 0).values
    bins = np.unique(b)
    o1 = np.array([int(((b == k) & even).sum()) for k in bins])
    o2 = np.array([int(((b == k) & ~even).sum()) for k in bins])
    n1, n2 = int(o1.sum()), int(o2.sum())
    psi = sum((a / n1 - c / n2) * math.log((a * n2) / (c * n1))
              for a, c in zip(o1, o2) if a > 0 and c > 0)
    return pd.DataFrame([{"k_bins": len(bins),
                          "k_zero": int(((o1 == 0) | (o2 == 0)).sum()),
                          "n_a": n1, "n_b": n2, "psi": psi}])


@audit("q_drift_panel", atol=2e-5)
def drift_panel():
    # TVD = (1/2) sum |p-q|; Pearson chi2; Jensen-Shannon divergence
    # (Lin 1991): JSD = (1/2) sum [p ln(2p/(p+q)) + q ln(2q/(p+q))];
    # Hellinger = sqrt(1 - sum sqrt(p q)) (Bhattacharyya coefficient).
    d = table("documents")
    srcs = sorted(d.source.unique())
    h1 = d[d.doc_id % 2 == 0].source.value_counts()
    h2 = d[d.doc_id % 2 == 1].source.value_counts()
    o1 = np.array([int(h1.get(s, 0)) for s in srcs])
    o2 = np.array([int(h2.get(s, 0)) for s in srcs])
    n1, n2 = int(o1.sum()), int(o2.sum())
    p, q = o1 / n1, o2 / n2
    tvd = 0.5 * np.abs(p - q).sum()
    contrib, _, _ = _two_sample_chi2_contrib(o1, o2)
    # the engine floor-rounds each chi2 term to 1e-6 before summing
    chi2 = sum(math.floor(c * 1e6 + 0.5) for c in contrib) / 1e6
    m = (p + q) / 2
    jsd = 0.5 * sum((pi * math.log(pi / mi) if pi > 0 else 0.0)
                    + (qi * math.log(qi / mi) if qi > 0 else 0.0)
                    for pi, qi, mi in zip(p, q, m))
    hell = math.sqrt(max(0.0, 1.0 - np.sqrt(p * q).sum()))
    return pd.DataFrame([{"k_bins": len(srcs), "n_a": n1, "n_b": n2,
                          "tvd": tvd, "chi2": chi2, "jsd_nats": jsd,
                          "hellinger": hell}])


@audit("q_embedding_drift")
def embedding_drift():
    # centroid shift between cohorts: ||mu_a - mu_b||^2, cosine of the
    # centroids, and the single dimension with the largest shift.
    e = table("embeddings")
    emb = np.stack(e.embedding.values)
    q = np.floor(emb.astype(np.float64) * 1048576 + 0.5).astype(np.int64)
    a = (e.vec_id % 2 == 0).values
    na, nb = int(a.sum()), int((~a).sum())
    sa = q[a].sum(axis=0).astype(object)
    sb = q[~a].sum(axis=0).astype(object)
    ddn = sa * nb - sb * na
    scale = na * nb * 1048576.0
    dist2 = float(sum(d * d for d in ddn)) / (scale * scale)
    cos = float(sum(x * y for x, y in zip(sa, sb))) / math.sqrt(
        float(sum(x * x for x in sa)) * float(sum(y * y for y in sb)))
    top = max(range(len(ddn)), key=lambda i: (ddn[i] * ddn[i], -i))
    return pd.DataFrame([{"n_a": na, "n_b": nb, "n_dims": emb.shape[1],
                          "centroid_dist2": dist2, "centroid_cos": cos,
                          "top_dim": top,
                          "top_dim_shift": float(ddn[top]) / scale}])


@audit("q_feature_chisq")
def feature_chisq():
    # chi-square test of independence, per-cell contribution (O-E)^2/E
    # with E_ij = row_i * col_j / N (Pearson 1900).
    o = table("orders")
    ct = o.groupby(["o_orderpriority", "o_orderstatus"]).size()
    rtot = ct.groupby(level=0).sum()
    ctot = ct.groupby(level=1).sum()
    N = int(ct.sum())
    rows = []
    for (f, cls), n in sorted(ct.items()):
        E = rtot[f] * ctot[cls] / N
        rows.append({"f": f, "cls": cls, "n": int(n),
                     "contrib": (n - E) ** 2 / E})
    return pd.DataFrame(rows)


@audit("q_mutual_info", atol=5e-6)
def mutual_info():
    # Shannon MI in nats: I = sum p_ij ln(p_ij/(p_i p_j));
    # H = -sum p ln p; NMI = I / sqrt(H_x H_y) (Strehl & Ghosh 2002).
    d = table("documents")
    ct = d.groupby(["lang", "source"]).size()
    px = ct.groupby(level=0).sum()
    py = ct.groupby(level=1).sum()
    N = int(ct.sum())
    mi = sum(n / N * math.log(n * N / (px[x] * py[y]))
             for (x, y), n in ct.items())
    hx = -sum(n / N * math.log(n / N) for n in px)
    hy = -sum(n / N * math.log(n / N) for n in py)
    return pd.DataFrame([{"n": N, "k_x": len(px), "k_y": len(py),
                          "mi_nats": mi, "h_x": hx, "h_y": hy,
                          "nmi": mi / math.sqrt(hx * hy)}])


# --- attribution / uplift -----------------------------------------------------

def _kept_prefix():
    """Per-user event sequence truncated at (and including) the first
    purchase — the attribution window shared by the removal/Shapley
    queries."""
    e = table("events").sort_values(["user_id", "ts", "event_id"],
                                    kind="mergesort")
    out = {}
    for uid, g in e.groupby("user_id"):
        ts = list(g.event_type.values)
        if "purchase" in ts:
            ts = ts[:ts.index("purchase") + 1]
        out[uid] = ts
    return out


@audit("q_attribution_lasttouch")
def attribution_lasttouch():
    e = table("events")
    e = e[e.user_id < 100].sort_values(["user_id", "ts", "event_id"],
                                       kind="mergesort")
    rows = []
    for uid, g in e.groupby("user_id"):
        last_click = None
        for _, r in g.iterrows():
            if r.event_type == "purchase":
                rows.append({"event_id": r.event_id, "user_id": uid,
                             "click_event_id": last_click, "value": r.value})
            if r.event_type == "click":
                last_click = r.event_id
    rows.sort(key=lambda r: r["event_id"])
    df = pd.DataFrame(rows)
    df["click_event_id"] = df["click_event_id"].astype("Int64")
    return df


@audit("q_attribution_removal")
def attribution_removal():
    # Markov removal-effect attribution (Anderl, Becker, von Wangenheim &
    # Schumann 2016): absorption probability P(start -> conv) in the
    # first-order journey chain, re-solved with each channel's inbound
    # edges removed; effect_c = 1 - P_without_c / P_all.
    seqs = _kept_prefix()
    from collections import Counter
    cells = Counter()
    for ts in seqs.values():
        chain = ["start"] + ["conv" if t == "purchase" else t for t in ts]
        if chain[-1] != "conv":
            chain.append("null")
        for a, b in zip(chain, chain[1:]):
            cells[(a, b)] += 1
    cells[("conv", "conv")] += 1
    cells[("null", "null")] += 1
    states = sorted({a for a, _ in cells} | {b for _, b in cells})
    tn = Counter()
    for (a, _), n in cells.items():
        tn[a] += n
    channels = sorted({b for (_, b) in cells
                       if b not in ("conv", "null")} - {"start"})

    def absorb_fp(removed):
        # the engine's declared fixed-point contract: 60 synchronous
        # value-iteration steps at 1e6 scale with floor division
        p = {s: (1000000 if s == "conv" else 0) for s in states}
        for _ in range(60):
            p = {s: sum(n * (0 if b == removed else p[b])
                        for (a, b), n in cells.items() if a == s) // tn[s]
                 for s in states}
        return p["start"]

    def absorb_exact(removed):
        # textbook crosscheck: solve p = P p, p(conv)=1, p(null)=0
        idx = {s: i for i, s in enumerate(states)}
        A = np.eye(len(states))
        rhs = np.zeros(len(states))
        for s in states:
            if s == "conv":
                rhs[idx[s]] = 1.0
            elif s == "null":
                pass
            else:
                for (a, b), n in cells.items():
                    if a == s and b != removed:
                        A[idx[s], idx[b]] -= n / tn[s]
        return float(np.linalg.solve(A, rhs)[idx["start"]])

    p_all = absorb_fp(None)
    assert abs(p_all / 1e6 - absorb_exact(None)) < 2e-4, \
        (p_all, absorb_exact(None))
    rows = []
    effs = {}
    for ch in channels:
        p_q = absorb_fp(ch)
        assert abs(p_q / 1e6 - absorb_exact(ch)) < 2e-4
        effs[ch] = 1000000 - p_q * 1000000 // max(p_all, 1)
        rows.append((ch, p_q))
    eff_sum = sum(effs.values())
    return pd.DataFrame([{"channel": ch, "p_conv_all": p_all / 1e6,
                          "p_conv_without": p_q / 1e6,
                          "removal_effect": effs[ch] / 1e6,
                          "attribution_share": effs[ch] / eff_sum}
                         for ch, p_q in rows])


@audit("q_attribution_shapley")
def attribution_shapley():
    # Shapley (1953): phi_c = sum_{S not containing c}
    # |S|! (n-|S|-1)! / n! * (v(S u {c}) - v(S)), with the coalition value
    # v(S) = conversions among users whose touched-channel set is in S.
    seqs = _kept_prefix()
    users = []
    for ts in seqs.values():
        conv = ts and ts[-1] == "purchase"
        chs = frozenset(t for t in ts if t != "purchase")
        users.append((chs, conv))
    channels = sorted(set().union(*[c for c, _ in users]) if users else [])
    nc = len(channels)
    ci = {c: i for i, c in enumerate(channels)}
    masks = {}
    for chs, conv in users:
        m = sum(1 << ci[c] for c in chs)
        masks[m] = masks.get(m, 0) + (1 if conv else 0)
    v = [0] * (1 << nc)
    for m in range(1 << nc):
        v[m] = sum(x for um, x in masks.items() if (um | m) == m)
    fact = [math.factorial(k) for k in range(nc + 1)]
    nums = {}
    for c in channels:
        i = ci[c]
        num = 0
        for m in range(1 << nc):
            if (m >> i) & 1:
                continue
            s = bin(m).count("1")
            num += fact[s] * fact[nc - s - 1] * (v[m | (1 << i)] - v[m])
        nums[c] = num
    tot = sum(nums.values())
    return pd.DataFrame([{"channel": c, "shapley": nums[c] / fact[nc],
                          "share": nums[c] / tot} for c in channels])


@audit("q_eval_qini")
def eval_qini():
    # Uplift by decile and cumulative Qini (Radcliffe 2007):
    # uplift_k = xt_k/nt_k - xc_k/nc_k;
    # Qini_cum = XT_cum - XC_cum * NT_cum / NC_cum.
    e = table("events")
    g = e.groupby("user_id").agg(
        score=("event_type", lambda s: int((s == "view").sum())),
        y=("event_type", lambda s: int((s == "purchase").any())))
    g = g.reset_index()
    g["t"] = [md5h60(u) % 2 == 0 for u in g.user_id]
    g = g.sort_values(["score", "user_id"],
                      ascending=[False, True], kind="mergesort")
    n = len(g)
    base, extra = divmod(n, 10)
    tiles = np.repeat(np.arange(1, 11),
                      [base + (1 if k <= extra else 0) for k in range(1, 11)])
    g["tile"] = tiles
    rows = []
    ntc = xtc = ncc = xcc = 0
    for tile, gg in g.groupby("tile"):
        nt = int(gg.t.sum()); xt = int(gg.y[gg.t].sum())
        nc = int((~gg.t).sum()); xc = int(gg.y[~gg.t].sum())
        ntc += nt; xtc += xt; ncc += nc; xcc += xc
        rows.append({"tile": int(tile), "nt": nt, "xt": xt, "nc": nc,
                     "xc": xc,
                     "uplift": (xt / nt - xc / nc) if nt and nc else None,
                     "qini_cum": (xtc - xcc * ntc / ncc) if ncc else None})
    return pd.DataFrame(rows)


# --- power / multiple testing / bootstrap / conformal ------------------------

@audit("q_power_mde")
def power_mde():
    # Two-proportion power analysis (unpooled normal approximation):
    # n/arm = (z_{1-a/2} + z_{power})^2 (p1(1-p1)+p2(1-p2)) / (p1-p2)^2;
    # MDE at current n = (z1+z2) sqrt(vsum / min(n1,n2)).
    e = table("events")
    conv = e.groupby("user_id").agg(
        c=("event_type", lambda s: int((s == "purchase").any())))
    gsel = conv.index.values % 2 == 0
    n1, x1 = int(gsel.sum()), int(conv.c.values[gsel].sum())
    n2, x2 = int((~gsel).sum()), int(conv.c.values[~gsel].sum())
    p1, p2 = x1 / n1, x2 / n2
    z = norm_ppf(0.975) + norm_ppf(0.8)
    assert abs(z - (1.9599639845400545 + 0.8416212335729143)) < 1e-10
    vsum = p1 * (1 - p1) + p2 * (1 - p2)
    dlt = p1 - p2
    return pd.DataFrame([{
        "n1": n1, "x1": x1, "n2": n2, "x2": x2, "p1": p1, "p2": p2,
        "n_per_arm_req": math.ceil(z * z * vsum / (dlt * dlt))
        if dlt != 0 else None,
        "mde_at_n": z * math.sqrt(vsum / min(n1, n2))}])


def _phi_as(z):
    """Abramowitz & Stegun 26.2.17: 1 - Phi(z) for z >= 0 (|eps|<7.5e-8)."""
    k = 1.0 / (1.0 + 0.2316419 * z)
    poly = k * (0.319381530 + k * (-0.356563782 + k * (1.781477937
        + k * (-1.821255978 + k * 1.330274429))))
    return math.exp(-0.5 * z * z) * 0.3989422804014327 * poly


@audit("q_bh_fdr")
def bh_fdr():
    # Per-stratum two-proportion z (pooled SE), two-sided p, then
    # Benjamini-Hochberg (1995): k* = max{k: p_(k) <= 0.05 k/m};
    # reject ranks 1..k*.
    c = table("customer")
    a = np.array([md5h60(k) % 2 == 0 for k in c.c_custkey])
    conv = (c.c_acctbal > 5000).values.astype(int)
    rows = []
    for s in sorted(c.c_nationkey.unique()):
        m = (c.c_nationkey == s).values
        n1, x1 = int((a & m).sum()), int(conv[a & m].sum())
        n2, x2 = int((~a & m).sum()), int(conv[~a & m].sum())
        valid = n1 > 0 and n2 > 0 and 0 < x1 + x2 < n1 + n2
        if valid:
            p1, p2 = x1 / n1, x2 / n2
            pp = (x1 + x2) / (n1 + n2)
            z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
            p_as = min(math.floor(2 * _phi_as(abs(z)) * 1e9 + 0.5), 10**9)
            # crosscheck the approximation against the erf-exact normal
            assert abs(p_as / 1e9 - 2 * (1 - norm_cdf(abs(z)))) < 5e-7
        else:
            z, p_as = 0.0, 10**9
        rows.append({"s": int(s), "n1": n1, "x1": x1, "n2": n2, "x2": x2,
                     "z": z if valid else 0.0, "p_q": p_as})
    rows.sort(key=lambda r: (r["p_q"], r["s"]))
    mm = len(rows)
    kmax = 0
    for i, r in enumerate(rows):
        if r["p_q"] * mm * 1000 <= (i + 1) * 50000000000:
            kmax = i + 1
    for i, r in enumerate(rows):
        r["rank"] = i + 1
        r["significant"] = (i + 1) <= kmax
        r["p_value"] = r.pop("p_q") / 1e9
    rows.sort(key=lambda r: r["s"])
    return pd.DataFrame(rows)


@audit("q_bootstrap_ci")
def bootstrap_ci():
    # Deterministic Poisson(1) bootstrap (Chamandy et al. 2012, "Estimating
    # uncertainty for massive data streams"): per (replica, row) weight =
    # #{thresholds <= u} against the Poisson(1) cdf quantized to 2^60;
    # percentile CI from the 32 replica means (type-1 index 1+floor(q(b-1))).
    o = table("orders")
    o = o[o.o_custkey < 300]
    cents = half_up(o.o_totalprice.values, 100)
    ids = o.o_orderkey.values
    # Poisson(1) cdf thresholds in 2^60 units (k = 0..6)
    thr = []
    cum, fact = 0.0, 1.0
    for k in range(7):
        if k > 0:
            fact *= k
        cum += math.exp(-1.0) / fact
        thr.append(math.floor(cum * 1.152921504606846976e18))
    b = 32
    means = []
    for rep in range(b):
        sw = swx = 0
        for i, x in zip(ids, cents):
            u = md5h60(f"{rep}_{i}")
            w = sum(1 for t in thr if u >= t)
            sw += w
            swx += w * int(x)
        means.append(r6((swx / 100.0) / sw))
    means.sort()
    def idx(q):
        return math.floor(q * (b - 1))
    return pd.DataFrame([{"b": b, "ci_lo": means[idx(0.05)],
                          "median": means[idx(0.5)],
                          "ci_hi": means[idx(0.95)]}])


@audit("q_conformal_coverage")
def conformal_coverage():
    # Split conformal prediction (Vovk et al. 2005; Lei et al. 2018):
    # qhat = ceil((n_cal+1)(1-alpha))-th smallest calibration residual;
    # test coverage P(|y - pred| <= qhat) >= 1 - alpha by construction.
    d = table("documents")
    bk = np.array([md5h60(i) % 100 for i in d.doc_id])
    pred = d[bk < 60].groupby("lang").n_chars.mean()
    def residuals(sel):
        sub = d[sel]
        return np.floor(np.abs(sub.n_chars.values -
                               sub.lang.map(pred).values) * 1e6 + 0.5).astype(np.int64)
    cal = np.sort(residuals((bk >= 60) & (bk < 80)))
    n_cal = len(cal)
    qhat = int(cal[math.ceil((n_cal + 1) * 90 / 100.0) - 1])
    ts = residuals(bk >= 80)
    ncov = int((ts <= qhat).sum())
    return pd.DataFrame([{"n_train": int((bk < 60).sum()), "n_cal": n_cal,
                          "n_test": len(ts), "n_covered": ncov,
                          "q_hat": qhat / 1e6, "coverage": ncov / len(ts)}])


@audit("q_lift_gains")
def lift_gains():
    # Cumulative gains / lift table: lift_k = rate_k / base_rate,
    # capture_k = cumulative positives / total positives.
    e = table("events")
    g = e.groupby("user_id").agg(
        score=("event_type", lambda s: int((s == "view").sum())),
        y=("event_type", lambda s: int((s == "purchase").any())))
    g = g.reset_index().sort_values(["score", "user_id"],
                                    ascending=[False, True], kind="mergesort")
    n = len(g)
    base, extra = divmod(n, 10)
    g["tile"] = np.repeat(np.arange(1, 11),
                          [base + (1 if k <= extra else 0)
                           for k in range(1, 11)])
    nn, pp = n, int(g.y.sum())
    rows, cum = [], 0
    for tile, gg in g.groupby("tile"):
        pos = int(gg.y.sum())
        cum += pos
        rows.append({"tile": int(tile), "n": len(gg), "pos": pos,
                     "pos_rate": pos / len(gg), "cum_capture": cum / pp,
                     "lift": (pos * nn) / (len(gg) * pp)})
    return pd.DataFrame(rows)


@audit("q_markov_entropy_rate", atol=5e-6)
def markov_entropy_rate():
    # Empirical entropy rate of a first-order chain (Shannon 1948):
    # H = -sum_ij (n_ij/N) ln(n_ij / n_i); predictability = 1 - H/ln k.
    e = table("events").sort_values(["user_id", "ts", "event_id"],
                                    kind="mergesort")
    from collections import Counter
    cells = Counter()
    for _, g in e.groupby("user_id"):
        ts = list(g.event_type.values)
        for a, b in zip(ts, ts[1:]):
            cells[(a, b)] += 1
    tn = Counter()
    for (a, _), n in cells.items():
        tn[a] += n
    N = sum(cells.values())
    k = len(tn)
    H = -sum(n / N * math.log(n / tn[a]) for (a, _), n in cells.items())
    return pd.DataFrame([{"n_transitions": N, "k_states": k,
                          "entropy_rate_nats": H,
                          "max_entropy_nats": math.log(k),
                          "predictability": 1 - H / math.log(k)}])


# --- concentration / moments / profiling --------------------------------------

@audit("q_gini_spend")
def gini_spend():
    # Gini coefficient, rank form (e.g. Sen 1973):
    # G = (2 sum_i i*x_(i) - (n+1) sum x) / (n sum x), x ascending.
    o = table("orders")
    cents = half_up(o.o_totalprice.values, 100)
    s = pd.DataFrame({"k": o.o_custkey.values, "c": cents}) \
        .groupby("k").c.sum().sort_values().values
    n = len(s)
    sv = int(s.sum())
    s2rv = int(sum((i + 1) * int(x) for i, x in enumerate(s)))
    gini = (2 * s2rv - (n + 1) * sv) / (n * sv)
    return pd.DataFrame([{"n": n, "gini": gini}])


@audit("q_hhi_supplier")
def hhi_supplier():
    # Herfindahl-Hirschman index: HHI = sum_i share_i^2 (x1e6 fixed point
    # with floor quantization of each share to 1e-6).
    li = table("lineitem")
    cents = half_up(li.l_extendedprice.values, 100)
    g = pd.DataFrame({"k": li.l_suppkey.values, "c": cents}) \
        .groupby("k").c.sum()
    t = int(g.sum())
    shares = [(int(v) * 1000000) // t for v in g.values]
    hhi = sum(s * s for s in shares) // 1000000
    # textbook float crosscheck
    true_hhi = sum((v / t) ** 2 for v in g.values)
    assert abs(hhi / 1e6 - true_hhi) < 1e-4, (hhi, true_hhi)
    return pd.DataFrame([{"n_groups": len(g), "hhi_x1e6": hhi}])


@audit("q_gini_impurity")
def gini_impurity():
    # Gini impurity: 1 - sum_v p_v^2 per categorical column.
    o = table("orders")
    rows = []
    for c in sorted(["o_orderstatus", "o_orderpriority"]):
        vc = o[c].value_counts()
        t = int(vc.sum())
        g = 1.0 - sum((int(v) / t) ** 2 for v in vc.values)
        rows.append({"col_name": c, "n_distinct": len(vc), "gini": g})
    return pd.DataFrame(rows)


@audit("q_stats_moments")
def stats_moments():
    # classical descriptive moments + OLS slope per return flag:
    # sample variance (n-1), sample covariance, Pearson r, slope = cov/var.
    li = table("lineitem")
    x = half_up(li.l_quantity.values, 100) / 100.0
    y = half_up(li.l_extendedprice.values, 100) / 100.0
    rows = []
    for f in sorted(li.l_returnflag.unique()):
        m = (li.l_returnflag == f).values
        xs, ys = x[m], y[m]
        n = len(xs)
        vx = xs.var(ddof=1)
        cov = ((xs - xs.mean()) * (ys - ys.mean())).sum() / (n - 1)
        corr = float(np.corrcoef(xs, ys)[0, 1])
        rows.append({"l_returnflag": f, "n": n, "mean_x": xs.mean(),
                     "var_x": vx, "std_x": math.sqrt(vx),
                     "covar_xy": cov, "corr_xy": corr,
                     "slope_xy": cov / vx})
    return pd.DataFrame(rows)


@audit("q_seasonality_profile")
def seasonality_profile():
    # chi-square contribution of each (iso-dow, hour) cell against the
    # uniform profile over the 168 weekly cells: (O-E)^2/E, E = N/168.
    e = table("events")
    ts = pd.DatetimeIndex(e.ts)
    dow = ts.dayofweek.values + 1   # ISO: Monday=1
    hod = ts.hour.values
    ct = pd.DataFrame({"dow": dow, "hod": hod}).groupby(["dow", "hod"]).size()
    N = int(ct.sum())
    E = N / 168.0
    rows = [{"dow": int(d), "hod": int(h), "n": int(n),
             "contrib": (n - E) ** 2 / E}
            for (d, h), n in sorted(ct.items())]
    return pd.DataFrame(rows)


@audit("q_ccf_hourly")
def ccf_hourly():
    # cross-correlation: Pearson(click_t, view_{t+lag}) at lags -3..3
    # over pairwise-complete hours.
    x = _hourly("click")
    y = _hourly("view")
    xi = {int(t): float(v) for t, v in x.items()}
    yi = {int(t): float(v) for t, v in y.items()}
    rows = []
    for lag in range(-3, 4):
        xs = [v for t, v in xi.items() if t + lag in yi]
        ys = [yi[t + lag] for t in xi if t + lag in yi]
        rows.append({"lag": lag, "n_pairs": len(xs),
                     "ccf": float(np.corrcoef(xs, ys)[0, 1])})
    return pd.DataFrame(rows)


@audit("q_skew_stats")
def skew_stats():
    # heavy-hitter shares: top-20 keys by count with share of total.
    li = table("lineitem")
    vc = li.l_suppkey.value_counts()
    total = int(vc.sum())
    top = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return pd.DataFrame([{"key": int(k), "n": int(n),
                          "share": r6(n / total), "rank": i + 1}
                         for i, (k, n) in enumerate(top)])


@audit("q_quality_benford")
def quality_benford():
    # Benford (1938) first-digit law: P(d) = log10(1 + 1/d); relative
    # deviation of observed counts from the expectation.
    o = table("orders")
    cents = half_up(o.o_totalprice.values, 100)
    # string form of DECIMAL(12,2) always starts with the integer part
    first = np.array([str(abs(c))[0] if abs(c) >= 100 else "0"
                      for c in cents])
    rows = []
    obs = {d: int((first == str(d)).sum()) for d in range(1, 10)}
    ntot = sum(obs.values())
    for d in range(1, 10):
        if obs[d] == 0:
            continue
        p = r6(math.log10(1 + 1 / d))
        exp = ntot * p
        rows.append({"d": str(d), "n_obs": obs[d],
                     "expected": math.floor(exp * 1e6 + 0.5) / 1e6,
                     "rel_dev": math.floor((obs[d] - exp) / exp * 1e6 + 0.5) / 1e6})
    return pd.DataFrame(rows)


# --- corpus statistics / linear algebra ---------------------------------------

def _tokens_per_doc():
    """whitespace tokenization of trimmed text (the corpus queries'
    declared tokenizer)."""
    import re
    d = table("documents")
    return {int(i): re.split(r"\s+", t.strip()) if t.strip() else [""]
            for i, t in zip(d.doc_id, d.text)}


@audit("text_heaps_law")
def heaps_law():
    # Heaps (1978): vocabulary growth V(n) as cumulative distinct types
    # vs cumulative tokens, in 50-doc buckets (type attributed to the
    # first document containing it).
    toks = _tokens_per_doc()
    first = {}
    per_bucket_toks = {}
    for did in sorted(toks):
        b = did // 50
        ts = toks[did]
        per_bucket_toks[b] = per_bucket_toks.get(b, 0) + len(ts)
        for t in ts:
            if t not in first:
                first[t] = b
    new_types = {}
    for t, b in first.items():
        new_types[b] = new_types.get(b, 0) + 1
    rows, ctoks, cvocab = [], 0, 0
    for b in sorted(per_bucket_toks):
        ctoks += per_bucket_toks[b]
        cvocab += new_types.get(b, 0)
        rows.append({"bucket": b, "docs_seen": (b + 1) * 50,
                     "tokens_seen": ctoks, "vocab": cvocab})
    return pd.DataFrame(rows)


def _type_freqs_ranked():
    from collections import Counter
    f = Counter()
    for ts in _tokens_per_doc().values():
        f.update(ts)
    # rank by frequency desc, token asc (deterministic)
    return sorted(f.items(), key=lambda kv: (-kv[1], kv[0]))


@audit("text_zipf_decades")
def zipf_decades():
    # Zipf (1949): freq * rank ~ const; grouped by rank decade
    # (decade = floor(log10(rank))), reporting mean freq*rank.
    ranked = _type_freqs_ranked()
    rows = {}
    for rnk, (_, freq) in enumerate(ranked, start=1):
        dec = len(str(rnk)) - 1
        n, s = rows.get(dec, (0, 0))
        rows[dec] = (n + 1, s + freq * rnk)
    return pd.DataFrame([{"decade": d, "n_tokens": n, "fr_sum": s,
                          "fr_avg_x1000": (s * 1000) // n}
                         for d, (n, s) in sorted(rows.items())])


@audit("text_vocab_coverage")
def vocab_coverage():
    # top-k vocabulary coverage: share of token mass covered by the k
    # most frequent types.
    ranked = _type_freqs_ranked()
    total = sum(f for _, f in ranked)
    rows = []
    for k in (10, 100, 1000):
        covered = sum(f for _, f in ranked[:k])
        rows.append({"k": k, "covered": covered, "total": total,
                     "coverage_x1e6": (covered * 1000000) // total})
    return pd.DataFrame(rows)


@audit("q_pca_power", atol=16)
def pca_power():
    # Power iteration (von Mises & Pollaczek-Geiringer 1929) on the Gram
    # matrix of a 30% sample, 6 fixed-point iterations at 1e6 scale with
    # per-step max-normalization. The declared contract is SIX rounds (at
    # this data's eigengap ~1.03 that is far from converged), so the
    # textbook crosscheck is against an independent FLOAT power iteration
    # of the same round count, not the limiting eigenvector. atol=16
    # covers fixed-point drift (float-product rounding differences in the
    # Gram cells amplify to a few 1e-6 units over 6 normalized rounds).
    e = table("embeddings")
    sub = e[e.vec_id % 10 < 3]
    emb = np.stack(sub.embedding.values).astype(np.float64)
    dim = emb.shape[1]
    # exact integer Gram: m0[i][j] = sum floor(e_i * e_j * 1e12)
    m = [[0] * dim for _ in range(dim)]
    for i in range(dim):
        prods = np.floor(emb[:, i:i + 1] * emb * 1e12).astype(np.int64)
        sums = prods.sum(axis=0)
        for j in range(dim):
            # duckdb // floors toward -inf; python matches
            m[i][j] = int(sums[j]) // 1000000
    v = [1000000] * dim
    for _ in range(6):
        w = [sum(m[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        mx = max(abs(x) for x in w)
        d = mx // 1000000 or 1
        v = [x // d for x in w]
    # textbook crosscheck: an independent float64 power iteration of the
    # same round count aligns with the fixed-point iterate
    M = np.array([[float(x) for x in row] for row in m])
    vf = np.ones(dim)
    for _ in range(6):
        w = M @ vf
        vf = w / np.abs(w).max()
    vv = np.array(v, dtype=float)
    cos = abs(vf @ vv) / (np.linalg.norm(vf) * np.linalg.norm(vv))
    assert cos > 0.9999, f"fixed-point iterate diverges from float: {cos}"
    order = sorted(range(dim), key=lambda i: (-abs(v[i]), i))[:8]
    return pd.DataFrame([{"i": i + 1, "v": float(v[i])} for i in order])


# --- sketches / quantiles / behavioral ----------------------------------------

@audit("text_hill_tail", atol=5e-6)
def hill_tail():
    # Hill (1975) tail-index estimator over type frequencies:
    # alpha_hat = k / sum_{i=1}^{k} ln(f_(i) / f_(k+1)).
    from collections import Counter
    f = Counter()
    for ts in _tokens_per_doc().values():
        f.update(t for t in ts if t)
    ranked = sorted(f.items(), key=lambda kv: (-kv[1], kv[0]))[:101]
    f_ref = ranked[-1][1]
    tk = ranked[:100]
    k = len(tk)
    denom = sum(math.floor(math.log(fi / f_ref) * 1e12 + 0.5)
                for _, fi in tk)
    alpha = k * 1e12 / denom
    # float crosscheck of the quantized form
    assert abs(alpha - k / sum(math.log(fi / f_ref) for _, fi in tk)) < 1e-6
    return pd.DataFrame([{"k": k, "f_ref": f_ref, "hill_alpha": alpha}])


_STH_CACHE = None

def _source_token_hashes():
    # memoized: several audits call this twice (sigs + sets), and the
    # per-token md5 is the dominant audit cost
    global _STH_CACHE
    if _STH_CACHE is not None:
        return _STH_CACHE
    d = table("documents")
    out = {}
    import re
    for src, txt in zip(d.source, d.text):
        toks = re.split(r"\s+", txt.strip()) if txt.strip() else [""]
        out.setdefault(src, set()).update(toks)
    _STH_CACHE = {s: (toks, sorted(md5h60(t) for t in toks))
                  for s, toks in out.items()}
    return _STH_CACHE


@audit("q_sketch_kmv_distinct")
def kmv_distinct():
    # KMV / bottom-k distinct estimator (Bar-Yossef et al. 2002):
    # D_hat = (k-1) / U_(k) with U_(k) the k-th smallest hash mapped to
    # (0,1); exact count below k.
    rows = []
    for src, (toks, hs) in sorted(_source_token_hashes().items()):
        nh = len(hs)
        if nh < 128:
            est = float(nh)
        else:
            est = r6(127.0 * 1152921504606846976.0 / hs[127])
        rows.append({"source": src, "est_distinct": est,
                     "n_exact": len(toks)})
    return pd.DataFrame(rows)


@audit("q_sketch_kmv_jaccard")
def kmv_jaccard():
    # Broder (1997) bottom-k Jaccard: |lowest-k of (A u B) ^ A ^ B| / k,
    # against the exact token-set Jaccard.
    sigs = {s: hs[:128] for s, (_, hs) in _source_token_hashes().items()}
    sets = {s: toks for s, (toks, _) in _source_token_hashes().items()}
    rows = []
    for a in sorted(sigs):
        for b in sorted(sigs):
            if a >= b:
                continue
            union_low = sorted(set(sigs[a]) | set(sigs[b]))[:128]
            inter = set(union_low) & set(sigs[a]) & set(sigs[b])
            ni = len(sets[a] & sets[b])
            rows.append({"key_a": a, "key_b": b,
                         "est_jaccard": len(inter) / 128,
                         "exact_jaccard":
                             ni / (len(sets[a]) + len(sets[b]) - ni)})
    return pd.DataFrame(rows)


@audit("q_sketch_quantiles")
def sketch_quantiles():
    # hash-ordered reservoir of 64 per group; type-1 (floor) quantiles of
    # the sample.
    import hashlib
    e = table("events")
    rows = []
    for et in sorted(e.event_type.unique()):
        g = e[e.event_type == et]
        keyed = sorted((hashlib.md5(str(i).encode()).hexdigest(), float(v))
                       for i, v in zip(g.event_id, g.value))
        vals = sorted(v for _, v in keyed[:64])
        def pick(q):
            return vals[int(math.floor(q * (len(vals) - 1)))]
        rows.append({"event_type": et, "p50": pick(0.5),
                     "p90": pick(0.9), "p99": pick(0.99)})
    return pd.DataFrame(rows)


@audit("q_percentiles")
def percentiles():
    # linearly interpolated quantiles (Hyndman & Fan type 7):
    # position h = q(n-1), value = x_(floor h) + (h - floor h) * gap.
    li = table("lineitem")
    rows = []
    for f in sorted(li.l_returnflag.unique()):
        g = li[li.l_returnflag == f]
        rows.append({"l_returnflag": f,
                     "med_qty": float(np.percentile(g.l_quantity, 50)),
                     "p25_price": float(np.percentile(g.l_extendedprice, 25)),
                     "p75_price": float(np.percentile(g.l_extendedprice, 75))})
    return pd.DataFrame(rows)


@audit("q_group_percentiles")
def group_percentiles():
    li = table("lineitem")
    rows = []
    for f in sorted(li.l_returnflag.unique()):
        g = li[li.l_returnflag == f]
        rows.append({"l_returnflag": f,
                     "p25_price": float(np.percentile(g.l_extendedprice, 25)),
                     "med_price": float(np.percentile(g.l_extendedprice, 50)),
                     "p75_price": float(np.percentile(g.l_extendedprice, 75))})
    return pd.DataFrame(rows)


@audit("q_cohort_retention")
def cohort_retention():
    # classic weekly cohort retention triangle: share of a first-activity
    # cohort active k weeks later.
    e = table("events")
    ts = pd.DatetimeIndex(e.ts)
    week = (ts - pd.to_timedelta(ts.dayofweek, unit="D")).normalize()
    df = pd.DataFrame({"u": e.user_id.values, "w": week})
    fw = df.groupby("u").w.min()
    aw = df.drop_duplicates()
    cohort = aw.u.map(fw)
    off = ((aw.w.values - cohort.values).astype("timedelta64[D]")
           .astype(int) // 7)
    ct = pd.DataFrame({"cohort_week": cohort.values, "week_offset": off}) \
        .groupby(["cohort_week", "week_offset"]).size()
    cs = fw.value_counts()
    rows = [{"cohort_week": cw, "week_offset": int(k),
             "n_active": int(n), "n_cohort": int(cs[cw]),
             "retention": int(n) / int(cs[cw])}
            for (cw, k), n in sorted(ct.items()) if k <= 8]
    return pd.DataFrame(rows)


def _funnel_times():
    e = table("events")
    us = e.ts.values.astype("datetime64[us]").astype("int64")
    df = pd.DataFrame({"u": e.user_id.values, "t": us,
                       "ty": e.event_type.values})
    t1 = df[df.ty == "view"].groupby("u").t.min()
    j2 = df[df.ty == "click"].join(t1.rename("t1"), on="u", how="inner")
    t2 = j2[j2.t > j2.t1].groupby("u").t.min()
    j3 = df[df.ty == "purchase"].join(t2.rename("t2"), on="u", how="inner")
    t3 = j3[j3.t > j3.t2].groupby("u").t.min()
    return t1, t2, t3


@audit("q_funnel")
def funnel():
    t1, t2, t3 = _funnel_times()
    return pd.DataFrame([
        {"step": 1, "step_name": "view", "n_users": len(t1)},
        {"step": 2, "step_name": "click", "n_users": len(t2)},
        {"step": 3, "step_name": "purchase", "n_users": len(t3)}])


@audit("q_funnel_latency")
def funnel_latency():
    # median (lower, (n+1)//2-th order statistic) step-to-step latency
    t1, t2, t3 = _funnel_times()
    rows = []
    for step, (lo, hi) in enumerate([(t1, t2), (t2, t3)], start=1):
        d = sorted((hi - lo.loc[hi.index]).values)
        med = d[(len(d) + 1) // 2 - 1]
        rows.append({"step": step, "n": len(d), "median_s": med / 1e6})
    return pd.DataFrame(rows)


# --- calibration / isotonic / QQ ----------------------------------------------

def _calib_bins():
    d = table("documents")
    y = (d.lang == "en").values.astype(int)
    pm = np.minimum(999, d.n_chars.values % 500 + np.where(y == 1, 300, 100))
    bins = np.minimum((pm * 10) // 1000, 9)
    return bins, y, pm


@audit("q_eval_calibration")
def eval_calibration():
    bins, y, pm = _calib_bins()
    rows = []
    for b in sorted(np.unique(bins)):
        m = bins == b
        n = int(m.sum())
        npos = int(y[m].sum())
        sm = int(pm[m].sum())
        mean_p = sm / (n * 1000)
        rate = npos / n
        rows.append({"bin": int(b), "n": n, "n_pos": npos,
                     "sum_milli": sm, "mean_p": mean_p, "pos_rate": rate,
                     "abs_gap": abs(mean_p - rate)})
    return pd.DataFrame(rows)


@audit("q_eval_isotonic")
def eval_isotonic():
    # PAVA isotonic regression (Ayer et al. 1955): merge adjacent pools
    # while a pool's rate exceeds its successor's; the fit is unique, so
    # any merge order gives the same pools.
    bins, y, _ = _calib_bins()
    stats = []
    for b in sorted(np.unique(bins)):
        m = bins == b
        stats.append([int(b), int(b), int(m.sum()), int(y[m].sum())])
    pools = [list(s) for s in stats]
    changed = True
    while changed:
        changed = False
        for k in range(len(pools) - 1):
            lo1, hi1, n1, p1 = pools[k]
            lo2, hi2, n2, p2 = pools[k + 1]
            if p1 * n2 > p2 * n1:
                pools[k:k + 2] = [[lo1, hi2, n1 + n2, p1 + p2]]
                changed = True
                break
    out = []
    for b0, b1, n, npos in stats:
        pl = next(p for p in pools if p[0] <= b0 <= p[1])
        out.append({"bin": b0, "n": n, "n_pos": npos,
                    "iso_rate_x1e6": (pl[3] * 1000000) // pl[2]})
    return pd.DataFrame(out)


@audit("q_qq_deciles")
def qq_deciles():
    o = table("orders")
    v = o.o_totalprice.values.astype(float)
    even = (o.o_orderkey % 2 == 0).values
    qs = np.arange(10, 100, 10)
    qe = np.percentile(v[even], qs)
    qd = np.percentile(v[~even], qs)
    return pd.DataFrame([{"decile": i + 1, "q_even": qe[i], "q_odd": qd[i],
                          "qq_gap": qe[i] - qd[i]} for i in range(9)])


@audit("q_quantile_normalize")
def quantile_normalize():
    c = table("customer").sort_values(["c_nationkey", "c_acctbal",
                                       "c_custkey"], kind="mergesort")
    rows = []
    for nk, g in c.groupby("c_nationkey"):
        n = len(g)
        for rn, (_, r) in enumerate(g.iterrows(), start=1):
            rows.append({"c_custkey": r.c_custkey, "c_nationkey": nk,
                         "rn": rn,
                         "pct": (rn - 1) / (n - 1) if n > 1 else None})
    return pd.DataFrame(rows)


@audit("q_sketch_kmv_containment")
def kmv_containment():
    # bottom-k containment estimate (Broder 1997 / Agarwal et al.):
    # C(A,B) ~= |L ^ A ^ B| / |L ^ A| with L the k lowest hashes of A u B;
    # exact containment |A ^ B|/|A| for reference.
    sigs = {s: hs[:128] for s, (_, hs) in _source_token_hashes().items()}
    sets = {s: toks for s, (toks, _) in _source_token_hashes().items()}
    rows = []
    for a in sorted(sigs):
        for b in sorted(sigs):
            if a == b:
                continue
            low = sorted(set(sigs[a]) | set(sigs[b]))[:128]
            la = set(low) & set(sigs[a])
            est = (len(la & set(sigs[b])) / len(la)) if la else None
            ni = len(sets[a] & sets[b])
            rows.append({"key_a": a, "key_b": b, "est_containment": est,
                         "exact_containment": ni / len(sets[a])})
    return pd.DataFrame(rows)


# --- descriptive text / segmentation -------------------------------------------

@audit("text_lexical_diversity")
def lexical_diversity():
    # type-token ratio and the repeat probability sum c(c-1)/(n(n-1))
    # (Simpson/Yule-style repeat index).
    from collections import Counter
    rows = []
    for did, ts in sorted(_tokens_per_doc().items()):
        c = Counter(ts)
        n = len(ts)
        coll = sum(v * (v - 1) for v in c.values())
        rows.append({"doc_id": did, "n_tokens": n, "n_types": len(c),
                     "ttr": len(c) / n,
                     "rep_prob": coll / (n * (n - 1)) if n > 1 else 0.0})
    return pd.DataFrame(rows)


@audit("text_stats")
def text_stats():
    d = table("documents").sort_values("doc_id")
    toks = _tokens_per_doc()
    rows = []
    for _, r in d.iterrows():
        ts = toks[int(r.doc_id)]
        n = len(ts)
        rows.append({"doc_id": r.doc_id, "lang": r.lang,
                     "source": r.source, "n_chars": r.n_chars,
                     "n_tokens": n, "n_distinct": len(set(ts)),
                     "ttr": len(set(ts)) / n,
                     "mean_token_len": sum(len(t) for t in ts) / n,
                     "est_subword_tokens":
                         sum(math.ceil(len(t) / 4.0) for t in ts)})
    return pd.DataFrame(rows)


@audit("q_pareto_abc")
def pareto_abc():
    # ABC / Pareto classification on cumulative revenue share
    # (A <= 80%, B <= 95%, C above).
    li = table("lineitem")
    li = li[li.l_partkey < 500]
    cents = half_up(li.l_extendedprice.values, 100)
    g = pd.DataFrame({"part": li.l_partkey.values, "c": cents}) \
        .groupby("part").c.sum()
    tot = int(g.sum())
    order = sorted(g.items(), key=lambda kv: (-kv[1], kv[0]))
    cum = 0
    cls = {}
    for part, rev in order:
        cum += int(rev)
        cls[part] = "A" if cum * 100 <= tot * 80 else \
                    "B" if cum * 100 <= tot * 95 else "C"
    return pd.DataFrame([{"part": int(p), "rev": int(g[p]) / 100.0,
                          "abc": cls[p]} for p in sorted(g.index)])


@audit("q_rfm_segments")
def rfm_segments():
    # RFM quintile scoring (Hughes 1994): NTILE(5) on recency asc,
    # frequency desc, monetary desc; rule-based segment labels.
    o = table("orders")
    ref = np.datetime64("2001-08-02")
    g = o.groupby("o_custkey").agg(mx=("o_orderdate", "max"),
                                   frequency=("o_orderkey", "size"))
    cents = pd.DataFrame({"k": o.o_custkey.values,
                          "c": half_up(o.o_totalprice.values, 100)}) \
        .groupby("k").c.sum()
    g["recency_days"] = ((ref - g.mx.values.astype("datetime64[D]"))
                         .astype("timedelta64[D]").astype(int))
    g["monetary"] = (cents / 100.0)
    g = g.reset_index()
    n = len(g)

    def ntile(keys):
        order = sorted(range(n), key=keys)
        base, extra = divmod(n, 5)
        out = [0] * n
        pos = 0
        for t in range(1, 6):
            sz = base + (1 if t <= extra else 0)
            for i in order[pos:pos + sz]:
                out[i] = t
            pos += sz
        return out

    g["r_score"] = ntile(lambda i: (g.recency_days[i], g.o_custkey[i]))
    g["f_score"] = ntile(lambda i: (-g.frequency[i], g.o_custkey[i]))
    g["m_score"] = ntile(lambda i: (-g.monetary[i], g.o_custkey[i]))
    def seg(r):
        if r.r_score <= 2 and r.f_score <= 2:
            return "champion"
        if r.f_score <= 2:
            return "loyal"
        if r.r_score >= 4:
            return "at_risk"
        return "regular"
    g["segment"] = g.apply(seg, axis=1)
    g["monetary"] = [rn(m, 2) for m in g.monetary]
    g["ord"] = g.r_score + g.f_score + g.m_score
    g = g.sort_values(["ord", "o_custkey"], kind="mergesort").head(50)
    return g[["o_custkey", "recency_days", "frequency", "monetary",
              "r_score", "f_score", "m_score", "segment"]]


@audit("q_assoc_rules")
def assoc_rules():
    # Association-rule measures (Agrawal & Srikant 1994; Brin et al. 1997):
    # confidence(A->B) = supp(A,B)/supp(A); lift = supp(A,B) N / (supp(A)
    # supp(B)); minimum pair support 2; top 20 by lift.
    li = table("lineitem")
    ps = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_orders = ps.l_orderkey.nunique()
    item = ps.groupby("l_partkey").size()
    from collections import Counter
    pair = Counter()
    for _, g in ps.groupby("l_orderkey"):
        parts = sorted(g.l_partkey.values)
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair[(int(parts[i]), int(parts[j]))] += 1
    rows = []
    for (a, b), n in pair.items():
        if n < 2:
            continue
        na, nb = int(item[a]), int(item[b])
        rows.append({"pa": a, "pb": b, "n_pair": n, "n_a": na, "n_b": nb,
                     "conf_ab_x1e6": (n * 1000000) // na,
                     "conf_ba_x1e6": (n * 1000000) // nb,
                     "lift_x1e6": (n * 1000000 * n_orders) // (na * nb)})
    rows.sort(key=lambda r: (-r["lift_x1e6"], r["pa"], r["pb"]))
    return pd.DataFrame(rows[:20])


# --- vector-similarity kernels --------------------------------------------------

def _emb_matrix():
    e = table("embeddings")
    return (e.vec_id.values.astype(np.int64), e.label.values,
            np.stack(e.embedding.values).astype(np.float64))


def _knn_frame(cond):
    """cosine top-5 with the engine's deterministic tiebreak
    (score rounded to 6dp desc, neighbor id asc)."""
    ids, labels, emb = _emb_matrix()
    nrm = np.sqrt((emb * emb).sum(axis=1))
    qsel = ids < 10
    rows = []
    for qi in np.where(qsel)[0]:
        cos = (emb @ emb[qi]) / (nrm * nrm[qi])
        cand = [(r6(cos[j]), int(ids[j])) for j in range(len(ids))
                if cond(qi, j, ids, labels)]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for c, nid in cand[:5]:
            rows.append({"q_id": int(ids[qi]), "n_id": nid, "cos": c})
    rows.sort(key=lambda r: (r["q_id"], r["n_id"]))
    return pd.DataFrame(rows)


@audit("knn_cosine_brute")
def knn_cosine_brute():
    # exact cosine top-k: cos = <a,b>/(|a||b|), excluding self.
    return _knn_frame(lambda qi, j, ids, labels: ids[j] != ids[qi])


@audit("knn_hard_negatives")
def knn_hard_negatives():
    # hardest negatives: most-similar DIFFERENT-label vectors.
    return _knn_frame(lambda qi, j, ids, labels: labels[j] != labels[qi])


@audit("dedup_embedding_cosine")
def dedup_embedding_cosine():
    # same-label pairs with cosine >= 0.2 (threshold on the 6dp-rounded
    # score, the engine's publication grain).
    ids, labels, emb = _emb_matrix()
    nrm = np.sqrt((emb * emb).sum(axis=1))
    rows = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if labels[i] != labels[j]:
                continue
            a, b = (i, j) if ids[i] < ids[j] else (j, i)
            c = r6(float(emb[a] @ emb[b]) / (nrm[a] * nrm[b]))
            if c >= 0.2:
                rows.append({"a_id": int(ids[a]), "b_id": int(ids[b]),
                             "cos": c})
    rows.sort(key=lambda r: (r["a_id"], r["b_id"]))
    return pd.DataFrame(rows)


@audit("q_eval_ann_recall")
def eval_ann_recall():
    # recall@5 of the label-cell ANN against the exact cosine top-5
    # (the standard ANN evaluation protocol).
    ids, labels, emb = _emb_matrix()
    nrm = np.sqrt((emb * emb).sum(axis=1))
    rows = []
    for qi in np.where(ids < 10)[0]:
        cos = (emb @ emb[qi]) / (nrm * nrm[qi])
        def topk(mask):
            cand = [(r6(cos[j]), int(ids[j])) for j in np.where(mask)[0]]
            cand.sort(key=lambda t: (-t[0], t[1]))
            return {nid for _, nid in cand[:5]}
        exact = topk(ids != ids[qi])
        ann = topk((labels == labels[qi]) & (ids != ids[qi]))
        hits = len(exact & ann)
        rows.append({"q_id": int(ids[qi]), "hits": hits,
                     "recall_at_5": hits / 5})
    return pd.DataFrame(rows)


# --- streaming statistical queries (outputs audited against the same
# --- textbook algebra over the batch-equivalent input) -----------------------

@audit("stream_drift")
def stream_drift():
    e = table("events")
    bins = sorted(e.event_type.unique())
    h1 = e[e.event_id % 2 == 0].event_type.value_counts()
    h2 = e[e.event_id % 2 == 1].event_type.value_counts()
    o1 = np.array([int(h1.get(b, 0)) for b in bins])
    o2 = np.array([int(h2.get(b, 0)) for b in bins])
    contrib, _, _ = _two_sample_chi2_contrib(o1, o2)
    return pd.DataFrame({"bin": bins, "o1": o1, "o2": o2,
                         "contrib": contrib})


@audit("stream_psi", atol=5e-6)
def stream_psi():
    d = table("documents")
    srcs = sorted(d.source.unique())
    h1 = d[d.doc_id % 2 == 0].source.value_counts()
    h2 = d[d.doc_id % 2 == 1].source.value_counts()
    o1 = np.array([int(h1.get(s, 0)) for s in srcs])
    o2 = np.array([int(h2.get(s, 0)) for s in srcs])
    n1, n2 = int(o1.sum()), int(o2.sum())
    psi = sum((a / n1 - b / n2) * math.log((a * n2) / (b * n1))
              for a, b in zip(o1, o2) if a > 0 and b > 0)
    return pd.DataFrame([{"k_bins": len(srcs),
                          "k_zero": int(((o1 == 0) | (o2 == 0)).sum()),
                          "n_a": n1, "n_b": n2, "psi": psi}])


@audit("stream_srm")
def stream_srm():
    e = table("events")
    arm = np.array([md5h60(u) % 2 == 0 for u in e.user_id])
    n1, n2 = int(arm.sum()), int((~arm).sum())
    return pd.DataFrame([{"n1": n1, "n2": n2,
                          "chi2_x1e6":
                              ((n1 - n2) ** 2 * 1000000) // (n1 + n2)}])


@audit("stream_ewma")
def stream_ewma():
    # integer EWMA alpha=1/4 in 2^32 fixed point, seeded at the first
    # observation; spike = sample > 2x previous smoothed value.
    e = table("events")
    e = e[e.user_id < 40]
    e = e.assign(cents=half_up(e.value.values, 100),
                 tsm=e.ts.values.astype("datetime64[us]").astype("int64"))
    e = e.sort_values(["event_type", "tsm", "event_id"], kind="mergesort")
    rows = []
    for et, g in e.groupby("event_type"):
        s = None
        for _, r in g.iterrows():
            x = int(r.cents) * 4294967296
            if s is None:
                s, spike = x, False
            else:
                spike = x > 2 * s
                s = (3 * s + x) // 4
            rows.append({"event_type": et, "event_id": int(r.event_id),
                         "smoothed": s, "spike": spike})
    rows.sort(key=lambda r: (r["event_type"], r["event_id"]))
    return pd.DataFrame(rows)


# --- kappa / jackknife / survival-extras / SPRT / ECE ---------------------------

def _langid_pred(texts):
    import re
    rules = [("zh", re.compile("[一-鿿]")),
             ("ja", re.compile("[぀-ヿ]")),
             ("ru", re.compile("[Ѐ-ӿ]")),
             ("es", re.compile("[¡¿ñ]")),
             ("de", re.compile("[äöüß]")),
             ("fr", re.compile("[çàâêîôûœ]"))]
    out = []
    for t in texts:
        for lang, rx in rules:
            if rx.search(t):
                out.append(lang)
                break
        else:
            out.append("en")
    return out


@audit("q_eval_kappa")
def eval_kappa():
    # Cohen (1960): kappa = (p_o - p_e)/(1 - p_e),
    # p_e = sum_c (row_c * col_c) / N^2.
    d = table("documents")
    pred = _langid_pred(d.text.values)
    actual = d.lang.values
    N = len(d)
    hit = sum(1 for a, p in zip(actual, pred) if a == p)
    from collections import Counter
    na, npred = Counter(actual), Counter(pred)
    pe = sum(na[c] * npred.get(c, 0) for c in na) / (N * N)
    po = hit / N
    return pd.DataFrame([{"accuracy": po,
                          "kappa": (po - pe) / (1 - pe)}])


@audit("q_jackknife_ratio")
def jackknife_ratio():
    # Delete-one-group jackknife SE of a ratio (Quenouille 1956/Tukey):
    # SE^2 = (g-1)/g * sum_g (theta_(g) - mean)^2 over leave-one-out
    # ratios. The engine quantizes each LOO ratio to 1e-6 first.
    o = table("orders")
    cents = half_up(o.o_totalprice.values, 100)
    gkey = (o.o_custkey % 40).values
    df = pd.DataFrame({"g": gkey, "x": cents, "y": 1})
    g = df.groupby("g").agg(sn=("x", "sum"), sd=("y", "sum"))
    nn, dd, gg = int(g.sn.sum()), int(g.sd.sum()), len(g)
    t_q = [math.floor((nn - int(r.sn)) / (dd - int(r.sd)) * 1e6 + 0.5)
           for _, r in g.iterrows()]
    tt = sum(t_q)
    ss = sum((tq * gg - tt) ** 2 for tq in t_q)
    th = nn / dd
    se = math.sqrt((gg - 1) / gg * ss / (gg * gg * 1e12))
    z = norm_ppf(0.975)
    return pd.DataFrame([{"g_buckets": gg, "theta": th, "se_jack": se,
                          "ci_lo": th - z * se, "ci_hi": th + z * se}])


@audit("q_rmst")
def rmst():
    # Restricted mean survival time: RMST(tau) = integral_0^tau S(t) dt,
    # the area under the Kaplan-Meier step function (S=1 before the
    # first event time). Engine quantizes S to 1e-6 per step.
    km = km_survival()
    km = km[km.t < 700].reset_index(drop=True)
    tau = 700
    area_q = 0
    for i, r in km.iterrows():
        t_next = int(km.t[i + 1]) if i + 1 < len(km) else tau
        s6 = math.floor(r.s_t * 1e6 + 0.5)
        area_q += s6 * (min(t_next, tau) - int(r.t))
    t_first = int(km.t[0])
    return pd.DataFrame([{"tau": tau, "k_times": len(km),
                          "rmst": (t_first * 1000000 + area_q) / 1e6}])


@audit("q_nelson_aalen")
def nelson_aalen():
    # Nelson (1972)/Aalen (1978) cumulative hazard: H(t) = sum d_i/n_i.
    _, t, ev = _durations()
    df = pd.DataFrame({"t": t, "d": ev.astype(int)})
    g = df.groupby("t").agg(d=("d", "sum"), c=("d", "size")).sort_index()
    at_risk = len(df)
    rows, cum = [], 0
    for ti, r in g.iterrows():
        cum += math.floor(int(r.d) / at_risk * 1e12 + 0.5)
        rows.append({"t": int(ti), "d": int(r.d), "n_risk": at_risk,
                     "h_t": cum / 1e12})
        at_risk -= int(r.c)
    return pd.DataFrame(rows)


@audit("q_sequential_sprt")
def sequential_sprt():
    # Wald (1945) SPRT for Bernoulli p0=0.2 vs p1=0.3, alpha=beta=0.05:
    # LLR_n crosses ln((1-beta)/alpha) -> accept H1,
    # ln(beta/(1-alpha)) -> accept H0.
    e = table("events")
    conv = e.groupby("user_id").agg(
        x=("event_type", lambda s: int((s == "purchase").any())))
    la = math.floor(math.log(0.3 / 0.2) * 1e12 + 0.5)
    lb = math.floor(math.log(0.7 / 0.8) * 1e12 + 0.5)
    up = math.floor(math.log(0.95 / 0.05) * 1e12 + 0.5)
    dn = math.floor(math.log(0.05 / 0.95) * 1e12 + 0.5)
    cum, first_h1, first_h0, final = 0, None, None, 0
    for uid in sorted(conv.index):
        x = int(conv.x[uid])
        cum += x * la + (1 - x) * lb
        if first_h1 is None and cum >= up:
            first_h1 = int(uid)
        if first_h0 is None and cum <= dn:
            first_h0 = int(uid)
        final = cum
    if first_h1 is not None and (first_h0 is None or first_h1 <= first_h0):
        decision = "accept_h1"
    elif first_h0 is not None:
        decision = "accept_h0"
    else:
        decision = "continue"
    out = pd.DataFrame([{"n": len(conv), "llr_final": final / 1e12,
                         "first_h1": first_h1, "first_h0": first_h0,
                         "decision": decision}])
    out["first_h1"] = out["first_h1"].astype("Int64")
    out["first_h0"] = out["first_h0"].astype("Int64")
    return out


@audit("q_eval_ece")
def eval_ece():
    # Expected calibration error (Naeini et al. 2015):
    # ECE = sum_k n_k/N |pbar_k - obar_k|; MCE = max_k gap.
    bins, y, pm = _calib_bins()
    N = len(pm)
    gaps = []
    ece_q = 0
    for b in sorted(np.unique(bins)):
        m = bins == b
        n = int(m.sum())
        gap = r6(abs(int(pm[m].sum()) / (n * 1000) - int(y[m].sum()) / n))
        gaps.append(gap)
        ece_q += n * math.floor(gap * 1e6 + 0.5)
    return pd.DataFrame([{"n": N, "k_bins": len(gaps),
                          "ece": ece_q / (N * 1e6), "mce": max(gaps)}])


# --- confusion / standardization / bloom / windows --------------------------------

@audit("q_eval_confusion")
def eval_confusion():
    # per-class precision/recall/F1 from marginal identities:
    # prec = tp/pred_c, rec = tp/actual_c, F1 = 2tp/(actual_c + pred_c).
    d = table("documents")
    pred = _langid_pred(d.text.values)
    from collections import Counter
    na = Counter(d.lang.values)
    npred = Counter(pred)
    tp = Counter(a for a, p in zip(d.lang.values, pred) if a == p)
    rows = []
    for c in sorted(na):
        t, pn = tp.get(c, 0), npred.get(c, 0)
        rows.append({"c": c, "tp": t, "fp": pn - t, "fn": na[c] - t,
                     "prec": (t / pn) if pn > 0 else None,
                     "rec": t / na[c],
                     "f1": 2.0 * t / (na[c] + pn) if na[c] + pn > 0 else None})
    return pd.DataFrame(rows)


@audit("q_direct_standardization")
def direct_standardization():
    # Direct standardization (classic epidemiology): adjusted rate =
    # sum_s w_s * rate_gs with w_s = n_s / N over the pooled standard
    # population; each term floor-quantized at 1e-12.
    e = table("events")
    g = (e.user_id % 2 == 0).values
    s = pd.DatetimeIndex(e.ts).hour.values
    x = (e.event_type == "purchase").values.astype(int)
    df = pd.DataFrame({"g": g, "s": s, "x": x})
    cells = df.groupby(["g", "s"]).agg(n=("x", "size"), x=("x", "sum"))
    n_s = df.groupby("s").size()
    N = len(df)
    rows = []
    for gv in (False, True):
        sub = cells.loc[gv]
        term_q = sum(math.floor(int(n_s[sv]) * int(r.x)
                                / (N * int(r.n)) * 1e12 + 0.5)
                     for sv, r in sub.iterrows())
        rows.append({"g": gv, "n": int(sub.n.sum()), "x": int(sub.x.sum()),
                     "k_strata": len(sub),
                     "crude_rate": int(sub.x.sum()) / int(sub.n.sum()),
                     "adj_rate": term_q / 1e12})
    return pd.DataFrame(rows)


@audit("q_bloom_fpp")
def bloom_fpp():
    # Bloom filter (1970) observed false-positive rate with k=4 hashes
    # into m=2048 bits, vs the exact membership ground truth.
    c = table("customer")
    o = table("orders")
    a = set(int(k) for k in c[c.c_acctbal > 5000].c_custkey)
    b = set(int(k) for k in o.o_custkey)
    def positions(key):
        return {md5h60(f"b{i}|{key}") % 2048 for i in range(4)}
    bits = set()
    for k in a:
        bits |= positions(k)
    n_true = len(a & b)
    n_pass = sum(1 for k in b if positions(k) <= bits)
    return pd.DataFrame([{
        "n_build": len(a), "n_probe": len(b), "n_true": n_true,
        "n_pass": n_pass, "n_false_pos": n_pass - n_true,
        "fpp_observed": (n_pass - n_true) / (len(b) - n_true),
        "m": 2048, "k": 4, "fill": len(bits) / 2048}])


@audit("q_window_median")
def window_median():
    # trailing 25-row interpolated median of hourly counts per type.
    e = table("events")
    h = e.ts.values.astype("datetime64[h]")
    ct = pd.DataFrame({"t": e.event_type.values, "h": h}) \
        .groupby(["t", "h"]).size().rename("n").reset_index()
    rows = []
    for t, g in ct.groupby("t"):
        g = g.sort_values("h")
        ns = g.n.values
        for i in range(len(g)):
            w = ns[max(0, i - 24):i + 1].astype(float)
            rows.append({"event_type": t,
                         "h": g.h.values[i], "n": int(ns[i]),
                         "med25": float(np.percentile(w, 50))})
    return pd.DataFrame(rows)


# --- HLL / DP / raking / text scores ---------------------------------------------

def _hll_est(hashes, m):
    """Flajolet-Fuller-Gandouet-Meunier (2007) HyperLogLog from 60-bit
    hashes: register j = h mod m, rank = (60 - log2 m + 1) - bitlen(h div
    m); raw = alpha_m m^2 / sum 2^-M_j; small-range linear counting
    m ln(m/V) when raw <= 2.5m and V > 0."""
    import math as _m
    lb = int(_m.log2(m))
    shift = 60 - lb + 1
    regs = {}
    for h in hashes:
        j = h % m
        w = h // m
        mj = shift - w.bit_length()
        regs[j] = max(regs.get(j, 0), mj)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    two = 1 << shift
    sp = sum(1 << (shift - mj) for mj in regs.values())
    npz = len(regs)
    raw = alpha * m * m * float(two) / (sp + (m - npz) * two)
    v = m - npz
    if v > 0 and raw <= 2.5 * m:
        return r6(m * math.log(m / v))
    return r6(raw)


@audit("q_sketch_hll", atol=2e-6)
def sketch_hll():
    rows = []
    for src, (toks, hs) in sorted(_source_token_hashes().items()):
        rows.append({"source": src, "est_distinct": _hll_est(hs, 64),
                     "n_exact": len(toks)})
    return pd.DataFrame(rows)


@audit("q_dp_noisy_counts")
def dp_noisy_counts():
    # Laplace mechanism (Dwork et al. 2006) with the inverse-CDF draw:
    # noise = -(1/eps) sgn(u - 1/2) ln(1 - 2|u - 1/2|), u from the
    # seeded md5 uniform (sensitivity 1, eps = 1).
    d = table("documents")
    rows = []
    for lang, n in sorted(d.lang.value_counts().items()):
        u = (md5h60(f"r9|{lang}") % 4503599627370496 + 0.5) / 4503599627370496
        noise = -math.copysign(1.0, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))
        noise = math.floor(noise * 1e6 + 0.5) / 1e6
        rows.append({"bin": lang, "n": int(n), "noise": noise,
                     "n_noisy": r6(n + noise), "epsilon": 1.0})
    return pd.DataFrame(rows)


@audit("q_rake_weights")
def rake_weights():
    # Raking / iterative proportional fitting (Deming & Stephan 1940):
    # alternately scale weights so row then column margins match the
    # target population's; 8 double-passes in 1e6 truncating fixed point.
    d = table("documents")
    odd = d[d.doc_id % 2 == 1]
    even = d[d.doc_id % 2 == 0]
    cells = odd.groupby(["lang", "source"]).size().to_dict()
    nn = sum(cells.values())
    rr = even.lang.value_counts().to_dict()
    cc = even.source.value_counts().to_dict()
    rn = sum(rr.values())
    tr = {r: (int(n) * nn) // rn for r, n in rr.items()}
    tc = {c: (int(n) * nn) // rn for c, n in cc.items()}
    w = {k: 1000000 for k in cells}
    for _ in range(8):
        rowsum = {}
        for (r, c), n in cells.items():
            rowsum[r] = rowsum.get(r, 0) + n * w[(r, c)]
        w = {(r, c): (w[(r, c)] * tr.get(r, 0) * 1000000)
             // max(rowsum[r], 1) for (r, c) in cells}
        colsum = {}
        for (r, c), n in cells.items():
            colsum[c] = colsum.get(c, 0) + n * w[(r, c)]
        w = {(r, c): (w[(r, c)] * tc.get(c, 0) * 1000000)
             // max(colsum[c], 1) for (r, c) in cells}
    rows = [{"lang": r, "source": c, "n": int(n),
             "weight": w[(r, c)] / 1e6,
             "n_weighted": r6(int(n) * float(w[(r, c)]) / 1e6)}
            for (r, c), n in cells.items()]
    rows.sort(key=lambda x: (x["lang"], x["source"]))
    return pd.DataFrame(rows)


@audit("text_quality")
def text_quality():
    # composite quality score: 0.4*TTR + 0.3*min(1, len/100)
    # + 0.3*(1 - stopword fraction), stopwords {the, a}.
    rows = []
    for did, ts in sorted(_tokens_per_doc().items()):
        n = len(ts)
        ttr = len(set(ts)) / n
        stop = sum(1 for t in ts if t in ("the", "a")) / n
        rows.append({"doc_id": did,
                     "quality": r6(ttr * 0.4 + min(1.0, n / 100.0) * 0.3
                                   + (1 - stop) * 0.3)})
    return pd.DataFrame(rows)


@audit("text_langid")
def text_langid():
    d = table("documents")
    pred = _langid_pred(d.text.values)
    ct = pd.DataFrame({"lang": d.lang.values, "predicted": pred}) \
        .groupby(["lang", "predicted"]).size()
    return pd.DataFrame([{"lang": l, "predicted": p, "n": int(n)}
                         for (l, p), n in sorted(ct.items())])


# --- LTTB / Gopher / k-fold -------------------------------------------------------

@audit("q_lttb_downsample")
def lttb_downsample():
    # Largest-Triangle-Three-Buckets (Steinarsson 2013), fixed-anchor
    # bucketed variant: interior points in 48 NTILE buckets; each bucket
    # keeps its max-triangle-area point against the NEIGHBOR BUCKET MEANS
    # (first/last raw points anchor the ends); area via the shoelace
    # |x1(y2-y3)+x2(y3-y1)+x3(y1-y2)| (1e-6 fixed point, ties -> min t).
    h = _hourly()
    t = h.index.values.astype(np.int64)
    v = h.values.astype(np.int64)
    t0, v0 = int(t[0]), int(v[0])
    t9, v9 = int(t[-1]), int(v[-1])
    ti, vi = t[1:-1], v[1:-1]
    n = len(ti)
    base, extra = divmod(n, 48)
    tiles = np.repeat(np.arange(1, 49),
                      [base + (1 if k <= extra else 0) for k in range(1, 49)])
    means = {}
    for k in np.unique(tiles):
        m = tiles == k
        means[int(k)] = (ti[m].mean(), vi[m].mean())
    sel = []
    for k in np.unique(tiles):
        tl, vl = means.get(int(k) - 1, (float(t0), float(v0)))
        tr, vr = means.get(int(k) + 1, (float(t9), float(v9)))
        m = tiles == k
        best = None
        for tt, vv in zip(ti[m], vi[m]):
            area = math.floor(abs(tl * (vv - vr) + tt * (vr - vl)
                                  + tr * (vl - vv)) * 1e6 + 0.5)
            key = (-area, tt)
            if best is None or key < best[0]:
                best = (key, (int(tt), int(vv)))
        sel.append(best[1])
    pts = sorted([(t0, v0), (t9, v9)] + sel)
    return pd.DataFrame([{"t": a, "v": b} for a, b in pts])


@audit("text_gopher_rules")
def gopher_rules():
    # Gopher corpus-quality heuristics (Rae et al. 2021): word count,
    # mean word length, symbol-to-word ratio, alphabetic-word fraction,
    # stopword presence; pass = conjunction.
    import re
    stop = {"the", "be", "to", "of", "and", "that", "have", "with"}
    alpha = re.compile("[A-Za-z]")
    rows = []
    for did, ts in sorted(_tokens_per_doc().items()):
        n = len(ts)
        sum_len = sum(len(t) for t in ts)
        n_alpha = sum(1 for t in ts if alpha.search(t))
        n_symbol = sum(1 for t in ts
                       if t.startswith("#") or t.endswith("...")
                       or t.endswith("…"))
        n_stop = len(stop & set(ts))
        ok_words = 50 <= n <= 100000
        ok_wlen = 3 * n <= sum_len <= 10 * n
        ok_symbol = 10 * n_symbol <= n
        ok_alpha = 10 * n_alpha >= 8 * n
        ok_stop = n_stop >= 2
        rows.append({"doc_id": did, "n_words": n, "ok_words": ok_words,
                     "ok_wlen": ok_wlen, "ok_symbol": ok_symbol,
                     "ok_alpha": ok_alpha, "ok_stop": ok_stop,
                     "pass": ok_words and ok_wlen and ok_symbol
                             and ok_alpha and ok_stop})
    return pd.DataFrame(rows)


@audit("q_stratified_kfold")
def stratified_kfold():
    # stratified k-fold assignment: deterministic hash-ordered
    # round-robin within each stratum (k = 5).
    d = table("documents")
    rows = []
    for lang, g in d.groupby("lang"):
        order = sorted(zip([md5h60(i) for i in g.doc_id], g.doc_id,
                           g.n_chars))
        agg = {}
        for i, (_, did, nc) in enumerate(order):
            f = i % 5
            n, s = agg.get(f, (0, 0))
            agg[f] = (n + 1, s + int(nc))
        for f, (n, s) in sorted(agg.items()):
            rows.append({"lang": lang, "fold": f, "n_docs": n,
                         "sum_chars": s})
    return pd.DataFrame(rows)


# --- deterministic sampling family --------------------------------------------------

@audit("q_sample_hash")
def sample_hash():
    # deterministic 5% hash sample: keep rows with h(id) mod 20 == 0.
    d = table("documents")
    keep = d[[md5h60(i) % 20 == 0 for i in d.doc_id]]
    g = keep.groupby("lang").doc_id.agg(["size", "min", "max"])
    return pd.DataFrame([{"lang": l, "n": int(r["size"]),
                          "min_id": int(r["min"]), "max_id": int(r["max"])}
                         for l, r in g.iterrows()])


@audit("q_sample_stratified")
def sample_stratified():
    # stratified top-20 per stratum under the deterministic hash order.
    d = table("documents")
    rows = []
    for lang, g in d.groupby("lang"):
        order = sorted((md5h60(i), int(i)) for i in g.doc_id)[:20]
        for rn, (_, did) in enumerate(order, start=1):
            rows.append({"lang": lang, "rn": rn, "doc_id": did})
    rows.sort(key=lambda r: (r["lang"], r["rn"]))
    return pd.DataFrame(rows)


@audit("q_sample_weighted")
def sample_weighted():
    # weighted reservoir sampling via exponential clocks (Efraimidis &
    # Spirakis 2006, the -ln(u)/w arrival form): smallest 25 arrivals;
    # u seeded from a 52-bit md5 prefix.
    d = table("documents")
    import hashlib
    rows = []
    for did, nc in zip(d.doc_id, d.n_chars):
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:13], 16)
        arrival = -math.log((h + 1) / 4503599627370496.0) / nc
        rows.append((arrival, int(did), int(nc)))
    rows.sort()
    # the engine presents the selected SET ordered by doc_id (driver
    # compare re-sorts rows; membership is the sampling semantics)
    return pd.DataFrame([{"doc_id": i, "n_chars": c}
                         for _, i, c in sorted(rows[:25],
                                               key=lambda r: r[1])])


@audit("q_sample_temperature")
def sample_temperature():
    # temperature-sampling allocation (T=2 -> w ~ n^(1/2), the
    # multilingual corpus-balancing rule): integer sqrt in 1e6 fixed
    # point, budget 10000 docs split proportionally.
    d = table("documents")
    c = d.source.value_counts().sort_index()
    ws = {}
    for src, n in c.items():
        x = int(n) * 1000000
        s0 = math.floor(math.sqrt(float(x)))
        if (s0 + 1) * (s0 + 1) <= x:
            s0 += 1
        elif s0 * s0 > x:
            s0 -= 1
        ws[src] = s0
    tw = sum(ws.values())
    return pd.DataFrame([{"source": s, "n_docs": int(c[s]), "w_fp": ws[s],
                          "alloc_docs": (ws[s] * 10000) // tw}
                         for s in sorted(ws)])


@audit("q_sample_budget")
def sample_budget():
    # per-source doc budget (5 + len(source) mod 7) under hash order.
    d = table("documents")
    rows = []
    for src, g in d.groupby("source"):
        budget = 5 + (len(src) % 7)
        order = sorted((md5h60(i), int(i)) for i in g.doc_id)[:budget]
        for rn, (_, did) in enumerate(order, start=1):
            rows.append({"source": src, "doc_id": did, "rn": rn})
    rows.sort(key=lambda r: (r["source"], r["rn"]))
    return pd.DataFrame(rows)


@audit("q_sample_token_budget")
def sample_token_budget():
    # token-budget packing: hash-ordered running token sum per source,
    # keep while cum <= 400.
    d = table("documents")
    toks = _tokens_per_doc()
    rows = []
    for src, g in d.groupby("source"):
        order = sorted((md5h60(i), int(i)) for i in g.doc_id)
        cum = 0
        for _, did in order:
            n = len(toks[did])
            cum += n
            if cum <= 400:
                rows.append({"source": src, "doc_id": did, "n_tok": n,
                             "cum_tok": cum})
    rows.sort(key=lambda r: (r["source"], r["doc_id"]))
    return pd.DataFrame(rows)


@audit("q_sketch_cms")
def sketch_cms():
    # Count-Min sketch (Cormode & Muthukrishnan 2005): 4 rows x 256
    # buckets, point estimate = min over rows of the bucket counter;
    # probed at the exact top-20 tokens (estimate >= truth always).
    from collections import Counter
    toks = []
    for ts in _tokens_per_doc().values():
        toks.extend(ts)
    cells = {}
    for t in toks:
        for r in range(4):
            b = md5h60(f"{r}|{t}") % 256
            cells[(r, b)] = cells.get((r, b), 0) + 1
    f = Counter(toks)
    top = sorted(f.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = []
    for t, n in top:
        est = min(cells[(r, md5h60(f"{r}|{t}") % 256)] for r in range(4))
        assert est >= n, (t, est, n)   # the CMS one-sided guarantee
        rows.append({"tok": t, "n_true": n, "n_est": est})
    return pd.DataFrame(rows)


@audit("q_value_bands")
def value_bands():
    # hourly value bands: type-7 deciles of exact cents per hour-of-day.
    e = table("events")
    hod = pd.DatetimeIndex(e.ts).hour.values
    v = half_up(e.value.values, 100).astype(float)
    rows = []
    for h in sorted(np.unique(hod)):
        q = np.percentile(v[hod == h], [10, 50, 90])
        rows.append({"hod": f"{h:02d}", "p10_cents": q[0],
                     "p50_cents": q[1], "p90_cents": q[2]})
    return pd.DataFrame(rows)


@audit("q_split_train_val")
def split_train_val():
    # deterministic 80/10/10 hash split — disjoint and exhaustive.
    d = table("documents")
    s = [("train" if md5h60(i) % 100 < 80 else
          "val" if md5h60(i) % 100 < 90 else "test") for i in d.doc_id]
    g = pd.DataFrame({"split": s, "lang": d.lang.values,
                      "doc_id": d.doc_id.values}) \
        .groupby(["split", "lang"]).doc_id.agg(["size", "min", "max"])
    return pd.DataFrame([{"split": sp, "lang": l, "n": int(r["size"]),
                          "min_id": int(r["min"]), "max_id": int(r["max"])}
                         for (sp, l), r in sorted(g.iterrows())])


# --- IR / language modeling -----------------------------------------------------

@audit("text_tfidf_topk")
def tfidf_topk():
    # raw TF-IDF with the multiplicative idf N/df (Sparck Jones 1972,
    # log-free presentation): top-3 terms per doc for doc_id < 80.
    from collections import Counter
    toks = _tokens_per_doc()
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    nd = len(toks)
    rows = []
    for did in sorted(toks):
        if did >= 80:
            continue
        tf = Counter(toks[did])
        scored = sorted(((t, n, df[t], n * nd / df[t])
                         for t, n in tf.items()),
                        key=lambda x: (-x[3], x[0]))[:3]
        for rk, (t, n, d, s) in enumerate(scored, start=1):
            rows.append({"doc_id": did, "rk": rk, "tok": t, "tf": n,
                         "dfreq": d, "tfidf": s})
    return pd.DataFrame(rows)


@audit("text_collocations")
def collocations():
    # window-2 collocation score: the PMI ratio P(w1,w2)/(P(w1)P(w2))
    # in 1e6 fixed point (log-free monotone form), min pair count 5,
    # symmetric pairs over offsets 1 and 2, top 20.
    from collections import Counter
    toks = _tokens_per_doc()
    pairs = Counter()
    uni = Counter()
    for ts in toks.values():
        uni.update(ts)
        for off in (1, 2):
            for a, b in zip(ts, ts[off:]):
                pairs[(a, b)] += 1
                pairs[(b, a)] += 1
    T = sum(uni.values())
    scored = [(w1, w2, n, (n * T * 1000000) // (uni[w1] * uni[w2]))
              for (w1, w2), n in pairs.items() if n >= 5]
    scored.sort(key=lambda x: (-x[3], x[0], x[1]))
    return pd.DataFrame([{"rk": i + 1, "w1": w1, "w2": w2, "n": n,
                          "score_fp": s}
                         for i, (w1, w2, n, s) in enumerate(scored[:20])])


@audit("text_bm25_topk")
def bm25_topk():
    # Okapi BM25 (Robertson et al. 1994) k1=1.2, b=0.75, with the
    # engine's log-free rational idf (N-df+0.5)/(df+0.5) and exact
    # integer fixed point: tf-term = tf(k1+1)/(tf + k1(1-b+b dl/avgdl)).
    from collections import Counter
    toks = _tokens_per_doc()
    N = len(toks)
    T = sum(len(ts) for ts in toks.values())
    dl = {d: len(ts) for d, ts in toks.items()}
    queries = {"q_analytics": ["query", "filter", "join"],
               "q_streaming": ["stream", "window", "scan"],
               "q_physical": ["hash", "merge", "sort", "table"]}
    qtoks = {t for ts in queries.values() for t in ts}
    tf = {}
    for d, ts in toks.items():
        c = Counter(t for t in ts if t in qtoks)
        for t, n in c.items():
            tf[(d, t)] = n
    dfq = Counter(t for (_, t) in tf)
    rows = []
    for qid, ts in queries.items():
        scores = {}
        for (d, t), n in tf.items():
            if t not in ts:
                continue
            idf_fp = ((2 * (N - dfq[t]) + 1) * 1000000) // (2 * dfq[t] + 1)
            tf_fp = (22 * T * n * 1000000) // (10 * T * n + 3 * T
                                               + 9 * dl[d] * N)
            scores[d] = scores.get(d, 0) + idf_fp * tf_fp
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        for rnk, (d, s) in enumerate(top, start=1):
            rows.append({"query_id": qid, "rnk": rnk, "doc_id": d,
                         "score_fp": s})
    rows.sort(key=lambda r: (r["query_id"], r["rnk"]))
    return pd.DataFrame(rows)


@audit("text_lm_kneser_ney")
def lm_kneser_ney():
    # Interpolated Kneser-Ney bigram probability (Kneser & Ney 1995;
    # Chen & Goodman 1999), discount D = 0.75:
    # p(w2|w1) = max(c(w1 w2)-D, 0)/c(w1 .)
    #          + D N1+(w1 .)/c(w1 .) * N1+(. w2)/|bigram types|;
    # per-doc score = mean over its bigrams (positional sum order).
    from collections import Counter
    toks = _tokens_per_doc()
    bi = Counter()
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] += 1
    cw1, n1l, n1r = Counter(), Counter(), Counter()
    for (a, b), n in bi.items():
        cw1[a] += n
        n1l[a] += 1
        n1r[b] += 1
    tt = len(bi)
    rows = []
    for did in sorted(toks):
        ts = toks[did]
        if len(ts) < 2:
            continue
        acc = 0.0
        nb = 0
        for a, b in zip(ts, ts[1:]):
            p = max(bi[(a, b)] - 0.75, 0.0) / cw1[a] \
                + (0.75 * n1l[a] / cw1[a]) * (n1r[b] / tt)
            acc += p
            nb += 1
        rows.append({"doc_id": did, "n_bigrams": nb,
                     "kn_score": math.floor(acc / nb * 1e6 + 0.5) / 1e6})
    return pd.DataFrame(rows)


@audit("q_markov_transitions")
def markov_transitions():
    # first-order empirical transition matrix: p(next|cur) = n / rowsum.
    e = table("events").sort_values(["user_id", "ts", "event_id"],
                                    kind="mergesort")
    from collections import Counter
    cells = Counter()
    for _, g in e.groupby("user_id"):
        ts = list(g.event_type.values)
        for a, b in zip(ts, ts[1:]):
            cells[(a, b)] += 1
    tn = Counter()
    for (a, _), n in cells.items():
        tn[a] += n
    return pd.DataFrame([{"cur": a, "nxt": b, "n": n, "p": n / tn[a]}
                         for (a, b), n in sorted(cells.items())])


def _bpe(rounds=6):
    """Byte-pair encoding training (Sennrich, Haddow & Birch 2016):
    start from character units over the word-frequency table; each round
    merges the most frequent adjacent unit pair (ties: pair string asc)
    by a greedy left-to-right fold."""
    from collections import Counter
    words = Counter()
    for ts in _tokens_per_doc().values():
        words.update(ts)
    seqs = {w: [list(w), int(f)] for w, f in words.items() if len(w) >= 2}
    merges = []
    for k in range(1, rounds + 1):
        pc = Counter()
        for u, f in seqs.values():
            for a, b in zip(u, u[1:]):
                pc[(a, b)] += f
        (a, b), n = min(pc.items(),
                        key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        merges.append((k, f"{a} {b}", int(n)))
        for w, (u, f) in seqs.items():
            acc = []
            for x in u:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = acc[-1] + x
                else:
                    acc.append(x)
            seqs[w][0] = acc
    vocab = Counter()
    for u, f in seqs.values():
        for unit in u:
            vocab[unit] += f
    return merges, vocab


@audit("text_bpe_merges")
def bpe_merges():
    merges, _ = _bpe(6)
    return pd.DataFrame([{"round": k, "pair": p, "n": n}
                         for k, p, n in merges])


@audit("text_bpe_vocab")
def bpe_vocab():
    _, vocab = _bpe(6)
    top = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return pd.DataFrame([{"unit": u, "n": n} for u, n in top])


# --- join-size sketch / gapfill / DSIR ----------------------------------------------

@audit("q_sketch_join_size")
def sketch_join_size():
    # KMV-based equi-join size estimation (Vengerov et al. 2015 shape):
    # |A join B| ~= J/(1+J) (Da+Db) * (na/Da) * (nb/Db) from bottom-128
    # signatures, vs the exact sum of per-key count products.
    o = table("orders")
    e = table("events")
    ka = [int(k) for k in o.o_custkey]
    kb = [int(k) for k in e.user_id]
    sha = sorted({md5h60(k) for k in set(ka)})
    shb = sorted({md5h60(k) for k in set(kb)})
    def kmv_d(hs):
        return float(len(hs)) if len(hs) < 128 \
            else r6(127.0 * 1152921504606846976.0 / hs[127])
    da, db = kmv_d(sha), kmv_d(shb)
    siga, sigb = set(sha[:128]), set(shb[:128])
    low = sorted(siga | sigb)[:128]
    ej = r6(len([h for h in low if h in siga and h in sigb]) / 128)
    from collections import Counter
    ca, cb = Counter(ka), Counter(kb)
    n_exact = sum(ca[k] * cb[k] for k in ca.keys() & cb.keys())
    est = r6(ej * (da + db) / (1.0 + ej) * (len(ka) / da) * (len(kb) / db))
    return pd.DataFrame([{"est_join": est, "n_exact": n_exact,
                          "rel_err": (est - n_exact) / n_exact}])


@audit("q_resample_gapfill")
def resample_gapfill():
    # hourly spine per user with last-observation-carried-forward fill.
    e = table("events")
    e = e[(e.event_type == "purchase") & (e.user_id < 40)]
    h = e.ts.values.astype("datetime64[h]")
    obs = pd.DataFrame({"u": e.user_id.values, "h": h}) \
        .groupby(["u", "h"]).size().rename("n")
    rows = []
    for u in sorted(obs.index.get_level_values(0).unique()):
        series = obs.loc[u]
        lo, hi = series.index.min(), series.index.max()
        last = None
        t = lo
        while t <= hi:
            n = int(series[t]) if t in series.index else None
            if n is not None:
                last = n
            rows.append({"user_id": u, "h": t, "n": n, "n_fill": last})
            t += np.timedelta64(1, "h")
    df = pd.DataFrame(rows)
    df["n"] = df["n"].astype("Int64")
    df["n_fill"] = df["n_fill"].astype("Int64")
    return df


def _dsir_weights():
    """DSIR domain-affinity weights (Xie et al. 2023, unigram form with
    add-one smoothing): per raw-pool doc, mean over tokens of
    p_target(tok)/p_raw(tok)."""
    d = table("documents")
    toks = _tokens_per_doc()
    from collections import Counter
    ct, cs = Counter(), Counter()
    is_t = {int(i): s == "src0" for i, s in zip(d.doc_id, d.source)}
    for did, ts in toks.items():
        (ct if is_t[did] else cs).update(ts)
    vocab = set(ct) | set(cs)
    nt, ns, v = sum(ct.values()), sum(cs.values()), len(vocab)
    rows = []
    for did in sorted(toks):
        if is_t[did]:
            continue
        ts = toks[did]
        acc = 0.0
        for t in ts:
            acc += (ct[t] + 1) * (ns + v) / ((cs[t] + 1) * (nt + v))
        rows.append({"doc_id": did, "n_toks": len(ts),
                     "dsir_w": math.floor(acc / len(ts) * 1e6 + 0.5) / 1e6})
    return rows


@audit("q_dsir_weights")
def dsir_weights():
    return pd.DataFrame(_dsir_weights())


@audit("q_dsir_resample")
def dsir_resample():
    d = table("documents")
    src = {int(i): s for i, s in zip(d.doc_id, d.source)}
    rows = sorted(_dsir_weights(), key=lambda r: (-r["dsir_w"], r["doc_id"]))[:30]
    return pd.DataFrame([{"doc_id": r["doc_id"], "source": src[r["doc_id"]],
                          "dsir_w": r["dsir_w"]} for r in rows])


# --- HLL variants / CMS cells / synthetic tiles -------------------------------------

def _all_token_hashes():
    hs = set()
    for _, (toks, _) in _source_token_hashes().items():
        hs.update(md5h60(t) for t in toks)
    return sorted(hs)


@audit("q_sketch_hll_merge", atol=2e-6)
def sketch_hll_merge():
    # HLL registers merge by max — the whole-corpus estimate from the
    # union of per-source streams equals the single-stream estimate.
    hs = _all_token_hashes()
    from collections import Counter
    toks = set()
    for _, (ts, _) in _source_token_hashes().items():
        toks.update(ts)
    return pd.DataFrame([{"scope": "all", "est_distinct": _hll_est(hs, 64),
                          "n_exact": len(toks)}])


@audit("q_sketch_hll_windowed", atol=2e-6)
def sketch_hll_windowed():
    # per-hour distinct-user HLL vs exact.
    e = table("events")
    hour = e.ts.values.astype("datetime64[h]")
    df = pd.DataFrame({"hour": hour, "u": e.user_id.values}) \
        .drop_duplicates()
    rows = []
    for h, g in df.groupby("hour"):
        hs = sorted({md5h60(u) for u in g.u})
        rows.append({"hour": h, "est_distinct": _hll_est(hs, 64),
                     "n_exact": len(g)})
    return pd.DataFrame(rows)


@audit("stream_hll")
def stream_hll_registers():
    # the raw per-source HLL register state (j -> max rank) — mergeable
    # streaming state, compared register-by-register.
    rows = []
    for src, (toks, _) in sorted(_source_token_hashes().items()):
        regs = {}
        for t in toks:
            h = md5h60(t)
            j, w = h % 64, h // 64
            regs[j] = max(regs.get(j, 0), 55 - w.bit_length())
        for j in sorted(regs):
            rows.append({"source": src, "j": j, "mj": regs[j]})
    return pd.DataFrame(rows)


@audit("stream_cms_cells")
def stream_cms_cells():
    # the raw CMS counter grid (4 x 256) over all tokens.
    from collections import Counter
    cells = Counter()
    for ts in _tokens_per_doc().values():
        for t in ts:
            for r in range(4):
                cells[(r, md5h60(f"{r}|{t}") % 256)] += 1
    return pd.DataFrame([{"r": r, "bucket": b, "c": n}
                         for (r, b), n in sorted(cells.items())])


@audit("multimodal_tile_stats")
def multimodal_tile_stats():
    # 2x2 tile RGB sums over deterministic synthetic pixels — validates
    # the tile bucketing and channel extraction arithmetic.
    d = table("documents")
    rows = []
    for did in sorted(int(i) for i in d.doc_id if i < 50):
        w, h = 8 + did % 9, 8 + did % 7
        agg = {}
        for x in range(w):
            for y in range(h):
                v = (did * 1315423911 + x * 2654435761 + y * 40503) & 16777215
                tr, tc = (y * 2) // h, (x * 2) // w
                n, r, g, b = agg.get((tr, tc), (0, 0, 0, 0))
                agg[(tr, tc)] = (n + 1, r + ((v >> 16) & 255),
                                 g + ((v >> 8) & 255), b + (v & 255))
        for (tr, tc), (n, r, g, b) in sorted(agg.items()):
            rows.append({"id": did, "tr": tr, "tc": tc, "n_px": n,
                         "sum_r": r, "sum_g": g, "sum_b": b})
    return pd.DataFrame(rows)


@audit("q_eval_hll_error", atol=2e-6)
def eval_hll_error():
    # HLL precision sweep over the 3-gram shingle universe, m = 16/64/256
    # (stderr ~ 1.04/sqrt(m); linear counting where raw <= 2.5m).
    shingles = set()
    for ts in _tokens_per_doc().values():
        seen = set()
        for i in range(max(len(ts) - 2, 0)):
            seen.add(" ".join(ts[i:i + 3]))
        shingles.update(seen)
    hs = sorted(md5h60(g) for g in shingles)
    n = len(shingles)
    rows = []
    for m in (16, 64, 256):
        est = _hll_est(hs, m)
        rows.append({"m": m, "est_distinct": est, "n_exact": n,
                     "rel_err": r6((est - n) / n)})
    return pd.DataFrame(rows)


@audit("q_quality_checks")
def quality_checks():
    # data-quality rule counters: not-null, range, uniqueness, FK orphans.
    o = table("orders")
    c = table("customer")
    fk = (~o.o_custkey.isin(set(c.c_custkey))).sum()
    rows = [
        {"rule": "foreign_key:o_custkey", "n_violations": int(fk)},
        {"rule": "in_range:o_totalprice",
         "n_violations": int(((o.o_totalprice < 0)
                              | (o.o_totalprice >= 1e7)
                              | o.o_totalprice.isna()).sum())},
        {"rule": "not_null:o_orderkey",
         "n_violations": int(o.o_orderkey.isna().sum())},
        {"rule": "unique:o_orderkey",
         "n_violations": int(o.o_orderkey.notna().sum()
                             - o.o_orderkey.nunique())},
    ]
    return pd.DataFrame(rows)


# --- MinHash-LSH pipeline (the flagship dedup operators) --------------------------
# Kirsch & Mitzenmacher (2006) double hashing over an md5 base:
# hash_i(t) = h1(t) + i*h2(t) with h1 = 60-bit, h2 = 56-bit md5 slices;
# signature_i = min over 3-token shingles; 3 bands x 3 rows; bucket
# digest = md5("v|v|v" of the band's signature values).

def _shingles3(ts):
    if len(ts) < 3:
        return set()
    return {" ".join(ts[i:i + 3]) for i in range(len(ts) - 2)}


def _minhash_sig(shingles, k=9):
    import hashlib
    mins = [None] * k
    for t in shingles:
        hx = hashlib.md5(t.encode()).hexdigest()
        h1 = int(hx[:15], 16)
        h2 = int(hx[15:29], 16)
        for i in range(k):
            v = h1 + i * h2
            if mins[i] is None or v < mins[i]:
                mins[i] = v
    return mins


def _lsh_pipeline(doc_filter=lambda d: True):
    """returns (shingle sets, candidate pairs, verified pairs >= 0.5)."""
    import hashlib
    sh = {d: _shingles3(ts) for d, ts in _tokens_per_doc().items()
          if doc_filter(d)}
    buckets = {}
    for d, s in sh.items():
        sig = _minhash_sig(s)
        for b in range(3):
            dig = hashlib.md5(
                "|".join(str(v) for v in sig[3 * b:3 * b + 3]).encode()
            ).hexdigest()
            buckets.setdefault((b, dig), []).append(d)
    cand = set()
    for ds in buckets.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    verified = {}
    for a, b in cand:
        inter = len(sh[a] & sh[b])
        jac = r6(inter / len(sh[a] | sh[b]))
        if jac >= 0.5:
            verified[(a, b)] = jac
    return sh, cand, verified


def _components(pairs):
    """min-reachable-id label per node of the undirected pair graph."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {}
    for start in sorted(adj):
        if start in label:
            continue
        comp, stack = [], [start]
        seen = {start}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            label[x] = m
    return label


@audit("dedup_minhash_lsh")
def dedup_minhash_lsh():
    _, _, verified = _lsh_pipeline()
    return pd.DataFrame([{"a_id": a, "b_id": b, "jac": j}
                         for (a, b), j in sorted(verified.items())])


@audit("dedup_auto_dispatch")
def dedup_auto_dispatch():
    # the dispatcher's floor contract at gate scale: sub-floor corpus ->
    # regime 'exact', probe not paid, n_docs = docs with >=1 shingle,
    # pairs == the exact replay's verified set
    sh, _, verified = _lsh_pipeline()
    n_docs = sum(1 for v in sh.values() if len(v) > 0)
    return pd.DataFrame([{"n_docs": n_docs, "n_pairs": len(verified),
                          "probed": False, "regime": "exact"}])


@audit("q_eval_span_cap_sweep")
def eval_span_cap_sweep():
    # stop-gram tuning table: pair recall under explicit window-posting
    # caps, derived from raw 8-gram postings (a pair survives cap c iff
    # its minimum shared-window posting count <= c).
    toks = _tokens_per_doc()
    posts = {}
    for did, ts in toks.items():
        for i in range(len(ts) - 7):
            posts.setdefault(" ".join(ts[i:i + 8]), set()).add(did)
    min_k = {}
    for g, docs in posts.items():
        k = len(docs)
        if k < 2:
            continue
        ds = sorted(docs)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pr = (ds[i], ds[j])
                if pr not in min_k or k < min_k[pr]:
                    min_k[pr] = k
    n_truth = len(min_k)
    rows = []
    for c in (1000000, 20, 3):
        n_pairs = sum(1 for k in min_k.values() if k <= c)
        # engine emits round(ratio, 6) (Spark HALF_UP); compare() carries
        # 1.1e-6 atol, so plain float rounding is inside tolerance
        rows.append({"max_gram_docs": np.int32(c), "n_truth": n_truth,
                     "n_pairs": n_pairs,
                     "recall": float(np.round(n_pairs / n_truth, 6))})
    return pd.DataFrame(rows)


@audit("dedup_cluster")
def dedup_cluster():
    _, _, verified = _lsh_pipeline()
    label = _components(verified.keys())
    return pd.DataFrame([{"doc_id": d, "cluster_id": label[d]}
                         for d in sorted(label)])


@audit("dedup_survivors")
def dedup_survivors():
    d = table("documents")
    _, _, verified = _lsh_pipeline()
    label = _components(verified.keys())
    dropped = {x for x, l in label.items() if l != x}
    keep = d[~d.doc_id.isin(dropped)]
    g = keep.groupby("source").agg(n_docs=("doc_id", "size"),
                                   sum_chars=("n_chars", "sum"))
    return pd.DataFrame([{"source": s, "n_docs": int(r.n_docs),
                          "sum_chars": int(r.sum_chars)}
                         for s, r in g.iterrows()])


@audit("dedup_survivor_weights")
def dedup_survivor_weights():
    _, _, verified = _lsh_pipeline()
    label = _components(verified.keys())
    from collections import Counter
    w = Counter(label.values())
    return pd.DataFrame([{"doc_id": k, "weight": n}
                         for k, n in sorted(w.items()) if n > 1])


@audit("dedup_priority_survivors")
def dedup_priority_survivors():
    # keeper = min (priority, id) within each cluster; priority here is
    # -int(source[3:5]) (trust the higher-numbered source).
    d = table("documents")
    src = {int(i): s for i, s in zip(d.doc_id, d.source)}
    _, _, verified = _lsh_pipeline()
    label = _components(verified.keys())
    clusters = {}
    for x, l in label.items():
        clusters.setdefault(l, []).append(x)
    dropped = set()
    for l, xs in clusters.items():
        keeper = min(xs, key=lambda x: (-int(src[x][3:5]), x))
        dropped.update(x for x in xs if x != keeper)
    keep = d[~d.doc_id.isin(dropped)]
    g = keep.groupby("source").agg(n_docs=("doc_id", "size"),
                                   sum_chars=("n_chars", "sum"))
    return pd.DataFrame([{"source": s, "n_docs": int(r.n_docs),
                          "sum_chars": int(r.sum_chars)}
                         for s, r in g.iterrows()])


@audit("q_eval_dedup_recall")
def eval_dedup_recall():
    # LSH candidate quality vs the exact >=0.5-jaccard all-pairs truth
    # on the bounded sample.
    sh, cand, _ = _lsh_pipeline(lambda d: d % 3 == 0 and d < 5000)
    docs = sorted(sh)
    truth = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = docs[i], docs[j]
            if not sh[a] or not sh[b]:
                continue
            if r6(len(sh[a] & sh[b]) / len(sh[a] | sh[b])) >= 0.5:
                truth.add((a, b))
    hit = cand & truth
    return pd.DataFrame([{
        "n_truth": len(truth), "n_cand": len(cand), "n_hit": len(hit),
        "precision_lsh": r6(len(hit) / len(cand)) if cand else None,
        "recall_lsh": r6(len(hit) / len(truth)) if truth else None}])


@audit("q_eval_lsh_bucket_sweep")
def eval_lsh_bucket_sweep():
    # the maxBucket tuning table: candidates/hits/precision/recall per
    # cap over the same bounded sample.
    import hashlib
    sh = {d: _shingles3(ts) for d, ts in _tokens_per_doc().items()
          if d % 3 == 0 and d < 5000}
    buckets = {}
    for d, s in sh.items():
        sig = _minhash_sig(s)
        for b in range(3):
            dig = hashlib.md5(
                "|".join(str(v) for v in sig[3 * b:3 * b + 3]).encode()
            ).hexdigest()
            buckets.setdefault((b, dig), []).append(d)
    docs = sorted(sh)
    truth = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            a, b = docs[i], docs[j]
            if sh[a] and sh[b] and \
               r6(len(sh[a] & sh[b]) / len(sh[a] | sh[b])) >= 0.5:
                truth.add((a, b))
    rows = []
    for cap in (2, 5, 1000000):   # presented ascending
        cand = set()
        for ds in buckets.values():
            if len(ds) > cap:
                continue
            ds = sorted(ds)
            for i in range(len(ds)):
                for j in range(i + 1, len(ds)):
                    cand.add((ds[i], ds[j]))
        hit = cand & truth
        rows.append({"max_bucket": cap, "n_truth": len(truth),
                     "n_cand": len(cand), "n_hit": len(hit),
                     "precision_lsh": r6(len(hit) / len(cand)) if cand else None,
                     "recall_lsh": r6(len(hit) / len(truth)) if truth else None})
    return pd.DataFrame(rows)


@audit("dedup_incremental_minhash")
def dedup_incremental_minhash():
    # incremental batch vs base: batch docs colliding with a base doc in
    # ANY band and verifying >= 0.5 are dropped; survivors returned.
    import hashlib
    toks = _tokens_per_doc()
    sh = {d: _shingles3(ts) for d, ts in toks.items()}
    base = {d for d in sh if d % 10 < 8}
    inc = {d for d in sh if d % 10 >= 8}
    buckets = {}
    for d in sorted(sh):
        sig = _minhash_sig(sh[d])
        for b in range(3):
            dig = hashlib.md5(
                "|".join(str(v) for v in sig[3 * b:3 * b + 3]).encode()
            ).hexdigest()
            buckets.setdefault((b, dig), []).append(d)
    dropped = set()
    for ds in buckets.values():
        bs = [d for d in ds if d in base]
        is_ = [d for d in ds if d in inc]
        for i in is_:
            for b in bs:
                if r6(len(sh[i] & sh[b]) / len(sh[i] | sh[b])) >= 0.5:
                    dropped.add(i)
                    break
    return pd.DataFrame([{"doc_id": d} for d in sorted(inc - dropped)])


# --- remaining dedup family --------------------------------------------------------

@audit("dedup_exact")
def dedup_exact():
    import hashlib
    d = table("documents")
    dig = [hashlib.md5(t.encode()).hexdigest() for t in d.text]
    g = pd.DataFrame({"digest": dig, "doc_id": d.doc_id.values}) \
        .groupby("digest").doc_id.agg(["min", "size"])
    rows = [{"digest": k, "keep_id": int(r["min"]),
             "n_copies": int(r["size"])} for k, r in g.iterrows()]
    rows.sort(key=lambda r: r["keep_id"])
    return pd.DataFrame(rows)


@audit("dedup_exact_normalized")
def dedup_exact_normalized():
    # canonical digest: NFC, lowercase, trim + collapse [ \t\n\r\f\v]+.
    import hashlib, re, unicodedata
    ws = re.compile("[ \t\n\r\f\x0B]+")
    d = table("documents")
    dig = []
    for t in d.text:
        n = ws.sub(" ", ws.sub(" ", unicodedata.normalize("NFC", t)
                               .lower()).strip())
        dig.append(hashlib.md5(n.encode()).hexdigest())
    g = pd.DataFrame({"digest": dig, "doc_id": d.doc_id.values}) \
        .groupby("digest").doc_id.agg(["min", "size"])
    rows = [{"digest": k, "keep_id": int(r["min"]),
             "n_copies": int(r["size"])} for k, r in g.iterrows()]
    rows.sort(key=lambda r: r["keep_id"])
    return pd.DataFrame(rows)


@audit("dedup_incremental")
def dedup_incremental():
    import hashlib
    d = table("documents")
    dig = {int(i): hashlib.md5(t.encode()).hexdigest()
           for i, t in zip(d.doc_id, d.text)}
    base = {dig[i] for i in dig if i % 10 < 8}
    inc = sorted(i for i in dig if i % 10 >= 8)
    seen = {}
    for i in inc:
        seen.setdefault(dig[i], i)
    rows = [{"doc_id": i, "digest": g} for g, i in sorted(
        seen.items(), key=lambda kv: kv[1]) if g not in base]
    return pd.DataFrame(rows)


@audit("dedup_simhash")
def dedup_simhash():
    # Charikar (2002) SimHash: 60-bit per-bit majority vote over (all,
    # duplicated) token hashes; exact-signature grouping.
    from collections import Counter
    d = table("documents")
    sigs = []
    for t, did in zip(d.text, d.doc_id):
        import re
        toks = re.split(r"\s+", t.strip()) if t.strip() else [""]
        votes = [0] * 60
        for tok in toks:
            h = md5h60(tok)
            for j in range(60):
                votes[j] += 1 if (h >> j) & 1 else -1
        sig = sum(1 << j for j in range(60) if votes[j] >= 0)
        sigs.append(sig)
    g = pd.DataFrame({"sig": sigs, "doc_id": d.doc_id.values}) \
        .groupby("sig").doc_id.agg(["min", "size"])
    rows = [{"sig": int(k), "keep_id": int(r["min"]),
             "n_docs": int(r["size"])} for k, r in g.iterrows()]
    rows.sort(key=lambda r: r["keep_id"])
    return pd.DataFrame(rows)


@audit("dedup_prefix_jaccard")
def dedup_prefix_jaccard():
    # PPJoin-style prefix filtering (Xiao, Wang, Lin & Yu 2008): order
    # each doc's distinct tokens by (global df asc, token asc); two docs
    # with jaccard >= t MUST share a token in their first
    # sz - ceil(t*sz) + 1 tokens; verify candidates exactly.
    from collections import Counter
    toks = {d: sorted(set(ts)) for d, ts in _tokens_per_doc().items()
            if d % 7 < 2}
    df = Counter()
    for ts in toks.values():
        df.update(ts)
    prefix_of = {}
    for d, ts in toks.items():
        order = sorted(ts, key=lambda t: (df[t], t))
        sz = len(order)
        npfx = sz - math.ceil(0.8 * sz) + 1
        prefix_of[d] = order[:npfx]
    inv = {}
    for d, pfx in prefix_of.items():
        for t in pfx:
            inv.setdefault(t, []).append(d)
    cand = set()
    for ds in inv.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand.add((ds[i], ds[j]))
    rows = []
    for a, b in sorted(cand):
        sa, sb = set(toks[a]), set(toks[b])
        i = len(sa & sb)
        jac = i / (len(sa) + len(sb) - i)
        if jac >= 0.8:
            rows.append({"a_id": a, "b_id": b, "jac": r6(jac)})
    return pd.DataFrame(rows)


def _semantic_cells(train_mask_fn, k=8, iters=2, with_centroids=False):
    """Seeded spherical k-means (SemDeDup, Abbas et al. 2023 shape):
    centroids from the first k training vectors; assignment by max
    cosine (tie -> lower cid); update = per-dim mean of 2^20-quantized
    components, floored, squeezed through float32."""
    ids, _, emb = _emb_matrix()
    nrm = np.sqrt((emb * emb).sum(axis=1))
    order = np.argsort(ids)
    train = [i for i in order if train_mask_fn(int(ids[i]))]
    c = [emb[i].copy() for i in train[:k]]
    sq = {i: np.floor(emb[i] * 1048576 + 0.5).astype(np.int64) + 1048576
          for i in train}

    def assign(rows, cents):
        cn = [math.sqrt(float(cv @ cv)) for cv in cents]
        out = {}
        for i in rows:
            best = max(range(len(cents)),
                       key=lambda cid: (float(emb[i] @ cents[cid])
                                        / (nrm[i] * cn[cid]), -cid))
            out[i] = best
        return out

    for _ in range(iters):
        a = assign(train, c)
        sums = {}
        for i, cid in a.items():
            s, n = sums.get(cid, (np.zeros(emb.shape[1], dtype=object), 0))
            sums[cid] = (s + sq[i], n + 1)
        for cid, (s, n) in sums.items():
            cm = np.array([int(x) // n - 1048576 for x in s], dtype=np.int64)
            c[cid] = np.float32(cm / 1048576.0).astype(np.float64)
    cells = assign(range(len(ids)), c)
    if with_centroids:
        return ids, emb, nrm, cells, c
    return ids, emb, nrm, cells


@audit("dedup_semantic")
def dedup_semantic():
    ids, emb, nrm, cells = _semantic_cells(lambda _: True)
    by_cell = {}
    for i, cid in cells.items():
        by_cell.setdefault(cid, []).append(i)
    drops = set()
    for xs in by_cell.values():
        xs = sorted(xs, key=lambda i: ids[i])
        for p in range(len(xs)):
            for q in range(p + 1, len(xs)):
                a, b = xs[p], xs[q]
                if r6(float(emb[a] @ emb[b]) / (nrm[a] * nrm[b])) >= 0.2:
                    drops.add(int(ids[b]))
    rows = [{"vec_id": int(ids[i]), "cell": cid}
            for i, cid in cells.items() if int(ids[i]) not in drops]
    rows.sort(key=lambda r: r["vec_id"])
    return pd.DataFrame(rows)


@audit("dedup_incremental_semantic")
def dedup_incremental_semantic():
    ids, emb, nrm, cells = _semantic_cells(lambda v: v % 10 < 8)
    base = {i for i in cells if ids[i] % 10 < 8}
    by_cell_base = {}
    for i in base:
        by_cell_base.setdefault(cells[i], []).append(i)
    rows = []
    for i, cid in cells.items():
        v = int(ids[i])
        if v % 10 < 8:
            continue
        dropped = any(
            r6(float(emb[i] @ emb[b]) / (nrm[i] * nrm[b])) >= 0.3
            for b in by_cell_base.get(cid, []))
        if not dropped:
            rows.append({"vec_id": v, "cell": cid})
    rows.sort(key=lambda r: r["vec_id"])
    return pd.DataFrame(rows)


@audit("knn_cosine_ivf")
def knn_cosine_ivf():
    # IVF with label cells: exact cosine top-5 restricted to the query's
    # cell (same-label candidates).
    return _knn_frame(lambda qi, j, ids, labels:
                      labels[j] == labels[qi] and ids[j] != ids[qi])


@audit("knn_cosine_lsh")
def knn_cosine_lsh():
    # random-hyperplane LSH (Charikar 2002): bucket = sign pattern of
    # the embedding against the shared seeded hyperplanes (driver
    # literals in the query contract); exact cosine top-5 within bucket.
    import json, re, os as _os
    from stat_audit import OUT_DIR
    sql = json.load(open(_os.path.join(OUT_DIR, "oracle_sql.json")))["knn_cosine_lsh"]
    planes = []
    for arr in re.findall(r"\[([-0-9.,eE]+)\]", sql):
        vals = [float(x) for x in arr.split(",")]
        if len(vals) == 64:
            planes.append(np.array(vals))
    # literals repeat once per CASE; dedupe preserving order
    uniq = []
    for p in planes:
        if not any(np.array_equal(p, u) for u in uniq):
            uniq.append(p)
    ids, labels, emb = _emb_matrix()
    nrm = np.sqrt((emb * emb).sum(axis=1))
    buckets = np.zeros(len(ids), dtype=np.int64)
    for bit, p in enumerate(uniq):
        buckets += ((emb @ p) >= 0).astype(np.int64) << bit
    rows = []
    for qi in np.where(ids < 10)[0]:
        cand = [(r6(float(emb[qi] @ emb[j]) / (nrm[qi] * nrm[j])),
                 int(ids[j]))
                for j in np.where(buckets == buckets[qi])[0]
                if ids[j] != ids[qi]]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for c, nid in cand[:5]:
            rows.append({"q_id": int(ids[qi]), "n_id": nid, "cos": c})
    rows.sort(key=lambda r: (r["q_id"], r["n_id"]))
    return pd.DataFrame(rows)


@audit("knn_cosine_sq8")
def knn_cosine_sq8():
    # int8 scalar quantization: code = round(x / max|x| * 127); cosine
    # computed entirely in the quantized domain.
    ids, _, emb = _emb_matrix()
    scale = np.abs(emb).max(axis=1)
    scale = np.where(scale == 0.0, 1.0, scale)
    # DuckDB round() is half away from zero
    x = emb / scale[:, None] * 127.0
    code = (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)
    nrm = np.sqrt((code * code).sum(axis=1).astype(float))
    rows = []
    for qi in np.where(ids < 10)[0]:
        cand = [(r6(float(code[qi] @ code[j]) / (nrm[qi] * nrm[j])),
                 int(ids[j])) for j in range(len(ids)) if ids[j] != ids[qi]]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for c, nid in cand[:5]:
            rows.append({"q_id": int(ids[qi]), "n_id": nid, "cos": c})
    rows.sort(key=lambda r: (r["q_id"], r["n_id"]))
    return pd.DataFrame(rows)


@audit("knn_cosine_ivf_kmeans")
def knn_cosine_ivf_kmeans():
    # IVF over the seeded k-means cells (same codebook protocol as
    # SemDeDup): exact cosine top-5 within the query's cell.
    ids, emb, nrm, cells = _semantic_cells(lambda _: True)
    by_cell = {}
    for i, cid in cells.items():
        by_cell.setdefault(cid, []).append(i)
    rows = []
    for qi in np.where(ids < 10)[0]:
        cand = [(r6(float(emb[qi] @ emb[j]) / (nrm[qi] * nrm[j])),
                 int(ids[j]))
                for j in by_cell[cells[qi]] if ids[j] != ids[qi]]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for c, nid in cand[:5]:
            rows.append({"q_id": int(ids[qi]), "n_id": nid, "cos": c})
    rows.sort(key=lambda r: (r["q_id"], r["n_id"]))
    return pd.DataFrame(rows)


@audit("knn_cosine_ivf_probe2")
def knn_cosine_ivf_probe2():
    # multi-probe IVF: corpus assigned to its best cell (first-8-vector
    # centroids); queries probe their TWO nearest cells.
    ids, _, emb = _emb_matrix()
    nrm = np.sqrt((emb * emb).sum(axis=1))
    order = np.argsort(ids)
    cents = [emb[i] for i in order if ids[i] < 8]
    cn = [math.sqrt(float(c @ c)) for c in cents]
    def ranked_cells(i):
        sc = [(float(emb[i] @ cents[cid]) / (nrm[i] * cn[cid]), -cid)
              for cid in range(len(cents))]
        return [(-c) for _, c in sorted(sc, reverse=True)]
    cellc = {}
    for i in range(len(ids)):
        cellc.setdefault(ranked_cells(i)[0], []).append(i)
    rows = []
    for qi in np.where(ids < 10)[0]:
        probe = set(ranked_cells(qi)[:2])
        cand = [(r6(float(emb[qi] @ emb[j]) / (nrm[qi] * nrm[j])),
                 int(ids[j]))
                for cell in probe for j in cellc.get(cell, [])
                if ids[j] != ids[qi]]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for c, nid in cand[:5]:
            rows.append({"q_id": int(ids[qi]), "n_id": nid, "cos": c})
    rows.sort(key=lambda r: (r["q_id"], r["n_id"]))
    return pd.DataFrame(rows)


# --- graph statistics (r11 audit growth) ------------------------------------

def _parts_supplier_edges():
    """Canonical (pa < pb) edge set of the parts-sharing-a-supplier
    graph, l_partkey < 300 (the graph queries' declared cohort)."""
    li = table("lineitem")
    li = li[li.l_partkey < 300]
    by_s = {}
    for p, s in set(zip(li.l_partkey.astype(int), li.l_suppkey.astype(int))):
        by_s.setdefault(s, set()).add(p)
    edges = set()
    for ps in by_s.values():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    return edges


def _triangle_counts(edges):
    """Per-vertex triangle participation from adjacency-set
    intersections (each triangle counted once per vertex)."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tc = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            tc[c] = tc.get(c, 0)  # ensure key exists even if only via wedge
    # count triangles once (a<b<c) then attribute to all three vertices
    tri = 0
    tcount = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c by canonical edge order
                tri += 1
                for v in (a, b, c):
                    tcount[v] = tcount.get(v, 0) + 1
    return tri, tcount, adj


@audit("q_graph_triangles")
def graph_triangles():
    # Triangle count via adjacency-set intersection over canonical
    # (a<b) edges — each unordered triangle counted exactly once.
    edges = _parts_supplier_edges()
    tri, _, _ = _triangle_counts(edges)
    return pd.DataFrame([{"n_edges": len(edges), "n_triangles": tri}])


@audit("q_graph_clustering_coef")
def graph_clustering_coef():
    # Watts-Strogatz local clustering coefficient C_v = 2 t_v / d_v(d_v-1)
    # (Watts & Strogatz 1998); vertices with d >= 2; top-25 by
    # (coef desc, v asc) at 6-dp presentation.
    edges = _parts_supplier_edges()
    _, tcount, adj = _triangle_counts(edges)
    rows = []
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        t = tcount.get(v, 0)
        rows.append({"v": v, "d": d, "t": t,
                     "coef": r6(2.0 * t / (d * (d - 1)))})
    rows.sort(key=lambda r: (-r["coef"], r["v"]))
    rows = rows[:25]
    return pd.DataFrame([{"v": r["v"], "d": np.int32(r["d"]),
                          "t": np.int32(r["t"]), "coef": r["coef"]}
                         for r in rows])


@audit("q_graph_assortativity")
def graph_assortativity():
    # Degree assortativity r (Newman 2002, eq. 4): Pearson correlation of
    # the degree pairs (d_u, d_v) over each edge counted in BOTH
    # directions (the undirected convention).
    edges = _parts_supplier_edges()
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    x = np.array(xs, dtype=float)
    y = np.array(ys, dtype=float)
    r = float(((x - x.mean()) * (y - y.mean())).sum()
              / math.sqrt(((x - x.mean()) ** 2).sum()
                          * ((y - y.mean()) ** 2).sum()))
    return pd.DataFrame([{"n_endpoints": 2 * len(edges),
                          "assortativity": r6(r)}])


@audit("q_eval_ranking")
def eval_ranking():
    # NDCG@10 (Järvelin & Kekäläinen 2002) + reciprocal rank of the
    # TF-IDF run against BM25-graded truth (gain = 11 - bm25 rank).
    # Discounts quantized once: round(10^12 / log2(i+1)); DCG sums exact
    # integers; ndcg = round(dcg/idcg, 6); rr_fp = 10^9 // first_rel.
    from collections import Counter
    toks = _tokens_per_doc()
    N = len(toks)
    T = sum(len(ts) for ts in toks.values())
    dl = {d: len(ts) for d, ts in toks.items()}
    queries = {"q_analytics": ["query", "filter", "join"],
               "q_streaming": ["stream", "window", "scan"],
               "q_physical": ["hash", "merge", "sort", "table"]}
    qtoks = {t for ts in queries.values() for t in ts}
    tf = {}
    for d, ts in toks.items():
        c = Counter(t for t in ts if t in qtoks)
        for t, n in c.items():
            tf[(d, t)] = n
    dfq = Counter(t for (_, t) in tf)
    disc = [int(math.floor(1e12 / math.log2(i + 1) + 0.5))
            for i in range(1, 11)]
    rows = []
    for qid in sorted(queries):
        ts = queries[qid]
        # BM25 truth (same integer fixed point as the audited
        # text_bm25_topk): top-10, gain = 11 - rank
        bs, tfs = {}, {}
        for (d, t), n in tf.items():
            if t not in ts:
                continue
            idf_fp = ((2 * (N - dfq[t]) + 1) * 1000000) // (2 * dfq[t] + 1)
            tf_fp = (22 * T * n * 1000000) // (10 * T * n + 3 * T
                                               + 9 * dl[d] * N)
            bs[d] = bs.get(d, 0) + idf_fp * tf_fp
            # TF-IDF run score: sum over query terms of tf * N * 1e6 // df
            tfs[d] = tfs.get(d, 0) + (n * N * 1000000) // dfq[t]
        truth = {d: 11 - rnk for rnk, (d, _) in enumerate(
            sorted(bs.items(), key=lambda kv: (-kv[1], kv[0]))[:10], start=1)}
        run = [d for d, _ in sorted(tfs.items(),
                                    key=lambda kv: (-kv[1], kv[0]))[:10]]
        dcg = sum(truth.get(d, 0) * disc[i] for i, d in enumerate(run))
        idcg = sum(g * disc[i] for i, g in enumerate(
            sorted(truth.values(), reverse=True)[:10]))
        first = next((i + 1 for i, d in enumerate(run) if d in truth), None)
        rows.append({"query_id": qid, "ndcg": r6(dcg / idcg),
                     "first_rel": np.int32(first),
                     "rr_fp": 10 ** 9 // first if first else 0})
    return pd.DataFrame(rows)


def _knn3_graph():
    """Symmetric 3-NN cosine graph over the bounded embedding cohort
    (vec_id %10 < 3, vec_id < 2000), ties by (round(cos,6) desc, id)."""
    e = table("embeddings")
    e = e[(e.vec_id % 10 < 3) & (e.vec_id < 2000)]
    ids = e.vec_id.values.astype(int)
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    nrm = np.sqrt((emb * emb).sum(axis=1))
    edges = set()
    for i in range(len(ids)):
        sims = sorted(((r6(float(emb[i] @ emb[j]) / (nrm[i] * nrm[j])),
                        -ids[j]) for j in range(len(ids)) if j != i),
                      reverse=True)[:3]
        for _, nj in sims:
            a, b = ids[i], -nj
            edges.add((a, b))
            edges.add((b, a))
    return edges


def _fp_pagerank(edges, seeds=None, iters=5):
    """Integer fixed-point PageRank, scale 10^12, damping 85/100, all
    divisions floor (Page et al. 1999 power iteration, quantized):
    r0 = S//n (uniform) or S//|seeds| on seeds; each round
    r(v) = teleport(v) + (85 * sum_u r(u)//d(u) over in-edges) // 100,
    teleport = (15 * (S//n_base)) // 100 on the teleport set."""
    S = 10 ** 12
    adj = {}
    deg = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        deg[a] = deg.get(a, 0) + 1
    verts = sorted(deg)
    base = sorted(seeds) if seeds is not None else verts
    nb = len(base)
    r = {v: (S // nb if (seeds is None or v in seeds) else 0)
         for v in verts}
    for _ in range(iters):
        nxt = {}
        for u in verts:
            share = r[u] // deg[u]
            for v in adj[u]:
                nxt[v] = nxt.get(v, 0) + share
        r = {v: ((15 * (S // nb)) // 100
                 if (seeds is None or v in seeds) else 0)
                + (85 * nxt.get(v, 0)) // 100
             for v in verts if v in nxt}
    return r


@audit("q_graph_pagerank")
def graph_pagerank():
    edges = _knn3_graph()
    r = _fp_pagerank(edges)
    top = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    return pd.DataFrame([{"p": p, "rank": rk} for p, rk in top])


@audit("q_graph_ppr")
def graph_ppr():
    edges = _knn3_graph()
    seeds = {v for v, _ in edges if v % 7 == 0}
    r = _fp_pagerank(edges, seeds=seeds)
    top = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    return pd.DataFrame([{"p": p, "rank": rk} for p, rk in top])


def _order_hash_edges():
    """Canonical distinct edges of the order-hash graph
    (o_orderkey%3000, o_custkey%3000), self-loops dropped."""
    o = table("orders")
    a = (o.o_orderkey % 3000).astype(int).values
    b = (o.o_custkey % 3000).astype(int).values
    return {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}


@audit("q_graph_kcore")
def graph_kcore():
    # k-core (Seidman 1983) by iterative peeling: repeatedly delete
    # vertices of degree < 6 (12 rounds bound, converges earlier);
    # output = surviving vertices with their core-subgraph degree.
    edges = _order_hash_edges()
    cur = set(edges)
    for _ in range(12):
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= 6}
        nxt = {(a, b) for a, b in cur if a in keep and b in keep}
        if nxt == cur:
            break
        cur = nxt
    deg = {}
    for a, b in cur:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return pd.DataFrame([{"v": v, "d": np.int32(d)}
                         for v, d in sorted(deg.items())])


@audit("q_graph_bfs_hops")
def graph_bfs_hops():
    # multi-source BFS: min hops from the <20 vertex ids, 3 rounds;
    # output = every vertex reached within 3 hops (sources at 0).
    edges = _order_hash_edges()
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    hop = {v: 0 for v in adj if v < 20}
    frontier = set(hop)
    for h in (1, 2, 3):
        frontier = {n for v in frontier for n in adj[v] if n not in hop}
        for n in frontier:
            hop[n] = h
    return pd.DataFrame([{"v": v, "hop": np.int32(h)}
                         for v, h in sorted(hop.items())])


def _label_prop(edges, rounds=3):
    """Deterministic synchronous label propagation: seeds = vertices
    < 30 labeled v%3 (pinned); each round every vertex takes the
    plurality label of its neighbors' PREVIOUS labels (ties: smallest
    label); unlabeled vertices stay unlabeled until a neighbor has a
    label."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    seeds = {v: v % 3 for v in adj if v < 30}
    lab = dict(seeds)
    for _ in range(rounds):
        votes = {}
        for v, nb in adj.items():
            c = {}
            for n in nb:
                if n in lab:
                    c[lab[n]] = c.get(lab[n], 0) + 1
            if c:
                votes[v] = min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = dict(seeds)
        for v, l in votes.items():
            if v not in seeds:
                lab[v] = l
    return adj, seeds, lab


@audit("q_graph_label_prop")
def graph_label_prop():
    edges = _order_hash_edges()
    _, _, lab = _label_prop(edges)
    return pd.DataFrame([{"v": v, "label": np.int32(l)}
                         for v, l in sorted(lab.items())])


@audit("q_graph_modularity")
def graph_modularity():
    # Newman modularity (Newman & Girvan 2004):
    # Q = sum_c [ in_c/m - (tot_c/2m)^2 ], communities = 3-round label
    # prop, unlabeled vertices = singletons. Integer form:
    # Q·4m² = sum_c (4m·in_c - tot_c²); modularity_x1e6 = sign-split
    # truncating division by 4m².
    edges = _order_hash_edges()
    _, _, lab = _label_prop(edges)
    verts = {v for e in edges for v in e}
    comm = {v: lab.get(v, -v - 1) for v in verts}
    m = len(edges)
    in_c, tot_c = {}, {}
    for a, b in edges:
        ca, cb = comm[a], comm[b]
        tot_c[ca] = tot_c.get(ca, 0) + 1
        tot_c[cb] = tot_c.get(cb, 0) + 1
        if ca == cb:
            in_c[ca] = in_c.get(ca, 0) + 1
    q4m2 = sum(4 * m * in_c.get(c, 0) - tot_c[c] * tot_c[c] for c in tot_c)
    mod_fp = (1 if q4m2 > 0 else -1 if q4m2 < 0 else 0) \
        * (abs(q4m2) * 1000000 // (4 * m * m))
    return pd.DataFrame([{"m_edges": m, "n_communities": len(tot_c),
                          "q4m2": q4m2, "modularity_x1e6": mod_fp}])


@audit("q_graph_link_predict")
def graph_link_predict():
    # Common-neighbors link prediction (Liben-Nowell & Kleinberg 2003):
    # for non-adjacent x<y, common = |N(x) ∩ N(y)|, jaccard via the
    # union identity d(x)+d(y)−common; top-20 by (common desc, pa, pb).
    edges = _parts_supplier_edges()
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    vs = sorted(adj)
    for i, x in enumerate(vs):
        for y in vs[i + 1:]:
            if (x, y) in edges:
                continue
            common = len(adj[x] & adj[y])
            if common == 0:
                continue
            rows.append({"pa": x, "pb": y, "common": np.int32(common),
                         "jaccard": r6(common /
                                       (len(adj[x]) + len(adj[y]) - common))})
    rows.sort(key=lambda r: (-int(r["common"]), r["pa"], r["pb"]))
    return pd.DataFrame(rows[:20])


@audit("q_eval_pr_curve")
def eval_pr_curve():
    # precision/recall sweep at thresholds 0,100..900 over the
    # documents' synthetic milli-score (lang-en positive class):
    # precision = tp/(tp+fp), recall = tp/(tp+fn), null when undefined.
    d = table("documents")
    pos = (d.lang == "en").values
    pm = np.minimum(999, d.n_chars.values % 500 + np.where(pos, 300, 100))
    rows = []
    for thr in range(0, 1000, 100):
        sel = pm >= thr
        tp = int((sel & pos).sum())
        fp = int((sel & ~pos).sum())
        fn = int((~sel & pos).sum())
        rows.append({"thr": np.int32(thr), "tp": tp, "fp": fp, "fn": fn,
                     "precision": r6(tp / (tp + fp)) if tp + fp else None,
                     "recall": r6(tp / (tp + fn)) if tp + fn else None})
    return pd.DataFrame(rows)


# --- streaming panel finals (r11 audit growth) ------------------------------
# The stream_* queries replay bounded batches through Structured
# Streaming; their finals are ordinary statistics of the events/documents
# tables, recomputed here independently of both engines.

@audit("q_events_hourly")
def events_hourly():
    # tumbling-hour counts + exact DECIMAL(18,4) value sums per type.
    e = table("events")
    h = pd.Series(e.ts.values).dt.floor("h")
    q = half_up(e.value.values.astype(float), 10000)  # exact 1e-4 units
    g = pd.DataFrame({"h": h, "event_type": e.event_type.values, "q": q}) \
        .groupby(["h", "event_type"], sort=True) \
        .agg(n=("q", "size"), s=("q", "sum")).reset_index()
    return pd.DataFrame({"h": g.h, "event_type": g.event_type,
                         "n": g.n.astype(np.int64),
                         "sum_value": g.s / 1e4})


# identical statistic replayed through the streaming window aggregation
AUDITS["stream_events_hourly"] = AUDITS["q_events_hourly"]


@audit("q_ohlc_bars")
def ohlc_bars():
    # hourly OHLC bars over integer cents; open/close = value at the
    # min/max of the total order key epoch_us(ts)*1e10 + event_id.
    e = table("events")
    h = pd.Series(e.ts.values).dt.floor("h")
    cents = half_up(e.value.values.astype(float), 100)
    k = (e.ts.values.astype("datetime64[us]").astype(np.int64)
         .astype(object) * 10 ** 10 + e.event_id.values.astype(object))
    d = pd.DataFrame({"bar": h, "v": cents, "k": k})
    rows = []
    for bar, g in d.groupby("bar", sort=True):
        v = g.v.values
        rows.append({"bar": bar, "n_ticks": len(g),
                     "open": int(v[np.argmin(g.k.values)]),
                     "high": int(v.max()), "low": int(v.min()),
                     "close": int(v[np.argmax(g.k.values)]),
                     "volume": int(v.sum())})
    return pd.DataFrame(rows)


AUDITS["stream_ohlc"] = AUDITS["q_ohlc_bars"]

# the streaming quantile sketch's bounded single batch reproduces the
# batch sketch bit-for-bit (same oracle SQL, same engine output)
AUDITS["stream_quantiles"] = AUDITS["q_sketch_quantiles"]


@audit("stream_token_counts")
def stream_token_counts():
    from collections import Counter
    toks = _tokens_per_doc()
    c = Counter(t for d, ts in toks.items() if d < 100 for t in ts)
    return pd.DataFrame([{"tok": t, "n": n} for t, n in sorted(c.items())])


@audit("stream_topk")
def stream_topk():
    from collections import Counter
    toks = _tokens_per_doc()
    c = Counter(t for d, ts in toks.items() if d < 200 for t in ts)
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    return pd.DataFrame([{"tok": t, "n": n} for t, n in top])


@audit("stream_sessionize")
def stream_sessionize():
    # 30-minute-gap sessionization (user_id < 50): a new session starts
    # when the gap from the previous event (by (ts, event_id)) exceeds
    # 30 min; per session: event count + start/end timestamps.
    e = table("events")
    e = e[e.user_id < 50].sort_values(["user_id", "ts", "event_id"],
                                      kind="mergesort")
    rows = []
    for uid, g in e.groupby("user_id", sort=True):
        ts = g.ts.values
        sid = 0
        start = i0 = 0
        for i in range(len(ts)):
            if i == 0 or (ts[i] - ts[i - 1]) > np.timedelta64(30, "m"):
                if i > 0:
                    rows.append({"user_id": uid, "session_id": sid,
                                 "n_events": i - i0,
                                 "session_start": ts[i0],
                                 "session_end": ts[i - 1]})
                sid += 1
                i0 = i
        rows.append({"user_id": uid, "session_id": sid,
                     "n_events": len(ts) - i0, "session_start": ts[i0],
                     "session_end": ts[-1]})
    return pd.DataFrame(rows)


@audit("stream_funnel")
def stream_funnel():
    # strictly-ordered 3-step funnel per user (view -> click -> purchase
    # first-times in epoch microseconds), user_id < 50, later steps null
    # when never reached after the previous step.
    e = table("events")
    e = e[e.user_id < 50]
    us = e.ts.values.astype("datetime64[us]").astype(np.int64)
    d = pd.DataFrame({"u": e.user_id.values, "t": us,
                      "et": e.event_type.values})
    rows = []
    for u, g in d.groupby("u", sort=True):
        v = g[g.et == "view"].t
        if v.empty:
            continue
        t1 = int(v.min())
        c = g[(g.et == "click") & (g.t > t1)].t
        t2 = int(c.min()) if not c.empty else None
        t3 = None
        if t2 is not None:
            p = g[(g.et == "purchase") & (g.t > t2)].t
            t3 = int(p.min()) if not p.empty else None
        rows.append({"user_id": u, "t1": t1, "t2": t2, "t3": t3})
    df = pd.DataFrame(rows)
    # nullable int columns surface as float in parquet round-trips
    for c in ("t2", "t3"):
        df[c] = df[c].astype("float64" if df[c].isna().any() else "int64")
    return df


@audit("stream_lttb")
def stream_lttb_audit():
    # the LTTB downsample (see q_lttb_downsample) over the SAME hourly
    # count series but with 24 interior buckets — the streaming panel's
    # coarser plot budget.
    h = _hourly()
    t = h.index.values.astype(np.int64)
    v = h.values.astype(np.int64)
    t0, v0 = int(t[0]), int(v[0])
    t9, v9 = int(t[-1]), int(v[-1])
    ti, vi = t[1:-1], v[1:-1]
    n = len(ti)
    nb = 24
    base, extra = divmod(n, nb)
    tiles = np.repeat(np.arange(1, nb + 1),
                      [base + (1 if k <= extra else 0)
                       for k in range(1, nb + 1)])
    means = {}
    for k in np.unique(tiles):
        m = tiles == k
        means[int(k)] = (ti[m].mean(), vi[m].mean())
    sel = []
    for k in np.unique(tiles):
        tl, vl = means.get(int(k) - 1, (float(t0), float(v0)))
        tr, vr = means.get(int(k) + 1, (float(t9), float(v9)))
        m = tiles == k
        best = None
        for tt, vv in zip(ti[m], vi[m]):
            area = math.floor(abs(tl * (vv - vr) + tt * (vr - vl)
                                  + tr * (vl - vv)) * 1e6 + 0.5)
            key = (-area, tt)
            if best is None or key < best[0]:
                best = (key, (int(tt), int(vv)))
        sel.append(best[1])
    pts = sorted([(t0, v0), (t9, v9)] + sel)
    return pd.DataFrame([{"t": a, "v": b} for a, b in pts])


# --- robust statistics / anomaly family (r11 audit growth) -------------------

@audit("q_anomaly_zscore")
def anomaly_zscore():
    # rolling z-score over the trailing 24 FULL hourly counts (window
    # excludes the current hour): z = (n - mean) / sd, sd = sample sd
    # from exact integer power sums; null until the window fills.
    e = table("events")
    h = pd.Series(e.ts.values).dt.floor("h")
    c = pd.DataFrame({"et": e.event_type.values, "h": h}) \
        .groupby(["et", "h"]).size().reset_index(name="n")
    rows = []
    for et, g in c.groupby("et", sort=True):
        g = g.sort_values("h")
        ns = g.n.values.astype(np.int64)
        for i in range(len(ns)):
            lo = max(0, i - 24)
            w = ns[lo:i]
            z = None
            if len(w) == 24:
                s1, s2 = int(w.sum()), int((w * w).sum())
                den = 24.0 * s2 - float(s1) * s1
                if den != 0:
                    z = r6((ns[i] - s1 / 24.0)
                           / math.sqrt(den / (24.0 * 23.0)))
            rows.append({"event_type": et, "h": g.h.values[i],
                         "n": int(ns[i]), "zscore": z})
    return pd.DataFrame(rows)


@audit("q_anomaly_mad")
def anomaly_mad():
    # MAD outliers (Hampel): med = lower median (element (n+1)//2 of the
    # sorted list), mad = lower median of |v - med|, outlier if
    # |v - med| > 3*mad. Values exact cents.
    o = table("orders")
    v = half_up(o.o_totalprice.values.astype(float), 100)
    rows = []
    d = pd.DataFrame({"grp": o.o_orderpriority.values, "v": v})
    for grp, g in d.groupby("grp", sort=True):
        vs = np.sort(g.v.values)
        n = len(vs)
        med = int(vs[(n + 1) // 2 - 1])
        ds = np.sort(np.abs(vs - med))
        mad = int(ds[(n + 1) // 2 - 1])
        rows.append({"grp": grp, "n": n, "med": med / 100.0,
                     "mad": mad / 100.0,
                     "n_outliers": np.int32(int((ds > 3 * mad).sum()))})
    return pd.DataFrame(rows)


@audit("q_trimmed_mean")
def trimmed_mean():
    # 5/95 percentile-trimmed mean per return flag: bounds at sorted
    # positions 1+(n-1)*p//100 (lower interpolation), keep v in
    # [plo, phi], mean of exact cents rounded 6dp.
    li = table("lineitem")
    v = half_up(li.l_extendedprice.values.astype(float), 100)
    rows = []
    for fl, g in pd.DataFrame({"f": li.l_returnflag.values, "v": v}) \
            .groupby("f", sort=True):
        vs = np.sort(g.v.values)
        n = len(vs)
        plo = int(vs[(n - 1) * 5 // 100])
        phi = int(vs[(n - 1) * 95 // 100])
        kept = g.v.values[(g.v.values >= plo) & (g.v.values <= phi)]
        rows.append({"l_returnflag": fl, "n_kept": len(kept),
                     "trimmed_mean": r6(int(kept.sum()) / 100.0
                                        / len(kept))})
    return pd.DataFrame(rows)


@audit("q_winsorize")
def winsorize():
    # 5/95 winsorized mean per priority: clamp to the same lower-interp
    # bounds, exact-cent sum / n at 6dp.
    o = table("orders")
    v = half_up(o.o_totalprice.values.astype(float), 100)
    rows = []
    for grp, g in pd.DataFrame({"grp": o.o_orderpriority.values, "v": v}) \
            .groupby("grp", sort=True):
        vs = np.sort(g.v.values)
        n = len(vs)
        lo = int(vs[(n - 1) * 5 // 100])
        hi = int(vs[(n - 1) * 95 // 100])
        cv = np.clip(g.v.values, lo, hi)
        rows.append({"grp": grp, "n": np.int32(n), "lo": lo / 100.0,
                     "hi": hi / 100.0,
                     "mean_w": r6(int(cv.sum()) / 100.0 / n)})
    return pd.DataFrame(rows)


@audit("q_weighted_median")
def weighted_median():
    # lower weighted median (Edgeworth 1888): first v (ordered by
    # (v, custkey)) whose cumulative weight reaches half the total,
    # weights 1 + custkey%5.
    c = table("customer")
    v = half_up(c.c_acctbal.values.astype(float), 100)
    d = pd.DataFrame({"seg": c.c_mktsegment.values, "v": v,
                      "wt": 1 + c.c_custkey.values % 5,
                      "k": c.c_custkey.values})
    rows = []
    for seg, g in d.groupby("seg", sort=True):
        g = g.sort_values(["v", "k"], kind="mergesort")
        cw = g.wt.cumsum().values
        tw = int(g.wt.sum())
        i = int(np.argmax(2 * cw >= tw))
        rows.append({"seg": seg, "w_median": g.v.values[i] / 100.0,
                     "total_weight": tw})
    return pd.DataFrame(rows)


@audit("q_twap")
def twap():
    # time-weighted average price per customer (<200): weight = micros
    # to the NEXT order (by (date, key)); TWAP = Σ v·w / Σ w.
    o = table("orders")
    o = o[o.o_custkey < 200]
    cents = half_up(o.o_totalprice.values.astype(float), 100)
    d = pd.DataFrame({"c": o.o_custkey.values,
                      "t": o.o_orderdate.values.astype("datetime64[us]")
                      .astype(np.int64),
                      "k": o.o_orderkey.values, "v": cents})
    rows = []
    for c, g in d.groupby("c", sort=True):
        g = g.sort_values(["t", "k"], kind="mergesort")
        t = g.t.values
        wt = (t[1:] - t[:-1]).astype(object)
        v = g.v.values[:-1].astype(object)
        if len(wt) == 0:
            continue
        sw = int(sum(wt))
        sv = sum(int(a) * int(b) for a, b in zip(v, wt))
        rows.append({"o_custkey": c, "n_intervals": len(wt),
                     "total_micros": sw, "twap": r6(sv / 100.0 / sw)})
    return pd.DataFrame(rows)


@audit("q_two_proportion")
def two_proportion():
    # pooled two-proportion z (Fleiss 1981): arms from the 60-bit md5
    # hash parity of user_id; conversion = >=14 purchases.
    e = table("events")
    conv = e.groupby("user_id").apply(
        lambda g: int((g.event_type == "purchase").sum() >= 14),
        include_groups=False)
    arm = {u: md5h60(int(u)) % 2 == 0 for u in conv.index}
    n1 = sum(1 for u in conv.index if arm[u])
    x1 = sum(int(conv[u]) for u in conv.index if arm[u])
    n2 = len(conv) - n1
    x2 = int(conv.sum()) - x1
    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    return pd.DataFrame([{"n1": n1, "x1": x1, "n2": n2, "x2": x2,
                          "p_diff": r6(p1 - p2), "z": r6(z)}])


@audit("q_cramers_v")
def cramers_v():
    # Cramér's V (Cramér 1946): V = sqrt(chi2 / (n (min(ka,kb)-1))),
    # chi2 from the engines' truncating 1e6 fixed-point lift form:
    # chi2_x1e6 = max(Σ_cell o·(o·1e6·n // (ra·cb)) - n·1e6, 0).
    c = table("customer")
    cells = pd.DataFrame({"a": c.c_nationkey.values,
                          "b": c.c_mktsegment.values}) \
        .groupby(["a", "b"]).size().reset_index(name="o")
    ra = cells.groupby("a").o.sum().to_dict()
    cb = cells.groupby("b").o.sum().to_dict()
    n = int(cells.o.sum())
    ka, kb = cells.a.nunique(), cells.b.nunique()
    s = sum(int(o) * (int(o) * 1000000 * n // (ra[a] * cb[b]))
            for a, b, o in zip(cells.a, cells.b, cells.o))
    chi2_fp = max(s - n * 1000000, 0)
    v = math.sqrt(chi2_fp / (n * (min(ka, kb) - 1) * 1000000))
    return pd.DataFrame([{"n": n, "ka": ka, "kb": kb,
                          "chi2_x1e6": chi2_fp, "cramers_v": r6(v)}])


@audit("q_cochran_armitage")
def cochran_armitage():
    # Cochran-Armitage trend test (Armitage 1955), scores w = leading
    # digit of priority, response x = status 'F':
    # T = Σ w (x_w N - n_w X); z = T / sqrt(X(N-X)(N Σw²n - (Σwn)²)/N).
    o = table("orders")
    w = o.o_orderpriority.str[0].astype(int).values
    x = (o.o_orderstatus == "F").astype(int).values
    g = pd.DataFrame({"w": w, "x": x}).groupby("w") \
        .agg(n=("x", "size"), x=("x", "sum"))
    N, X = int(g.n.sum()), int(g.x.sum())
    t_n = sum(int(wi) * (int(r.x) * N - int(r.n) * X)
              for wi, r in g.iterrows())
    w2n = sum(int(wi) * int(wi) * int(r.n) for wi, r in g.iterrows())
    wn = sum(int(wi) * int(r.n) for wi, r in g.iterrows())
    z = t_n / math.sqrt(X * (N - X) * (N * w2n - wn * wn) / N)
    return pd.DataFrame([{"k_doses": np.int32(len(g)), "n": N, "x": X,
                          "t_n": t_n, "z": r6(z)}])


@audit("q_burstiness")
def burstiness():
    # Goh & Barabási (2008) burstiness B = (σ−μ)/(σ+μ) of per-user
    # inter-event gaps (ms floor), pooled per event type; cv²×1e6 in the
    # engines' truncating integer form (nq − s²)·1e6 // s².
    e = table("events")
    t = e.ts.values.astype("datetime64[us]").astype(np.int64) // 1000
    d = pd.DataFrame({"u": e.user_id.values, "key": e.event_type.values,
                      "t": t, "i": e.event_id.values})
    gaps = {}
    for (u,), g in d.groupby(["u"], sort=False):
        g = g.sort_values(["t", "i"], kind="mergesort")
        ts = g.t.values
        ks = g.key.values
        for j in range(len(ts) - 1):
            gaps.setdefault(ks[j], []).append(int(ts[j + 1] - ts[j]))
    rows = []
    for key in sorted(gaps):
        gg = gaps[key]
        n = len(gg)
        s = sum(gg)
        q = sum(int(x) * int(x) for x in gg)
        num = n * q - s * s
        rows.append({"key": key, "n_gaps": n, "sum_ms": s,
                     "cv2_x1e6": num * 1000000 // (s * s),
                     "burstiness": r6((math.sqrt(num) - s)
                                      / (math.sqrt(num) + s))})
    return pd.DataFrame(rows)


@audit("q_mase_hourly")
def mase_hourly():
    # MASE (Hyndman & Koehler 2006) of the seasonal-naive (lag 24)
    # forecast scaled by the one-step naive: exact integer |error| sums,
    # truncating 1e6 fixed-point ratio.
    h = _hourly()
    t = h.index.values.astype(np.int64)
    v = {int(a): int(b) for a, b in zip(t, h.values)}
    season = [(abs(v[a] - v[a - 24])) for a in v if a - 24 in v]
    naive = [(abs(v[a] - v[a - 1])) for a in v if a - 1 in v]
    ns, ss = len(season), sum(season)
    nn, sn = len(naive), sum(naive)
    return pd.DataFrame([{"n_season": ns, "sum_season": ss,
                          "n_naive": nn, "sum_naive": sn,
                          "mase_x1e6": ss * nn * 1000000 // (ns * sn)}])


@audit("q_ols_by_group")
def ols_by_group():
    # simple OLS per group from the normal equations (Gauss):
    # slope = (nSxy - SxSy)/(nSxx - Sx²), intercept = (Sy - slope·Sx)/n,
    # r² = slope² · (nSxx - Sx²)/(nSyy - Sy²) (the squared-correlation
    # identity). x/y exact cents.
    li = table("lineitem")
    x = half_up(li.l_quantity.values.astype(float), 100) / 100.0
    y = half_up(li.l_extendedprice.values.astype(float), 100) / 100.0
    rows = []
    for grp, g in pd.DataFrame({"g": li.l_returnflag.values,
                                "x": x, "y": y}).groupby("g", sort=True):
        n = len(g)
        sx, sy = g.x.sum(), g.y.sum()
        sxx, syy, sxy = (g.x * g.x).sum(), (g.y * g.y).sum(), (g.x * g.y).sum()
        num = n * sxy - sx * sy
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        slope = num / dx
        rows.append({"grp": grp, "n": n, "slope": r6(slope),
                     "intercept": r6((sy - slope * sx) / n),
                     "r2": r6(num * num / (dx * dy))})
    return pd.DataFrame(rows)


@audit("q_lorenz_deciles")
def lorenz_deciles():
    # Lorenz curve in customer-spend deciles (Lorenz 1905): NTILE(10)
    # over (spend cents, custkey), per-decile share and cumulative share.
    o = table("orders")
    cents = half_up(o.o_totalprice.values.astype(float), 100)
    s = pd.DataFrame({"c": o.o_custkey.values, "v": cents}) \
        .groupby("c").v.sum().reset_index()
    s = s.sort_values(["v", "c"], kind="mergesort")
    n = len(s)
    base, extra = divmod(n, 10)
    sizes = [base + (1 if k < extra else 0) for k in range(10)]
    rows = []
    tot = int(s.v.sum())
    cum = 0
    i0 = 0
    for b, sz in enumerate(sizes, start=1):
        chunk = s.v.values[i0:i0 + sz]
        i0 += sz
        vs = int(chunk.sum())
        cum += vs
        rows.append({"bucket": np.int32(b), "n_rows": sz, "v_sum": vs,
                     "share": r6(vs / tot), "cum_share": r6(cum / tot)})
    return pd.DataFrame(rows)


@audit("q_mixture_weights")
def mixture_weights():
    # deterministic mixture sampling: keep doc iff md5-60bit(doc_id) %
    # 100 < per-source budget (60/30/10 cycling by source index).
    d = table("documents")
    budget = {f"src{i}": [60, 30, 10][i % 3] for i in range(20)}
    keep = [md5h60(int(i)) % 100 < budget.get(s, 0)
            for i, s in zip(d.doc_id, d.source)]
    k = d[np.array(keep)]
    g = k.groupby("source").doc_id.agg(["size", "min"])
    return pd.DataFrame([{"source": s, "n_kept": int(r["size"]),
                          "min_id": int(r["min"])}
                         for s, r in sorted(g.iterrows())])


@audit("q_audience_overlap")
def audience_overlap():
    # pairwise audience Jaccard + containment over distinct
    # (event_type, user) sets.
    e = table("events")
    sets = {t: set(g.user_id.values)
            for t, g in e.groupby("event_type")}
    ts = sorted(sets)
    rows = []
    for i, a in enumerate(ts):
        for b in ts[i + 1:]:
            both = len(sets[a] & sets[b])
            rows.append({"t_a": a, "t_b": b, "n_a": len(sets[a]),
                         "n_b": len(sets[b]), "n_both": both,
                         "jaccard": r6(both / len(sets[a] | sets[b])),
                         "containment": r6(both / min(len(sets[a]),
                                                      len(sets[b])))})
    return pd.DataFrame(rows)


@audit("q_histogram_numeric")
def histogram_numeric():
    # fixed-width 30k histogram of order totals, top bin clamped at 19.
    o = table("orders")
    v = o.o_totalprice.values.astype(float)
    b = np.minimum(np.floor(v / 30000.0), 19).astype(int)
    rows = []
    for bi in sorted(set(b)):
        m = b == bi
        rows.append({"bin": np.int32(bi), "lo_edge": bi * 30000.0,
                     "n": int(m.sum()), "lo": float(v[m].min()),
                     "hi": float(v[m].max())})
    return pd.DataFrame(rows)


@audit("q_item_item_cosine")
def item_item_cosine():
    # item-item co-occurrence cosine (Sarwar et al. 2001):
    # cos(i,j) = c_ij / sqrt(c_i c_j) over distinct (order, part)
    # baskets; top-20 by (cosine desc, pa, pb).
    li = table("lineitem")
    li = li[li.l_partkey < 300]
    ps = set(zip(li.l_orderkey.astype(int), li.l_partkey.astype(int)))
    from collections import Counter
    ci = Counter(p for _, p in ps)
    by_o = {}
    for o, p in ps:
        by_o.setdefault(o, []).append(p)
    cij = Counter()
    for parts in by_o.values():
        parts = sorted(parts)
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                cij[(parts[i], parts[j])] += 1
    rows = [{"pa": a, "pb": b, "cij": np.int32(n),
             "cosine": r6(n / math.sqrt(ci[a] * ci[b]))}
            for (a, b), n in cij.items()]
    rows.sort(key=lambda r: (-r["cosine"], r["pa"], r["pb"]))
    return pd.DataFrame(rows[:20])


@audit("q_kanonymity")
def kanonymity():
    # k-anonymity / l-diversity risk flags (Sweeney 2002; Machanavajjhala
    # 2007) over the (nation, segment) quasi-identifier: class size < 10
    # = k-risk, distinct sensitive values < 8 = l-risk.
    c = table("customer")
    bal = half_up(c.c_acctbal.values.astype(float), 100)
    g = pd.DataFrame({"n": c.c_nationkey.values, "s": c.c_mktsegment.values,
                      "b": bal}).groupby(["n", "s"]) \
        .agg(class_size=("b", "size"), n_sensitive=("b", "nunique"))
    return pd.DataFrame([{"c_nationkey": n, "c_mktsegment": s,
                          "class_size": int(r.class_size),
                          "n_sensitive": int(r.n_sensitive),
                          "k_risk": bool(r.class_size < 10),
                          "l_risk": bool(r.n_sensitive < 8)}
                         for (n, s), r in sorted(g.iterrows())])


def _bm25_tfidf_rankings():
    """Shared BM25 / TF-IDF fixed-point rankings over the three fixture
    queries (the scoring forms audited in text_bm25_topk /
    text_tfidf_topk): returns {query_id: (bm25_top10, tfidf_top10)} as
    ordered doc_id lists."""
    from collections import Counter
    toks = _tokens_per_doc()
    N = len(toks)
    T = sum(len(ts) for ts in toks.values())
    dl = {d: len(ts) for d, ts in toks.items()}
    queries = {"q_analytics": ["query", "filter", "join"],
               "q_streaming": ["stream", "window", "scan"],
               "q_physical": ["hash", "merge", "sort", "table"]}
    qtoks = {t for ts in queries.values() for t in ts}
    tf = {}
    for d, ts in toks.items():
        c = Counter(t for t in ts if t in qtoks)
        for t, n in c.items():
            tf[(d, t)] = n
    dfq = Counter(t for (_, t) in tf)
    out = {}
    for qid, ts in queries.items():
        bs, tfs = {}, {}
        for (d, t), n in tf.items():
            if t not in ts:
                continue
            idf_fp = ((2 * (N - dfq[t]) + 1) * 1000000) // (2 * dfq[t] + 1)
            tf_fp = (22 * T * n * 1000000) // (10 * T * n + 3 * T
                                               + 9 * dl[d] * N)
            bs[d] = bs.get(d, 0) + idf_fp * tf_fp
            tfs[d] = tfs.get(d, 0) + (n * N * 1000000) // dfq[t]
        out[qid] = (
            [d for d, _ in sorted(bs.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:10]],
            [d for d, _ in sorted(tfs.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:10]])
    return out


@audit("q_hybrid_rrf")
def hybrid_rrf():
    # Reciprocal Rank Fusion (Cormack et al. 2009), k=60, integer form
    # 1e9 // (60 + rank), fused over the BM25 and TF-IDF top-10 runs.
    rows = []
    for qid, (brun, trun) in sorted(_bm25_tfidf_rankings().items()):
        f = {}
        nr = {}
        for run in (brun, trun):
            for i, d in enumerate(run, start=1):
                f[d] = f.get(d, 0) + 10 ** 9 // (60 + i)
                nr[d] = nr.get(d, 0) + 1
        top = sorted(f.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        for rnk, (d, s) in enumerate(top, start=1):
            rows.append({"query_id": qid, "rnk": np.int32(rnk),
                         "doc_id": d, "rrf_fp": s, "n_runs": nr[d]})
    return pd.DataFrame(rows)


@audit("q_join_fanout_histogram")
def join_fanout_histogram():
    # pre-join fan-out histogram by decimal digit count of the per-key
    # row product — the skew pre-flight for a planned join.
    o = table("orders")
    e = table("events")
    ca = o.groupby("o_custkey").size()
    cb = e.groupby("user_id").size()
    rows = {}
    for k in ca.index.intersection(cb.index):
        f = int(ca[k]) * int(cb[k])
        d = len(str(f))
        n, s = rows.get(d, (0, 0))
        rows[d] = (n + 1, s + f)
    return pd.DataFrame([{"digits": np.int32(d), "n_keys": np.int32(n),
                          "n_rows": s}
                         for d, (n, s) in sorted(rows.items())])


@audit("q13_order_histogram")
def q13_histogram():
    # TPC-H Q13: distribution of per-customer order counts (left join
    # keeps zero-order customers).
    c = table("customer")
    o = table("orders")
    cnt = o.groupby("o_custkey").size()
    co = [int(cnt.get(k, 0)) for k in c.c_custkey]
    from collections import Counter
    h = Counter(co)
    rows = sorted(h.items(), key=lambda kv: (-kv[1], -kv[0]))
    return pd.DataFrame([{"c_count": k, "custdist": n}
                         for k, n in rows])


@audit("text_token_histogram")
def token_histogram():
    # doc-length histogram in 8-token bins, clamped at bin 12.
    toks = _tokens_per_doc()
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0])
    for ts in toks.values():
        n = len(ts)
        b = min(n // 8, 12)
        agg[b][0] += 1
        agg[b][1] += n
    return pd.DataFrame([{"bin": np.int32(b), "n_docs": n,
                          "sum_tokens": s}
                         for b, (n, s) in sorted(agg.items())])


@audit("q_approx_distinct")
def approx_distinct():
    # the HLL gate's companion: exact distinct parts per flag, with the
    # within-rsd flag the engine asserts (audited true alongside the
    # dedicated q_eval_hll_error audit which recomputes the HLL itself).
    li = table("lineitem")
    g = li.groupby("l_returnflag").l_partkey.nunique()
    return pd.DataFrame([{"l_returnflag": f, "exact_parts": int(n),
                          "within_rsd": True}
                         for f, n in sorted(g.items())])


@audit("q_label_noise")
def label_noise():
    # Confident-learning-style kNN label check (5-NN plurality label vs
    # own label) on the bounded embedding cohort; ties by smallest label.
    e = table("embeddings")
    e = e[(e.vec_id % 10 < 3) & (e.vec_id < 2000)].sort_values("vec_id")
    ids = e.vec_id.values.astype(int)
    labs = e.label.values.astype(int)
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    nrm = np.sqrt((emb * emb).sum(axis=1))
    rows = []
    for i in range(len(ids)):
        sims = sorted(((r6(float(emb[i] @ emb[j]) / (nrm[i] * nrm[j])),
                        -ids[j], labs[j]) for j in range(len(ids))
                       if j != i), reverse=True)[:5]
        from collections import Counter
        c = Counter(l for _, _, l in sims)
        knn_label, nv = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append({"vec_id": ids[i], "label": np.int32(labs[i]),
                     "knn_label": np.int32(knn_label),
                     "n_agree": np.int32(nv),
                     "flagged": bool(knn_label != labs[i])})
    return pd.DataFrame(rows)


@audit("q_skipping_eval")
def skipping_eval():
    # data-skipping evaluation: min/max zone maps over 64 NTILE "files"
    # in natural vs clustered layout; predicate p in [100, 200); a file
    # is scanned iff its [mn, mx] range intersects the predicate.
    o = table("orders")
    d = pd.DataFrame({"ord": o.o_orderkey.values, "p": o.o_custkey.values,
                      "id": o.o_orderkey.values})
    def layout(sort_cols, name):
        s = d.sort_values(sort_cols, kind="mergesort")
        n = len(s)
        base, extra = divmod(n, 64)
        sizes = [base + (1 if k < extra else 0) for k in range(64)]
        rows_hit = files_hit = 0
        i0 = 0
        for sz in sizes:
            p = s.p.values[i0:i0 + sz]
            i0 += sz
            if p.min() < 200 and p.max() >= 100:
                files_hit += 1
                rows_hit += sz
        return {"layout": name, "n_files": np.int32(64),
                "n_hit": np.int32(files_hit), "rows_scanned": rows_hit,
                "n_rows": n, "prune_rate": r6(1 - files_hit / 64)}
    return pd.DataFrame([layout(["p", "id"], "clustered"),
                         layout(["ord", "id"], "natural")])


@audit("q_eval_knn_graph_recall")
def q_eval_knn_graph_recall():
    # ANN-backed kNN-graph recall table (Graph.knnGraph): per nProbe, the
    # symmetrized 3-NN edge set built within the trained k-means cells
    # (query side probing its nProbe nearest centroids, corpus side its
    # argmax cell) intersected with the brute-force truth edge set.
    ids, emb, nrm, cells, cents = _semantic_cells(lambda _: True,
                                                  with_centroids=True)
    cn = [math.sqrt(float(cv @ cv)) for cv in cents]

    def ranked(i):
        sc = sorted(((float(emb[i] @ cents[cid]) / (nrm[i] * cn[cid]), -cid)
                     for cid in range(len(cents))), reverse=True)
        return [-c for _, c in sc]

    by_cell = {}
    for i, cid in cells.items():
        by_cell.setdefault(cid, []).append(i)

    def topk_edges(cand_fn):
        edges = set()
        for qi in range(len(ids)):
            cand = [(r6(float(emb[qi] @ emb[j]) / (nrm[qi] * nrm[j])),
                     int(ids[j])) for j in cand_fn(qi) if j != qi]
            cand.sort(key=lambda t: (-t[0], t[1]))
            for _, nid in cand[:3]:
                edges.add((int(ids[qi]), nid))
                edges.add((nid, int(ids[qi])))
        return edges

    truth = topk_edges(lambda qi: range(len(ids)))
    rows = []
    for p in (1, 2, 4):
        ei = topk_edges(lambda qi, p=p: [j for cell in ranked(qi)[:p]
                                         for j in by_cell.get(cell, [])])
        hit = len(ei & truth)
        rows.append({"n_probe": p, "n_truth_edges": len(truth),
                     "n_ivf_edges": len(ei), "n_hit": hit,
                     "edge_recall": r6(hit / len(truth))})
    return pd.DataFrame(rows)


@audit("q_eval_knn_graph_refine")
def q_eval_knn_graph_refine():
    # NN-Descent refinement recall table (Graph.knnGraphRefined): base =
    # directed 3-NN within each vector's TWO nearest trained cells
    # (query side), corpus side argmax cell; each round rescores
    # {current edges} + {two-hop neighbors through the undirected graph}
    # and keeps the exact top-3; recall vs the brute truth.
    ids, emb, nrm, cells, cents = _semantic_cells(lambda _: True,
                                                  with_centroids=True)
    cn = [math.sqrt(float(cv @ cv)) for cv in cents]

    def ranked(i):
        sc = sorted(((float(emb[i] @ cents[cid]) / (nrm[i] * cn[cid]), -cid)
                     for cid in range(len(cents))), reverse=True)
        return [-c for _, c in sc]

    by_cell = {}
    for i, cid in cells.items():
        by_cell.setdefault(cid, []).append(i)
    idx_of = {int(ids[i]): i for i in range(len(ids))}

    def topk(qi, cand_idx):
        cand = [(r6(float(emb[qi] @ emb[j]) / (nrm[qi] * nrm[j])),
                 int(ids[j])) for j in cand_idx if j != qi]
        cand.sort(key=lambda t: (-t[0], t[1]))
        return [nid for _, nid in cand[:3]]

    # directed base: probe the 2 nearest cells
    g = {int(ids[qi]): topk(qi, [j for cell in ranked(qi)[:2]
                                 for j in by_cell.get(cell, [])])
         for qi in range(len(ids))}
    truth_edges = set()
    for qi in range(len(ids)):
        for nid in topk(qi, range(len(ids))):
            truth_edges.add((int(ids[qi]), nid))
            truth_edges.add((nid, int(ids[qi])))

    def sym(gd):
        es = set()
        for q, ns in gd.items():
            for n in ns:
                es.add((q, n)); es.add((n, q))
        return es

    rows = []
    for r in (0, 1, 2):
        es = sym(g)
        hit = len(es & truth_edges)
        rows.append({"n_rounds": r, "n_truth_edges": len(truth_edges),
                     "n_refined_edges": len(es), "n_hit": hit,
                     "edge_recall": r6(hit / len(truth_edges))})
        if r < 2:
            und = {}
            for a, b in sym(g):
                und.setdefault(a, set()).add(b)
            g = {q: topk(idx_of[q],
                         {idx_of[c] for n in und.get(q, set())
                          for c in und.get(n, set()) | {n}})
                 for q in und}
    return pd.DataFrame(rows)


@audit("q_eval_ivf_cell_balance")
def eval_ivf_cell_balance():
    # IVF cell-load balance after 2 Lloyd rounds (Lloyd 1982) with the
    # engine's fixed-point centroid means: seed = first 8 vectors by id;
    # each round reassigns by cosine (ties: smallest cell) and recomputes
    # centroid components as (Σ (floor(x·2^20+0.5)+2^20)) // n − 2^20,
    # dequantized through FLOAT32; empty cells keep their previous
    # centroid. load_x1000 = n·8·1000 // N vs the uniform share.
    e = table("embeddings").sort_values("vec_id")
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    nrm = np.sqrt((emb * emb).sum(axis=1))
    s = (np.floor(emb * 1048576.0 + 0.5) + 1048576.0).astype(np.int64)
    cents = [emb[c].copy() for c in range(8)]
    def assign(cv):
        cn = [math.sqrt(float(c @ c)) for c in cv]
        out = np.empty(len(emb), dtype=np.int64)
        for i in range(len(emb)):
            out[i] = min(range(8),
                         key=lambda c: (-(emb[i] @ cv[c]) / (nrm[i] * cn[c]),
                                        c))
        return out
    for _ in range(2):
        a = assign(cents)
        for c in range(8):
            m = a == c
            if m.any():
                cm = s[m].sum(axis=0) // int(m.sum()) - 1048576
                cents[c] = np.float32(cm / 1048576.0).astype(np.float64)
    a = assign(cents)
    N = len(emb)
    counts = {int(c): int((a == c).sum()) for c in np.unique(a)}
    return pd.DataFrame([{"cell": np.int32(c), "n_vecs": n,
                          "load_x1000": n * 8 * 1000 // N}
                         for c, n in sorted(counts.items())])


@audit("q_eval_ivf_sweep")
def eval_ivf_sweep():
    # IVF recall@5 sweep at n_probe = 1, 2, 4: centroids = vectors
    # id < 8; corpus in its best cell (raw cosine, ties cid); truth =
    # brute top-5 per query (id < 10) by (round(cos,6) desc, id).
    e = table("embeddings").sort_values("vec_id")
    ids = e.vec_id.values.astype(int)
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    nrm = np.sqrt((emb * emb).sum(axis=1))
    cents = [emb[i] for i in range(len(ids)) if ids[i] < 8]
    cn = [math.sqrt(float(c @ c)) for c in cents]
    def cell_rank(i):
        sc = [(-(emb[i] @ cents[c]) / (nrm[i] * cn[c]), c)
              for c in range(len(cents))]
        return [c for _, c in sorted(sc)]
    ranks = [cell_rank(i) for i in range(len(ids))]
    cellc = {}
    for i in range(len(ids)):
        cellc.setdefault(ranks[i][0], []).append(i)
    qs = [i for i in range(len(ids)) if ids[i] < 10]
    def top5(qi, pool):
        cand = sorted(((-r6(float(emb[qi] @ emb[j]) / (nrm[qi] * nrm[j])),
                        int(ids[j])) for j in pool if j != qi))
        return {n for _, n in cand[:5]}
    truth = {qi: top5(qi, range(len(ids))) for qi in qs}
    n_truth = sum(len(t) for t in truth.values())
    rows = []
    for npb in (1, 2, 4):
        hit = 0
        for qi in qs:
            pool = [j for c in ranks[qi][:npb] for j in cellc.get(c, [])]
            hit += len(top5(qi, pool) & truth[qi])
        rows.append({"n_probe": np.int32(npb), "n_truth": n_truth,
                     "n_hit": hit, "recall_at_5": r6(hit / n_truth)})
    return pd.DataFrame(rows)


@audit("q_eval_lsh_sweep")
def eval_lsh_sweep():
    # MinHash-LSH (bands x rows) operating-point sweep at fixed k = 9
    # hashes: (1,9), (3,3), (9,1) over the doc_id%3=0, <5000 cohort;
    # truth = exact 3-shingle jaccard >= 0.5 (round 6); candidates =
    # same (band, signature-slice) bucket; Kirsch-Mitzenmacher
    # h_i = h1 + i*h2 from md5 hex slices (60- and 56-bit).
    import hashlib
    toks = _tokens_per_doc()
    sh = {}
    for d, ts in toks.items():
        if d % 3 != 0 or d >= 5000:
            continue
        n = len(ts)
        hi = n - 2 if n >= 3 else 1
        sh[d] = list(dict.fromkeys(" ".join(ts[i:i + 3])
                                   for i in range(hi)))
    def h12(t):
        x = hashlib.md5(t.encode()).hexdigest()
        return int(x[:15], 16), int(x[15:29], 16)
    hp = {d: [h12(t) for t in s] for d, s in sh.items()}
    sig = {d: [min(h1 + i * h2 for h1, h2 in ps) for i in range(9)]
           for d, ps in hp.items() if ps}
    def jac(a, b):
        sa, sb = set(sh[a]), set(sh[b])
        return r6(len(sa & sb) / len(sa | sb))
    dids = sorted(sig)
    truth = {(a, b) for i, a in enumerate(dids) for b in dids[i + 1:]
             if jac(a, b) >= 0.5}
    rows = []
    for bands, r in ((1, 9), (3, 3), (9, 1)):
        buckets = {}
        for d in dids:
            for b in range(bands):
                key = (b, tuple(sig[d][b * r:(b + 1) * r]))
                buckets.setdefault(key, []).append(d)
        cand = {(a, b) for ds in buckets.values()
                for i, a in enumerate(ds) for b in ds[i + 1:] if a < b}
        hit = len(cand & truth)
        rows.append({"n_bands": np.int32(bands), "n_rows": np.int32(r),
                     "n_truth": len(truth), "n_cand": len(cand),
                     "n_hit": hit,
                     "precision_lsh": r6(hit / len(cand)) if cand else None,
                     "recall_lsh": r6(hit / len(truth)) if truth else None})
    return pd.DataFrame(rows)


@audit("q_coreset_kcenter")
def coreset_kcenter():
    # greedy k-center / farthest-point traversal (Gonzalez 1985) on the
    # vec_id%5=0 cohort: start at min id, then 5 more rounds of argmax
    # min-squared-distance (each distance rounded 6dp BEFORE the min
    # fold, matching the per-step presentation), ties to smallest id.
    e = table("embeddings")
    e = e[e.vec_id % 5 == 0].sort_values("vec_id")
    ids = e.vec_id.values.astype(int)
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    sel = [0]
    md = {i: 0.0 if i == 0 else None for i in range(len(ids))}
    # distances to the first center
    c = emb[0]
    md = {i: r6(float(((emb[i] - c) ** 2).sum())) for i in range(len(ids))}
    rows = [{"sel_order": 1, "vec_id": int(ids[0]), "md": 0.0}]
    chosen = {0}
    for step in range(2, 7):
        best = min(((-md[i], ids[i], i) for i in range(len(ids))
                    if i not in chosen))
        _, vid, bi = best
        rows.append({"sel_order": step, "vec_id": int(vid),
                     "md": md[bi]})
        chosen.add(bi)
        c = emb[bi]
        for i in range(len(ids)):
            md[i] = min(md[i], r6(float(((emb[i] - c) ** 2).sum())))
    return pd.DataFrame(rows)


@audit("text_readability")
def text_readability():
    # Flesch reading ease (Flesch 1948): 206.835 − 1.015 W/S − 84.6 Y/W
    # with corpus-level word / vowel-run-syllable / sentence counts per
    # source (sentences split on [.!?]+\s+, syllables = [aeiouy]+ runs).
    import re
    d = table("documents")
    vowel = re.compile(r"[aeiouy]+")
    sent = re.compile(r"[.!?]+\s+")
    agg = {}
    for src, text in zip(d.source, d.text):
        t = text if isinstance(text, str) else ""
        nw = len(re.split(r"\s+", t.strip())) if t.strip() else 1
        ny = len(vowel.findall(t))
        ns = len(sent.split(t))
        a = agg.setdefault(src, [0, 0, 0, 0])
        a[0] += 1
        a[1] += nw
        a[2] += ny
        a[3] += ns
    rows = []
    for src in sorted(agg):
        n_docs, w, y, s = agg[src]
        rows.append({"source": src, "n_docs": n_docs, "n_words": w,
                     "n_syllables": y, "n_sentences": s,
                     "words_per_sentence": r6(w / s),
                     "syll_per_word": r6(y / w),
                     "flesch": r6(206.835 - 1.015 * w / s - 84.6 * y / w)})
    return pd.DataFrame(rows)


@audit("text_repetition")
def text_repetition():
    # boilerplate/repetition signals (Rae et al. 2021 Gopher rep rules):
    # top-bigram mass fraction, duplicate-trigram fraction, adjacent-
    # duplicate-token fraction.
    from collections import Counter
    rows = []
    for did, w in sorted(_tokens_per_doc().items()):
        g2 = [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]
        g3 = [f"{w[i]} {w[i+1]} {w[i+2]}" for i in range(len(w) - 2)]
        top2 = (max(Counter(g2).values()) / len(g2)) if g2 else 0.0
        dup3 = ((len(g3) - len(set(g3))) / len(g3)) if g3 else 0.0
        adj = (sum(1 for i in range(len(w) - 1) if w[i] == w[i + 1])
               / (len(w) - 1)) if len(w) > 1 else 0.0
        rows.append({"doc_id": did, "n_bigrams": np.int32(len(g2)),
                     "top_bigram_frac": r6(top2),
                     "dup_trigram_frac": r6(dup3),
                     "adj_dup_frac": r6(adj)})
    return pd.DataFrame(rows)


@audit("text_ngram_topk")
def text_ngram_topk():
    from collections import Counter
    c = Counter()
    for w in _tokens_per_doc().values():
        c.update(f"{w[i]} {w[i+1]}" for i in range(len(w) - 1))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return pd.DataFrame([{"gram": g, "n": n} for g, n in top])


@audit("text_skipgrams")
def text_skipgrams():
    # window-2 symmetric skipgram counts (the word2vec-style pair
    # table): (w_i, w_j) for j - i in {1, 2}, both directions.
    from collections import Counter
    c = Counter()
    for w in _tokens_per_doc().values():
        for i in range(len(w) - 1):
            for j in (i + 1, i + 2):
                if j < len(w):
                    c[(w[i], w[j])] += 1
                    c[(w[j], w[i])] += 1
    rows = [{"w1": a, "w2": b, "n": n} for (a, b), n in sorted(c.items())]
    return pd.DataFrame(rows)


@audit("text_tokenizer_stats")
def text_tokenizer_stats():
    # tokenizer fertility per source: utf8 bytes, whitespace words,
    # [a-z0-9]+ subwords; fertility = subwords/words, bytes/subword.
    import re
    d = table("documents")
    agg = {}
    for src, text in zip(d.source, d.text):
        t = text if isinstance(text, str) else ""
        nb = len(t.encode("utf-8"))
        nw = len(re.split(r"\s+", t.strip())) if t.strip() else 1
        ns = len([x for x in re.split(r"[^a-z0-9]+", t.lower()) if x])
        a = agg.setdefault(src, [0, 0, 0])
        a[0] += nb
        a[1] += nw
        a[2] += ns
    rows = []
    for src in sorted(agg):
        nb, nw, ns = agg[src]
        rows.append({"source": src, "n_bytes": nb, "n_words": nw,
                     "n_subwords": ns, "fertility": r6(ns / nw),
                     "bytes_per_subword": r6(nb / ns)})
    return pd.DataFrame(rows)


def _pq_distance_tables():
    """PQ machinery shared by knn_pq_adc / knn_ivf_pq / knn_two_stage:
    4 subspaces × 16 dims, 4 codewords each. The codebook VALUES are the
    query contract (seeded construction, embedded as literals in the
    oracle SQL — parsed as input selection, like the LSH planes); the
    ADC algebra (Jégou et al. 2011: d_s[j] = ||x_s − c_sj||², score =
    Σ_s d_s[code_s]) is recomputed here from the published definition.
    Returns (ids, labels, emb, dtab[n][4][8], codes[n][4])."""
    import re
    import os as _os
    import json as _json
    from stat_audit import OUT_DIR
    with open(_os.path.join(OUT_DIR, "oracle_sql.json")) as f:
        s = _json.load(f)["knn_pq_adc"]
    arrs = [a for a in re.findall(r"\[(-?\d[^\]\[]*?)\]", s)
            if len(a.split(",")) == 16]
    cws = []
    seen = []
    for a in arrs:
        v = np.array([float(x) for x in a.split(",")])
        if not any(np.array_equal(v, u) for u in seen):
            seen.append(v)
    assert len(seen) == 16, len(seen)
    book = [seen[4 * s0:4 * (s0 + 1)] for s0 in range(4)]
    e = table("embeddings").sort_values("vec_id")
    ids = e.vec_id.values.astype(int)
    labs = e.label.values.astype(int)
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    dtab = np.zeros((len(ids), 4, 4))
    for s0 in range(4):
        sub = emb[:, s0 * 16:(s0 + 1) * 16]
        for j in range(4):
            dif = sub - book[s0][j]
            dtab[:, s0, j] = (dif * dif).sum(axis=1)
    codes = dtab.argmin(axis=2)  # first min index = list_position semantics
    return ids, labs, emb, dtab, codes


@audit("knn_pq_adc")
def knn_pq_adc():
    ids, _, _, dtab, codes = _pq_distance_tables()
    rows = []
    for qi in np.where(ids < 10)[0]:
        cand = sorted((r6(sum(float(dtab[qi, s0, codes[j, s0]])
                              for s0 in range(4))), int(ids[j]))
                      for j in range(len(ids)) if j != qi)
        for adc, nid in cand[:5]:
            rows.append({"q_id": int(ids[qi]), "n_id": nid, "adc": adc})
    rows.sort(key=lambda r: (r["q_id"], r["n_id"]))
    return pd.DataFrame(rows)


@audit("knn_ivf_pq")
def knn_ivf_pq():
    # PQ-ADC restricted to the query's label cell (the IVF coarse stage
    # here is the label partition).
    ids, labs, _, dtab, codes = _pq_distance_tables()
    rows = []
    for qi in np.where(ids < 10)[0]:
        cand = sorted((r6(sum(float(dtab[qi, s0, codes[j, s0]])
                              for s0 in range(4))), int(ids[j]))
                      for j in range(len(ids))
                      if j != qi and labs[j] == labs[qi])
        for adc, nid in cand[:5]:
            rows.append({"q_id": int(ids[qi]), "n_id": nid, "adc": adc})
    rows.sort(key=lambda r: (r["q_id"], r["n_id"]))
    return pd.DataFrame(rows)


@audit("knn_two_stage")
def knn_two_stage():
    # coarse ADC shortlist (top-20 by (adc, id)) -> exact cosine rerank
    # (round 6, ties id) -> top-5.
    ids, _, emb, dtab, codes = _pq_distance_tables()
    nrm = np.sqrt((emb * emb).sum(axis=1))
    rows = []
    for qi in np.where(ids < 10)[0]:
        short = sorted((r6(sum(float(dtab[qi, s0, codes[j, s0]])
                               for s0 in range(4))), int(ids[j]), j)
                       for j in range(len(ids)) if j != qi)[:20]
        rer = sorted(((-r6(float(emb[qi] @ emb[j]) / (nrm[qi] * nrm[j])),
                       int(ids[j])) for _, _, j in short))[:5]
        for negc, nid in rer:
            rows.append({"q_id": int(ids[qi]), "n_id": nid, "cos": -negc})
    rows.sort(key=lambda r: (r["q_id"], r["n_id"]))
    return pd.DataFrame(rows)


@audit("knn_cosine_ivf_coarse")
def knn_cosine_ivf_coarse():
    # single-probe IVF with first-8 centroids: queries (id < 10) search
    # ONLY their own cell, exact cosine top-5 (round 6, ties id).
    e = table("embeddings").sort_values("vec_id")
    ids = e.vec_id.values.astype(int)
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    nrm = np.sqrt((emb * emb).sum(axis=1))
    cents = emb[:8]
    cn = np.sqrt((cents * cents).sum(axis=1))
    cell = np.array([min(range(8),
                         key=lambda c: (-(emb[i] @ cents[c])
                                        / (nrm[i] * cn[c]), c))
                     for i in range(len(ids))])
    rows = []
    for qi in np.where(ids < 10)[0]:
        cand = sorted(((-r6(float(emb[qi] @ emb[j]) / (nrm[qi] * nrm[j])),
                        int(ids[j]))
                       for j in np.where(cell == cell[qi])[0] if j != qi))
        for negc, nid in cand[:5]:
            rows.append({"q_id": int(ids[qi]), "n_id": nid, "cos": -negc})
    rows.sort(key=lambda r: (r["q_id"], r["n_id"]))
    return pd.DataFrame(rows)


@audit("text_fingerprint")
def text_fingerprint():
    # bag-of-words fingerprint: md5 of the space-joined sorted distinct
    # token set — exact-dedup families with min-id keeper.
    import hashlib
    fams = {}
    for did, ts in sorted(_tokens_per_doc().items()):
        fp = hashlib.md5(" ".join(sorted(set(ts))).encode()).hexdigest()
        if fp in fams:
            fams[fp][1] += 1
        else:
            fams[fp] = [did, 1]
    rows = [{"fp": fp, "keep_id": kid, "n_docs": n}
            for fp, (kid, n) in fams.items()]
    rows.sort(key=lambda r: r["keep_id"])
    return pd.DataFrame(rows)


@audit("text_minhash_fingerprint")
def text_minhash_fingerprint():
    # single-hash minhash fingerprint: min md5 hex over the distinct
    # 3-shingle set (short docs: the whole-text 1-window rule).
    import hashlib
    rows = []
    for did, ts in sorted(_tokens_per_doc().items()):
        if not "".join(ts).strip() and len(ts) == 1:
            continue
        hi = len(ts) - 2 if len(ts) >= 3 else 1
        sh = list(dict.fromkeys(" ".join(ts[i:i + 3]) for i in range(hi)))
        fp = min(hashlib.md5(s.encode()).hexdigest() for s in sh)
        rows.append({"doc_id": did, "fp": fp})
    return pd.DataFrame(rows)


@audit("text_source_similarity")
def text_source_similarity():
    # source-level term-frequency cosine: exact integer dot products and
    # squared norms, one IEEE division per pair.
    from collections import Counter
    toks = table("documents")
    tf = {}
    for src, text in zip(toks.source, toks.text):
        t = text if isinstance(text, str) else ""
        ws = [w for w in __import__("re").split(r"\s+", t.strip()) if w] \
            if t.strip() else []
        c = tf.setdefault(src, Counter())
        c.update(ws)
    srcs = sorted(tf)
    n2 = {g: sum(v * v for v in tf[g].values()) for g in srcs}
    rows = []
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            dot = sum(fa * tf[b][t] for t, fa in tf[a].items()
                      if t in tf[b])
            if dot == 0:
                continue
            rows.append({"ga": a, "gb": b, "dot": dot,
                         "cosine": r6(dot / math.sqrt(n2[a] * n2[b]))})
    return pd.DataFrame(rows)


@audit("text_lm_score")
def text_lm_score():
    # MLE bigram LM doc perplexity proxy: p(w2|w1) = c(bigram)/c(w1),
    # per-doc mean in POSITIONAL sum order, half-up 1e6 fixed point.
    from collections import Counter
    toks = _tokens_per_doc()
    uni = Counter()
    bi = Counter()
    for ts in toks.values():
        uni.update(ts)
        bi.update(f"{a} {b}" for a, b in zip(ts, ts[1:]))
    rows = []
    for did in sorted(toks):
        ts = toks[did]
        if len(ts) < 2:
            continue
        acc = 0.0
        for a, b in zip(ts, ts[1:]):
            acc += bi[f"{a} {b}"] / uni[a]
        n = len(ts) - 1
        rows.append({"doc_id": did, "n_bigrams": np.int32(n),
                     "lm_score": math.floor(acc / n * 1e6 + 0.5) / 1e6})
    return pd.DataFrame(rows)


@audit("text_vocab_prune")
def text_vocab_prune():
    # vocabulary pruning audit: keep tokens with document frequency
    # >= 3 and <= half the corpus; per-source OOV rate of the pruned
    # vocabulary.
    from collections import Counter
    d = table("documents")
    toks = _tokens_per_doc()
    src_of = dict(zip(d.doc_id.astype(int), d.source))
    dfq = Counter()
    for ts in toks.values():
        dfq.update(set(ts))
    nd = len(d)
    kept = {t for t, f in dfq.items() if f >= 3 and 2 * f <= nd}
    agg = {}
    for did, ts in toks.items():
        a = agg.setdefault(src_of[did], [0, 0])
        a[0] += len(ts)
        a[1] += sum(1 for t in ts if t in kept)
    rows = []
    for src in sorted(agg):
        nt, nc = agg[src]
        rows.append({"source": src, "n_tokens": np.int32(nt),
                     "n_covered": np.int32(nc),
                     "vocab_size": np.int32(len(kept)),
                     "oov_rate": r6((nt - nc) / nt)})
    return pd.DataFrame(rows)


# --- exact-criterion dedup family (r11 audit growth) -------------------------

@audit("dedup_exact_materialized")
def dedup_exact_materialized():
    import hashlib
    d = table("documents")
    keep = {}
    for did, text in sorted(zip(d.doc_id.astype(int), d.text)):
        dg = hashlib.md5((text or "").encode()).hexdigest()
        keep.setdefault(dg, did)
    ids = sorted(keep.values())
    src = dict(zip(d.doc_id.astype(int), d.source))
    return pd.DataFrame([{"doc_id": i, "source": src[i]} for i in ids])


@audit("dedup_shared_ngram")
def dedup_shared_ngram():
    # exact shared-window pairs: docs sharing >= 1 distinct 8-token
    # window; n_shared = count of distinct shared windows.
    toks = _tokens_per_doc()
    wins = {}
    for did, ts in toks.items():
        hi = len(ts) - 7 if len(ts) >= 8 else 1
        wins[did] = set(" ".join(ts[i:i + 8]) for i in range(hi))
    inv = {}
    for did, ws in wins.items():
        for w in ws:
            inv.setdefault(w, []).append(did)
    from collections import Counter
    pc = Counter()
    for ds in inv.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pc[(ds[i], ds[j])] += 1
    rows = [{"a_id": a, "b_id": b, "n_shared": n}
            for (a, b), n in sorted(pc.items())]
    return pd.DataFrame(rows)


@audit("dedup_ngram_jaccard")
def dedup_ngram_jaccard():
    # blocked exact 3-shingle jaccard: same lang, adjacent 64-char
    # length buckets, jac >= 0.5 at 6dp.
    d = table("documents")
    toks = _tokens_per_doc()
    meta = {int(i): (l, math.floor(len(t) / 64.0))
            for i, l, t in zip(d.doc_id, d.lang, d.text)}
    sh = {}
    for did, ts in toks.items():
        hi = len(ts) - 2 if len(ts) >= 3 else 1
        sh[did] = set(" ".join(ts[i:i + 3]) for i in range(hi))
    dids = sorted(sh)
    rows = []
    for i, a in enumerate(dids):
        for b in dids[i + 1:]:
            if meta[a][0] != meta[b][0] \
                    or abs(meta[a][1] - meta[b][1]) > 1:
                continue
            j = r6(len(sh[a] & sh[b]) / len(sh[a] | sh[b]))
            if j >= 0.5:
                rows.append({"a_id": a, "b_id": b, "jac": j})
    return pd.DataFrame(rows)


@audit("dedup_simhash_hamming")
def dedup_simhash_hamming():
    # Charikar (2002) simhash: 60-bit per-bit majority (>= 0 -> 1) over
    # 60-bit md5 token hashes; 4x15-bit band blocking; keep pairs with
    # hamming <= 3.
    toks = _tokens_per_doc()
    sig = {}
    for did, ts in toks.items():
        v = [0] * 60
        for t in ts:
            hv = md5h60(t)
            for b in range(60):
                v[b] += 1 if (hv >> b) & 1 else -1
        sig[did] = sum(1 << b for b in range(60) if v[b] >= 0)
    buckets = {}
    for did, s in sig.items():
        for band in range(4):
            buckets.setdefault((band, (s >> (band * 15)) & 32767),
                               []).append(did)
    pairs = set()
    for ds in buckets.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairs.add((ds[i], ds[j]))
    rows = []
    for a, b in sorted(pairs):
        h = bin(sig[a] ^ sig[b]).count("1")
        if h <= 3:
            rows.append({"a_id": a, "b_id": b, "hamming": np.int32(h)})
    return pd.DataFrame(rows)


@audit("q_sankey_paths")
def sankey_paths():
    # top first-3-step user journeys, counted exactly.
    e = table("events").sort_values(["user_id", "ts", "event_id"],
                                    kind="mergesort")
    from collections import Counter
    c = Counter(">".join(g.event_type.values[:3])
                for _, g in e.groupby("user_id"))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return pd.DataFrame([{"path": p, "n": n} for p, n in top])


@audit("q_negative_sampling")
def negative_sampling():
    # deterministic negative sampling: 5 cross-label negatives per query
    # (id < 10) by md5("q|n") hex order (ties n_id).
    import hashlib
    e = table("embeddings")
    ids = e.vec_id.values.astype(int)
    labs = dict(zip(ids, e.label.values.astype(int)))
    rows = []
    for q in sorted(i for i in ids if i < 10):
        cand = sorted((hashlib.md5(f"{q}|{n}".encode()).hexdigest(), n)
                      for n in ids if labs[n] != labs[q])[:5]
        rows.extend({"q_id": q, "n_id": n} for _, n in sorted(cand))
    rows.sort(key=lambda r: (r["q_id"], r["n_id"]))
    return pd.DataFrame(rows)


@audit("q_embedding_centroids")
def embedding_centroids():
    # per-label mean embedding, componentwise, 6dp.
    e = table("embeddings")
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    rows = []
    for lab in sorted(set(e.label.values.astype(int))):
        m = e.label.values.astype(int) == lab
        mean = emb[m].mean(axis=0)
        for pos in range(emb.shape[1]):
            rows.append({"label": lab, "pos": np.int32(pos + 1),
                         "c": r6(float(mean[pos])), "n_vecs": int(m.sum())})
    return pd.DataFrame(rows)


@audit("q_decontaminate")
def decontaminate():
    # eval-set decontamination: drop any training doc (id%17 != 0)
    # sharing a distinct 5-token window with the eval split (id%17 == 0);
    # survivors per source.
    toks = _tokens_per_doc()
    d = table("documents")
    src = dict(zip(d.doc_id.astype(int), d.source))
    def wins(ts):
        hi = len(ts) - 4 if len(ts) >= 5 else 1
        return set(" ".join(ts[i:i + 5]) for i in range(hi))
    ev = set()
    for did, ts in toks.items():
        if did % 17 == 0:
            ev |= wins(ts)
    agg = {}
    for did, ts in toks.items():
        if did % 17 == 0 or wins(ts) & ev:
            continue
        a = agg.setdefault(src[did], [0, did])
        a[0] += 1
        a[1] = min(a[1], did)
    return pd.DataFrame([{"source": s, "n_clean": n, "min_id": m}
                         for s, (n, m) in sorted(agg.items())])


@audit("q_chunk_documents")
def chunk_documents():
    # char-window chunking: stride 96, window 128, docs id < 100.
    d = table("documents")
    rows = []
    for did, text in sorted(zip(d.doc_id.astype(int), d.text)):
        if did >= 100:
            continue
        t = text or ""
        off = 0
        cid = 0
        while off < len(t) or (off == 0 and len(t) == 0):
            if off >= len(t):
                break
            rows.append({"doc_id": did, "chunk_id": np.int32(cid),
                         "off": np.int32(off), "chunk": t[off:off + 128]})
            off += 96
            cid += 1
    return pd.DataFrame(rows)


@audit("q_pack_sequences")
def pack_sequences():
    # sequence packing into 2048-token windows per md5-hash shard:
    # window/offset from the per-shard running token total in doc order.
    toks = _tokens_per_doc()
    rows = []
    cum = {}
    for did in sorted(toks):
        n = len(toks[did])
        shard = md5h60(did) % 8
        c0 = cum.get(shard, 0)
        cum[shard] = c0 + n
        rows.append({"doc_id": did, "shard": shard,
                     "window_id": c0 // 2048, "off": c0 % 2048,
                     "n_tok": np.int32(n)})
    return pd.DataFrame(rows)


@audit("q_truncate_tokens")
def truncate_tokens():
    rows = []
    for did, w in sorted(_tokens_per_doc().items()):
        rows.append({"doc_id": did, "text": " ".join(w[:32]),
                     "n_tok_orig": np.int32(len(w)),
                     "truncated": len(w) > 32})
    return pd.DataFrame(rows)


@audit("q_split_token_tv")
def split_token_tv():
    # total-variation distance between train/rest token distributions
    # (exact integer cross-product form): TV = Σ|c·T2 − d·T1|/(2 T1 T2).
    from collections import Counter
    toks = _tokens_per_doc()
    ctr, crs = Counter(), Counter()
    for did, ts in toks.items():
        (ctr if md5h60(did) % 100 < 80 else crs).update(ts)
    t1, t2 = sum(ctr.values()), sum(crs.values())
    vocab = set(ctr) | set(crs)
    num = sum(abs(ctr[t] * t2 - crs[t] * t1) for t in vocab)
    return pd.DataFrame([{"n_train_toks": t1, "n_rest_toks": t2,
                          "tv": r6(num / (2.0 * t1 * t2))}])


@audit("q_repeated_spans")
def repeated_spans():
    # cross-document repeated 8-token spans (the boilerplate detector):
    # per doc, distinct spans also appearing in ANOTHER doc.
    toks = _tokens_per_doc()
    spans = {}
    for did, w in toks.items():
        if len(w) < 8:
            continue
        spans[did] = set(" ".join(w[i:i + 8]) for i in range(len(w) - 7))
    owners = {}
    for did, ss in spans.items():
        for s in ss:
            owners.setdefault(s, set()).add(did)
    rows = []
    for did in sorted(spans):
        n = sum(1 for s in spans[did] if len(owners[s]) > 1)
        if n:
            rows.append({"doc_id": did, "n_repeated_spans": n})
    return pd.DataFrame(rows)


@audit("text_feature_hash")
def text_feature_hash():
    # hashing-trick features (Weinberger et al. 2009): 256 buckets from
    # the 60-bit md5 hash, per-doc bucket counts (docs id < 20).
    from collections import Counter
    rows = []
    for did, ts in sorted(_tokens_per_doc().items()):
        if did >= 20:
            continue
        c = Counter(md5h60(t) % 256 for t in ts)
        for b, n in sorted(c.items()):
            rows.append({"doc_id": did, "bucket": np.int32(b),
                         "n": np.int32(n)})
    return pd.DataFrame(rows)


@audit("text_script_profile")
def text_script_profile():
    # Unicode script profiling over the synthetic multilingual suffixes:
    # per-script char counts + plurality-with-precedence dominant label.
    import re
    d = table("documents")
    rows = []
    for did, text in sorted(zip(d.doc_id.astype(int), d.text)):
        t = text or ""
        t += {0: " дата" * 120, 1: " 数据" * 200,
              2: " données 123", 3: ""}[did % 4]
        nl = len(re.findall(r"[A-Za-z]", t))
        ncy = len(re.findall(r"[Ѐ-ӿ]", t))
        ncj = len(re.findall(r"[一-鿿]", t))
        nd = len(re.findall(r"[0-9]", t))
        dom = ("latin" if nl >= ncy and nl >= ncj
               else "cyrillic" if ncy >= ncj else "cjk")
        rows.append({"doc_id": did, "n_chars": np.int32(len(t)),
                     "n_latin": np.int32(nl), "n_cyrillic": np.int32(ncy),
                     "n_cjk": np.int32(ncj), "n_digit": np.int32(nd),
                     "dominant": dom})
    return pd.DataFrame(rows)


@audit("text_sentence_split")
def text_sentence_split():
    import re
    d = table("documents")
    rows = []
    for did, text in sorted(zip(d.doc_id.astype(int), d.text)):
        if did >= 50:
            continue
        for pos, s in enumerate(re.split(r"[.!?]+\s+", text or ""),
                                start=1):
            if not s:
                continue
            nw = len(re.split(r"\s+", s.strip())) if s.strip() else 1
            rows.append({"doc_id": did, "pos": np.int32(pos),
                         "n_chars": np.int32(len(s)),
                         "n_words": np.int32(nw)})
    return pd.DataFrame(rows)


@audit("text_normalize")
def text_normalize():
    # NFC + lowercase + whitespace-class collapse/trim.
    import re
    import unicodedata
    d = table("documents")
    ws = "[ \t\n\r\f\x0b]"
    rows = []
    for did, text in sorted(zip(d.doc_id.astype(int), d.text)):
        t = unicodedata.normalize("NFC", text or "").lower()
        t = re.sub(f"^{ws}+|{ws}+$", "", t)
        t = re.sub(f"{ws}+", " ", t)
        rows.append({"doc_id": did, "norm": t})
    return pd.DataFrame(rows)


@audit("text_html_strip")
def text_html_strip():
    # tag strip + the 5 standard entity unescapes + whitespace collapse
    # over the synthetic HTML wrapping.
    import re
    d = table("documents")
    rows = []
    for did, text in sorted(zip(d.doc_id.astype(int), d.text)):
        t = text or ""
        html = (f'<html><head><title>t</title></head><body><p id="d{did}">'
                + t.replace(" the ", " &amp; ") + "</p>"
                + ('<br/><span class="x">&lt;tag&gt;</span>'
                   if did % 3 == 0 else "")
                + "</body></html>")
        n_tags = len(re.findall(r"<[^>]*>", html))
        s = re.sub(r"<[^>]*>", "", html)
        for a, b in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&#39;", "'"), ("&amp;", "&")):
            s = s.replace(a, b)
        s = re.sub(r"\s+", " ", s).strip()
        rows.append({"doc_id": did, "n_tags": np.int32(n_tags),
                     "n_raw_chars": np.int32(len(html)), "extracted": s})
    return pd.DataFrame(rows)


@audit("text_pii_redact")
def text_pii_redact():
    # PII redaction audit: email + phone regex hits and the md5 digest
    # of the redacted text over the synthetic contact suffixes.
    import re
    import hashlib
    d = table("documents")
    em = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+")
    ph = re.compile(r"\+?[0-9][0-9]{2}-[0-9]{4}")
    rows = []
    for did, text in sorted(zip(d.doc_id.astype(int), d.text)):
        t = (text or "") + f" contact user{did}@mail.example.com " \
            f"or +1-555-{did % 10000:04d}"
        red = ph.sub("<PHONE>", em.sub("<EMAIL>", t))
        rows.append({"doc_id": did,
                     "n_emails": np.int32(len(em.findall(t))),
                     "n_phones": np.int32(len(ph.findall(t))),
                     "digest": hashlib.md5(red.encode()).hexdigest()})
    return pd.DataFrame(rows)


@audit("text_mojibake_audit")
def text_mojibake_audit():
    # encoding-health audit over synthetic mojibake injections:
    # replacement-char docs, C0-control chars, non-ASCII chars.
    import re
    d = table("documents")
    ctrl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")
    nona = re.compile("[^\x00-\x7f]")
    agg = {}
    for did, src, text in zip(d.doc_id.astype(int), d.source, d.text):
        t = text or ""
        t += ("�" if did % 7 == 0 else
              "\x07" if did % 5 == 0 else
              "\xe9" if did % 3 == 0 else "")
        a = agg.setdefault(src, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += len(t)
        a[2] += 1 if "�" in t else 0
        a[3] += len(ctrl.findall(t))
        a[4] += len(nona.findall(t))
    rows = []
    for src in sorted(agg):
        nd, nc, rp, ct, na = agg[src]
        rows.append({"source": src, "n_docs": nd, "n_chars": nc,
                     "n_repl_docs": rp, "n_ctrl_chars": ct,
                     "n_nonascii_chars": na,
                     "ascii_ratio": r6(1.0 - na / nc)})
    return pd.DataFrame(rows)


@audit("text_chunk_dedup")
def text_chunk_dedup():
    # 16-token chunk-level dedup: drop chunks appearing in >1 doc,
    # reassemble the survivors per doc.
    toks = _tokens_per_doc()
    chunks = {}
    for did, w in toks.items():
        n = math.ceil(len(w) / 16.0)
        chunks[did] = [" ".join(w[(i - 1) * 16:(i - 1) * 16 + 16])
                       for i in range(1, int(n) + 1)]
    owners = {}
    for did, cs in chunks.items():
        for c in set(cs):
            owners.setdefault(c, set()).add(did)
    rows = []
    for did in sorted(chunks):
        kept = [c for c in chunks[did] if len(owners[c]) == 1]
        if kept:
            rows.append({"doc_id": did, "text_clean": " ".join(kept)})
    return pd.DataFrame(rows)


@audit("text_explode_tokens")
def text_explode_tokens():
    rows = []
    for did, w in sorted(_tokens_per_doc().items()):
        if did >= 50:
            continue
        for pos, tok in enumerate(w, start=1):
            rows.append({"doc_id": did, "pos": np.int32(pos), "tok": tok})
    return pd.DataFrame(rows)


@audit("text_subword_tokens")
def text_subword_tokens():
    import re
    d = table("documents")
    toks = _tokens_per_doc()
    rows = []
    for did, text in sorted(zip(d.doc_id.astype(int), d.text)):
        sw = [x for x in re.split(r"[^a-z0-9]+", (text or "").lower()) if x]
        rows.append({"doc_id": did,
                     "n_ws_tokens": np.int32(len(toks[did])),
                     "n_subwords": np.int32(len(sw)),
                     "n_distinct_subwords": np.int32(len(set(sw)))})
    return pd.DataFrame(rows)


def _span_pairs8():
    """Shared 8-token-window doc pairs (the dedup_shared_ngram edge
    set)."""
    toks = _tokens_per_doc()
    inv = {}
    for did, ts in toks.items():
        hi = len(ts) - 7 if len(ts) >= 8 else 1
        for w in set(" ".join(ts[i:i + 8]) for i in range(hi)):
            inv.setdefault(w, []).append(did)
    pairs = set()
    for ds in inv.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairs.add((ds[i], ds[j]))
    return pairs


@audit("dedup_span_clusters")
def dedup_span_clusters():
    # connected components over the shared-span pair graph: each doc's
    # cluster id = min reachable doc id (union-find).
    pairs = _span_pairs8()
    parent = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [{"doc_id": d, "cluster_id": find(d)} for d in sorted(parent)]
    return pd.DataFrame(rows)


@audit("dedup_incremental_span")
def dedup_incremental_span():
    # incremental exact-substring filter: drop incoming docs (id%10 >= 8)
    # sharing any 8-token window with the base (id%10 < 8).
    toks = _tokens_per_doc()
    def wins(ts):
        hi = len(ts) - 7 if len(ts) >= 8 else 1
        return set(" ".join(ts[i:i + 8]) for i in range(hi))
    base = set()
    for did, ts in toks.items():
        if did % 10 < 8:
            base |= wins(ts)
    keep = [did for did, ts in sorted(toks.items())
            if did % 10 >= 8 and not (wins(ts) & base)]
    return pd.DataFrame([{"doc_id": d} for d in keep])


@audit("q_data_card")
def data_card():
    # per-source data card: doc/char counts, language Gini impurity
    # (1 − Σ p²) in half-up 1e6 fixed point, english share.
    d = table("documents")
    g = d.groupby(["source", "lang"]).agg(nl=("doc_id", "size"),
                                          cl=("n_chars", "sum"))
    rows = []
    for src in sorted(set(d.source)):
        sub = g.loc[src]
        n = int(sub.nl.sum())
        ch = int(sub.cl.sum())
        sl2 = int((sub.nl.astype(np.int64) ** 2).sum())
        nen = int(sub.nl.get("en", 0))
        rows.append({
            "source": src, "n_docs": n, "sum_chars": ch,
            "n_langs": len(sub), "mean_chars": rn(ch / n, 6),
            "lang_gini": rn((n * n - sl2) / (n * n), 6),
            "pct_en": rn(nen / n, 6)})
    return pd.DataFrame(rows)


@audit("q_url_canonicalize")
def url_canonicalize():
    # URL canonicalization: strip fragment, lowercase scheme+host, drop
    # default ports, drop www., sort query params, drop tracking params
    # (utm_*, fbclid, gclid); group identical canonical urls.
    import re
    d = table("documents")
    agg = {}
    for did in sorted(d.doc_id.astype(int)):
        if did % 2 == 0:
            url = f"HTTPS://WWW.Site{did % 5}.COM:443/p/{did % 17}"
        else:
            url = f"http://site{did % 5}.com:80/p/{did % 17}"
        url += {0: "?b=2&utm_source=feed&a=1",
                1: "?a=1&b=2&gclid=xyz", 2: ""}[did % 3]
        if did % 4 == 0:
            url += "#frag"
        nf = re.sub(r"#.*$", "", url)
        m = re.match(r"^([^:/?#]+)://([^/?#]*)(.*)$", nf)
        scheme = m.group(1).lower()
        hostport = m.group(2).lower()
        pathq = m.group(3)
        host = hostport
        if scheme == "https":
            host = re.sub(r":443$", "", host)
        elif scheme == "http":
            host = re.sub(r":80$", "", host)
        host = re.sub(r"^www\.", "", host)
        path = pathq.split("?")[0]
        query = pathq.split("?", 1)[1] if "?" in pathq else ""
        keep = sorted(x for x in query.split("&")
                      if x and not re.match(r"^(utm_[^=]*|fbclid|gclid)=",
                                            x))
        cq = "&".join(keep)
        curl = f"{scheme}://{host}{path if path else '/'}" \
            + (f"?{cq}" if cq else "")
        a = agg.setdefault(curl, [0, did])
        a[0] += 1
        a[1] = min(a[1], did)
    rows = [{"curl": c, "n_urls": n, "first_doc": f}
            for c, (n, f) in sorted(agg.items())]
    return pd.DataFrame(rows)


@audit("q_event_throttle")
def event_throttle():
    # rate limiting / throttle replay: keep an event iff >= 24 h after
    # the last KEPT event of its (user, type) stream.
    e = table("events")
    e = e[e.user_id < 60]
    us = e.ts.values.astype("datetime64[us]").astype(np.int64)
    d = pd.DataFrame({"u": e.user_id.values, "et": e.event_type.values,
                      "id": e.event_id.values, "tsm": us})
    d = d.sort_values(["u", "et", "tsm", "id"], kind="mergesort")
    rows = []
    for (u, et), g in d.groupby(["u", "et"], sort=True):
        last = None
        for _, r in g.iterrows():
            if last is None or r.tsm - last >= 86400000000:
                rows.append({"user_id": u, "event_type": et,
                             "event_id": int(r.id), "tsm": int(r.tsm)})
                last = int(r.tsm)
    rows.sort(key=lambda r: (r["user_id"], r["event_type"], r["event_id"]))
    return pd.DataFrame(rows)


@audit("q_interval_merge")
def interval_merge():
    # island merge of [ts, ts+1h) intervals per user (user_id < 100):
    # a new island starts when s0 > running max of previous ends.
    e = table("events")
    e = e[e.user_id < 100]
    us = e.ts.values.astype("datetime64[us]").astype(np.int64)
    d = pd.DataFrame({"u": e.user_id.values, "s0": us,
                      "e0": us + 3600000000, "id": e.event_id.values})
    d = d.sort_values(["u", "s0", "id"], kind="mergesort")
    rows = []
    for u, g in d.groupby("u", sort=True):
        island = 0
        pmax = None
        cur = None
        for _, r in g.iterrows():
            if pmax is None or r.s0 > pmax:
                if cur:
                    rows.append(cur)
                island += 1
                cur = {"user_id": u, "island": island,
                       "start_us": int(r.s0), "end_us": int(r.e0),
                       "n_intervals": 0}
            cur["end_us"] = max(cur["end_us"], int(r.e0))
            cur["n_intervals"] += 1
            pmax = int(r.e0) if pmax is None else max(pmax, int(r.e0))
        if cur:
            rows.append(cur)
    return pd.DataFrame(rows)


@audit("q_scd2_intervals")
def scd2_intervals():
    # SCD-2 validity intervals per customer (< 200) from the order
    # sequence: version, valid_from/to, is_current.
    o = table("orders")
    o = o[o.o_custkey < 200]
    d = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                      kind="mergesort")
    rows = []
    for c, g in d.groupby("o_custkey", sort=True):
        dates = list(g.o_orderdate.values)
        keys = list(g.o_orderkey.values)
        for i in range(len(keys)):
            rows.append({
                "o_custkey": c, "version": np.int32(i + 1),
                "o_orderkey": int(keys[i]), "valid_from": dates[i],
                "valid_to": dates[i + 1] if i + 1 < len(keys) else None,
                "is_current": i + 1 == len(keys)})
    return pd.DataFrame(rows)


@audit("q_mode_by_group")
def mode_by_group():
    from collections import Counter
    li = table("lineitem")
    rows = []
    for fl, g in pd.DataFrame({"f": li.l_returnflag.values,
                               "q": li.l_quantity.values.astype(float)}) \
            .groupby("f", sort=True):
        c = Counter(g.q.values)
        (v, n) = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append({"l_returnflag": fl, "mode_qty": float(v), "n": n})
    return pd.DataFrame(rows)


@audit("q_minmax_by")
def minmax_by():
    # arg_max/arg_min by the composite (balance-cents·1e6 + custkey) key.
    c = table("customer")
    bal = half_up(c.c_acctbal.values.astype(float), 100)
    d = pd.DataFrame({"n": c.c_nationkey.values, "nm": c.c_name.values,
                      "k": bal.astype(object) * 10000 +
                      c.c_custkey.values.astype(object)})
    rows = []
    for nk, g in d.groupby("n", sort=True):
        ks = g.k.values
        rows.append({"c_nationkey": nk,
                     "top_name": g.nm.values[int(np.argmax(ks))],
                     "bottom_name": g.nm.values[int(np.argmin(ks))],
                     "n": len(g)})
    return pd.DataFrame(rows)


@audit("q_width_bucket")
def width_bucket():
    li = table("lineitem")
    li = li[li.l_orderkey < 300].sort_values(["l_orderkey", "l_linenumber"],
                                             kind="mergesort")
    q = li.l_quantity.values.astype(float)
    wb = np.where(q < 0, 0, np.where(q >= 55, 11,
                                     np.floor(10.0 * q / 55.0) + 1)) \
        .astype(np.int64)
    return pd.DataFrame({"l_orderkey": li.l_orderkey.values,
                         "l_linenumber": li.l_linenumber.values,
                         "l_quantity": q, "wb": wb})


@audit("q_feature_bins")
def feature_bins():
    # equal-population decile bins of order totals (cents, ntile over
    # (v, orderkey)): per-bin count, min/max/sum, mean in dollars.
    o = table("orders")
    v = half_up(o.o_totalprice.values.astype(float), 100)
    d = pd.DataFrame({"v": v, "t": o.o_orderkey.values}) \
        .sort_values(["v", "t"], kind="mergesort")
    n = len(d)
    base, extra = divmod(n, 10)
    rows = []
    i0 = 0
    for b in range(1, 11):
        sz = base + (1 if b <= extra else 0)
        chunk = d.v.values[i0:i0 + sz]
        i0 += sz
        s = int(chunk.sum())
        rows.append({"bin": np.int32(b), "n": sz,
                     "min_cents": int(chunk.min()),
                     "max_cents": int(chunk.max()), "sum_cents": s,
                     "mean_dollars": r6(s / sz / 100.0)})
    return pd.DataFrame(rows)


@audit("q_events_sliding")
def events_sliding():
    # 1-hour sliding windows with 30-min hop: each event lands in its
    # 30-min bucket and the previous one.
    e = table("events")
    b = pd.Series(e.ts.values).dt.floor("30min")
    d = pd.concat([
        pd.DataFrame({"ws": b, "event_type": e.event_type.values}),
        pd.DataFrame({"ws": b - pd.Timedelta(minutes=30),
                      "event_type": e.event_type.values})])
    g = d.groupby(["ws", "event_type"], sort=True).size() \
        .reset_index(name="n")
    return g


@audit("q_sessionize")
def q_sessionize():
    # batch 30-min-gap sessionization: same statistic as the audited
    # stream_sessionize (strict > gap), identical expected frame.
    return stream_sessionize()


@audit("q_session_window")
def q_session_window():
    # session-window variant: gap >= 30 min starts a new session; output
    # per session start (ordered) with event counts.
    e = table("events")
    e = e[e.user_id < 50].sort_values(["user_id", "ts", "event_id"],
                                      kind="mergesort")
    rows = []
    for uid, g in e.groupby("user_id", sort=True):
        ts = g.ts.values
        i0 = 0
        for i in range(1, len(ts) + 1):
            if i == len(ts) or (ts[i] - ts[i - 1]) >= np.timedelta64(30, "m"):
                rows.append({"user_id": uid, "session_start": ts[i0],
                             "n_events": i - i0})
                i0 = i
    return pd.DataFrame(rows)


@audit("q_agg_distinct")
def agg_distinct():
    li = table("lineitem")
    rows = []
    for fl, g in li.groupby("l_returnflag", sort=True):
        rows.append({"l_returnflag": fl,
                     "n_parts": g.l_partkey.nunique(),
                     "n_supps": g.l_suppkey.nunique(),
                     "sum_dq": int(sum(set(g.l_quantity.astype(float)
                                           .astype(int))))})
    return pd.DataFrame(rows)


@audit("q_bool_aggs")
def bool_aggs():
    c = table("customer")
    bal = c.c_acctbal.values.astype(float)
    rows = []
    for nk, g in pd.DataFrame({"n": c.c_nationkey.values, "b": bal,
                               "s": c.c_mktsegment.values}) \
            .groupby("n", sort=True):
        rows.append({"c_nationkey": nk,
                     "all_positive": bool((g.b > 0.0).all()),
                     "any_deep_debt": bool((g.b < -900.0).any()),
                     "n_building": int((g.s == "BUILDING").sum()),
                     "n": len(g)})
    return pd.DataFrame(rows)


@audit("q_collect_agg")
def collect_agg():
    c = table("customer")
    rows = []
    for nk, g in c.groupby("c_nationkey", sort=True):
        segs = sorted(set(g.c_mktsegment))
        rows.append({"c_nationkey": nk, "segs": ",".join(segs),
                     "n": len(segs)})
    return pd.DataFrame(rows)


def _quality_score(w):
    """The curation quality score: 0.4·type-token ratio + 0.3·min(1,
    len/100) + 0.3·(1 − stop-fraction over {'the','a'}), round 6."""
    n = len(w)
    ttr = len(set(w)) / n
    stop = sum(1 for t in w if t in ("the", "a")) / n
    return r6(ttr * 0.4 + min(1.0, n / 100.0) * 0.3 + (1 - stop) * 0.3)


@audit("q_curate_pipeline")
def curate_pipeline():
    # end-to-end curation: english lang-id gate -> quality >= 0.5 ->
    # exact-dup keeper (min id per md5(text)) -> 50% deterministic
    # hash sample.
    import hashlib
    d = table("documents")
    pred = _langid_pred(d.text.values)
    toks = _tokens_per_doc()
    keep = {}
    cand = []
    for did, src, text, lang in sorted(zip(d.doc_id.astype(int),
                                           d.source, d.text, pred)):
        if lang != "en":
            continue
        q = _quality_score(toks[did])
        if q < 0.5:
            continue
        dg = hashlib.md5((text or "").encode()).hexdigest()
        if dg not in keep:
            keep[dg] = did
        cand.append((did, src, q, dg))
    rows = [{"doc_id": did, "source": src, "quality": q}
            for did, src, q, dg in cand
            if keep[dg] == did and md5h60(did) % 2 == 0]
    return pd.DataFrame(rows)


@audit("q_corpus_pipeline")
def corpus_pipeline():
    # the FULL composed pipeline (r12): en gate -> quality >= 0.5 ->
    # minhash near-dup dedup (exact replay; the engine routes exact by
    # the probe-floor contract at this scale) -> 13-gram decontamination
    # vs the doc_id%997 eval slice -> 800-token budget per source in
    # md5-hash order -> pack into 256-token windows over 4 md5 shards.
    d = table("documents")
    pred = _langid_pred(d.text.values)
    toks = _tokens_per_doc()
    srcs = dict(zip(d.doc_id.astype(int), d.source))
    eval_ids = {int(i) for i in d.doc_id if int(i) % 997 == 0}
    gated = []
    for did, lang in zip(d.doc_id.astype(int), pred):
        did = int(did)
        if did % 997 == 0 or lang != "en":
            continue
        q = _quality_score(toks[did])
        if q >= 0.5:
            gated.append((did, q))
    gids = {did for did, _ in gated}
    _, _, verified = _lsh_pipeline(doc_filter=lambda x: x in gids)
    label = _components(verified.keys())
    dropped = {x for x, l in label.items() if l != x}

    def grams13(ts):
        return {" ".join(ts[i:i + 13]) for i in range(len(ts) - 12)} \
            if len(ts) >= 13 else set()
    evg = set()
    for did in eval_ids:
        evg |= grams13(toks[did])
    surv = [(did, q) for did, q in gated
            if did not in dropped and not (grams13(toks[did]) & evg)]
    from collections import defaultdict
    by_src = defaultdict(list)
    for did, q in surv:
        by_src[srcs[did]].append((md5h60(did), did, q))
    sel = []
    for s_, lst in by_src.items():
        lst.sort()
        cum = 0
        for _, did, q in lst:
            cum += len(toks[did])
            if cum <= 800:
                sel.append((did, s_, q, len(toks[did])))
    shards = defaultdict(list)
    for did, s_, q, n in sel:
        shards[md5h60(did) % 4].append((did, s_, q, n))
    rows = []
    for sh, lst in shards.items():
        cum = 0
        for did, s_, q, n in sorted(lst):
            rows.append({"doc_id": did, "source": s_, "quality": q,
                         "n_tok": n, "shard": sh,
                         "window_id": cum // 256, "off": cum % 256})
            cum += n
    rows.sort(key=lambda r: r["doc_id"])
    return pd.DataFrame(rows)


@audit("q_curate_audit")
def curate_audit():
    # the same pipeline with per-stage drop FLAGS retained for every doc
    # (the provenance/audit view of q_curate_pipeline).
    import hashlib
    d = table("documents")
    pred = _langid_pred(d.text.values)
    toks = _tokens_per_doc()
    recs = []
    keep = {}
    for did, text, lang in sorted(zip(d.doc_id.astype(int), d.text,
                                      pred)):
        f_lang = lang != "en"
        f_quality = _quality_score(toks[did]) < 0.5
        ok = not f_lang and not f_quality
        dg = hashlib.md5((text or "").encode()).hexdigest()
        if ok and dg not in keep:
            keep[dg] = did
        recs.append((did, f_lang, f_quality, ok, dg))
    rows = []
    for did, f_lang, f_quality, ok, dg in recs:
        is_keeper = ok and keep.get(dg) == did
        rows.append({"doc_id": did, "f_lang": f_lang,
                     "f_quality": f_quality,
                     "f_dup": ok and not is_keeper,
                     "f_sample": is_keeper and md5h60(did) % 2 != 0,
                     "kept": is_keeper and md5h60(did) % 2 == 0})
    return pd.DataFrame(rows)


def _lev(a, b):
    """Wagner-Fischer edit distance."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _jaro_winkler(a, b):
    """Jaro (1989) + Winkler (1990) prefix boost (l <= 4, p = 0.1,
    boost applied only when jaro > 0.7 — Winkler's original boost
    threshold, the convention both engines share)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    window = max(la, lb) // 2 - 1
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    jaro = (m / la + m / lb + (m - t / 2) / m) / 3
    if jaro <= 0.7:
        return jaro
    l = 0
    for x, y in zip(a, b):
        if x != y or l == 4:
            break
        l += 1
    return jaro + l * 0.1 * (1 - jaro)


@audit("q_jaro_winkler")
def jaro_winkler():
    vocab = sorted({t for ts in _tokens_per_doc().values() for t in ts})
    rows = []
    for i, a in enumerate(vocab):
        for b in vocab[i + 1:]:
            jw = _jaro_winkler(a, b)
            if jw >= 0.6:
                rows.append({"w1": a, "w2": b, "jw": r6(jw)})
    return pd.DataFrame(rows)


@audit("q_string_distance")
def string_distance():
    p = table("part").sort_values("p_partkey")
    rows = []
    for _, r in p.iterrows():
        name = r.p_name
        rows.append({
            "p_partkey": int(r.p_partkey),
            "lev": np.int32(_lev(r.p_brand, r.p_type)),
            "rname": name[::-1],
            "tname": "".join("." if c in "aeiou" else c for c in name),
            "bb": r.p_brand * 2,
            "pos_a": np.int32(name.find("a") + 1),
            "l4": name[:4], "r4": name[-4:] if len(name) >= 4 else name})
    return pd.DataFrame(rows)


@audit("q_topk_orders")
def topk_orders():
    o = table("orders")
    d = o.sort_values(["o_totalprice", "o_orderkey"],
                      ascending=[False, True], kind="mergesort").head(20)
    return pd.DataFrame({"o_orderkey": d.o_orderkey.values,
                         "o_custkey": d.o_custkey.values,
                         "o_totalprice": d.o_totalprice.values
                         .astype(float)})


@audit("q_case_buckets")
def case_buckets():
    o = table("orders")
    v = o.o_totalprice.values.astype(float)
    b = np.where(v < 50000, "low", np.where(v < 150000, "mid", "high"))
    rows = []
    for bk in sorted(set(b)):
        m = b == bk
        rows.append({"bucket": bk, "n": int(m.sum()),
                     "min_key": int(o.o_orderkey.values[m].min())})
    return pd.DataFrame(rows)


@audit("q_cube")
def cube():
    # CUBE over (status, priority): exact decimal-cent sums per cell,
    # null = rolled-up dimension, NULLS FIRST ordering.
    o = table("orders")
    cents = half_up(o.o_totalprice.values.astype(float), 100)
    d = pd.DataFrame({"s": o.o_orderstatus.values,
                      "p": o.o_orderpriority.values, "v": cents})
    rows = []
    for sk in (None, *sorted(set(d.s))):
        for pk in (None, *sorted(set(d.p))):
            m = np.ones(len(d), dtype=bool)
            if sk is not None:
                m &= (d.s == sk).values
            if pk is not None:
                m &= (d.p == pk).values
            if not m.any():
                continue
            rows.append({"o_orderstatus": sk, "o_orderpriority": pk,
                         "n": int(m.sum()),
                         "total": int(d.v.values[m].sum()) / 100.0})
    return pd.DataFrame(rows)


@audit("q_grouping_sets")
def grouping_sets():
    li = table("lineitem")
    rows = [{"l_returnflag": None, "l_linestatus": None, "n": len(li)}]
    for ls in sorted(set(li.l_linestatus)):
        rows.append({"l_returnflag": None, "l_linestatus": ls,
                     "n": int((li.l_linestatus == ls).sum())})
    for rf in sorted(set(li.l_returnflag)):
        rows.append({"l_returnflag": rf, "l_linestatus": None,
                     "n": int((li.l_returnflag == rf).sum())})
    return pd.DataFrame(rows)


@audit("q_rollup")
def rollup():
    li = table("lineitem")
    q = li.l_quantity.values.astype(float)
    rows = [{"l_returnflag": None, "l_linestatus": None, "n": len(li),
             "sum_qty": float(q.sum())}]
    for rf in sorted(set(li.l_returnflag)):
        m = (li.l_returnflag == rf).values
        rows.append({"l_returnflag": rf, "l_linestatus": None,
                     "n": int(m.sum()), "sum_qty": float(q[m].sum())})
        for ls in sorted(set(li.l_linestatus[m])):
            m2 = m & (li.l_linestatus == ls).values
            rows.append({"l_returnflag": rf, "l_linestatus": ls,
                         "n": int(m2.sum()),
                         "sum_qty": float(q[m2].sum())})
    # NULLS FIRST ordering on both keys
    rows.sort(key=lambda r: ((r["l_returnflag"] is not None,
                              r["l_returnflag"] or ""),
                             (r["l_linestatus"] is not None,
                              r["l_linestatus"] or "")))
    return pd.DataFrame(rows)


@audit("q_grouping_id")
def grouping_id():
    li = table("lineitem")
    rows = [{"l_returnflag": None, "l_linestatus": None,
             "g_rf": np.int32(1), "g_ls": np.int32(1), "n": len(li)}]
    for rf in sorted(set(li.l_returnflag)):
        m = (li.l_returnflag == rf).values
        rows.append({"l_returnflag": rf, "l_linestatus": None,
                     "g_rf": np.int32(0), "g_ls": np.int32(1),
                     "n": int(m.sum())})
        for ls in sorted(set(li.l_linestatus[m])):
            m2 = m & (li.l_linestatus == ls).values
            rows.append({"l_returnflag": rf, "l_linestatus": ls,
                         "g_rf": np.int32(0), "g_ls": np.int32(0),
                         "n": int(m2.sum())})
    rows.sort(key=lambda r: (int(r["g_rf"]), int(r["g_ls"]),
                             (r["l_returnflag"] is not None,
                              r["l_returnflag"] or ""),
                             (r["l_linestatus"] is not None,
                              r["l_linestatus"] or "")))
    return pd.DataFrame(rows)


@audit("q_sort_multi")
def sort_multi():
    li = table("lineitem")
    d = li.sort_values(["l_returnflag", "l_linestatus", "l_orderkey",
                        "l_linenumber"], kind="mergesort").head(100)
    return d[["l_orderkey", "l_linenumber", "l_returnflag",
              "l_linestatus"]].reset_index(drop=True)


@audit("q_posexplode")
def posexplode():
    rows = []
    for did, w in sorted(_tokens_per_doc().items()):
        if did >= 50:
            continue
        for pos, tok in enumerate(w):
            rows.append({"doc_id": did, "pos": np.int32(pos), "tok": tok})
    return pd.DataFrame(rows)


def _events_sorted(max_user):
    e = table("events")
    e = e[e.user_id < max_user]
    return e.sort_values(["user_id", "ts", "event_id"], kind="mergesort")


@audit("q_window_rank")
def window_rank():
    c = table("customer")
    d = c.sort_values(["c_nationkey", "c_acctbal", "c_custkey"],
                      ascending=[True, False, True], kind="mergesort")
    rows = []
    for nk, g in d.groupby("c_nationkey", sort=True):
        bal = g.c_acctbal.values.astype(float)
        # the order key includes custkey, so there are no ties and
        # rank() == row_number()
        for i in range(min(3, len(g))):
            rows.append({"c_nationkey": nk,
                         "c_custkey": int(g.c_custkey.values[i]),
                         "c_acctbal": float(bal[i]),
                         "rn": i + 1, "rnk": i + 1})
    return pd.DataFrame(rows)


@audit("q_window_frame")
def window_frame():
    # 4-row trailing moving average of exact DECIMAL(18,4) sums.
    d = _events_sorted(10)
    rows = []
    for uid, g in d.groupby("user_id", sort=True):
        vals = half_up(g.value.values.astype(float), 10000)
        for i in range(len(g)):
            lo = max(0, i - 3)
            w = vals[lo:i + 1]
            rows.append({"user_id": uid,
                         "event_id": int(g.event_id.values[i]),
                         "mov_avg": int(w.sum()) / 1e4 / len(w)})
    return pd.DataFrame(rows)


@audit("q_window_nth")
def window_nth():
    d = _events_sorted(40)
    rows = []
    for uid, g in d.groupby("user_id", sort=True):
        v = g.value.values.astype(float)
        for i in range(len(g)):
            rows.append({"user_id": uid,
                         "event_id": int(g.event_id.values[i]),
                         "value": float(v[i]),
                         "v3": float(v[2]) if i >= 2 else None,
                         "lag2": float(v[i - 2]) if i >= 2 else None,
                         "lead2": float(v[i + 2]) if i + 2 < len(g)
                         else -1.0})
    return pd.DataFrame(rows)


@audit("q_window_range")
def window_range():
    # RANGE frame on the VALUE axis: rows whose value is within
    # [v - 5, v] of the current row's value (per user).
    e = table("events")
    e = e[e.user_id < 10].sort_values(["user_id", "ts", "event_id"],
                                      kind="mergesort")
    rows = []
    for uid, g in e.groupby("user_id", sort=True):
        v = g.value.values.astype(float)
        for i in range(len(g)):
            n = int(((v >= v[i] - 5) & (v <= v[i])).sum())
            rows.append({"user_id": uid,
                         "event_id": int(g.event_id.values[i]),
                         "n_near": n})
    return pd.DataFrame(rows)


@audit("q_window_running")
def window_running():
    d = _events_sorted(20)
    rows = []
    for uid, g in d.groupby("user_id", sort=True):
        q = half_up(g.value.values.astype(float), 10000)
        run = 0
        prev = None
        for i in range(len(g)):
            run += int(q[i])
            rows.append({"user_id": uid,
                         "event_id": int(g.event_id.values[i]),
                         "running": run / 1e4,
                         "prev_event": prev})
            prev = int(g.event_id.values[i])
    df = pd.DataFrame(rows)
    df["prev_event"] = df["prev_event"].astype("float64") \
        if df["prev_event"].isna().any() else df["prev_event"]
    return df


def _asof_frames():
    e = table("events")
    o = table("orders")
    ets = e.ts.values.astype("datetime64[us]").astype(np.int64)
    ots = o.o_orderdate.values.astype("datetime64[us]").astype(np.int64)
    by_cust = {}
    for k, t, ok in zip(o.o_custkey.values, ots, o.o_orderkey.values):
        by_cust.setdefault(int(k), []).append((int(t), int(ok)))
    return e, ets, by_cust


@audit("q_asof_join")
def asof_join():
    # backward as-of join: latest order at-or-before each event, ties
    # to the larger orderkey.
    e, ets, by_cust = _asof_frames()
    rows = []
    for eid, uid, t in zip(e.event_id.values, e.user_id.values, ets):
        cand = [(ot, ok) for ot, ok in by_cust.get(int(uid), [])
                if ot <= t]
        if not cand:
            continue
        ot, ok = max(cand)
        rows.append({"event_id": int(eid), "user_id": int(uid),
                     "o_orderkey": ok,
                     "o_orderdate": np.datetime64(ot, "us")})
    rows.sort(key=lambda r: r["event_id"])
    return pd.DataFrame(rows)


@audit("q_asof_nearest")
def asof_nearest():
    # nearest-in-time as-of: min |Δt|, ties prefer the backward side,
    # then the larger orderkey.
    e, ets, by_cust = _asof_frames()
    rows = []
    for eid, uid, t in zip(e.event_id.values, e.user_id.values, ets):
        cand = [(abs(ot - t), 0 if ot <= t else 1, -ok)
                for ot, ok in by_cust.get(int(uid), [])]
        if not cand:
            continue
        _, _, nok = min(cand)
        rows.append({"event_id": int(eid), "user_id": int(uid),
                     "o_orderkey": -nok})
    rows.sort(key=lambda r: r["event_id"])
    return pd.DataFrame(rows)


@audit("q_asof_tolerance")
def asof_tolerance():
    # backward as-of with a 9000-day tolerance window.
    e, ets, by_cust = _asof_frames()
    tol = 9000 * 86400000000
    rows = []
    for eid, uid, t in zip(e.event_id.values, e.user_id.values, ets):
        cand = [(ot, ok) for ot, ok in by_cust.get(int(uid), [])
                if ot <= t and ot >= t - tol]
        if not cand:
            continue
        ot, ok = max(cand)
        rows.append({"event_id": int(eid), "user_id": int(uid),
                     "o_orderkey": ok,
                     "o_orderdate": np.datetime64(ot, "us")})
    rows.sort(key=lambda r: r["event_id"])
    return pd.DataFrame(rows)


@audit("q_copurchase_pairs")
def copurchase_pairs():
    li = table("lineitem")
    ps = set(zip(li.l_orderkey.astype(int), li.l_partkey.astype(int)))
    by_o = {}
    for o2, p2 in ps:
        by_o.setdefault(o2, []).append(p2)
    from collections import Counter
    c = Counter()
    for parts in by_o.values():
        parts = sorted(parts)
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                c[(parts[i], parts[j])] += 1
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return pd.DataFrame([{"pa": a, "pb": b, "n": n}
                         for (a, b), n in top])


@audit("q_math_funcs")
def math_funcs():
    li = table("lineitem")
    li = li[li.l_orderkey < 200].sort_values(["l_orderkey", "l_linenumber"],
                                             kind="mergesort")
    p = li.l_extendedprice.values.astype(float)
    dsc = li.l_discount.values.astype(float)
    q = li.l_quantity.values.astype(float)
    return pd.DataFrame({
        "l_orderkey": li.l_orderkey.values,
        "l_linenumber": li.l_linenumber.values,
        "abs_price": np.abs(p * -1),
        "sqrt_price": np.array([r6(math.sqrt(x)) for x in p]),
        "floor_p": np.floor(p).astype(np.int64),
        "ceil_p": np.ceil(p).astype(np.int64),
        "sgn": np.sign(dsc - 0.05),
        "m7": (li.l_orderkey.values % 7).astype(np.int64),
        "g": np.maximum(q, dsc * 100),
        "l": np.minimum(q, dsc * 100)})


@audit("q_date_funcs")
def date_funcs():
    o = table("orders")
    ts = pd.Series(o.o_orderdate.values)
    cents = half_up(o.o_totalprice.values.astype(float), 100)
    g = pd.DataFrame({"y": ts.dt.year, "m": ts.dt.month, "v": cents}) \
        .groupby(["y", "m"], sort=True) \
        .agg(n=("v", "size"), s=("v", "sum")).reset_index()
    return pd.DataFrame({"y": g.y.astype(np.int32),
                         "m": g.m.astype(np.int32), "n": g.n,
                         "total": g.s / 100.0})


@audit("q_bitwise_funcs")
def bitwise_funcs():
    li = table("lineitem")
    li = li[li.l_orderkey < 100].sort_values(["l_orderkey", "l_linenumber"],
                                             kind="mergesort")
    a = li.l_orderkey.values.astype(np.int64)
    b = li.l_partkey.values.astype(np.int64)
    return pd.DataFrame({
        "l_orderkey": a, "l_linenumber": li.l_linenumber.values,
        "band": a & b, "bor": a | b, "bxor": a ^ b,
        "shl": a << 3, "shr": b >> 2,
        "bits": np.array([bin(x).count("1") for x in a], dtype=np.int32)})


@audit("q_hash_funcs")
def hash_funcs():
    import hashlib
    p = table("part").sort_values("p_partkey")
    return pd.DataFrame({
        "p_partkey": p.p_partkey.values,
        "h_md5": [hashlib.md5(n.encode()).hexdigest() for n in p.p_name],
        "h_sha256": [hashlib.sha256(n.encode()).hexdigest()
                     for n in p.p_name],
        "brand8": [hashlib.md5(b.encode()).hexdigest()[:8]
                   for b in p.p_brand]})


@audit("q_string_funcs")
def string_funcs():
    import re
    p = table("part").sort_values("p_partkey")
    rows = []
    for _, r in p.iterrows():
        n = r.p_name
        m = re.search(r"([a-z]+)$", n)
        rows.append({
            "p_partkey": int(r.p_partkey), "uname": n.upper(),
            "len": len(n), "pre": n[:5], "slug": n.replace(" ", "_"),
            "bt": f"{r.p_brand}|{r.p_type}",
            "is_eco": np.int32(1 if "ECO" in r.p_type else 0),
            "last_word": m.group(1) if m else "",
            "n_words": np.int32(len(n.split(" ")))})
    return pd.DataFrame(rows)


@audit("q_regex_funcs")
def regex_funcs():
    import re
    d = table("documents").sort_values("doc_id")
    rows = []
    for _, r in d.iterrows():
        t = r.text or ""
        m = re.search(r"([a-z]{7,})", t)
        dev = re.sub(r"[aeiou]", "", t)
        rows.append({
            "doc_id": int(r.doc_id),
            "long_word": m.group(1) if m else "",
            "devowel40": dev[:40],
            "n_vowels": np.int32(len(t) - len(dev)),
            "mentions": np.int32(1 if re.search(r" (data|customer) ", t)
                                 else 0)})
    return pd.DataFrame(rows)


@audit("q_url_funcs")
def url_funcs():
    e = table("events")
    e = e[e.event_id < 2000].sort_values("event_id")
    rows = []
    for _, r in e.iterrows():
        url = (f"https://shop.example.com/{r.event_type}/page"
               f"?user={int(r.user_id)}&ref=mail")
        rows.append({"event_id": int(r.event_id), "url": url,
                     "host": "shop.example.com",
                     "path": f"/{r.event_type}/page",
                     "user_param": str(int(r.user_id))})
    return pd.DataFrame(rows)


@audit("q_array_funcs")
def array_funcs():
    c = table("customer")
    rows = []
    for nk, g in c.groupby("c_nationkey", sort=True):
        ks = sorted(g.c_custkey.astype(int))
        rows.append({
            "c_nationkey": nk, "n": np.int32(len(ks)),
            "first5": ",".join(str(k) for k in ks[:5]),
            "has_1": 1 in ks, "min_k": ks[0], "max_k": ks[-1],
            "n_even": np.int32(sum(1 for k in ks if k % 2 == 0))})
    return pd.DataFrame(rows)


@audit("q_try_arith")
def try_arith():
    li = table("lineitem")
    li = li[li.l_orderkey < 300].sort_values(["l_orderkey", "l_linenumber"],
                                             kind="mergesort")
    p = li.l_extendedprice.values.astype(float)
    q = li.l_quantity.values.astype(float)
    safe = np.where(q - 25 == 0, np.nan, p / np.where(q - 25 == 0, 1,
                                                      q - 25))
    return pd.DataFrame({
        "l_orderkey": li.l_orderkey.values,
        "l_linenumber": li.l_linenumber.values,
        "safe_div": [None if math.isnan(x) else x for x in safe],
        "oob": [None] * len(li),
        "flag_int": [None] * len(li)})


@audit("q_join_semi")
def join_semi():
    c = table("customer")
    o = table("orders")
    has = set(o.o_custkey.astype(int))
    g = c[c.c_custkey.isin(has)].groupby("c_nationkey", sort=True).size()
    return pd.DataFrame([{"c_nationkey": k, "n": int(n)}
                         for k, n in g.items()])


@audit("q_join_anti")
def join_anti():
    c = table("customer")
    o = table("orders")
    has = set(o.o_custkey.astype(int))
    g = c[~c.c_custkey.isin(has)].groupby("c_mktsegment", sort=True).size()
    return pd.DataFrame([{"c_mktsegment": k, "n": int(n)}
                         for k, n in g.items()],
                        columns=["c_mktsegment", "n"])


@audit("q_join_null_anti")
def join_null_anti():
    c = table("customer")
    o = table("orders")
    big = set(o[o.o_totalprice.astype(float) > 150000]
              .o_custkey.astype(int))
    g = c[~c.c_custkey.isin(big)].groupby("c_mktsegment", sort=True).size()
    return pd.DataFrame([{"c_mktsegment": k, "n": int(n)}
                         for k, n in g.items()])


@audit("q_bloom_join")
def bloom_join():
    c = table("customer")
    o = table("orders")
    bld = set(c[c.c_mktsegment == "BUILDING"].c_custkey.astype(int))
    sel = o[o.o_custkey.isin(bld)]
    g = sel.groupby("o_orderpriority", sort=True) \
        .o_orderkey.agg(["size", "min"])
    return pd.DataFrame([{"o_orderpriority": k, "n": int(r["size"]),
                          "min_key": int(r["min"])}
                         for k, r in g.iterrows()])


@audit("q_salted_join")
def salted_join():
    li = table("lineitem")
    g = li.groupby("l_returnflag", sort=True).size()
    return pd.DataFrame([{"l_returnflag": k, "n": int(n),
                          "rf_total": int(n)} for k, n in g.items()])


@audit("q_range_join")
def range_join():
    e = table("events")
    ts = pd.Series(e.ts.values)
    weeks = sorted(set(ts.dt.to_period("W").dt.start_time
                       + pd.Timedelta(hours=12)))
    rows = []
    for w in weeks:
        n = int(((ts >= w) & (ts < w + pd.Timedelta(hours=24))).sum())
        rows.append({"w_start": w, "n": n})
    return pd.DataFrame(rows)


@audit("q_join_outer")
def join_outer():
    n = table("nation")
    c = table("customer")
    cents = half_up(c.c_acctbal.values.astype(float), 100)
    rows = []
    for _, r in n.sort_values("n_name").iterrows():
        m = (c.c_nationkey == r.n_nationkey).values
        rows.append({"n_name": r.n_name, "n_cust": int(m.sum()),
                     "sum_bal": int(cents[m].sum()) / 100.0
                     if m.any() else None})
    rows.sort(key=lambda x: x["n_name"])
    return pd.DataFrame(rows)


@audit("q_join_right")
def join_right():
    c = table("customer")
    o = table("orders")
    cnt = o.groupby("o_custkey").size()
    rows = []
    for k in sorted(c.c_custkey.astype(int)):
        n = int(cnt.get(k, 0))
        rows.append({"c_custkey": k, "n_orders": n,
                     "n_rows": max(n, 1)})
    return pd.DataFrame(rows)


@audit("q_join_full")
def join_full():
    o = table("orders")
    o = o[o.o_custkey < 500]
    d = pd.Series(o.o_orderdate.values)
    early = o[d.values < np.datetime64("1996-01-01")] \
        .groupby("o_custkey").size()
    late = o[d.values >= np.datetime64("1999-01-01")] \
        .groupby("o_custkey").size()
    ks = sorted(set(early.index) | set(late.index))
    rows = [{"ck": int(k),
             "n_early": int(early[k]) if k in early.index else None,
             "n_late": int(late[k]) if k in late.index else None}
            for k in ks]
    df = pd.DataFrame(rows)
    for col in ("n_early", "n_late"):
        df[col] = df[col].astype("float64") if df[col].isna().any() \
            else df[col].astype("int64")
    return df


@audit("q_cross_join")
def cross_join():
    r = sorted(table("region").r_name)
    return pd.DataFrame([{"ra": a, "rb": b} for a in r for b in r])


@audit("q_lateral_join")
def lateral_join():
    n = table("nation").sort_values("n_nationkey")
    c = table("customer")
    cents = half_up(c.c_acctbal.values.astype(float), 100)
    rows = []
    for _, r in n.iterrows():
        m = (c.c_nationkey == r.n_nationkey).values
        rows.append({"n_nationkey": int(r.n_nationkey),
                     "n_name": r.n_name, "cnt": int(m.sum()),
                     "top_bal": int(cents[m].max()) / 100.0
                     if m.any() else None})
    return pd.DataFrame(rows)


@audit("q_exists_subquery")
def exists_subquery():
    c = table("customer")
    o = table("orders")
    tp = o.o_totalprice.values.astype(float)
    big = set(o.o_custkey.values[tp > 200000].astype(int))
    small = set(o.o_custkey.values[tp < 10000].astype(int))
    sel = c[c.c_custkey.isin(big - small)].sort_values("c_custkey")
    return pd.DataFrame({"c_custkey": sel.c_custkey.values,
                         "c_name": sel.c_name.values})


@audit("q_correlated_subquery")
def correlated_subquery():
    o = table("orders")
    cents = half_up(o.o_totalprice.values.astype(float), 100)
    d = pd.DataFrame({"k": o.o_custkey.values, "v": cents,
                      "raw": o.o_totalprice.values.astype(float)})
    rows = []
    for k, g in d.groupby("k", sort=True):
        # threshold: twice the customer's mean (exact decimal sum / n)
        thr = 2 * (int(g.v.sum()) / 100.0) / len(g)
        n = int((g.raw > thr).sum())
        if n:
            rows.append({"o_custkey": k, "n": n})
    return pd.DataFrame(rows)


@audit("q_scalar_subquery")
def scalar_subquery():
    o = table("orders")
    cents = half_up(o.o_totalprice.values.astype(float), 100)
    total = int(cents.sum()) / 100.0
    n_all = len(o)
    sel = o[o.o_totalprice.values.astype(float) * n_all > total]
    g = sel.groupby("o_orderpriority", sort=True).size()
    return pd.DataFrame([{"o_orderpriority": k, "n": int(n)}
                         for k, n in g.items()])


@audit("q_setops")
def setops():
    c = set(table("customer").c_nationkey.astype(int))
    s = set(table("supplier").s_nationkey.astype(int))
    rows = [("any", k) for k in sorted(c | s)] \
        + [("both", k) for k in sorted(c & s)] \
        + [("cust_only", k) for k in sorted(c - s)]
    rows.sort()
    return pd.DataFrame([{"op": op, "nationkey": k} for op, k in rows])


@audit("q_setops_all")
def setops_all():
    from collections import Counter
    c = Counter(table("customer").c_nationkey.astype(int))
    s = Counter(table("supplier").s_nationkey.astype(int))
    rows = []
    for k in sorted(set(c) | set(s)):
        rows += [("e_all", k)] * max(c[k] - s[k], 0)
        rows += [("i_all", k)] * min(c[k], s[k])
    rows.sort()
    return pd.DataFrame([{"op": op, "nationkey": k} for op, k in rows])


@audit("q_recursive_cte")
def recursive_cte():
    # halving-tree reachability: k joins to its parent k // 2.
    ks = set(table("customer").c_custkey.astype(int))
    depth = {1: 0}
    frontier = {1}
    d = 0
    while frontier:
        d += 1
        frontier = {k for k in ks
                    if 1 < k <= 200 and k // 2 in frontier}
        for k in frontier:
            depth.setdefault(k, d)
        if d > 64:
            break
    rows = {}
    for k, dd in depth.items():
        a = rows.setdefault(dd, [0, k, k])
        a[0] += 1
        a[1] = min(a[1], k)
        a[2] = max(a[2], k)
    return pd.DataFrame([{"depth": np.int32(dd), "n": a[0],
                          "min_k": a[1], "max_k": a[2]}
                         for dd, a in sorted(rows.items())])


@audit("q_interval_arith")
def interval_arith():
    e = table("events")
    e = e[e.event_id < 2000].sort_values("event_id")
    ts = pd.Series(e.ts.values)
    rows = []
    for eid, t in zip(e.event_id.values, ts):
        d = t.normalize()
        week = (d - pd.Timedelta(days=d.dayofweek)).date()
        month_end = (d + pd.offsets.MonthEnd(0)).date()
        plus2m = (d + pd.DateOffset(months=2)).date()
        rows.append({"event_id": int(eid),
                     "ts_plus": t + pd.Timedelta(minutes=90),
                     "week_start": str(week),
                     "month_end": str(month_end),
                     "plus2m": str(plus2m),
                     "wd": np.int32(d.dayofweek)})
    return pd.DataFrame(rows)


@audit("q_json_props")
def json_props():
    import json as _json
    e = table("events")
    k = np.array([_json.loads(p)["k"] for p in e.props])
    g = pd.DataFrame({"et": e.event_type.values, "k": k}) \
        .groupby("et", sort=True).agg(s=("k", "sum"), n=("k", "size"))
    return pd.DataFrame([{"event_type": et, "sum_k": int(r.s),
                          "n": int(r.n)} for et, r in g.iterrows()])


@audit("q_map_json")
def map_json():
    import json as _json
    e = table("events")
    k = np.array([_json.loads(p)["k"] for p in e.props])
    g = pd.DataFrame({"et": e.event_type.values, "k": k}) \
        .groupby("et", sort=True) \
        .agg(s=("k", "sum"), mn=("k", "min"), mx=("k", "max"),
             n=("k", "size"))
    return pd.DataFrame([{"event_type": et, "ks": "k", "sum_k": int(r.s),
                          "min_k": np.int32(r.mn),
                          "max_k": np.int32(r.mx), "n": int(r.n)}
                         for et, r in g.iterrows()])


@audit("q_variant_json")
def variant_json():
    import json as _json
    e = table("events")
    e = e[e.event_id < 3000].sort_values("event_id")
    k = np.array([_json.loads(p)["k"] for p in e.props])
    return pd.DataFrame({"event_id": e.event_id.values,
                         "k": k.astype(np.int32),
                         "k_mod": (k % 10).astype(np.int32),
                         "no_such_field": [True] * len(e)})


@audit("q_hof_extras")
def hof_extras():
    c = table("customer")
    rows = []
    for nk, g in c.groupby("c_nationkey", sort=True):
        ks = sorted(g.c_custkey.astype(int))[:8]
        rows.append({
            "c_nationkey": nk, "n": np.int32(len(ks)),
            "sum_products": sum(k * (k + 10) for k in ks),
            "has_mult7": any(k % 7 == 0 for k in ks),
            "all_pos": all(k >= 0 for k in ks),
            "total": sum(ks)})
    return pd.DataFrame(rows)


@audit("q_sequence_hof")
def sequence_hof():
    li = table("lineitem")
    li = li[li.l_orderkey < 300].sort_values(["l_orderkey", "l_linenumber"],
                                             kind="mergesort")
    k = li.l_quantity.values.astype(float).astype(np.int64)
    return pd.DataFrame({
        "l_orderkey": li.l_orderkey.values,
        "l_linenumber": li.l_linenumber.values, "k": k,
        "tri": k * (k + 1) // 2,
        "sumsq": k * (k + 1) * (2 * k + 1) // 6,
        "n_even": k // 2})


@audit("q_null_semantics")
def null_semantics():
    c = table("customer")
    c = c[c.c_custkey < 200]
    bal = c.c_acctbal.values.astype(float)
    b = np.where(bal < 0, np.nan, bal)
    rows = []
    for nk, g in pd.DataFrame({"n": c.c_nationkey.values, "b": b,
                               "k": c.c_custkey.values}) \
            .groupby("n", sort=True):
        nn = int((~np.isnan(g.b.values)).sum())
        # null-safe pair count: pairs agreeing on bal INCLUDING null==null
        from collections import Counter
        cnt = Counter("NULL" if math.isnan(x) else x for x in g.b.values)
        pairs = sum(v * (v - 1) // 2 for v in cnt.values())
        rows.append({"c_nationkey": nk, "n_all": len(g), "n_bal": nn,
                     "n_null": len(g) - nn,
                     "min_bal": (None if nn == 0
                                 else float(np.nanmin(g.b.values))),
                     "n_nullsafe_pairs": pairs})
    rows.sort(key=lambda r: (r["min_bal"] is not None,
                             r["min_bal"] if r["min_bal"] is not None
                             else 0.0, r["c_nationkey"]))
    return pd.DataFrame(rows)


@audit("q_profile_columns")
def profile_columns():
    o = table("orders")
    rows = []
    for col in ("o_orderkey", "o_custkey", "o_orderstatus",
                "o_orderpriority"):
        v = o[col]
        mn, mx = v.min(), v.max()
        rows.append({"col_name": col, "n_rows": len(o),
                     "n_nonnull": int(v.notna().sum()),
                     "n_distinct": int(v.nunique()),
                     "min_s": str(mn), "max_s": str(mx)})
    rows.sort(key=lambda r: r["col_name"])
    return pd.DataFrame(rows)


@audit("q_bpe_pair_freqs")
def bpe_pair_freqs():
    # character-bigram frequencies weighted by word frequency (the BPE
    # round-1 pair table), over [a-z0-9]+ subwords.
    import re
    from collections import Counter
    words = Counter()
    for text in table("documents").text:
        words.update(x for x in re.split(r"[^a-z0-9]+",
                                         (text or "").lower()) if x)
    pc = Counter()
    for w, f in words.items():
        if len(w) >= 2:
            for i in range(len(w) - 1):
                pc[w[i:i + 2]] += f
    top = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return pd.DataFrame([{"pair": p, "n": n} for p, n in top])


@audit("q_merge_upsert")
def merge_upsert():
    c = table("customer")
    cents = half_up(c.c_acctbal.values.astype(float), 100)
    rows = {}
    for (k, nm, nk, b, seg) in zip(c.c_custkey.astype(int), c.c_name,
                                   c.c_nationkey.astype(int), cents,
                                   c.c_mktsegment):
        if k % 37 == 0:
            continue  # deleted
        if k % 10 == 0:
            rows[k] = (nm, nk, 0.0, seg)  # updated to bal 0
        else:
            rows[k] = (nm, nk, b / 100.0, seg)
        if k % 100 == 0:
            rows[k + 1000000] = (f"NEW_{k}", 0, 100.0, "MACHINERY")
    # inserts for deleted-but-%100 customers too
    for k in c.c_custkey.astype(int):
        if k % 100 == 0 and k % 37 == 0:
            rows[k + 1000000] = (f"NEW_{k}", 0, 100.0, "MACHINERY")
    return pd.DataFrame([{"c_custkey": k, "c_name": v[0],
                          "c_nationkey": np.int32(v[1]), "bal": v[2],
                          "c_mktsegment": v[3]}
                         for k, v in sorted(rows.items())])


@audit("q_snapshot_diff")
def snapshot_diff():
    o = table("orders")
    ks = o.o_orderkey.astype(int).values
    status = o.o_orderstatus.values
    old = {k: ("P" if k % 13 == 0 else s)
           for k, s in zip(ks, status) if k % 17 != 5}
    new = {k: s for k, s in zip(ks, status) if k % 11 != 3}
    rows = []
    for k in sorted(set(old) | set(new)):
        if k not in old:
            rows.append({"o_orderkey": k, "change": "added"})
        elif k not in new:
            rows.append({"o_orderkey": k, "change": "removed"})
        elif old[k] != new[k]:
            rows.append({"o_orderkey": k, "change": "changed"})
    return pd.DataFrame(rows)


@audit("q_scd2_lookup")
def scd2_lookup():
    # point-in-time SCD-2 lookup: latest version valid at each event.
    o = table("orders")
    o = o[o.o_custkey < 200]
    d = o.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                      kind="mergesort")
    versions = {}
    for ck, g in d.groupby("o_custkey", sort=False):
        vf = g.o_orderdate.values.astype("datetime64[us]").astype(np.int64)
        versions[int(ck)] = [(int(t), i + 1, int(k))
                             for i, (t, k) in enumerate(
                                 zip(vf, g.o_orderkey.values))]
    e = table("events")
    ets = e.ts.values.astype("datetime64[us]").astype(np.int64)
    rows = []
    for eid, uid, t in zip(e.event_id.values, e.user_id.values, ets):
        vs = [v for v in versions.get(int(uid), []) if v[0] <= t]
        if not vs:
            continue
        _, ver, ok = max(vs)
        rows.append({"event_id": int(eid), "user_id": int(uid),
                     "version": np.int32(ver), "o_orderkey": ok})
    rows.sort(key=lambda r: r["event_id"])
    return pd.DataFrame(rows)


# --- TPC-H classics (exact decimal replays) ----------------------------------

def _li_money():
    """lineitem money columns in exact integer units: price cents,
    discount/tax hundredths — the engines' DECIMAL(12,2)/(4,2) domain."""
    li = table("lineitem")
    return li, \
        half_up(li.l_extendedprice.values.astype(float), 100), \
        half_up(li.l_discount.values.astype(float), 100), \
        half_up(li.l_tax.values.astype(float), 100)


def _dt(col):
    return col.values.astype("datetime64[D]")


@audit("q1_agg")
def q1_agg():
    li, cents, disc, tax = _li_money()
    m = _dt(li.l_shipdate) <= np.datetime64("1998-09-02")
    rows = []
    d = pd.DataFrame({"rf": li.l_returnflag.values[m],
                      "ls": li.l_linestatus.values[m],
                      "q": li.l_quantity.values.astype(float)[m],
                      "c": cents[m].astype(object),
                      "dp": (cents[m].astype(object)
                             * (100 - disc[m].astype(object))),
                      "ch": (cents[m].astype(object)
                             * (100 - disc[m].astype(object))
                             * (100 + tax[m].astype(object)))})
    for (rf, ls), g in d.groupby(["rf", "ls"], sort=True):
        n = len(g)
        rows.append({
            "l_returnflag": rf, "l_linestatus": ls,
            "sum_qty": float(g.q.sum()),
            "sum_base": int(g.c.sum()) / 1e2,
            "sum_disc_price": int(g.dp.sum()) / 1e4,
            "sum_charge": int(g.ch.sum()) / 1e6,
            "avg_qty": float(g.q.sum()) / n,
            "avg_price": int(g.c.sum()) / 1e2 / n,
            "n": n})
    return pd.DataFrame(rows)


@audit("q3_join_topk")
def q3_join_topk():
    li, cents, disc, _ = _li_money()
    c = table("customer")
    o = table("orders")
    bld = set(c[c.c_mktsegment == "BUILDING"].c_custkey.astype(int))
    osel = o[o.o_custkey.isin(bld)
             & (_dt(o.o_orderdate) < np.datetime64("1998-03-15"))]
    odate = dict(zip(osel.o_orderkey.astype(int), osel.o_orderdate))
    m = (_dt(li.l_shipdate) > np.datetime64("1998-03-15")) \
        & li.l_orderkey.isin(odate).values
    rev = {}
    for ok, cts, dsc in zip(li.l_orderkey.values[m], cents[m], disc[m]):
        rev[int(ok)] = rev.get(int(ok), 0) + int(cts) * (100 - int(dsc))
    top = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return pd.DataFrame([{"l_orderkey": k, "revenue": v / 1e4,
                          "o_orderdate": odate[k]} for k, v in top])


@audit("q4_priority_exists")
def q4_priority_exists():
    o = table("orders")
    li = table("lineitem")
    od = dict(zip(o.o_orderkey.astype(int), _dt(o.o_orderdate)))
    late = {int(ok) for ok, sd in zip(li.l_orderkey.values,
                                      _dt(li.l_shipdate))
            if int(ok) in od and sd > od[int(ok)]}
    sel = o[(_dt(o.o_orderdate) >= np.datetime64("1996-07-01"))
            & (_dt(o.o_orderdate) < np.datetime64("1996-10-01"))
            & o.o_orderkey.isin(late)]
    g = sel.groupby("o_orderpriority", sort=True).size()
    return pd.DataFrame([{"o_orderpriority": k, "order_count": int(n)}
                         for k, n in g.items()])


@audit("q5_join_broadcast")
def q5_join_broadcast():
    li, cents, disc, _ = _li_money()
    r = table("region"); n = table("nation")
    s = table("supplier"); o = table("orders"); c = table("customer")
    nname = dict(zip(n.n_nationkey.astype(int), n.n_name))
    snat = dict(zip(s.s_suppkey.astype(int), s.s_nationkey.astype(int)))
    cnat = dict(zip(c.c_custkey.astype(int), c.c_nationkey.astype(int)))
    osel = o[(_dt(o.o_orderdate) >= np.datetime64("1996-01-01"))
             & (_dt(o.o_orderdate) < np.datetime64("1997-01-01"))]
    ocust = dict(zip(osel.o_orderkey.astype(int),
                     osel.o_custkey.astype(int)))
    rev = {}
    for ok, sk, cts, dsc in zip(li.l_orderkey.values, li.l_suppkey.values,
                                cents, disc):
        ok, sk = int(ok), int(sk)
        if ok not in ocust:
            continue
        nk = snat[sk]
        if cnat[ocust[ok]] != nk:
            continue
        rev[nname[nk]] = rev.get(nname[nk], 0) \
            + int(cts) * (100 - int(dsc))
    return pd.DataFrame([{"n_name": k, "revenue": v / 1e4}
                         for k, v in sorted(rev.items())])


@audit("q6_filter_pushdown")
def q6_filter_pushdown():
    li, cents, disc, _ = _li_money()
    d = li.l_discount.values.astype(float)
    m = (_dt(li.l_shipdate) >= np.datetime64("1996-01-01")) \
        & (_dt(li.l_shipdate) < np.datetime64("1997-01-01")) \
        & (d >= 0.05) & (d <= 0.07) \
        & (li.l_quantity.values.astype(float) < 24)
    rev = sum(int(a) * int(b) for a, b in zip(cents[m], disc[m]))
    return pd.DataFrame([{"revenue": rev / 1e4, "n": int(m.sum())}])


@audit("q7_nation_volume")
def q7_nation_volume():
    li, cents, disc, _ = _li_money()
    s = table("supplier"); o = table("orders")
    c = table("customer"); n = table("nation")
    nname = dict(zip(n.n_nationkey.astype(int), n.n_name))
    snat = dict(zip(s.s_suppkey.astype(int), s.s_nationkey.astype(int)))
    cnat = dict(zip(c.c_custkey.astype(int), c.c_nationkey.astype(int)))
    ocust = dict(zip(o.o_orderkey.astype(int), o.o_custkey.astype(int)))
    sd = _dt(li.l_shipdate)
    want = {"NATION_1", "NATION_2"}
    rev = {}
    yr = pd.Series(li.l_shipdate.values).dt.year.values
    m = (sd >= np.datetime64("1996-01-01")) & (sd < np.datetime64("1998-01-01"))
    for ok, sk, cts, dsc, y, keep in zip(li.l_orderkey.values,
                                         li.l_suppkey.values, cents, disc,
                                         yr, m):
        if not keep:
            continue
        sn = nname[snat[int(sk)]]
        cn = nname[cnat[ocust[int(ok)]]]
        if sn in want and cn in want and sn != cn:
            key = (sn, cn, int(y))
            rev[key] = rev.get(key, 0) + int(cts) * (100 - int(dsc))
    return pd.DataFrame([{"supp_nation": a, "cust_nation": b,
                          "l_year": np.int32(y), "revenue": v / 1e4}
                         for (a, b, y), v in sorted(rev.items())])


@audit("q8_market_share")
def q8_market_share():
    li, cents, disc, _ = _li_money()
    p = table("part"); s = table("supplier"); o = table("orders")
    c = table("customer"); n = table("nation"); r = table("region")
    nname = dict(zip(n.n_nationkey.astype(int), n.n_name))
    nreg = dict(zip(n.n_nationkey.astype(int), n.n_regionkey.astype(int)))
    rname = dict(zip(r.r_regionkey.astype(int), r.r_name))
    promo = set(p[p.p_type == "PROMO"].p_partkey.astype(int))
    snat = dict(zip(s.s_suppkey.astype(int), s.s_nationkey.astype(int)))
    cnat = dict(zip(c.c_custkey.astype(int), c.c_nationkey.astype(int)))
    ocust = dict(zip(o.o_orderkey.astype(int), o.o_custkey.astype(int)))
    oyear = dict(zip(o.o_orderkey.astype(int),
                     pd.Series(o.o_orderdate.values).dt.year.values))
    tot, nat5 = {}, {}
    for ok, pk, sk, cts, dsc in zip(li.l_orderkey.values,
                                    li.l_partkey.values,
                                    li.l_suppkey.values, cents, disc):
        if int(pk) not in promo:
            continue
        cn = cnat[ocust[int(ok)]]
        if rname[nreg[cn]] != "ASIA":
            continue
        y = int(oyear[int(ok)])
        v = int(cts) * (100 - int(dsc))
        tot[y] = tot.get(y, 0) + v
        if nname[snat[int(sk)]] == "NATION_5":
            nat5[y] = nat5.get(y, 0) + v
    return pd.DataFrame([{"o_year": np.int32(y),
                          "mkt_share": (nat5.get(y, 0) / 1e4)
                          / (tot[y] / 1e4) if nat5.get(y) else None}
                         for y in sorted(tot)])


@audit("q9_profit_proxy")
def q9_profit_proxy():
    li, cents, disc, _ = _li_money()
    p = table("part"); s = table("supplier")
    o = table("orders"); n = table("nation")
    nname = dict(zip(n.n_nationkey.astype(int), n.n_name))
    snat = dict(zip(s.s_suppkey.astype(int), s.s_nationkey.astype(int)))
    bolt = {int(k): half_up(float(rp), 100)
            for k, nm, rp in zip(p.p_partkey, p.p_name, p.p_retailprice)
            if "bolt" in nm}
    oyear = dict(zip(o.o_orderkey.astype(int),
                     pd.Series(o.o_orderdate.values).dt.year.values))
    q = li.l_quantity.values.astype(float).astype(np.int64)
    prof = {}
    for ok, pk, sk, cts, dsc, qty in zip(li.l_orderkey.values,
                                         li.l_partkey.values,
                                         li.l_suppkey.values, cents,
                                         disc, q):
        pk = int(pk)
        if pk not in bolt:
            continue
        # amount in 1e-4 dollars: price·(100−disc) − retail·50·qty
        amt = int(cts) * (100 - int(dsc)) - int(bolt[pk]) * 50 * int(qty)
        key = (nname[snat[int(sk)]], int(oyear[int(ok)]))
        prof[key] = prof.get(key, 0) + amt
    return pd.DataFrame([{"n_name": nn, "o_year": np.int32(y),
                          "sum_profit": v / 1e4}
                         for (nn, y), v in sorted(prof.items())])


@audit("q10_returned_top")
def q10_returned_top():
    li, cents, disc, _ = _li_money()
    c = table("customer"); o = table("orders"); n = table("nation")
    nname = dict(zip(n.n_nationkey.astype(int), n.n_name))
    osel = o[(_dt(o.o_orderdate) >= np.datetime64("1996-10-01"))
             & (_dt(o.o_orderdate) < np.datetime64("1997-01-01"))]
    ocust = dict(zip(osel.o_orderkey.astype(int),
                     osel.o_custkey.astype(int)))
    m = (li.l_returnflag.values == "R") \
        & li.l_orderkey.isin(ocust).values
    rev = {}
    for ok, cts, dsc in zip(li.l_orderkey.values[m], cents[m], disc[m]):
        ck = ocust[int(ok)]
        rev[ck] = rev.get(ck, 0) + int(cts) * (100 - int(dsc))
    cinfo = {int(k): (nm, float(b), nname[int(nk)])
             for k, nm, b, nk in zip(c.c_custkey, c.c_name, c.c_acctbal,
                                     c.c_nationkey)}
    top = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return pd.DataFrame([{"c_custkey": k, "c_name": cinfo[k][0],
                          "revenue": v / 1e4, "acctbal": cinfo[k][1],
                          "n_name": cinfo[k][2]} for k, v in top])


@audit("q12_delay_buckets")
def q12_delay_buckets():
    li = table("lineitem")
    o = table("orders")
    od = dict(zip(o.o_orderkey.astype(int), _dt(o.o_orderdate)))
    prio = dict(zip(o.o_orderkey.astype(int), o.o_orderpriority))
    sd = _dt(li.l_shipdate)
    agg = {}
    for ok, s in zip(li.l_orderkey.values, sd):
        ok = int(ok)
        dd = int((s - od[ok]).astype(int))
        b = "fast" if dd < 30 else "medium" if dd < 90 else "slow"
        hi = prio[ok] in ("1-URGENT", "2-HIGH")
        a = agg.setdefault(b, [0, 0])
        a[0 if hi else 1] += 1
    return pd.DataFrame([{"delay_bucket": b, "high_count": a[0],
                          "low_count": a[1]}
                         for b, a in sorted(agg.items())])


@audit("q14_promo_share")
def q14_promo_share():
    li, cents, disc, _ = _li_money()
    p = table("part")
    promo = set(p[p.p_type == "PROMO"].p_partkey.astype(int))
    sd = _dt(li.l_shipdate)
    m = (sd >= np.datetime64("1996-09-01")) \
        & (sd < np.datetime64("1996-10-01"))
    tot = promo_v = 0
    for pk, cts, dsc in zip(li.l_partkey.values[m], cents[m], disc[m]):
        v = int(cts) * (100 - int(dsc))
        tot += v
        if int(pk) in promo:
            promo_v += v
    return pd.DataFrame([{"promo_share": (promo_v / 1e4) * 100.0
                          / (tot / 1e4)}])


@audit("q15_top_supplier")
def q15_top_supplier():
    li, cents, disc, _ = _li_money()
    s = table("supplier")
    sd = _dt(li.l_shipdate)
    m = (sd >= np.datetime64("1996-01-01")) \
        & (sd < np.datetime64("1996-04-01"))
    rev = {}
    for sk, cts, dsc in zip(li.l_suppkey.values[m], cents[m], disc[m]):
        rev[int(sk)] = rev.get(int(sk), 0) + int(cts) * (100 - int(dsc))
    mx = max(rev.values())
    sname = dict(zip(s.s_suppkey.astype(int), s.s_name))
    return pd.DataFrame([{"s_suppkey": k, "s_name": sname[k],
                          "total_revenue": v / 1e4}
                         for k, v in sorted(rev.items()) if v == mx])


@audit("q17_small_qty_revenue")
def q17_small_qty_revenue():
    li, cents, _, _ = _li_money()
    p = table("part")
    b11 = set(p[p.p_brand == "Brand#11"].p_partkey.astype(int))
    q = li.l_quantity.values.astype(float).astype(np.int64)
    pk = li.l_partkey.values.astype(int)
    cnt, sq = {}, {}
    for k, qq in zip(pk, q):
        cnt[k] = cnt.get(k, 0) + 1
        sq[k] = sq.get(k, 0) + int(qq)
    tot = n = 0
    for k, qq, cts in zip(pk, q, cents):
        if k in b11 and 5 * int(qq) * cnt[k] < sq[k]:
            tot += int(cts)
            n += 1
    return pd.DataFrame([{"avg_yearly": tot / 100.0 / 7.0, "n": n}])


@audit("q18_volume_customers")
def q18_volume_customers():
    li = table("lineitem")
    o = table("orders")
    c = table("customer")
    q = li.l_quantity.values.astype(float).astype(np.int64)
    sums = {}
    for ok, qq in zip(li.l_orderkey.values.astype(int), q):
        sums[ok] = sums.get(ok, 0) + int(qq)
    big = {k: v for k, v in sums.items() if v > 300}
    cname = dict(zip(c.c_custkey.astype(int), c.c_name))
    rows = []
    for ok, ck, od, tp in zip(o.o_orderkey.astype(int),
                              o.o_custkey.astype(int),
                              o.o_orderdate, o.o_totalprice):
        if ok in big:
            rows.append({"c_custkey": ck, "c_name": cname[ck],
                         "o_orderkey": ok, "o_orderdate": od,
                         "totalprice": float(tp), "sum_qty": big[ok]})
    rows.sort(key=lambda r: (-r["totalprice"], r["o_orderkey"]))
    return pd.DataFrame(rows[:50])


@audit("q19_or_pushdown")
def q19_or_pushdown():
    li, cents, disc, _ = _li_money()
    p = table("part")
    binfo = {int(k): (b, int(sz)) for k, b, sz in
             zip(p.p_partkey, p.p_brand, p.p_size)}
    q = li.l_quantity.values.astype(float)
    tot = n = 0
    for pk, qq, cts, dsc in zip(li.l_partkey.values.astype(int), q,
                                cents, disc):
        b, sz = binfo[pk]
        ok = (b == "Brand#12" and 1 <= sz <= 15 and 1 <= qq <= 11) \
            or (b == "Brand#23" and 1 <= sz <= 25 and 10 <= qq <= 20) \
            or (b == "Brand#3" and 1 <= sz <= 35 and 20 <= qq <= 30)
        if ok:
            tot += int(cts) * (100 - int(dsc))
            n += 1
    return pd.DataFrame([{"revenue": tot / 1e4, "n": n}])


@audit("q20_semi_agg")
def q20_semi_agg():
    li = table("lineitem")
    p = table("part")
    s = table("supplier")
    promo = set(p[p.p_type == "PROMO"].p_partkey.astype(int))
    q = li.l_quantity.values.astype(float).astype(np.int64)
    agg = {}
    for sk, pk, qq in zip(li.l_suppkey.values.astype(int),
                          li.l_partkey.values.astype(int), q):
        if pk in promo:
            agg[sk] = agg.get(sk, 0) + int(qq)
    keep = {k for k, v in agg.items() if v > 100}
    sname = dict(zip(s.s_suppkey.astype(int), s.s_name))
    return pd.DataFrame([{"s_suppkey": k, "s_name": sname[k]}
                         for k in sorted(keep)])


@audit("q22_idle_customers")
def q22_idle_customers():
    c = table("customer")
    o = table("orders")
    cents = half_up(c.c_acctbal.values.astype(float), 100)
    pos = cents[c.c_acctbal.values.astype(float) > 0.0]
    cnt, tot = len(pos), int(pos.sum())
    has = set(o.o_custkey.astype(int))
    m = (cents.astype(object) * cnt > tot) \
        & ~c.c_custkey.isin(has).values
    g = pd.DataFrame({"n": c.c_nationkey.values[m],
                      "v": cents[m]}).groupby("n", sort=True) \
        .agg(num=("v", "size"), s=("v", "sum"))
    return pd.DataFrame([{"c_nationkey": k, "numcust": int(r.num),
                          "totacctbal": int(r.s) / 100.0}
                         for k, r in g.iterrows()],
                        columns=["c_nationkey", "numcust", "totacctbal"])


@audit("q_asof_forward")
def asof_forward():
    # forward as-of: earliest event at-or-after each order, ties to the
    # larger event_id (rn orders ts ASC, event_id DESC).
    e = table("events")
    o = table("orders")
    ets = e.ts.values.astype("datetime64[us]").astype(np.int64)
    by_user = {}
    for u, t, eid in zip(e.user_id.values, ets, e.event_id.values):
        by_user.setdefault(int(u), []).append((int(t), -int(eid)))
    rows = []
    for ok, ck, od in zip(o.o_orderkey.astype(int),
                          o.o_custkey.astype(int),
                          o.o_orderdate.values
                          .astype("datetime64[us]").astype(np.int64)):
        cand = [(t, ne) for t, ne in by_user.get(ck, []) if t >= od]
        if not cand:
            continue
        _, ne = min(cand)
        rows.append({"o_orderkey": ok, "o_custkey": ck,
                     "event_id": -ne})
    rows.sort(key=lambda r: r["o_orderkey"])
    return pd.DataFrame(rows)


@audit("q_asof_outer")
def asof_outer():
    # backward as-of LEFT join: unmatched events keep a null order side.
    e, ets, by_cust = _asof_frames()
    rows = []
    for eid, uid, t in zip(e.event_id.values, e.user_id.values, ets):
        cand = [(ot, ok) for ot, ok in by_cust.get(int(uid), [])
                if ot <= t]
        if cand:
            ot, ok = max(cand)
            rows.append({"event_id": int(eid), "user_id": int(uid),
                         "o_orderkey": ok,
                         "o_orderdate": np.datetime64(ot, "us")})
        else:
            rows.append({"event_id": int(eid), "user_id": int(uid),
                         "o_orderkey": None, "o_orderdate": None})
    rows.sort(key=lambda r: r["event_id"])
    df = pd.DataFrame(rows)
    if df.o_orderkey.isna().any():
        df["o_orderkey"] = df["o_orderkey"].astype("float64")
    return df


@audit("q_asof_broadcast")
def asof_broadcast():
    return asof_join()


@audit("q_udaf_wavg")
def udaf_wavg():
    li, cents, disc, _ = _li_money()
    qc = half_up(li.l_quantity.values.astype(float), 100)
    rows = []
    for fl, g in pd.DataFrame({"f": li.l_returnflag.values,
                               "c": cents.astype(object),
                               "d": disc.astype(object),
                               "q": qc.astype(object)}) \
            .groupby("f", sort=True):
        num = sum(int(c) * (100 - int(d)) * int(q)
                  for c, d, q in zip(g.c, g.d, g.q))
        den = sum(int(q) for q in g.q)
        rows.append({"l_returnflag": fl,
                     "wavg_price": r6((num / 1e6) / (den / 1e2)),
                     "n": len(g)})
    return pd.DataFrame(rows)


@audit("q_window_extras")
def window_extras():
    c = table("customer")
    d = c.sort_values(["c_nationkey", "c_acctbal", "c_custkey"],
                      ascending=[True, False, True], kind="mergesort")
    rows = []
    for nk, g in d.groupby("c_nationkey", sort=True):
        n = len(g)
        ks = g.c_custkey.values.astype(int)
        base, extra = divmod(n, 4)
        tile = np.repeat(np.arange(1, 5),
                         [base + (1 if k <= extra else 0)
                          for k in range(1, 5)])
        # order key includes custkey -> no ties: dense_rank == row_number
        for i in range(n):
            rows.append({
                "c_custkey": int(ks[i]), "c_nationkey": nk,
                "drnk": i + 1, "q4": int(tile[i]),
                "richest": int(ks[0]),
                "pr": math.floor(i / (n - 1) * 1e6 + 0.5) / 1e6
                if n > 1 else 0.0,
                "cd": math.floor((i + 1) / n * 1e6 + 0.5) / 1e6})
    rows.sort(key=lambda r: (r["c_nationkey"], r["c_custkey"]))
    return pd.DataFrame(rows)


@audit("q_skyline_2d")
def skyline_2d():
    p = table("part")
    price = half_up(p.p_retailprice.values.astype(float), 100)
    pts = list(zip(p.p_size.values.astype(int), price,
                   p.p_partkey.values.astype(int)))
    rows = []
    for sz, pr, k in pts:
        dominated = any(
            (s2 <= sz and p2 <= pr and (s2 < sz or p2 < pr))
            for s2, p2, _ in pts)
        if not dominated:
            rows.append({"p_partkey": k, "p_size": np.int32(sz),
                         "price": pr / 100.0})
    rows.sort(key=lambda r: (int(r["p_size"]), r["p_partkey"]))
    return pd.DataFrame(rows)


def _linkage_scored():
    """Fellegi-Sunter customer linkage replay (Fellegi & Sunter 1969):
    deterministic corruption -> two blocking passes -> 4-comparator
    agreement levels -> integer log-weight score. Returns the scored
    candidate list [(d_id, c_custkey, pattern, score, pr-row)] plus the
    pass pair-counts."""
    c = table("customer")
    cents = half_up(c.c_acctbal.values.astype(float), 100)
    cust = {int(k): (nm, int(nk), int(b), seg)
            for k, nm, nk, b, seg in zip(c.c_custkey, c.c_name,
                                         c.c_nationkey, cents,
                                         c.c_mktsegment)}
    dirty = {}
    for k, (nm, nk, b, seg) in cust.items():
        if k % 3 == 2:
            continue
        hh = md5h60(k)
        dn = (nm.upper() if hh % 4 == 0 else
              nm[:-1] if hh % 4 == 1 else
              nm + " " if hh % 4 == 2 else nm)
        dnat = (nk + 1) % 25 if hh % 7 == 0 else nk
        dbal = b + 7 if hh % 5 == 0 else b
        dirty[k] = (dn, dnat, dbal, seg)
    # pass A: (nat, seg, floor(bal/100)) attribute block
    blocka = {}
    for ck, (nm, nk, b, seg) in cust.items():
        blocka.setdefault((nk, seg, math.floor(b / 10000)), []).append(ck)
    pa = [(d, ck) for d, (dn, dnat, dbal, dseg) in dirty.items()
          for ck in blocka.get((dnat, dseg, math.floor(dbal / 10000)), [])]
    # pass B: name chars 10..16
    blockb = {}
    for ck, (nm, nk, b, seg) in cust.items():
        blockb.setdefault(nm[9:16], []).append(ck)
    pb = [(d, ck) for d, (dn, dnat, dbal, dseg) in dirty.items()
          for ck in blockb.get(dn[9:16], [])]
    cand = sorted(set(pa) | set(pb))
    scored = []
    for d, ck in cand:
        dn, dnat, dbal, dseg = dirty[d]
        nm, nk, b, seg = cust[ck]
        name_lv = (2 if dn == nm else
                   1 if _lev(dn.lower(), nm.lower()) <= 2 else 0)
        bal_lv = 1 if abs(dbal - b) <= 10 else 0
        key_lv = 1 if dnat == nk else 0
        seg_lv = 1 if dseg == seg else 0
        score = {2: 20, 1: 12, 0: -10}[name_lv] \
            + (6 if bal_lv else -4) + (3 if key_lv else -2) \
            + (3 if seg_lv else -2)
        pat = f"n{name_lv}|b{bal_lv}|k{key_lv}|s{seg_lv}"
        scored.append((d, ck, pat, score,
                       (dn, dbal, nm, b)))
    return scored, len(pa), len(pb), len(cand), \
        len({d for d, _ in pa}), len({d for d, _ in pb}), \
        len({d for d, _ in cand})


@audit("q_link_matches")
def link_matches():
    scored = _linkage_scored()[0]
    rows = [{"d_id": d, "c_custkey": ck, "pattern": p, "fs_score": s}
            for d, ck, p, s, _ in scored if s >= 18]
    rows.sort(key=lambda r: (r["d_id"], r["c_custkey"]))
    return pd.DataFrame(rows)


@audit("q_link_zones")
def link_zones():
    scored = _linkage_scored()[0]
    agg = {}
    for d, ck, _, s, _ in scored:
        zone = "match" if s >= 18 else "possible" if s >= 5 \
            else "nonmatch"
        a = agg.setdefault((zone, d == ck), [0, s, s])
        a[0] += 1
        a[1] = min(a[1], s)
        a[2] = max(a[2], s)
    return pd.DataFrame([{"zone": z, "is_true": t, "n": a[0],
                          "min_s": a[1], "max_s": a[2]}
                         for (z, t), a in sorted(agg.items())])


@audit("q_link_blocking")
def link_blocking():
    _, npa, npb, ncand, la, lb, lc = _linkage_scored()
    return pd.DataFrame([
        {"pass": "pass_block", "n_pairs": npa, "n_left": la},
        {"pass": "pass_name", "n_pairs": npb, "n_left": lb},
        {"pass": "union_distinct", "n_pairs": ncand, "n_left": lc}])


@audit("q_golden_record")
def golden_record():
    scored = _linkage_scored()[0]
    m = [(d, ck, info) for d, ck, _, s, info in scored if s >= 18]
    by_c = {}
    for d, ck, (dn, dbal, nm, b) in m:
        a = by_c.setdefault(ck, {"d": set(), "names": []})
        a["d"].add(d)
        a["names"].append((dn, dbal))
    rows = []
    for ck in sorted(by_c):
        a = by_c[ck]
        # c-side name/bal appear once (DISTINCT), d-side per match
        nm, b = next((i[2], i[3]) for d, c2, i in
                     [(d, c2, i) for d, c2, _, s, i in scored
                      if c2 == ck and s >= 18])
        names = a["names"] + [(nm, b)]
        best = max(names, key=lambda x: (len(x[0]), x[0]))[0]
        rows.append({"c_custkey": ck,
                     "n_matched": np.int32(len(a["d"])),
                     "best_name": best,
                     "max_bal": max(x[1] for x in names) / 100.0})
    return pd.DataFrame(rows)


def _xy_points():
    o = table("orders")
    x = o.o_custkey.values.astype(np.int64)
    y = ((o.o_orderdate.values.astype("datetime64[D]")
          - np.datetime64("1992-01-01")).astype(np.int64))
    return x, y


@audit("q_hilbert_layout")
def hilbert_layout():
    # Hilbert curve d-index (16-bit per axis, the classic xy2d rotation
    # walk), bucketed by the top 12 bits.
    x0, y0 = _xy_points()
    def xy2d(x, y):
        d = 0
        s = 1 << 15
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            # rotate
            if ry == 0:
                if rx == 1:
                    x = 65535 - x
                    y = 65535 - y
                x, y = y, x
            s //= 2
        return d
    hv = np.array([xy2d(int(a), int(b)) for a, b in zip(x0, y0)])
    g = pd.DataFrame({"b": hv >> 20, "h": hv}).groupby("b", sort=True) \
        .agg(n=("h", "size"), mn=("h", "min"), mx=("h", "max"))
    return pd.DataFrame([{"bucket": int(b), "n": int(r.n),
                          "min_h": int(r.mn), "max_h": int(r.mx)}
                         for b, r in g.iterrows()])


@audit("q_zorder_layout")
def zorder_layout():
    # Morton/Z-order interleave of 16 bits of custkey (even positions)
    # and day-offset (odd positions), bucketed by the top 12 bits.
    x0, y0 = _xy_points()
    z = np.zeros(len(x0), dtype=np.int64)
    for i in range(16):
        z |= ((x0 >> i) & 1) << (2 * i)
        z |= ((y0 >> i) & 1) << (2 * i + 1)
    g = pd.DataFrame({"b": z >> 20, "z": z}).groupby("b", sort=True) \
        .agg(n=("z", "size"), mn=("z", "min"), mx=("z", "max"))
    return pd.DataFrame([{"bucket": int(b), "n": int(r.n),
                          "min_z": int(r.mn), "max_z": int(r.mx)}
                         for b, r in g.iterrows()])


@audit("q_partitioned_layout")
def partitioned_layout():
    li = table("lineitem")
    sel = li[li.l_returnflag == "R"]
    q = sel.l_quantity.values.astype(float).astype(np.int64)
    rows = []
    for ls in sorted(set(sel.l_linestatus)):
        m = (sel.l_linestatus == ls).values
        rows.append({"l_linestatus": ls, "n": int(m.sum()),
                     "sum_qty": int(q[m].sum()),
                     "sum_key": int(sel.l_orderkey.values[m].sum())})
    return pd.DataFrame(rows)


@audit("q_compaction_plan")
def compaction_plan():
    d = table("documents").sort_values("doc_id")
    nc = d.n_chars.values.astype(np.int64)
    cum = np.cumsum(nc)
    bins = (cum - nc) // 8192
    rows = []
    for b in sorted(set(bins)):
        m = bins == b
        rows.append({"bin": int(b), "n_files": np.int32(m.sum()),
                     "bytes": int(nc[m].sum()),
                     "first_id": int(d.doc_id.values[m].min()),
                     "last_id": int(d.doc_id.values[m].max()),
                     "fill": r6(int(nc[m].sum()) / 8192)})
    return pd.DataFrame(rows)


@audit("q_partition_backfill")
def partition_backfill():
    o = table("orders")
    cents = half_up(o.o_totalprice.values.astype(float), 100)
    rows = []
    for st in sorted(set(o.o_orderstatus)):
        m = (o.o_orderstatus == st).values
        mult = 2 if st == "F" else 1
        rows.append({"o_orderstatus": st, "n": int(m.sum()),
                     "total": rn(int(cents[m].sum()) * mult / 100.0, 2)})
    return pd.DataFrame(rows)


@audit("q_shuffle_epoch")
def shuffle_epoch():
    d = table("documents")
    rows = []
    for did in d.doc_id.astype(int):
        h = md5h60(f"e1|{did}")
        rows.append((h % 8, h, did))
    rows.sort()
    out = []
    pos = {}
    for shard, h, did in rows:
        pos[shard] = pos.get(shard, 0) + 1
        out.append({"doc_id": did, "shard": np.int32(shard),
                    "pos": np.int32(pos[shard])})
    out.sort(key=lambda r: (int(r["shard"]), int(r["pos"])))
    return pd.DataFrame(out)


@audit("q_merge_partials")
def merge_partials():
    li = table("lineitem")
    qc = half_up(li.l_quantity.values.astype(float), 100)
    rows = []
    for fl, g in pd.DataFrame({"f": li.l_returnflag.values,
                               "q": qc}).groupby("f", sort=True):
        s = int(g.q.sum())
        rows.append({"l_returnflag": fl, "n": len(g),
                     "sum_qty": s / 100.0,
                     "min_qty": int(g.q.min()) / 100.0,
                     "max_qty": int(g.q.max()) / 100.0,
                     "avg_qty": r6(s / 100.0 / len(g))})
    return pd.DataFrame(rows)


def _lloyd2_cells(train_pred):
    """2-round Lloyd codebook (the persisted-IVF protocol): seed = first
    8 TRAINING vectors by id, fixed-point means over training members,
    final assignment over ALL vectors. Returns (ids, emb, nrm, cells)."""
    e = table("embeddings").sort_values("vec_id")
    ids = e.vec_id.values.astype(int)
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    nrm = np.sqrt((emb * emb).sum(axis=1))
    tr = np.array([train_pred(i) for i in ids])
    tidx = np.where(tr)[0]
    s = (np.floor(emb * 1048576.0 + 0.5) + 1048576.0).astype(np.int64)
    cents = [emb[tidx[c]].copy() for c in range(8)]
    def assign(cv, idxs):
        cn = [math.sqrt(float(c @ c)) for c in cv]
        return {int(i): min(range(8),
                            key=lambda c: (-(emb[i] @ cv[c])
                                           / (nrm[i] * cn[c]), c))
                for i in idxs}
    for _ in range(2):
        a = assign(cents, tidx)
        for c in range(8):
            mem = [i for i, cc in a.items() if cc == c]
            if mem:
                cm = s[mem].sum(axis=0) // len(mem) - 1048576
                cents[c] = np.float32(cm / 1048576.0).astype(np.float64)
    cells = assign(cents, range(len(ids)))
    return ids, emb, nrm, cells


def _ivf_persisted_frame(train_pred):
    ids, emb, nrm, cells = _lloyd2_cells(train_pred)
    by_cell = {}
    for i, c in cells.items():
        by_cell.setdefault(c, []).append(i)
    rows = []
    for qi in np.where(ids < 10)[0]:
        cand = sorted(((-r6(float(emb[qi] @ emb[j]) / (nrm[qi] * nrm[j])),
                        int(ids[j]))
                       for j in by_cell[cells[int(qi)]] if j != qi))[:5]
        for negc, nid in cand:
            rows.append({"q_id": int(ids[qi]), "n_id": nid,
                         "cos": -negc})
    rows.sort(key=lambda r: (r["q_id"], r["n_id"]))
    return pd.DataFrame(rows)


@audit("knn_cosine_ivf_persisted")
def knn_ivf_persisted():
    # full-corpus-trained persisted index
    return _ivf_persisted_frame(lambda i: True)


@audit("knn_cosine_ivf_persisted_compacted")
def knn_ivf_persisted_compacted():
    # base-trained (id%10 < 8) codebook; appended vectors assigned into
    # the existing cells — compaction must not change results
    return _ivf_persisted_frame(lambda i: i % 10 < 8)


@audit("knn_cosine_ivf_persisted_incremental")
def knn_ivf_persisted_incremental():
    return _ivf_persisted_frame(lambda i: i % 10 < 8)


@audit("q_csv_roundtrip")
def csv_roundtrip():
    li = table("lineitem")
    q = li.l_quantity.values.astype(float).astype(np.int64)
    cents = half_up(li.l_extendedprice.values.astype(float), 100)
    rows = []
    for fl in sorted(set(li.l_returnflag)):
        m = (li.l_returnflag == fl).values
        rows.append({"l_returnflag": fl, "n": int(m.sum()),
                     "sum_qty": int(q[m].sum()),
                     "sum_price": int(cents[m].sum()) / 100.0,
                     "sum_key": int(li.l_orderkey.values[m].sum())})
    return pd.DataFrame(rows)


for _nm in ("q_jsonl_roundtrip", "q_xml_roundtrip", "q_ipc_roundtrip",
            "q_orc_roundtrip"):
    # identical aggregation through a different storage format — the
    # round-trip property IS the audit
    AUDITS[_nm] = AUDITS["q_csv_roundtrip"]


@audit("stream_dedup")
def stream_dedup():
    import hashlib
    digs = sorted({hashlib.md5((t or "").encode()).hexdigest()
                   for t in table("documents").text})
    return pd.DataFrame({"digest": digs})


@audit("stream_dedup_rocksdb")
def stream_dedup_rocksdb():
    # identical distinct-digest contract through the RocksDB state
    # backend — the backend must be invisible in the result, so the same
    # independent recomputation audits it
    import hashlib
    digs = sorted({hashlib.md5((t or "").encode()).hexdigest()
                   for t in table("documents").text})
    return pd.DataFrame({"digest": digs})


@audit("stream_url_dedup")
def stream_url_dedup():
    return pd.DataFrame({"curl": sorted(set(url_canonicalize().curl))})


@audit("stream_cdc_upsert")
def stream_cdc_upsert():
    o = table("orders")
    o = o[o.o_orderkey < 4000]
    cents = half_up(o.o_totalprice.values.astype(float), 100)
    rows = {}
    for k, p, st in zip(o.o_orderkey.astype(int), cents,
                        o.o_orderstatus):
        p = int(p)
        ops = []
        if k % 3 != 0:
            ops.append(("I", p))
        if k % 4 == 1:
            ops.append(("U", p * 2))
        if k % 4 == 2:
            ops.append(("D", p))
        if k % 5 == 3:
            ops.append(("U", p + 1000))
        if not ops:
            rows[k] = (st, p)  # untouched key: original row survives
            continue
        op, pv = ops[-1]
        if op != "D":
            rows[k] = (st, pv)
    return pd.DataFrame([{"k": k, "status": v[0], "price": v[1] / 100.0}
                         for k, v in sorted(rows.items())])


def _interval_view_click(outer):
    e = table("events")
    e = e[e.user_id < 30]
    ets = e.ts.values
    v = e[e.event_type.values == "view"]
    c = e[e.event_type.values == "click"]
    rows = []
    for uid, vid, vt in zip(v.user_id.values, v.event_id.values,
                            v.ts.values):
        m = (c.user_id.values == uid) & (c.ts.values >= vt) \
            & (c.ts.values <= vt + np.timedelta64(1, "h"))
        hit = False
        for cid, ct in sorted(zip(c.event_id.values[m], c.ts.values[m])):
            rows.append({"user_id": uid, "view_id": int(vid),
                         "click_id": int(cid), "view_ts": vt,
                         "click_ts": ct})
            hit = True
        if outer and not hit:
            rows.append({"user_id": uid, "view_id": int(vid),
                         "click_id": None, "view_ts": vt,
                         "click_ts": None})
    rows.sort(key=lambda r: (r["user_id"], r["view_id"],
                             (r["click_id"] is not None,
                              r["click_id"] or 0)))
    df = pd.DataFrame(rows)
    if outer and df.click_id.isna().any():
        df["click_id"] = df["click_id"].astype("float64")
    return df


@audit("stream_interval_join")
def stream_interval_join():
    return _interval_view_click(outer=False)


@audit("stream_interval_left_outer")
def stream_interval_left_outer():
    return _interval_view_click(outer=True)


@audit("stream_embedding_dedup")
def stream_embedding_dedup():
    # sign-LSH bucket census: planes parsed from the query contract
    # (seeded construction), buckets = Σ (dot >= 0) · 2^b.
    import re
    import json as _json
    import os as _os
    from stat_audit import OUT_DIR
    with open(_os.path.join(OUT_DIR, "oracle_sql.json")) as f:
        s = _json.load(f)["stream_embedding_dedup"]
    planes = []
    for a in re.findall(r"\[(-?\d[^\]\[]*?)\]", s):
        v = [float(x) for x in a.split(",")]
        if len(v) == 64:
            p = np.array(v)
            if not any(np.array_equal(p, u) for u in planes):
                planes.append(p)
    e = table("embeddings")
    emb = np.stack([np.asarray(v, dtype=np.float64) for v in e.embedding])
    b = np.zeros(len(emb), dtype=np.int64)
    for i, p in enumerate(planes):
        b += ((emb @ p) >= 0).astype(np.int64) << i
    return pd.DataFrame({"bucket": sorted(set(int(x) for x in b))})


@audit("q_pivot")
def q_pivot():
    e = table("events")
    d = pd.Series(e.ts.values).dt.floor("D")
    g = pd.DataFrame({"d": d, "et": e.event_type.values}) \
        .groupby(["d", "et"]).size().unstack(fill_value=0)
    rows = []
    for dd in sorted(g.index):
        r = {"d": dd}
        for et in ("click", "error", "purchase", "signup", "view"):
            r[et] = int(g.loc[dd].get(et, 0))
        rows.append(r)
    return pd.DataFrame(rows)


@audit("q_unpivot")
def q_unpivot():
    p = table("part").sort_values("p_partkey")
    rows = []
    for _, r in p.iterrows():
        rows.append({"p_partkey": int(r.p_partkey),
                     "attr": "retailprice",
                     "val": float(r.p_retailprice)})
        rows.append({"p_partkey": int(r.p_partkey), "attr": "size",
                     "val": float(r.p_size)})
    return pd.DataFrame(rows)


@audit("text_bpe_encode")
def text_bpe_encode():
    # BPE encode (Sennrich et al. 2016): 6 greedy merge rounds trained
    # on the word-frequency table (pair ties -> lexicographically
    # smallest), merges applied by a left fold (merge when the previous
    # unit is `a` and the current is `b`); docs < 50 encoded.
    from collections import Counter
    toks = _tokens_per_doc()
    wf = Counter(t for ts in toks.values() for t in ts)
    seg = {w: list(w) for w in wf if len(w) >= 2}
    def fold(units, a, b):
        out = []
        for x in units:
            if out and out[-1] == a and x == b:
                out[-1] = out[-1] + x
            else:
                out.append(x)
        return out
    for _ in range(6):
        pc = Counter()
        for w, u in seg.items():
            f = wf[w]
            for i in range(len(u) - 1):
                pc[(u[i], u[i + 1])] += f
        if not pc:
            break
        (a, b), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        seg = {w: fold(u, a, b) for w, u in seg.items()}
    rows = []
    for did in sorted(toks):
        if did >= 50:
            continue
        units = []
        for w in toks[did]:
            units += seg.get(w, [w])
        rows.append({"doc_id": did, "n_units": np.int32(len(units)),
                     "encoded": " ".join(units)})
    return pd.DataFrame(rows)


@audit("q_fuzzy_join")
def fuzzy_join():
    # ground truth for the deletion-neighborhood pipeline: brute-force
    # banded Levenshtein <= 2 within (last-token, brand) blocks — the
    # declarative form of the candidates-then-verify plan.
    p = table("part")
    import re
    rows = []
    blocks = {}
    for k, nm, br in zip(p.p_partkey.astype(int), p.p_name, p.p_brand):
        blk = re.split(r"\s+", nm.strip())[-1]
        blocks.setdefault((blk, br), []).append((k, nm))
    out = []
    for mem in blocks.values():
        mem.sort()
        for i in range(len(mem)):
            for j in range(i + 1, len(mem)):
                a, an = mem[i]
                b, bn = mem[j]
                if abs(len(an) - len(bn)) > 2:
                    continue
                d = _lev(an, bn)
                if d <= 2:
                    out.append({"a_id": a, "b_id": b, "a_name": an,
                                "b_name": bn, "dist": np.int32(d)})
    out.sort(key=lambda r: (r["a_id"], r["b_id"]))
    return pd.DataFrame(out)


def _flf_line(ok, ln, rf, ls, qty, cents, disc):
    b = "true" if rf == "R" else "false"
    bf = "0" * ((8 - len(b)) // 2) + b
    return (str(ok).rjust(12, "0") + str(ln).rjust(4, " ")
            + rf.ljust(2, "_") + ls.ljust(2, "_")
            + str(qty).rjust(6, " ")
            + f"{cents / 100:.2f}".rjust(14, " ")
            + f"{disc / 100:.2f}".ljust(6, "*")
            + bf.ljust(8, "0"))


def _flf_rows():
    li = table("lineitem")
    cents = half_up(li.l_extendedprice.values.astype(float), 100)
    disc = half_up(li.l_discount.values.astype(float), 100)
    qty = li.l_quantity.values.astype(float).astype(np.int64)
    return [(int(ok), int(ln), rf, ls, int(q), int(c), int(d))
            for ok, ln, rf, ls, q, c, d in zip(
                li.l_orderkey, li.l_linenumber, li.l_returnflag,
                li.l_linestatus, qty, cents, disc)]


@audit("flf_format", orderless=True)
def flf_format():
    # (l_orderkey, l_linenumber) is not unique in the synthetic lineitem,
    # so the engine's presentation sort leaves tie order unpinned and a
    # row-POSITIONAL compare cannot hold; the orderless multiset compare
    # (sort both frames by all three discrete columns — the line string
    # breaks the ties) pins the result exactly. The line-building rules
    # are additionally exercised by flf_parse / flf_roundtrip /
    # flf_quarantine, which replay the same _flf_line builder.
    rows = [{"l_orderkey": int(ok), "l_linenumber": np.int32(ln),
             "line": _flf_line(ok, ln, rf, ls, q, c, d)}
            for ok, ln, rf, ls, q, c, d in _flf_rows()]
    return pd.DataFrame(rows)


@audit("flf_parse")
def flf_parse():
    # parse(format(row)) replayed through the 21-pad-symbol slicing
    # rules: leading-zero-trimmed BIGINT (all-zero field -> NULL under
    # try-cast), trailing-pad trims, strict bool domain.
    rows = []
    for ok, ln, rf, ls, q, c, d in _flf_rows():
        rows.append({
            "l_orderkey": None if ok == 0 else ok,
            "l_linenumber": np.int32(ln), "l_returnflag": rf,
            "l_linestatus": ls, "l_quantity": np.int32(q),
            "l_extendedprice": c / 100.0, "l_discount": d / 100.0,
            "l_returned": rf == "R"})
    rows.sort(key=lambda r: (r["l_orderkey"] is not None,
                             r["l_orderkey"] or 0, r["l_linenumber"]))
    df = pd.DataFrame(rows)
    df["l_orderkey"] = df["l_orderkey"].astype("float64")
    return df


AUDITS["stream_flf_ingest"] = AUDITS["flf_parse"]
# the streaming IVF ingest replays the base-trained persisted index
AUDITS["stream_ivf_ingest"] = AUDITS["knn_cosine_ivf_persisted_compacted"]


@audit("flf_roundtrip")
def flf_roundtrip():
    # format -> parse -> aggregate: the round-trip preserves every value
    # except orderkey 0 (all-zero field nulls under leading-zero trim).
    n_total = 0
    n_match = 0
    for ok, ln, rf, ls, q, c, d in _flf_rows():
        n_total += 1
        # leading-zero trim nulls the all-zero orderkey field, so those
        # rows fail the identity check; everything else round-trips
        if ok != 0:
            n_match += 1
    return pd.DataFrame([{"n_total": n_total, "n_match": n_match}])


@audit("flf_quarantine")
def flf_quarantine():
    # every 97th source key gets 6 bytes of the quantity field smashed:
    # the strict-parse policy must quarantine EXACTLY those lines.
    from collections import defaultdict
    agg = defaultdict(lambda: [0, 0])
    for ok, ln, rf, ls, q, c, d in _flf_rows():
        corrupted = ok % 97 == 0
        # corruption overwrites cols 21-26 (quantity) with 'XXXXXX';
        # orderkey nulls too when ok == 0 (all-zero trim)
        quarantined = corrupted or ok == 0
        a = agg[(quarantined, rf)]
        a[0] += 1
        if not quarantined:
            a[1] += q
    rows = []
    for (qr, rf), a in sorted(agg.items()):
        rows.append({"quarantined": qr, "l_returnflag": rf, "n": a[0],
                     "sum_qty": a[1] if not qr else None})
    df = pd.DataFrame(rows)
    return df


@audit("mock_generate")
def mock_generate():
    # generator invariants: 1000 rows, every column inside its declared
    # domain, zero nulls — the contract the seeded mocker promises.
    return pd.DataFrame([{"n_rows": 1000, "n_id_in_range": 1000,
                          "n_name_in_list": 1000,
                          "n_score_in_range": 1000,
                          "n_active_set": 1000, "n_nulls": 0}])


@audit("flf_cast_policy")
def flf_cast_policy():
    # cast-policy divergence fixture: strict bool domain ('true'/'false'
    # only — 'TRUE' nulls), leading-zero-trimmed try-cast int with a
    # garbage branch for linenumber > 4.
    li = table("lineitem")
    n_bool_null = n_true = n_int_null = sum_i = 0
    for rf, ln in zip(li.l_returnflag, li.l_linenumber.astype(int)):
        raw = {"R": "true", "A": "false"}.get(rf, "TRUE")
        b = True if raw == "true" else False if raw == "false" else None
        if b is None:
            n_bool_null += 1
        elif b:
            n_true += 1
        if ln > 4:
            n_int_null += 1
        else:
            sum_i += ln
    return pd.DataFrame([{"n_bool_null": n_bool_null, "n_true": n_true,
                          "n_int_null": n_int_null, "sum_i": sum_i}])


@audit("flf_evolve")
def flf_evolve():
    # schema-evolution read: the returnflag column exists only for odd
    # orderkeys (the "new schema" files); NULL group aggregates first.
    li = table("lineitem")
    q = li.l_quantity.values.astype(float).astype(np.int64)
    ok = li.l_orderkey.values.astype(int)
    rf = np.where(ok % 2 == 1, li.l_returnflag.values, None)
    agg = {}
    for f, qq in zip(rf, q):
        a = agg.setdefault(f, [0, 0])
        a[0] += 1
        a[1] += int(qq)
    rows = [{"l_returnflag": f, "n": a[0], "sum_qty": a[1]}
            for f, a in agg.items()]
    rows.sort(key=lambda r: (r["l_returnflag"] is not None,
                             r["l_returnflag"] or ""))
    return pd.DataFrame(rows)


@audit("stream_flf_quarantine")
def stream_flf_quarantine():
    # the streaming quarantine replay: same corruption rule as
    # flf_quarantine, counts only (no sums in the streaming panel).
    from collections import defaultdict
    agg = defaultdict(int)
    for ok, ln, rf, ls, q, c, d in _flf_rows():
        quarantined = ok % 97 == 0 or ok == 0
        agg[(quarantined, rf)] += 1
    return pd.DataFrame([{"quarantined": qr, "l_returnflag": rf, "n": n}
                         for (qr, rf), n in sorted(agg.items())])


# --- multimodal plumbing (deterministic generators replayed) -----------------

@audit("multimodal_decode_real")
def multimodal_decode_real():
    # PNG decode check: the pixel generator is a pure integer hash of
    # (id, x, y); per-channel means at half-up 1e6 fixed point.
    d = table("documents")
    rows = []
    for did in sorted(d.doc_id.astype(int)):
        if did >= 50:
            continue
        w, h = 8 + did % 9, 8 + did % 7
        sr = sg = sb = 0
        for x in range(w):
            for y in range(h):
                v = (did * 1315423911 + x * 2654435761 + y * 40503) \
                    & 16777215
                sr += (v >> 16) & 255
                sg += (v >> 8) & 255
                sb += v & 255
        n = w * h
        rows.append({"id": did, "width": np.int32(w),
                     "height": np.int32(h),
                     "mean_r": math.floor(sr / n * 1e6 + 0.5) / 1e6,
                     "mean_g": math.floor(sg / n * 1e6 + 0.5) / 1e6,
                     "mean_b": math.floor(sb / n * 1e6 + 0.5) / 1e6})
    return pd.DataFrame(rows)


@audit("multimodal_features")
def multimodal_features():
    # byte-stride feature extraction: 16 FLOAT32 accumulators over the
    # utf-8 bytes (stride-16 column sums of byte/255), checksum at 4dp.
    d = table("documents")
    rows = []
    for did, text in sorted(zip(d.doc_id.astype(int), d.text)):
        bs = (text or "").encode("utf-8")
        feats = []
        for j in range(16):
            acc = np.float32(0)
            if j < len(bs):
                for m in range((len(bs) - j + 15) // 16):
                    acc = np.float32(acc + np.float32(
                        np.float32(bs[j + 16 * m]) / np.float32(255)))
            feats.append(float(acc))
        rows.append({"id": did, "n_dims": 16,
                     "checksum": rn(sum(feats), 4)})
    return pd.DataFrame(rows)


@audit("multimodal_resize")
def multimodal_resize():
    d = table("documents")
    rows = []
    for did, text in sorted(zip(d.doc_id.astype(int), d.text)):
        L = len((text or "").encode("utf-8"))
        n = max(1, L // max(1, L // max(1, min(L, 64))))
        rows.append({"id": did, "n_bytes": n, "w": np.int32(64),
                     "h": np.int32(64)})
    return pd.DataFrame(rows)


@audit("multimodal_frame_sample")
def multimodal_frame_sample():
    d = table("documents")
    rows = []
    for did, text in sorted(zip(d.doc_id.astype(int), d.text)):
        if did >= 100:
            continue
        dur = len(text or "") * 10
        step = max(dur // 4, 1)
        for i in range(dur // step + 1):
            rows.append({"doc_id": did, "sample_idx": i,
                         "sample_ms": i * step, "duration_ms": dur})
    return pd.DataFrame(rows)


@audit("multimodal_phash_dedup")
def multimodal_phash_dedup():
    d = table("documents")
    ids = sorted(i for i in d.doc_id.astype(int) if i < 500)
    fam = {}
    for i in ids:
        fam.setdefault(i % 40, []).append(i)
    rows = [{"keep_id": min(v), "n_dups": len(v) - 1}
            for v in fam.values() if len(v) > 1]
    rows.sort(key=lambda r: r["keep_id"])
    return pd.DataFrame(rows)


def _pcm(seed, n, total):
    return [(((seed * 1315423911 + i * 2654435761) & 65535) - 32768)
            for i in range(min(n, total))]


@audit("multimodal_audio_real")
def multimodal_audio_real():
    d = table("documents")
    rows = []
    for did in sorted(d.doc_id.astype(int)):
        if did >= 50:
            continue
        n = 400 + did % 100
        v = _pcm(did, n, 500)
        rows.append({"id": did, "sample_rate": np.int32(8000),
                     "n_samples": np.int32(n),
                     "duration_ms": n * 1000 // 8000,
                     "peak": np.int32(max(abs(x) for x in v)),
                     "rms": math.floor(math.sqrt(
                         sum(x * x for x in v) / n) * 1e6 + 0.5) / 1e6})
    return pd.DataFrame(rows)


def _audio_blocks():
    d = table("documents")
    out = {}
    for did in sorted(d.doc_id.astype(int)):
        if did >= 50:
            continue
        n = 400 + did % 20
        v = _pcm(did % 20, n, 420)
        blocks = {}
        for i, x in enumerate(v):
            blocks[i // 128] = blocks.get(i // 128, 0) + x * x
        out[did] = blocks
    return out


@audit("multimodal_audio_fingerprint")
def multimodal_audio_fingerprint():
    blocks = _audio_blocks()
    sigs = {did: ",".join(str(b[k]) for k in sorted(b))
            for did, b in blocks.items()}
    fam = {}
    for did, s in sigs.items():
        fam.setdefault(s, did)  # min id = first in sorted order
    rows = []
    for did in sorted(blocks):
        f = fam[sigs[did]]
        rows.append({"id": did, "n_blocks": np.int32(len(blocks[did])),
                     "total_energy": sum(blocks[did].values()),
                     "family": f, "is_dup": did != f})
    return pd.DataFrame(rows)


@audit("multimodal_audio_segments")
def multimodal_audio_segments():
    # energy-threshold VAD islands over 128-sample blocks.
    blocks = _audio_blocks()
    rows = []
    for did in sorted(blocks):
        act = [b for b in sorted(blocks[did])
               if blocks[did][b] >= 45400000000]
        seg = -1
        i = 0
        while i < len(act):
            j = i
            while j + 1 < len(act) and act[j + 1] == act[j] + 1:
                j += 1
            seg += 1
            rows.append({"id": did, "seg": np.int32(seg),
                         "start_block": np.int32(act[i]),
                         "end_block": np.int32(act[j]),
                         "n_blocks": np.int32(j - i + 1),
                         "energy": sum(blocks[did][b]
                                       for b in act[i:j + 1])})
            i = j + 1
    return pd.DataFrame(rows)


# --- round-14 additions: TPC-H shape completions + the kNN-graph
# --- dispatcher (VERDICT r13 §1/§3)

def _region_suppliers(region_name):
    """supplier rows whose nation sits in the named region."""
    s = table("supplier")
    n = table("nation")
    r = table("region")
    rk = set(r[r.r_name == region_name].r_regionkey.astype(int))
    nsel = n[n.n_regionkey.astype(int).isin(rk)]
    nname = dict(zip(nsel.n_nationkey.astype(int), nsel.n_name))
    sel = s[s.s_nationkey.astype(int).isin(nname)]
    return sel, {int(k): nname[int(nk)] for k, nk in
                 zip(sel.s_suppkey, sel.s_nationkey)}


@audit("q2_min_cost_supplier")
def q2_min_cost_supplier():
    # TPC-H q2 shape: regional per-part minimum supply cost, supply
    # derived as MIN(extendedprice) cents per observed (part, supplier)
    # lineitem pair; exact integer cents throughout.
    li = table("lineitem")
    cents = half_up(li.l_extendedprice.values.astype(float), 100)
    asia, nname = _region_suppliers("ASIA")
    abal = dict(zip(asia.s_suppkey.astype(int),
                    asia.s_acctbal.astype(float)))
    sname = dict(zip(asia.s_suppkey.astype(int), asia.s_name))
    p = table("part")
    psel = p[p.p_size.astype(int) == 15]
    ptype = dict(zip(psel.p_partkey.astype(int), psel.p_type))
    cost = {}
    for pk, sk, c in zip(li.l_partkey.values, li.l_suppkey.values, cents):
        pk, sk = int(pk), int(sk)
        if pk in ptype and sk in sname:
            key = (pk, sk)
            cost[key] = min(cost.get(key, int(c)), int(c))
    best = {}
    for (pk, _), c in cost.items():
        best[pk] = min(best.get(pk, c), c)
    rows = [{"s_acctbal": abal[sk], "s_name": sname[sk], "n_name": nname[sk],
             "p_partkey": pk, "p_type": ptype[pk], "cost": c / 100.0}
            for (pk, sk), c in cost.items() if c == best[pk]]
    rows.sort(key=lambda r: (-r["s_acctbal"], r["n_name"], r["s_name"],
                             r["p_partkey"]))
    return pd.DataFrame(rows[:100])


@audit("q11_important_stock")
def q11_important_stock():
    # TPC-H q11 shape: per-part regional revenue vs a global scalar
    # threshold, in exact integer cents (val * 2000 > tot).
    li = table("lineitem")
    cents = half_up(li.l_extendedprice.values.astype(float), 100)
    euro, _ = _region_suppliers("EUROPE")
    esk = set(euro.s_suppkey.astype(int))
    val = {}
    for pk, sk, c in zip(li.l_partkey.values, li.l_suppkey.values, cents):
        if int(sk) in esk:
            val[int(pk)] = val.get(int(pk), 0) + int(c)
    tot = sum(val.values())
    rows = [{"p_partkey": pk, "value": v / 100.0}
            for pk, v in val.items() if v * 2000 > tot]
    rows.sort(key=lambda r: (-r["value"], r["p_partkey"]))
    return pd.DataFrame(rows)


@audit("q16_supplier_cnt")
def q16_supplier_cnt():
    # TPC-H q16 shape: distinct suppliers per part attribute triple with
    # a NOT IN exclusion (low-balance suppliers).
    li = table("lineitem")
    p = table("part")
    s = table("supplier")
    bad = set(s[s.s_acctbal.astype(float) < 500].s_suppkey.astype(int))
    sizes = {1, 4, 9, 14, 19, 23, 36, 49}
    psel = p[(p.p_brand != "Brand#45") & (p.p_type != "PROMO")
             & p.p_size.astype(int).isin(sizes)]
    pattr = {int(k): (b, t, int(z)) for k, b, t, z in
             zip(psel.p_partkey, psel.p_brand, psel.p_type, psel.p_size)}
    found = {}
    for pk, sk in zip(li.l_partkey.values, li.l_suppkey.values):
        pk, sk = int(pk), int(sk)
        if pk in pattr and sk not in bad:
            found.setdefault(pattr[pk], set()).add(sk)
    rows = [{"p_brand": b, "p_type": t, "p_size": z,
             "supplier_cnt": len(ss)}
            for (b, t, z), ss in found.items()]
    rows.sort(key=lambda r: (-r["supplier_cnt"], r["p_brand"], r["p_type"],
                             r["p_size"]))
    return pd.DataFrame(rows)


@audit("q21_waiting_supplier")
def q21_waiting_supplier():
    # TPC-H q21 shape (EXISTS + NOT EXISTS self-join): finished orders
    # where the supplier returned a line, some other supplier supplied
    # the order, and no other supplier's line was returned.
    li = table("lineitem")
    o = table("orders")
    fin = set(o[o.o_orderstatus == "F"].o_orderkey.astype(int))
    asia, _ = _region_suppliers("ASIA")
    sname = dict(zip(asia.s_suppkey.astype(int), asia.s_name))
    supps, rsupps = {}, {}
    for ok, sk, rf in zip(li.l_orderkey.values, li.l_suppkey.values,
                          li.l_returnflag.values):
        ok, sk = int(ok), int(sk)
        supps.setdefault(ok, set()).add(sk)
        if rf == "R":
            rsupps.setdefault(ok, set()).add(sk)
    cnt = {}
    for ok, sk, rf in zip(li.l_orderkey.values, li.l_suppkey.values,
                          li.l_returnflag.values):
        ok, sk = int(ok), int(sk)
        if (rf == "R" and ok in fin and sk in sname
                and len(supps[ok]) >= 2 and rsupps[ok] == {sk}):
            cnt[sname[sk]] = cnt.get(sname[sk], 0) + 1
    rows = [{"s_name": k, "numwait": v} for k, v in cnt.items()]
    rows.sort(key=lambda r: (-r["numwait"], r["s_name"]))
    return pd.DataFrame(rows[:100])


@audit("q_knn_graph_auto_dispatch")
def q_knn_graph_auto_dispatch():
    # kNN-graph dispatcher contract: regime from the stored cell
    # histogram (exact while the hottest cell <= 4096), edge count = the
    # symmetrized within-cell top-3 graph (nProbe=1 base).
    ids, emb, nrm, cells, _ = _semantic_cells(lambda _: True,
                                              with_centroids=True)
    by_cell = {}
    for i, cid in cells.items():
        by_cell.setdefault(cid, []).append(i)
    max_cell = max(len(v) for v in by_cell.values())
    regime = "exact" if max_cell <= 4096 else "capped"
    # This audit replays only the EXACT branch's edge count; the capped
    # branch (md5-salted sub-buckets) has no corpus small enough to
    # validate a numpy replication against, so rather than silently
    # reporting exact edges under a capped regime (a guaranteed false
    # FAIL against the engine), fail loudly with the gap named.
    if regime == "capped":
        raise NotImplementedError(
            "q_knn_graph_auto_dispatch audit replays only the exact "
            f"branch; corpus routed capped (max_cell={max_cell} > 4096) "
            "— extend the audit with the sub-bucket edge count first")
    edges = set()
    for qi in range(len(ids)):
        cand = [(r6(float(emb[qi] @ emb[j]) / (nrm[qi] * nrm[j])),
                 int(ids[j]))
                for j in by_cell[cells[qi]] if j != qi]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for _, nid in cand[:3]:
            edges.add((int(ids[qi]), nid))
            edges.add((nid, int(ids[qi])))
    return pd.DataFrame([{"regime": regime, "n_vecs": len(ids),
                          "max_cell": max_cell, "n_edges": len(edges)}])


# --- round 15 -------------------------------------------------------------

@audit("q11_important_stock_scaled")
def q11_important_stock_scaled():
    # SF-normalized q11: official TPC-H divides the HAVING fraction by
    # SF, derived here from the supplier row count (SF x 10,000), so the
    # exact integer predicate is val * ns * 10 > tot (f0 = 0.00001).
    li = table("lineitem")
    cents = half_up(li.l_extendedprice.values.astype(float), 100)
    euro, _ = _region_suppliers("EUROPE")
    esk = set(euro.s_suppkey.astype(int))
    ns = len(table("supplier"))
    val = {}
    for pk, sk, c in zip(li.l_partkey.values, li.l_suppkey.values, cents):
        if int(sk) in esk:
            val[int(pk)] = val.get(int(pk), 0) + int(c)
    tot = sum(val.values())
    rows = [{"p_partkey": pk, "value": v / 100.0}
            for pk, v in val.items() if v * ns * 10 > tot]
    rows.sort(key=lambda r: (-r["value"], r["p_partkey"]))
    return pd.DataFrame(rows)


# RocksDB state-backend twins (r15): identical result contract to their
# default-backend base query — the backend must be invisible in the
# result, so the same independent recomputation audits each twin's own
# Verify output (engine_out reads by registry KEY, so the alias compares
# the twin's parquet against the base's expected frame).
AUDITS["stream_sessionize_rocksdb"] = AUDITS["stream_sessionize"]
AUDITS["stream_interval_join_rocksdb"] = AUDITS["stream_interval_join"]
AUDITS["stream_quantiles_rocksdb"] = AUDITS["stream_quantiles"]
