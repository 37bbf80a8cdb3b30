#!/usr/bin/env python3
"""Generate/check the q84 density-statistics oracle (DensityValidation
pointBiserial / correctVsIncorrect / quartileAnalysis over planted groups,
one variant per v = doc_id % 8).

Everything except the two-proportion-z normal-CDF p-value is mirrored
RELATIONALLY in DuckDB (df=2 Student-t closed form p = 1-|t|/sqrt(2+t^2),
corr(), quantile_cont + digitize counting); this script pins the q_p
constants with python's stdlib erfc (p = erfc(|z|/sqrt(2))) — independent
of commons-math3 — and sanity-checks the planted inputs for degenerate
corr / empty quartiles / rounding hazards.
"""
import math


def variant(v):
    xs = [1.0 + 0.37 * ((i * 2 + v) % 5) + 0.11 * i for i in range(4)]
    accs = [i % 2 for i in range(4)]
    # point-biserial: Pearson r of (acc, x), t = r*sqrt((n-2)/(1-r^2)), df=2
    n = 4
    mx = sum(xs) / n
    ma = sum(accs) / n
    cov = sum((a - ma) * (x - mx) for a, x in zip(accs, xs)) / n
    sa = math.sqrt(sum((a - ma) ** 2 for a in accs) / n)
    sx = math.sqrt(sum((x - mx) ** 2 for x in xs) / n)
    r = cov / (sa * sx)
    t = r * math.sqrt((n - 2) / max(1e-300, 1 - r * r))
    p = 1 - abs(t) / math.sqrt(2 + t * t)  # df=2 closed form, two-sided
    # correct-vs-incorrect Student t over the same 4 rows (2 per group)
    g1 = [xs[i] for i in range(4) if accs[i] == 1]
    g0 = [xs[i] for i in range(4) if accs[i] == 0]
    m1, m0 = sum(g1) / 2, sum(g0) / 2
    v1 = sum((x - m1) ** 2 for x in g1)  # ddof=1 with n=2 -> /1
    v0 = sum((x - m0) ** 2 for x in g0)
    pooled = (v1 + v0) / 2.0
    ct = (m1 - m0) / math.sqrt(pooled * (0.5 + 0.5))
    cp = 1 - abs(ct) / math.sqrt(2 + ct * ct)
    cd = 0.0 if pooled == 0 else (m1 - m0) / math.sqrt(pooled)
    # quartile analysis over 8 planted densities
    d8 = [2.0 + 0.53 * ((i * 3 + v) % 7) + 0.07 * i for i in range(8)]
    a8 = [0] * 8 if v == 7 else [((i + v) % 3) % 2 for i in range(8)]
    srt = sorted(d8)

    def pct(q):
        pos = 7 * q / 100.0
        lo, hi = math.floor(pos), math.ceil(pos)
        return srt[lo] if lo == hi else srt[lo] + (pos - lo) * (srt[hi] - srt[lo])

    edges = [pct(25), pct(50), pct(75)]
    bins = [sum(1 for e in edges if e <= x) for x in d8]
    rows = {}
    for q in range(4):
        idx = [i for i in range(8) if bins[i] == q]
        rows[q] = (len(idx),
                   sum(a8[i] for i in idx) / len(idx) if idx else 0.0)
    n1, p1 = rows[0]
    n4, p4 = rows[3]
    assert n1 > 0 and n4 > 0, f"v={v}: empty quartile"
    if n1 == 0 or n4 == 0:
        delta, z, qp = 0.0, 0.0, 1.0
    else:
        delta = p4 - p1
        ppool = (p1 * n1 + p4 * n4) / (n1 + n4)
        if ppool <= 0.0 or ppool >= 1.0:
            z, qp = 0.0, 1.0
        else:
            se = math.sqrt(ppool * (1 - ppool) * (1.0 / n1 + 1.0 / n4))
            z = delta / se
            qp = math.erfc(abs(z) / math.sqrt(2))
    # hazard: near-tie of any density with an edge (digitize boundary)
    tie = min(abs(x - e) for x in d8 for e in edges)
    assert tie > 1e-9 or tie == 0.0, f"v={v}: edge near-tie {tie}"
    exact_ties = sum(1 for x in d8 for e in edges if x == e)
    return r, t, p, m1, m0, ct, cp, cd, delta, z, qp, n1, n4, exact_ties


qps = []
for v in range(8):
    r, t, p, m1, m0, ct, cp, cd, delta, z, qp, n1, n4, ties = variant(v)
    assert abs(abs(r) - 1) > 1e-6, f"v={v}: degenerate corr"
    print(f"v={v}: r={r:.4f} t={t:.4f} p={p:.5f} | cv t={ct:.4f} p={cp:.5f} "
          f"d={cd:.4f} | delta={delta:.4f} z={z:.4f} qp={qp:.6f} "
          f"n1={n1} n4={n4} edge-ties={ties}")
    qps.append(qp)

print("           CASE CAST(doc_id % 8 AS INT)")
for v, x in enumerate(qps):
    print(f"             WHEN {v} THEN {x!r}")
print("             END AS q_p")
