#!/usr/bin/env python3
"""Generate the q80 confidence-sweep oracle constants by running the
PUBLISHED eval_confidence_sweep.py functions (sweep_thresholds,
evaluate_hybrid_strategies, calibration_analysis, compute_auacc, plus the
main-analysis Brier formula replicated verbatim from :417-434 and the
accuracy*sqrt(coverage) score stamp from :505-519) over planted 6-case
prediction sets, one per variant v = doc_id % 8.

The Scala side (SparkEntry q80) builds the SAME case sets by the same
doc_id arithmetic and drives the REAL graft.kg.eval.ConfidenceSweep; this
script pins the independent expected values and prints the DuckDB oracle
SQL to embed.
"""
import importlib.util
import json
import math

spec = importlib.util.spec_from_file_location(
    "ecs", "/root/reference/eval_confidence_sweep.py")
ecs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ecs)


def planted_cases(v):
    out = []
    for i in range(6):
        out.append({
            "case_id": f"c{i}",
            "true_label": (i + v) % 2,
            "graph_pred": (i + v + (1 if i % 3 == 0 else 0)) % 2,
            "graph_conf": 0.515 + 0.07 * ((i * 3 + v) % 7),
            "raw_pred": (i * (i + 1) // 2 + v) % 2,
            "raw_conf": 0.515 + 0.08 * ((i * 5 + v * 3) % 6),
        })
    return out


def brier(cases, method):  # replica of the published :417-434 nested helper
    scores = []
    for c in cases:
        prob_true = (c[f"{method}_conf"] if c[f"{method}_pred"] == c["true_label"]
                     else 1.0 - c[f"{method}_conf"])
        scores.append((1.0 - prob_true) ** 2)
    return round(sum(scores) / len(scores), 4)


COLS = ["cov70", "nacc70", "acc70", "acca70", "accr70", "auacc_g",
        "g_ece", "r_ece", "g_brier", "r_brier",
        "hyb_cov", "hyb_acc", "hyb_score",
        "ens_cov", "ens_acc", "ens_score",
        "cg_acc", "ch_acc", "ch_trusted", "ch_flipped", "ch_fallback"]
INT_COLS = {"nacc70", "ch_trusted", "ch_flipped", "ch_fallback"}

rows = []
for v in range(8):
    cases = planted_cases(v)
    sw = ecs.sweep_thresholds(cases, "graph")
    s70 = next(r for r in sw if abs(r["threshold"] - 0.70) < 1e-9)
    strats = ecs.evaluate_hybrid_strategies(cases)
    for s in strats:  # published score stamp (:505-519)
        s["score"] = (round(s["accuracy"] * math.sqrt(s["coverage"]), 4)
                      if s["coverage"] > 0 else 0)
    hyb = next(s for s in strats if s["strategy"] == "hybrid"
               and abs(s["t_graph"] - 0.75) < 1e-9 and abs(s["t_raw"] - 0.60) < 1e-9)
    ens = next(s for s in strats if s["strategy"] == "ensemble"
               and abs(s["t_min"] - 0.70) < 1e-9)
    cg = next(s for s in strats if s["strategy"] == "contra_graph"
              and abs(s["t_flip"] - 0.80) < 1e-9)
    ch = next(s for s in strats if s["strategy"] == "contra_hybrid"
              and abs(s["t_high"] - 0.80) < 1e-9 and abs(s["t_low"] - 0.65) < 1e-9)
    cal = ecs.calibration_analysis(cases)
    rows.append({
        "v": v,
        "cov70": s70["coverage"], "nacc70": s70["n_accepted"],
        "acc70": s70["accuracy"], "acca70": s70["acc_on_accepted"],
        "accr70": s70["acc_on_rejected"],
        "auacc_g": ecs.compute_auacc(sw),
        "g_ece": cal["graph_ece"], "r_ece": cal["raw_ece"],
        "g_brier": brier(cases, "graph"), "r_brier": brier(cases, "raw"),
        "hyb_cov": hyb["coverage"], "hyb_acc": hyb["accuracy"],
        "hyb_score": hyb["score"],
        "ens_cov": ens["coverage"], "ens_acc": ens["accuracy"],
        "ens_score": ens["score"],
        "cg_acc": cg["accuracy"],
        "ch_acc": ch["accuracy"], "ch_trusted": ch["details"]["graph_trusted"],
        "ch_flipped": ch["details"]["graph_flipped"],
        "ch_fallback": ch["details"]["raw_fallback"],
    })

print(json.dumps(rows, indent=1))

sql = ["SELECT doc_id, CAST(doc_id % 8 AS INT) AS v,"]
for ci, c in enumerate(COLS):
    lines = [f"  CASE CAST(doc_id % 8 AS INT)"]
    for r in rows:
        val = r[c]
        lit = str(int(val)) if c in INT_COLS else repr(float(val))
        lines.append(f"    WHEN {r['v']} THEN {lit}")
    tail = "" if ci == len(COLS) - 1 else ","
    lines.append(f"    END AS {c}{tail}")
    sql.append("\n".join(lines))
sql.append("FROM documents ORDER BY doc_id")
print("\n-- ORACLE SQL --")
print("\n".join(sql))
