#!/usr/bin/env python3
"""Generate the q83 bootstrap-CI oracle constants by exec'ing the PUBLISHED
bootstrap_ci function (eval_ablation.py:382-393) verbatim over planted
prediction sets, one per variant v = doc_id % 8.

The Scala side (SparkEntry q83) plants the SAME preds/truth by the same
arithmetic and drives the REAL graft.kg.eval.Significance.ablationBootstrapCi
(whose NumpyRandom replicates numpy RandomState bit-exactly); this script
pins the independent expected (lo, hi) values with numpy itself.
"""
import re

import numpy as np

src = open("/root/reference/eval_ablation.py").read()
m = re.search(r"def bootstrap_ci\(.*?\n(?=\ndef |\n# =)", src, re.S)
assert m, "bootstrap_ci not found"
ns = {"np": np}
exec(m.group(0), ns)  # the published function, verbatim
bootstrap_ci = ns["bootstrap_ci"]


def planted(v):
    tru = [i % 2 for i in range(13)]
    pa = [((i + v) % 3 % 2) ^ (1 if (i + 2 * v) % 4 == 0 else 0)
          for i in range(13)]
    pb = [((i * (i + 1) // 2 + v) % 3) % 2 for i in range(13)]
    return pa, pb, tru


print("variant results (lo, hi):")
sqls = {"lo": [], "hi": []}
for v in range(8):
    pa, pb, tru = planted(v)
    lo, hi = bootstrap_ci(pa, pb, tru)
    print(f"  v={v}: preds_a={pa} preds_b={pb} -> ({lo}, {hi})")
    sqls["lo"].append(lo)
    sqls["hi"].append(hi)

for colname, vals in sqls.items():
    print(f"           CASE CAST(doc_id % 8 AS INT)")
    for v, x in enumerate(vals):
        print(f"             WHEN {v} THEN {x}")
    print(f"             END AS {colname},")
