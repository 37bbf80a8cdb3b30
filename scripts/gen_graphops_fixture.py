#!/usr/bin/env python3
"""Generate the GraphOps parity fixture: per-argument Toulmin structures and
per-holding support, computed over a diverse sample of the reference's
published graphs by replicating its graph methods verbatim at the dict level
(get_toulmin_structure schema_v2_1.py:781-806, get_holding_support :807-836 —
FactNode/ConceptNode/PrecedentNode checks become node-list membership).
ReferenceParitySpec asserts graft.kg.query.GraphOps reproduces these."""
import json, glob, sys

files = sorted(glob.glob('/root/reference/iltur_graphs/*.json'))
stride = int(sys.argv[1]) if len(sys.argv) > 1 else 150
sample = files[::stride]

out = []
for f in sample:
    try:
        g = json.load(open(f))
    except Exception:
        continue
    if '_meta' not in g:
        continue
    typemap = {}
    for ln, t in [("facts", "fact"), ("concepts", "concept"), ("issues", "issue"),
                  ("arguments", "argument"), ("holdings", "holding"),
                  ("precedents", "precedent")]:
        for n in g.get(ln) or []:
            typemap[n["id"]] = t
    edges = g.get("edges") or []

    toulmin = []
    for a in g.get("arguments") or []:
        grounds, warrants, backing, rebuttals = [], [], [], []
        for e in edges:
            if e["target"] != a["id"]:
                continue
            if e["relation"] == "supports":
                st = typemap.get(e["source"])
                if st == "fact":
                    grounds.append(e["source"])
                elif st == "concept":
                    warrants.append(e["source"])
                elif st == "precedent":
                    backing.append(e["source"])
            elif e["relation"] in ("attacks", "rebuts", "undercuts"):
                rebuttals.append(e["source"])
        toulmin.append(dict(argument_id=a["id"], grounds=sorted(grounds),
                            warrants=sorted(warrants), backing=sorted(backing),
                            rebuttals=sorted(rebuttals)))

    support = []
    for h in g.get("holdings") or []:
        concepts, facts = [], []
        for e in edges:
            if e["target"] != h["id"]:
                continue
            if e["relation"] == "grounds":
                concepts.append(e["source"])
            elif e["relation"] == "supports" and typemap.get(e["source"]) == "fact":
                facts.append(e["source"])
        js_ids = sorted(j["id"] for j in (g.get("justification_sets") or [])
                        if j.get("target_id") == h["id"])
        support.append(dict(holding_id=h["id"], grounding_concepts=sorted(concepts),
                            supporting_facts=sorted(facts), justification_sets=js_ids))

    out.append(dict(case_id=g.get("case_id"), file=f.split('/')[-1],
                    toulmin=toulmin, holding_support=support))
    print(f"{f.split('/')[-1]}: {len(toulmin)} arguments, {len(support)} holdings")

dst = '/root/repo/src/test/resources/graft/ref_graphops_fixture.json'
json.dump(out, open(dst, 'w'), indent=1)
print(f"wrote {dst}: {len(out)} cases")
