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

    # trace_reasoning_path (schema_v2_1.py:890-910): BFS shortest path over
    # edge-list-order adjacency; probe pairs = per chain (first fact -> its
    # holding) and (holding -> outcome)
    from collections import deque
    adj = {}
    for e in edges:
        adj.setdefault(e["source"], []).append(e["target"])
    def trace(start, end):
        queue = deque([(start, [start])])
        visited = {start}
        while queue:
            node, path = queue.popleft()
            if node == end:
                return path
            for nb in adj.get(node, []):
                if nb not in visited:
                    visited.add(nb)
                    queue.append((nb, path + [nb]))
        return []
    paths = []
    outcome_id = (g.get("outcome") or {}).get("id")
    for c in g.get("reasoning_chains") or []:
        if c.get("fact_ids"):
            paths.append(dict(start=c["fact_ids"][0], end=c["holding_id"],
                              path=trace(c["fact_ids"][0], c["holding_id"])))
        if outcome_id:
            paths.append(dict(start=c["holding_id"], end=outcome_id,
                              path=trace(c["holding_id"], outcome_id)))

    # counterfactual_remove_concept (schema_v2_1.py:836-886), verbatim at the
    # dict level, probed for the first 5 concepts that ground or join a JS
    js_list = g.get("justification_sets") or []
    members_of = {j["id"]: [e["source"] for e in edges
                            if j["id"] in (e.get("support_group_ids") or [])]
                  for j in js_list}
    def remove_concept(cid):
        affected, unaffected = [], []
        for h in g.get("holdings") or []:
            sup_concepts = [e["source"] for e in edges
                            if e["target"] == h["id"] and e["relation"] == "grounds"]
            hjs = [j for j in js_list if j.get("target_id") == h["id"]]
            if not hjs:
                if cid in sup_concepts:
                    affected.append(h["id"])
                else:
                    unaffected.append(h["id"])
                continue
            surviving = []
            for j in hjs:
                mem = members_of[j["id"]]
                if cid in mem:
                    if j["logic"] == "and":
                        pass
                    elif [m for m in mem if m != cid]:
                        surviving.append(j["id"])
                else:
                    surviving.append(j["id"])
            (unaffected if surviving else affected).append(h["id"])
        outcome_affected = bool(affected) and any(
            e["source"] in affected and e["relation"] == "determines" for e in edges)
        return dict(concept=cid, affected=sorted(affected),
                    unaffected=sorted(unaffected), outcome_affected=outcome_affected)
    probe = []
    seen = set()
    for e in edges:
        if e["relation"] == "grounds" and e["source"] not in seen:
            seen.add(e["source"]); probe.append(e["source"])
    for mem in members_of.values():
        for m in mem:
            if m not in seen:
                seen.add(m); probe.append(m)
    counterfactuals = [remove_concept(cid) for cid in probe[:5]]

    out.append(dict(case_id=g.get("case_id"), file=f.split('/')[-1],
                    toulmin=toulmin, holding_support=support, paths=paths,
                    counterfactuals=counterfactuals))
    print(f"{f.split('/')[-1]}: {len(toulmin)} arguments, {len(support)} holdings, "
          f"{len(paths)} paths, {len(counterfactuals)} counterfactuals")

dst = '/root/repo/src/test/resources/graft/ref_graphops_fixture.json'
json.dump(out, open(dst, 'w'), indent=1)
print(f"wrote {dst}: {len(out)} cases")
