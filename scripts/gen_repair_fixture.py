#!/usr/bin/env python3
"""Generate the orphan-repair parity fixture: run the reference's published
repair_orphans.py (verbatim, imported from /root/reference) over a diverse
sample of its published graphs' PRE-repair edge sets, and record the edges it
adds. ReferenceParitySpec asserts our Scala OrphanRepair produces the same
edges on the same inputs.

The committed e_repair_* edges inside the published graphs predate the
published script version (the script itself no longer reproduces them), so
the published CODE is the parity baseline for repair, while the committed
GRAPHS are the baseline for chains/justification sets/tiers (those replay
exactly)."""
import json, glob, sys, importlib.util

spec = importlib.util.spec_from_file_location("ro", "/root/reference/repair_orphans.py")
ro = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ro)

files = sorted(glob.glob('/root/reference/iltur_graphs/*.json'))
stride = int(sys.argv[1]) if len(sys.argv) > 1 else 100
sample = files[::stride]

out = []
for f in sample:
    try:
        g = json.load(open(f))
    except Exception:
        continue
    if '_meta' not in g:
        continue
    base = [e for e in g.get('edges') or [] if not str(e.get('id', '')).startswith('e_repair_')]
    g2 = dict(g)
    g2['edges'] = base
    rg, nb, na = ro.repair_graph(g2)
    added = [e for e in rg['edges'] if e['id'].startswith('e_repair_')]
    out.append(dict(
        case_id=g.get('case_id') or f.split('/')[-1].removesuffix('.json'),
        file=f.split('/')[-1],
        n_orphans_before=nb,
        n_orphans_after=na,
        repair_edges=[dict(id=e['id'], source=e['source'], target=e['target'],
                           relation=e['relation'], strength=e['strength'],
                           explanation=e['explanation']) for e in added]))
    print(f"{f.split('/')[-1]}: {len(added)} repair edges ({nb} -> {na} orphans)")

dst = '/root/repo/src/test/resources/graft/ref_repair_fixture.json'
json.dump(out, open(dst, 'w'), indent=1)
print(f"wrote {dst}: {len(out)} cases")
