#!/usr/bin/env python3
"""Generate the GraphEval parity fixture by running the PUBLISHED
evaluate_graphs.py metric functions over current published graphs.

The committed evaluation_outputs/ predate the current graph corpus (the
published script itself no longer reproduces them — graphs gained repair
edges since), so parity targets the published CODE on current data, the
same approach as the orphan-repair fixtures.

Output: src/test/resources/graft/grapheval_fixture.json
Fields are canonicalized for robust comparison: orphan_nodes is the FULL
sorted list (Python set order is hash-randomized), invalid_edge_patterns
and warnings are FULL in-order lists (deterministic), numbers keep the
reference's rounding (round-half-even).
"""
import json
import importlib.util
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "eg", "/root/reference/evaluate_graphs.py")
eg = importlib.util.module_from_spec(spec)
spec.loader.exec_module(eg)

valid = eg.load_ontology('/root/reference/ontology_compiled.json')
graphs = sorted(Path('/root/reference/iltur_graphs').glob('*.json'))
graphs = [g for g in graphs if g.name != 'checkpoint.json']
# every 40th graph + the first 10: 70+ cases spread across years
sample = graphs[:10] + graphs[10::40]

out = []
for gf in sample:
    data = json.load(open(gf, encoding='utf-8'))
    case_id = data.get('case_id', gf.stem)
    edges = data.get('edges', [])
    ev_rate, invalid_edges = eg.evaluate_edge_validity(edges)
    conn_rate, orphan_count, orphan_nodes = eg.evaluate_connectivity(data)
    ir_rate, hc_rate, unresolved = eg.evaluate_reasoning_completeness(data)
    missing_anchor_count, missing_nodes = eg.evaluate_anchor_quality(data)
    sem = eg.evaluate_semantic_sanity(data, valid)
    score = eg.calculate_quality_score(
        ev_rate, conn_rate, ir_rate, sem['warnings_count'], missing_anchor_count)
    out.append({
        'case_id': case_id,
        'edge_validity_rate': round(ev_rate, 4),
        'invalid_edge_count': len(invalid_edges),
        'invalid_edge_patterns': [e['pattern'] for e in invalid_edges],
        'connectivity_rate': round(conn_rate, 4),
        'orphan_count': orphan_count,
        'orphan_nodes': sorted(orphan_nodes),
        'issues_resolved_rate': round(ir_rate, 4),
        'holdings_connected_rate': round(hc_rate, 4),
        'unresolved_issues': sorted(unresolved),
        'missing_anchor_count': missing_anchor_count,
        'missing_anchor_nodes': missing_nodes,
        'warnings_count': sem['warnings_count'],
        'warnings_first10': sem['warnings'],
        'duplicate_count': sem['duplicate_count'],
        'actor_distribution': sem['actor_distribution'],
        'invalid_concept_count': sem['invalid_concept_count'],
        'quality_score': score,
        'node_counts': {
            'facts': len(data.get('facts', [])),
            'concepts': len(data.get('concepts', [])),
            'issues': len(data.get('issues', [])),
            'arguments': len(data.get('arguments', [])),
            'holdings': len(data.get('holdings', [])),
            'precedents': len(data.get('precedents', [])),
            'edges': len(edges),
            'reasoning_chains': len(data.get('reasoning_chains', [])),
        },
    })

dest = Path('src/test/resources/graft/grapheval_fixture.json')
dest.write_text(json.dumps({'n_total_graphs': len(graphs), 'cases': out},
                           indent=1, ensure_ascii=False), encoding='utf-8')
print(f"wrote {len(out)} cases to {dest}")
