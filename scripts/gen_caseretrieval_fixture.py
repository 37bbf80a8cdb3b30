#!/usr/bin/env python3
"""Generate the CaseRetrieval parity fixture by running the PUBLISHED
eval_concept_retrieval.py functions over current published graphs.

Covers the deterministic core: concept-token normalization, fuzzy concept
similarity, statute families, IDFs, weighted Jaccard / counter cosine /
precedent overlap, combined_similarity (text channel in its defined
no-sklearn FALLBACK mode = family Jaccard), retrieve_similar ranking,
predict_from_neighbors (all 4 methods), leave-one-out metrics with fixed +
optimal thresholds. Labels come from the published structured-nongraph
corpus (_label), the same IL-TUR labels the script loads from HF.

Output: src/test/resources/graft/caseretrieval_fixture.json
"""
import json
import math
import importlib.util
from pathlib import Path

import sys
spec = importlib.util.spec_from_file_location(
    "ecr", "/root/reference/eval_concept_retrieval.py")
ecr = importlib.util.module_from_spec(spec)
sys.modules["ecr"] = ecr  # dataclass decorator needs the module registered
spec.loader.exec_module(ecr)

# labels from the published structured corpus (same IL-TUR ids)
labels = {}
for f in Path('/root/reference/structured-nongraph-cases').glob('*.json'):
    if f.name == 'checkpoint.json':
        continue
    try:
        d = json.load(open(f, encoding='utf-8'))
    except Exception:
        continue
    if isinstance(d.get('_label'), int):
        labels[f.stem] = d['_label']

graph_files = sorted(Path('/root/reference/iltur_graphs').glob('*.json'))
graph_files = [g for g in graph_files if g.name != 'checkpoint.json']
# 60 labeled graphs, spread
sample = []
for g in graph_files[5::40]:
    if g.stem in labels:
        sample.append(g)
    if len(sample) == 60:
        break

graphs = [(g.stem, json.load(open(g, encoding='utf-8'))) for g in sample]
profiles = [ecr.extract_concept_profile(g, labels[c]) for c, g in graphs]
onto_idf, family_idf = ecr.compute_idf_multi(profiles)
fuzzy = ecr.FuzzyConceptIndex(profiles)

# per-profile dump
prof_dump = []
for p in profiles:
    prof_dump.append({
        'case_id': p.case_id,
        'label': p.label,
        'ontology_concepts': p.ontology_concepts,
        'statute_families': p.statute_families,
        'all_concepts': p.all_concepts,
        'schemes': dict(p.schemes),
        'precedent_citations': sorted(p.precedent_citations),
        'fact_types': dict(p.fact_types),
        'edge_types': dict(p.edge_types),
        'outcome': p.outcome,
        'concept_text': p.concept_text,
        'full_case_text': p.full_case_text,
    })

# token normalization probes (all concept ids appearing in the sample)
all_cids = sorted({cid for p in profiles for cid in p.all_concepts})
tok_dump = {cid: sorted(ecr._normalize_concept_tokens(cid)) for cid in all_cids}
fam_dump = {cid: ecr.extract_statute_family(cid) for cid in all_cids}

# pairwise similarities (fallback text mode: text_sim=None)
sim_kw = {'onto_idf': onto_idf, 'family_idf': family_idf,
          'text_sim': None, 'fuzzy_index': fuzzy}
pair_dump = []
for i, a in enumerate(profiles):
    for b in profiles[i + 1:]:
        pair_dump.append({
            'a': a.case_id, 'b': b.case_id,
            'fuzzy': fuzzy.fuzzy_concept_similarity(a, b),
            'family_jac': ecr._weighted_jaccard(a.statute_families, b.statute_families, family_idf),
            'onto_jac': ecr._weighted_jaccard(a.ontology_concepts, b.ontology_concepts, onto_idf),
            'precedent': ecr.precedent_overlap(a, b),
            'scheme_cos': ecr._cosine(a.schemes, b.schemes),
            'fact_cos': ecr._cosine(a.fact_types, b.fact_types),
            'edge_cos': ecr._cosine(a.edge_types, b.edge_types),
            'combined_default': ecr.combined_similarity(a, b, **sim_kw),
        })

# leave-one-out (fallback text mode), k=10, all four methods
corpus = list(zip(profiles, [g for _, g in graphs]))
methods = ["majority_vote", "weighted_vote", "distance_decay_vote",
           "family_cluster_aggregate"]
loo = {m: {'probs': [], 'preds': [], 'trues': []} for m in methods}
retrieval_dump = []
for i, (qp, qg) in enumerate(corpus):
    rem = [(p, g) for j, (p, g) in enumerate(corpus) if j != i]
    nbrs = ecr.retrieve_similar(qp, rem, 10, sim_kw)
    retrieval_dump.append({
        'query': qp.case_id,
        'neighbors': [{'case_id': n.case_id, 'similarity': n.similarity,
                       'label': n.label,
                       'shared_families': n.shared_families} for n in nbrs],
    })
    for m in methods:
        pred, prob, _ = ecr.predict_from_neighbors(nbrs, m, family_idf, 0.5)
        loo[m]['probs'].append(prob)
        loo[m]['preds'].append(pred)
        loo[m]['trues'].append(qp.label)

# metrics per method: fixed 0.5 + optimal threshold
import numpy as np
metrics = {}
for m in methods:
    trues = np.array(loo[m]['trues'])
    probs = np.array(loo[m]['probs'])
    fixed = ecr._compute_metrics_at_threshold(trues, probs, 0.5)
    opt_t, opt_val = ecr.find_optimal_threshold(trues, probs, 'f1')
    opt = ecr._compute_metrics_at_threshold(trues, probs, opt_t)
    metrics[m] = {'fixed': fixed, 'opt_threshold': round(opt_t, 10), 'opt': opt}

out = {
    'k': 10,
    'n_cases': len(profiles),
    'labels': {p.case_id: p.label for p in profiles},
    'onto_idf': onto_idf,
    'family_idf': family_idf,
    'profiles': prof_dump,
    'concept_tokens': tok_dump,
    'concept_families': fam_dump,
    'pairs': pair_dump,
    'retrieval': retrieval_dump,
    'loo': {m: {k2: list(map(float, v2)) if k2 != 'trues' else list(map(int, v2))
                for k2, v2 in loo[m].items()} for m in methods},
    'metrics': metrics,
}
dest = Path('src/test/resources/graft/caseretrieval_fixture.json')
dest.write_text(json.dumps(out, indent=None, ensure_ascii=False), encoding='utf-8')
print(f"wrote fixture: {len(profiles)} cases, {len(pair_dump)} pairs -> {dest}")
