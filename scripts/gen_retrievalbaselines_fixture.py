#!/usr/bin/env python3
"""Generate the RetrievalBaselines parity fixture from the PUBLISHED
eval_retrieval_baselines.py functions over published graphs:
concept collection, query selection, query text, qrels, concept-set score
matrix, RRF fusion (on tie-free deterministic matrices), and the IR-metric
evaluation (with the 1e-10 tie-break noise zeroed: ranking becomes the
stable argsort both engines reproduce; noise only shuffles exact ties).
Output: src/test/resources/graft/retrievalbaselines_fixture.json
"""
import json
import sys
import importlib.util
from pathlib import Path
import numpy as np


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


rb = load("rb", "/root/reference/eval_retrieval_baselines.py")

graph_files = sorted(Path('/root/reference/iltur_graphs').glob('*.json'))
graph_files = [g for g in graph_files if g.name != 'checkpoint.json'][7::30][:80]
graphs = [(g.stem, json.load(open(g, encoding='utf-8'))) for g in graph_files]

case_ids, doc_texts, graph_list = rb.prepare_corpus(graphs)
concept_info = rb.collect_concepts(graph_list, case_ids)
queries = rb.select_queries(concept_info, len(case_ids), n_queries=25)
qrels_bin = rb.build_qrels(queries, binary=True)
qrels_graded = rb.build_qrels(queries, binary=False)
query_texts = [rb.build_query_text(cid, info) for cid, info in queries]
cs_scores = rb.run_concept_set(queries, graph_list, case_ids)

# RRF on deterministic tie-free matrices
rng_free_a = np.array([[((qi * 31 + d) * 2654435761 % 997) / 997.0 + d * 1e-9
                        for d in range(40)] for qi in range(6)])
rng_free_b = np.array([[((qi * 17 + d * 3) * 40503 % 1009) / 1009.0 + d * 1e-9
                        for d in range(40)] for qi in range(6)])
fused = rb.run_rrf(rng_free_a, rng_free_b)

# evaluate_method with zeroed tie noise (deterministic stable ranking)
class ZeroRng:
    def uniform(self, lo, hi, size=None):
        return np.zeros(size)
rb_np_rs = np.random.RandomState
np.random.RandomState = lambda seed=None: ZeroRng()
_orig_argsort = np.argsort
np.argsort = lambda x, *a, **k: _orig_argsort(x, kind='stable')
try:
    per_query, mean_metrics = rb.evaluate_method(cs_scores, qrels_bin, qrels_graded)
finally:
    np.random.RandomState = rb_np_rs
    np.argsort = _orig_argsort

out = {
    'case_ids': case_ids,
    'doc_texts_sha': [__import__('hashlib').sha256(t.encode()).hexdigest()[:16]
                      for t in doc_texts],
    'concept_info': {
        cid: {'df': info['df'],
              'cases': {str(k): v for k, v in info['cases'].items()},
              'unlisted_label': info['unlisted_label'],
              'unlisted_description': info['unlisted_description'],
              'interpretation': info['interpretation']}
        for cid, info in concept_info.items()},
    'queries': [{'cid': cid, 'df': info['df']} for cid, info in queries],
    'query_texts': query_texts,
    'qrels_binary': [{str(k): v for k, v in q.items()} for q in qrels_bin],
    'qrels_graded': [{str(k): v for k, v in q.items()} for q in qrels_graded],
    'concept_set_scores': cs_scores.tolist(),
    'rrf_a': rng_free_a.tolist(),
    'rrf_b': rng_free_b.tolist(),
    'rrf_fused': fused.tolist(),
    'per_query': per_query,
    'mean_metrics': mean_metrics,
}
dest = Path('src/test/resources/graft/retrievalbaselines_fixture.json')
dest.write_text(json.dumps(out, indent=None, ensure_ascii=False), encoding='utf-8')
print(f"wrote {len(case_ids)} cases, {len(queries)} queries -> {dest}")
