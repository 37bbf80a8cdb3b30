#!/usr/bin/env python3
"""Generate the PromptBuilders parity fixture from the PUBLISHED
eval_graph_vs_raw.py / eval_ablation.py functions over current published
graphs: blinded graph summaries (both scrub modes), graph/raw prompts,
ablation flat/typed prompts, fact scrubbing, raw-text blinding (on texts
assembled from published graphs — the function is pure), and the blinding
sanity check. Output: src/test/resources/graft/prompts_fixture.json
"""
import json
import sys
import importlib.util
from pathlib import Path


def load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


gvr = load("gvr", "/root/reference/eval_graph_vs_raw.py")
abl = load("abl", "/root/reference/eval_ablation.py")
gvs = load("gvs", "/root/reference/eval_graph_vs_structured.py")
# eval_hybrid imports eval_concept_retrieval by module name
sys.path.insert(0, "/root/reference")
load("eval_concept_retrieval", "/root/reference/eval_concept_retrieval.py")
ehy = load("ehy", "/root/reference/eval_hybrid.py")

# structured-case summaries/prompts over published structured cases
sc_files = sorted(Path('/root/reference/structured-nongraph-cases').glob('*.json'))
sc_files = [f for f in sc_files if f.name != 'checkpoint.json'][4::80][:30]
structured = []
for f in sc_files:
    d = json.load(open(f, encoding='utf-8'))
    structured.append({
        'case_id': f.stem,
        'summary_scrub': gvs.build_blinded_structured_summary(d, no_scrub=False),
        'summary_noscrub': gvs.build_blinded_structured_summary(d, no_scrub=True),
        'prompt_scrub': gvs.build_structured_prompt(d, no_scrub=False),
    })

graph_files = sorted(Path('/root/reference/iltur_graphs').glob('*.json'))
graph_files = [g for g in graph_files if g.name != 'checkpoint.json']
sample = graph_files[3::60][:40]

cases = []
for gf in sample:
    g = json.load(open(gf, encoding='utf-8'))
    cases.append({
        'case_id': gf.stem,
        'summary_scrub': gvr.build_blinded_graph_summary(g, no_scrub=False),
        'summary_noscrub': gvr.build_blinded_graph_summary(g, no_scrub=True),
        'graph_prompt_noscrub': gvr.build_graph_prompt(g, no_scrub=True),
        'flat_prompt': abl.build_flat_prompt(g),
        'typed_prompt': abl.build_typed_prompt(g),
        'compact_full': ehy._compact_graph_summary(g),
        'compact_blind': ehy._compact_graph_summary(g, blind=True),
        'compact_behavior': ehy._compact_graph_summary(g, hide_outcome=True),
    })

# blind_raw_text probes: pure function — drive it with judgment-like texts
# assembled from published structured cases (varied lengths hit all branches)
texts = []
for f in sorted(Path('/root/reference/structured-nongraph-cases').glob('*.json'))[2:8]:
    d = json.load(open(f, encoding='utf-8'))
    body = " ".join(x.get('text', '') for x in d.get('facts', [])) + " " + \
        " ".join(x.get('text', '') for x in d.get('holdings', [])) + " " + \
        (d.get('outcome') or {}).get('summary', '')
    texts.append(body)
texts.append("HEADNOTE: The appeal is dismissed with costs.\n" + (texts[0] if texts else "x" * 9000))
texts.append("short judgment. The appeal is dismissed.")
texts.append((texts[1] if len(texts) > 1 else "y " * 3000) * 3)

blind_probes = [{'text': t, 'blinded': gvr.blind_raw_text(t)} for t in texts]
scrub_probes = [
    "The court held that the order was invalid. The petitioner filed a writ.",
    "The appellant was convicted. The conviction was upheld by the High Court.",
    "It was held that no notice was given. Facts remain undisputed.",
    "The court held everything.",  # all sentences leak -> first-100 fallback
]
scrubs = [{'text': t, 'scrubbed': gvr._scrub_fact_text(t)} for t in scrub_probes]
sanity = [{'text': t, 'warnings': gvr.blinding_sanity_check(t, 'L', 'C')}
          for t in ["The appeal fails on merits.", "nothing dispositive here",
                    "In the result, ordered accordingly."]]

dest = Path('src/test/resources/graft/prompts_fixture.json')
dest.write_text(json.dumps(
    {'cases': cases, 'blind_raw': blind_probes, 'scrub': scrubs, 'sanity': sanity,
     'structured': structured},
    indent=None, ensure_ascii=False), encoding='utf-8')
print(f"wrote {len(cases)} cases, {len(blind_probes)} blind probes -> {dest}")
