"""Docs/artifact lockstep guard (VERDICT r3 next #10).

Round 3 shipped two claim/artifact mismatches and one stale citation; the
rule adopted for round 4: every performance number cited in the top-level
docs must point at a committed artifact. This test greps all top-level
markdown for `results/*.json` citations and asserts each exists, so a doc
edit referencing an artifact that was never committed fails CI instead of
shipping.
"""
from __future__ import annotations

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Citations allowed to be absent (stages still queued in the running study
# chain). MUST be emptied before the round closes.
PENDING: set[str] = {  # r5b_chain.sh stages queued; drop each as it lands
    "results/asym_speedup_r5.json",
    "results/q_proj_s1_quality_summary.json",
    "results/q_proj_pooled_significance.json",
    "results/q_cheader_ft_quality_summary.json",
    "results/rr_proj_s1_summary.json",
    "results/q_big_quality_summary.json",
    "results/rr_big_summary.json",
    "results/rr_neural_summary.json",
    "results/q_asym_quality_summary.json",
    "results/q_mrl_w_quality_summary.json",
    "results/q_s2_quality_summary.json",
}

_CITE = re.compile(r"(?:results|BENCH|MULTICHIP)[A-Za-z0-9_./-]*\.json[l]?")


def _cited_paths():
    out = []
    for fn in sorted(os.listdir(REPO)):
        # VERDICT/ADVICE are judge-authored and name future driver
        # artifacts ("done = BENCH_rN.json whose ...") by design.
        if not fn.endswith(".md") or fn in ("VERDICT.md", "ADVICE.md"):
            continue
        text = open(os.path.join(REPO, fn), encoding="utf-8").read()
        for m in _CITE.finditer(text):
            out.append((fn, m.group(0)))
    return out


def test_markdown_citations_resolve():
    cited = _cited_paths()
    assert cited, "no artifact citations found at all (regex broken?)"
    missing = sorted({
        f"{doc}: {path}" for doc, path in cited
        if path not in PENDING and not os.path.exists(os.path.join(REPO, path))
    })
    assert not missing, (
        "dangling artifact citations (docs-lockstep rule: every cited "
        f"results/BENCH/MULTICHIP json must be committed): {missing}")


@pytest.mark.parametrize("doc", ["PERFORMANCE.md", "README.md"])
def test_key_docs_exist(doc):
    assert os.path.exists(os.path.join(REPO, doc))
