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


# --- cited NUMBERS, not just cited filenames (VERDICT r4 next #9) -----------
# Each claim: the quote must appear verbatim in the doc, and the artifact
# value at the dotted path must round to the claimed number (|Δ| ≤ half an
# ulp of the printed precision). Catches the round-4 class of label drift
# (a number quoted from the wrong row of the right artifact).
CLAIMS = [
    # README headline table rows
    ("README.md", "fusion 0.680 [0.672..0.688] NDCG@10 vs BM25 0.536",
     "results/r4_quality_aggregate.json",
     [("systems.den_spr_bm25_lin.NDCG@10.mean", 0.680),
      ("systems.den_spr_bm25_lin.NDCG@10.min", 0.672),
      ("systems.den_spr_bm25_lin.NDCG@10.max", 0.688),
      ("systems.bm25.NDCG@10.mean", 0.536)]),
    ("README.md", "den_spr 0.554 NDCG@10 > BM25 0.536 (R@100 0.883 vs 0.865)",
     "results/q_proj_quality_summary.json",
     [("metrics.den_spr.NDCG@10", 0.554),
      ("metrics.bm25.NDCG@10", 0.536),
      ("metrics.den_spr.Recall@100", 0.883),
      ("metrics.bm25.Recall@100", 0.865)]),
    ("README.md", "0.652 vs 0.557 NDCG@10",
     "results/rr_mined_summary.json",
     [("reranked_fused.NDCG@10", 0.652),
      ("first_stage_bm25.NDCG@10", 0.557)]),
    ("README.md", "NDCG@1 +7.8pt",
     "results/rr_mined_summary.json",
     [("reranked_fused.NDCG@1", 0.498),
      ("first_stage_bm25.NDCG@1", 0.420)]),
    ("README.md", "0.93 µs vs 83.8 µs/query",
     "results/asym_speedup_r5.json",
     [("embbag_us_per_query", 0.93),
      ("tower_us_per_query", 83.8)]),
    ("README.md",
     "den_spr 0.560 vs BM25 0.536 pooled NDCG@10, p=0.027 paired bootstrap",
     "results/q_proj_pooled_significance.json",
     [("systems.den_spr.system_mean", 0.560),
      ("baseline_mean", 0.536),
      ("systems.den_spr.p_one_sided", 0.027)]),
    ("README.md", "seed-1 alone: 0.566",
     "results/q_proj_s1_quality_summary.json",
     [("metrics.den_spr.NDCG@10", 0.566)]),
    ("PERFORMANCE.md", "two\nindependent training runs (0.554, 0.566 vs BM25 0.536) with pooled\np=0.027",
     "results/q_proj_pooled_significance.json",
     [("systems.den_spr.p_one_sided", 0.027)]),
    # round-5 seed-1 retrieve+rerank replication
    ("PERFORMANCE.md", "| den_spr top-100 → CE, fused | **0.613** | 0.606 |",
     "results/rr_proj_s1_summary.json",
     [("neural_first_stages.den_spr.reranked_fused.NDCG@10", 0.613)]),
    ("PERFORMANCE.md", "| BM25 top-100 → CE, fused | **0.652** | 0.652 |",
     "results/rr_proj_s1_summary.json",
     [("reranked_fused.NDCG@10", 0.652)]),
    # round-5 second-domain fine-tune
    ("PERFORMANCE.md", "den_spr reaches 0.599 vs BM25 0.729",
     "results/q_cheader_ft_quality_summary.json",
     [("metrics.den_spr.NDCG@10", 0.599),
      ("metrics.bm25.NDCG@10", 0.729)]),
    ("PERFORMANCE.md", "2/3 fusion 0.760 vs BM25 0.729",
     "results/q_cheader_ft_quality_summary.json",
     [("holdout.den_bm25_lin.NDCG@10", 0.760),
      ("metrics.bm25.NDCG@10", 0.729)]),
]


def _dig(obj, dotted: str):
    for part in dotted.split("."):
        obj = obj[part]
    return obj


@pytest.mark.parametrize("doc,quote,artifact,checks", CLAIMS,
                         ids=[c[1][:40] for c in CLAIMS])
def test_cited_numbers_match_artifacts(doc, quote, artifact, checks):
    import json

    text = open(os.path.join(REPO, doc), encoding="utf-8").read()
    assert quote in text, f"{doc} no longer contains the claimed quote: {quote!r}"
    data = json.load(open(os.path.join(REPO, artifact)))
    from decimal import Decimal

    for path, claimed in checks:
        got = float(_dig(data, path))
        # half an ulp of the claim's own printed precision + float slack
        ulp = 10.0 ** Decimal(str(claimed)).as_tuple().exponent
        assert abs(got - claimed) <= 0.50001 * ulp, (
            f"{doc} claims {claimed} but {artifact}:{path} = {got}")
