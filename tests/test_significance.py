"""significance.py: paired-bootstrap CLI that grounds the published quality
claims (results/q_proj_significance.json etc). Covers the single-run path
and the pooled multi-run mode (per-query NDCG averaged over independent
runs of the same recipe before the bootstrap).

Reference reports corpus-level BEIR means only (eval/eval_utils.py:91-176);
per-query significance is an addition, so the oracle here is hand-computed
NDCG on a 2-query toy set (single relevant doc => NDCG@10 = 1/log2(rank+1)).
"""
import gzip
import importlib.util
import json
import math
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_cli():
    spec = importlib.util.spec_from_file_location(
        "significance", os.path.join(REPO, "scripts", "significance.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def cli():
    return _load_cli()


@pytest.fixture()
def beir_dir(tmp_path):
    d = tmp_path / "toy_beir"
    (d / "qrels").mkdir(parents=True)
    with open(d / "corpus.jsonl", "w") as f:
        for pid in ("d1", "d2", "d3"):
            f.write(json.dumps({"_id": pid, "title": "", "text": pid}) + "\n")
    with open(d / "queries.jsonl", "w") as f:
        for qid in ("q1", "q2"):
            f.write(json.dumps({"_id": qid, "text": qid}) + "\n")
    with open(d / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\nq1\td1\t1\nq2\td2\t1\n")
    return str(d)


def _write_preds(path, systems):
    with gzip.open(path, "wt") as f:
        json.dump(systems, f)
    return str(path)


NDCG_R2 = 1.0 / math.log2(3)  # relevant doc at rank 2


def _run(cli, argv, out):
    old = sys.argv
    sys.argv = ["significance.py"] + argv + ["--out", str(out)]
    try:
        cli.main()
    finally:
        sys.argv = old
    with open(out) as f:
        return json.load(f)


def test_single_run_means_and_signs(cli, beir_dir, tmp_path):
    # bm25: q1 ranks relevant d1 second, q2 ranks relevant d2 first.
    # den:  both relevant docs first -> per-query deltas (+0.369, 0).
    preds = _write_preds(tmp_path / "p.json.gz", {
        "bm25": {"q1": {"d2": 2.0, "d1": 1.0}, "q2": {"d2": 1.0}},
        "den": {"q1": {"d1": 2.0, "d2": 1.0}, "q2": {"d2": 1.0, "d1": 0.5}},
    })
    rep = _run(cli, ["--data", beir_dir, "--predictions", preds,
                     "--systems", "den", "--n-boot", "200"], tmp_path / "o.json")
    assert rep["n_runs"] == 1
    assert rep["baseline_mean"] == pytest.approx((NDCG_R2 + 1.0) / 2)
    row = rep["systems"]["den"]
    assert row["system_mean"] == pytest.approx(1.0)
    assert row["mean_delta"] == pytest.approx((1.0 - NDCG_R2) / 2)
    assert (row["wins"], row["losses"], row["ties"]) == (1, 0, 1)
    assert row["n_queries"] == 2 and row["n_runs"] == 1


def test_pooled_runs_average_per_query(cli, beir_dir, tmp_path):
    # Run A: den perfect on q1; run B: den leaves q1's relevant at rank 2.
    # Pooled per-query NDCG: q1 (1 + 0.631)/2, q2 1.0. Baseline identical
    # across runs (the BM25 predictions are deterministic), so the pooled
    # delta halves run A's.
    base = {"q1": {"d2": 2.0, "d1": 1.0}, "q2": {"d2": 1.0}}
    pa = _write_preds(tmp_path / "a.json.gz", {
        "bm25": base,
        "den": {"q1": {"d1": 2.0, "d2": 1.0}, "q2": {"d2": 1.0}},
    })
    pb = _write_preds(tmp_path / "b.json.gz", {
        "bm25": base,
        "den": {"q1": {"d2": 2.0, "d1": 1.0}, "q2": {"d2": 1.0}},
        "only_b": {"q1": {"d1": 1.0}, "q2": {"d2": 1.0}},
    })
    rep = _run(cli, ["--data", beir_dir, "--predictions", f"{pa},{pb}",
                     "--systems", "den,only_b", "--n-boot", "200"],
               tmp_path / "o.json")
    assert rep["n_runs"] == 2
    den = rep["systems"]["den"]
    assert den["n_runs"] == 2
    pooled_q1 = (1.0 + NDCG_R2) / 2
    assert den["system_mean"] == pytest.approx((pooled_q1 + 1.0) / 2)
    assert den["mean_delta"] == pytest.approx((pooled_q1 - NDCG_R2) / 2)
    # A system present in only one run pools over that run alone.
    only_b = rep["systems"]["only_b"]
    assert only_b["n_runs"] == 1
    assert only_b["system_mean"] == pytest.approx(1.0)


def test_pooled_fused_holdout_uses_per_run_weights(cli, beir_dir, tmp_path):
    # Smoke the pooled fusion path: two runs, no --summary -> the weight is
    # re-swept per run on the dev third; report carries per-run weights and
    # the holdout rows exist.
    base = {"q1": {"d2": 2.0, "d1": 1.0}, "q2": {"d2": 1.0, "d1": 0.2}}
    pa = _write_preds(tmp_path / "a.json.gz", {
        "bm25": base, "den": {"q1": {"d1": 2.0}, "q2": {"d2": 1.0}}})
    pb = _write_preds(tmp_path / "b.json.gz", {
        "bm25": base, "den": {"q1": {"d1": 1.0, "d2": 0.9}, "q2": {"d2": 1.0}}})
    rep = _run(cli, ["--data", beir_dir, "--predictions", f"{pa},{pb}",
                     "--systems", "den", "--fused", "den", "--n-boot", "100"],
               tmp_path / "o.json")
    row = rep["systems"]["den_bm25_lin_holdout"]
    assert row["n_runs"] == 2
    assert isinstance(row["best_w"], list) and len(row["best_w"]) == 2


def test_pooled_fused_system_absent_from_first_run(cli, beir_dir, tmp_path):
    # A fused system missing from the FIRST run but present in a later one
    # must pool over the runs that contain it — not be silently skipped
    # (ADVICE r4 low: the gate used to read only preds_list[0]).
    base = {"q1": {"d2": 2.0, "d1": 1.0}, "q2": {"d2": 1.0, "d1": 0.2}}
    pa = _write_preds(tmp_path / "a.json.gz", {"bm25": base})
    pb = _write_preds(tmp_path / "b.json.gz", {
        "bm25": base, "den": {"q1": {"d1": 2.0}, "q2": {"d2": 1.0}}})
    rep = _run(cli, ["--data", beir_dir, "--predictions", f"{pa},{pb}",
                     "--systems", "bm25", "--fused", "den", "--n-boot", "100"],
               tmp_path / "o.json")
    row = rep["systems"]["den_bm25_lin_holdout"]
    assert row["n_runs"] == 1
    assert not isinstance(row["best_w"], list)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
