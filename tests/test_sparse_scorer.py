"""Sparse impact scorer + BM25 tests: parity vs naive dense scoring."""
import numpy as np
import pytest

from lightretriever_tpu.retriever.sparse_scorer import (
    BM25Index,
    SparseImpactIndex,
    lucene_analyze,
    pack_sparse_vecs,
    quantize_vecs,
)

V = 64


def _rand_sparse(rng, n, nnz=6, vmax=3.0):
    vecs = []
    for _ in range(n):
        ids = rng.choice(V, size=nnz, replace=False)
        vecs.append({int(t): float(rng.uniform(0.1, vmax)) for t in ids})
    return vecs


def _dense(vecs):
    m = np.zeros((len(vecs), V), np.float32)
    for i, v in enumerate(vecs):
        for t, x in v.items():
            m[i, t] = x
    return m


def test_pack_and_quantize(rng):
    vecs = _rand_sparse(rng, 5)
    ids, vals = pack_sparse_vecs(vecs)
    assert ids.shape == vals.shape
    qv = quantize_vecs(vecs, 100)
    for orig, q in zip(vecs, qv):
        for t, x in q.items():
            assert x == float(int(orig[t] * 100))
            assert x > 0


def test_impact_search_exact(rng):
    docs = _rand_sparse(rng, 40)
    queries = _rand_sparse(rng, 5, nnz=4)
    idx = SparseImpactIndex(vocab_size=V, quantization_factor=100)
    idx.add(docs)
    s, i = idx.search(queries, 10)
    # naive: quantized dense matmul
    dq = _dense(quantize_vecs(docs, 100))
    qm = _dense(queries)
    want = qm @ dq.T
    wi = np.argsort(-want, axis=1)[:, :10]
    ws = np.take_along_axis(want, wi, axis=1)
    np.testing.assert_allclose(s, ws, rtol=1e-5)


def test_impact_search_chunked_and_sharded(rng, mesh8):
    docs = _rand_sparse(rng, 37)
    queries = _rand_sparse(rng, 4, nnz=4)
    ref = SparseImpactIndex(vocab_size=V)
    ref.add(docs)
    rs, ri = ref.search(queries, 7)

    idx = SparseImpactIndex(vocab_size=V, mesh=mesh8, chunk_docs=16)
    idx.add(docs[:20])
    idx.add(docs[20:])
    s, i = idx.search(queries, 7)
    np.testing.assert_allclose(s, rs, rtol=1e-5)
    np.testing.assert_array_equal(i, ri)


def test_query_dense_matrix_input(rng):
    docs = _rand_sparse(rng, 20)
    idx = SparseImpactIndex(vocab_size=V)
    idx.add(docs)
    qm = _dense(_rand_sparse(rng, 3, nnz=4))
    s, i = idx.search(qm, 5)
    assert s.shape == (3, 5)


def test_lucene_analyze():
    toks = lucene_analyze("The quick-brown FOX, and a dog!")
    assert toks == ["quick", "brown", "fox", "dog"]


def test_bm25_ranks_relevant_doc_first():
    docs = [
        "the cat sat on the mat",
        "dogs chase cats in the park",
        "quantum computing with superconducting qubits",
        "a recipe for chocolate cake with cocoa",
        "tpu pods interconnect chips with high bandwidth links",
    ]
    idx = BM25Index()
    idx.add(docs)
    s, i = idx.search(["chocolate cake recipe", "tpu interconnect bandwidth"], k=3)
    assert i[0, 0] == 3
    assert i[1, 0] == 4
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_bm25_sharded(mesh8):
    docs = [f"document number {i} about topic {i % 5}" for i in range(30)]
    docs[17] = "zebra giraffe elephant safari"
    idx = BM25Index(mesh=mesh8)
    idx.add(docs)
    s, i = idx.search(["zebra safari elephant"], k=5)
    assert i[0, 0] == 17


def test_inverted_index_exact_when_uncapped(rng):
    from lightretriever_tpu.retriever.sparse_scorer import InvertedImpactIndex

    docs = _rand_sparse(rng, 50)
    queries = _rand_sparse(rng, 6, nnz=4)
    ref = SparseImpactIndex(vocab_size=V)
    ref.add(docs)
    rs, ri = ref.search(queries, 8)

    inv = InvertedImpactIndex(vocab_size=V, postings_cap=64)  # > any df: exact
    inv.add(docs)
    s, i = inv.search(queries, 8)
    np.testing.assert_allclose(s, rs, rtol=1e-5)
    # ids may differ only on ties; verify scores of returned docs match
    dq = _dense(quantize_vecs(docs, 100))
    qm = _dense(queries)
    for r in range(len(queries)):
        for rank in range(8):
            if i[r, rank] >= 0:
                np.testing.assert_allclose(
                    s[r, rank], qm[r] @ dq[int(i[r, rank])], rtol=1e-5)


def test_inverted_index_pruned_recall(rng):
    from lightretriever_tpu.retriever.sparse_scorer import InvertedImpactIndex

    docs = _rand_sparse(rng, 300, nnz=10)
    queries = _rand_sparse(rng, 8, nnz=5)
    ref = SparseImpactIndex(vocab_size=V)
    ref.add(docs)
    rs, ri = ref.search(queries, 10)
    inv = InvertedImpactIndex(vocab_size=V, postings_cap=32)  # forces pruning
    inv.add(docs)
    s, i = inv.search(queries, 10)
    recall = np.mean([len(set(i[r]) & set(ri[r])) / 10 for r in range(8)])
    assert recall >= 0.7


def test_sparse_search_engines_agree(rng):
    """SparseSearch engines vs exhaustive: same rankings on
    uncapped data through the full search-strategy path."""
    from lightretriever_tpu.retriever.search import SparseSearch

    docs = [
        {str(t): float(x * 100) for t, x in d.items()}  # pre-quantized json
        for d in _rand_sparse(rng, 30)
    ]
    ids = [f"d{i}" for i in range(30)]
    queries = ["1 2 3", "5 5 9", "12 40"]
    qids = ["q0", "q1", "q2"]

    results = {}
    for engine in ("inverted", "impact", "blockmax", "exhaustive"):
        ss = SparseSearch(vocab_size=V, engine=engine)
        ss.index(docs, ids)
        results[engine] = ss.retrieve_with_emb(queries, qids, top_k=5)
        ss.clear()
    for engine in ("inverted", "impact", "blockmax"):
        for qid in qids:
            a, b = results[engine][qid], results["exhaustive"][qid]
            for pid in set(a) & set(b):
                np.testing.assert_allclose(a[pid], b[pid], rtol=1e-5)
            assert max(a, key=a.get, default=None) == max(b, key=b.get, default=None)


def test_train_dataloader_prefetch(rng):
    from lightretriever_tpu.training.data import _prefetch_iter

    out = list(_prefetch_iter(iter(range(10)), 3))
    assert out == list(range(10))

    def boom():
        yield 1
        raise ValueError("inner error")

    import pytest as _pytest
    it = _prefetch_iter(boom(), 2)
    assert next(it) == 1
    with _pytest.raises(ValueError):
        next(it)


def test_query_blocking_matches_unblocked():
    """The resident path must give identical results when the query-block
    memory budget forces multiple blocks (regression: a 1500-query eval on
    unpruned near-dense docs requested a 98GB gather buffer)."""
    import numpy as np

    from lightretriever_tpu.retriever.sparse_scorer import SparseImpactIndex

    rng = np.random.default_rng(0)
    v, n, q_n = 512, 300, 40
    vecs = []
    for _ in range(n):
        toks = rng.choice(v, size=200, replace=False)  # dense-ish docs
        vecs.append({int(t): float(rng.uniform(0.1, 2.0)) for t in toks})
    queries = []
    for _ in range(q_n):
        toks = rng.choice(v, size=8, replace=False)
        queries.append({int(t): float(rng.integers(1, 4)) for t in toks})

    a = SparseImpactIndex(vocab_size=v)
    a.add(vecs, quantize=True)
    s1, i1 = a.search(queries, 10)

    b = SparseImpactIndex(vocab_size=v)
    b.add(vecs, quantize=True)
    b.query_block_budget_bytes = 1  # force min block (16 queries, 3 blocks)
    s2, i2 = b.search(queries, 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_sparse_search_auto_dispatch(rng):
    """engine='auto' (the default) defers the choice to retrieval: tiered
    above the doc threshold with non-negative weights, exhaustive otherwise —
    and both resolutions return exactly the exhaustive results."""
    from lightretriever_tpu.retriever.search import SparseSearch

    docs = [
        {str(t): float(x * 100) for t, x in d.items()}
        for d in _rand_sparse(rng, 60)
    ]
    ids = [f"d{i}" for i in range(60)]
    queries = ["1 2 3", "5 5 9", "12 40"]
    qids = ["q0", "q1", "q2"]

    ref = SparseSearch(vocab_size=V, engine="exhaustive")
    ref.index(docs, ids)
    expected = ref.retrieve_with_emb(queries, qids, top_k=5)
    ref.clear()

    # Above threshold -> tiered (chunked adds accumulate in the buffer)
    ss = SparseSearch(vocab_size=V, auto_tiered_min_docs=50)
    ss.index(docs[:30], ids[:30])
    ss.index(docs[30:], ids[30:])
    got = ss.retrieve_with_emb(queries, qids, top_k=5)
    assert ss.resolved_engine == "tiered"
    assert got == expected
    ss.clear()
    assert ss.resolved_engine is None and not ss._pending

    # Below threshold -> exhaustive
    ss = SparseSearch(vocab_size=V, auto_tiered_min_docs=1000)
    ss.index(docs, ids)
    got = ss.retrieve_with_emb(queries, qids, top_k=5)
    assert ss.resolved_engine == "exhaustive"
    assert got == expected
    ss.clear()

    # Negative doc weights -> exhaustive even above the doc threshold
    neg_docs = [dict(d) for d in docs]
    neg_docs[7]["2"] = -50.0
    ss = SparseSearch(vocab_size=V, auto_tiered_min_docs=50)
    ss.index(neg_docs, ids)
    ss.retrieve_with_emb(queries, qids, top_k=5)
    assert ss.resolved_engine == "exhaustive"
    ss.clear()

    # Negative query weights -> exhaustive too
    ss = SparseSearch(vocab_size=V, auto_tiered_min_docs=50)
    ss.index(docs, ids)
    ss.retrieve_with_emb([{"1": -1.0, "3": 2.0}, "5 9", "12"], qids, top_k=5)
    assert ss.resolved_engine == "exhaustive"
    ss.clear()
