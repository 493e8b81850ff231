"""Block-max pruned impact engine: certificates, parity vs exhaustive."""
import numpy as np

from lightretriever_tpu.retriever.block_max import BlockMaxImpactIndex, ImpactOrderedIndex
from lightretriever_tpu.retriever.sparse_scorer import (
    SparseImpactIndex,
    quantize_vecs,
)

V = 96


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


def test_all_blocks_probed_is_exact(rng):
    """probe >= n_blocks: results identical to the exhaustive engine."""
    docs = _rand_sparse(rng, 60)
    queries = _rand_sparse(rng, 5, nnz=4)
    ref = SparseImpactIndex(vocab_size=V)
    ref.add(docs)
    rs, ri = ref.search(queries, 10)

    idx = BlockMaxImpactIndex(vocab_size=V, block_docs=8, probe_blocks=10**6)
    idx.add(docs)
    s, i = idx.search(queries, 10)
    np.testing.assert_allclose(s, rs, rtol=1e-5)
    assert idx.last_certified_frac == 1.0
    # scores of returned ids must match the true scores (ties may reorder ids)
    dq = _dense(quantize_vecs(docs, 100))
    qm = _dense(queries)
    for r in range(len(queries)):
        for rank in range(10):
            np.testing.assert_allclose(
                s[r, rank], qm[r] @ dq[int(i[r, rank])], rtol=1e-5)


def _clustered_sparse(rng, n, n_topics=10, nnz=6):
    """Docs dominated by one heavy topic term — the shape real learned
    sparse reps have, and the one dominant-term clustering exploits."""
    vecs = []
    for _ in range(n):
        topic = int(rng.integers(n_topics))
        v = {topic: float(rng.uniform(5.0, 9.0))}
        for t in rng.choice(np.arange(n_topics, V), size=nnz - 1, replace=False):
            v[int(t)] = float(rng.uniform(0.1, 1.0))
        vecs.append(v)
    return vecs


def test_certified_queries_match_exact_topk(rng):
    """With partial probing, every CERTIFIED query's top-k is exact."""
    docs = _clustered_sparse(rng, 400)
    queries = [{int(t): 1.0} for t in range(10)] + _rand_sparse(rng, 6, nnz=4)
    ref = SparseImpactIndex(vocab_size=V)
    ref.add(docs)
    rs, ri = ref.search(queries, 10)

    idx = BlockMaxImpactIndex(vocab_size=V, block_docs=16, probe_blocks=8)
    idx.add(docs)
    s, i = idx.search(queries, 10)
    assert idx.n_blocks > 8, "test needs partial probing"
    assert idx.last_certified_frac > 0, "clustered corpus should certify"
    dq = _dense(quantize_vecs(docs, 100))
    qm = _dense(queries)
    exact = qm @ dq.T
    for r in range(len(queries)):
        # returned scores are always TRUE scores (no approximation of the
        # scoring itself, only of the candidate set)
        for rank in range(10):
            if i[r, rank] >= 0:
                np.testing.assert_allclose(
                    s[r, rank], exact[r, int(i[r, rank])], rtol=1e-5)
        if idx.last_certified[r]:
            want = np.sort(exact[r])[::-1][:10]
            np.testing.assert_allclose(s[r], want, rtol=1e-5)


def test_recall_increases_with_probe(rng):
    docs = _rand_sparse(rng, 600, nnz=8)
    queries = _rand_sparse(rng, 12, nnz=4)
    ref = SparseImpactIndex(vocab_size=V)
    ref.add(docs)
    rs, ri = ref.search(queries, 20)

    idx = BlockMaxImpactIndex(vocab_size=V, block_docs=16, probe_blocks=4)
    idx.add(docs)

    def score_mass(probe):
        # score-based recall: robust to ties at the k boundary (quantized
        # integer impacts tie often), unlike id-set overlap
        s, i = idx.search(queries, 20, probe_blocks=probe)
        return float(np.sum(s, where=np.isfinite(s)) / rs.sum())

    m_small = score_mass(2)
    m_big = score_mass(idx.n_blocks)
    np.testing.assert_allclose(m_big, 1.0, rtol=1e-6)
    assert m_small <= m_big + 1e-6


def test_dict_and_dense_queries_agree(rng):
    docs = _rand_sparse(rng, 100)
    qd = _rand_sparse(rng, 3, nnz=4)
    idx = BlockMaxImpactIndex(vocab_size=V, block_docs=16, probe_blocks=4)
    idx.add(docs)
    s1, i1 = idx.search(qd, 5)
    s2, i2 = idx.search(_dense(qd), 5)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
    np.testing.assert_array_equal(i1, i2)


def test_term_budget_caps_width_and_stays_sound(rng):
    """A tight term budget forces residual bounds; full probe stays exact
    and certificates remain sound."""
    docs = _rand_sparse(rng, 64, nnz=12)
    queries = _rand_sparse(rng, 6, nnz=4)
    ref = SparseImpactIndex(vocab_size=V)
    ref.add(docs)
    rs, ri = ref.search(queries, 5)

    idx = BlockMaxImpactIndex(vocab_size=V, block_docs=16, term_budget=24,
                              probe_blocks=100)
    idx.add(docs)
    s, i = idx.search(queries, 5)
    assert idx.block_term_width <= 24 + 7  # rounded up to multiple of 8
    assert idx.n_blocks == 4
    np.testing.assert_allclose(s, rs, rtol=1e-5)  # full probe: exact

    # partial probe with residual bounds: certified queries must be exact
    s2, i2 = idx.search(queries, 5, probe_blocks=2)
    for r in range(len(queries)):
        if idx.last_certified[r]:
            np.testing.assert_allclose(s2[r], rs[r], rtol=1e-5)


def test_impact_ordered_exact_when_uncapped(rng):
    from lightretriever_tpu.retriever.block_max import ImpactOrderedIndex

    docs = _rand_sparse(rng, 80)
    queries = _rand_sparse(rng, 6, nnz=4)
    ref = SparseImpactIndex(vocab_size=V)
    ref.add(docs)
    rs, ri = ref.search(queries, 10)

    idx = ImpactOrderedIndex(vocab_size=V, postings_cap=128)  # > any df
    idx.add(docs)
    s, i = idx.search(queries, 10)
    np.testing.assert_allclose(s, rs, rtol=1e-5)
    assert idx.capped_terms == 0
    assert idx.last_certified_frac == 1.0


def test_impact_ordered_capped_scores_never_truncated(rng):
    """Capping bounds which docs can be MISSED, never the score of a
    returned doc — the fix for the inverted engine's recall collapse."""
    from lightretriever_tpu.retriever.block_max import ImpactOrderedIndex

    docs = _rand_sparse(rng, 300, nnz=10)
    queries = _rand_sparse(rng, 8, nnz=5)
    idx = ImpactOrderedIndex(vocab_size=V, postings_cap=16)  # heavy capping
    idx.add(docs)
    s, i = idx.search(queries, 10)
    assert idx.capped_terms > 0
    dq = _dense(quantize_vecs(docs, 100))
    qm = _dense(queries)
    exact = qm @ dq.T
    for r in range(len(queries)):
        for rank in range(10):
            if i[r, rank] >= 0:
                np.testing.assert_allclose(
                    s[r, rank], exact[r, int(i[r, rank])], rtol=1e-5)
        if idx.last_certified[r]:
            want = np.sort(exact[r])[::-1][:10]
            np.testing.assert_allclose(s[r], want, rtol=1e-5)


def test_impact_ordered_query_term_cap_keeps_scores_exact(rng):
    """Queries with more terms than max_query_terms still get EXACT scores
    (rescoring uses the full dense query); only candidate generation and
    the certificate see the cap."""
    from lightretriever_tpu.retriever.block_max import ImpactOrderedIndex

    docs = _rand_sparse(rng, 60)
    queries = _rand_sparse(rng, 4, nnz=12)
    idx = ImpactOrderedIndex(vocab_size=V, postings_cap=128, max_query_terms=3)
    idx.add(docs)
    s, i = idx.search(queries, 5)
    dq = _dense(quantize_vecs(docs, 100))
    qm = _dense(queries)
    exact = qm @ dq.T
    for r in range(len(queries)):
        for rank in range(5):
            if i[r, rank] >= 0:
                np.testing.assert_allclose(
                    s[r, rank], exact[r, int(i[r, rank])], rtol=1e-5)


def test_empty_docs_and_queries(rng):
    docs = _rand_sparse(rng, 20) + [{}]
    idx = BlockMaxImpactIndex(vocab_size=V, block_docs=8, probe_blocks=3)
    idx.add(docs)
    s, i = idx.search([{}, {int(d): 1.0 for d in range(3)}], 5)
    assert s.shape == (2, 5)
    assert (i < len(docs)).all()


def test_impact_ordered_k_wider_than_candidates():
    """k > max_query_terms*cap must pad, not IndexError (review fix)."""
    rng = np.random.default_rng(0)
    vecs = [{int(t): float(w) for t, w in zip(
        rng.integers(0, 40, 4), rng.integers(1, 9, 4))} for _ in range(60)]
    idx = ImpactOrderedIndex(vocab_size=40, postings_cap=2, max_query_terms=2)
    idx.add(vecs, quantize=False)
    s, i = idx.search([{3: 1.0, 7: 2.0}], k=50)
    assert s.shape == (1, 50) and i.shape == (1, 50)
    assert (i[~np.isfinite(s)] == -1).all()
