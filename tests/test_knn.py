"""Exact kNN engine tests: parity vs numpy brute force, sharded vs single."""
import numpy as np
import pytest

from lightretriever_tpu.retriever.knn import (
    BinaryIndex,
    FlatIPIndex,
    PCAIndex,
    SQIndex,
    merge_topk,
)


def _data(rng, n=100, d=32, q=7):
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    return corpus, queries


def _brute(queries, corpus, k):
    scores = queries @ corpus.T
    ids = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, ids, axis=1), ids


def test_merge_topk(rng):
    sa = rng.standard_normal((3, 5)).astype(np.float32)
    ia = rng.integers(0, 100, (3, 5)).astype(np.int64)
    sb = rng.standard_normal((3, 4)).astype(np.float32)
    ib = rng.integers(100, 200, (3, 4)).astype(np.int64)
    s, i = merge_topk(sa, ia, sb, ib, 6)
    all_s = np.concatenate([sa, sb], axis=1)
    want = -np.sort(-all_s, axis=1)[:, :6]
    np.testing.assert_allclose(s, want)
    assert (np.diff(s, axis=1) <= 0).all()


def test_flat_single_device_exact(rng):
    corpus, queries = _data(rng)
    idx = FlatIPIndex(mesh=None, dtype=np.float32)
    idx.add(corpus)
    s, i = idx.search(queries, 10)
    ws, wi = _brute(queries, corpus, 10)
    np.testing.assert_array_equal(i, wi)
    np.testing.assert_allclose(s, ws, rtol=1e-5)


def test_flat_sharded_matches_single(rng, mesh8):
    corpus, queries = _data(rng, n=103)  # non-divisible: exercises padding
    idx = FlatIPIndex(mesh=mesh8, dtype=np.float32)
    idx.add(corpus)
    s, i = idx.search(queries, 10)
    ws, wi = _brute(queries, corpus, 10)
    np.testing.assert_array_equal(i, wi)
    np.testing.assert_allclose(s, ws, rtol=1e-5)


def test_flat_k_larger_than_shard(rng, mesh8):
    corpus, queries = _data(rng, n=16, q=3)
    idx = FlatIPIndex(mesh=mesh8, dtype=np.float32)
    idx.add(corpus)
    s, i = idx.search(queries, 12)  # k > rows-per-shard (2)
    ws, wi = _brute(queries, corpus, 12)
    np.testing.assert_array_equal(i, wi)


def test_flat_streamed_matches_resident(rng, mesh8):
    corpus, queries = _data(rng, n=90)
    idx = FlatIPIndex(mesh=mesh8, dtype=np.float32)
    idx.add(corpus[:40])
    idx.add(corpus[40:])
    s1, i1 = idx.search(queries, 8)
    s2, i2 = idx.search_streamed(queries, 8, chunk_rows=32)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-5)


def test_mrl_dim_slice(rng):
    corpus, queries = _data(rng)
    idx = FlatIPIndex(mesh=None, dtype=np.float32)
    idx.add(corpus)
    # Raw truncated dot product
    s, i = idx.search(queries, 5, dim=8, renormalize=False)
    ws, wi = _brute(queries[:, :8], corpus[:, :8], 5)
    np.testing.assert_array_equal(i, wi)
    # Renormalized truncation == cosine over a rebuilt truncated index
    # (the reference's shrink-then-normalize, without re-indexing)
    s2, i2 = idx.search(queries, 5, dim=8, renormalize=True)
    qn = queries[:, :8] / np.linalg.norm(queries[:, :8], axis=1, keepdims=True)
    cn = corpus[:, :8] / np.linalg.norm(corpus[:, :8], axis=1, keepdims=True)
    ws2, wi2 = _brute(qn, cn, 5)
    np.testing.assert_array_equal(i2, wi2)
    np.testing.assert_allclose(s2, ws2, rtol=1e-4, atol=1e-5)


def test_sq_index_close_to_exact(rng):
    corpus, queries = _data(rng, n=60)
    idx = SQIndex(mesh=None)
    idx.add(corpus)
    s, i = idx.search(queries, 5)
    ws, wi = _brute(queries, corpus, 5)
    # int8 quantization: top-1 should almost always survive
    assert (i[:, 0] == wi[:, 0]).mean() >= 0.7
    np.testing.assert_allclose(s[:, 0], ws[:, 0], rtol=0.1, atol=0.5)


def test_binary_index_rerank_recovers_exact(rng):
    corpus, queries = _data(rng, n=60)
    idx = BinaryIndex(mesh=None)
    idx.add(corpus)
    s, i = idx.search(queries, 5, rerank=True, factor=6)
    ws, wi = _brute(queries, corpus, 5)
    # After fp rerank of a wide candidate set, top-1 usually matches
    assert (i[:, 0] == wi[:, 0]).mean() >= 0.7


def test_pca_index(rng):
    corpus, queries = _data(rng, n=80, d=32)
    idx = PCAIndex(out_dim=16, mesh=None, dtype=np.float32)
    idx.add(corpus)
    s, i = idx.search(queries, 5)
    assert s.shape == (7, 5)
    assert (i >= 0).all() and (i < 80).all()


def test_empty_and_padding_ids(rng, mesh8):
    corpus, queries = _data(rng, n=3, q=2)
    idx = FlatIPIndex(mesh=mesh8, dtype=np.float32)
    idx.add(corpus)
    s, i = idx.search(queries, 3)
    assert (i < 3).all() and (i >= 0).all()


def test_approx_topk_mode(rng):
    corpus, queries = _data(rng, n=200)
    idx = FlatIPIndex(mesh=None, dtype=np.float32, topk_method="approx",
                      recall_target=0.95)
    idx.add(corpus)
    s, i = idx.search(queries, 10)
    ws, wi = _brute(queries, corpus, 10)
    # High recall vs exact
    recall = np.mean([len(set(i[r]) & set(wi[r])) / 10 for r in range(len(i))])
    assert recall >= 0.9


def test_ivf_index_recall(rng):
    from lightretriever_tpu.retriever.ann import IVFIndex, kmeans
    import jax.numpy as jnp

    corpus, queries = _data(rng, n=600, d=32, q=10)
    idx = IVFIndex(n_clusters=16, nprobe=16, dtype=np.float32, query_chunk=4)
    idx.add(corpus[:300])
    idx.add(corpus[300:])
    s, i = idx.search(queries, 10)  # nprobe == n_clusters -> exact
    ws, wi = _brute(queries, corpus, 10)
    np.testing.assert_array_equal(i, wi)
    np.testing.assert_allclose(s, ws, rtol=1e-4)
    # Pruned probes: high recall, much less work
    s2, i2 = idx.search(queries, 10, nprobe=6)
    recall = np.mean([len(set(i2[r]) & set(wi[r])) / 10 for r in range(10)])
    assert recall >= 0.6

    cents = kmeans(jnp.asarray(corpus), 8, n_iters=5)
    assert cents.shape == (8, 32)


def test_pq_index_recall(rng):
    from lightretriever_tpu.retriever.ann import PQIndex

    corpus, queries = _data(rng, n=400, d=32, q=8)
    idx = PQIndex(n_subspaces=8, n_codes=32, chunk_docs=128)
    idx.add(corpus[:200])
    idx.add(corpus[200:])
    # With fp rerank the top-1 should almost always match exact
    s, i = idx.search(queries, 5, rerank_with_fp=True, factor=8)
    ws, wi = _brute(queries, corpus, 5)
    assert (i[:, 0] == wi[:, 0]).mean() >= 0.7
    # Pure ADC (no rerank): reasonable recall, 8 bytes/doc memory
    s2, i2 = idx.search(queries, 10, rerank_with_fp=False)
    recall = np.mean([len(set(i2[r]) & set(wi[r, :5])) / 5 for r in range(8)])
    assert recall >= 0.5
    assert idx._codes.nbytes == 400 * 8  # M bytes per doc


def test_exact_scan_path_with_chunking(rng, monkeypatch):
    # Force the scan path to take multiple chunks + a tail remainder
    from lightretriever_tpu.retriever import knn as knn_mod

    monkeypatch.setattr(knn_mod, "_EXACT_CHUNK_ROWS", 37)
    corpus, queries = _data(rng, n=150)  # 4 chunks of 37 + tail of 2
    idx = FlatIPIndex(mesh=None, dtype=np.float32)
    idx.add(corpus)
    s, i = idx.search(queries, 10)
    ws, wi = _brute(queries, corpus, 10)
    np.testing.assert_array_equal(i, wi)
    np.testing.assert_allclose(s, ws, rtol=1e-5)


def test_approx_oversample_and_return_device(rng):
    import jax

    corpus, queries = _data(rng, n=256, q=9)
    idx = FlatIPIndex(mesh=None, dtype=np.float32, topk_method="approx",
                      recall_target=0.95, oversample=2)
    idx.add(corpus)
    s_dev, i_dev = idx.search(queries, 10, return_device=True)
    assert isinstance(s_dev, jax.Array) and s_dev.shape == (9, 10)
    s, i = idx.search(queries, 10)
    ws, wi = _brute(queries, corpus, 10)
    # oversampled approx on a small corpus: expect near-perfect recall
    rec = np.mean([len(np.intersect1d(a, b)) / 10 for a, b in zip(i, wi)])
    assert rec >= 0.9, rec
    np.testing.assert_array_equal(np.asarray(i_dev), i)


def test_sharded_approx_matches_single_approx_recall(rng, mesh8):
    corpus, queries = _data(rng, n=512, q=9)
    idx = FlatIPIndex(mesh=mesh8, dtype=np.float32, topk_method="approx",
                      recall_target=0.99, oversample=2)
    idx.add(corpus)
    s, i = idx.search(queries, 10)
    ws, wi = _brute(queries, corpus, 10)
    rec = np.mean([len(np.intersect1d(a, b)) / 10 for a, b in zip(i, wi)])
    assert rec >= 0.9, rec
    assert (np.diff(s, axis=1) <= 1e-6).all()  # sorted descending
