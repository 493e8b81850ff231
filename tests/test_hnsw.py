"""Native HNSW graph engine: recall vs brute force, SQ variant, save/load.

Parity surface: HNSWFaissSearch / HNSWSQFaissSearch
(reference: src/lightretriever/retriever/faiss_search.py:385-508)."""
import numpy as np
import pytest

from lightretriever_tpu.native import get_hnsw_lib
from lightretriever_tpu.retriever.hnsw import HNSWIndex, HNSWSQIndex

pytestmark = pytest.mark.skipif(
    get_hnsw_lib() is None, reason="native toolchain unavailable")


def _clustered(rng, n=3000, d=48, q=64):
    """Clustered unit vectors — the geometry HNSW is built for."""
    centers = rng.standard_normal((64, d)).astype(np.float32)
    corpus = centers[rng.integers(0, 64, n)] + \
        0.35 * rng.standard_normal((n, d)).astype(np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = centers[rng.integers(0, 64, q)] + \
        0.35 * rng.standard_normal((q, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return corpus, queries


def _brute_ids(queries, corpus, k):
    scores = queries @ corpus.T
    return np.argsort(-scores, axis=1)[:, :k]


def _recall(ids, want):
    return np.mean([
        len(np.intersect1d(a[a >= 0], b)) / len(b) for a, b in zip(ids, want)])


@pytest.fixture(scope="module")
def data():
    return _clustered(np.random.default_rng(0))


def test_hnsw_recall(data):
    corpus, queries = data
    idx = HNSWIndex(hnsw_store_n=16, hnsw_ef_construction=100,
                    hnsw_ef_search=64)
    idx.add(corpus)
    s, i = idx.search(queries, 10)
    assert s.shape == (len(queries), 10) and i.shape == s.shape
    assert (np.diff(s, axis=1) <= 1e-6).all()  # descending
    want = _brute_ids(queries, corpus, 10)
    assert _recall(i, want) >= 0.95
    # scores are exact IP of the returned ids
    np.testing.assert_allclose(
        s[0], queries[0] @ corpus[i[0]].T, rtol=1e-5, atol=1e-5)


def test_hnsw_ef_search_tradeoff(data):
    corpus, queries = data
    idx = HNSWIndex(hnsw_store_n=8, hnsw_ef_construction=60)
    idx.add(corpus)
    want = _brute_ids(queries, corpus, 10)
    _, i_lo = idx.search(queries, 10, ef_search=10)
    _, i_hi = idx.search(queries, 10, ef_search=200)
    assert _recall(i_hi, want) >= _recall(i_lo, want)
    assert _recall(i_hi, want) >= 0.9


def test_hnsw_sq_recall(data):
    corpus, queries = data
    idx = HNSWSQIndex(hnsw_store_n=16, hnsw_ef_construction=100,
                      hnsw_ef_search=64)
    idx.add(corpus)
    s, i = idx.search(queries, 10)
    want = _brute_ids(queries, corpus, 10)
    assert _recall(i, want) >= 0.9
    # rescored scores are exact fp32 IP
    valid = i[0] >= 0
    np.testing.assert_allclose(
        s[0][valid], queries[0] @ corpus[i[0][valid]].T, rtol=1e-5, atol=1e-5)


def test_hnsw_save_load(tmp_path, data):
    corpus, queries = data
    idx = HNSWIndex(hnsw_store_n=16, hnsw_ef_construction=100)
    idx.add(corpus)
    s0, i0 = idx.search(queries, 5)
    path = str(tmp_path / "graph.hnsw")
    idx.save(path)
    idx2 = HNSWIndex.load(path, hnsw_ef_search=128)
    assert len(idx2) == len(corpus)
    s1, i1 = idx2.search(queries, 5)
    np.testing.assert_array_equal(i0, i1)
    np.testing.assert_allclose(s0, s1, rtol=1e-6)


def test_hnsw_small_corpus_and_k_clamp():
    rng = np.random.default_rng(1)
    corpus = rng.standard_normal((7, 16)).astype(np.float32)
    queries = rng.standard_normal((3, 16)).astype(np.float32)
    idx = HNSWIndex(hnsw_store_n=4)
    idx.add(corpus)
    s, i = idx.search(queries, 20)       # k > n clamps to n
    assert i.shape == (3, 7)
    want = _brute_ids(queries, corpus, 7)
    np.testing.assert_array_equal(np.sort(i, axis=1), np.sort(want, axis=1))


def test_hnsw_registry():
    from lightretriever_tpu.retriever.knn import INDEX_REGISTRY

    idx = INDEX_REGISTRY["hnsw"](mesh=None, hnsw_store_n=8)
    assert isinstance(idx, HNSWIndex)
    idx = INDEX_REGISTRY["hnsw_sq"](mesh=None)
    assert isinstance(idx, HNSWSQIndex)


def test_hnsw_mrl_dim_raises(data):
    corpus, queries = data
    idx = HNSWIndex()
    idx.add(corpus[:100])
    with pytest.raises(NotImplementedError):
        idx.search(queries, 5, dim=16)


def test_hnsw_add_after_load_raises(tmp_path):
    """add() after load() must error, not silently drop loaded docs."""
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((50, 8)).astype(np.float32)
    idx = HNSWIndex(hnsw_store_n=8)
    idx.add(corpus)
    path = str(tmp_path / "g.hnsw")
    idx.save(path)
    loaded = HNSWIndex.load(path)
    assert len(loaded) == 50
    with pytest.raises(RuntimeError, match="load"):
        loaded.add(corpus[:5])


def test_hnsw_load_rejects_corrupt_file(tmp_path):
    """Corrupt header must fail cleanly (IOError), not crash the process."""
    import struct

    path = str(tmp_path / "bad.hnsw")
    with open(path, "wb") as f:
        f.write(b"LRHNSW01")
        # dim=-3, M=2, efC=10, n=2**29, max_level=999, entry=7 -> rejected
        f.write(struct.pack("<6i", -3, 2, 10, 1 << 29, 999, 7))
        f.write(struct.pack("<i", 0))
    with pytest.raises(IOError):
        HNSWIndex.load(path)


def test_hnsw_load_rejects_corrupt_graph_contents(tmp_path):
    """A header-valid file with out-of-range link ids / row offsets must be
    rejected at load — a bit-flipped graph would otherwise read/write out of
    bounds at search time (visited[huge_id])."""
    rng = np.random.default_rng(5)
    emb = rng.standard_normal((60, 16)).astype(np.float32)
    idx = HNSWIndex(hnsw_store_n=8)
    idx.add(emb)
    path = str(tmp_path / "good.hnsw")
    idx.save(path)
    raw = bytearray(open(path, "rb").read())

    # truncated file -> load fails
    trunc = str(tmp_path / "trunc.hnsw")
    open(trunc, "wb").write(bytes(raw[: len(raw) // 2]))
    with pytest.raises(IOError):
        HNSWIndex.load(trunc)

    # the file ends with the last layer's rows[] table: blast the final
    # offset to a huge value -> content validation fails
    import struct

    bad = str(tmp_path / "bad_rows.hnsw")
    raw2 = bytearray(raw)
    raw2[-4:] = struct.pack("<i", 2**30)
    open(bad, "wb").write(bytes(raw2))
    with pytest.raises(IOError):
        HNSWIndex.load(bad)

    # query-dim mismatch after a good load -> clear ValueError, no native OOB
    loaded = HNSWIndex.load(path)
    with pytest.raises(ValueError, match="dim"):
        loaded.search(rng.standard_normal((2, 8)).astype(np.float32), 3)
