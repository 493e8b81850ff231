"""HNSW graph index — host-native graph walk with the TPU facade.

Parity surface: the reference's HNSWFaissSearch / HNSWSQFaissSearch
(reference: src/lightretriever/retriever/faiss_search.py:385-476, built on
faiss.IndexHNSWFlat / IndexHNSWSQ at faiss_index.py:76-96). Design note: a
small-world graph walk is sequential pointer-chasing — the one retrieval
workload that does NOT belong on the MXU — so, exactly like Faiss, the walk
runs on the host CPU (from-scratch C++ engine, native/hnsw.cpp, ctypes ABI)
while the TPU engines in knn.py own the batched-throughput regime. The
measured recall/QPS trade-off between the two lives in PERFORMANCE.md's ANN
frontier; HNSW exists for the low-latency few-queries regime and for 1:1
index-family parity.

Parameter names follow the reference: ``hnsw_store_n`` (graph degree M),
``hnsw_ef_search``, ``hnsw_ef_construction``. The SQ variant stores int8
per-dim affine codes inside the graph engine (faiss QT_8bit analogue) and
optionally rescopes final scores against the fp32 rows it kept host-side.
"""
from __future__ import annotations

import ctypes
import logging
import time
from typing import Optional

import numpy as np

from ..native import get_hnsw_lib

logger = logging.getLogger(__name__)


class HNSWIndex:
    """Approximate inner-product search via a native HNSW graph.

    Same facade as knn.py engines: ``add`` host rows, ``search(q, k)`` ->
    (scores [Q,k] fp32 desc, ids [Q,k] int64, -1 pads). If the native
    toolchain is unavailable the index degrades to exact numpy search with a
    warning (capability preserved, approximation lost).
    """

    sq = False

    def __init__(
        self,
        mesh=None,                      # facade parity; host-side engine
        hnsw_store_n: int = 32,
        hnsw_ef_search: int = 128,
        hnsw_ef_construction: int = 200,
        seed: int = 0,
        **_,
    ):
        del mesh
        self.m = int(hnsw_store_n)
        self.ef_search = int(hnsw_ef_search)
        self.ef_construction = int(hnsw_ef_construction)
        self.seed = seed
        self._host_chunks: list[np.ndarray] = []
        self._n = 0
        self._loaded = False
        self._handle = None
        self._lib = None
        self._fallback: Optional[np.ndarray] = None
        self._dim: Optional[int] = None
        self.build_seconds: Optional[float] = None

    def __len__(self) -> int:
        return self._n

    def add(self, embeddings: np.ndarray) -> None:
        if self._loaded:
            # the loaded graph keeps no host rows to rebuild from; freeing
            # it here would silently drop every loaded document
            raise RuntimeError(
                "add() after load() is unsupported: rebuild the index from "
                "all rows instead")
        embeddings = np.ascontiguousarray(embeddings, np.float32)
        assert embeddings.ndim == 2
        self._host_chunks.append(embeddings)
        self._n += embeddings.shape[0]
        self._free()
        self._fallback = None  # numpy-fallback snapshot is stale too

    def _free(self) -> None:
        if self._handle is not None:
            self._lib.lr_hnsw_free(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - interpreter teardown
        try:
            self._free()
        except Exception:
            pass

    def _finalize(self) -> None:
        if self._handle is not None or self._fallback is not None:
            return
        assert self._host_chunks, "search/save on empty index (no add() calls)"
        emb = (np.concatenate(self._host_chunks, axis=0)
               if len(self._host_chunks) > 1 else self._host_chunks[0])
        self._dim = int(emb.shape[1])
        lib = get_hnsw_lib()
        if lib is None:
            logger.warning(
                "native HNSW unavailable; falling back to exact numpy search")
            self._fallback = emb
            return
        t0 = time.perf_counter()
        handle = lib.lr_hnsw_build(
            emb.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            emb.shape[0], emb.shape[1], self.m, self.ef_construction,
            1 if self.sq else 0, self.seed)
        if not handle:
            raise RuntimeError("HNSW build failed (bad dim/M?)")
        self.build_seconds = time.perf_counter() - t0
        self._lib = lib
        self._handle = ctypes.c_void_p(handle)
        if self.sq:
            self._fp_rows = emb  # exact rescoring source
        logger.info("HNSW built: n=%d M=%d efC=%d in %.1fs",
                    emb.shape[0], self.m, self.ef_construction,
                    self.build_seconds)

    def search(self, queries: np.ndarray, k: int, dim: Optional[int] = None,
               ef_search: Optional[int] = None,
               ) -> tuple[np.ndarray, np.ndarray]:
        if dim is not None:
            raise NotImplementedError(
                "MRL truncated search needs per-dim storage; use the flat/"
                "approx engines (knn.py) for MRL sweeps")
        self._finalize()
        q = np.ascontiguousarray(queries, np.float32)
        assert q.ndim == 2, "queries must be [Q, dim]"
        if getattr(self, "_dim", None) is not None and q.shape[1] != self._dim:
            raise ValueError(
                f"query dim {q.shape[1]} != index dim {self._dim} (the native "
                "walk strides by the built dim; a pre-truncated MRL query "
                "matrix cannot be searched here)")
        k_eff = min(k, self._n)
        if self._fallback is not None:
            scores = q @ self._fallback.T
            part = np.argpartition(-scores, k_eff - 1, axis=1)[:, :k_eff]
            sub = np.take_along_axis(scores, part, axis=1)
            order = np.argsort(-sub, axis=1)
            return (np.take_along_axis(sub, order, axis=1),
                    np.take_along_axis(part, order, axis=1).astype(np.int64))
        out_s = np.empty((q.shape[0], k_eff), np.float32)
        out_i = np.empty((q.shape[0], k_eff), np.int64)
        self._lib.lr_hnsw_search(
            self._handle, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            q.shape[0], k_eff, int(ef_search or self.ef_search),
            out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if self.sq and getattr(self, "_fp_rows", None) is not None:
            # exact fp32 rescoring of the quantized candidates (the reference
            # reranks SQ results the same way via its score floor)
            safe = np.where(out_i >= 0, out_i, 0)
            exact = np.einsum("qkd,qd->qk", self._fp_rows[safe], q)
            out_s = np.where(out_i >= 0, exact.astype(np.float32), -np.inf)
            order = np.argsort(-out_s, axis=1)
            out_s = np.take_along_axis(out_s, order, axis=1)
            out_i = np.take_along_axis(out_i, order, axis=1)
        return out_s, out_i

    # -- persistence (reference save/load parity, faiss_search.py:394-432) --
    def save(self, path: str) -> None:
        self._finalize()
        if self._fallback is not None:
            raise RuntimeError("cannot save: native HNSW unavailable")
        rc = self._lib.lr_hnsw_save(self._handle, path.encode())
        if rc != 0:
            raise IOError(f"HNSW save to {path} failed")

    @classmethod
    def load(cls, path: str, **kwargs) -> "HNSWIndex":
        lib = get_hnsw_lib()
        if lib is None:
            raise RuntimeError("native HNSW unavailable")
        handle = lib.lr_hnsw_load(path.encode())
        if not handle:
            raise IOError(f"HNSW load from {path} failed")
        idx = cls(**kwargs)
        idx._lib = lib
        idx._handle = ctypes.c_void_p(handle)
        idx._n = int(lib.lr_hnsw_size(idx._handle))
        idx._dim = int(lib.lr_hnsw_dim(idx._handle))
        idx._loaded = True
        return idx


class HNSWSQIndex(HNSWIndex):
    """HNSW over int8 scalar-quantized storage (HNSWSQFaissSearch parity:
    faiss_search.py:436-508, faiss QT_8bit). Graph walk scores decode the
    codes; final top-k is exactly rescored against retained fp32 rows."""

    sq = True

    def __init__(self, mesh=None, hnsw_store_n: int = 128, **kwargs):
        super().__init__(mesh=mesh, hnsw_store_n=hnsw_store_n, **kwargs)

    @classmethod
    def load(cls, path: str, **kwargs) -> "HNSWSQIndex":
        idx = super().load(path, **kwargs)
        idx._fp_rows = None  # codes only on disk; scores stay quantized
        return idx
