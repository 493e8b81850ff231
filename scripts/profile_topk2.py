"""Round 2 of the top-k sweep: recall-QPS frontier refinement (VERDICT #4).

Focus: approx_max_k recall_target sweep + candidate oversampling (approx
k*m then exact top-k over the m*K candidates), scan chunk-size tuning for
the exact path, and small-batch serving latency.
"""
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

N, D, Q, K = 500_000, 1024, 2048, 100


def bench(fn, *args, n_iter=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.tree.map(lambda x: float(x[0, 0]), r)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        r = fn(*args)
    jax.tree.map(lambda x: float(x[0, 0]), r)
    return (time.perf_counter() - t0) / n_iter


def recall_vs(i_true, ids):
    ids = np.asarray(ids)
    return float(np.mean([len(np.intersect1d(a, b)) / K
                          for a, b in zip(ids, i_true)]))


def main():
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, D), dtype=np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    queries = rng.standard_normal((Q, D), dtype=np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    c = jnp.asarray(corpus, jnp.bfloat16)
    q = jnp.asarray(queries, jnp.bfloat16)

    def mm(q, c):
        return jax.lax.dot_general(q, c, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    i_true = np.asarray(jax.jit(lambda q, c: jax.lax.top_k(mm(q, c), K))(q, c)[1])

    def report(name, t, extra=""):
        print(f"{name:30s} {t*1e3:8.2f} ms   {Q/t:9.0f} QPS   {extra}", flush=True)

    # recall_target sweep
    for rt in (0.999, 0.9999):
        f = jax.jit(lambda q, c, rt=rt: jax.lax.approx_max_k(
            mm(q, c), K, recall_target=rt))
        t = bench(f, q, c)
        _, ia = f(q, c)
        report(f"approx rt={rt}", t, f"recall={recall_vs(i_true, ia):.5f}")

    # oversample: approx k*m candidates, exact top-K over them
    for m, rt in ((2, 0.99), (4, 0.99), (2, 0.95), (4, 0.95), (8, 0.95)):
        @jax.jit
        def f(q, c, m=m, rt=rt):
            s, i = jax.lax.approx_max_k(mm(q, c), K * m, recall_target=rt)
            s2, sel = jax.lax.top_k(s, K)
            return s2, jnp.take_along_axis(i, sel, axis=1)
        t = bench(f, q, c)
        _, ia = f(q, c)
        report(f"approx k*{m} rt={rt}", t, f"recall={recall_vs(i_true, ia):.5f}")

    # exact scan chunk-size sweep
    for CH in (62500, 125000, 250000):
        nch = N // CH
        assert nch * CH == N
        c3 = jnp.asarray(corpus.reshape(nch, CH, D), jnp.bfloat16)

        @jax.jit
        def scanned(q, c3, CH=CH, nch=nch):
            def step(carry, xs):
                cs, ci = carry
                chunk, off = xs
                s1, i1 = jax.lax.top_k(mm(q, chunk), K)
                cat_s = jnp.concatenate([cs, s1], axis=1)
                cat_i = jnp.concatenate([ci, i1 + off], axis=1)
                s2, sel = jax.lax.top_k(cat_s, K)
                return (s2, jnp.take_along_axis(cat_i, sel, axis=1)), None
            init = (jnp.full((Q, K), -jnp.inf, jnp.float32),
                    jnp.zeros((Q, K), jnp.int32))
            offs = jnp.arange(nch, dtype=jnp.int32) * CH
            (s, i), _ = jax.lax.scan(step, init, (c3, offs))
            return s, i

        t = bench(scanned, q, c3, n_iter=4)
        _, isc = scanned(q, c3)
        report(f"scan CH={CH}", t, f"recall={recall_vs(i_true, isc):.5f} (exact)")
        del c3

    # exact scan with per-chunk approx oversample (k*4 rt .99 per chunk)
    CH, nch = 125000, 4
    c3 = jnp.asarray(corpus.reshape(nch, CH, D), jnp.bfloat16)

    @jax.jit
    def scan_ap(q, c3):
        def step(carry, xs):
            cs, ci = carry
            chunk, off = xs
            s1, i1 = jax.lax.approx_max_k(mm(q, chunk), K, recall_target=0.999)
            cat_s = jnp.concatenate([cs, s1], axis=1)
            cat_i = jnp.concatenate([ci, i1 + off], axis=1)
            s2, sel = jax.lax.top_k(cat_s, K)
            return (s2, jnp.take_along_axis(cat_i, sel, axis=1)), None
        init = (jnp.full((Q, K), -jnp.inf, jnp.float32),
                jnp.zeros((Q, K), jnp.int32))
        offs = jnp.arange(nch, dtype=jnp.int32) * CH
        (s, i), _ = jax.lax.scan(step, init, (c3, offs))
        return s, i

    t = bench(scan_ap, q, c3, n_iter=6)
    _, isc = scan_ap(q, c3)
    report("scan+approx.999 CH=125k", t, f"recall={recall_vs(i_true, isc):.5f}")
    del c3

    # serving-size batches: latency at small Q (approx rt=0.99)
    for qn in (256, 64):
        qq = q[:qn]
        f = jax.jit(lambda qq, c: jax.lax.approx_max_k(
            mm(qq, c), K, recall_target=0.99))
        t = bench(f, qq, c)
        print(f"approx rt=0.99 Q={qn:5d}          {t*1e3:8.2f} ms   "
              f"{qn/t:9.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
