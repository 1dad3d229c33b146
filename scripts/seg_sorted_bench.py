"""Does XLA-TPU's segment_sum actually exploit indices_are_sorted?

Measures masked segment-sum of [E, 512] into [N] nodes with the model's real
dst distribution (dense radius graph, dst-sorted) — sorted hint on vs off,
fwd and fwd+grad — plus the segment_softmax custom-VJP path.

Run: PYTHONPATH=/root/repo python scripts/seg_sorted_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    x = jnp.zeros(())
    _sync(x + 1)
    t0 = time.perf_counter()
    for _ in range(3):
        _sync(x + 1)
    rtt = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return max((time.perf_counter() - t0 - rtt) / n, 0.0) * 1000


def main():
    from equiformer_tpu.data import GraphLoader, qm9_like_dataset
    from equiformer_tpu.graph.radius_graph import radius_graph_dense
    from equiformer_tpu.graph.segment import segment_sum

    bs, slots = 128, 30
    N = bs * slots
    E = ((int(bs * 18 * 15.6 * 1.3) + 127) // 128) * 128
    data = qm9_like_dataset(bs, seed=0)
    b = next(iter(GraphLoader(data, bs, shuffle=False, dense_slots=slots)))
    b = jax.tree_util.tree_map(jnp.asarray, b)
    edges = jax.jit(lambda pos: radius_graph_dense(pos, b.node_mask, bs, 5.0, E))(b.pos)
    dst, mask = edges.dst, edges.mask
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (E, 512), jnp.bfloat16)

    for name, srt in (("unsorted", False), ("sorted  ", True)):
        f = jax.jit(lambda d: segment_sum(d, dst, N, mask=mask, sorted=srt))
        t1 = timeit(f, v)
        g = jax.jit(jax.grad(lambda d: jnp.sum(
            segment_sum(d, dst, N, mask=mask, sorted=srt).astype(jnp.float32) ** 2)))
        t2 = timeit(g, v)
        print(f"segsum {name}: fwd {t1:6.2f} ms   f+b {t2:6.2f} ms")

    from equiformer_tpu.kernels.segment_csr_pallas import csr_segment_sum

    for K in (128, 256, 512):
        f = jax.jit(lambda d: csr_segment_sum(d, dst, N, mask=mask, K=K))
        t1 = timeit(f, v)
        g = jax.jit(jax.grad(lambda d: jnp.sum(
            csr_segment_sum(d, dst, N, mask=mask, K=K).astype(jnp.float32) ** 2)))
        t2 = timeit(g, v)
        print(f"csr   K={K:4d}: fwd {t1:6.2f} ms   f+b {t2:6.2f} ms")

    # the attention-scatter width (value irreps per head x heads ~ 256) and
    # the narrow softmax-denominator width for completeness
    for C in (256, 64):
        vc = jax.random.normal(key, (E, C), jnp.bfloat16)
        f1 = jax.jit(lambda d: segment_sum(d, dst, N, mask=mask, sorted=True))
        f2 = jax.jit(lambda d: csr_segment_sum(d, dst, N, mask=mask, K=256))
        print(f"C={C:4d}: xla-sorted fwd {timeit(f1, vc):6.2f} ms   "
              f"csr fwd {timeit(f2, vc):6.2f} ms")


if __name__ == "__main__":
    main()
