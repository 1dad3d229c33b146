"""Measure the chip's achievable rates for the three resources the DTP
kernels spend: HBM bandwidth, VPU elementwise FMA rate, MXU bf16 matmul rate.

These anchor the roofline in PERF_ANALYSIS.md (scripts/roofline.py computes
the per-step resource totals; this measures the denominators on the real
chip rather than trusting published peaks).

Run: PYTHONPATH=. python scripts/chip_peaks.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(fn, *args, n=20, warmup=3):
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
    return max((time.perf_counter() - t0 - rtt) / n, 1e-9)


def bench_hbm():
    for mb in (256, 512):
        x = jnp.ones((mb * 2**20 // 2,), jnp.bfloat16)
        f = jax.jit(lambda a: a * 1.0001 + 1.0)
        dt = timeit(f, x)
        bw = 2 * x.size * 2 / dt / 1e9  # read + write, bf16
        print(f"HBM stream {mb}MB bf16 (r+w): {bw:7.1f} GB/s")


def _vpu_kernel(K, x_ref, o_ref):
    def body(_, acc):
        return acc * 1.000001 + 0.5  # 1 FMA per element per iter

    o_ref[:] = lax.fori_loop(0, K, body, x_ref[:])


def bench_vpu(dtype, T=512, K=512, grid=64):
    x = jnp.ones((grid * T, 128), dtype)
    f = jax.jit(
        pl.pallas_call(
            functools.partial(_vpu_kernel, K),
            out_shape=jax.ShapeDtypeStruct((grid * T, 128), dtype),
            grid=(grid,),
            in_specs=[pl.BlockSpec((T, 128), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((T, 128), lambda i: (i, 0)),
        )
    )
    dt = timeit(f, x)
    rate = 2 * K * grid * T * 128 / dt / 1e12
    print(f"VPU fma {np.dtype(dtype).name:8s} [{T}x128]xK{K}: {rate:6.2f} TFLOP/s")
    return rate


def bench_vpu_wide(dtype, T=256, W=1024, K=64, grid=64):
    """Wider rows (more like the kernels' [T, lanes] slices)."""
    x = jnp.ones((grid * T, W), dtype)
    f = jax.jit(
        pl.pallas_call(
            functools.partial(_vpu_kernel, K),
            out_shape=jax.ShapeDtypeStruct((grid * T, W), dtype),
            grid=(grid,),
            in_specs=[pl.BlockSpec((T, W), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((T, W), lambda i: (i, 0)),
        )
    )
    dt = timeit(f, x)
    rate = 2 * K * grid * T * W / dt / 1e12
    print(f"VPU fma {np.dtype(dtype).name:8s} [{T}x{W}]xK{K}:  {rate:6.2f} TFLOP/s")
    return rate


def bench_mxu():
    for n in (4096, 8192):
        a = jnp.ones((n, n), jnp.bfloat16)
        f = jax.jit(lambda a: a @ a)
        dt = timeit(f, a, n=10)
        rate = 2 * n**3 / dt / 1e12
        print(f"MXU bf16 {n}x{n}@{n}: {rate:7.1f} TFLOP/s")


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    bench_mxu()
    bench_hbm()
    for dt in (jnp.float32, jnp.bfloat16):
        bench_vpu(dt)
        bench_vpu_wide(dt)


if __name__ == "__main__":
    main()
