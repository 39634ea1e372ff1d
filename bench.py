"""Benchmark: README-parity convergence + SpMV throughput on one chip.

Prints ONE JSON line:
  metric      -- matvecs to converge the README config (100x100 1-D
                 Laplacian, nev=10, :SR, tol=1e-6); reference needs 174
                 (BASELINE.md), hardware-independent.
  vs_baseline -- 174 / our matvecs (1.0 = parity, higher = better).
  extra keys  -- spmv_nnz_per_s on a 1M-row 2-D Laplacian (north-star,
                 BASELINE.json), residual, wall-clock.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compilation cache: the solver compiles a handful of small
# executables whose (re)compilation through a remote TPU tunnel would
# otherwise dominate wall-clock.
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def readme_parity():
    from arnoldimethod_tpu import partial_schur
    from arnoldimethod_tpu.models.problems import laplacian_1d

    op = laplacian_1d(100, dtype=np.float32)
    t0 = time.perf_counter()
    decomp, history = partial_schur(op, nev=10, which="SR", tol=1e-6)
    jax.block_until_ready(decomp.Q)
    wall = time.perf_counter() - t0

    # Second run: every device program is already compiled, so this is the
    # steady-state solve time (the first run is compile-dominated when the
    # TPU sits behind a remote compile service).
    t0 = time.perf_counter()
    decomp, history = partial_schur(op, nev=10, which="SR", tol=1e-6)
    jax.block_until_ready(decomp.Q)
    warm_wall = time.perf_counter() - t0

    # Residual check on host.
    A = (
        np.diag(np.full(100, 2.0))
        + np.diag(np.full(99, -1.0), 1)
        + np.diag(np.full(99, -1.0), -1)
    )
    Q = np.asarray(decomp.Q, dtype=np.float64)
    R = np.asarray(decomp.R)
    resid = float(np.linalg.norm(A @ Q - Q @ R))
    return history, wall, warm_wall, resid


def spmv_throughput(grid=1024, iters=50):
    from arnoldimethod_tpu.models.problems import laplacian_2d

    # Stencil format: Pallas halo-DMA kernel on TPU (~160 GNNZ/s/chip),
    # fused-XLA shifts elsewhere.
    op = laplacian_2d(grid, grid, dtype=jnp.float32, fmt="stencil")
    n = op.shape[0]
    nnz = op.nnz

    x = jnp.ones(n, dtype=jnp.float32)

    # One fused device loop: per-call dispatch latency (significant through
    # a remote TPU tunnel) must not pollute the kernel throughput number.
    # Best of three repetitions (the tunneled runtime is noisy).
    @jax.jit
    def run(y, steps):
        return jax.lax.fori_loop(0, steps, lambda i, y: op.matvec(y) * 0.125, y)

    y = run(x, 2)
    jax.block_until_ready(y)  # warm-up / compile

    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(x, iters)
        jax.block_until_ready(y)
        dt = min(dt, (time.perf_counter() - t0) / iters)
    return nnz / dt, nnz, dt


def main():
    history, wall, warm_wall, resid = readme_parity()
    # 1M rows (the BASELINE config; fits on-chip in VMEM at this size) and
    # 16M rows (HBM-streaming regime).
    nnz_per_s, nnz, spmv_dt = spmv_throughput(1024, 50)
    nnz_per_s_l, nnz_l, spmv_dt_l = spmv_throughput(4096, 20)

    out = {
        "metric": "matvecs_readme_laplacian100_nev10_sr_tol1e-6",
        "value": history.mvproducts,
        "unit": "matvecs",
        "vs_baseline": round(174.0 / max(1, history.mvproducts), 4),
        "converged": bool(history.converged),
        "nconverged": history.nconverged,
        "schur_residual": resid,
        "readme_wall_s": round(wall, 3),
        "readme_wall_warm_s": round(warm_wall, 3),
        "spmv_nnz_per_s": round(nnz_per_s / 1e9, 4) * 1e9,
        "spmv_gnnz_per_s": round(nnz_per_s / 1e9, 4),
        "spmv_us_per_iter": round(spmv_dt * 1e6, 2),
        "spmv_nnz": nnz,
        "spmv16M_gnnz_per_s": round(nnz_per_s_l / 1e9, 4),
        "spmv16M_us_per_iter": round(spmv_dt_l * 1e6, 2),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
