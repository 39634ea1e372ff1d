"""Benchmark: README-parity convergence + SpMV throughput on one chip.

Prints ONE JSON line:
  metric      -- matvecs to converge the README config (100x100 1-D
                 Laplacian, nev=10, :SR, tol=1e-6); reference needs 174
                 (BASELINE.md), hardware-independent.
  vs_baseline -- 174 / our matvecs (1.0 = parity, higher = better).
  extra keys  -- steady-state solve wall-clock, Schur residual, SpMV
                 nnz/s on 1M-row and 16M-row 2-D Laplacians (north-star,
                 BASELINE.json).

The TPU here sits behind a remote compile service whose latency is
bimodal (seconds to tens of minutes for identical programs), so each
phase runs in a subprocess with a hard timeout and the JSON line is
emitted no matter what; timed-out phases report null.
"""

import json
import os
import subprocess
import sys
import time

PHASE_TIMEOUT_S = int(os.environ.get("BENCH_PHASE_TIMEOUT_S", "1500"))


def _jax():
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return jax


def readme_parity():
    jax = _jax()
    import numpy as np

    from arnoldimethod_tpu import partial_schur
    from arnoldimethod_tpu.models.problems import laplacian_1d

    op = laplacian_1d(100, dtype=np.float32)
    t0 = time.perf_counter()
    decomp, history = partial_schur(op, nev=10, which="SR", tol=1e-6)
    np.asarray(decomp.Q)  # readback = true fence on this platform
    wall = time.perf_counter() - t0

    # Second run: every device program is compiled, so this is the
    # steady-state solve time (the first is compile-dominated).
    t0 = time.perf_counter()
    decomp, history = partial_schur(op, nev=10, which="SR", tol=1e-6)
    np.asarray(decomp.Q)
    warm_wall = time.perf_counter() - t0

    A = (
        np.diag(np.full(100, 2.0))
        + np.diag(np.full(99, -1.0), 1)
        + np.diag(np.full(99, -1.0), -1)
    )
    Q = np.asarray(decomp.Q, dtype=np.float64)
    R = np.asarray(decomp.R)
    resid = float(np.linalg.norm(A @ Q - Q @ R))
    return {
        "value": history.mvproducts,
        "converged": bool(history.converged),
        "nconverged": history.nconverged,
        "schur_residual": resid,
        "readme_wall_s": round(wall, 3),
        "readme_wall_warm_s": round(warm_wall, 3),
    }


def spmv(grid, iters):
    jax = _jax()
    import jax.numpy as jnp

    from arnoldimethod_tpu.models.operators import Stencil5Operator

    # 0.130-scaled 2-D Laplacian: spectral radius ~1, so the iterated
    # vector stays finite across `iters` back-to-back matvecs, and each
    # iteration is exactly one SpMV (the scale lives in A's coefficients).
    s = 0.130
    op = Stencil5Operator(
        tuple(s * c for c in (4.0, -1.0, -1.0, -1.0, -1.0)),
        (grid, grid),
        dtype=jnp.float32,
    )
    n = op.shape[0]
    nnz = op.nnz
    x = jnp.ones(n, dtype=jnp.float32)

    @jax.jit
    def run(y, steps):
        return jax.lax.fori_loop(0, steps, lambda i, y: op.matvec(y), y)

    # NOTE: on this platform block_until_ready does not reliably fence the
    # async stream — a scalar readback does.  First rep absorbs stragglers
    # and is discarded.
    _ = float(run(x, 2)[0])  # warm-up / compile
    reps = []
    for r in range(3):
        t0 = time.perf_counter()
        y = run(x * (1.0 + 0.001 * r), iters)
        _ = float(y[0])
        reps.append((time.perf_counter() - t0) / iters)
    dt = min(reps[1:])
    key = "spmv" if grid == 1024 else f"spmv_{grid}"
    return {
        f"{key}_gnnz_per_s": round(nnz / dt / 1e9, 3),
        f"{key}_us_per_iter": round(dt * 1e6, 2),
        f"{key}_nnz": nnz,
    }


PHASES = {
    "readme": readme_parity,
    "spmv1m": lambda: spmv(1024, 1000),
}


def _run_phase_subprocess(name):
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", name],
            capture_output=True,
            text=True,
            timeout=PHASE_TIMEOUT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {f"{name}_error": (out.stderr or "no output")[-300:]}
    except subprocess.TimeoutExpired:
        return {f"{name}_timeout_s": PHASE_TIMEOUT_S}


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        print(json.dumps(PHASES[sys.argv[2]]()))
        return

    results = {}
    for name in ("readme", "spmv1m"):
        results.update(_run_phase_subprocess(name))

    matvecs = results.get("value")
    out = {
        "metric": "matvecs_readme_laplacian100_nev10_sr_tol1e-6",
        "value": matvecs,
        "unit": "matvecs",
        "vs_baseline": round(174.0 / matvecs, 4) if matvecs else None,
    }
    out.update({k: v for k, v in results.items() if k != "value"})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
