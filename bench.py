"""Benchmark: README-parity convergence, SpMV roofline, and the
BASELINE.json north-star configs, on one TPU chip.

Prints ONE JSON line:
  metric      -- matvecs to converge the README config (100x100 1-D
                 Laplacian, nev=10, :SR, tol=1e-6); reference needs 174
                 (BASELINE.md), hardware-independent.
  vs_baseline -- 174 / our matvecs (1.0 = parity, higher = better).
  extra keys  -- per-phase measurements:
    readme_*      solve wall cold/warm + host/device latency breakdown
    spmv_*        Pallas 5-point stencil nnz/s on 1M rows
    spmv_16m_*    same on 16M rows (4096x4096 grid)
    roofline_*    HBM memcpy bandwidth, XLA / halo-DMA / sliding-window
                  stencil nnz/s, and the best fraction of memcpy
    e2e1m_*       config 2: 1M-row 2-D Laplacian, nev=20 smallest
                  (host, fused-device, and Chebyshev-filtered variants)
    e2e10m_*      NORTH STAR: nev=100 of the 10.24M-row Laplacian
    e2e16m_*      largest n: nev=20 of the 16.8M-row Laplacian
    conv_*        config 3: convection-diffusion :LM, extended=True
    shiftinv_*    config 4: n=6000 tridiagonal shift-invert solve
    complexsc_*   complex matrix / :LI target via split-complex on chip
    spmv_csr_*    irregular sparsity: gather roofline + SELL + block SpMM
    bsr_*         BSR Pallas kernel nnz/s + effective GB/s vs einsum
    kernels_*     compiled (non-interpret) Pallas vs XLA equality on-device

The TPU sits behind a remote compile service whose latency is bimodal
(seconds to tens of minutes for identical programs), so each phase runs
in a subprocess with a hard timeout, the cumulative JSON line is
re-printed after EVERY phase (so a harness kill at any point still
leaves the last complete line on stdout — the driver keeps the tail),
and a global BENCH_TOTAL_BUDGET_S deadline marks remaining phases
skipped and exits 0 instead of letting the run be killed from outside.
"""

import json
import os
import subprocess
import sys
import time

# 600 s per phase bounds any one slow-compile straggler; the global
# budget bounds the whole run against the harness's own timeout.
PHASE_TIMEOUT_S = int(os.environ.get("BENCH_PHASE_TIMEOUT_S", "600"))
# The north-star phase retries once on RESOURCE_EXHAUSTED (sleep +
# degraded config) and the readme phase carries the PRIMARY parity
# metric — both get headroom beyond the default (the tunnel's slow
# latency mode can stretch the readme phase's compile chain past 600 s;
# measured 205 s in the fast mode).
PHASE_TIMEOUT_OVERRIDES_S = {"e2e10m": 900, "readme": 900}
TOTAL_BUDGET_S = int(os.environ.get("BENCH_TOTAL_BUDGET_S", "3300"))


def _jax():
    import jax

    os.makedirs("/tmp/jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return jax


def _fence(x):
    """Scalar readback = reliable fence on this platform (block_until_ready
    does not reliably fence the async stream here).  Index on device first
    so only the scalar crosses the tunnel."""
    return float(x.ravel()[0] if hasattr(x, "ravel") else x)


def readme_parity():
    _jax()
    import numpy as np

    from arnoldimethod_tpu import partial_schur
    from arnoldimethod_tpu.models.problems import laplacian_1d

    op = laplacian_1d(100, dtype=np.float32)
    t0 = time.perf_counter()
    decomp, history = partial_schur(op, nev=10, which="SR", tol=1e-6)
    np.asarray(decomp.Q)  # readback = true fence on this platform
    wall = time.perf_counter() - t0

    # Warm runs: every device program is compiled, so these are the
    # steady-state solve times (the first is compile-dominated).  On TPU
    # this takes the fused on-device path (method auto -> "device").
    warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        decomp, history = partial_schur(op, nev=10, which="SR", tol=1e-6)
        np.asarray(decomp.Q)
        warms.append(time.perf_counter() - t0)
    warm_wall, warm_med = _min_med(warms)

    # Host-dense path for comparison: one round trip per restart.
    partial_schur(op, nev=10, which="SR", tol=1e-6, method="host")
    warms_h = []
    for _ in range(3):
        t0 = time.perf_counter()
        decomp_host, history_host = partial_schur(
            op, nev=10, which="SR", tol=1e-6, method="host"
        )
        # Fence THIS solve's result: reading the stale device-path decomp
        # would be a no-op and leak trailing async work into the timing.
        np.asarray(decomp_host.Q)
        warms_h.append(time.perf_counter() - t0)
    warm_wall_host, _ = _min_med(warms_h)

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
        # f32 TPU residual floor: measured 1.77e-6 (r1) / 3.96e-6 (r2);
        # both criterion-legal at tol=1e-6, but drift past ~5e-6 means a
        # numerical regression, so pin it here (docs/precision.md).
        "schur_residual_ok": bool(resid <= 5e-6),
        "readme_wall_s": round(wall, 3),
        "readme_wall_warm_s": warm_wall,
        "readme_wall_warm_med_s": warm_med,
        "readme_wall_warm_host_s": warm_wall_host,
        "readme_restarts": history.restarts,
        # Latency breakdown of the warm HOST-path solve: 'device' = jitted
        # dispatch + H readback round trips, 'dense' = host restart kernels.
        "readme_host_device_s": round(history_host.timings.get("device", 0.0), 4),
        "readme_host_dense_s": round(history_host.timings.get("dense", 0.0), 4),
    }


def extended_precision():
    """Double-word f32 solve on TPU (partial_schur(..., extended=True)):
    the README config at tol=1e-12 — Double64-class convergence on
    hardware with no float64 units (reference: readme.md:81-99 reaches
    tol=1e-28 in Double64 on a CPU; this is the f32-word analogue)."""
    _jax()
    import numpy as np

    from arnoldimethod_tpu import partial_schur
    from arnoldimethod_tpu.models.problems import laplacian_1d

    op = laplacian_1d(100, dtype=np.float32)
    t0 = time.perf_counter()
    decomp, history = partial_schur(
        op, nev=10, which="SR", tol=1e-12, extended=True
    )
    wall = time.perf_counter() - t0
    warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        decomp, history = partial_schur(
            op, nev=10, which="SR", tol=1e-12, extended=True
        )
        warms.append(time.perf_counter() - t0)
    warm, warm_med = _min_med(warms)
    A = (
        np.diag(np.full(100, 2.0))
        + np.diag(np.full(99, -1.0), 1)
        + np.diag(np.full(99, -1.0), -1)
    )
    Q = np.asarray(decomp.Q, np.float64)
    R = np.asarray(decomp.R)
    resid = float(np.linalg.norm(A @ Q - Q @ R))
    orth = float(np.linalg.norm(Q.T @ Q - np.eye(Q.shape[1])))
    out = {
        "ext_matvecs": history.mvproducts,
        "ext_converged": bool(history.converged),
        "ext_schur_residual": float(f"{resid:.3e}"),
        "ext_orthonormality": float(f"{orth:.3e}"),
        "ext_ok": bool(history.converged and resid < 1e-11),
        "ext_wall_s": round(wall, 2),
        "ext_wall_warm_s": round(warm, 2),
        "ext_wall_warm_med_s": round(warm_med, 2),
    }

    # Extended + sharding composed ON HARDWARE (VERDICT r3 weak #7): the
    # df path through an explicit device mesh on the real chip (the
    # multi-device behavior is covered by the 8-device CPU-mesh tests;
    # this pins the hardware code path).
    from arnoldimethod_tpu.parallel.mesh import basis_sharding, make_mesh

    mesh = make_mesh(1)
    decomp_s, history_s = partial_schur(
        op, nev=10, which="SR", tol=1e-12, extended=True,
        sharding=basis_sharding(mesh),
    )
    Qs = np.asarray(decomp_s.Q, np.float64)
    resid_s = float(np.linalg.norm(A @ Qs - Qs @ np.asarray(decomp_s.R)))
    out["ext_sharded_matvecs"] = history_s.mvproducts
    out["ext_sharded_ok"] = bool(history_s.converged and resid_s < 1e-11)
    return out


def _stencil_op(grid, use_pallas=None):
    import jax.numpy as jnp

    from arnoldimethod_tpu.models.operators import Stencil5Operator

    # 0.130-scaled 2-D Laplacian: spectral radius ~1, so the iterated
    # vector stays finite across back-to-back matvecs, and each iteration
    # is exactly one SpMV (the scale lives in A's coefficients).
    s = 0.130
    return Stencil5Operator(
        tuple(s * c for c in (4.0, -1.0, -1.0, -1.0, -1.0)),
        (grid, grid),
        dtype=jnp.float32,
        use_pallas=use_pallas,
    )


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _min_med(vals):
    """(min, median) of a list of walls — every warm e2e wall is sampled
    >= 3x because the remote tunnel's latency is bimodal; a single sample
    made r4's warm 1M wall (70.3 s) exceed its cold one (43.8 s)
    (VERDICT r4 weak #2/#4).  min is the honest steady-state number,
    median shows the variance."""
    s = sorted(vals)
    return round(s[0], 3), round(s[len(s) // 2], 3)


def _loop_time(run, x, reps=3, target_s=2.0, max_iters=4_000_000):
    """Per-iteration time of `_fence(run(x, steps))` by TWO-POINT
    measurement: the dispatch + fence round trip over the remote tunnel is
    ~25 ms of *jittery* latency, so (a) the loop length is auto-scaled
    until the measured span is ~`target_s` (long enough that the jitter is
    noise), then (b) the N/5-vs-N difference cancels the fixed part.
    min over reps; non-positive differences (pure jitter) are discarded."""
    _fence(run(x, 2))  # warm-up / compile; absorbs stragglers

    # Latency estimate (min of 3 — a single sample can be a multi-second
    # straggler on this tunnel), then a geometric ramp whose *successive
    # differences* give a latency-free rate estimate.
    lat = min(
        _timed(lambda: _fence(run(x, 1))) for _ in range(3)
    )
    n_prev, span_prev = 1, lat
    n = 8
    while True:
        t0 = time.perf_counter()
        _fence(run(x, n))
        span = time.perf_counter() - t0
        if span - lat >= 0.3 or n >= max_iters:
            break
        n_prev, span_prev = n, span
        n *= 4
    est = (span - span_prev) / (n - n_prev)
    if est <= 0:  # jitter exceeded the span: fall back to an upper bound
        est = span / n
    N = min(max(int(target_s / est), 2 * n), max_iters)
    n1 = max(1, N // 5)

    diffs = []
    for r in range(reps):
        xr = x * (1.0 + 0.001 * r)
        t0 = time.perf_counter()
        _fence(run(xr, n1))
        t1 = time.perf_counter()
        _fence(run(xr, N))
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / (N - n1))
    good = [d for d in diffs if d > 0]
    return max(min(good) if good else est, 1e-9)


def _spmv_time(op, iters=None, reps=3):
    """Per-iteration matvec time; `iters` is accepted for compatibility but
    the loop length is auto-scaled (see _loop_time).

    The operator is passed to jit as a pytree ARGUMENT — closing over it
    would embed its arrays as XLA constants (a 256 MB BSR operand then
    exceeds the remote-compile request limit, and compiles crawl)."""
    jax = _jax()
    import jax.numpy as jnp

    n = op.shape[0]
    x = jnp.ones(n, dtype=jnp.float32)

    @jax.jit
    def mv_loop(op, y, steps):
        return jax.lax.fori_loop(0, steps, lambda i, y: op.matvec(y), y)

    return _loop_time(lambda y, steps: mv_loop(op, y, steps), x, reps=reps)


def spmv(grid, iters, key=None):
    op = _stencil_op(grid)
    dt = _spmv_time(op, iters)
    nnz = op.nnz
    key = key or ("spmv" if grid == 1024 else f"spmv_{grid}")
    return {
        f"{key}_gnnz_per_s": round(nnz / dt / 1e9, 3),
        f"{key}_us_per_iter": round(dt * 1e6, 2),
        f"{key}_nnz": nnz,
    }


def roofline():
    """HBM memcpy roofline + XLA-vs-Pallas stencil at two sizes.

    The 5-point stencil moves ~8 B/row (x in + y out, f32), so
    rows/s * 8 B = effective GB/s.  Two regimes:

      * 1M rows (4 MB vectors): the iterated vector FITS IN VMEM, and XLA
        keeps the fori_loop carry on-chip — both formulations exceed the
        HBM memcpy rate.  Reported for the on-chip story; a "roofline
        fraction" against HBM is meaningless here (it comes out > 1).
      * 16M rows (64 MB vectors): HBM-resident.  `spmv_roofline_frac` is
        computed HERE — this is the honest speed-of-light comparison.
    """
    jax = _jax()
    import jax.numpy as jnp

    # Memcpy bandwidth: chained scale passes over a 256 MiB array
    # (read + write each), auto-scaled two-point timing (_loop_time).
    n = 64 * 1024 * 1024  # 256 MiB f32
    x = jnp.ones(n, dtype=jnp.float32)

    @jax.jit
    def scale_loop(y, steps):
        return jax.lax.fori_loop(0, steps, lambda i, y: y * 1.0000001, y)

    dt = _loop_time(scale_loop, x)
    memcpy_gbs = 2 * 4 * n / dt / 1e9

    out = {"roofline_memcpy_gbs": round(memcpy_gbs, 1)}

    for grid, tag in ((1024, "1m"), (4096, "16m")):
        op_xla = _stencil_op(grid, use_pallas=False)
        dt_xla = _spmv_time(op_xla)
        op_pal = _stencil_op(grid, use_pallas=True)
        dt_pal = _spmv_time(op_pal)
        op_sl = _stencil_op(grid, use_pallas="sliding")
        dt_sl = _spmv_time(op_sl)
        n_rows = op_pal.shape[0]
        out[f"roofline_xla_{tag}_gnnz_per_s"] = round(
            op_xla.nnz / dt_xla / 1e9, 3
        )
        out[f"roofline_pallas_{tag}_gnnz_per_s"] = round(
            op_pal.nnz / dt_pal / 1e9, 3
        )
        out[f"roofline_pallas_{tag}_eff_gbs"] = round(
            2 * 4 * n_rows / dt_pal / 1e9, 1
        )
        out[f"roofline_pallas_vs_xla_{tag}"] = round(dt_xla / dt_pal, 2)
        out[f"roofline_sliding_{tag}_gnnz_per_s"] = round(
            op_sl.nnz / dt_sl / 1e9, 3
        )
        out[f"roofline_sliding_{tag}_eff_gbs"] = round(
            2 * 4 * n_rows / dt_sl / 1e9, 1
        )
        out[f"roofline_sliding_vs_xla_{tag}"] = round(dt_xla / dt_sl, 2)
    # The honest speed-of-light fraction: HBM-resident (16M rows), best
    # formulation vs the measured memcpy rate.  Remaining-gap accounting
    # (docs/kernels.md round-4 note): called on 2-D operands the sliding
    # kernel measures ~0.97x memcpy — the in-context loss is one
    # (n,)<->(ny,nx) boundary copy at the custom-call edge that XLA
    # cannot bitcast across the solver's flat vectors.
    best_gbs = max(
        out["roofline_pallas_16m_eff_gbs"],
        out["roofline_sliding_16m_eff_gbs"],
        out["roofline_xla_16m_gnnz_per_s"] / 5 * 8,
    )
    out["spmv_roofline_frac"] = round(best_gbs / memcpy_gbs, 3)
    return out


def e2e_1m():
    """Config 2 (BASELINE.json): 1M-row 2-D Laplacian, nev=20 smallest,
    tol=1e-6 — the end-to-end north-star solve.  Interior-gap :SR is the
    hard direction for restarted Arnoldi; generous subspace sizes keep the
    restart count sane."""
    _jax()
    import numpy as np
    import jax

    from arnoldimethod_tpu import partial_schur

    op = _stencil_op(1024)
    t0 = time.perf_counter()
    # method="host" here measures the host-dense restart path; the fused
    # device path at the same config lives in the e2e1mdev phase (its
    # round-3 worker crash was a single-dispatch duration limit, fixed by
    # chunked dispatch in fused.py).
    decomp, history = partial_schur(
        op, nev=20, which="SR", tol=1e-6, mindim=40, maxdim=80, restarts=400,
        method="host",
    )
    np.asarray(decomp.Q[:, :1])
    wall = time.perf_counter() - t0

    # Warm runs (>=3, min+median — the tunnel's latency is bimodal):
    # all programs compiled/cache-loaded; steady-state wall.
    warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        decomp2, history2 = partial_schur(
            op, nev=20, which="SR", tol=1e-6, mindim=40, maxdim=80,
            restarts=400, method="host",
        )
        np.asarray(decomp2.Q[:, :1])
        warms.append(time.perf_counter() - t0)
    warm_wall, warm_med = _min_med(warms)
    history2_mv = history2.mvproducts
    del decomp2

    # Residual via device matvecs (no dense reconstruction at n=1M).
    # The XLA stencil formulation is used because the Pallas kernel's
    # ANY-memory-space BlockSpec cannot be vmap-batched; same matrix.
    op_r = _stencil_op(1024, use_pallas=False)
    Q = decomp.Q
    import jax.numpy as jnp

    AQ = jax.jit(jax.vmap(op_r.matvec, in_axes=1, out_axes=1))(Q)
    R = jnp.asarray(np.asarray(decomp.R), dtype=jnp.float32)
    resid = float(jnp.linalg.norm(AQ - Q @ R))
    lam_min = 0.130 * (8 - 4 * np.cos(np.pi / 1025) - 4 * np.cos(np.pi / 1025))
    return {
        "e2e1m_wall_s": round(wall, 2),
        "e2e1m_wall_warm_s": warm_wall,
        "e2e1m_wall_warm_med_s": warm_med,
        "e2e1m_warm_matvecs": history2_mv,
        "e2e1m_matvecs": history.mvproducts,
        "e2e1m_restarts": history.restarts,
        "e2e1m_converged": bool(history.converged),
        "e2e1m_nconverged": history.nconverged,
        "e2e1m_schur_residual": round(resid, 9),
        "e2e1m_device_s": round(history.timings.get("device", 0.0), 2),
        "e2e1m_dense_s": round(history.timings.get("dense", 0.0), 2),
        "e2e1m_lam_min_err": round(
            float(abs(np.min(decomp.eigenvalues.real) - lam_min)), 9
        ),
    }


def e2e_10m_nev100():
    """THE NORTH STAR (BASELINE.json:5, VERDICT r3 missing #1): a nev=100
    partial Schur decomposition of a >=10M-row sparse matrix on one chip.
    n = 10,240,000 (3200x3200 2-D Laplacian stencil), maxdim=200, via the
    productized Chebyshev recipe (docs/transforms.md): estimate_interval
    bootstraps the damping interval from solver outputs only, the
    filtered Krylov-Schur solve converges the 100 smallest eigenvalues,
    rayleigh_ritz maps back to A's spectrum and checks residuals.
    Memory: the (201, 10.24M) f32 basis is 8.2 GB — the tiled in-place
    basis change and the rows-layout rayleigh_ritz keep the peak inside
    the 16 GB HBM (PartialSchur.Q_rows; a columns-layout basis would pad
    its 100-wide minor dim to 128 lanes, a hidden 5 GB copy)."""
    _jax()
    import gc

    import numpy as np

    from arnoldimethod_tpu import (
        ChebyshevFilterOperator,
        estimate_interval,
        partial_schur,
        rayleigh_ritz,
    )

    s, N, nev = 0.130, 3200, 100
    op = _stencil_op(N)
    lam1 = s * (2 - 2 * np.cos(np.pi * np.arange(1, N + 1) / (N + 1)))
    exact = np.sort(np.add.outer(lam1, lam1).ravel())[:nev]

    def attempt(coarse_m, sched, deg, maxdim):
        t0 = time.perf_counter()
        iv = estimate_interval(op, nev=nev, maxdim=coarse_m,
                               refine_degree=sched)
        gc.collect()  # drop the last ChebFSI block before allocating V
        t_interval = time.perf_counter() - t0
        fop = ChebyshevFilterOperator(op, iv.a, iv.b, deg,
                                      scale_point=iv.lo)
        t0 = time.perf_counter()
        decomp, history = partial_schur(
            fop, nev=nev, which="LM", tol=1e-7, mindim=nev, maxdim=maxdim,
            method="host",
        )
        t_solve = time.perf_counter() - t0
        t0 = time.perf_counter()
        w, _, res = rayleigh_ritz(op, decomp.Q_rows, rows_layout=True,
                                  return_vectors=False)
        t_rr = time.perf_counter() - t0
        return decomp, history, w, res, t_interval, t_solve, t_rr

    # HBM budget (16 GB chip): the (maxdim+1, 10.24M) f32 basis is 8.2 GB
    # at maxdim=200, the coarse interval pass peaks at coarse basis +
    # ChebFSI block.  r4's official capture died RESOURCE_EXHAUSTED while
    # the same config converged in isolation — the phase sat at the HBM
    # ceiling with zero headroom (VERDICT r4 weak #1).  So: (a) the first
    # attempt trims the coarse pass from m=160 (6.6 GB) to m=120
    # (5.0 GB) and frees it before the solve; (b) on RESOURCE_EXHAUSTED
    # the phase sleeps (lets the remote worker reclaim), then retries a
    # degraded config (coarse m=60, maxdim=150 -> 6.2 GB basis) that
    # still converges nev=100.
    configs = [
        dict(coarse_m=120, sched=(100, 200, 400, 400), deg=1000,
             maxdim=200),
        dict(coarse_m=60, sched=(100, 200, 400, 400), deg=1000,
             maxdim=150),
    ]
    note = None
    for i, cfg in enumerate(configs):
        try:
            decomp, history, w, res, t_interval, t_solve, t_rr = attempt(
                **cfg
            )
            break
        except Exception as e:  # noqa: BLE001 — retry once, then report
            note = f"attempt{i}({type(e).__name__}): {str(e)[-80:]}"
            del e
            gc.collect()
            time.sleep(20)
    else:
        return {
            "e2e10m_error": note[:120],
            "e2e10m_nev100_converged": False,
        }

    w = np.sort(np.asarray(w).real)
    err = float(np.max(np.abs(w[:nev] - exact)))
    out = {
        "e2e10m_nev100_n": op.shape[0],
        "e2e10m_nev100_wall_s": round(t_interval + t_solve + t_rr, 2),
        "e2e10m_nev100_interval_s": round(t_interval, 2),
        "e2e10m_nev100_solve_s": round(t_solve, 2),
        "e2e10m_nev100_restarts": history.restarts,
        "e2e10m_nev100_filtered_matvecs": history.mvproducts,
        "e2e10m_nev100_A_matvecs": history.mvproducts * cfg["deg"],
        "e2e10m_nev100_converged": bool(history.converged),
        "e2e10m_nev100_nconverged": history.nconverged,
        "e2e10m_nev100_max_resid": float(f"{res[:nev].max():.3e}"),
        "e2e10m_nev100_eig_err": float(f"{err:.3e}"),
    }
    if note:
        out["e2e10m_retry"] = note[:120]
    return out


def e2e_16m_nev20():
    """Largest-n end-to-end solve: nev=20 smallest of the 16,777,216-row
    (4096x4096) 2-D Laplacian on one chip — the 13.5 GB-basis regime is
    covered by e2e10m (nev=100); this phase covers maximum n.  Same
    Chebyshev recipe; the (41, 16.8M) basis is 2.8 GB."""
    _jax()
    import numpy as np

    from arnoldimethod_tpu import (
        ChebyshevFilterOperator,
        estimate_interval,
        partial_schur,
        rayleigh_ritz,
    )

    s, N, nev, deg = 0.130, 4096, 20, 800
    op = _stencil_op(N)
    lam1 = s * (2 - 2 * np.cos(np.pi * np.arange(1, N + 1) / (N + 1)))
    exact = np.sort(np.add.outer(lam1, lam1).ravel())[:nev]

    t0 = time.perf_counter()
    iv = estimate_interval(op, nev=nev, refine=4, refine_degree=400)
    t_interval = time.perf_counter() - t0
    fop = ChebyshevFilterOperator(op, iv.a, iv.b, deg, scale_point=iv.lo)
    t0 = time.perf_counter()
    decomp, history = partial_schur(fop, nev=nev, which="LM", tol=1e-7,
                                    method="host")
    t_solve = time.perf_counter() - t0
    t0 = time.perf_counter()
    w, _, res = rayleigh_ritz(op, decomp.Q_rows, rows_layout=True,
                              return_vectors=False)
    t_rr = time.perf_counter() - t0
    w = np.sort(np.asarray(w).real)
    err = float(np.max(np.abs(w[:nev] - exact)))
    return {
        "e2e16m_n": op.shape[0],
        "e2e16m_wall_s": round(t_interval + t_solve + t_rr, 2),
        "e2e16m_interval_s": round(t_interval, 2),
        "e2e16m_solve_s": round(t_solve, 2),
        "e2e16m_restarts": history.restarts,
        "e2e16m_filtered_matvecs": history.mvproducts,
        "e2e16m_converged": bool(history.converged),
        "e2e16m_max_resid": float(f"{res[:nev].max():.3e}"),
        "e2e16m_eig_err": float(f"{err:.3e}"),
    }


def e2e_1m_device():
    """The fused on-device solver at the config-2 scale (n=1M, nev=20,
    maxdim=80) — the exact configuration whose single-dispatch execution
    crashed the TPU worker in round 3.  fused.py now dispatches the
    restart loop in bounded-duration chunks (~40 s each).  The device
    path is FORCED here (method="device") to pin the crash regression;
    the auto-select would pick "host" at n=1M/maxdim=80 (measured
    crossover surface: docs/profile_1m.md)."""
    _jax()
    import numpy as np

    from arnoldimethod_tpu import partial_schur

    op = _stencil_op(1024)
    kw = dict(nev=20, which="SR", tol=1e-6, mindim=40, maxdim=80,
              restarts=400, method="device")
    t0 = time.perf_counter()
    decomp, history = partial_schur(op, **kw)
    np.asarray(decomp.Q[:, :1])
    wall = time.perf_counter() - t0

    warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        decomp2, history2 = partial_schur(op, **kw)
        np.asarray(decomp2.Q[:, :1])
        warms.append(time.perf_counter() - t0)
    warm_wall, warm_med = _min_med(warms)

    lam_min = 0.130 * (8 - 8 * np.cos(np.pi / 1025))
    return {
        "e2e1m_device_wall_s": round(wall, 2),
        "e2e1m_device_wall_warm_s": warm_wall,
        "e2e1m_device_wall_warm_med_s": warm_med,
        "e2e1m_device_matvecs": history2.mvproducts,
        "e2e1m_device_restarts": history2.restarts,
        "e2e1m_device_converged": bool(history2.converged),
        "e2e1m_device_lam_min_err": round(
            float(abs(np.min(decomp2.eigenvalues.real) - lam_min)), 9
        ),
    }


def complex_sc():
    """Complex matrices on TPU hardware via the split-complex path
    (ops/sc_expansion.py — VERDICT r3 missing #5): a complex64 random
    matrix solved for its LARGEST-IMAGINARY eigenvalues (the :LI target
    that exists only in complex arithmetic), basis carried as real
    (re, im) words on device, dense restart layer in host complex128."""
    _jax()
    import numpy as np

    from arnoldimethod_tpu import partial_schur

    rng = np.random.default_rng(0)
    n = 1500
    A = (
        rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    ).astype(np.complex64) / np.sqrt(n)
    kw = dict(nev=8, which="LI", tol=1e-5, mindim=16, maxdim=32,
              restarts=500)
    t0 = time.perf_counter()
    decomp, history = partial_schur(A, **kw)
    wall = time.perf_counter() - t0
    warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        decomp2, history2 = partial_schur(A, **kw)
        warms.append(time.perf_counter() - t0)
    warm, warm_med = _min_med(warms)

    Q = np.asarray(decomp2.Q)
    R = np.asarray(decomp2.R)
    A64 = A.astype(np.complex128)
    k = Q.shape[1]
    resid = np.linalg.norm(A64 @ Q - Q @ R) / np.linalg.norm(A64)
    orth = np.linalg.norm(Q.conj().T @ Q - np.eye(k))
    lam_ref = np.linalg.eigvals(A64)
    lam_ref = np.sort(lam_ref[np.argsort(-lam_ref.imag)][:8].imag)
    lam_got = np.sort(decomp2.eigenvalues.imag)
    eig_err = float(np.max(np.abs(lam_got - lam_ref)))
    return {
        "complex_sc_n": n,
        "complex_sc_wall_s": round(wall, 2),
        "complex_sc_wall_warm_s": round(warm, 2),
        "complex_sc_wall_warm_med_s": round(warm_med, 2),
        "complex_sc_matvecs": history2.mvproducts,
        "complex_sc_converged": bool(history.converged and history2.converged),
        "complex_sc_schur_resid": float(f"{resid:.3e}"),
        "complex_sc_orth": float(f"{orth:.3e}"),
        "complex_sc_li_eig_err": float(f"{eig_err:.3e}"),
    }


def complex_sc_sparse():
    """Complex SPARSE spectrum at scale on chip (VERDICT r4 missing #1):
    a 1,048,576-row complex tridiagonal matrix in split DIA format
    (SplitComplexOperator over two real DiaOperators — built
    automatically by dia_from_diagonals for complex values), solved for
    its 8 LARGEST-IMAGINARY eigenvalues through the split-complex path.

    The matrix is checkable without a dense oracle: the diagonal plants
    10 eigenvalue seeds with imaginary parts 2.0..2.9 above a bulk with
    imag in [0, 1], and the off-diagonal coupling beta = 0.01 moves each
    eigenvalue at most 2*beta off its diagonal entry (Gershgorin), so
    the :LI answer must match the planted imags to ~0.02.  CPU-oracle
    equivalence of the same operator type lives in
    tests/test_split_complex.py::test_sc_sparse_dia_solve_oracle."""
    _jax()
    import numpy as np

    from arnoldimethod_tpu import partial_schur
    from arnoldimethod_tpu.models.operators import dia_from_diagonals

    n = 1 << 20
    rng = np.random.default_rng(42)
    z = rng.uniform(-1.0, 1.0, n) + 1j * rng.uniform(0.0, 1.0, n)
    planted = np.linspace(2.0, 2.9, 10)
    idx = rng.choice(n, size=10, replace=False)
    z[idx] = 0.3 * rng.standard_normal(10) + 1j * planted
    beta = 0.01
    op = dia_from_diagonals(
        {0: z.astype(np.complex64), 1: beta, -1: 1j * beta}, (n, n),
        dtype=np.complex64,
    )
    kw = dict(nev=8, which="LI", tol=1e-5, mindim=16, maxdim=32,
              restarts=500)
    t0 = time.perf_counter()
    decomp, history = partial_schur(op, **kw)
    wall = time.perf_counter() - t0
    warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        decomp2, history2 = partial_schur(op, **kw)
        warms.append(time.perf_counter() - t0)
    warm, warm_med = _min_med(warms)

    # Residual in host float64: the tridiagonal apply is three axpys.
    Q = np.asarray(decomp2.Q)
    R = np.asarray(decomp2.R)
    AQ = z[:, None] * Q
    AQ[:-1] += beta * Q[1:]
    AQ[1:] += 1j * beta * Q[:-1]
    resid = float(np.linalg.norm(AQ - Q @ R))
    orth = float(np.linalg.norm(Q.conj().T @ Q - np.eye(Q.shape[1])))
    imag_got = np.sort(decomp2.eigenvalues.imag)[-8:]
    err = float(np.max(np.abs(imag_got - planted[-8:])))
    return {
        "complexsc_sparse_n": n,
        "complexsc_sparse_wall_s": round(wall, 2),
        "complexsc_sparse_wall_warm_s": warm,
        "complexsc_sparse_wall_warm_med_s": warm_med,
        "complexsc_sparse_matvecs": history2.mvproducts,
        "complexsc_sparse_converged": bool(
            history.converged and history2.converged
        ),
        "complexsc_sparse_schur_resid": float(f"{resid:.3e}"),
        "complexsc_sparse_orth": float(f"{orth:.3e}"),
        "complexsc_sparse_li_eig_err": float(f"{err:.3e}"),
        "complexsc_sparse_li_eig_ok": bool(err < 0.021),
    }


def e2e_65k_fused():
    """Fused on-device solver at scale: n=65536 (256x256) 2-D Laplacian,
    nev=10 smallest, moderate subspace sizes (mindim=20, maxdim=40 — a
    small-m program, so the fused compile stays well inside the phase
    budget).  The whole restart loop is ONE device program; compare the
    host path, which pays one round trip per restart.  This is the
    flagship round-2 feature measured where it matters (VERDICT r2 #3)."""
    _jax()
    import numpy as np

    from arnoldimethod_tpu import partial_schur

    op = _stencil_op(256)
    out = {"e2e65k_n": op.shape[0]}
    for method in ("device", "host"):
        kw = dict(nev=10, which="SR", tol=1e-6, mindim=20, maxdim=40,
                  restarts=600, method=method)
        t0 = time.perf_counter()
        decomp, history = partial_schur(op, **kw)
        np.asarray(decomp.Q[:, :1])
        cold = time.perf_counter() - t0
        warms = []
        for _ in range(3):
            t0 = time.perf_counter()
            decomp, history = partial_schur(op, **kw)
            np.asarray(decomp.Q[:, :1])
            warms.append(time.perf_counter() - t0)
        warm, warm_med = _min_med(warms)
        out[f"e2e65k_{method}_wall_s"] = round(cold, 3)
        out[f"e2e65k_{method}_wall_warm_s"] = warm
        out[f"e2e65k_{method}_wall_warm_med_s"] = warm_med
        out[f"e2e65k_{method}_matvecs"] = history.mvproducts
        out[f"e2e65k_{method}_converged"] = bool(history.converged)
    out["e2e65k_device_vs_host"] = round(
        out["e2e65k_host_wall_warm_s"] / out["e2e65k_device_wall_warm_s"], 2
    )
    return out


def e2e_1m_cheb():
    """Config 2 accelerated the TPU-first way: Chebyshev polynomial filter
    (transforms.ChebyshevFilterOperator).  Each filtered matvec is 600
    streaming SpMVs inside one dispatch (pure HBM-bound work); the
    latency-bound restart count collapses from hundreds to a handful.
    The damping interval comes from `estimate_interval` — solver outputs
    only, the exact recipe a user runs (docs/transforms.md); the analytic
    spectrum below is used ONLY to check the answer."""
    _jax()
    import numpy as np

    from arnoldimethod_tpu import (
        ChebyshevFilterOperator,
        estimate_interval,
        partial_schur,
        rayleigh_ritz,
    )

    s, N = 0.130, 1024
    op = _stencil_op(N)
    lam1 = s * (2 - 2 * np.cos(np.pi * np.arange(1, N + 1) / (N + 1)))
    exact = np.sort(np.add.outer(lam1, lam1).ravel(order="C"))[:24]

    t0 = time.perf_counter()
    a, b, lo = estimate_interval(op, nev=20)
    deg = 600
    fop = ChebyshevFilterOperator(op, a, b, deg, scale_point=lo)
    decomp, history = partial_schur(
        fop, nev=20, which="LM", tol=1e-7, method="host"
    )
    w, X, res = rayleigh_ritz(op, decomp.Q)
    wall = time.perf_counter() - t0

    # Warm solves (>=3, min+median): all programs compiled — the
    # steady-state wall-clock (compare e2e1m_wall_s: the filter collapses
    # hundreds of restarts into a handful of giant streaming dispatches).
    # Distinct names so the reported stats stay those of the timed COLD
    # solve.
    warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        decomp2, history2 = partial_schur(
            fop, nev=20, which="LM", tol=1e-7, method="host"
        )
        w2, X2, res2 = rayleigh_ritz(op, decomp2.Q)
        warms.append(time.perf_counter() - t0)
    warm_wall, warm_med = _min_med(warms)

    k = min(20, len(w))
    err = float(np.max(np.abs(np.sort(w[:k]) - exact[:k])))
    return {
        "e2e1m_cheb_wall_s": round(wall, 2),
        "e2e1m_cheb_wall_warm_s": warm_wall,
        "e2e1m_cheb_wall_warm_med_s": warm_med,
        "e2e1m_cheb_restarts": history.restarts,
        "e2e1m_cheb_filtered_matvecs": history.mvproducts,
        "e2e1m_cheb_A_matvecs": history.mvproducts * deg,
        "e2e1m_cheb_converged": bool(history.converged),
        "e2e1m_cheb_max_resid": float(f"{res[:k].max():.3e}"),
        "e2e1m_cheb_eig_err": float(f"{err:.3e}"),
    }


def conv_diffusion():
    """Config 3 (BASELINE.json): nonsymmetric convection-diffusion, :LM,
    exercising 2x2-block real Schur + reordering.  peclet is set past the
    oscillatory threshold (beta > 1) so the spectrum genuinely has
    conjugate pairs.

    The LM eigenvalues of this operator cluster with relative gaps
    O((pi*h)^2): plain float32 Krylov-Schur stagnates at ~1e-3 residuals
    for nx >= 128 (docs/precision.md 'cluster resolution').  This phase
    runs `extended=True` — double-word f32 arithmetic, the exact tool
    built for cluster resolution — which converges nx=256 (n=65,536,
    16x the round-3 phase size) to tol=1e-6 on f32-only hardware."""
    _jax()
    import numpy as np

    from arnoldimethod_tpu import partial_schur
    from arnoldimethod_tpu.models.problems import convection_diffusion_2d

    nx = 256
    op = convection_diffusion_2d(
        nx, peclet=4.0 * (nx + 1), dtype=np.float32, fmt="stencil"
    )
    kw = dict(nev=10, which="LM", tol=1e-6, mindim=30, maxdim=60,
              restarts=1000, extended=True)
    t0 = time.perf_counter()
    decomp, history = partial_schur(op, **kw)
    np.asarray(decomp.Q[:, :1])
    wall = time.perf_counter() - t0

    warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        decomp2, history2 = partial_schur(op, **kw)
        np.asarray(decomp2.Q[:, :1])
        warms.append(time.perf_counter() - t0)
    warm_wall, warm_med = _min_med(warms)

    # Residual in host float64 (an f32 matvec's own rounding noise,
    # integrated over 65k x 10 entries, is ~1e-3 and would swamp the
    # double-word solve's actual residual).
    h = 1.0 / (nx + 1)
    beta = 4.0 * (nx + 1) * h / 2.0
    Q = np.asarray(decomp2.Q, np.float64)
    G = Q.reshape(nx, nx, -1)
    AQg = 4.0 * G.copy()
    AQg[:, 1:] += (-1.0 - beta) * G[:, :-1]   # west neighbor
    AQg[:, :-1] += (-1.0 + beta) * G[:, 1:]   # east neighbor
    AQg[1:, :] += -1.0 * G[:-1, :]
    AQg[:-1, :] += -1.0 * G[1:, :]
    R = np.asarray(decomp2.R)
    resid = float(np.linalg.norm(AQg.reshape(nx * nx, -1) - Q @ R))
    n_complex = int(np.sum(decomp2.eigenvalues.imag != 0))
    return {
        "conv_nx": nx,
        "conv_n": nx * nx,
        "conv_wall_s": round(wall, 2),
        "conv_wall_warm_s": warm_wall,
        "conv_wall_warm_med_s": warm_med,
        "conv_matvecs": history.mvproducts,
        "conv_warm_matvecs": history2.mvproducts,
        "conv_converged": bool(history.converged and history2.converged),
        "conv_schur_residual": float(f"{resid:.3e}"),
        "conv_complex_pairs": n_complex // 2,
        "conv_extended": True,
    }


def conv_1m_nonsym():
    """Nonsymmetric at config-2 SCALE (VERDICT r4 next #3): the periodic
    convection-diffusion circulant at n = 1,048,576 — genuinely
    nonsymmetric (central-difference convection, complex conjugate
    pairs) yet NORMAL, so its eigenproblem is well-conditioned at scale,
    unlike the Dirichlet operator whose departure from normality grows
    like 3^(nx/2) at beta=2 and puts the true spectrum beyond ANY
    backward-stable method for nx >= ~512 (docs/precision.md; measured:
    1500 extended restarts lock nothing at nx=512).

    Recipe (docs/transforms.md 'nonsymmetric spectra'): the :LM edge
    clusters quadratically, so interval filters cannot separate it once
    convection tilts the spectrum (thin-ellipse violation) — the
    TPU-native answer is the FFT circulant shift-invert
    (CirculantShiftInvertOperator): sigma is walked to the top edge by
    staged inverse power iterations, then Krylov-Schur on
    (A - sigma I)^{-1} converges the cluster with gaps magnified by
    1/|lambda - sigma|^2.  Answers check against the exact DFT symbol."""
    jax = _jax()
    import numpy as np
    import jax.numpy as jnp

    from arnoldimethod_tpu import (
        CirculantShiftInvertOperator,
        partial_schur,
        power_bound,
        rayleigh_ritz,
    )
    from arnoldimethod_tpu.models import convection_diffusion_periodic_2d

    N, s, cx, cy = 1024, 0.13, 0.15, 0.08
    op = convection_diffusion_periodic_2d(N, cx=cx, cy=cy, scale=s)
    t0 = time.perf_counter()
    sigma = float(power_bound(op))
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (N * N,), jnp.float32)

    @jax.jit
    def si_power(si, v, steps):
        def body(i, v):
            w = si.matvec(v)
            return w / jnp.linalg.norm(w)

        return jax.lax.fori_loop(0, steps, body, v)

    for _stage in range(4):
        si = CirculantShiftInvertOperator.build(op, sigma)
        v = si_power(si, v, 30)
        Av = op.matvec(v)
        lam_hat = float(jnp.vdot(v, Av))
        r = float(jnp.linalg.norm(Av - lam_hat * v))
        sigma = lam_hat + max(4 * r, 0.05 * (sigma - lam_hat), 1e-7)
    t_sigma = time.perf_counter() - t0

    si = CirculantShiftInvertOperator.build(op, sigma)
    kw = dict(nev=12, which="LM", tol=1e-7, mindim=18, maxdim=36,
              method="host", restarts=300)
    t0 = time.perf_counter()
    decomp, history = partial_schur(si, **kw)
    t_solve = time.perf_counter() - t0
    t0 = time.perf_counter()
    w, _, res = rayleigh_ritz(op, decomp.Q)
    t_rr = time.perf_counter() - t0

    warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        decomp2, history2 = partial_schur(si, **kw)
        np.asarray(decomp2.Q[:, :1])
        warms.append(time.perf_counter() - t0)
    warm, warm_med = _min_med(warms)

    th = 2 * np.pi * np.arange(N) / N
    sym = s * (
        (2 - 2 * np.cos(th))[:, None]
        + (2 - 2 * np.cos(th))[None, :]
        + 2j * (cx * np.sin(th)[:, None] + cy * np.sin(th)[None, :])
    )
    se = sym.ravel()
    w = np.asarray(w)
    # Vectorized nearest-symbol distances: the interpreted double loop
    # over the 1M-element symbol cost tens of seconds of host time.
    acc = float(max(np.abs(se - l).min() for l in w))
    top8 = se[np.argsort(-np.abs(se))][:8]
    cov = float(max(np.abs(w - t).min() for t in top8))
    return {
        "conv1m_n": N * N,
        "conv1m_wall_s": round(t_sigma + t_solve + t_rr, 2),
        "conv1m_sigma_s": round(t_sigma, 2),
        "conv1m_solve_s": round(t_solve, 2),
        "conv1m_wall_warm_s": warm,
        "conv1m_wall_warm_med_s": warm_med,
        "conv1m_matvecs": history.mvproducts,
        "conv1m_restarts": history.restarts,
        "conv1m_converged": bool(history.converged),
        "conv1m_max_resid": float(f"{np.max(res):.3e}"),
        "conv1m_eig_acc": float(f"{acc:.3e}"),
        "conv1m_top8_coverage": float(f"{cov:.3e}"),
        "conv1m_complex_pairs": int(np.sum(w.imag > 1e-9)),
    }


def shift_invert():
    """Config 4 (BASELINE.json) / reference bench/partial_schur.jl:37-52:
    n=6000 tridiagonal (-1, 2, -1.001), shift-invert at sigma=0, nev=10,
    mindim=11, maxdim=22 — the associative-scan triangular solves."""
    jax = _jax()
    import numpy as np

    from arnoldimethod_tpu import TridiagonalShiftInvertOperator, partial_schur

    n = 6000
    dl = np.full(n - 1, -1.0)
    d = np.full(n, 2.0)
    du = np.full(n - 1, -1.001)
    t0 = time.perf_counter()
    si = TridiagonalShiftInvertOperator.build(dl, d, du, sigma=0.0, dtype=np.float32)
    _fence(si.factors[0])
    t_fact = time.perf_counter() - t0
    # Warm factorize: the cold number is dominated by jit compilation of
    # the device-upload path, not the O(n) host LU (VERDICT r3 weak #5).
    t0 = time.perf_counter()
    si = TridiagonalShiftInvertOperator.build(dl, d, du, sigma=0.0, dtype=np.float32)
    _fence(si.factors[0])
    t_fact_warm = time.perf_counter() - t0

    def solve():
        t0 = time.perf_counter()
        decomp, history = partial_schur(
            si, nev=10, which="LM", tol=1e-7, mindim=11, maxdim=22,
            method="host",
        )
        np.asarray(decomp.Q[:, :1])
        return time.perf_counter() - t0, decomp, history

    t_cold, _, _ = solve()
    walls = []
    for _ in range(3):
        t_w, decomp, history = solve()
        walls.append(t_w)
    t_warm, t_warm_med = _min_med(walls)

    lams = 0.0 + 1.0 / decomp.eigenvalues.real
    exact = 2.0 + 2.0 * np.sqrt(1.001) * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    eig_err = max(np.min(np.abs(exact - l)) for l in lams) / 4.003
    return {
        "shiftinv_factorize_s": round(t_fact, 3),
        "shiftinv_factorize_warm_s": round(t_fact_warm, 3),
        "shiftinv_wall_s": round(t_cold, 3),
        "shiftinv_wall_warm_s": t_warm,
        "shiftinv_wall_warm_med_s": t_warm_med,
        "shiftinv_matvecs": history.mvproducts,
        "shiftinv_converged": bool(history.converged),
        "shiftinv_eig_err": float(f"{eig_err:.3e}"),
    }


def kernels():
    """TPU-compiled Pallas validation (not interpret mode): stencil5 and
    BSR kernels vs the XLA formulations, allclose on device.  A Mosaic
    compile or alignment regression fails here instead of shipping green
    through the interpret-only CI tier."""
    jax = _jax()
    import numpy as np
    import jax.numpy as jnp

    out = {}
    # Stencil: Pallas vs XLA on a 256x256 grid, random input.
    op_p = _stencil_op(256, use_pallas=True)
    op_x = _stencil_op(256, use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (op_p.shape[0],), jnp.float32)
    y_p = np.asarray(jax.jit(op_p.matvec)(x))
    y_x = np.asarray(jax.jit(op_x.matvec)(x))
    err = float(np.max(np.abs(y_p - y_x)))
    out["kernels_stencil_max_err"] = float(f"{err:.3e}")
    out["kernels_stencil_ok"] = bool(err < 1e-5)

    # Sliding-window kernel (the single-chip auto path) compiled on TPU.
    op_s = _stencil_op(256, use_pallas="sliding")
    y_s = np.asarray(jax.jit(op_s.matvec)(x))
    err_s = float(np.max(np.abs(y_s - y_x)))
    out["kernels_stencil_sliding_max_err"] = float(f"{err_s:.3e}")
    out["kernels_stencil_sliding_ok"] = bool(err_s < 1e-5)

    # BSR: Pallas scalar-prefetch kernel vs einsum fallback.
    from arnoldimethod_tpu.models.operators import dense_to_bsr

    rng = np.random.default_rng(1)
    A = np.zeros((512, 512), dtype=np.float32)
    for i in range(0, 512, 128):
        for j in (0, 128, 256, 384):
            if rng.random() < 0.6:
                A[i : i + 128, j : j + 128] = rng.standard_normal((128, 128))
    op_bp = dense_to_bsr(A, block_size=128, use_pallas=True)
    op_be = dense_to_bsr(A, block_size=128, use_pallas=False)
    xb = jax.random.normal(jax.random.PRNGKey(2), (512,), jnp.float32)
    y_bp = np.asarray(jax.jit(op_bp.matvec)(xb))
    y_be = np.asarray(jax.jit(op_be.matvec)(xb))
    errb = float(np.max(np.abs(y_bp - y_be)))
    scale = float(np.max(np.abs(y_be))) or 1.0
    out["kernels_bsr_max_relerr"] = float(f"{errb / scale:.3e}")
    out["kernels_bsr_ok"] = bool(errb / scale < 1e-3)

    # df32 error-free transforms on the REAL TPU compiler: the double-word
    # kernels depend on products/sums being IEEE-rounded separately; a
    # Mosaic/XLA:TPU version that contracts FMAs or reassociates would
    # silently destroy the extended-precision path (docs/precision.md).
    from arnoldimethod_tpu.ops import df32

    s, e = jax.jit(df32.two_sum)(jnp.float32(3.0), jnp.float32(1e-9))
    out["kernels_df32_twosum_ok"] = bool(float(e) != 0.0)
    rng2 = np.random.default_rng(5)
    xd = rng2.standard_normal(4096).astype(np.float32)
    yd = rng2.standard_normal(4096).astype(np.float32)
    dh, dl = jax.jit(df32.df_dot)(jnp.asarray(xd), jnp.asarray(yd))
    exact = float(np.dot(xd.astype(np.float64), yd.astype(np.float64)))
    err_df = abs(float(dh) + float(dl) - exact) / float(np.sum(np.abs(xd * yd)))
    out["kernels_df32_dot_relerr"] = float(f"{err_df:.3e}")
    out["kernels_df32_ok"] = bool(
        out["kernels_df32_twosum_ok"] and err_df < 1e-12
    )
    return out


def spmv_csr():
    """Irregular-sparsity SpMV on one chip: a power-law row-length matrix
    (sprand-like) through (a) the CSR gather+segment_sum path and (b) the
    bucketed-ELL SELL layout (dense per-bucket reductions, no scatter)."""
    jax = _jax()
    import numpy as np
    import jax.numpy as jnp

    from arnoldimethod_tpu.models.operators import CsrOperator

    n = 1 << 20
    rng = np.random.default_rng(0)
    row_nnz = np.minimum(rng.zipf(1.8, size=n).astype(np.int64), 512)
    nnz = int(row_nnz.sum())
    indptr = np.zeros(n + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(row_nnz)
    indices = rng.integers(0, n, size=nnz).astype(np.int32)
    data = rng.standard_normal(nnz).astype(np.float32) * 0.05
    op = CsrOperator(indptr, indices, data, (n, n))
    dt = _spmv_time(op, 200)
    out = {
        "spmv_csr_gnnz_per_s": round(nnz / dt / 1e9, 3),
        "spmv_csr_us_per_iter": round(dt * 1e6, 2),
        "spmv_csr_nnz": nnz,
        "spmv_csr_max_row": int(row_nnz.max()),
    }
    sell = op.to_sell()
    dt_s = _spmv_time(sell, 200)
    out["spmv_sell_gnnz_per_s"] = round(nnz / dt_s / 1e9, 3)
    out["spmv_sell_us_per_iter"] = round(dt_s * 1e6, 2)
    out["spmv_sell_pad_frac"] = round(sell.nnz_stored / nnz - 1, 3)
    out["spmv_sell_vs_csr"] = round(dt / dt_s, 2)

    # Auto format selection (VERDICT r4 weak #5): a user handing this
    # sprand-style matrix to as_operator with DEFAULT arguments now gets
    # the SELL layout (and its rate) instead of silently running CSR.
    import scipy.sparse as sp

    from arnoldimethod_tpu.models.operators import SellOperator, as_operator

    S = sp.csr_matrix((data, indices, indptr), shape=(n, n))
    aop = as_operator(S)
    out["spmv_auto_format"] = type(aop).__name__
    dt_a = _spmv_time(aop, 200, reps=2)
    out["spmv_auto_gnnz_per_s"] = round(nnz / dt_a / 1e9, 3)
    out["spmv_auto_ok"] = bool(
        isinstance(aop, SellOperator) and dt_a <= 1.15 * dt_s
    )

    # The DENOMINATOR (VERDICT r3 #4): the platform's elementwise-gather
    # roofline.  Every irregular-memory primitive on this TPU (gather,
    # scatter-add, segment_sum, repeat) costs ~7-8 ns per element
    # ADDRESS (docs/sparse.md) — single-vector irregular SpMV cannot
    # beat it, so SELL is quoted as a fraction of this, not of the
    # streaming-format rooflines.
    import jax.numpy as jnp
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    gidx = jnp.asarray(indices)
    g = jax.jit(lambda x, i: x[i])
    _fence(g(x, gidx))
    t0 = time.perf_counter()
    for _ in range(20):
        r = g(x, gidx)
    _fence(r)
    dt_g = (time.perf_counter() - t0) / 20
    out["gather_roofline_gelem_s"] = round(nnz / dt_g / 1e9, 3)
    out["spmv_sell_vs_gather_roofline"] = round(dt_g / dt_s, 2)

    # The K-amortization lever: a K-wide row gather costs ONE address
    # per K elements, so block SpMM runs ~K-fold faster per vector —
    # this is what the ChebFSI block bootstrap and any block-Krylov
    # variant ride.
    K = 32
    X = jnp.asarray(rng.standard_normal((n, K)), jnp.float32)
    mm = jax.jit(sell.matmat)
    _fence(mm(X))
    t0 = time.perf_counter()
    for _ in range(20):
        r = mm(X)
    _fence(r)
    dt_mm = (time.perf_counter() - t0) / 20
    out["spmm_sell_k32_gnnzvec_per_s"] = round(nnz * K / dt_mm / 1e9, 2)
    out["spmm_sell_k32_vs_matvec"] = round(K * dt_s / dt_mm, 1)
    return out


def bsr():
    """BSR Pallas kernel throughput on a realistic clustered-sparse matrix:
    512 block-rows of 128x128 blocks, 8 blocks per row (n=65536, 67M
    stored nnz, ~268 MB of block data).  The matvec is HBM-bound on the
    block data, so effective GB/s vs the memcpy roofline is the honest
    metric; the einsum (non-Pallas) formulation is timed for context."""
    jax = _jax()
    import numpy as np
    import jax.numpy as jnp

    from arnoldimethod_tpu.models.operators import BsrOperator

    rng = np.random.default_rng(7)
    nbr, KB, B = 512, 8, 128
    n = nbr * B
    block_cols = np.sort(
        np.stack([rng.choice(nbr, size=KB, replace=False) for _ in range(nbr)]),
        axis=1,
    ).astype(np.int32)
    block_data = (rng.standard_normal((nbr, KB, B, B)) * 0.01).astype(np.float32)
    out = {}
    op_p = BsrOperator(block_cols, block_data, (n, n), use_pallas=True)
    dt_p = _spmv_time(op_p, 200)
    data_bytes = op_p.block_dataT.size * 4
    out["bsr_pallas_gnnz_per_s"] = round(op_p.nnz / dt_p / 1e9, 3)
    out["bsr_pallas_eff_gbs"] = round(data_bytes / dt_p / 1e9, 1)
    op_e = BsrOperator(block_cols, block_data, (n, n), use_pallas=False)
    dt_e = _spmv_time(op_e, 200)
    out["bsr_xla_gnnz_per_s"] = round(op_e.nnz / dt_e / 1e9, 3)
    out["bsr_pallas_vs_xla"] = round(dt_e / dt_p, 2)
    return out


PHASES = {
    "readme": readme_parity,
    "extended": extended_precision,
    "bsr": bsr,
    "spmv1m": lambda: spmv(1024, 1000),
    "spmv16m": lambda: spmv(4096, 300, key="spmv_16m"),
    "roofline": roofline,
    "e2e65k": e2e_65k_fused,
    "e2e1m": e2e_1m,
    "e2e10m": e2e_10m_nev100,
    "e2e16m": e2e_16m_nev20,
    "e2e1mdev": e2e_1m_device,
    "e2e1mcheb": e2e_1m_cheb,
    "conv": conv_diffusion,
    "conv1m": conv_1m_nonsym,
    "shiftinv": shift_invert,
    "kernels": kernels,
    "spmvcsr": spmv_csr,
    "complexsc": complex_sc,
    "complexscsparse": complex_sc_sparse,
}

# Order matters: the cheap/high-signal phases run first so a timeout tail
# cannot eat the primary metric.
PHASE_ORDER = [
    # Ordered by README-quote priority, not cost: in the tunnel's slow
    # latency mode every phase's compile chain stretches 2-3x and the
    # global budget truncates the TAIL of this list — so the primary
    # metric, the north star, and the headline capability phases run
    # first, and the forced-device regression pin runs last.
    "readme",
    "e2e10m",
    "e2e1mcheb",
    "extended",
    "shiftinv",
    "complexsc",
    "complexscsparse",
    "conv",
    "conv1m",
    "e2e65k",
    "spmv1m",
    "roofline",
    "kernels",
    "bsr",
    "spmv16m",
    "e2e1m",
    "e2e16m",
    "spmvcsr",
    "e2e1mdev",
]


def _run_phase_subprocess(name, timeout_s):
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", name],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        # Keep error values SHORT (~120 chars): the harness records only
        # the tail of the output line, and r4's 560-char traceback pushed
        # the primary metric keys out of the recorded window (VERDICT r4
        # weak #3).  The last line of stderr carries the exception type.
        err = (out.stderr or "no output").strip()
        last = err.splitlines()[-1] if err else "no output"
        return {f"{name}_error": last[-120:]}
    except subprocess.TimeoutExpired:
        return {f"{name}_timeout_s": round(timeout_s)}


def _emit(results):
    """Print the CUMULATIVE result line.  Called after every phase: the
    harness records only the output TAIL (~2 KB), so (a) the full line is
    re-printed after every phase, and (b) the keys that must survive any
    truncation — per-phase converged/ok flags, the north-star e2e10m
    summary, and the primary metric block — are emitted LAST (VERDICT r4
    weak #3: r4's artifact lost `metric`/`value` off the front)."""
    matvecs = results.get("value")

    def in_tail(k):
        return (
            k.endswith(("_converged", "_ok", "_error", "_timeout_s"))
            or k.startswith("e2e10m_nev100_")
            # The readme phase's flags have no prefix — keep them in the
            # tail too, or they are the first keys a truncation loses.
            or k in ("converged", "nconverged", "schur_residual",
                     "elapsed_s", "skipped_over_budget")
        )

    head = {k: v for k, v in results.items()
            if k != "value" and not in_tail(k)}
    tail = {k: v for k, v in results.items()
            if k != "value" and in_tail(k)}
    out = {
        **head,
        **tail,
        "metric": "matvecs_readme_laplacian100_nev10_sr_tol1e-6",
        "value": matvecs,
        "unit": "matvecs",
        "vs_baseline": round(174.0 / matvecs, 4) if matvecs else None,
    }
    print(json.dumps(out), flush=True)


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--phase":
        print(json.dumps(PHASES[sys.argv[2]]()))
        return

    only = None
    if len(sys.argv) >= 3 and sys.argv[1] == "--only":
        only = sys.argv[2].split(",")

    t_start = time.monotonic()
    results = {}
    order = only or PHASE_ORDER
    for i, name in enumerate(order):
        left = TOTAL_BUDGET_S - (time.monotonic() - t_start)
        if left < 30:
            results["skipped_over_budget"] = order[i:]
            _emit(results)
            break
        # Overrides RAISE the floor for the phases that need headroom;
        # a user-raised BENCH_PHASE_TIMEOUT_S is never capped below.
        phase_cap = max(
            PHASE_TIMEOUT_OVERRIDES_S.get(name, 0), PHASE_TIMEOUT_S
        )
        results.update(_run_phase_subprocess(name, min(phase_cap, left)))
        results["elapsed_s"] = round(time.monotonic() - t_start, 1)
        _emit(results)


if __name__ == "__main__":
    main()
