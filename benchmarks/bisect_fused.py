"""Bisect the fused-path TPU worker crash at maxdim=80 x n=1M.

Run ONE configuration per process (the crash kills the worker):
    python benchmarks/bisect_fused.py GRID MAXDIM [RESTARTS]
Prints one OK/FAIL line.
"""
import sys
import time

import numpy as np


def main():
    grid = int(sys.argv[1])
    maxdim = int(sys.argv[2])
    restarts = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import jax.numpy as jnp
    from arnoldimethod_tpu import partial_schur
    from arnoldimethod_tpu.models.operators import Stencil5Operator

    s = 0.130
    op = Stencil5Operator(
        tuple(s * c for c in (4.0, -1.0, -1.0, -1.0, -1.0)),
        (grid, grid),
        dtype=jnp.float32,
    )
    t0 = time.perf_counter()
    decomp, hist = partial_schur(
        op, nev=maxdim // 4, which="SR", tol=1e-6,
        mindim=maxdim // 2, maxdim=maxdim, restarts=restarts,
        method="device",
    )
    np.asarray(decomp.Q[:, :1])
    print(
        f"OK grid={grid} n={grid*grid} maxdim={maxdim} restarts={restarts} "
        f"wall={time.perf_counter()-t0:.1f}s matvecs={hist.mvproducts}",
        flush=True,
    )


if __name__ == "__main__":
    main()
