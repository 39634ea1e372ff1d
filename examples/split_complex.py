"""Complex matrices on TPU: the split-complex path.

TPU runtimes cannot transfer complex arrays, so `partial_schur` carries
the Krylov basis as a real (re, im) pair on device automatically for
complex inputs (ops/sc_expansion.py).  The complex-only :LI target —
eigenvalues with the largest imaginary part — runs on TPU silicon.

Run:  python examples/split_complex.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from arnoldimethod_tpu import partial_schur

rng = np.random.default_rng(0)
n = 400
A = (
    rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
).astype(np.complex64) / np.sqrt(n)

decomp, history = partial_schur(A, nev=6, which="LI", tol=1e-5,
                                mindim=12, maxdim=24, restarts=500)
print(history)

Q = np.asarray(decomp.Q)
R = np.asarray(decomp.R)
A64 = A.astype(np.complex128)
print("Schur residual ||AQ - QR|| / ||A|| =",
      np.linalg.norm(A64 @ Q - Q @ R) / np.linalg.norm(A64))
print("largest-imaginary eigenvalues:")
print(np.round(decomp.eigenvalues, 4))
