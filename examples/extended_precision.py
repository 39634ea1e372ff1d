"""Extended precision: Double64-class tolerances on float32-only hardware.

The reference demonstrates converging the README Laplacian to tol=1e-28
by switching the element type to Double64 — double-word float64
arithmetic (ref: readme.md:81-105).  TPU hardware has no float64 units,
so the TPU-native analogue scales the same technique to the hardware's
word: `extended=True` carries the device-side work in double-word
FLOAT32 (ops/df32.py error-free transforms), reaching tolerances around
1e-12 where plain float32 stops at ~1e-6.

Measured on TPU v5-lite: 251 matvecs, Schur residual 1.6e-13, basis
orthonormality 4.6e-14.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from arnoldimethod_tpu import partial_schur
from arnoldimethod_tpu.models import laplacian_1d

op = laplacian_1d(100, dtype=np.float32)  # float32: the TPU device dtype

decomp, history = partial_schur(op, nev=10, which="SR", tol=1e-12,
                                extended=True)
print(history)

A = (
    np.diag(np.full(100, 2.0))
    + np.diag(np.full(99, -1.0), 1)
    + np.diag(np.full(99, -1.0), -1)
)
Q = np.asarray(decomp.Q)  # full double-word combine, float64
R = np.asarray(decomp.R)
print(f"Schur residual ||AQ - QR||   = {np.linalg.norm(A @ Q - Q @ R):.3e}")
print(f"orthonormality ||Q'Q - I||   = "
      f"{np.linalg.norm(Q.T @ Q - np.eye(10)):.3e}")
exact = np.sort(2 - 2 * np.cos(np.pi * np.arange(1, 101) / 101))[:10]
print(f"max eigenvalue error         = "
      f"{np.max(np.abs(np.sort(decomp.eigenvalues.real) - exact)):.3e}")
