"""Multi-device tests on the virtual 8-device CPU mesh: the sharded solver
must produce the same answers as single-device, V must actually be
distributed, and the device step must compile and run under the mesh
shardings — the thing the reference cannot test at all (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from arnoldimethod_tpu import partial_schur
from arnoldimethod_tpu.models.problems import laplacian_1d, laplacian_2d
from arnoldimethod_tpu.parallel import (
    basis_sharding,
    make_mesh,
    shard_operator,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs a multi-device (CPU) mesh"
)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_partial_schur_matches_single_device():
    n = 256
    op = laplacian_1d(n)
    mesh = make_mesh(8)
    sharded_op = shard_operator(op, mesh)

    d0, h0 = partial_schur(op, nev=4, which="SR", tol=1e-8)
    d1, h1 = partial_schur(
        sharded_op, nev=4, which="SR", tol=1e-8, sharding=basis_sharding(mesh)
    )

    assert h1.converged
    # Identical algorithm, identical RNG seed => identical matvec counts.
    assert h1.mvproducts == h0.mvproducts
    assert np.allclose(
        np.sort(d0.eigenvalues.real), np.sort(d1.eigenvalues.real), atol=1e-10
    )

    # V/Q actually live distributed over the mesh.
    assert len(d1.Q.sharding.device_set) == 8


def test_sharded_2d_laplacian_residual():
    op = laplacian_2d(16, 16)  # n = 256
    mesh = make_mesh(8)
    sharded_op = shard_operator(op, mesh)
    decomp, history = partial_schur(
        sharded_op,
        nev=5,
        which="SR",
        tol=1e-8,
        sharding=basis_sharding(mesh),
    )
    assert history.converged

    # Verify the residual with a dense reconstruction via matvecs.
    n = op.shape[0]
    A = np.zeros((n, n))
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1
        A[:, i] = np.asarray(op.matvec(jnp.asarray(e)))
    Q = np.asarray(decomp.Q)
    R = np.asarray(decomp.R)
    assert np.linalg.norm(A @ Q - Q @ R) < 1e-6


def test_uneven_shard_sizes_clear_error():
    """n not divisible by the device count raises a clear error (padding a
    spectral problem is a problem-builder decision, not a silent default)."""
    op = laplacian_1d(250)  # not divisible by 8
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        shard_operator(op, mesh)


def test_smaller_mesh_subset():
    """A mesh over a subset of devices works too."""
    n = 128
    op = laplacian_1d(n)
    mesh = make_mesh(4)
    decomp, history = partial_schur(
        shard_operator(op, mesh),
        nev=3,
        which="SR",
        tol=1e-8,
        sharding=basis_sharding(mesh),
    )
    assert history.converged
    exact = np.sort(2 - 2 * np.cos(np.pi * np.arange(1, n + 1) / (n + 1)))[:3]
    assert np.allclose(np.sort(decomp.eigenvalues.real), exact, atol=1e-7)
