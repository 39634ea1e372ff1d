"""Collective-structure guard: the compiled HLO of the sharded device
steps must contain exactly the communication the algorithm needs
(parallel/mesh.py module docstring), and nothing else.  A GSPMD or
layout regression that inserts resharding/all-gathers ships green through
numerical tests — it only shows up as communication, so assert on the
compiled HLO text directly (VERDICT r2 next-round item 4).

Counts of collectives are version-brittle; the assertions are structural:
which collective *kinds* appear, not how many.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from arnoldimethod_tpu.models.problems import laplacian_1d
from arnoldimethod_tpu.ops.expansion import (
    apply_basis_change,
    truncate_and_expand,
)
from arnoldimethod_tpu.parallel.mesh import (
    basis_sharding,
    make_mesh,
    replicated_sharding,
    shard_operator,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)

_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-permute",
    "reduce-scatter",
)


def _collective_kinds(hlo_text):
    return {
        op
        for op in _COLLECTIVES
        if re.search(rf"\b{op}\b", hlo_text) is not None
    }


def _sharded_inputs(mesh, n=1024, m=20):
    bsh = basis_sharding(mesh)
    rep = replicated_sharding(mesh)
    V = jax.device_put(jnp.zeros((m + 1, n)), bsh)
    H = jax.device_put(jnp.zeros((m + 1, m)), rep)
    Qbig = jax.device_put(jnp.eye(m + 1), rep)
    return V, H, Qbig


def test_basis_change_is_communication_free():
    """V <- Qbig^T V is elementwise in the sharded axis: the compiled
    program must contain NO collectives of any kind."""
    mesh = make_mesh(8)
    V, _, Qbig = _sharded_inputs(mesh)
    txt = (
        jax.jit(apply_basis_change, donate_argnums=(0,))
        .lower(V, Qbig)
        .compile()
        .as_text()
    )
    assert _collective_kinds(txt) == set(), _collective_kinds(txt)


def test_expansion_step_collective_structure():
    """The fused truncation+expansion step over a banded (Dia) operator:
    Gram-Schmidt contractions become all-reduces and the SpMV halo becomes
    collective-permutes; there must be NO all-gather / all-to-all /
    reduce-scatter (a full gather of x would mean GSPMD stopped treating
    the band exchange as a neighbor halo)."""
    mesh = make_mesh(8)
    op = shard_operator(laplacian_1d(1024), mesh)
    V, H, Qbig = _sharded_inputs(mesh)
    key = jax.random.PRNGKey(0)
    txt = (
        jax.jit(truncate_and_expand, donate_argnums=(1, 2))
        .lower(op, V, H, Qbig, 4, 20, key)
        .compile()
        .as_text()
    )
    kinds = _collective_kinds(txt)
    assert "all-reduce" in kinds, kinds  # the two DGKS psums + norms
    assert "collective-permute" in kinds, kinds  # banded halo exchange
    assert "all-gather" not in kinds, kinds
    assert "all-to-all" not in kinds, kinds
    assert "reduce-scatter" not in kinds, kinds
