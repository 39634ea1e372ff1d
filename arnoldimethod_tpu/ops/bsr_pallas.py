"""Pallas TPU kernel for BSR (block-sparse row) matvec.

The general-sparse path on TPU: the matrix is stored as dense (B, B)
blocks, each block-row holding up to KB blocks (padded, block-level ELL).
The kernel runs a (block_rows, KB) grid where the *block column index is
scalar-prefetched* — Pallas fetches the needed x block by a data-dependent
index before the body runs, so the gather disappears into the pipeline's
DMAs and the arithmetic is dense (B, B) x (B,) MXU work.

Padding blocks point at block column 0 with zero data: they contribute
nothing and keep the grid static.

This is the layout for general sparsity with clustered structure; for
banded/stencil matrices DiaOperator / Stencil5Operator are strictly
better (no zero-fill).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bsr_matvec"]


def _kernel(bcols_ref, data_ref, x_ref, y_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    # x and y blocks are 1-D length-B vectors: Mosaic requires a block's
    # minor dim to be lane-divisible (128) and its second-to-minor
    # sublane-divisible (8); a (1, B) block of a (nbc, B) array violates
    # the latter, while 1-D (B,) blocks of flat arrays satisfy it
    # trivially (regression caught by bench.py's compiled-kernels tier).
    y_ref[...] += jnp.dot(
        data_ref[0, 0], x_ref[...], preferred_element_type=y_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_matvec(block_cols, block_data, x, interpret=False):
    """y = A @ x with A in block-ELL/BSR form.

    block_cols: (nbr, KB) int32 — block column index per slot;
    block_data: (nbr, KB, B, B) — dense blocks (zero-padded slots);
    x: (n,) with n = nbc * B (nbc >= max block col + 1).
    """
    nbr, KB, B, _ = block_data.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, KB),
        in_specs=[
            pl.BlockSpec(
                (1, 1, B, B), lambda i, k, bcols: (i, k, 0, 0)
            ),
            pl.BlockSpec((B,), lambda i, k, bcols: (bcols[i, k],)),
        ],
        out_specs=pl.BlockSpec((B,), lambda i, k, bcols: (i,)),
    )

    y = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * B,), x.dtype),
        interpret=interpret,
    )(block_cols, block_data, x)
    return y
