"""Pallas TPU kernel for BSR (block-sparse row) matvec.

The general-sparse path on TPU: the matrix is stored as dense (B, B)
blocks, each block-row holding up to KB blocks (padded, block-level ELL).
The kernel runs a (block_rows, KB-chunks) grid; the dense block data is
the only streamed operand (it dominates HBM traffic), pipelined through
VMEM by its BlockSpec, while x and y live *entirely in VMEM* as 2-D
(nblocks, B) arrays — x rows are fetched with dynamic sublane indexing
driven by the scalar-prefetched block-column indices, y rows accumulate
in place across KB-chunks.  Each (B, B) x (B,) product is one MXU matvec.

Why x/y are full-VMEM 2-D operands rather than blocked 1-D ones: Mosaic
requires a blocked operand's second-to-minor block dim to be a multiple
of 8 (so (1, B) blocks of a (nbc, B) array are rejected), and XLA gives
1-D f32 arrays tiled layouts (T(512)) that Mosaic's (B,) = T(128) block
assumption fails to match on real hardware — both dead ends are avoided
by keeping the vectors unblocked.  Cost: n is bounded by VMEM (~12 MB of
x + y), i.e. n <= ~1.5M rows; beyond that use the einsum fallback or
shard rows first.

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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bsr_matvec"]

# KB is processed in chunks of KC blocks so the streamed data block stays
# ~<= 1 MB per grid step (KC * B * B * 4 bytes at B=128 -> 64 KB * KC).
_KC = 8


def _kernel(bcols_ref, data_ref, x_ref, y_ref, *, kc_total):
    i = pl.program_id(0)
    kc = pl.program_id(1)
    KC, B = data_ref.shape[1], data_ref.shape[2]

    @pl.when(kc == 0)
    def _zero():
        y_ref[pl.ds(i, 1), :] = jnp.zeros((1, B), y_ref.dtype)

    # Gather the KC addressed x rows into a (KC*B, 1) operand, then ONE
    # MXU contraction sum_k D_k x_{c_k} = [D_0 .. D_{KC-1}] @ xcat.
    # (A fori_loop of per-block dots would need a loop-carried matmul
    # accumulator, which Mosaic rejects; dynamic row accesses go through
    # pl.ds — plain `ref[idx, :]` only lowers for offsets inside the
    # first (8, 128) tile.)
    xcat = jnp.concatenate(
        [x_ref[pl.ds(bcols_ref[i, kc * KC + k], 1), :] for k in range(KC)],
        axis=0,
    ).reshape(KC * B, 1)
    dflat = data_ref[0].transpose(1, 0, 2).reshape(B, KC * B)
    y_ref[pl.ds(i, 1), :] += jnp.dot(
        dflat, xcat, preferred_element_type=y_ref.dtype
    ).reshape(1, B)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bsr_matvec(block_cols, block_data, x, interpret=False):
    """y = A @ x with A in block-ELL/BSR form.

    block_cols: (nbr, KB) int32 — block column index per slot;
    block_data: (nbr, KB, B, B) — dense blocks (zero-padded slots);
    x: (n,) with n = nbc * B (nbc >= max block col + 1).
    """
    nbr, KB, B, _ = block_data.shape
    nbc = x.shape[0] // B

    # Pad KB up to a KC multiple (index map stays trivial), and the VMEM
    # vectors' sublane counts up to 8 (Mosaic (8, 128) tiling).
    KC = min(_KC, KB)
    kc_total = -(-KB // KC)
    if kc_total * KC != KB:
        pad = kc_total * KC - KB
        block_cols = jnp.pad(block_cols, ((0, 0), (0, pad)))
        block_data = jnp.pad(block_data, ((0, 0), (0, pad), (0, 0), (0, 0)))
    x2 = x.reshape(nbc, B)
    nbc_pad = -(-nbc // 8) * 8
    if nbc_pad != nbc:
        x2 = jnp.pad(x2, ((0, nbc_pad - nbc), (0, 0)))
    nbr_pad = -(-nbr // 8) * 8

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, kc_total),
        in_specs=[
            pl.BlockSpec(
                (1, KC, B, B), lambda i, kc, bcols: (i, kc, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x2, resident
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # y2, resident
    )

    y2 = pl.pallas_call(
        functools.partial(_kernel, kc_total=kc_total),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr_pad, B), x.dtype),
        interpret=interpret,
    )(block_cols, block_data, x2)
    return y2[:nbr].reshape(nbr * B)
