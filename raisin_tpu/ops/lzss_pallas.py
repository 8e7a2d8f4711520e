"""Pallas TPU kernel for the LZSS exact match search.

The XLA scan version (ops/lzss_jax) re-slices a (window+TILE) view of the
block from HBM every step — O(S/TILE × window) memory traffic dominates.
This kernel keeps everything resident in VMEM:

- the block bytes (S × int32),
- a CIRCULAR window buffer w: lane j holds the byte at the unique position
  p ≡ j (mod 4096) inside [i-4096, i-1] — exactly one (32, 128) int32 tile,
  updated with ONE scalar store per step as the window slides,
- the per-distance run lengths rl (one tile), updated in place: in
  d-indexing the recurrence rl[d] = eq ? rl[d]+1 : 0 needs no shifts.

Per position (descending i): one tile compare, one tile select-increment,
distance values d = ((i-1-j) & 4095) + 1 recomputed from an iota tile, a
min, and two max-reductions — ~10 VPU ops on one tile, no HBM access.

Semantics identical to ops.lzss_jax.find_matches_blocks (tests assert
equality and oracle byte-exactness end-to-end).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisin_tpu.ops import jax_setup  # noqa: F401

WINDOW = 4096
ROWS, COLS = 32, 128  # (32, 128) int32 tile == 4096 lanes
SENTINEL = -2  # plain int: jnp constants would be captured as kernel consts


STAGE_ROWS = 8  # results are staged in an (8, 128) tile, flushed per 1024 pos
STAGE = STAGE_ROWS * COLS


def _kernel(n_ref, x_ref, w0_ref, L_ref, D_ref, w, rl, Ls, Ds):
    # n_ref is scalar-prefetched: the full (B,) lengths array.
    # x_ref/L_ref/D_ref are (1, S//128, 128); w0_ref is (1, 32, 128).
    # Mosaic forbids scalar stores to VMEM, so all single-lane updates are
    # masked tile selects, and per-position results are staged in an
    # (8, 128) tile flushed with one vector store per 1024 positions.
    S = x_ref.shape[1] * COLS
    w[:] = w0_ref[0]
    rl[:] = jnp.zeros((ROWS, COLS), jnp.int32)
    J = (
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 0) * COLS
        + jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1)
    )
    Js = (
        jax.lax.broadcasted_iota(jnp.int32, (STAGE_ROWS, COLS), 0) * COLS
        + jax.lax.broadcasted_iota(jnp.int32, (STAGE_ROWS, COLS), 1)
    )
    n = n_ref[pl.program_id(0)]
    col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, COLS), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, COLS), 1)

    def read_x(idx):
        # Mosaic forbids element loads at dynamic LANE offsets; dynamic
        # sublane row loads are fine, so load the row and mask-reduce.
        row = x_ref[0, pl.ds(idx // COLS, 1), :]
        return jnp.sum(jnp.where(lane128 == idx % COLS, row, 0))

    def body(t, _):
        i = S - 1 - t
        xi = read_x(i)
        d = ((i - 1 - J) & (WINDOW - 1)) + 1
        eq = (w[:] == xi) & (xi >= 0)
        # lanes are position-indexed, so the run-length recurrence
        # rl(i, p) = eq ? rl(i+1, p+1) + 1 : 0 shifts one lane per step:
        # flattened roll by -1 = row-wise roll plus a column-127 fix that
        # pulls the next ROW's (rolled rows) first column.
        prev = rl[:]
        row_rolled = pltpu.roll(prev, shift=COLS - 1, axis=1)  # roll by -1
        first_col_next_row = pltpu.roll(prev[:, 0:1], shift=ROWS - 1, axis=0)
        shifted = jnp.where(col == COLS - 1, first_col_next_row, row_rolled)
        new_rl = jnp.where(eq, jnp.minimum(shifted + 1, WINDOW * 2), 0)
        rl[:] = new_rl
        cap = jnp.minimum(new_rl, d)
        L = jnp.max(cap)
        D = jnp.where(L > 0, jnp.max(jnp.where(cap == L, d, 0)), 0)
        valid = (L > 0) & (i < n)

        # stage the scalar result at lane i % STAGE via a masked select
        smask = Js == (i % STAGE)
        Ls[:] = jnp.where(smask, jnp.where(valid, L, 0), Ls[:])
        Ds[:] = jnp.where(smask, jnp.where(valid, D, 0), Ds[:])

        # processing descends, so lane (i % STAGE) == 0 completes a stage
        @pl.when(i % STAGE == 0)
        def _flush():
            r = (i // COLS) // STAGE_ROWS * STAGE_ROWS
            L_ref[0, pl.ds(r, STAGE_ROWS), :] = Ls[:]
            D_ref[0, pl.ds(r, STAGE_ROWS), :] = Ds[:]

        # slide the window: position i-1 leaves, i-1-WINDOW enters (same lane)
        p = i - 1 - WINDOW
        pc = jnp.maximum(p, 0)
        val = jnp.where(p >= 0, read_x(pc), SENTINEL)
        lane = (i - 1) & (WINDOW - 1)
        w[:] = jnp.where(J == lane, val, w[:])
        return 0

    jax.lax.fori_loop(0, S, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def find_matches_blocks_pallas(x: jax.Array, lengths: jax.Array, interpret: bool = False):
    """Exact per-position (L, D) for B blocks; window fixed at 4096.

    x: (B, S) int32 (-1 padded past lengths); S must be a multiple of 8.
    """
    B, S = x.shape

    # initial circular buffer per block: lane j <- x[p] for the unique
    # p ≡ j (mod 4096) in [S-1-4096, S-2] (sentinel where p < 0)
    base = S - 1 - WINDOW
    j = jnp.arange(WINDOW, dtype=jnp.int32)
    p = base + ((j - base) % WINDOW)
    w0 = jnp.where(
        (p >= 0)[None, :], x[:, jnp.clip(p, 0, S - 1)], SENTINEL
    ).astype(jnp.int32)

    if S % COLS != 0:
        raise ValueError(f"S must be a multiple of {COLS}")
    rows = S // COLS
    x3 = x.reshape(B, rows, COLS)
    w03 = w0.reshape(B, ROWS, COLS)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, COLS), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((1, ROWS, COLS), lambda b, n: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, COLS), lambda b, n: (b, 0, 0)),
            pl.BlockSpec((1, rows, COLS), lambda b, n: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((ROWS, COLS), jnp.int32),
            pltpu.VMEM((ROWS, COLS), jnp.int32),
            pltpu.VMEM((STAGE_ROWS, COLS), jnp.int32),
            pltpu.VMEM((STAGE_ROWS, COLS), jnp.int32),
        ],
    )
    L, D = pl.pallas_call(
        _kernel,
        out_shape=[
            jax.ShapeDtypeStruct((B, rows, COLS), jnp.int32),
            jax.ShapeDtypeStruct((B, rows, COLS), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(lengths.astype(jnp.int32), x3, w03)
    return L.reshape(B, S), D.reshape(B, S)
