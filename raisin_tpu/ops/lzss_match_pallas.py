"""Pallas TPU kernel v3 for the LZSS exact match search: blocks on lanes.

Replaces both earlier match paths (the XLA tiled scan in ops/lzss_jax and
the one-block-per-step Pallas v2 kernel) on the TPU container route. The
reference semantics being reproduced exactly (compressor/lz/lzss.go:119-130
+ bytes.Index leftmost-occurrence tie-break, lzss.go:418):

    L[i] = max_d min(LCP(x[i:], x[i-d:]), d)   for d in [1, window]
    D[i] = the LARGEST d achieving L[i]        (leftmost occurrence)

Design — why this layout wins on the VPU:

- 128 independent blocks ride the LANE axis, the window distances ride the
  SUBLANE-major axis: every per-position vector op covers (W, 128) elements
  with zero sublane padding and no per-position cross-lane reduce shuffles
  (the reduction over distances is a pairwise fold down the sublane-major
  axis). The XLA scan (ops/lzss_jax) carries a (B, wl) state whose
  per-position reduction lowers to long chains of narrow cross-lane ops;
  the v2 Pallas kernel processed ONE block per grid step and was
  issue-bound at (32, 128)-tile granularity. Both lose to this layout.
- The position loop runs over REVERSED bytes (y[k] = x[S-1-k]) so the
  descending-position forward-run recurrence rl[i, d] = eq ? rl[i+1, d]+1
  : 0 becomes an ascending scan whose window view y[k+1 : k+W+1] slides
  FORWARD — one dynamic-offset sublane slice per TS-position sub-tile, with
  static sub-slices inside.
- No validity masks in the inner loop: escaped LZSS bytes can never be
  0x3C ('<' is escaped to 0xFF, lzss.go:369), so out-of-range and
  past-length positions are filled with an 0x3C sentinel on the XLA side.
  A sentinel 'cur' never matches real window bytes, and sentinel-sentinel
  matches can only chain in the invalid tail (proof: a run reaching valid
  position i with i+1 invalid would need i+1-d >= n with d >= 1 and i < n —
  impossible), so run lengths at valid positions are exact.
- Everything is int32: v5e Mosaic does not legalize i16 vector min/cmp/
  shift, and implicit (1, LANES)/(W, 1) broadcasts create replicated mask
  layouts it cannot relayout — so the two broadcasts that exist are
  materialized with pltpu.repeat, and (L, D) leave the kernel packed in
  one int32 (L << 13 | D) to halve output VMEM.

The kernel grid is (block_groups, position_tiles); the run-length state
persists in VMEM scratch across position tiles and resets per block group.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisin_tpu.ops import jax_setup  # noqa: F401

LANES = 128
TS = 8  # positions per sub-tile (one dynamic window slice per TS positions)
SENTINEL = 0x3C  # '<' never occurs in escaped LZSS input (lzss.go:369)
DBITS = 13  # packed output: L << 13 | D (both <= 8191)


def _kernel(yA_ref, yB_ref, LD_ref, buf, rl_ref, window: int):
    g = pl.program_id(1)
    W = LD_ref.shape[1]  # position-tile size == padded window size

    # contiguous byte view y[gW : gW + 2W) for this tile's window reads
    buf[:W] = yA_ref[0].astype(jnp.int32)
    buf[W:] = yB_ref[0].astype(jnp.int32)

    @pl.when(g == 0)
    def _reset():
        rl_ref[:] = jnp.zeros((W, LANES), jnp.int32)

    # row r <-> distance d = r + 1; rows past ``window`` clamp dvec to 0,
    # which excludes them from both reductions (min(rl, 0) = 0)
    riota = jax.lax.broadcasted_iota(jnp.int32, (W, LANES), 0)
    dvec = jnp.where(riota + 1 <= window, riota + 1, 0)

    def maxfold(x):
        # pairwise fold down the sublane-major axis: cheap vreg-vs-vreg
        # maxes until the final 8 rows reduce natively
        n = x.shape[0]
        while n > 8:
            n //= 2
            x = jnp.maximum(x[:n], x[n : 2 * n])
        return jnp.max(x, axis=0, keepdims=True)  # (1, LANES)

    def sub_tile(s, rl):
        u0 = s * TS
        seg = buf[pl.ds(u0, W + TS)]  # (W + TS, LANES) bytes
        stage = []
        for t in range(TS):
            cur = jnp.broadcast_to(seg[t : t + 1], (W, LANES))
            win = seg[t + 1 : t + 1 + W]  # (W, LANES): row r = x[i - (r+1)]
            eq = win == cur
            grown = rl + 1
            cap = jnp.where(eq, jnp.minimum(grown, dvec), 0)
            rl = jnp.where(eq, grown, 0)
            Lrow = maxfold(cap)  # (1, LANES)
            hit = cap == jnp.broadcast_to(Lrow, (W, LANES))
            Drow = maxfold(jnp.where(hit, dvec, 0))
            Drow = jnp.where(Lrow > 0, Drow, 0)
            stage.append((Lrow << DBITS) | Drow)
        LD_ref[0, pl.ds(u0, TS), :] = jnp.concatenate(stage, axis=0)
        return rl

    rl = jax.lax.fori_loop(0, W // TS, sub_tile, rl_ref[:])
    rl_ref[:] = rl


@functools.partial(jax.jit, static_argnames=("window", "interpret"))
def find_matches_lanes(
    x: jax.Array, lengths: jax.Array, window: int = 4096, interpret: bool = False
):
    """Exact per-position (L, D) for B blocks (B % 128 == 0).

    Args:
      x: (B, S) int32 escaped block bytes, any values past ``lengths``.
      lengths: (B,) int32.
      window: search window (<= 8191; 4096 in the reference, lzss.go:35).

    Returns L, D: (B, S) int32 ((0, 0) where no match), matching
    ops.lzss_jax.find_matches_blocks bit for bit.
    """
    B, S = x.shape
    if B % LANES != 0:
        raise ValueError(f"B must be a multiple of {LANES}")
    if not 1 <= window <= 8191:
        raise ValueError("window must be in [1, 8191]")
    W = 256
    while W < min(window, S):
        W *= 2
    Sp = (S + W - 1) // W * W
    G = Sp // W
    nbg = B // LANES

    pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    xb = jnp.where(pos < lengths[:, None], x, SENTINEL).astype(jnp.uint8)
    if Sp > S:
        xb = jnp.pad(xb, ((0, 0), (0, Sp - S)), constant_values=SENTINEL)
    # (B, Sp) -> (nbg, Sp, 128) reversed: y[bg, k, l] = x[bg*128 + l, Sp-1-k]
    y = xb.reshape(nbg, LANES, Sp).transpose(0, 2, 1)[:, ::-1, :]
    # one extra all-sentinel tile: the last tile's forward window (x
    # positions i - d < 0) reads it instead of wrapping onto real bytes
    y = jnp.pad(y, ((0, 0), (0, W), (0, 0)), constant_values=SENTINEL)

    grid = (nbg, G)
    LD = pl.pallas_call(
        functools.partial(_kernel, window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, W, LANES), lambda bg, g: (bg, g, 0)),
            pl.BlockSpec((1, W, LANES), lambda bg, g: (bg, g + 1, 0)),
        ],
        out_specs=pl.BlockSpec((1, W, LANES), lambda bg, g: (bg, g, 0)),
        out_shape=jax.ShapeDtypeStruct((nbg, Sp, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2 * W, LANES), jnp.int32),
            pltpu.VMEM((W, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(y, y)

    # back to (B, S) position order, zeroed past each block's length
    ld = LD[:, ::-1, :].transpose(0, 2, 1).reshape(B, Sp)[:, :S]
    valid = pos < lengths[:, None]
    L = jnp.where(valid, ld >> DBITS, 0)
    D = jnp.where(valid, ld & ((1 << DBITS) - 1), 0)
    return L, D
