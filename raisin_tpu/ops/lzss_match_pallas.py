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
  with zero sublane padding. The XLA scan (ops/lzss_jax) carries a (B, wl)
  state whose per-position reduction lowers to long chains of narrow ops;
  the v2 Pallas kernel processed ONE block per grid step and was issue-bound
  at (32, 128)-tile granularity. Both lose 2-4x to this layout.
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
- The reduction is two int16 passes (max cap, then max distance among
  cap == L) instead of one packed int32 pass — same op count at half the
  register width, and the distance vector doubles as the window clamp
  (dvec = 0 past ``window`` makes min(rl, dvec) = 0 there).

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


def _kernel(yA_ref, yB_ref, L_ref, D_ref, buf, rl_ref, window: int):
    g = pl.program_id(1)
    W = L_ref.shape[1]  # position-tile size == padded window size

    # contiguous byte view y[gW : gW + 2W) for this tile's window reads
    buf[:W] = yA_ref[0]
    buf[W:] = yB_ref[0]

    @pl.when(g == 0)
    def _reset():
        rl_ref[:] = jnp.zeros((W, LANES), jnp.int16)

    riota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    # row r <-> distance d = r + 1; rows past ``window`` clamp to 0 so
    # min(rl, dvec) excludes them from both reductions
    dvec = jnp.where(riota + 1 <= window, riota + 1, 0).astype(jnp.int16)

    def max16(x):
        # pairwise sublane-axis fold (Mosaic lacks int16 reductions),
        # int32 only for the final 8 rows; returns (1, LANES) int16
        n = x.shape[0]
        while n > 8:
            n //= 2
            x = jnp.maximum(x[:n], x[n : 2 * n])
        return jnp.max(x.astype(jnp.int32), axis=0, keepdims=True).astype(jnp.int16)

    def sub_tile(s, rl):
        u0 = s * TS
        seg = buf[pl.ds(u0, W + TS)]  # (W + TS, LANES) bytes
        stageL = jnp.zeros((TS, LANES), jnp.int16)
        stageD = jnp.zeros((TS, LANES), jnp.int16)
        for t in range(TS):
            cur = seg[t : t + 1]  # (1, LANES)
            win = seg[t + 1 : t + 1 + W]  # (W, LANES): row r = x[i - (r+1)]
            eq = win == cur
            # clamp keeps rl in int16 on arbitrarily long runs; exact
            # because cap = min(rl, dvec) and dvec <= 8191 < 16383
            grown = jnp.minimum(rl + jnp.int16(1), jnp.int16(16383))
            cap = jnp.where(eq, jnp.minimum(grown, dvec), 0)
            rl = jnp.where(eq, grown, 0)
            Lrow = max16(cap)  # (1, LANES)
            Drow = max16(
                jnp.where(cap == Lrow, jnp.broadcast_to(dvec, cap.shape), 0)
            )
            Drow = jnp.where(Lrow > 0, Drow, 0)
            smask = (
                jax.lax.broadcasted_iota(jnp.int32, (TS, LANES), 0) == t
            )
            stageL = jnp.where(smask, Lrow, stageL)
            stageD = jnp.where(smask, Drow, stageD)
        L_ref[0, pl.ds(u0, TS), :] = stageL
        D_ref[0, pl.ds(u0, TS), :] = stageD
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
    Lr, Dr = pl.pallas_call(
        functools.partial(_kernel, window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, W, LANES), lambda bg, g: (bg, g, 0)),
            pl.BlockSpec((1, W, LANES), lambda bg, g: (bg, g + 1, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, W, LANES), lambda bg, g: (bg, g, 0)),
            pl.BlockSpec((1, W, LANES), lambda bg, g: (bg, g, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbg, Sp, LANES), jnp.int16),
            jax.ShapeDtypeStruct((nbg, Sp, LANES), jnp.int16),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * W, LANES), jnp.uint8),
            pltpu.VMEM((W, LANES), jnp.int16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(y, y)

    # back to (B, S) position order, zeroed past each block's length
    def unpack(a):
        a = a[:, ::-1, :].transpose(0, 2, 1).reshape(B, Sp)[:, :S].astype(jnp.int32)
        return jnp.where(pos < lengths[:, None], a, 0)

    return unpack(Lr), unpack(Dr)
