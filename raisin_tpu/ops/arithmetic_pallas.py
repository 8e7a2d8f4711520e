"""Pallas TPU kernel for the adaptive arithmetic encoder state machine.

The XLA ``lax.scan`` encoder (ops/arithmetic_scan.py) dispatches one fused
loop iteration per symbol with vmapped per-block gathers (``cum[sym]``) that
lower to slow TPU gather ops. This kernel removes every gather and keeps the
entire coder state resident in VMEM across the whole input:

- 1024 independent blocks per call, laid out as (8 sublanes x 128 lanes), so
  every per-block scalar (low/high/pending/count/frozen) is exactly one
  (8, 128) int32 vreg and each renormalization op costs one VPU instruction
  for all 1024 blocks;
- the 258-entry adaptive cumulative model lives as a (264, 8, 128) int32
  VMEM array; the per-symbol lookup ``(cum[sym], cum[sym+1])`` is ONE packed
  masked sum-reduction over the symbol axis (both 15-bit values packed into
  one int32 lane), and the model update (arithmetic.go:184's O(257) loop) is
  one masked vector add;
- ``cum[257]`` (the total count) is tracked as a separate scalar vreg so the
  hot loop never reads a single model row;
- the grid walks CHUNK-symbol slices of the input; Pallas double-buffers the
  symbol input and event output DMAs while scratch state persists across
  grid steps.

Output is the exact per-step event-slot record documented in
ops/arithmetic_scan.py (16 uint8-valued slots + a first-flush pending count
per step), so the downstream bit expansion / packing / concat path is shared
with — and tested against — the XLA encoder. Wire-format semantics follow
reference compressor/arithmetic/arithmetic.go:115-163 exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisin_tpu.ops import jax_setup  # noqa: F401

MAX_CODE = 0xFFFF
ONE_FOURTH = 0x4000
ONE_HALF = 0x8000
THREE_FOURTHS = 0xC000
MAX_FREQ = 16383
EOF = 256
RENORM_ITERS = 16

ROWS = 8  # preferred sublane rows of block-scalars (full int32 vregs)
LANES = 128
BLOCKS = ROWS * LANES  # preferred blocks per call
NSYM = 264  # 258 cumulative entries padded to a sublane multiple
NSYM2 = 132  # packed model: two 15-bit cumulative entries per int32 word
CHUNK = 128  # symbols per grid step
WORDS = RENORM_ITERS // 4  # 4 slot bytes packed per int32 output word


def _enc_kernel(sym_ref, len_ref, words_ref, slot0_ref, low, high, pend, cnt, frozen, cum):
    """One grid step: encode CHUNK symbols of all blocks in lockstep."""

    rows = len_ref.shape[0]
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        low[:] = jnp.zeros((rows, LANES), jnp.int32)
        high[:] = jnp.full((rows, LANES), MAX_CODE, jnp.int32)
        pend[:] = jnp.zeros((rows, LANES), jnp.int32)
        cnt[:] = jnp.full((rows, LANES), 257, jnp.int32)
        frozen[:] = jnp.zeros((rows, LANES), jnp.int32)
        cum[:] = jax.lax.broadcasted_iota(jnp.int32, (NSYM, rows, LANES), 0)

    n = len_ref[:]
    iota = jax.lax.broadcasted_iota(jnp.int32, (NSYM, rows, LANES), 0)

    def body(s, _):
        g = pid * CHUNK + s
        sym = sym_ref[s]
        active = g <= n  # payload symbols plus the EOF at position n

        lowv, highv, pendv = low[:], high[:], pend[:]
        cntv, frz = cnt[:], frozen[:]
        cumv = cum[:]

        symb = sym[None, :, :]
        # packed (lower, upper) lookup: both fit 15 bits (count <= 16640)
        sel = jnp.where(iota == symb, cumv, 0) + jnp.where(
            iota == symb + 1, cumv << 15, 0
        )
        red = jnp.sum(sel, axis=0)
        lower = red & 0x7FFF
        upper = red >> 15
        count = cntv

        # model update AFTER the read; freeze fires after the triggering
        # update (arithmetic.go:184-192)
        upd = active & (frz == 0)
        cum[:] = jnp.where((iota > symb) & upd[None], cumv + 1, cumv)
        newcnt = jnp.where(upd, cntv + 1, cntv)
        cnt[:] = newcnt
        frozen[:] = jnp.where(newcnt >= MAX_FREQ, 1, frz)

        diff = highv - lowv + 1
        nh = jnp.where(active, lowv + (diff * upper) // count - 1, highv)
        nl = jnp.where(active, lowv + (diff * lower) // count, lowv)

        done = ~active
        has_emitted = jnp.zeros((rows, LANES), jnp.bool_)
        slot0v = jnp.zeros((rows, LANES), jnp.int32)
        words = [jnp.zeros((rows, LANES), jnp.int32) for _ in range(WORDS)]
        for it in range(RENORM_ITERS):
            e1 = nh < ONE_HALF
            e2 = nl >= ONE_HALF
            e3 = (nl >= ONE_FOURTH) & (nh < THREE_FOURTHS)
            cont = (e1 | e2 | e3) & ~done
            emit = (e1 | e2) & cont
            straddle = cont & ~emit
            bit = jnp.where(e2, 1, 0)

            is_first = emit & ~has_emitted
            slot0v = jnp.where(is_first, pendv, slot0v)
            in_pend = jnp.where(is_first, 0, pendv)  # <= 15 when not first
            slot_val = jnp.where(
                emit,
                0x80 | (bit << 6) | jnp.where(is_first, 0x20, 0) | in_pend,
                0,
            )
            words[it // 4] = words[it // 4] | (slot_val << (8 * (it % 4)))
            has_emitted = has_emitted | emit

            pendv = jnp.where(emit, 0, jnp.where(straddle, pendv + 1, pendv))
            sub = jnp.where(straddle, ONE_FOURTH, jnp.where(e2, ONE_HALF, 0))
            nl = jnp.where(cont, (nl - sub) << 1, nl)
            nh = jnp.where(cont, ((nh - sub) << 1) + 1, nh)
            done = done | ~cont

        for w in range(WORDS):
            words_ref[s, w] = words[w]
        slot0_ref[s] = slot0v
        low[:] = nl
        high[:] = nh
        pend[:] = pendv
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_events(symbols: jax.Array, lengths: jax.Array, interpret: bool = False):
    """Encode rows*128 independent blocks; returns per-step event records.

    Args:
      symbols: (S, rows, LANES) int32 — block symbols with EOF (256) at
        position ``lengths`` (values past it are ignored). S % CHUNK == 0.
      lengths: (rows, LANES) int32 payload length per block.

    Returns:
      words: (S, WORDS, rows, LANES) int32 — 4 event-slot bytes per word,
        little-endian (slot layout as ops/arithmetic_scan docstring).
      slot0: (S, rows, LANES) int32 — carried pending flushed at each
        step's first emission.
    """
    S, rows, lanes = symbols.shape
    if lanes != LANES:
        raise ValueError(f"lane dim must be {LANES}")
    if S % CHUNK != 0:
        raise ValueError(f"S must be a multiple of {CHUNK}")
    grid = (S // CHUNK,)
    words, slot0 = pl.pallas_call(
        _enc_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHUNK, rows, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((rows, LANES), lambda g: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, WORDS, rows, LANES), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((CHUNK, rows, LANES), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, WORDS, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((S, rows, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((NSYM, rows, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(symbols, lengths)
    return words, slot0


# ---------------------------------------------------------------------------
# Fused encode + bit packing
#
# The gather-free serialization path: instead of emitting per-renorm event
# records for a later expansion pass (per-bit searchsorted gathers cost
# ~27 ns/element on TPU — unusable), every step APPENDS its output bits into
# a per-block 32-bit accumulator right inside the encoder:
#
#   step bits = [b0] [carried-pending run: ~b0 x carried] [rest <= 31 bits]
#
# where `rest` packs the 2nd..16th emissions with their in-step pending
# flushes (<= 15 emits + <= 15 pends). Both pieces are appended with ONE
# bounded branchless append each (<= 32 bits), so a step completes at most
# TWO 32-bit output words. Completed words are compacted IN-KERNEL into a
# per-chunk dense staging buffer (a masked vector write over STC slots per
# append — uniform addressing, fully vectorized over 1024 blocks), so the
# kernel's outputs are already dense per (block, chunk): a short sequential
# stitch (stitch_words: one visit per WORD, not per step) concatenates the
# chunk lists and a fully-vectorized XLA epilogue applies the `.rsn` prepad
# (bits.go:48) as a per-block bit shift plus byte swap. Carried pending > 31
# at a flush cannot be appended in one piece — those blocks set a sticky
# overflow flag (astronomically rare: it needs a >31-straddle run) and the
# host re-encodes them on the oracle path. A chunk overflowing STC words
# (impossible while count <= 16383 keeps 14.1 bits/symbol the ceiling; see
# STC note below) sets the same flag.


def _append32(acc, nb, v, w):
    """Append w (<=32) bits of v into the (acc, nb) bit accumulator.

    Returns (acc, nb, completed_word, completed_flag). Bits fill from the
    top (bit 31) down; at most one word completes since nb<32 and w<=32.
    """
    space = 32 - nb
    k1 = jnp.minimum(w, space)
    rem = w - k1
    top = _shr(v, rem)  # top k1 bits of the w-bit value
    acc = acc | _shl(top & _mask(k1), space - k1)
    nbt = nb + k1
    complete = (nbt >= 32) & (w > 0)
    word = acc
    acc = jnp.where(complete, _shl(v & _mask(rem), 32 - rem), acc)
    nb = jnp.where(complete, rem, nbt)
    return acc, nb, word, complete


def _mask(k):
    # (1 << k) - 1 for k in [0, 32]; 0 for k < 0
    s = jnp.clip(k, 0, 31)
    full = jnp.where(k >= 32, jnp.int32(-1), (jnp.int32(1) << s) - 1)
    return jnp.where(k < 0, 0, full)


def _shl(v, k):
    # v << k with k in [0, 32]; 0 for k >= 32 or k < 0
    r = v << jnp.clip(k, 0, 31)
    return jnp.where((k >= 32) | (k < 0), 0, r)


def _shr(v, k):
    # logical shift right for int32 lanes, k in [0, 32]
    u = v.astype(jnp.uint32) >> jnp.clip(k, 0, 31).astype(jnp.uint32)
    u = jnp.where(k >= 32, jnp.uint32(0), u)
    return u.astype(jnp.int32)


STC = 64  # staged words per chunk. Bound: the adaptive model's worst cost is
# log2(count) <= log2(16383) ~ 14.0 bits/symbol, so a CHUNK of 128 symbols
# emits <= ~14.1*128 bits ~ 57 words even with a released pending run; 64
# leaves slack, and overflow is caught by the sticky flag -> oracle retry.


def _pack_kernel(
    sym_ref, len_ref, chunk_ref, ccnt_ref, fin_ref,
    low, high, pend, cnt, frozen, acc, nb, flag, cum, stage,
):
    """Fused encoder: chunk-dense completed 32-bit words.

    Outputs per grid step: chunk (STC, rows, 128) completed words (dense,
    emission order) and ccnt (rows, 128) words in this chunk.
    fin (3, rows, 128): final acc, final nb, overflow flag.

    Per-block scalar state rides FORI-LOOP CARRIES (registers) within each
    chunk and touches the scratch refs only at chunk boundaries — per-step
    VMEM round trips on the (rows, 128) state were the dominant cost
    (~18 us/step measured on v5e), not the model or renorm arithmetic.
    """
    rows = len_ref.shape[0]
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        low[:] = jnp.zeros((rows, LANES), jnp.int32)
        high[:] = jnp.full((rows, LANES), MAX_CODE, jnp.int32)
        pend[:] = jnp.zeros((rows, LANES), jnp.int32)
        cnt[:] = jnp.full((rows, LANES), 257, jnp.int32)
        frozen[:] = jnp.zeros((rows, LANES), jnp.int32)
        acc[:] = jnp.zeros((rows, LANES), jnp.int32)
        nb[:] = jnp.zeros((rows, LANES), jnp.int32)
        flag[:] = jnp.zeros((rows, LANES), jnp.int32)
        # packed model: word w = cum[2w] | cum[2w+1] << 15 (init cum[i] = i)
        w2 = jax.lax.broadcasted_iota(jnp.int32, (NSYM2, rows, LANES), 0) * 2
        cum[:] = w2 | ((w2 + 1) << 15)

    # the staging buffer restarts empty every chunk
    stage[:] = jnp.zeros((STC, rows, LANES), jnp.int32)

    n = len_ref[:]
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (NSYM2, rows, LANES), 0)
    siota = jax.lax.broadcasted_iota(jnp.int32, (STC, rows, LANES), 0)

    def body(s, carry):
        lowv, highv, pendv, cntv, frz, accv, nbv, flagv, sidx = carry
        g = pid * CHUNK + s
        sym = sym_ref[s]
        active = g <= n

        cumv = cum[:]

        ws = (sym >> 1)[None, :, :]
        even = (sym & 1) == 0
        red0 = jnp.sum(jnp.where(iota2 == ws, cumv, 0), axis=0)
        red1 = jnp.sum(jnp.where(iota2 == ws + 1, cumv, 0), axis=0)
        lower = jnp.where(even, red0 & 0x7FFF, red0 >> 15)
        upper = jnp.where(even, red0 >> 15, red1 & 0x7FFF)
        count = cntv

        upd = active & (frz == 0)
        # +1 to every entry > sym: both halves of words past ws; only the
        # high half of word ws itself (and only when sym is even)
        incr = jnp.where(
            iota2 > ws,
            32769,
            jnp.where(iota2 == ws, jnp.where(even, 32768, 0)[None], 0),
        )
        cum[:] = cumv + jnp.where(upd[None], incr, 0)
        newcnt = jnp.where(upd, cntv + 1, cntv)
        newfrz = jnp.where(newcnt >= MAX_FREQ, 1, frz)

        diff = highv - lowv + 1
        nh = jnp.where(active, lowv + (diff * upper) // count - 1, highv)
        nl = jnp.where(active, lowv + (diff * lower) // count, lowv)

        done = ~active
        has_emitted = jnp.zeros((rows, LANES), jnp.bool_)
        b0 = jnp.zeros((rows, LANES), jnp.int32)
        carried = jnp.zeros((rows, LANES), jnp.int32)
        rest_pat = jnp.zeros((rows, LANES), jnp.int32)
        rest_len = jnp.zeros((rows, LANES), jnp.int32)
        for _ in range(RENORM_ITERS):
            e1 = nh < ONE_HALF
            e2 = nl >= ONE_HALF
            e3 = (nl >= ONE_FOURTH) & (nh < THREE_FOURTHS)
            cont = (e1 | e2 | e3) & ~done
            emit = (e1 | e2) & cont
            straddle = cont & ~emit
            bit = jnp.where(e2, 1, 0)

            is_first = emit & ~has_emitted
            b0 = jnp.where(is_first, bit, b0)
            carried = jnp.where(is_first, pendv, carried)
            # 2nd+ emissions: bit + in-step pending run, packed MSB-first
            later = emit & has_emitted
            width = 1 + pendv  # in-step pending <= 15 here
            piece = jnp.where(bit == 1, _shl(jnp.int32(1), pendv), _mask(pendv))
            rest_pat = jnp.where(later, _shl(rest_pat, width) | piece, rest_pat)
            rest_len = jnp.where(later, rest_len + width, rest_len)
            has_emitted = has_emitted | emit

            pendv = jnp.where(emit, 0, jnp.where(straddle, pendv + 1, pendv))
            sub = jnp.where(straddle, ONE_FOURTH, jnp.where(e2, ONE_HALF, 0))
            nl = jnp.where(cont, (nl - sub) << 1, nl)
            nh = jnp.where(cont, ((nh - sub) << 1) + 1, nh)
            done = done | ~cont

        # piece 1: first emitted bit + carried-pending run (~b0 x carried)
        w1 = jnp.where(has_emitted, 1 + carried, 0)
        flagv = jnp.where(w1 > 32, 1, flagv)
        w1 = jnp.minimum(w1, 32)
        v1 = jnp.where(b0 == 1, _shl(jnp.int32(1), w1 - 1), _mask(w1 - 1))

        accv, nbv, word_a, ca = _append32(accv, nbv, v1, w1)
        accv, nbv, word_b, cb = _append32(accv, nbv, rest_pat, rest_len)

        # dense in-chunk compaction: masked append of the completed words
        ca32 = ca.astype(jnp.int32)
        sa = sidx[None]
        stage[:] = jnp.where(
            (siota == sa) & ca[None],
            word_a[None],
            jnp.where((siota == sa + ca32[None]) & cb[None], word_b[None], stage[:]),
        )
        sidx = sidx + ca32 + cb.astype(jnp.int32)
        return (nl, nh, pendv, newcnt, newfrz, accv, nbv, flagv, sidx)

    zero = jnp.zeros((rows, LANES), jnp.int32)
    carry = (low[:], high[:], pend[:], cnt[:], frozen[:], acc[:], nb[:], flag[:], zero)
    lowv, highv, pendv, cntv, frz, accv, nbv, flagv, sidx = jax.lax.fori_loop(
        0, CHUNK, body, carry
    )
    low[:] = lowv
    high[:] = highv
    pend[:] = pendv
    cnt[:] = cntv
    frozen[:] = frz
    acc[:] = accv
    nb[:] = nbv
    flagv = jnp.where(sidx > STC, 1, flagv)  # chunk staging overflow, sticky
    flag[:] = flagv

    chunk_ref[0] = stage[:]
    ccnt_ref[0] = sidx
    fin_ref[0] = accv
    fin_ref[1] = nbv
    fin_ref[2] = flagv


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_chunked_words(symbols: jax.Array, lengths: jax.Array, interpret: bool = False):
    """Fused encode+pack: chunk-dense completed words, gather-free.

    Args:
      symbols: (S, rows, 128) int32, EOF at position ``lengths``.
      lengths: (rows, 128) int32.

    Returns:
      chunks: (S // CHUNK, STC, rows, 128) int32 — completed 32-bit words
        (bit 31 first), dense per chunk, in emission order.
      ccnts:  (S // CHUNK, rows, 128) int32 — words completed per chunk.
      fin:    (3, rows, 128) int32 — [final acc, final nb, overflow flag].
    """
    S, rows, lanes = symbols.shape
    if lanes != LANES:
        raise ValueError(f"lane dim must be {LANES}")
    if S % CHUNK != 0:
        raise ValueError(f"S must be a multiple of {CHUNK}")
    G = S // CHUNK
    return pl.pallas_call(
        _pack_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((CHUNK, rows, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((rows, LANES), lambda g: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, STC, rows, LANES), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((3, rows, LANES), lambda g: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, STC, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((3, rows, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((NSYM2, rows, LANES), jnp.int32),
            pltpu.VMEM((STC, rows, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(symbols, lengths)


def _stitch_kernel(cnt_ref, chunks_ref, out_ref, widx_ref, stc: int):
    """Concatenate per-chunk dense word lists into contiguous block rows.

    Grid (blocks, chunk segments): the output lives in SMEM so each emitted
    word is ONE scalar store (the VMEM-tile staging of v1 cost ~84
    cycles/word), and the chunk words arrive FLATTENED per segment — an
    SMEM (1, C, stc) window pads the minor dim to 128, and even flattened
    a whole-block window blows the 1 MiB SMEM budget once C reaches a few
    thousand chunks (64 KiB Huffman blocks), so segments of SEG chunks
    stream through while the write cursor carries in SMEM scratch. No bit
    shifting here — the `.rsn` prepad alignment and byte swap are a
    fully-vectorized XLA epilogue (see encode_rows). Trailing garbage past
    the final word is cleared for exactly one slot (the epilogue injects
    the final partial word there and requires a zero read-back).
    """
    cs = pl.program_id(1)
    ncs = pl.num_programs(1)
    seg = cnt_ref.shape[2]
    capw = out_ref.shape[2]

    @pl.when(cs == 0)
    def _reset():
        widx_ref[0] = 0

    def chunk_body(c, widx):
        m = jnp.minimum(cnt_ref[0, 0, c], stc)
        base = c * stc

        def pair_body(k, _):
            out_ref[0, 0, jnp.minimum(widx + 2 * k, capw - 1)] = chunks_ref[
                0, 0, base + 2 * k
            ]

            @pl.when(2 * k + 1 < m)
            def _odd():
                out_ref[0, 0, jnp.minimum(widx + 2 * k + 1, capw - 1)] = chunks_ref[
                    0, 0, base + 2 * k + 1
                ]

            return 0

        jax.lax.fori_loop(0, (m + 1) // 2, pair_body, 0)
        return widx + m

    widx = jax.lax.fori_loop(0, seg, chunk_body, widx_ref[0])
    widx_ref[0] = widx

    @pl.when(cs == ncs - 1)
    def _tail():
        out_ref[0, 0, jnp.minimum(widx, capw - 1)] = 0


@functools.partial(jax.jit, static_argnames=("capw", "interpret"))
def stitch_words(
    chunks_b: jax.Array, cnts_b: jax.Array, capw: int, interpret: bool = False
):
    """(B, C, STC) chunk words + (B, C) counts -> (B, capw) contiguous words."""
    B, C, stc = chunks_b.shape
    if capw % 512 != 0:
        raise ValueError("capw must be a multiple of 512")
    SEG = min(C, 512)
    ncs = (C + SEG - 1) // SEG
    if C % SEG:
        padc = ncs * SEG - C
        cnts_b = jnp.pad(cnts_b, ((0, 0), (0, padc)))
        chunks_b = jnp.pad(chunks_b, ((0, 0), (0, padc), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_stitch_kernel, stc=stc),
        grid=(B, ncs),
        in_specs=[
            pl.BlockSpec((1, 1, SEG), lambda b, cs: (b, 0, cs), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, SEG * stc), lambda b, cs: (b, 0, cs), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, capw), lambda b, cs: (b, 0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, capw), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        cnts_b.reshape(B, 1, ncs * SEG),
        chunks_b.reshape(B, 1, ncs * SEG * stc),
    )
    return out.reshape(B, capw)


def _assemble_rows(chunks, ccnts, fin, B: int, capw: int, interpret: bool):
    """Chunk-dense kernel outputs -> (rows, byte_lens, oflow).

    The lane-major -> block-major reshuffles are phrased as plain 2D
    transposes (the 4D transpose lowers ~7x slower on TPU XLA)."""
    G = chunks.shape[0]
    chunks_b = chunks.reshape(G * STC, B).T.reshape(B, G, STC)
    cnts_b = ccnts.reshape(G, B).T.reshape(B, G)
    fin_b = fin.reshape(3, B)
    facc, fnb, oflow = fin_b[0], fin_b[1], fin_b[2]
    nwords = jnp.sum(cnts_b, axis=1)
    raw = stitch_words(chunks_b, cnts_b, capw, interpret=interpret)

    # XLA epilogue: inject the final partial word, apply the `.rsn` prepad
    # (bits.go:48: (8 - bits % 8) bits, pattern 0..01, PREPENDED) as a
    # per-block bit shift, and byte-swap so the little-endian host view of
    # each int32 row reads as the big-endian `.rsn` bit stream.
    total_bits = nwords * 32 + fnb
    pad = 8 - total_bits % 8  # 1..8
    j = jnp.arange(capw, dtype=jnp.int32)[None, :]
    full = raw + jnp.where(j == nwords[:, None], facc[:, None], 0)
    prev = jnp.concatenate(
        [jnp.ones((B, 1), jnp.int32), full[:, :-1]], axis=1
    )  # virtual word -1 = the 0..01 pad pattern right-aligned
    p = pad[:, None].astype(jnp.uint32)
    u = full.astype(jnp.uint32)
    shifted = ((prev.astype(jnp.uint32) << (32 - p)) | (u >> p)).astype(jnp.uint32)
    sw = (
        (shifted >> 24)
        | ((shifted >> 8) & 0xFF00)
        | ((shifted & 0xFF00) << 8)
        | (shifted << 24)
    ).astype(jnp.int32)
    byte_lens = (pad + total_bits) // 8
    return sw, byte_lens, oflow


@functools.partial(jax.jit, static_argnames=("capw", "interpret"))
def encode_rows(
    symbols: jax.Array, lengths: jax.Array, capw: int, interpret: bool = False
):
    """Fully-fused device arithmetic encode: blocks in, `.rsn` byte rows out.

    Args:
      symbols: (B, S) int32, EOF (256) at position ``lengths[b]``; B % 128
        == 0, S % CHUNK == 0. rows = B // 128 should stay <= 32 (VMEM).
      lengths: (B,) int32.
      capw: static per-block output capacity in 32-bit words (multiple of
        512). Caller retries with a larger bucket when byte_lens exceeds
        capw * 4 (output rows are clamped, never out of bounds).

    Returns:
      rows: (B, capw) int32 — per-block `.rsn` stream; view the row's
        little-endian bytes directly as the stream bytes.
      byte_lens: (B,) int32.
      oflow: (B,) int32 — sticky flag for blocks whose carried-pending run
        exceeded one 32-bit append or whose chunk staging overflowed
        (re-encode those on the host oracle).
    """
    B, S = symbols.shape
    rows = B // LANES
    sy = symbols.T.reshape(S, rows, LANES)
    ln = lengths.reshape(rows, LANES)
    chunks, ccnts, fin = encode_chunked_words(sy, ln, interpret=interpret)
    return _assemble_rows(chunks, ccnts, fin, B, capw, interpret)


@functools.partial(jax.jit, static_argnames=("steps", "capw", "interpret"))
def encode_rows_from_words(
    tokw: jax.Array,
    lengths: jax.Array,
    steps: int,
    capw: int,
    interpret: bool = False,
):
    """Arithmetic encode taking the symbol stream as PACKED 32-bit words.

    Saves 4x on the lane-major transpose vs encode_rows: the (B, Sw)
    little-endian word matrix is transposed as-is and unpacked on the far
    side; the EOF symbol (256) is injected at position ``lengths[b]``
    (word-packed payloads cannot carry 9-bit symbols).

    Args:
      tokw: (B, Sw) int32, 4 little-endian payload bytes per word.
      lengths: (B,) int32 payload symbol counts (< 4 * Sw).
      steps: static scan length, multiple of CHUNK, 4 * Sw >= steps >
        max(lengths).
    """
    B, Sw = tokw.shape
    rows = B // LANES
    if steps % CHUNK != 0 or steps > 4 * Sw:
        raise ValueError("steps must be a CHUNK multiple <= 4 * Sw")
    wt = tokw.T.reshape(Sw, rows, LANES)
    # unpack 4 bytes per word along the step axis
    b4 = jnp.stack(
        [(wt >> (8 * k)) & 0xFF for k in range(4)], axis=1
    ).reshape(4 * Sw, rows, LANES)[:steps]
    ln = lengths.reshape(rows, LANES)
    giota = jax.lax.broadcasted_iota(jnp.int32, (steps, rows, LANES), 0)
    sy = jnp.where(giota == ln[None], EOF, b4)
    chunks, ccnts, fin = encode_chunked_words(sy, ln, interpret=interpret)
    return _assemble_rows(chunks, ccnts, fin, B, capw, interpret)


# ---------------------------------------------------------------------------
# Decode


DEC_G = 32  # words per fetch group of the decode bit-supply window
DEC_NW = 4  # groups resident per grid step (window = 128 words = 4096 bits)


def _dec_kernel(words_ref, len_ref, out_ref, eof_ref, value, low, high, cnt, frozen,
                hi, lo, avail, wptr, cum, win):
    """Vectorized arithmetic decode: all blocks in lockstep.

    Bit supply: a per-block 64-bit window (hi, lo) refilled one 32-bit word
    per step from a small per-chunk prefetch window ``win`` (DEC_NW * DEC_G
    words per lane). The window is rebuilt once per grid step from the
    VMEM word array with DEC_NW masked group reductions, so the per-step
    fetch is a reduction over 128 slots instead of the whole capw-word
    stream (the O(capw)-per-refill reduction dominated decode before).
    Coverage invariant: a CHUNK of 128 steps consumes <= 128*16 + 64 bits
    = 66 words, and the window base is group-aligned (<= 31 words behind
    wptr), so 128 resident words always suffice. Slots past the stream
    reduce to 0, which IS the reference's exhausted-read zero-fill
    (bits.go:12). The decoder tail bit (arithmetic.go:48) is pre-injected
    by the wrapper.
    """
    rows = len_ref.shape[0]
    pid = pl.program_id(0)
    capw = words_ref.shape[0]
    iota2 = jax.lax.broadcasted_iota(jnp.int32, (NSYM2, rows, LANES), 0)
    win_iota = jax.lax.broadcasted_iota(jnp.int32, (DEC_NW * DEC_G, rows, LANES), 0)
    n = len_ref[:]

    def take(hiv, lov, av, k):
        """Consume k (<=16, per-lane) bits; returns them right-aligned."""
        bits = _shr(hiv, 32 - k)
        hiv = _shl(hiv, k) | _shr(lov, 32 - k)
        lov = _shl(lov, k)
        return bits, hiv, lov, av - k

    @pl.when(pid == 0)
    def _init():
        cnt[:] = jnp.full((rows, LANES), 257, jnp.int32)
        frozen[:] = jnp.zeros((rows, LANES), jnp.int32)
        # packed model: word w = cum[2w] | cum[2w+1] << 15 (init cum[i] = i)
        w2 = jax.lax.broadcasted_iota(jnp.int32, (NSYM2, rows, LANES), 0) * 2
        cum[:] = w2 | ((w2 + 1) << 15)
        low[:] = jnp.zeros((rows, LANES), jnp.int32)
        high[:] = jnp.full((rows, LANES), MAX_CODE, jnp.int32)
        eof_ref[:] = jnp.zeros((rows, LANES), jnp.int32)
        # the first two refills have a uniform word pointer: static reads
        h, l = words_ref[0], words_ref[1]
        a = jnp.full((rows, LANES), 64, jnp.int32)
        w = jnp.full((rows, LANES), 2, jnp.int32)
        # strip the 0..01 prepad: up to 8 leading zeros then the sentinel 1
        pad_done = jnp.zeros((rows, LANES), jnp.bool_)
        for _ in range(8):
            bit = _shr(h, 31)
            adv = ~pad_done
            h = jnp.where(adv, _shl(h, 1) | _shr(l, 31), h)
            l = jnp.where(adv, _shl(l, 1), l)
            a = a - adv.astype(jnp.int32)
            pad_done = pad_done | (adv & (bit == 1))
        v, h, l, a = take(h, l, a, jnp.full((rows, LANES), 16, jnp.int32))
        value[:] = v
        hi[:] = h
        lo[:] = l
        avail[:] = a
        wptr[:] = w

    # per-chunk prefetch window: DEC_NW group reductions over the word
    # stream, each filling DEC_G words for every lane at its own group base
    gb = wptr[:] // DEC_G
    wv = words_ref[:].reshape(capw // DEC_G, DEC_G, rows, LANES)
    seg_iota = jax.lax.broadcasted_iota(
        jnp.int32, (capw // DEC_G, 1, rows, LANES), 0
    )
    for k in range(DEC_NW):
        win[k * DEC_G : (k + 1) * DEC_G] = jnp.sum(
            jnp.where(seg_iota == (gb + k)[None, None], wv, 0), axis=0
        )
    base = gb * DEC_G

    def refill(hiv, lov, av, wp):
        need = av <= 32
        li = wp - base  # in [0, DEC_NW * DEC_G) by the chunk coverage bound
        w = jnp.sum(jnp.where(win_iota == li[None], win[:], 0), axis=0)
        hiv = jnp.where(need & (av < 32), hiv | _shr(w, av), hiv)
        lov = jnp.where(
            need,
            lov | jnp.where(av < 32, _shl(w, 32 - av), _shr(w, av - 32)),
            lov,
        )
        av = jnp.where(need, av + 32, av)
        wp = jnp.where(need, wp + 1, wp)
        return hiv, lov, av, wp

    def body(s, carry):
        # per-block scalar state rides fori carries (registers); only the
        # packed model and the word stream live in VMEM refs (see
        # _pack_kernel: per-step ref round trips were the dominant cost)
        val, lowv, highv, cntv, frz, hiv0, lov0, av0, wp0, eofv = carry
        g = pid * CHUNK + s
        active = g <= n

        hiv, lov, av, wp = refill(hiv0, lov0, av0, wp0)

        cumv = cum[:]

        diff = highv - lowv + 1
        scaled = ((val - lowv + 1) * cntv - 1) // diff
        # count entries i in [1, 257] with cum[i] <= scaled, on packed words
        # (entry 2w in the low half, 2w+1 in the high half; entry-index
        # range masks are per-word constants)
        sc = scaled[None]
        cnt_lo = ((iota2 >= 1) & (iota2 <= 128) & ((cumv & 0x7FFF) <= sc)).astype(
            jnp.int32
        )
        cnt_hi = ((iota2 <= 128) & ((cumv >> 15) <= sc)).astype(jnp.int32)
        sym = jnp.sum(cnt_lo + cnt_hi, axis=0)
        sym = jnp.minimum(sym, 256)
        ws = (sym >> 1)[None]
        even = (sym & 1) == 0
        red0 = jnp.sum(jnp.where(iota2 == ws, cumv, 0), axis=0)
        red1 = jnp.sum(jnp.where(iota2 == ws + 1, cumv, 0), axis=0)
        lower = jnp.where(even, red0 & 0x7FFF, red0 >> 15)
        upper = jnp.where(even, red0 >> 15, red1 & 0x7FFF)
        count = cntv

        upd = active & (frz == 0)
        incr = jnp.where(
            iota2 > ws,
            32769,
            jnp.where(iota2 == ws, jnp.where(even, 32768, 0)[None], 0),
        )
        cum[:] = cumv + jnp.where(upd[None], incr, 0)
        newcnt = jnp.where(upd, cntv + 1, cntv)
        newfrz = jnp.where(newcnt >= MAX_FREQ, 1, frz)

        is_eof = sym == EOF
        eofv = jnp.where(active & (g == n), is_eof.astype(jnp.int32), eofv)
        act = active & ~is_eof

        nh = jnp.where(act, lowv + (diff * upper) // count - 1, highv)
        nl = jnp.where(act, lowv + (diff * lower) // count, lowv)

        done = ~act
        for _ in range(RENORM_ITERS):
            e1 = nh < ONE_HALF
            e2 = nl >= ONE_HALF
            e3 = (nl >= ONE_FOURTH) & (nh < THREE_FOURTHS)
            cont = (e1 | e2 | e3) & ~done
            sub = jnp.where(e2, ONE_HALF, jnp.where(e3 & ~e1, ONE_FOURTH, 0))
            bit = _shr(hiv, 31)
            val = jnp.where(cont, ((val - sub) << 1) + bit, val)
            hiv = jnp.where(cont, _shl(hiv, 1) | _shr(lov, 31), hiv)
            lov = jnp.where(cont, _shl(lov, 1), lov)
            av = av - cont.astype(jnp.int32)
            nl = jnp.where(cont, (nl - sub) << 1, nl)
            nh = jnp.where(cont, ((nh - sub) << 1) + 1, nh)
            done = done | ~cont

        out_ref[s] = jnp.where(active & ~is_eof, sym, 0)
        return (val, nl, nh, newcnt, newfrz, hiv, lov, av, wp, eofv)

    carry = (
        value[:], low[:], high[:], cnt[:], frozen[:],
        hi[:], lo[:], avail[:], wptr[:], eof_ref[:],
    )
    val, nl, nh, cntv, frz, hiv, lov, av, wp, eofv = jax.lax.fori_loop(
        0, CHUNK, body, carry
    )
    value[:] = val
    low[:] = nl
    high[:] = nh
    cnt[:] = cntv
    frozen[:] = frz
    hi[:] = hiv
    lo[:] = lov
    avail[:] = av
    wptr[:] = wp
    eof_ref[:] = eofv


@functools.partial(jax.jit, static_argnames=("num_steps", "interpret"))
def decode_words(words: jax.Array, out_lens: jax.Array, num_steps: int | None = None, interpret: bool = False):
    """Device arithmetic decode of rows*128 blocks in lockstep.

    Args:
      words: (capw, rows, 128) int32 — per-block streams as 32-bit words,
        bit 31 of word 0 = first stream bit (prepad included); the [1, 0]
        decoder tail must already be injected (see decode_rows).
      out_lens: (rows, 128) int32 known decoded byte counts.
      num_steps: static number of decode steps (>= max(out_lens) + 1),
        multiple of CHUNK. Defaults from the words shape is not possible —
        pass explicitly.

    Returns (syms (num_steps, rows, 128) int32, eof_ok (rows, 128) int32).
    """
    capw, rows, lanes = words.shape
    if capw % DEC_G != 0:
        raise ValueError(f"capw must be a multiple of {DEC_G}")
    S = num_steps
    grid = (S // CHUNK,)
    return pl.pallas_call(
        _dec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((capw, rows, LANES), lambda g: (0, 0, 0)),
            pl.BlockSpec((rows, LANES), lambda g: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK, rows, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((rows, LANES), lambda g: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.int32)] * 9
        + [
            pltpu.VMEM((NSYM2, rows, LANES), jnp.int32),
            pltpu.VMEM((DEC_NW * DEC_G, rows, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # 64 KiB-block payload streams overflow the 16M default scoped
            # cap; v5e VMEM is comfortably larger (verified empirically)
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(words, out_lens.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("num_steps", "interpret"))
def decode_rows(
    payload_rows: jax.Array,
    byte_lens: jax.Array,
    out_lens: jax.Array,
    num_steps: int,
    interpret: bool = False,
):
    """(B, capb) uint8 `.rsn` payload rows -> (B, num_steps) decoded bytes.

    byte_lens: (B,) payload sizes; out_lens: (B,) known decoded sizes.
    B % 128 == 0; capb % 4 == 0; num_steps % CHUNK == 0.
    """
    B, capb = payload_rows.shape
    rows = B // LANES
    capw = capb // 4
    if num_steps % 4 != 0:
        raise ValueError("num_steps must be a multiple of 4")
    # big-endian 32-bit words: bit 31 of word j = stream bit 32j
    w4 = payload_rows.reshape(B, capw, 4).astype(jnp.uint32)
    sh = jnp.array([24, 16, 8, 0], dtype=jnp.uint32)
    words = jnp.sum(w4 << sh[None, None, :], axis=-1).astype(jnp.int32)
    # inject the decoder tail bit 1 right after the payload (arithmetic.go:48)
    tail_bit = byte_lens * 8
    j = jnp.arange(capw, dtype=jnp.int32)[None, :]
    mask = (jnp.int32(1) << (31 - (tail_bit % 32)))[:, None]
    words = jnp.where(j == (tail_bit // 32)[:, None], words | mask, words)
    # lane-major reshuffles as 2D transposes (4D transposes lower ~7x slower),
    # with the output packed 4 decoded bytes per word before transposing back
    wt = words.T.reshape(capw, rows, LANES)
    ol = out_lens.reshape(rows, LANES)
    syms, eof = decode_words(wt, ol, num_steps=num_steps, interpret=interpret)
    s4 = syms.reshape(num_steps // 4, 4, rows, LANES)
    packed = (
        s4[:, 0] | (s4[:, 1] << 8) | (s4[:, 2] << 16) | (s4[:, 3] << 24)
    ).reshape(num_steps // 4, B)
    syms_b = jax.lax.bitcast_convert_type(packed.T, jnp.uint8).reshape(B, num_steps)
    return syms_b, eof.reshape(B)


@functools.partial(jax.jit, static_argnames=("interpret",))
def encode_blocks_events(symbols: jax.Array, lengths: jax.Array, interpret: bool = False):
    """(B, S) int32 symbols + (B,) lengths -> slots (B, S, 16) + slot0 (B, S).

    Drop-in producer of the XLA encoder's event record (the downstream bit
    expansion is shared). B must be a multiple of 128 (pad with empty
    blocks); multiples of 1024 give full vector-register utilization.
    """
    B, S = symbols.shape
    if B % LANES != 0:
        raise ValueError(f"B must be a multiple of {LANES}; pad with empty blocks")
    rows = B // LANES
    sy = symbols.reshape(rows, LANES, S).transpose(2, 0, 1)
    ln = lengths.reshape(rows, LANES)
    words, slot0 = encode_events(sy, ln, interpret=interpret)
    words_b = words.transpose(2, 3, 0, 1).reshape(B, S, WORDS)
    shifts = jnp.arange(RENORM_ITERS, dtype=jnp.int32) % 4 * 8
    slots_b = (words_b[:, :, jnp.arange(RENORM_ITERS) // 4] >> shifts) & 0xFF
    slot0_b = slot0.transpose(1, 2, 0).reshape(B, S)
    return slots_b.astype(jnp.uint8), slot0_b
