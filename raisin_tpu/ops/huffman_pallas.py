"""Pallas TPU kernels for the per-block Huffman codec (RSNB container path).

Replaces the round-4 device Huffman (ops/huffman_blocks: a per-output-bit
searchsorted gather encode and a 1-bit-per-scan-step gathered decode, both
gather-bound at < 0.5 MB/s) with the arithmetic-kernel architecture:
blocks on lanes, all per-block state in VMEM, masked-reduction table
lookups, in-kernel bit packing. Wire format per block stays byte-identical
to formats.huffman_ref (reference huffman.go:229,255-279): ASCII freq|char
header + "\\\n" + pad byte + MSB-first payload bits, pad = (8 - L%8) % 8
zero bits PREPENDED.

Division of labor (the reference's tree mechanics live in huffman_ref):
- host: per-block frequency map, Go-heap-exact tree build, code table,
  header bytes — O(distinct symbols) work per block;
- device encode: one packed (bits | len << 26) table lookup per input byte
  (masked sum over the 132-row VMEM code table — no gathers) feeding the
  shared _append32 bit accumulator, chunk-dense staging, stitch, and a
  zero-prepad epilogue;
- device decode: one bit per step in lockstep across all blocks. The bit
  supply needs NO per-lane pointer (unlike arithmetic decode): every block
  consumes exactly one bit per step, so the word index is a uniform scalar.
  The tree walk is ONE masked sum over a 64-word packed child table per
  bit: internal nodes are relabeled 0..126 and a leaf's entry IS its
  symbol + 128 (ASCII symbols < 128), so leaf detection is a compare and
  no second table exists. Decoded bytes feed _append32 (4 per word),
  chunk-staged and stitched like the encoder.

Gates (callers fall back to the host oracle): ASCII blocks only (Go's rune
iteration degenerates to bytes there, huffman.go:306-310), code lengths
<= 26 bits (the packed table entry), >= 2 distinct symbols.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raisin_tpu.ops import jax_setup  # noqa: F401
from raisin_tpu.ops.arithmetic_pallas import (
    CHUNK,
    LANES,
    STC,
    _append32,
    _shl,
    _shr,
    stitch_words,
)

KPAD = 132  # 129 symbol ids (ASCII + sentinel 128) padded to the table
MAX_CODE_BITS = 26  # packed entry = bits | len << 26
NTAB = 64  # child table: 64 words x two 16-bit (left | right << 8) entries
DSTC = 40  # decode staging: <= CHUNK bits emit <= 32 words + straddle


# ---------------------------------------------------------------------------
# Encode


def _henc_kernel(sym_ref, len_ref, code_ref, chunk_ref, ccnt_ref, fin_ref,
                 acc, nb, flag, stage):
    """One grid step: encode CHUNK input bytes of all blocks in lockstep."""
    rows = len_ref.shape[0]
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        acc[:] = jnp.zeros((rows, LANES), jnp.int32)
        nb[:] = jnp.zeros((rows, LANES), jnp.int32)
        flag[:] = jnp.zeros((rows, LANES), jnp.int32)

    stage[:] = jnp.zeros((STC, rows, LANES), jnp.int32)
    n = len_ref[:]
    kiota = jax.lax.broadcasted_iota(jnp.int32, (KPAD, rows, LANES), 0)
    siota = jax.lax.broadcasted_iota(jnp.int32, (STC, rows, LANES), 0)
    codes = code_ref[:]

    def body(s, carry):
        accv, nbv, flagv, sidx = carry
        g = pid * CHUNK + s
        sym = sym_ref[s]
        active = g < n

        entry = jnp.sum(jnp.where(kiota == sym[None], codes, 0), axis=0)
        w = jnp.where(active, entry & ((1 << MAX_CODE_BITS) - 1), 0)
        width = jnp.where(active, _shr(entry, MAX_CODE_BITS), 0)

        accv, nbv, word, complete = _append32(accv, nbv, w, width)
        stage[:] = jnp.where((siota == sidx[None]) & complete[None], word[None], stage[:])
        sidx = sidx + complete.astype(jnp.int32)
        return (accv, nbv, flagv, sidx)

    zero = jnp.zeros((rows, LANES), jnp.int32)
    accv, nbv, flagv, sidx = jax.lax.fori_loop(
        0, CHUNK, body, (acc[:], nb[:], flag[:], zero)
    )
    acc[:] = accv
    nb[:] = nbv
    flagv = jnp.where(sidx > STC, 1, flagv)
    flag[:] = flagv
    chunk_ref[0] = stage[:]
    ccnt_ref[0] = sidx
    fin_ref[0] = accv
    fin_ref[1] = nbv
    fin_ref[2] = flagv


@functools.partial(jax.jit, static_argnames=("steps", "capw", "interpret"))
def encode_rows_huffman(
    idw: jax.Array,
    lengths: jax.Array,
    codes: jax.Array,
    steps: int,
    capw: int,
    interpret: bool = False,
):
    """Device Huffman encode: packed symbol-id words in, payload rows out.

    Args:
      idw: (B, Sw) int32 — 4 little-endian symbol-id bytes per word
        (sentinel id 128 past each block's length; its table entry is 0 so
        it appends nothing). B % 128 == 0.
      lengths: (B,) int32 payload byte counts.
      codes: (B, KPAD) int32 packed code table rows: bits | len << 26
        (bits right-aligned, MSB of the code first).
      steps: static scan length (multiple of CHUNK, 4 * Sw >= steps).
      capw: static per-block output capacity in words (multiple of 512).

    Returns (rows (B, capw) int32 little-endian `.rsn` payload bytes
    (zero prepad applied), byte_lens (B,), pads (B,), oflow (B,)).
    """
    B, Sw = idw.shape
    if B % LANES != 0:
        raise ValueError(f"B must be a multiple of {LANES}")
    if steps % CHUNK != 0 or steps > 4 * Sw:
        raise ValueError("steps must be a CHUNK multiple <= 4 * Sw")
    rows = B // LANES
    wt = idw.T.reshape(Sw, rows, LANES)
    b4 = jnp.stack([(wt >> (8 * k)) & 0xFF for k in range(4)], axis=1).reshape(
        4 * Sw, rows, LANES
    )[:steps]
    ln = lengths.reshape(rows, LANES).astype(jnp.int32)
    ct = codes.T.reshape(KPAD, rows, LANES).astype(jnp.int32)

    G = steps // CHUNK
    chunks, ccnts, fin = pl.pallas_call(
        _henc_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((CHUNK, rows, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((rows, LANES), lambda g: (0, 0)),
            pl.BlockSpec((KPAD, rows, LANES), lambda g: (0, 0, 0)),
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
            pltpu.VMEM((STC, rows, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(b4, ln, ct)

    # stitch chunk-dense words into contiguous rows, then apply the zero
    # prepad: payload = (8 - bits % 8) % 8 zero bits, then the stream
    chunks_b = chunks.reshape(G * STC, B).T.reshape(B, G, STC)
    cnts_b = ccnts.reshape(G, B).T.reshape(B, G)
    fin_b = fin.reshape(3, B)
    facc, fnb, oflow = fin_b[0], fin_b[1], fin_b[2]
    nwords = jnp.sum(cnts_b, axis=1)
    raw = stitch_words(chunks_b, cnts_b, capw, interpret=interpret)
    total_bits = nwords * 32 + fnb
    pad = (8 - total_bits % 8) % 8
    j = jnp.arange(capw, dtype=jnp.int32)[None, :]
    full = raw + jnp.where(j == nwords[:, None], facc[:, None], 0)
    prev = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), full[:, :-1]], axis=1)
    p = pad[:, None].astype(jnp.uint32)
    u = full.astype(jnp.uint32)
    shifted = jnp.where(
        p > 0, (prev.astype(jnp.uint32) << (32 - p)) | (u >> p), u
    ).astype(jnp.uint32)
    sw = (
        (shifted >> 24)
        | ((shifted >> 8) & 0xFF00)
        | ((shifted & 0xFF00) << 8)
        | (shifted << 24)
    ).astype(jnp.int32)
    byte_lens = (pad + total_bits) // 8
    return sw, byte_lens, pad, oflow


# ---------------------------------------------------------------------------
# Decode


def _hdec_kernel(words_ref, nbits_ref, tab_ref, chunk_ref, ccnt_ref, fin_ref,
                 node, acc, nb, flag, stage):
    """One grid step: walk CHUNK payload bits of all blocks in lockstep."""
    rows = nbits_ref.shape[0]
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        node[:] = jnp.zeros((rows, LANES), jnp.int32)
        acc[:] = jnp.zeros((rows, LANES), jnp.int32)
        nb[:] = jnp.zeros((rows, LANES), jnp.int32)
        flag[:] = jnp.zeros((rows, LANES), jnp.int32)

    stage[:] = jnp.zeros((DSTC, rows, LANES), jnp.int32)
    n = nbits_ref[:]
    tiota = jax.lax.broadcasted_iota(jnp.int32, (NTAB, rows, LANES), 0)
    siota = jax.lax.broadcasted_iota(jnp.int32, (DSTC, rows, LANES), 0)
    tab = tab_ref[:]

    def body(s, carry):
        nodev, accv, nbv, flagv, sidx = carry
        t = pid * CHUNK + s
        active = t < n
        # uniform bit pointer: plain scalar index (clamped — num_steps may
        # round past the word capacity; excess steps are inactive anyway)
        w = words_ref[jnp.minimum(t >> 5, words_ref.shape[0] - 1)]
        bit = _shr(w, 31 - (t & 31)) & 1

        red = jnp.sum(jnp.where(tiota == _shr(nodev, 1)[None], tab, 0), axis=0)
        pair = _shr(red, (nodev & 1) * 16) & 0xFFFF
        ch = _shr(pair, bit * 8) & 0xFF
        is_leaf = active & (ch >= 128)
        nodev = jnp.where(active, jnp.where(is_leaf, 0, ch), nodev)

        accv, nbv, word, complete = _append32(
            accv, nbv, jnp.where(is_leaf, ch - 128, 0),
            jnp.where(is_leaf, 8, 0),
        )
        stage[:] = jnp.where(
            (siota == sidx[None]) & complete[None], word[None], stage[:]
        )
        sidx = sidx + complete.astype(jnp.int32)
        return (nodev, accv, nbv, flagv, sidx)

    zero = jnp.zeros((rows, LANES), jnp.int32)
    nodev, accv, nbv, flagv, sidx = jax.lax.fori_loop(
        0, CHUNK, body, (node[:], acc[:], nb[:], flag[:], zero)
    )
    node[:] = nodev
    acc[:] = accv
    nb[:] = nbv
    flagv = jnp.where(sidx > DSTC, 1, flagv)
    flag[:] = flagv
    chunk_ref[0] = stage[:]
    ccnt_ref[0] = sidx
    fin_ref[0] = accv
    fin_ref[1] = nbv
    # ok: the walk must end at the root (stream ends on a code boundary)
    fin_ref[2] = flagv | _shl(jnp.where(nodev == 0, 0, 1), 1)


@functools.partial(jax.jit, static_argnames=("num_steps", "cap_out", "interpret"))
def decode_rows_huffman(
    payload_rows: jax.Array,
    pads: jax.Array,
    byte_lens: jax.Array,
    tables: jax.Array,
    num_steps: int,
    cap_out: int,
    interpret: bool = False,
):
    """Device Huffman decode of B blocks in lockstep.

    Args:
      payload_rows: (B, capb) uint8 payload bytes (after the pad byte).
      pads: (B,) int32 leading pad-bit counts (stripped by a vectorized
        pre-shift so stream bit 0 is bit 31 of word 0).
      byte_lens: (B,) int32 payload byte counts.
      tables: (B, NTAB) int32 packed child tables — word j holds internal
        nodes 2j (low 16) and 2j+1 (high 16), each as left | right << 8,
        entries >= 128 meaning leaf of symbol (entry - 128); root = node 0.
      num_steps: static bit budget (multiple of CHUNK, >= max bit count).
      cap_out: static output capacity in bytes (multiple of 2048).

    Returns (rows (B, cap_out // 4) int32 — decoded bytes 4/word
    little-endian, counts (B,), ok (B,) — walk ended at the root).
    """
    B, capb = payload_rows.shape
    if B % LANES != 0:
        raise ValueError(f"B must be a multiple of {LANES}")
    if num_steps % CHUNK != 0 or cap_out % 2048 != 0:
        raise ValueError("num_steps % CHUNK and cap_out % 2048 must be 0")
    rows = B // LANES
    capw = capb // 4

    w4 = payload_rows.reshape(B, capw, 4).astype(jnp.uint32)
    sh = jnp.array([24, 16, 8, 0], dtype=jnp.uint32)
    words = jnp.sum(w4 << sh[None, None, :], axis=-1)
    # strip the leading pad bits: shift the whole stream left by pad
    p = pads[:, None].astype(jnp.uint32)
    nxt = jnp.concatenate([words[:, 1:], jnp.zeros((B, 1), jnp.uint32)], axis=1)
    words = jnp.where(p > 0, (words << p) | (nxt >> (32 - p)), words).astype(jnp.int32)

    wt = words.T.reshape(capw, rows, LANES)
    nbits = (byte_lens * 8 - pads).reshape(rows, LANES).astype(jnp.int32)
    tt = tables.T.reshape(NTAB, rows, LANES).astype(jnp.int32)

    G = num_steps // CHUNK
    chunks, ccnts, fin = pl.pallas_call(
        _hdec_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((capw, rows, LANES), lambda g: (0, 0, 0)),
            pl.BlockSpec((rows, LANES), lambda g: (0, 0)),
            pl.BlockSpec((NTAB, rows, LANES), lambda g: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, DSTC, rows, LANES), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, rows, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((3, rows, LANES), lambda g: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, DSTC, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G, rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((3, rows, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((DSTC, rows, LANES), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(wt, nbits, tt)

    chunks_b = chunks.reshape(G * DSTC, B).T.reshape(B, G, DSTC)
    cnts_b = ccnts.reshape(G, B).T.reshape(B, G)
    fin_b = fin.reshape(3, B)
    facc, fnb, bad = fin_b[0], fin_b[1], fin_b[2]
    nwords = jnp.sum(cnts_b, axis=1)
    raw = stitch_words(chunks_b, cnts_b, cap_out // 4, interpret=interpret)
    j = jnp.arange(cap_out // 4, dtype=jnp.int32)[None, :]
    full = raw + jnp.where(j == nwords[:, None], facc[:, None], 0)
    # bit-accumulated bytes fill words MSB-first; emit little-endian bytes
    u = full.astype(jnp.uint32)
    sw = (
        (u >> 24) | ((u >> 8) & 0xFF00) | ((u & 0xFF00) << 8) | (u << 24)
    ).astype(jnp.int32)
    counts = nwords * 4 + fnb // 8
    return sw, counts, bad == 0
