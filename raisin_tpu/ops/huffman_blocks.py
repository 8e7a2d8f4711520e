"""Block-parallel Huffman for the RSNB container (device batch kernels).

TPU-first split of labor (same shape as the single-stream ops/huffman_jax):

- Per-block tree build replicates Go's container/heap mechanics exactly
  (formats.huffman_ref, reference huffman.go:58) and touches only
  distinct-symbol-sized data — host, one cheap pass per block.
- The O(total bytes) work runs batched on device. On TPU it rides the
  ops/huffman_pallas kernels (blocks-on-lanes, masked-sum table lookups,
  in-kernel bit packing — the round-4 searchsorted/gather path measured
  under 0.5 MB/s and is kept only as the portable XLA fallback):
  encode = one packed code-table lookup per byte + bit-accumulator pack;
  decode = lockstep 1-bit tree walk over a 64-word packed child table.
- Wire format per block is byte-identical to formats.huffman_ref
  (reference huffman.go:229,255-279): ASCII freq|char header + "\\\n" +
  pad byte + MSB-first payload bits with the pad as leading zeros.

The device path is gated to ASCII blocks (all bytes < 0x80), where Go's
rune iteration (huffman.go:306-310) degenerates to byte iteration; other
blocks fall back to the host oracle per block (the reference itself mangles
non-UTF-8 input through replacement runes, so binary data is out of scope
for this codec either way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from raisin_tpu.formats import huffman_ref as hf
from raisin_tpu.ops import jax_setup  # noqa: F401

MAXLEN = 32  # bucketed max code length in bits (depth ~log_phi(block size))
KSYMS = 129  # ASCII symbol ids 0..127 + sentinel row 128 (code length 0)


def _bucket(n: int, base: int = 128) -> int:
    size = base
    while size < n:
        size *= 2
    return size


def _gbucket(n: int, base: int = 2048) -> int:
    size = base
    while size < n:
        if size + size // 2 >= n:
            return size + size // 2
        size *= 2
    return size


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Encode


@functools.partial(jax.jit, static_argnames=("cap_bytes",))
def pack_codes_blocks(ids, code_bits, code_lens, cap_bytes: int):
    """Batched variable-length code concat + MSB-first byte pack.

    Args:
      ids: (B, N) int32 symbol ids, sentinel (KSYMS-1) past each block's end.
      code_bits: (B, KSYMS, MAXLEN) uint8 — '0'/'1' as 0/1, row per symbol.
      code_lens: (B, KSYMS) int32 (0 for the sentinel row).
      cap_bytes: static payload byte capacity (callers size it exactly from
        the host-side sum of freq*len, so there is no retry path).

    Returns (payload (B, cap_bytes) uint8, byte_lens (B,), pads (B,)):
    per-block payload bytes after the reference's prepad rule — pad =
    (8 - bits%8) % 8 zero bits BEFORE the stream (huffman.go:245-249,
    174-191) — and the pad-byte value.
    """

    def one(idv, cb, cl):
        lens = cl[idv]
        ends = jnp.cumsum(lens)
        total = ends[-1]
        pad = (8 - total % 8) % 8
        j = jnp.arange(cap_bytes * 8, dtype=jnp.int32)
        jj = j - pad
        k = jnp.clip(jnp.searchsorted(ends, jj, side="right"), 0, idv.shape[0] - 1)
        start = ends[k] - lens[k]
        within = jnp.clip(jj - start, 0, MAXLEN - 1)
        bits = cb[idv[k], within]
        bits = jnp.where((jj >= 0) & (jj < total), bits, 0)
        byte = bits.reshape(cap_bytes, 8) @ (1 << jnp.arange(7, -1, -1, dtype=jnp.int32))
        return byte.astype(jnp.uint8), (pad + total) // 8, pad

    return jax.vmap(one)(ids, code_bits, code_lens)


def encode_blocks(blocks: list[bytes], interpret: bool = False) -> list[bytes]:
    """Exact per-block `.rsn` Huffman encode, device-batched.

    Non-ASCII blocks (and degenerate single-symbol blocks) take the host
    oracle; everything else shares one device dispatch.
    """
    out: list[bytes | None] = [None] * len(blocks)
    dev: list[int] = []
    heads: dict[int, bytes] = {}
    tabs: dict[int, tuple] = {}
    exact_bits: dict[int, int] = {}
    for i, b in enumerate(blocks):
        arr = np.frombuffer(b, dtype=np.uint8)
        if arr.size == 0 or (arr & 0x80).any():
            out[i] = hf.compress(b)
            continue
        uniq, first_idx, counts = np.unique(arr, return_index=True, return_counts=True)
        order = np.argsort(first_idx)  # first-occurrence order (dict parity)
        sym_freqs = {int(u): int(c) for u, c in zip(uniq[order], counts[order])}
        if len(sym_freqs) == 1:
            out[i] = hf.compress(b)  # empty-payload degenerate case
            continue
        tree = hf.build_tree(sym_freqs)
        vals, bins = hf.print_codes(tree)
        heads[i] = hf.build_header(sym_freqs) + hf.SEPARATOR
        tabs[i] = (vals, bins)
        exact_bits[i] = sum(sym_freqs[v] * len(c) for v, c in zip(vals, bins))
        dev.append(i)

    if not dev:
        return out  # type: ignore[return-value]

    if _use_pallas() or interpret:
        _encode_pallas(dev, blocks, tabs, exact_bits, heads, out, interpret)
        return out  # type: ignore[return-value]

    Bp = _bucket(len(dev))
    N = _bucket(max(len(blocks[i]) for i in dev), base=1024)
    cap_bytes = _bucket(max(exact_bits[i] for i in dev) // 8 + 2, base=128)
    ids = np.full((Bp, N), KSYMS - 1, dtype=np.int32)
    code_bits = np.zeros((Bp, KSYMS, MAXLEN), dtype=np.uint8)
    code_lens = np.zeros((Bp, KSYMS), dtype=np.int32)
    for row, i in enumerate(dev):
        arr = np.frombuffer(blocks[i], dtype=np.uint8)
        vals, bins = tabs[i]
        if max(len(c) for c in bins) > MAXLEN:
            raise ValueError("huffman: code length beyond 32 bits")
        for v, c in zip(vals, bins):
            code_lens[row, v] = len(c)
            code_bits[row, v, : len(c)] = np.frombuffer(c.encode(), np.uint8) - ord("0")
        ids[row, : arr.size] = arr
    payload, byte_lens, pads = pack_codes_blocks(ids, code_bits, code_lens, cap_bytes)
    payload = np.asarray(payload)
    byte_lens = np.asarray(byte_lens)
    pads = np.asarray(pads)
    for row, i in enumerate(dev):
        out[i] = (
            heads[i]
            + bytes([int(pads[row])])
            + payload[row, : int(byte_lens[row])].tobytes()
        )
    return out  # type: ignore[return-value]


def _encode_pallas(dev, blocks, tabs, exact_bits, heads, out, interpret=False):
    """TPU path: ops/huffman_pallas fused lookup+pack kernel, batched."""
    from raisin_tpu.ops import huffman_pallas as hp

    dev2 = []
    for i in dev:
        _, bins = tabs[i]
        if max(len(c) for c in bins) > hp.MAX_CODE_BITS:
            out[i] = hf.compress(blocks[i])  # packed-entry gate (rare)
        else:
            dev2.append(i)
    if not dev2:
        return

    # batch so the staged outputs stay modest; shapes shared across batches
    maxb = 1024
    steps = _gbucket(max(len(blocks[i]) for i in dev2), base=2048)
    capw = _gbucket(max(exact_bits[i] for i in dev2) // 32 + 2, base=1024)
    for lo in range(0, len(dev2), maxb):
        part = dev2[lo : lo + maxb]
        B = max(128, (len(part) + 127) // 128 * 128)
        # one vectorized pack for the whole batch: per-block python packing
        # cost ~0.5 ms x hundreds of blocks and showed in the stack bench
        ids = np.full((B, steps), 128, dtype=np.uint8)
        codes = np.zeros((B, hp.KPAD), dtype=np.int32)
        lengths = np.zeros(B, dtype=np.int32)
        for row, i in enumerate(part):
            arr = np.frombuffer(blocks[i], dtype=np.uint8)
            ids[row, : arr.size] = arr
            lengths[row] = arr.size
            vals, bins = tabs[i]
            for v, c in zip(vals, bins):
                codes[row, v] = int(c, 2) | (len(c) << hp.MAX_CODE_BITS)
        idw = np.ascontiguousarray(ids).view(np.uint32)
        rows, byte_lens, pads, oflow = hp.encode_rows_huffman(
            jnp.asarray(idw.view(np.int32)), jnp.asarray(lengths),
            jnp.asarray(codes), steps=steps, capw=capw, interpret=interpret,
        )
        rows = np.asarray(rows)
        byte_lens = np.asarray(byte_lens)
        pads = np.asarray(pads)
        oflow = np.asarray(oflow)
        for row, i in enumerate(part):
            if oflow[row]:
                out[i] = hf.compress(blocks[i])  # chunk staging overflow
            else:
                out[i] = (
                    heads[i]
                    + bytes([int(pads[row])])
                    + rows[row].tobytes()[: int(byte_lens[row])]
                )


def _packed_table(tree):
    """Host flatten for the Pallas walk: NTAB packed child words.

    Internal nodes are relabeled 0..126 in preorder (root = 0); a leaf's
    entry is 128 + its ASCII symbol, so the kernel needs no symbol table.
    """
    from raisin_tpu.ops import huffman_pallas as hp

    words = np.zeros(hp.NTAB, dtype=np.uint32)
    counter = [0]

    def alloc(t) -> int:
        if isinstance(t, hf.Leaf):
            if not (0 <= t.value < 128):
                raise _NonAscii
            return 128 + t.value
        vid = counter[0]
        counter[0] += 1
        if vid > 126:
            raise _NonAscii
        le = alloc(t.left)
        ri = alloc(t.right)
        words[vid // 2] |= np.uint32((le | (ri << 8)) << (16 * (vid % 2)))
        return vid

    alloc(tree)
    return words.view(np.int32)


def _decode_pallas(dev, metas, out, interpret=False, out_bound=None):
    """TPU path: ops/huffman_pallas lockstep 1-bit walk, batched."""
    from raisin_tpu.ops import huffman_pallas as hp

    maxb = 1024
    capb = _gbucket(max(len(metas[i][2]) for i in dev), base=512)
    maxbits = max(metas[i][3] for i in dev)
    steps = _gbucket(maxbits, base=2048)
    # output capacity: decoded bytes <= payload bits, but the container
    # knows the real bound (block size / token length), which keeps the
    # stitch's SMEM-resident output window ~4x smaller
    cap_out = _gbucket(min(maxbits, out_bound or maxbits) + 4, base=4096)
    # resident payload words: keep one batch's (capb x B) under ~10 MiB
    maxb = max(128, min(maxb, (10 << 20) // (capb * 128) * 128))
    for lo in range(0, len(dev), maxb):
        part = dev[lo : lo + maxb]
        B = max(128, (len(part) + 127) // 128 * 128)
        payload = np.zeros((B, capb), dtype=np.uint8)
        pads = np.zeros(B, dtype=np.int32)
        blens = np.zeros(B, dtype=np.int32)
        tables = np.zeros((B, hp.NTAB), dtype=np.int32)
        for row, i in enumerate(part):
            table, pad, body, nbits = metas[i]
            payload[row, : len(body)] = np.frombuffer(body, dtype=np.uint8)
            pads[row] = pad
            blens[row] = len(body)
            tables[row] = table
        rows, counts, ok = hp.decode_rows_huffman(
            jnp.asarray(payload), jnp.asarray(pads), jnp.asarray(blens),
            jnp.asarray(tables), num_steps=steps, cap_out=cap_out,
            interpret=interpret,
        )
        rows = np.asarray(rows)
        counts = np.asarray(counts)
        ok = np.asarray(ok)
        for row, i in enumerate(part):
            if not bool(ok[row]):
                raise ValueError("huffman: bitstream ends inside a code")
            out[i] = rows[row].tobytes()[: int(counts[row])]


# ---------------------------------------------------------------------------
# Decode


@functools.partial(jax.jit, static_argnames=("num_steps", "cap_out"))
def bitwalk_blocks(payload, bit_lens, table, leaf_sym, num_steps: int, cap_out: int):
    """Lockstep per-block tree walk over the payload bitstreams.

    Args:
      payload: (B, capB) uint8 payload bytes (after the pad byte).
      bit_lens: (B,) int32 — 8*payload_len - pad (bits to consume; the pad's
        leading zeros are SKIPPED by offsetting the bit index).
      table: (B, 512) int32 — next node for (node, bit): idx = 2*node + bit;
        node 0 is the root.
      leaf_sym: (B, 256) int32 — symbol byte for leaf nodes, -1 otherwise.
      num_steps: static max bit count.
      cap_out: static output byte capacity (multiple of 4).

    Returns (words (B, cap_out//4) int32 — decoded bytes packed 4/word
    little-endian, counts (B,), ok (B,) — stream ends at the root).
    """
    def one(pb, nbits, tb, ls):
        bits = ((pb[:, None] >> jnp.arange(7, -1, -1, dtype=jnp.uint8)) & 1).reshape(-1)
        start = (8 - nbits % 8) % 8  # leading pad bits to skip

        def step(carry, t):
            node = carry
            i = start + t
            b = bits[jnp.clip(i, 0, bits.shape[0] - 1)].astype(jnp.int32)
            active = t < nbits
            nxt = tb[2 * node + b]
            node = jnp.where(active, nxt, node)
            sym = ls[jnp.clip(node, 0, 255)]
            emit = active & (sym >= 0)
            node = jnp.where(emit, 0, node)
            return node, jnp.where(emit, sym, -1)

        node_end, syms = jax.lax.scan(
            step, jnp.int32(0), jnp.arange(num_steps, dtype=jnp.int32)
        )
        # compact the -1 gaps: output position of each emit = rank among emits
        is_sym = syms >= 0
        count = jnp.sum(is_sym)
        ranks = jnp.cumsum(is_sym)  # 1-based at emit positions
        # out[r] = syms at the bit index where rank first reaches r+1
        o = jnp.arange(cap_out, dtype=jnp.int32)
        src = jnp.searchsorted(ranks, o + 1, side="left")
        v = syms[jnp.clip(src, 0, num_steps - 1)]
        v = jnp.where(o < count, v, 0).astype(jnp.int32)
        w = v.reshape(cap_out // 4, 4)
        words = w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16) | (w[:, 3] << 24)
        return words, count, node_end == 0

    return jax.vmap(one)(payload, bit_lens, table, leaf_sym)


def _node_table(tree):
    """Host flatten: (table (512,) int32 with idx = 2*node+bit, leaf_sym
    (256,) int32) for an ASCII tree; returns None when it doesn't fit."""
    table = np.zeros(512, dtype=np.int32)
    leaf_sym = np.full(256, -1, dtype=np.int32)
    next_id = [1]

    def walk(t, v):
        if isinstance(t, hf.Leaf):
            if not (0 <= t.value < 128):
                raise _NonAscii
            leaf_sym[v] = t.value
            return
        for bit, child in ((0, t.left), (1, t.right)):
            c = next_id[0]
            next_id[0] += 1
            if c >= 256:
                raise _NonAscii  # deeper than any ASCII tree can be
            table[2 * v + bit] = c
            walk(child, c)

    walk(tree, 0)
    return table, leaf_sym


class _NonAscii(Exception):
    pass


def decode_blocks(
    payloads: list[bytes], interpret: bool = False, out_bound: int | None = None
) -> list[bytes]:
    """Exact per-block Huffman decode, device-batched (ASCII trees).

    ``out_bound``: optional known upper bound on any block's decoded size
    (the container's block size or recorded token length) — tightens the
    device decoder's output capacity."""
    use_p = _use_pallas() or interpret
    out: list[bytes | None] = [None] * len(payloads)
    dev: list[int] = []
    metas: dict[int, tuple] = {}
    for i, p in enumerate(payloads):
        try:
            header, rest = p.split(hf.SEPARATOR, 1)
            sym_freqs = hf.parse_header(header)
            tree = hf.build_tree(sym_freqs)
            if isinstance(tree, hf.Leaf) or not rest:
                raise _NonAscii
            if use_p:
                table, leaf_sym = _packed_table(tree), None
            else:
                table, leaf_sym = _node_table(tree)
        except _NonAscii:
            out[i] = hf.decompress(p)
            continue
        except ValueError:
            out[i] = hf.decompress(p)  # raises the oracle's error message
            continue
        pad = rest[0]
        body = rest[1:]
        if use_p:
            metas[i] = (table, pad, body, 8 * len(body) - pad)
        else:
            metas[i] = (table, leaf_sym, body, 8 * len(body) - pad)
        dev.append(i)

    if dev and use_p:
        _decode_pallas(dev, metas, out, interpret, out_bound=out_bound)
        return out  # type: ignore[return-value]

    if dev:
        Bp = _bucket(len(dev))
        capB = _bucket(max(len(metas[i][2]) for i in dev), base=128)
        steps = _bucket(max(metas[i][3] for i in dev), base=1024)
        cap_out = _bucket(steps // 4 * 4 + 4, base=1024)
        payload = np.zeros((Bp, capB), dtype=np.uint8)
        bit_lens = np.zeros(Bp, dtype=np.int32)
        tables = np.zeros((Bp, 512), dtype=np.int32)
        leafs = np.full((Bp, 256), -1, dtype=np.int32)
        for row, i in enumerate(dev):
            table, leaf_sym, body, nbits = metas[i]
            payload[row, : len(body)] = np.frombuffer(body, dtype=np.uint8)
            bit_lens[row] = nbits
            tables[row] = table
            leafs[row] = leaf_sym
        words, counts, ok = bitwalk_blocks(
            payload, bit_lens, tables, leafs, num_steps=steps, cap_out=cap_out
        )
        words = np.asarray(words)
        counts = np.asarray(counts)
        ok = np.asarray(ok)
        for row, i in enumerate(dev):
            if not bool(ok[row]):
                raise ValueError("huffman: bitstream ends inside a code")
            out[i] = words[row].tobytes()[: int(counts[row])]
    return out  # type: ignore[return-value]
