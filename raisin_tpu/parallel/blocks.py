"""RSNB block container: the multi-chip scale path.

The reference's `.rsn` format is a single whole-file stream with no
container (SURVEY §2.3) — inherently sequential for the adaptive codecs.
RSNB splits the input into independent fixed-size blocks, each encoded as an
exact single-stream `.rsn` payload of the layered pipeline, so:

- every block's bytes are individually reference-compatible;
- blocks encode/decode data-parallel: the (B, S) symbol batch is sharded
  along a mesh 'data' axis and the vmapped scan kernels partition trivially
  (XLA inserts the gathers; no hand-written collectives);
- ragged tails are handled by per-block length masks, not padding bytes.

Layout (little-endian):
  magic "RSNB" | version u8 | algo_len u8 | algo CSV | block_size u32 |
  window u32 (v2+) | orig_size u64 | num_blocks u32 | num_aux u8 |
  num_blocks × u32 payload sizes |
  num_aux × (num_blocks × u32) auxiliary per-block lengths |
  concatenated payloads

The auxiliary tables record intermediate layer lengths (e.g. the LZSS
token-stream size per block in the lzss,arithmetic pipeline) so that every
layer of the decode runs on device with static shapes — the scan decoder
needs the symbol count up front.
"""

from __future__ import annotations

import concurrent.futures
import struct

import functools

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from raisin_tpu.formats.lzss_ref import encode_opening_symbols
from raisin_tpu.ops import arithmetic_scan

MAGIC = b"RSNB"
VERSION = 2  # v2 adds the LZSS window u32 (v1 files parse as window=4096)
DEFAULT_BLOCK_SIZE = 1 << 16

# Single-chip batch sizes: the Pallas coder state scales with rows = B/128
# (VMEM-bound; encode fits 32 rows, decode 16). Batches are sized in BYTES
# (~8 MiB of input each, block-count capped) so several are in flight at
# once regardless of the block size: batch k+1's host->device transfer and
# host prep run under batch k's kernels, and each batch's outputs start
# their device->host copy as soon as it finishes.
ENC_MAXB = 2048
DEC_MAXB = 1024
ENC_MAX_BYTES = 16 << 20
DEC_MAX_BYTES = 16 << 20
# VMEM budget for the decode kernel's resident word stream (capb bytes per
# block x block count); ~16 MiB VMEM per core minus model/window scratch
DEC_WORDS_VMEM = 11 << 20

_POOL = None


def _progress(done: int, total: int, label: str = "blocks") -> None:
    """Reference-parity progress reporting (the Go LZSS writer shows a bar,
    lzss.go:113-115): a single self-overwriting stderr line, only when
    stderr is a tty and the job is big enough to care."""
    import sys

    if total < 8 or not sys.stderr.isatty():
        return
    pct = 100 * done // total
    end = "\n" if done >= total else ""
    print(f"\r  {label}: {done}/{total} ({pct}%)", file=sys.stderr, end=end, flush=True)


def _pool() -> concurrent.futures.ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = concurrent.futures.ThreadPoolExecutor(max_workers=4)
    return _POOL


def _device_put_big(x: np.ndarray) -> jax.Array:
    """device_put with the transfer split across 4 threads.

    The tunneled host->TPU link runs ~35 MB/s per stream but ~2x that with
    parallel streams (streams form per issuing thread); the shards are
    re-joined by an on-device concatenate (HBM-speed).
    """
    if x.nbytes < (1 << 20):
        return jax.device_put(x)
    n = 4
    rows = x.shape[0]
    step = (rows + n - 1) // n
    parts = list(
        _pool().map(jax.device_put, [x[i : i + step] for i in range(0, rows, step)])
    )
    import jax.numpy as jnp

    return jnp.concatenate(parts, axis=0)


def _asarray_big(a) -> np.ndarray:
    """np.asarray with the device->host transfer split across 4 threads."""
    if a.ndim < 1 or a.size * a.dtype.itemsize < (1 << 20):
        return np.asarray(a)
    n = 4
    rows = a.shape[0]
    step = (rows + n - 1) // n
    parts = list(
        _pool().map(lambda s: np.asarray(a[s : s + step]), range(0, rows, step))
    )
    return np.concatenate(parts, axis=0)


def _bucket(n: int, base: int = 1024) -> int:
    # ×2 growth: batch mode favors tight scan lengths over fewer compiles
    # (the persistent compilation cache absorbs the extra specializations)
    size = base
    while size < n:
        size *= 2
    return size


def _gbucket(n: int, base: int = 1024) -> int:
    """Geometric bucket at ~1.33x granularity: powers of two plus their
    1.5x midpoints. Data-dependent shape parameters (scan steps, row
    capacities) snap to these so a whole run compiles O(1) kernel
    specializations instead of one per 512-byte step (the round-4 bench
    burned ~15 min of jit warmup on exactly that)."""
    size = base
    while size < n:
        if size + size // 2 >= n:
            return size + size // 2
        size *= 2
    return size


def _shard_blocks(arr: np.ndarray, mesh) -> jax.Array:
    if mesh is None:
        return arr
    from raisin_tpu.parallel.mesh import block_sharding

    return jax.device_put(arr, block_sharding(mesh))


@functools.lru_cache(maxsize=None)
def _spmd_cached(fn, mesh, n_in: int, n_out: int, statics):
    wrapped = functools.partial(fn, **dict(statics)) if statics else fn
    if mesh is None:
        return wrapped
    spec_in = tuple(P("data") for _ in range(n_in))
    spec_out = tuple(P("data") for _ in range(n_out))
    # the outer jit is load-bearing: an un-jitted shard_map call runs in the
    # eager SPMD interpreter, several times slower than the compiled
    # partitioned module — and the whole wrapper must be CACHED, because a
    # fresh jit object per call would retrace every time
    return jax.jit(
        jax.shard_map(wrapped, mesh=mesh, in_specs=spec_in, out_specs=spec_out, check_vma=False)
    )


def _spmd(fn, mesh, n_in: int, n_out: int, **statics):
    """Run a vmapped block kernel SPMD over the mesh 'data' axis.

    Blocks are embarrassingly parallel, so each device simply runs the plain
    kernel on its local shard (explicit shard_map rather than relying on
    sharding inference through the scan). ``statics`` are keyword args bound
    into the kernel (they form part of the cache key).
    """
    return _spmd_cached(fn, mesh, n_in, n_out, tuple(sorted(statics.items())))


def _pad_block_count(b: int, mesh, align: int = 1) -> int:
    """Round the block count up so each mesh shard holds a multiple of
    ``align`` blocks (the Pallas arithmetic encoder runs 128 blocks per
    vector-register lane group)."""
    n = 1 if mesh is None else mesh.devices.size
    step = n * max(align, 1)
    return ((b + step - 1) // step) * step


# ---------------------------------------------------------------------------
# Device batch encoders (per pipeline)
#
# Device->host readback can be orders of magnitude slower than compute
# (tunneled TPU hosts), so every path transfers exactly: the concatenated
# compressed bytes (or decoded blocks) plus tiny per-block length vectors.


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _mesh_size(mesh) -> int:
    return 1 if mesh is None else mesh.devices.size


def _split_flat(flat: np.ndarray, lens: np.ndarray, count: int, mesh=None) -> list[bytes]:
    """Recover per-block payloads from the compacted buffer.

    Under shard_map each device compacts its local blocks into its own
    cap/n-sized segment, so offsets restart at every segment boundary.
    """
    n = _mesh_size(mesh)
    cap_local = flat.size // n
    per_seg = len(lens) // n
    out = []
    for i in range(count):
        seg, k = divmod(i, per_seg)
        off = seg * cap_local + int(lens[seg * per_seg : seg * per_seg + k].sum())
        out.append(flat[off : off + lens[i]].tobytes())
    return out


def _fits(lens: np.ndarray, cap: int, mesh) -> bool:
    n = _mesh_size(mesh)
    per_seg = len(lens) // n
    seg_sums = lens.reshape(n, per_seg).sum(axis=1)
    return int(seg_sums.max()) <= cap // n


def _encode_arithmetic_batch(blocks: list[bytes], mesh) -> list[bytes]:
    if _use_pallas():
        return _encode_arithmetic_rows(blocks, mesh)
    use_pallas = False
    B = _pad_block_count(len(blocks), mesh, align=1)
    steps = _bucket(max(len(b) for b in blocks) + 1)
    payload = np.zeros((B, steps), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    for i, b in enumerate(blocks):
        payload[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lengths[i] = len(b)
    total_in = int(lengths.sum())
    n = _mesh_size(mesh)
    bound_bits = arithmetic_scan.BITS_PER_STEP_BOUND * steps + 16
    bound = bound_bits * (B // n) // 8 + B * 4
    # practical first try: per-block output <= 9 bits/symbol (ratio 1.125);
    # retry at the proven bound if any block or the flat capacity overflows
    for cap, mbits in (
        (_cap_bytes(total_in, B) // n * n, 9 * steps + 32),
        (bound * n, bound_bits),
    ):
        enc = _spmd(
            arithmetic_scan.encode_blocks_packed, mesh, 2, 2,
            num_steps=steps, cap_bytes=cap // n, max_bits=mbits,
            use_pallas=use_pallas,
        )
        flat, byte_lens = enc(_shard_blocks(payload, mesh), _shard_blocks(lengths, mesh))
        byte_lens = np.asarray(byte_lens)
        if _fits(byte_lens, cap, mesh) and int(byte_lens.max()) * 8 <= (mbits + 7) // 8 * 8:
            break
    flat = np.asarray(flat)  # ~compressed bytes only
    return _split_flat(flat, byte_lens, len(blocks), mesh)


def _cap_bytes(total_in: int, nblocks: int) -> int:
    """Practical compressed-size capacity: 1.3x input plus per-block slack."""
    return ((int(total_in * 1.3) + 8 * nblocks + 4096) + 127) // 128 * 128


def _escape_clean(blocks: list[bytes]) -> bool:
    """True when no block holds a 0x5C or 0xFF byte (the two values the
    escape pre-pass EXPANDS, lzss.go:369). Then escaping is a pure
    0x3C -> 0xFF map with unchanged lengths and can run on device.
    Per-block numpy scans with early exit keep this one bounded pass."""
    for b in blocks:
        a = np.frombuffer(b, dtype=np.uint8)
        if (a == 0x5C).any() or (a == 0xFF).any():
            return False
    return True


def _raw_batch_view(whole, lo_block: int, nb: int, bs: int):
    """Zero-copy (nb, bs) view of blocks [lo_block, lo_block + nb) of the
    original input buffer — the escape-clean fast path's host prep is then
    literally nothing (device_put reads the view directly)."""
    x = np.frombuffer(
        whole, dtype=np.uint8, count=nb * bs, offset=lo_block * bs
    ).reshape(nb, bs)
    return x, np.full(nb, bs, dtype=np.int32)


def _raw_blocks(blocks: list[bytes]):
    """(B, S) matrix of RAW block bytes + lengths (escape-clean fast path:
    the 0x3C map is applied on device by lzss_tokens_words)."""
    nb = len(blocks)
    B = _pad_block_count(nb, None, align=128)
    bs = max(len(b) for b in blocks)
    S = _bucket(bs, base=1024)
    x = np.zeros((B, S), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    for i, b in enumerate(blocks):
        x[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lengths[i] = len(b)
    return x, lengths, S


def _escaped_blocks(blocks: list[bytes], mesh, align: int = 1):
    nb = len(blocks)
    B = _pad_block_count(nb, mesh, align=align)
    # fast path: the escape pre-pass is per-byte, so when no byte EXPANDS
    # (no 0x5C / 0xFF in the input) the whole-buffer escape equals the
    # per-block escape and the (B, S) matrix is a single reshape — no
    # per-block Python loop, no per-block bytes objects
    bs = len(blocks[0]) if nb else 0
    if bs > 0 and all(len(b) == bs for b in blocks[:-1]) and len(blocks[-1]) <= bs:
        arr = np.frombuffer(b"".join(blocks), dtype=np.uint8)
        if not ((arr == 0x5C) | (arr == 0xFF)).any():
            S = _bucket(bs, base=1024)
            esc = np.where(arr == 0x3C, np.uint8(0xFF), arr)
            x = np.zeros((B, S), dtype=np.uint8)
            full = arr.size // bs
            x[:full, :bs] = esc[: full * bs].reshape(full, bs)
            if arr.size % bs:
                x[full, : arr.size % bs] = esc[full * bs :]
            lengths = np.zeros(B, dtype=np.int32)
            lengths[:full] = bs
            if arr.size % bs:
                lengths[full] = arr.size % bs
            return x, lengths, S
    encs = [encode_opening_symbols(b) for b in blocks]
    S = _bucket(max((len(e) for e in encs), default=1), base=1024)
    x = np.zeros((B, S), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    for i, e in enumerate(encs):
        x[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
        lengths[i] = len(e)
    return x, lengths, S


def _capw_bucket(bits: int) -> int:
    """Per-block row capacity in 32-bit words (geometric buckets)."""
    words = (bits + 31) // 32 + 2
    return _gbucket(words, base=1024)


def _rows_prefix(rows_dev, byte_lens: np.ndarray):
    """Slice device rows to the prefix of columns any block actually uses
    and start its device->host copy (overlaps later batches' compute).

    Returns a list of row-chunks whose async copies were issued from
    separate pool threads (parallel tunnel streams, ~2x one stream)."""
    need_w = int((int(byte_lens.max()) + 3) // 4 + 1)
    need_w = min(((need_w + 127) // 128) * 128, rows_dev.shape[1])
    sl = rows_dev[:, :need_w]
    if sl.size * 4 < (4 << 20):
        sl.copy_to_host_async()
        return [sl]
    rows = sl.shape[0]
    step = (rows + 3) // 4
    chunks = [sl[i : i + step] for i in range(0, rows, step)]

    def _start(c):
        c.copy_to_host_async()
        return c

    return list(_pool().map(_start, chunks))


def _chunks_np(chunks) -> np.ndarray:
    parts = list(_pool().map(np.asarray, chunks))
    return parts[0] if len(parts) == 1 else np.vstack(parts)


def _rows_payloads(rows_dev, byte_lens: np.ndarray, count: int) -> list[bytes]:
    """Fetch per-block `.rsn` payload bytes from device rows, transferring
    only the prefix of columns that any block actually uses."""
    rows_np = _chunks_np(_rows_prefix(rows_dev, byte_lens))
    return [rows_np[i].tobytes()[: byte_lens[i]] for i in range(count)]


def _enc_batch_assemble(blocks, rows_np, byte_lens, tok_lens, oflow, window):
    payloads = [rows_np[i].tobytes()[: byte_lens[i]] for i in range(len(blocks))]
    if oflow[: len(blocks)].any():
        # carried-pending overflow (needs a >31-bit straddle run): re-encode
        # those blocks on the byte-exact host oracle (same window!)
        from raisin_tpu.formats import arithmetic_ref, lzss_ref

        for i in np.nonzero(oflow[: len(blocks)])[0]:
            payloads[i] = arithmetic_ref.compress(lzss_ref.compress(blocks[i], window))
    return payloads, [int(t) for t in tok_lens[: len(blocks)]]


def _encode_lzss_arith_rows(blocks: list[bytes], mesh, window: int = 4096, whole: bytes | None = None):
    """TPU fast path: fused match+commit+arithmetic with in-kernel packing.

    Single-chip, batches of ~ENC_MAX_BYTES input bytes per kernel call
    (capped at ENC_MAXB blocks — the Pallas coder keeps all per-block state
    in VMEM; 32 sublane rows fit). Every batch's host->device transfer and
    kernel are dispatched asynchronously BEFORE any result is awaited, so
    batch k+1's transfer and prep overlap batch k's compute, and the
    tunnel's ~26 ms round-trip sync latency is paid once, not per batch.
    """
    from raisin_tpu.ops import pipeline_jax

    if mesh is not None:
        return _encode_lzss_arith_rows_spmd(blocks, mesh, window)

    bs0 = max(len(blocks[0]), 1)
    maxb = max(128, min(ENC_MAXB, ENC_MAX_BYTES // bs0 // 128 * 128))

    # stage 0: dispatch match+commit for every batch (h2d of batch k+1
    # overlaps batch k's kernels). NB: moving this loop onto background
    # threads was tried and measured SLOWER (GIL contention between numpy
    # prep and the transfer threads); keep it sequential. The trailing
    # partial batch is padded with empty blocks to the common batch shape
    # so the whole run shares ONE kernel specialization per stage.
    pend = []
    # escape-clean whole input (no 0x5C/0xFF anywhere): the escape layer is
    # a pure 0x3C -> 0xFF byte map with unchanged lengths, applied ON
    # DEVICE — host prep per batch collapses to a zero-copy view (full
    # batches) or one memcpy (the ragged tail). Checked once with bounded
    # per-block scans (early exit).
    clean = bool(blocks) and len(blocks[0]) > 0 and _escape_clean(blocks)
    bs0v = len(blocks[0]) if blocks else 0
    for i in range(0, len(blocks), maxb):
        part = blocks[i : i + maxb]
        full = (
            part + [b""] * (maxb - len(part))
            if len(blocks) > maxb or len(part) > maxb * 3 // 4
            else part
        )
        if (
            clean
            and whole is not None
            and len(part) == len(full)
            and len(part) % 128 == 0  # kernels ride full 128-lane groups
            and _bucket(bs0v, base=1024) == bs0v
            and (i + len(part)) * bs0v <= len(whole)
        ):
            x, lengths = _raw_batch_view(whole, i, len(part), bs0v)
            S = bs0v
        elif clean:
            x, lengths, S = _raw_blocks(full)
        else:
            x, lengths, S = _escaped_blocks(full, None, align=128)
        if S > 65536:
            # escape expansion past the commit kernel's SMEM budget
            # (possible only on 0x5C/0xFF-heavy blocks): host oracle
            from raisin_tpu.engine.registry import get_codec

            a = get_codec("arithmetic", backend="native")
            lz = get_codec("lzss", backend="native")
            toks_h = [lz.compress(b, window) for b in part]
            pend.append((part, None, [a.compress(t) for t in toks_h], [len(t) for t in toks_h]))
            continue
        dx = _device_put_big(x)
        dl = jax.device_put(lengths)
        tokw, tok_len = pipeline_jax.lzss_tokens_words(
            dx, dl, window=window, map_escape=clean
        )
        pend.append((part, S, tokw, tok_len))

    # stage 1: per batch, read max(tok_len) (a tiny sync riding under the
    # later batches' kernels) and dispatch the arithmetic stage at a
    # coarse-bucketed steps count — tight enough that the scan does little
    # EOF-padding work, coarse enough that batches share one compile
    pend2 = []
    for part, S, tokw, tok_len in pend:
        if S is None:  # host-encoded batch: (payloads, tok byte lens)
            pend2.append((part, None, None, tok_len, None, None, tokw))
            continue
        tl = np.asarray(tok_len)
        steps = _gbucket(int(tl.max()) + 1, base=2048)
        capw = _capw_bucket(9 * steps + 64)
        out = pipeline_jax.arith_rows_from_words(tokw, tok_len, steps, capw)
        pend2.append((part, tokw, tok_len, tl, steps, capw, out))

    # stage 2: as each batch finishes, read its (tiny) length vectors and
    # kick off the async device->host copy of the payload prefix, so batch
    # k's readback rides under batch k+1..n's kernels
    staged = []
    for part, tokw, tok_len, tl, steps, capw, out in pend2:
        if tokw is None:  # host-encoded batch passes straight through
            staged.append((part, out, tl, None, None))
            continue
        rows, byte_lens, oflow = out
        bl = np.asarray(byte_lens)
        if int(bl.max()) > capw * 4:
            # capacity overflow (pathological data): re-run this batch at the
            # proven worst-case bits/step bound
            capw2 = _capw_bucket(18 * steps)
            rows, byte_lens, oflow = pipeline_jax.arith_rows_from_words(
                tokw, tok_len, steps, capw2
            )
            bl = np.asarray(byte_lens)
            if int(bl.max()) > capw2 * 4:
                raise ValueError("container: capw overflow at 18 bits/step")
        staged.append((part, _rows_prefix(rows, bl), bl, tl, np.asarray(oflow)))

    payloads: list[bytes] = []
    toks: list[int] = []
    for part, sl, bl, tl, of in staged:
        if tl is None:  # host-encoded batch: sl = payloads, bl = tok lens
            payloads.extend(sl)
            toks.extend(bl)
        else:
            p, t = _enc_batch_assemble(part, _chunks_np(sl), bl, tl, of, window)
            payloads.extend(p)
            toks.extend(t)
        _progress(len(payloads), len(blocks))
    return payloads, toks


def _encode_lzss_arith_rows_spmd(blocks: list[bytes], mesh, window: int = 4096):
    """Mesh path: shard_map over the 'data' axis, 1024 blocks per device."""
    from raisin_tpu.ops import pipeline_jax

    maxb = 1024 * _mesh_size(mesh)
    if len(blocks) > maxb:
        payloads: list[bytes] = []
        toks: list[int] = []
        parts = [
            _encode_lzss_arith_rows_spmd(blocks[i : i + maxb], mesh, window)
            for i in range(0, len(blocks), maxb)
        ]
        for p, t in parts:
            payloads.extend(p)
            toks.extend(t)
        return payloads, toks

    x, lengths, S = _escaped_blocks(blocks, mesh, align=128)
    steps = (S + 8 + 511) // 512 * 512
    for capw in (_capw_bucket(9 * steps + 64), _capw_bucket(18 * steps)):
        fn = _spmd(
            pipeline_jax.lzss_arith_encode_rows, mesh, 2, 4,
            window=window, capw=capw,
        )
        rows, byte_lens, tok_lens, oflow = fn(
            _shard_blocks(x, mesh), _shard_blocks(lengths, mesh)
        )
        byte_lens = np.asarray(byte_lens)
        if int(byte_lens.max()) <= capw * 4:
            break
    payloads = _rows_payloads(rows, byte_lens, len(blocks))
    tok_lens = np.asarray(tok_lens)
    oflow = np.asarray(oflow)
    if oflow[: len(blocks)].any():
        from raisin_tpu.formats import arithmetic_ref, lzss_ref

        for i in np.nonzero(oflow[: len(blocks)])[0]:
            payloads[i] = arithmetic_ref.compress(lzss_ref.compress(blocks[i], window))
    return payloads, [int(t) for t in tok_lens[: len(blocks)]]


def _encode_arithmetic_rows(blocks: list[bytes], mesh) -> list[bytes]:
    """TPU fast path: pure-arithmetic container encode via Pallas rows."""
    from raisin_tpu.ops import pipeline_jax

    maxb = 1024 * _mesh_size(mesh)
    if len(blocks) > maxb:
        out: list[bytes] = []
        for i in range(0, len(blocks), maxb):
            out.extend(_encode_arithmetic_rows(blocks[i : i + maxb], mesh))
        return out

    B = _pad_block_count(len(blocks), mesh, align=128)
    # block lengths are the container's block_size (constant per run), so an
    # exact 512-ceil is shape-stable AND avoids the pow2 bucket's up-to-2x
    # scan-length waste at power-of-two block sizes
    steps = max(512, (max(len(b) for b in blocks) + 1 + 511) // 512 * 512)
    payload = np.zeros((B, steps), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    for i, b in enumerate(blocks):
        payload[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lengths[i] = len(b)
    for capw in (_capw_bucket(9 * steps + 64), _capw_bucket(18 * steps)):
        fn = _spmd(pipeline_jax.arith_encode_rows, mesh, 2, 3, capw=capw)
        rows, byte_lens, oflow = fn(
            _shard_blocks(payload, mesh), _shard_blocks(lengths, mesh)
        )
        byte_lens = np.asarray(byte_lens)
        if int(byte_lens.max()) <= capw * 4:
            break
    payloads = _rows_payloads(rows, byte_lens, len(blocks))
    oflow = np.asarray(oflow)
    if oflow[: len(blocks)].any():
        from raisin_tpu.formats import arithmetic_ref

        for i in np.nonzero(oflow[: len(blocks)])[0]:
            payloads[i] = arithmetic_ref.compress(blocks[i])
    return payloads


def _encode_lzss_pipeline(blocks: list[bytes], mesh, with_arith: bool, window: int = 4096, whole: bytes | None = None):
    from raisin_tpu.ops import pipeline_jax

    if with_arith and _use_pallas():
        return _encode_lzss_arith_rows(blocks, mesh, window, whole)

    x, lengths, S = _escaped_blocks(blocks, mesh)
    B = x.shape[0]
    n = _mesh_size(mesh)
    if with_arith:
        bound = arithmetic_scan.BITS_PER_STEP_BOUND * (S + 8) * (B // n) // 8 + B * 4
        caps = (_cap_bytes(int(lengths.sum()), B) // n * n, bound * n)
    else:
        caps = ((S * (B // n) + 16) * n,)  # tokens never exceed the input
    for cap in caps:
        fn = _spmd(
            pipeline_jax.lzss_encode_packed, mesh, 2, 3,
            window=window, cap_bytes=cap // n, use_pallas=_use_pallas(),
            with_arith=with_arith,
        )
        flat, out_lens, tok_lens = fn(_shard_blocks(x, mesh), _shard_blocks(lengths, mesh))
        out_lens = np.asarray(out_lens)
        if _fits(out_lens, cap, mesh):
            break
    flat = np.asarray(flat)
    tok_lens = np.asarray(tok_lens)
    return _split_flat(flat, out_lens, len(blocks), mesh), [int(t) for t in tok_lens[: len(blocks)]]


def _encode_lzss_batch(blocks: list[bytes], mesh, window: int = 4096) -> list[bytes]:
    if _use_pallas() and mesh is None:
        # fused Pallas match+commit (the flagship path's first two stages,
        # sharing its kernel compiles); token words stream back per batch
        from raisin_tpu.ops import pipeline_jax

        bs0 = max(len(blocks[0]), 1)
        maxb = max(128, min(ENC_MAXB, ENC_MAX_BYTES // bs0 // 128 * 128))
        clean = bool(blocks) and len(blocks[0]) > 0 and _escape_clean(blocks)
        pend = []
        for i in range(0, len(blocks), maxb):
            part = blocks[i : i + maxb]
            full = (
                part + [b""] * (maxb - len(part))
                if len(blocks) > maxb or len(part) > maxb * 3 // 4
                else part
            )
            if clean:
                x, lengths, S = _raw_blocks(full)
            else:
                x, lengths, S = _escaped_blocks(full, None, align=128)
            if S > 65536:
                from raisin_tpu.engine.registry import get_codec

                lz = get_codec("lzss", backend="native")
                pend.append((part, [lz.compress(b, window) for b in part], None))
                continue
            dx = _device_put_big(x)
            tokw, tok_len = pipeline_jax.lzss_tokens_words(
                dx, jax.device_put(lengths), window=window, map_escape=clean
            )
            pend.append((part, tokw, tok_len))
        out: list[bytes] = []
        for part, tokw, tok_len in pend:
            if tok_len is None:
                out.extend(tokw)
                continue
            tl = np.asarray(tok_len)
            rows_np = _chunks_np(_rows_prefix(tokw, tl))
            out.extend(rows_np[k].tobytes()[: tl[k]] for k in range(len(part)))
        return out
    payloads, _ = _encode_lzss_pipeline(blocks, mesh, with_arith=False, window=window)
    return payloads


def _encode_lzss_arithmetic_batch(blocks: list[bytes], mesh, window: int = 4096, whole: bytes | None = None):
    return _encode_lzss_pipeline(blocks, mesh, with_arith=True, window=window, whole=whole)


def _decode_arithmetic_rows(payloads: list[bytes], out_lens: list[int], mesh) -> list[bytes]:
    """TPU fast path: Pallas lockstep arithmetic decode."""
    from raisin_tpu.ops import arithmetic_pallas as ap

    if mesh is None:
        capb_all = _gbucket(max(len(p) for p in payloads), base=512)
        vm_rows = max(1, DEC_WORDS_VMEM // (capb_all * 128))
        maxb = max(128, min(DEC_MAXB, vm_rows * 128))
    else:
        maxb = 1024 * _mesh_size(mesh)
    if len(payloads) > maxb:
        out: list[bytes] = []
        for i in range(0, len(payloads), maxb):
            out.extend(
                _decode_arithmetic_rows(payloads[i : i + maxb], out_lens[i : i + maxb], mesh)
            )
        return out

    B = _pad_block_count(len(payloads), mesh, align=128)
    capb = _gbucket(max(len(p) for p in payloads), base=512)
    # out_lens are block_size except the tail: exact 512-ceil (see the
    # encoder note; %CHUNK == 0 holds for 512 multiples)
    steps = max(512, (max(out_lens) + 1 + 511) // 512 * 512)
    prows = np.zeros((B, capb), dtype=np.uint8)
    blens = np.zeros(B, dtype=np.int32)
    olens = np.zeros(B, dtype=np.int32)
    for i, p in enumerate(payloads):
        prows[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
        blens[i] = len(p)
        olens[i] = out_lens[i]
    dec = _spmd(ap.decode_rows, mesh, 3, 2, num_steps=steps)
    syms, eof = dec(_shard_blocks(prows, mesh), _shard_blocks(blens, mesh), _shard_blocks(olens, mesh))
    syms = np.asarray(syms)
    eof = np.asarray(eof)
    out = []
    for i in range(len(payloads)):
        if not bool(eof[i]):
            raise ValueError(f"container: block {i} missing EOF symbol")
        out.append(syms[i, : out_lens[i]].tobytes())
    return out


def _dec_stage(payload_count, rows, olens_dev, eof_dev):
    """Per-batch post-kernel staging: read the tiny length/eof vectors and
    start the async device->host copy of the decoded rows (rides under the
    remaining batches' kernels). The copy is split into 4 row-chunks whose
    async transfers are issued from separate pool threads — the tunnel runs
    ~22 MB/s per stream but ~40 MB/s with parallel streams."""
    olens = np.asarray(olens_dev)[:payload_count]
    eof = np.asarray(eof_dev)
    if not eof[:payload_count].all():
        bad = int(np.nonzero(~eof[:payload_count].astype(bool))[0][0])
        raise ValueError(f"container: block {bad} missing EOF symbol")
    need_w = min(((int(olens.max()) + 3) // 4 + 128) // 128 * 128, rows.shape[1])
    sl = rows[:payload_count, :need_w]
    if sl.size * 4 < (4 << 20):
        sl.copy_to_host_async()
        return [sl], olens
    n = 4
    step = (payload_count + n - 1) // n
    chunks = [sl[i : i + step] for i in range(0, payload_count, step)]

    def _start(c):
        c.copy_to_host_async()
        return c

    return list(_pool().map(_start, chunks)), olens


def _dec_tail(payload_count, out_lens, row_chunks, olens, retry=None) -> bytes:
    """Escape-decode + verify + join for one decoded batch (vectorized).

    ``row_chunks`` is a list of device-array row slices whose host copies
    were started asynchronously in _dec_stage; fetching them here from pool
    threads keeps the tunnel streams parallel. ``retry`` re-decodes one
    block on the host — used when a block's escape expansion overflowed the
    device decoder's SMEM-bounded output capacity (cap_out slack)."""
    from raisin_tpu.formats.lzss_ref import decode_opening_symbols_np

    parts_np = list(_pool().map(np.asarray, row_chunks))
    exp = np.asarray(out_lens[:payload_count], dtype=np.int64)
    bs_u = int(exp[0]) if payload_count else 0
    width = parts_np[0].shape[1] * 4 if parts_np else 0
    uniform = (
        payload_count > 0
        and bs_u <= width
        and bool((exp[:-1] == bs_u).all())
        and int(exp[-1]) <= bs_u
        and np.array_equal(olens.astype(np.int64), exp)
    )
    if uniform:
        # common case: every block decodes to exactly block_size bytes (the
        # last possibly shorter) and the escape layer changed no lengths.
        # The join is then a contiguous 2D copy per chunk — no boolean-mask
        # gather over the padded matrix.
        pieces = []
        done = 0
        clean = True
        for chunk in parts_np:
            u8c = chunk.view(np.uint8)
            rows_here = chunk.shape[0]
            body = u8c[:, :bs_u].copy()  # copy: keep the chunk pristine for fallback
            if done + rows_here == payload_count and int(exp[-1]) < bs_u:
                tail_len = int(exp[-1])
                body = body.reshape(-1)[: (rows_here - 1) * bs_u + tail_len]
            else:
                body = body.reshape(-1)
            if (body == 0x5C).any():
                clean = False
                break
            np.copyto(body, 0x3C, where=body == 0xFF)
            pieces.append(body)
            done += rows_here
        if clean:
            return b"".join(p.tobytes() for p in pieces)
    rows_np = parts_np[0] if len(parts_np) == 1 else np.vstack(parts_np)
    u8 = rows_np.view(np.uint8)  # (count, need_w * 4) little-endian bytes
    mask = np.arange(u8.shape[1], dtype=np.int32)[None, :] < olens[:, None]
    if not ((u8 == 0x5C) & mask).any() and np.array_equal(olens.astype(np.int64), exp):
        # no escape pairs anywhere: the escape decode is a pure byte map
        # (0xFF -> '<') and lengths are preserved, so one flat pass does
        # the whole batch
        flat = u8[mask]
        np.copyto(flat, 0x3C, where=flat == 0xFF)
        return flat.tobytes()
    parts = []
    for i in range(payload_count):
        esc = rows_np[i].tobytes()[: olens[i]]
        dec = decode_opening_symbols_np(esc)
        if len(dec) != out_lens[i]:
            dec = retry(i) if retry is not None else dec
            if len(dec) != out_lens[i]:
                raise ValueError(
                    f"container: block {i} decoded {len(dec)} bytes, "
                    f"expected {out_lens[i]}"
                )
        parts.append(dec)
    return b"".join(parts)


def _decode_lzss_arith_rows(
    payloads: list[bytes], tok_lens: list[int], out_lens: list[int], mesh
) -> list[bytes]:
    """TPU fast path: Pallas arithmetic decode -> Pallas LZSS token decode,
    tokens never leaving the device; host does only the (vectorized)
    escape-decode layer and length verification.

    Single-chip, all batches (DEC_MAXB blocks each) are dispatched before
    any readback so transfers overlap compute across batches."""
    from raisin_tpu.ops import arithmetic_pallas as ap
    from raisin_tpu.ops import lzss_decode_pallas as dp

    if mesh is None:
        # the arithmetic decoder keeps the payload word stream VMEM-resident:
        # (capb bytes x block count) must stay under DEC_WORDS_VMEM — and
        # full (x8) sublane rows matter: (rows, 128) vector state pads to 8
        # sublanes, so a 128-block batch wastes 8x of every per-lane op.
        # Batches are also sized to ~DEC_MAX_BYTES of OUTPUT so at least a
        # couple are in flight for transfer/compute overlap.
        capb_all = _gbucket(max(len(p) for p in payloads), base=512)
        vm_rows = max(1, DEC_WORDS_VMEM // (capb_all * 128))
        out0 = max(max(out_lens), 1)
        maxb = max(128, min(DEC_MAXB, vm_rows * 128, DEC_MAX_BYTES // out0 // 128 * 128))
    else:
        maxb = 1024 * _mesh_size(mesh)

    # coarse shared shape buckets: every batch (the padded tail included)
    # compiles the same kernels once
    capb = _gbucket(max(len(p) for p in payloads), base=512)
    steps = _gbucket(max(tok_lens) + 1, base=2048)
    # the token-decode output block lives in SMEM (~1 MiB/core): size it for
    # the escape-free common case plus 12.5% slack; blocks that escape-expand
    # past it are re-decoded on the host (_dec_tail catches the truncation)
    mo = max(out_lens)
    cap_out = _gbucket(mo + mo // 8 + 128, base=4096)
    pend = []
    for i in range(0, len(payloads), maxb):
        part = payloads[i : i + maxb]
        part_tok = tok_lens[i : i + maxb]
        part_out = out_lens[i : i + maxb]
        B = maxb if len(payloads) > maxb else _pad_block_count(len(part), mesh, align=128)
        prows = np.zeros((B, capb), dtype=np.uint8)
        blens = np.zeros(B, dtype=np.int32)
        tlens = np.zeros(B, dtype=np.int32)
        for k, p in enumerate(part):
            prows[k, : len(p)] = np.frombuffer(p, dtype=np.uint8)
            blens[k] = len(p)
            tlens[k] = part_tok[k]
        dprows = _device_put_big(prows)
        tokens, eof = ap.decode_rows(
            dprows, jax.device_put(blens), jax.device_put(tlens), num_steps=steps
        )
        rows, olens = dp.lzss_decode_blocks(tokens, jax.device_put(tlens), cap_out=cap_out)
        pend.append((len(part), part, part_out, rows, olens, eof))

    def _retry(part):
        def go(i: int) -> bytes:
            from raisin_tpu.engine.registry import get_codec

            a = get_codec("arithmetic", backend="native")
            lz = get_codec("lzss", backend="native")
            return lz.decompress(a.decompress(part[i]))

        return go

    staged = [
        (count, part_out) + _dec_stage(count, rows, olens, eof) + (_retry(part),)
        for count, part, part_out, rows, olens, eof in pend
    ]
    return [_dec_tail(*p) for p in staged]


def _decode_arithmetic_batch(payloads: list[bytes], out_lens: list[int], mesh) -> list[bytes]:
    # device-path gate: the lockstep decoder keeps one batch's payload
    # words VMEM-resident, so per-block payloads must leave room for at
    # least one full 128-block lane group (DEC_WORDS_VMEM / 128)
    if _use_pallas() and max(len(p) for p in payloads) <= 65536:
        return _decode_arithmetic_rows(payloads, out_lens, mesh)
    if _use_pallas():
        # oversized payloads (past the VMEM gate): the native C host
        # decoder, pool-threaded — faster than shipping a giant scan to
        # the device, and the XLA fallback scan at these shapes has
        # crashed the tunneled TPU worker
        from raisin_tpu.engine.registry import get_codec

        a = get_codec("arithmetic", backend="native")
        return list(_pool().map(a.decompress, payloads))
    B = _pad_block_count(len(payloads), mesh)
    n = _mesh_size(mesh)
    per_seg = B // n
    lens = np.zeros(B, dtype=np.int32)
    outl = np.zeros(B, dtype=np.int32)
    for i, p in enumerate(payloads):
        lens[i] = len(p)
        outl[i] = out_lens[i]
    # per-device payload segments with LOCAL offsets: each shard holds only
    # its own bytes (a replicated flat buffer would broadcast the whole
    # stream to every device and serialize the readback)
    seg_lens = lens.reshape(n, per_seg)
    ends = np.cumsum(seg_lens, axis=1)
    offs = (ends - seg_lens).astype(np.int32).reshape(B)
    cap_local = _bucket(int(ends[:, -1].max()) + 16, base=128)
    flat = np.zeros(n * cap_local, dtype=np.uint8)
    for i, p in enumerate(payloads):
        seg, _ = divmod(i, per_seg)
        base = seg * cap_local + offs[i]
        flat[base : base + len(p)] = np.frombuffer(p, dtype=np.uint8)
    steps = _bucket(max(out_lens) + 1)
    max_bytes = _bucket(int(lens.max()), base=128)
    dec = _spmd(
        arithmetic_scan.decode_blocks_packed, mesh, 4, 2,
        num_steps=steps, max_bytes=max_bytes,
    )
    syms, eof_ok = dec(flat, offs, lens, outl)
    syms = np.asarray(syms)
    eof_ok = np.asarray(eof_ok)
    out = []
    for i in range(len(payloads)):
        if not bool(eof_ok[i]):
            raise ValueError(f"container: block {i} missing EOF symbol")
        out.append(syms[i, : out_lens[i]].tobytes())
    return out


# ---------------------------------------------------------------------------
# Container


def compress_container(
    data: bytes,
    algorithms: list[str] | tuple[str, ...] = ("lzss", "arithmetic"),
    block_size: int = DEFAULT_BLOCK_SIZE,
    mesh=None,
    window: int = 4096,
) -> bytes:
    """Block-parallel encode into the RSNB container.

    ``window`` is the LZSS search window (lz.NewWriterLevel parity,
    lzss.go:42). With block_size >> window it sets the speed/ratio point:
    match-search work scales ~linearly with the window while the ratio
    improves with it; payloads stay reference-decodable at any value (the
    token format carries explicit distances).
    """
    algorithms = tuple(algorithms)
    blocks = [data[i : i + block_size] for i in range(0, len(data), block_size)] or [b""]

    # the device kernels pack (L, D) / distances in <= 13-14 bit fields
    # (lzss_jax 14-bit match pack, lzss_decode_pallas 13-bit walk); larger
    # windows take the window-honoring host path below
    lz_device = window <= 8191

    aux: list[list[int]] = []
    if algorithms == ("arithmetic",):
        payloads = _encode_arithmetic_batch(blocks, mesh)
    elif algorithms == ("lzss",) and lz_device:
        payloads = _encode_lzss_batch(blocks, mesh, window)
    elif algorithms == ("lzss", "arithmetic") and lz_device:
        payloads, inter_lens = _encode_lzss_arithmetic_batch(blocks, mesh, window, whole=data)
        aux.append(inter_lens)
    elif algorithms == ("huffman",):
        from raisin_tpu.ops import huffman_blocks

        payloads = huffman_blocks.encode_blocks(blocks)
    elif algorithms == ("lzss", "huffman"):
        from raisin_tpu.ops import huffman_blocks

        tokens = _encode_lzss_batch(blocks, mesh, window)
        payloads = huffman_blocks.encode_blocks(tokens)
        aux.append([len(t) for t in tokens])
    else:
        # host fallback: any registered pipeline, still block-split (window
        # honored for lzss layers)
        from raisin_tpu.engine.core import compress_bytes

        payloads = []
        for b in blocks:
            payloads.append(compress_bytes(b, algorithms, window=window))
            _progress(len(payloads), len(blocks))

    return assemble_container(payloads, aux, algorithms, block_size, window, len(data))


def assemble_container(
    payloads: list[bytes],
    aux: list[list[int]],
    algorithms: tuple[str, ...],
    block_size: int,
    window: int,
    orig_size: int,
) -> bytes:
    """Frame already-encoded per-block payloads as an RSNB container.

    The multi-host path uses this directly: each process encodes its
    process_block_range locally, segments are gathered in rank order, and
    this single cheap header pass makes them one container.
    """
    algo_str = ",".join(algorithms).encode("ascii")
    head = MAGIC + struct.pack(
        "<BB", VERSION, len(algo_str)
    ) + algo_str + struct.pack("<IIQIB", block_size, window, orig_size, len(payloads), len(aux))
    sizes = struct.pack(f"<{len(payloads)}I", *(len(p) for p in payloads))
    aux_tables = b"".join(struct.pack(f"<{len(t)}I", *t) for t in aux)
    return head + sizes + aux_tables + b"".join(payloads)


def parse_container(data: bytes):
    if data[:4] != MAGIC:
        raise ValueError("not an RSNB container")
    version, algo_len = struct.unpack_from("<BB", data, 4)
    if version not in (1, VERSION):
        raise ValueError(f"unsupported RSNB version {version}")
    pos = 6
    algorithms = tuple(data[pos : pos + algo_len].decode("ascii").split(","))
    pos += algo_len
    if version == 1:
        block_size, orig_size, num_blocks, num_aux = struct.unpack_from("<IQIB", data, pos)
        window = 4096
        pos += 17
    else:
        block_size, window, orig_size, num_blocks, num_aux = struct.unpack_from(
            "<IIQIB", data, pos
        )
        pos += 21
    sizes = struct.unpack_from(f"<{num_blocks}I", data, pos)
    pos += 4 * num_blocks
    aux = []
    for _ in range(num_aux):
        aux.append(list(struct.unpack_from(f"<{num_blocks}I", data, pos)))
        pos += 4 * num_blocks
    payloads = []
    for s in sizes:
        payloads.append(data[pos : pos + s])
        pos += s
    return algorithms, block_size, orig_size, payloads, aux, window


def decompress_container(data: bytes, mesh=None) -> bytes:
    """Block-parallel decode of an RSNB container."""
    algorithms, block_size, orig_size, payloads, aux, window = parse_container(data)
    out_lens = [
        min(block_size, orig_size - i * block_size) for i in range(len(payloads))
    ]
    if orig_size == 0:
        return b""

    if algorithms == ("arithmetic",):
        blocks = _decode_arithmetic_batch(payloads, out_lens, mesh)
    elif algorithms == ("lzss", "arithmetic") and aux:
        out_lens_i = [int(v) for v in out_lens]
        if (
            _use_pallas()
            and max(len(p) for p in payloads) <= 65536  # VMEM word-stream gate
            and max(out_lens_i) <= 65536  # token-decode SMEM output gate
            and max(aux[0]) <= 65536  # token side-table SMEM gate
            and window <= 8191  # token-decode kernel packs D in 13 bits
        ):
            # fully-device decode: arithmetic + LZSS token parse in Pallas
            blocks = _decode_lzss_arith_rows(payloads, aux[0], out_lens_i, mesh)
        else:
            # arithmetic layer on device with the recorded token lengths;
            # LZSS token decode on host (C native when available)
            from raisin_tpu.engine.registry import get_codec

            lz = get_codec("lzss", backend="native")  # falls back to host oracle
            inter = _decode_arithmetic_batch(payloads, aux[0], mesh)
            blocks = [lz.decompress(t) for t in inter]
    elif algorithms == ("huffman",):
        from raisin_tpu.ops import huffman_blocks

        blocks = huffman_blocks.decode_blocks(payloads, out_bound=block_size)
    elif algorithms == ("lzss", "huffman"):
        from raisin_tpu.engine.registry import get_codec
        from raisin_tpu.ops import huffman_blocks

        lz = get_codec("lzss", backend="native")  # falls back to host oracle
        bound = max(aux[0]) if aux and aux[0] else None
        tokens = huffman_blocks.decode_blocks(payloads, out_bound=bound)
        blocks = [lz.decompress(t) for t in tokens]
    else:
        from raisin_tpu.engine.core import decompress_bytes

        blocks = [decompress_bytes(p, list(algorithms)) for p in payloads]

    out = b"".join(blocks)
    if len(out) != orig_size:
        raise ValueError(f"container: decoded {len(out)} bytes, expected {orig_size}")
    return out
