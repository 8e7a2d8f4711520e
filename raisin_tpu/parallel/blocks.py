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
  orig_size u64 | num_blocks u32 | num_aux u8 |
  num_blocks × u32 payload sizes |
  num_aux × (num_blocks × u32) auxiliary per-block lengths |
  concatenated payloads

The auxiliary tables record intermediate layer lengths (e.g. the LZSS
token-stream size per block in the lzss,arithmetic pipeline) so that every
layer of the decode runs on device with static shapes — the scan decoder
needs the symbol count up front.
"""

from __future__ import annotations

import struct

import functools

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from raisin_tpu.bitkit.packing import unpack_prepad_sentinel
from raisin_tpu.formats.lzss_ref import encode_opening_symbols
from raisin_tpu.ops import arithmetic_scan, lzss_jax

MAGIC = b"RSNB"
VERSION = 1
DEFAULT_BLOCK_SIZE = 1 << 16

_DEVICE_PIPELINES = (("arithmetic",), ("lzss",), ("lzss", "arithmetic"))


def _bucket(n: int, base: int = 1024) -> int:
    # ×2 growth: batch mode favors tight scan lengths over fewer compiles
    # (the persistent compilation cache absorbs the extra specializations)
    size = base
    while size < n:
        size *= 2
    return size


def _shard_blocks(arr: np.ndarray, mesh) -> jax.Array:
    if mesh is None:
        return arr
    from raisin_tpu.parallel.mesh import block_sharding

    return jax.device_put(arr, block_sharding(mesh))


def _spmd(fn, mesh, n_in: int, n_out: int):
    """Run a vmapped block kernel SPMD over the mesh 'data' axis.

    Blocks are embarrassingly parallel, so each device simply runs the plain
    kernel on its local shard (explicit shard_map rather than relying on
    sharding inference through the scan).
    """
    if mesh is None:
        return fn
    spec_in = tuple(P("data") for _ in range(n_in))
    spec_out = tuple(P("data") for _ in range(n_out))
    return jax.shard_map(fn, mesh=mesh, in_specs=spec_in, out_specs=spec_out, check_vma=False)


def _pad_block_count(b: int, mesh) -> int:
    if mesh is None:
        return b
    n = mesh.devices.size
    return ((b + n - 1) // n) * n


# ---------------------------------------------------------------------------
# Device batch encoders (per pipeline)


def _encode_arithmetic_batch(blocks: list[bytes], mesh) -> list[bytes]:
    B = _pad_block_count(len(blocks), mesh)
    steps = _bucket(max(len(b) for b in blocks) + 1)
    symbols = np.full((B, steps), arithmetic_scan.EOF, dtype=np.int32)
    lengths = np.zeros(B, dtype=np.int32)
    for i, b in enumerate(blocks):
        symbols[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lengths[i] = len(b)
    symbols = _shard_blocks(symbols, mesh)
    lengths_d = _shard_blocks(lengths, mesh)
    enc = _spmd(
        functools.partial(arithmetic_scan.encode_blocks, num_steps=steps), mesh, 2, 2
    )
    padded_bits, bit_lengths = enc(symbols, lengths_d)
    padded_bits = np.asarray(padded_bits)
    bit_lengths = np.asarray(bit_lengths)
    packed = np.packbits(padded_bits, axis=1)
    return [
        packed[i, : int(bit_lengths[i]) // 8].tobytes() for i in range(len(blocks))
    ]


def _lzss_tokens_batch(blocks: list[bytes], mesh):
    """Escape + device match/commit for a batch; returns (out, out_len) arrays."""
    encs = [encode_opening_symbols(b) for b in blocks]
    B = _pad_block_count(len(blocks), mesh)
    S = _bucket(max((len(e) for e in encs), default=1), base=lzss_jax.TILE * 128)
    x = np.full((B, S), -1, dtype=np.int32)
    lengths = np.zeros(B, dtype=np.int32)
    for i, e in enumerate(encs):
        x[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
        lengths[i] = len(e)
    x = _shard_blocks(x, mesh)
    lengths_d = _shard_blocks(lengths, mesh)
    match = _spmd(
        functools.partial(
            lzss_jax.find_matches_blocks, window=4096, num_steps=S // lzss_jax.TILE
        ),
        mesh, 2, 2,
    )
    L, D = match(x, lengths_d)
    commit = _spmd(lzss_jax.commit_blocks, mesh, 4, 2)
    out, out_len = commit(x, L, D, lengths_d)
    return np.asarray(out), np.asarray(out_len)


def _encode_lzss_batch(blocks: list[bytes], mesh) -> list[bytes]:
    out, out_len = _lzss_tokens_batch(blocks, mesh)
    return [out[i, : int(out_len[i])].tobytes() for i in range(len(blocks))]


def _encode_lzss_arithmetic_batch(blocks: list[bytes], mesh):
    out, out_len = _lzss_tokens_batch(blocks, mesh)
    inter = [out[i, : int(out_len[i])].tobytes() for i in range(len(blocks))]
    return _encode_arithmetic_batch(inter, mesh), [len(t) for t in inter]


def _decode_arithmetic_batch(payloads: list[bytes], out_lens: list[int], mesh) -> list[bytes]:
    B = _pad_block_count(len(payloads), mesh)
    tails = [
        np.concatenate([unpack_prepad_sentinel(p), np.array([1, 0], dtype=np.uint8)])
        for p in payloads
    ]
    nbits = _bucket(max(len(t) for t in tails))
    bits = np.zeros((B, nbits), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    for i, t in enumerate(tails):
        bits[i, : len(t)] = t
        lengths[i] = out_lens[i]
    steps = _bucket(max(out_lens) + 1)
    bits = _shard_blocks(bits, mesh)
    lengths_d = _shard_blocks(lengths, mesh)
    dec = _spmd(
        functools.partial(arithmetic_scan.decode_blocks, num_steps=steps), mesh, 2, 2
    )
    syms, eof_ok = dec(bits, lengths_d)
    syms = np.asarray(syms)
    eof_ok = np.asarray(eof_ok)
    out = []
    for i in range(len(payloads)):
        if not bool(eof_ok[i]):
            raise ValueError(f"container: block {i} missing EOF symbol")
        out.append(syms[i, : out_lens[i]].astype(np.uint8).tobytes())
    return out


# ---------------------------------------------------------------------------
# Container


def compress_container(
    data: bytes,
    algorithms: list[str] | tuple[str, ...] = ("lzss", "arithmetic"),
    block_size: int = DEFAULT_BLOCK_SIZE,
    mesh=None,
) -> bytes:
    """Block-parallel encode into the RSNB container."""
    algorithms = tuple(algorithms)
    blocks = [data[i : i + block_size] for i in range(0, len(data), block_size)] or [b""]

    aux: list[list[int]] = []
    if algorithms == ("arithmetic",):
        payloads = _encode_arithmetic_batch(blocks, mesh)
    elif algorithms == ("lzss",):
        payloads = _encode_lzss_batch(blocks, mesh)
    elif algorithms == ("lzss", "arithmetic"):
        payloads, inter_lens = _encode_lzss_arithmetic_batch(blocks, mesh)
        aux.append(inter_lens)
    else:
        # host fallback: any registered pipeline, still block-split
        from raisin_tpu.engine.core import compress_bytes

        payloads = [compress_bytes(b, algorithms) for b in blocks]

    algo_str = ",".join(algorithms).encode("ascii")
    head = MAGIC + struct.pack(
        "<BB", VERSION, len(algo_str)
    ) + algo_str + struct.pack("<IQIB", block_size, len(data), len(payloads), len(aux))
    sizes = struct.pack(f"<{len(payloads)}I", *(len(p) for p in payloads))
    aux_tables = b"".join(struct.pack(f"<{len(t)}I", *t) for t in aux)
    return head + sizes + aux_tables + b"".join(payloads)


def parse_container(data: bytes):
    if data[:4] != MAGIC:
        raise ValueError("not an RSNB container")
    version, algo_len = struct.unpack_from("<BB", data, 4)
    if version != VERSION:
        raise ValueError(f"unsupported RSNB version {version}")
    pos = 6
    algorithms = tuple(data[pos : pos + algo_len].decode("ascii").split(","))
    pos += algo_len
    block_size, orig_size, num_blocks, num_aux = struct.unpack_from("<IQIB", data, pos)
    pos += 17
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
    return algorithms, block_size, orig_size, payloads, aux


def decompress_container(data: bytes, mesh=None) -> bytes:
    """Block-parallel decode of an RSNB container."""
    algorithms, block_size, orig_size, payloads, aux = parse_container(data)
    out_lens = [
        min(block_size, orig_size - i * block_size) for i in range(len(payloads))
    ]
    if orig_size == 0:
        return b""

    if algorithms == ("arithmetic",):
        blocks = _decode_arithmetic_batch(payloads, out_lens, mesh)
    elif algorithms == ("lzss", "arithmetic") and aux:
        # arithmetic layer on device with the recorded token-stream lengths;
        # LZSS token decode on host (device LZSS decode: future work)
        from raisin_tpu.formats import lzss_ref

        inter = _decode_arithmetic_batch(payloads, aux[0], mesh)
        blocks = [lzss_ref.decompress(t) for t in inter]
    else:
        from raisin_tpu.engine.core import decompress_bytes

        blocks = [decompress_bytes(p, list(algorithms)) for p in payloads]

    out = b"".join(blocks)
    if len(out) != orig_size:
        raise ValueError(f"container: decoded {len(out)} bytes, expected {orig_size}")
    return out
