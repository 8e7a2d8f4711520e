"""One-shot stage profile of the encode pipeline on the current backend.

Times each stage of the lzss,arithmetic container encode separately so we can
see where the round-1 39.5 s/iteration went. Run on TPU (default) or CPU.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(r):
    """Force completion: block_until_ready is a no-op on the axon backend,
    so read one element of every leaf back to host."""
    for leaf in jax.tree_util.tree_leaves(r):
        x = leaf
        while x.ndim:
            x = x[0]
        np.asarray(x)


def t(fn, *args, iters=3, warm=1):
    for _ in range(warm):
        r = fn(*args)
        sync(r)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        sync(r)
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    t0 = time.perf_counter()
    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    print("init s:", round(time.perf_counter() - t0, 1), flush=True)

    # sync-latency floor: one tiny dispatch + 1-element readback
    z = jnp.zeros((8, 128), jnp.int32)
    sec, _ = t(lambda a: a + 1, z)
    print(f"sync floor s: {sec:.4f}", flush=True)

    from bench import make_corpus
    from raisin_tpu.formats.lzss_ref import encode_opening_symbols
    from raisin_tpu.ops import arithmetic_scan, lzss_jax
    from raisin_tpu.ops.pipeline_jax import concat_blocks

    MB = 4
    BS = 16384
    data = make_corpus(MB << 20)
    blocks = [data[i : i + BS] for i in range(0, len(data), BS)]

    th0 = time.perf_counter()
    encs = [encode_opening_symbols(b) for b in blocks]
    print("host escape s:", round(time.perf_counter() - th0, 3), flush=True)

    B = len(encs)
    S = 16384  # escaped blocks can exceed BS slightly; clamp corpus has no < or 0x5c? they may... pad to next 1024
    S = max(S, ((max(len(e) for e in encs) + 1023) // 1024) * 1024)
    x = np.full((B, S), -1, dtype=np.int32)
    lengths = np.zeros(B, dtype=np.int32)
    for i, e in enumerate(encs):
        x[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
        lengths[i] = len(e)

    th0 = time.perf_counter()
    xd = jax.device_put(x)
    ld = jax.device_put(lengths)
    jax.block_until_ready((xd, ld))
    print("H2D s:", round(time.perf_counter() - th0, 3), f"({x.nbytes/1e6:.0f} MB as int32)", flush=True)

    # --- match search (pallas on tpu, scan on cpu)
    if jax.default_backend() == "tpu":
        from raisin_tpu.ops import lzss_pallas

        sec, (L, D) = t(lzss_pallas.find_matches_blocks_pallas, xd, ld)
        print(f"match pallas s: {sec:.3f}  ({MB/sec:.1f} MB/s)", flush=True)
    else:
        fm = functools.partial(lzss_jax.find_matches_blocks, window=4096, num_steps=S // lzss_jax.TILE)
        sec, (L, D) = t(fm, xd, ld)
        print(f"match scan s: {sec:.3f}  ({MB/sec:.1f} MB/s)", flush=True)

    # --- commit
    sec, (tok, tok_len) = t(lzss_jax.commit_blocks, xd, L, D, ld)
    print(f"commit s: {sec:.3f}  ({MB/sec:.1f} MB/s)", flush=True)

    # --- arithmetic scan: events only vs full encode
    steps = S + 8
    payload = jnp.pad(tok, ((0, 0), (0, 8)))

    @jax.jit
    def events_only(symbols, lens):
        stepsv = jnp.arange(steps, dtype=jnp.int32)
        syms = jnp.where(stepsv[None, :] < lens[:, None], symbols.astype(jnp.int32), arithmetic_scan.EOF)

        def one_block(sy, n):
            active = stepsv <= n
            init = (jnp.int32(0), jnp.int32(arithmetic_scan.MAX_CODE), jnp.int32(0),
                    arithmetic_scan._fresh_model(), jnp.bool_(False))
            _, (slots, slot0) = jax.lax.scan(arithmetic_scan._encode_step, init, (sy, active))
            return slots, slot0

        return jax.vmap(one_block)(syms, lens)

    sec, (slots, slot0) = t(events_only, payload, tok_len)
    print(f"arith scan (events only) s: {sec:.3f}  ({MB/sec:.2f} MB/s)", flush=True)

    max_bits = arithmetic_scan.BITS_PER_STEP_BOUND * steps + 16

    @jax.jit
    def expand_only(slots, slot0):
        return jax.vmap(lambda s, s0: arithmetic_scan._expand_block_bits(s, s0, max_bits))(slots, slot0)

    sec, (bits, bitlens) = t(expand_only, slots, slot0)
    print(f"expand (searchsorted) s: {sec:.3f}  ({MB/sec:.2f} MB/s)", flush=True)

    # --- pack + concat
    cap = int(MB * 1.4 * (1 << 20)) // 128 * 128

    @functools.partial(jax.jit, static_argnames=("cap",))
    def pack_concat(padded_bits, bit_lengths, cap):
        byte_lens = bit_lengths // 8
        mb_ = padded_bits.shape[1]
        mbytes = mb_ // 8
        weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.int32)
        packed = jnp.sum(
            padded_bits[:, : mbytes * 8].reshape(B, mbytes, 8).astype(jnp.int32) * weights[None, None, :],
            axis=-1,
        ).astype(jnp.uint8)
        return concat_blocks(packed, byte_lens, cap), byte_lens

    sec, (flat, byte_lens) = t(pack_concat, bits, bitlens, cap)
    print(f"pack+concat s: {sec:.3f}  ({MB/sec:.2f} MB/s)", flush=True)

    th0 = time.perf_counter()
    out = np.asarray(flat)
    print("D2H s:", round(time.perf_counter() - th0, 3), f"({out.nbytes/1e6:.0f} MB cap)", flush=True)

    # --- device arithmetic decode
    byte_lens_np = np.asarray(byte_lens)
    offs = np.concatenate([[0], np.cumsum(byte_lens_np)[:-1]]).astype(np.int32)
    maxb = int(((byte_lens_np.max() + 127) // 128) * 128)
    dec = functools.partial(arithmetic_scan.decode_blocks_packed, num_steps=steps, max_bytes=maxb)
    sec, (syms, eof_ok) = t(dec, flat, jax.device_put(offs), byte_lens, tok_len)
    print(f"arith decode s: {sec:.3f}  ({MB/sec:.2f} MB/s)  eof_ok={bool(np.asarray(eof_ok).all())}", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
