"""Round-4 stage profile: where encode_s / decode_s actually go.

Mirrors parallel/blocks.py's container paths exactly (same shapes, same
kernels), timing each stage plus the host/tunnel pieces the kernel-only
breakdown in bench.py misses. Run on the real TPU.
"""
from __future__ import annotations

import functools
import os
import time

import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MB = float(os.environ.get("MB", "4"))
BS = int(os.environ.get("BS", "16384"))
WIN = int(os.environ.get("WIN", "2048"))
ITERS = int(os.environ.get("ITERS", "3"))


def sync(r):
    import jax

    for leaf in jax.tree_util.tree_leaves(r):
        x = leaf
        while hasattr(x, "ndim") and x.ndim:
            x = x[0]
        np.asarray(x)


def t(fn, *args, iters=ITERS, warm=1, **kw):
    r = None
    for _ in range(warm):
        r = fn(*args, **kw)
        sync(r)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args, **kw)
        sync(r)
        best = min(best, time.perf_counter() - t0)
    return best, r


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    from bench import make_corpus
    from raisin_tpu.ops import arithmetic_pallas as ap
    from raisin_tpu.ops import lzss_commit_pallas, lzss_decode_pallas as dp, lzss_jax
    from raisin_tpu.parallel import blocks as blk
    from raisin_tpu.parallel.blocks import compress_container, decompress_container

    data = make_corpus(int(MB * (1 << 20)))

    # end-to-end reference points
    sec, container = t(
        lambda: compress_container(data, ("lzss", "arithmetic"), block_size=BS, window=WIN)
    )
    print(f"encode e2e s: {sec:.4f}  ({len(data)/sec/1e6:.2f} MB/s)", flush=True)
    sec, out = t(lambda: decompress_container(container))
    assert out == data
    print(f"decode e2e s: {sec:.4f}  ({len(data)/sec/1e6:.2f} MB/s)", flush=True)

    # ---- encode stages (same path as _encode_lzss_arith_rows)
    blocks = [data[i : i + BS] for i in range(0, len(data), BS)]
    sec, (x, lengths, S) = t(blk._escaped_blocks, blocks, None, 128, iters=2)
    print(f"  enc host _escaped_blocks s: {sec:.4f}", flush=True)
    B = x.shape[0]
    print(f"  B={B} S={S}", flush=True)

    sec, (dx, dl) = t(lambda: (jax.device_put(x), jax.device_put(lengths)))
    print(f"  enc h2d (steady) s: {sec:.4f}  ({x.nbytes/1e6:.1f} MB)", flush=True)

    pos = jnp.arange(S, dtype=jnp.int32)[None, :]

    @jax.jit
    def to_i32(xx, ll):
        return jnp.where(pos < ll[:, None], xx.astype(jnp.int32), -1)

    _, xi = t(to_i32, dx, dl)
    fm = jax.jit(
        functools.partial(
            lzss_jax.find_matches_blocks, window=WIN, num_steps=S // lzss_jax.TILE
        )
    )
    sec, (L, D) = t(fm, xi, dl)
    print(f"  enc match s: {sec:.4f}", flush=True)
    sec, (tok, tok_len) = t(lzss_commit_pallas.commit_emit_blocks, xi, L, D, dl)
    print(f"  enc commit s: {sec:.4f}", flush=True)
    tl = np.asarray(tok_len)
    print(f"  tok_len max={tl.max()} mean={tl.mean():.0f} (S+8 steps now={((S+8+511)//512)*512})", flush=True)

    steps = (S + 8 + 511) // 512 * 512
    posn = jnp.arange(steps, dtype=jnp.int32)[None, :]

    @jax.jit
    def symbols_of(tk, tle):
        tokp = jnp.pad(tk, ((0, 0), (0, steps - S)))
        return jnp.where(posn < tle[:, None], tokp, 256)

    _, syms = t(symbols_of, tok, tok_len)
    capw = ((9 * steps + 64) // 32 + 2 + 1023) // 1024 * 1024
    sec, (rows, byte_lens, oflow) = t(
        functools.partial(ap.encode_rows, capw=capw), syms, tok_len
    )
    print(f"  enc arith(steps={steps}) s: {sec:.4f}", flush=True)

    # arith at tighter steps bucket (what a dynamic bucket would give)
    steps2 = (int(tl.max()) + 1 + 511) // 512 * 512
    if steps2 < steps:
        posn2 = jnp.arange(steps2, dtype=jnp.int32)[None, :]

        @jax.jit
        def symbols_of2(tk, tle):
            tk2 = tk[:, :steps2] if S >= steps2 else jnp.pad(tk, ((0, 0), (0, steps2 - S)))
            return jnp.where(posn2 < tle[:, None], tk2, 256)

        _, syms2 = t(symbols_of2, tok, tok_len)
        capw2 = ((9 * steps2 + 64) // 32 + 2 + 1023) // 1024 * 1024
        sec, _ = t(functools.partial(ap.encode_rows, capw=capw2), syms2, tok_len)
        print(f"  enc arith(steps={steps2}) s: {sec:.4f}", flush=True)

    byte_lens_np = np.asarray(byte_lens)
    sec, payloads = t(blk._rows_payloads, rows, byte_lens_np, len(blocks), iters=2)
    print(f"  enc d2h rows+split s: {sec:.4f} (need_w bytes={int(byte_lens_np.max())})", flush=True)

    # ---- decode stages (same path as _decode_lzss_arith_rows)
    algorithms, block_size, orig_size, payloads_c, aux, _w = blk.parse_container(container)
    tok_lens = aux[0]
    out_lens = [min(block_size, orig_size - i * block_size) for i in range(len(payloads_c))]
    sec, _ = t(blk.parse_container, container, iters=2)
    print(f"  dec host parse s: {sec:.4f}", flush=True)

    Bp = blk._pad_block_count(len(payloads_c), None, align=128)
    capb = (max(len(p) for p in payloads_c) + 511) // 512 * 512
    dsteps = max(128, (max(tok_lens) + 1 + 127) // 128 * 128)
    cap_out = (2 * max(out_lens) + 4095) // 4096 * 4096

    def build_rows():
        prows = np.zeros((Bp, capb), dtype=np.uint8)
        blens = np.zeros(Bp, dtype=np.int32)
        tlens = np.zeros(Bp, dtype=np.int32)
        for i, p in enumerate(payloads_c):
            prows[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
            blens[i] = len(p)
            tlens[i] = tok_lens[i]
        return prows, blens, tlens

    sec, (prows, blens, tlens) = t(build_rows, iters=2)
    print(f"  dec host build rows s: {sec:.4f}", flush=True)
    sec, (dprows, dblens, dtlens) = t(
        lambda: (jax.device_put(prows), jax.device_put(blens), jax.device_put(tlens))
    )
    print(f"  dec h2d s: {sec:.4f} ({prows.nbytes/1e6:.1f} MB)", flush=True)

    sec, (tokens, eof) = t(
        functools.partial(ap.decode_rows, num_steps=dsteps), dprows, dblens, dtlens
    )
    print(f"  dec arith(steps={dsteps}) s: {sec:.4f}", flush=True)
    sec, (rows_o, olens) = t(
        functools.partial(dp.lzss_decode_blocks, cap_out=cap_out), tokens, dtlens
    )
    print(f"  dec lzss-token s: {sec:.4f}", flush=True)
    olens_np = np.asarray(olens)
    need_w = min(
        ((int(olens_np[: len(payloads_c)].max()) + 3) // 4 + 128) // 128 * 128,
        rows_o.shape[1],
    )
    sec, rows_np = t(lambda: np.asarray(rows_o[:, :need_w]))
    print(f"  dec d2h rows s: {sec:.4f} ({Bp*need_w*4/1e6:.1f} MB)", flush=True)

    from raisin_tpu.formats.lzss_ref import decode_opening_symbols_np

    def host_tail():
        outl = []
        for i in range(len(payloads_c)):
            esc = rows_np[i].tobytes()[: olens_np[i]]
            outl.append(decode_opening_symbols_np(esc))
        return b"".join(outl)

    sec, joined = t(host_tail, iters=2)
    print(f"  dec host escape+join s: {sec:.4f}", flush=True)
    assert joined == data
    print("done", flush=True)


if __name__ == "__main__":
    main()
