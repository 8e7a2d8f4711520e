"""Round-3 sweep #2: new batched-reduce match kernel + decode stages at B=1024/2048/4096."""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import make_corpus  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from raisin_tpu.formats.lzss_ref import encode_opening_symbols  # noqa: E402
from raisin_tpu.ops import arithmetic_pallas, lzss_commit_pallas, lzss_jax  # noqa: E402
from raisin_tpu.ops import lzss_decode_pallas  # noqa: E402


def sync(r):
    for leaf in jax.tree_util.tree_leaves(r):
        x = leaf
        while hasattr(x, "ndim") and x.ndim:
            x = x[0]
        np.asarray(x)


def best(fn, iters=3):
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    block = 4096
    nbytes = 16 << 20
    data = make_corpus(nbytes)
    blocks = [data[i : i + block] for i in range(0, len(data), block)]
    encs = [encode_opening_symbols(b) for b in blocks]
    S = 4096
    B_all = len(encs)
    x_all = np.zeros((B_all, S), dtype=np.uint8)
    lens_all = np.zeros(B_all, dtype=np.int32)
    for i, e in enumerate(encs):
        x_all[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
        lens_all[i] = len(e)

    from raisin_tpu.formats import arithmetic_ref  # noqa: F401

    for B in (1024, 2048, 4096):
        nb = B * block
        x = jax.device_put(x_all[:B])
        ln = jax.device_put(lens_all[:B])
        pos = jnp.arange(S, dtype=jnp.int32)[None, :]

        @jax.jit
        def to_i32(xx, ll):
            return jnp.where(pos < ll[:, None], xx.astype(jnp.int32), -1)

        xi = to_i32(x, ln)
        sync(xi)

        fm = jax.jit(
            functools.partial(lzss_jax.find_matches_blocks, window=4096, num_steps=S // lzss_jax.TILE)
        )
        sync(fm(xi, ln))
        t = best(lambda: fm(xi, ln))
        print(f"match-v2 B={B}: {t*1e3:8.2f} ms  {t/nb*1e9:6.2f} ns/B", flush=True)
        L, D = fm(xi, ln)

        ce = lzss_commit_pallas.commit_emit_blocks
        sync(ce(xi, L, D, ln))
        t = best(lambda: ce(xi, L, D, ln))
        print(f"commit   B={B}: {t*1e3:8.2f} ms  {t/nb*1e9:6.2f} ns/B", flush=True)
        tok, tok_len = ce(xi, L, D, ln)

        steps = (S + 8 + 511) // 512 * 512
        posn = jnp.arange(steps, dtype=jnp.int32)[None, :]

        @jax.jit
        def symbols_of(tk, tl):
            tokp = jnp.pad(tk, ((0, 0), (0, steps - S)))
            return jnp.where(posn < tl[:, None], tokp, 256)

        syms = symbols_of(tok, tok_len)
        sync(syms)
        capw = ((9 * steps + 64) // 32 + 2 + 1023) // 1024 * 1024
        enc = functools.partial(arithmetic_pallas.encode_rows, capw=capw)
        try:
            sync(enc(syms, tok_len))
            t = best(lambda: enc(syms, tok_len))
            print(f"arith    B={B}: {t*1e3:8.2f} ms  {t/nb*1e9:6.2f} ns/B", flush=True)
            rows, byte_lens, oflow = enc(syms, tok_len)
        except Exception as e:
            print(f"arith    B={B}: FAILED {repr(e)[:120]}", flush=True)
            continue

        # decode stages
        capb = int((int(np.asarray(byte_lens).max()) + 511) // 512 * 512)
        prows_np = np.asarray(rows[:, : capb // 4])
        prows = jax.device_put(
            np.frombuffer(prows_np.tobytes(), dtype=np.uint8).reshape(B, capb)
        )
        blens = jax.device_put(np.asarray(byte_lens))
        tlens = jax.device_put(np.asarray(tok_len))
        dsteps = int(max(128, (int(np.asarray(tok_len).max()) + 1 + 127) // 128 * 128))
        dec = functools.partial(arithmetic_pallas.decode_rows, num_steps=dsteps)
        try:
            sync(dec(prows, blens, tlens))
            t = best(lambda: dec(prows, blens, tlens))
            print(f"arithdec B={B}: {t*1e3:8.2f} ms  {t/nb*1e9:6.2f} ns/B", flush=True)
            tokens, eof = dec(prows, blens, tlens)
        except Exception as e:
            print(f"arithdec B={B}: FAILED {repr(e)[:120]}", flush=True)
            continue

        cap_out = (2 * block + 4095) // 4096 * 4096
        ld = functools.partial(lzss_decode_pallas.lzss_decode_blocks, cap_out=cap_out)
        sync(ld(tokens, tlens))
        t = best(lambda: ld(tokens, tlens))
        print(f"lzssdec  B={B}: {t*1e3:8.2f} ms  {t/nb*1e9:6.2f} ns/B", flush=True)


if __name__ == "__main__":
    main()
