"""Benchmark entry point: prints ONE JSON line for the driver.

Headline metric: end-to-end encode throughput (MB/s) of the default
lzss,arithmetic pipeline in RSNB block-parallel container mode (host bytes
in -> container bytes out, including tunnel transfers and host assembly).

Detail carries the rest of the BASELINE.json metric set: decode MB/s,
device-resident encode rate (per-chip number without the tunnel), stage
breakdown, and compression ratio.

Baseline: the reference publishes no GB/s figures (BASELINE.md). The only
measured datapoint is raisin-Go's arithmetic coder at 40155 B / 20.89 ms
= 1.92 MB/s (reference ai/data.json:1-30) — and its LZSS (goroutine per
byte) is far slower, so using 1.92 MB/s for the full lzss+arithmetic
pipeline is conservative in Go's favor.

NB: on the axon TPU backend ``block_until_ready`` is a no-op; every timing
here syncs through a (tiny) device->host readback.

Env knobs:
  RAISIN_BENCH_MB       input size in MiB (default 4)
  RAISIN_BENCH_BLOCK    block size in bytes (default 4096)
  RAISIN_BENCH_ITERS    timed iterations (default 3)
  RAISIN_TPU_PLATFORM   force a jax platform (e.g. cpu)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

GO_BASELINE_MBPS = 40155 / 20.89e-3 / 1e6  # ai/data.json: arithmetic, 40155 B in 20.89 ms


def make_corpus(n_bytes: int, seed: int = 0) -> bytes:
    """Deterministic text-like corpus (word soup with repetition structure)."""
    rng = np.random.default_rng(seed)
    words = [
        b"the", b"quick", b"brown", b"fox", b"jumps", b"over", b"lazy", b"dog",
        b"compression", b"entropy", b"arithmetic", b"huffman", b"lzss", b"window",
        b"token", b"block", b"stream", b"model", b"frequency", b"symbol",
    ]
    idx = rng.integers(0, len(words), size=n_bytes // 5 + 16)
    out = b" ".join(words[i] for i in idx)
    return out[:n_bytes]


def _sync(r):
    import jax

    for leaf in jax.tree_util.tree_leaves(r):
        x = leaf
        while hasattr(x, "ndim") and x.ndim:
            x = x[0]
        np.asarray(x)


def _best(fn, iters):
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def device_stage_breakdown(data: bytes, block: int) -> dict:
    """Per-stage device timings of the fused encode (TPU path only)."""
    import functools

    import jax
    import jax.numpy as jnp

    from raisin_tpu.formats.lzss_ref import encode_opening_symbols
    from raisin_tpu.ops import arithmetic_pallas, lzss_commit_pallas, lzss_jax

    blocks = [data[i : i + block] for i in range(0, len(data), block)][:1024]
    t0 = time.perf_counter()
    encs = [encode_opening_symbols(b) for b in blocks]
    host_escape = time.perf_counter() - t0
    B = (len(encs) + 127) // 128 * 128
    S = max(1024, 1 << (max(len(e) for e in encs) - 1).bit_length())
    x = np.zeros((B, S), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    for i, e in enumerate(encs):
        x[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
        lengths[i] = len(e)

    t0 = time.perf_counter()
    dx = jax.device_put(x)
    dl = jax.device_put(lengths)
    _sync((dx, dl))
    h2d = time.perf_counter() - t0

    pos = jnp.arange(S, dtype=jnp.int32)[None, :]

    @jax.jit
    def to_i32(xx, ll):
        return jnp.where(pos < ll[:, None], xx.astype(jnp.int32), -1)

    xi = to_i32(dx, dl)
    _sync(xi)

    fm = jax.jit(functools.partial(lzss_jax.find_matches_blocks, window=4096, num_steps=S // lzss_jax.TILE))
    stages = {}

    def timeit(name, fn, *args, iters=2):
        _sync(fn(*args))
        stages[name] = _best(lambda: _sync(fn(*args)), iters)
        return fn(*args)

    L, D = timeit("match", fm, xi, dl)
    tok, tok_len = timeit("commit_emit", lzss_commit_pallas.commit_emit_blocks, xi, L, D, dl)
    steps = (S + 8 + 511) // 512 * 512
    posn = jnp.arange(steps, dtype=jnp.int32)[None, :]

    @jax.jit
    def symbols_of(tk, tl):
        tokp = jnp.pad(tk, ((0, 0), (0, steps - S)))
        return jnp.where(posn < tl[:, None], tokp, 256)

    syms = symbols_of(tok, tok_len)
    _sync(syms)
    capw = ((9 * steps + 64) // 32 + 2 + 1023) // 1024 * 1024
    enc = functools.partial(arithmetic_pallas.encode_rows, capw=capw)
    timeit("arith_pack", enc, syms, tok_len)
    return {"host_escape_s": round(host_escape, 4), "h2d_s": round(h2d, 4),
            **{f"{k}_s": round(v, 4) for k, v in stages.items()}}


def main() -> None:
    mb = float(os.environ.get("RAISIN_BENCH_MB", "4"))
    block = int(os.environ.get("RAISIN_BENCH_BLOCK", "4096"))
    iters = int(os.environ.get("RAISIN_BENCH_ITERS", "3"))

    import jax

    from raisin_tpu.parallel.blocks import compress_container, decompress_container

    data = make_corpus(int(mb * (1 << 20)))
    on_tpu = jax.default_backend() == "tpu"

    # warm-up: compile + one full pass, and verify losslessness
    t0 = time.perf_counter()
    container = compress_container(data, ("lzss", "arithmetic"), block_size=block)
    warm = time.perf_counter() - t0
    assert decompress_container(container) == data, "bench round-trip failed"

    enc_s = _best(
        lambda: compress_container(data, ("lzss", "arithmetic"), block_size=block),
        iters,
    )
    dec_s = _best(lambda: decompress_container(container), iters)
    ratio = len(container) / len(data) * 100

    detail = {
        "input_mb": round(len(data) / 1e6, 2),
        "block_size": block,
        "compression_ratio_pct": round(ratio, 2),
        "warmup_s": round(warm, 2),
        "encode_s": round(enc_s, 4),
        "decode_s": round(dec_s, 4),
        "decode_mbps": round(len(data) / dec_s / 1e6, 3),
        "device": str(jax.devices()[0]),
        "go_baseline_mbps": round(GO_BASELINE_MBPS, 2),
    }
    if on_tpu:
        try:
            detail["stages"] = device_stage_breakdown(data, block)
        except Exception as e:  # stage breakdown must never kill the bench
            detail["stages_error"] = repr(e)[:200]

    mbps = len(data) / enc_s / 1e6
    result = {
        "metric": "encode_throughput_lzss_arithmetic_blocks",
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / GO_BASELINE_MBPS, 2),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
