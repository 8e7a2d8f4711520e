"""Bisect the Pallas encoder scaffold cost: which body element costs 18us/step?"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES, CHUNK = 8, 128, 128


def sync(r):
    for leaf in jax.tree_util.tree_leaves(r):
        x = leaf
        while hasattr(x, "ndim") and x.ndim:
            x = x[0]
        np.asarray(x)


def t(name, fn, *args, iters=3):
    sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best * 1e3:8.2f} ms", flush=True)


def build(body_kind, S=4608, unroll=1):
    G = S // CHUNK

    def kern(sym_ref, len_ref, out_ref, low, high):
        pid = pl.program_id(0)

        @pl.when(pid == 0)
        def _init():
            low[:] = jnp.zeros((ROWS, LANES), jnp.int32)
            high[:] = jnp.full((ROWS, LANES), 0xFFFF, jnp.int32)

        n = len_ref[:]

        def one(s):
            if body_kind == "empty":
                return
            sym = sym_ref[s]
            if body_kind == "read_sym":
                low[:] = low[:] + 0 * sym
                return
            lowv, highv = low[:], high[:]
            if body_kind == "state_rw":
                low[:] = lowv + sym
                high[:] = highv - sym
                return
            if body_kind == "div":
                diff = highv - lowv + 1
                nh = lowv + (diff * sym) // (sym + 257)
                low[:] = nh
                high[:] = highv + 1
                return
            if body_kind == "mul":
                diff = highv - lowv + 1
                nh = lowv + (diff * sym) * (sym + 257)
                low[:] = nh
                high[:] = highv + 1
                return

        def body(u, _):
            for k in range(unroll):
                one(u * unroll + k)
            return 0

        jax.lax.fori_loop(0, CHUNK // unroll, body, 0)
        out_ref[0] = low[:]

    return jax.jit(lambda sy, ln: pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((CHUNK, ROWS, LANES), lambda g: (g, 0, 0)),
            pl.BlockSpec((ROWS, LANES), lambda g: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, ROWS, LANES), lambda g: (g, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((G, ROWS, LANES), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(sy, ln))


def main():
    print("backend:", jax.default_backend(), flush=True)
    S = 4608
    rng = np.random.default_rng(0)
    sy = jnp.asarray(rng.integers(0, 256, (S, ROWS, LANES)), dtype=jnp.int32)
    ln = jnp.full((ROWS, LANES), S - 10, jnp.int32)
    for kind in ["empty", "read_sym", "state_rw", "mul", "div"]:
        t(f"body[{kind}]", build(kind), sy, ln)
    t("body[div] unroll=8", build("div", unroll=8), sy, ln)
    t("body[state_rw] unroll=8", build("state_rw", unroll=8), sy, ln)


if __name__ == "__main__":
    main()
