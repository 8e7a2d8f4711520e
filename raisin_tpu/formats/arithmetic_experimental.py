"""Experimental arithmetic-coding variants (reference-parity tail).

The reference ships two unfinished arithmetic experiments that are NOT
registered in its engine (grep-verified; see SURVEY §2.2):

- ``compressor/arithmetic_big`` — whole-message coding with
  ``math/big.Float`` at precision 200; its Compress returns the literal
  string "compress" and Decompress returns "decompress"
  (arithmetic_big.go:40,116) — a dead end.
- ``compressor/arithmetic_logical`` — a float64 renormalizing coder whose
  Decompress uses a hard-coded frequency table (arithmetic.go:103); only its
  ``Range()`` is consumed, by the WASM demo (wasm/arithmetic/arithmetic.go:19).

Here both ideas are implemented *functionally* (the capability the reference
aimed at, not its broken state):

- :func:`big_compress` / :func:`big_decompress` — whole-message arithmetic
  coding with exact rational arithmetic (Fraction == unbounded precision,
  strictly stronger than prec-200 floats). Static order-0 model carried in a
  small header. Lossless.
- :func:`range_of` — the ``[bot, top)`` subinterval of [0, 1) that encodes a
  message under its own empirical distribution, as floats — the quantity the
  reference's WASM demo exposes as the JS global ``arithmeticEncode``.

These are registered nowhere (parity with the reference); import them
explicitly.
"""

from __future__ import annotations

from fractions import Fraction


def _freq_table(data: bytes) -> list[int]:
    counts = [0] * 257
    for b in data:
        counts[b] += 1
    counts[256] = 1  # EOF
    return counts


def _cumulative(counts: list[int]) -> list[int]:
    cum = [0] * 258
    for i in range(257):
        cum[i + 1] = cum[i] + counts[i]
    return cum


def big_compress(data: bytes) -> bytes:
    """Whole-message arithmetic coding with exact rationals.

    Header: 256 × u32 little-endian symbol counts, then the minimal binary
    expansion of a point inside the final interval, sentinel-terminated.
    """
    import struct

    counts = _freq_table(data)
    cum = _cumulative(counts)
    total = cum[257]

    low, width = Fraction(0), Fraction(1)
    for s in list(data) + [256]:
        low += width * Fraction(cum[s], total)
        width *= Fraction(counts[s], total)

    # shortest dyadic rational m / 2^k inside [low, low + width):
    # the smallest k with 2^-k <= width guarantees one exists
    k = 0
    step = Fraction(1)
    while step > width:
        step /= 2
        k += 1
    m = -((-low.numerator * (1 << k)) // low.denominator)  # ceil(low * 2^k)
    bits = [(m >> (k - 1 - j)) & 1 for j in range(k)] if k else []

    header = struct.pack("<256I", *counts[:256])
    # pack bits with a trailing 1 sentinel
    bits.append(1)
    payload = bytearray()
    acc, nb = 0, 0
    for bit in bits:
        acc = (acc << 1) | bit
        nb += 1
        if nb == 8:
            payload.append(acc)
            acc, nb = 0, 0
    if nb:
        payload.append(acc << (8 - nb))
    return header + bytes(payload)


def big_decompress(data: bytes) -> bytes:
    import struct

    counts = list(struct.unpack_from("<256I", data, 0)) + [1]
    cum = _cumulative(counts)
    total = cum[257]
    payload = data[1024:]

    # value as exact fraction from the bit expansion (sentinel-terminated)
    bits = []
    for byte in payload:
        for k in range(7, -1, -1):
            bits.append((byte >> k) & 1)
    while bits and bits[-1] == 0:
        bits.pop()
    if bits:
        bits.pop()  # sentinel
    value = Fraction(0)
    half = Fraction(1, 2)
    w = half
    for bit in bits:
        if bit:
            value += w
        w /= 2

    out = bytearray()
    low, width = Fraction(0), Fraction(1)
    while True:
        scaled = (value - low) / width
        # find symbol s with cum[s]/total <= scaled < cum[s+1]/total
        lo, hi = 0, 256
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if Fraction(cum[mid], total) <= scaled:
                lo = mid
            else:
                hi = mid - 1
        s = lo
        if s == 256:
            return bytes(out)
        out.append(s)
        low += width * Fraction(cum[s], total)
        width *= Fraction(counts[s], total)


def range_of(data: bytes) -> tuple[float, float]:
    """The [bot, top) interval encoding ``data`` under its own distribution.

    Functional parity with the WASM demo's ``arithmeticEncode`` JS global
    (wasm/arithmetic/arithmetic.go:19 exposing arithmetic_logical.Range).
    """
    counts = _freq_table(data)
    cum = _cumulative(counts)
    total = cum[257]
    low, width = Fraction(0), Fraction(1)
    for s in data:
        low += width * Fraction(cum[s], total)
        width *= Fraction(counts[s], total)
    return float(low), float(low + width)
