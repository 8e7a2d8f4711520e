"""Host-side (NumPy) bit/byte packing primitives for the `.rsn` formats.

Two padding disciplines exist in the reference wire formats:

- *prepad-sentinel* (arithmetic codec, reference compressor/arithmetic/bits.go:48):
  ``pad = 8 - len(bits) % 8`` bits are PREPENDED — ``pad-1`` zeros followed by a
  single 1 sentinel (8 pad bits when already byte-aligned). Unpacking strips
  everything through the first 1 bit (bits.go:63).
- *count-byte* (huffman codec, reference compressor/huffman/huffman.go:245):
  a leading byte holds the number of pad bits; the payload is packed MSB-first
  with that many zero bits prepended. (Implemented in formats/huffman_ref.)

Bytes are always MSB-first (bits.go:76).
"""

from __future__ import annotations

import numpy as np


def bits_to_bytes_msb(bits: np.ndarray) -> bytes:
    """Pack a 0/1 uint8 array (length divisible by 8) into bytes, MSB-first."""
    bits = np.asarray(bits, dtype=np.uint8)
    if bits.size % 8 != 0:
        raise ValueError("bit count not divisible by 8; pack first")
    return np.packbits(bits).tobytes()


def bytes_to_bits_msb(data: bytes) -> np.ndarray:
    """Unpack bytes into a 0/1 uint8 array, MSB-first."""
    return np.unpackbits(np.frombuffer(data, dtype=np.uint8))


def pack_prepad_sentinel(bits: np.ndarray) -> bytes:
    """Prepend ``0…01`` padding to byte-align, then pack MSB-first.

    Reference: compressor/arithmetic/bits.go:48 (Pack) — pad length is
    ``8 - len % 8`` (i.e. 8 full pad bits when already aligned).
    """
    bits = np.asarray(bits, dtype=np.uint8)
    pad = 8 - (bits.size % 8)
    padding = np.zeros(pad, dtype=np.uint8)
    padding[-1] = 1
    return bits_to_bytes_msb(np.concatenate([padding, bits]))


def unpack_prepad_sentinel(data: bytes) -> np.ndarray:
    """Strip the leading ``0…01`` pad and return the payload bits.

    Reference: compressor/arithmetic/bits.go:63 (Unpack) — scans through the
    first 1 bit; raises if no 1 bit exists at all.
    """
    bits = bytes_to_bits_msb(data)
    ones = np.flatnonzero(bits)
    if ones.size == 0:
        raise ValueError("couldn't unpack: no sentinel bit found")
    return bits[ones[0] + 1 :]
