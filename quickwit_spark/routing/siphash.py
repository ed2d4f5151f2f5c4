"""SipHash-2-4 with key (0, 0) — the hash behind Quickwit partition routing.

Reference behavior: quickwit-doc-mapper/src/routing_expression/mod.rs uses
``siphasher::sip::SipHasher`` (SipHash-2-4, zero key) over a byte stream; we
replicate the byte stream elsewhere (expression.py) and the hash here.

Two implementations:

- :func:`siphash24` — scalar pure-Python, the readable reference.
- :func:`siphash24_batch` — numpy-vectorized over a batch of messages,
  grouping rows by word-count so every SipRound is a fused array op. This is
  what the pandas UDF on the routing hot path calls: ~50-100x faster than the
  scalar loop, no per-row Python in the compression rounds.

Both are validated against the reference's change-detection vectors
(routing_expression/mod.rs:684-697) in tests/test_routing.py.
"""

from __future__ import annotations

import numpy as np

_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, b: int) -> int:
    return ((x << b) | (x >> (64 - b))) & _MASK


def _sipround(v0: int, v1: int, v2: int, v3: int):
    v0 = (v0 + v1) & _MASK
    v1 = _rotl(v1, 13)
    v1 ^= v0
    v0 = _rotl(v0, 32)
    v2 = (v2 + v3) & _MASK
    v3 = _rotl(v3, 16)
    v3 ^= v2
    v0 = (v0 + v3) & _MASK
    v3 = _rotl(v3, 21)
    v3 ^= v0
    v2 = (v2 + v1) & _MASK
    v1 = _rotl(v1, 17)
    v1 ^= v2
    v2 = _rotl(v2, 32)
    return v0, v1, v2, v3


def siphash24(data: bytes, k0: int = 0, k1: int = 0) -> int:
    """Scalar SipHash-2-4 of ``data`` with 128-bit key ``(k0, k1)``."""
    v0 = k0 ^ 0x736F6D6570736575
    v1 = k1 ^ 0x646F72616E646F6D
    v2 = k0 ^ 0x6C7967656E657261
    v3 = k1 ^ 0x7465646279746573

    n_full = len(data) // 8
    for i in range(n_full):
        m = int.from_bytes(data[8 * i : 8 * i + 8], "little")
        v3 ^= m
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
        v0 ^= m

    # last (partial) word carries the length in the top byte
    tail = data[8 * n_full :]
    b = (len(data) & 0xFF) << 56
    b |= int.from_bytes(tail + b"\x00" * (8 - len(tail)), "little")
    v3 ^= b
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    v0 ^= b

    v2 ^= 0xFF
    for _ in range(4):
        v0, v1, v2, v3 = _sipround(v0, v1, v2, v3)
    return (v0 ^ v1 ^ v2 ^ v3) & _MASK


# ---------------------------------------------------------------------------
# Vectorized batch implementation
# ---------------------------------------------------------------------------

_U64 = np.uint64


def _sipround_vec(v0, v1, v2, v3):
    # all args are uint64 ndarrays; numpy uint64 arithmetic wraps mod 2^64
    v0 = v0 + v1
    v1 = (v1 << _U64(13)) | (v1 >> _U64(51))
    v1 ^= v0
    v0 = (v0 << _U64(32)) | (v0 >> _U64(32))
    v2 = v2 + v3
    v3 = (v3 << _U64(16)) | (v3 >> _U64(48))
    v3 ^= v2
    v0 = v0 + v3
    v3 = (v3 << _U64(21)) | (v3 >> _U64(43))
    v3 ^= v0
    v2 = v2 + v1
    v1 = (v1 << _U64(17)) | (v1 >> _U64(47))
    v1 ^= v2
    v2 = (v2 << _U64(32)) | (v2 >> _U64(32))
    return v0, v1, v2, v3


def _words_matrix(msgs: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack messages into a (n, max_words) little-endian u64 word matrix.

    The final word of each row already includes the SipHash length byte, so
    the compression loop needs no per-row special case. Returns
    ``(words, n_words)``.
    """
    n = len(msgs)
    lens = np.fromiter((len(m) for m in msgs), dtype=np.int64, count=n)
    n_words = lens // 8 + 1  # always one final (possibly empty) tail word
    max_words = int(n_words.max()) if n else 0
    buf = np.zeros((n, max_words * 8), dtype=np.uint8)
    if n and lens.max() > 0:
        flat = np.frombuffer(b"".join(msgs), dtype=np.uint8)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        row_idx = np.repeat(np.arange(n), lens)
        col_idx = np.arange(lens.sum()) - np.repeat(starts, lens)
        buf[row_idx, col_idx] = flat
    words = buf.view("<u8").reshape(n, max_words)
    # inject the length byte into the top byte of each row's last word
    last = n_words - 1
    words[np.arange(n), last] |= (lens.astype(np.uint64) & _U64(0xFF)) << _U64(56)
    return words.astype(np.uint64, copy=False), n_words


def siphash24_batch(msgs: list[bytes], k0: int = 0, k1: int = 0) -> np.ndarray:
    """Vectorized SipHash-2-4 over a list of byte strings → uint64 ndarray.

    Rows are bucketed by word-count; within a bucket every round is a pure
    ndarray op over the whole bucket (no per-row Python beyond byte packing).
    """
    if len(msgs) == 0:
        return np.zeros(0, dtype=np.uint64)
    words, n_words = _words_matrix(msgs)
    return siphash24_words(words, n_words, k0, k1)


def siphash24_words(
    words: np.ndarray, n_words: np.ndarray, k0: int = 0, k1: int = 0
) -> np.ndarray:
    """SipHash-2-4 over a pre-packed LE u64 word matrix (each row's final
    word already carries the length byte — see ``_words_matrix``)."""
    n = len(words)
    out = np.zeros(n, dtype=np.uint64)
    for wc in np.unique(n_words):
        sel = np.nonzero(n_words == wc)[0]
        w = words[sel]
        v0 = np.full(len(sel), k0 ^ 0x736F6D6570736575, dtype=np.uint64)
        v1 = np.full(len(sel), k1 ^ 0x646F72616E646F6D, dtype=np.uint64)
        v2 = np.full(len(sel), k0 ^ 0x6C7967656E657261, dtype=np.uint64)
        v3 = np.full(len(sel), k1 ^ 0x7465646279746573, dtype=np.uint64)
        for j in range(int(wc)):
            m = w[:, j]
            v3 = v3 ^ m
            v0, v1, v2, v3 = _sipround_vec(v0, v1, v2, v3)
            v0, v1, v2, v3 = _sipround_vec(v0, v1, v2, v3)
            v0 = v0 ^ m
        v2 = v2 ^ _U64(0xFF)
        for _ in range(4):
            v0, v1, v2, v3 = _sipround_vec(v0, v1, v2, v3)
        out[sel] = v0 ^ v1 ^ v2 ^ v3
    return out
