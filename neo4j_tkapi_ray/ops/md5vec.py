"""Row-vectorized MD5 over an Arrow string/binary column.

The random-walk tie-break (ops/graph.random_walks) is ``argmin md5(key)``
with the hex digest compared as ASCII — the one hash DuckDB can also
compute, which keeps the walk oracle a fully independent derivational SQL
statement (``_random_walks_sql``). hashlib.md5 per row was the engine's
last corpus-proportional Python loop (VERDICT r4 item 3); this module runs
the MD5 compression function itself as numpy uint32 lane math, one lane per
ROW, so a million keys cost 64 rounds of whole-column ops instead of a
million interpreter round-trips.

Layout trick: messages are grouped by padded block count (almost always one
group — keys are short), scattered into an (n, padded_len) byte matrix with
a single fancy-index assignment, then viewed as little-endian uint32 words.
Ordering: the hex digest's ASCII order IS the digest's byte order, so the
16 digest bytes are returned as two BIG-endian uint64 keys — compare
``(k1, k2)`` unsigned and you compare ``md5(x)`` hexdigests.
"""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

__all__ = ["md5_order_keys"]

_K = np.array([int(abs(math.sin(i + 1.0)) * 2**32) & 0xFFFFFFFF
               for i in range(64)], dtype=np.uint32)
_S = np.array([7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
              + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4, dtype=np.uint32)
_G = np.array([i for i in range(16)]
              + [(5 * i + 1) % 16 for i in range(16, 32)]
              + [(3 * i + 5) % 16 for i in range(32, 48)]
              + [(7 * i) % 16 for i in range(48, 64)], dtype=np.int64)
_INIT = (np.uint32(0x67452301), np.uint32(0xEFCDAB89),
         np.uint32(0x98BADCFE), np.uint32(0x10325476))


def _rotl(x: np.ndarray, s: int) -> np.ndarray:
    return (x << np.uint32(s)) | (x >> np.uint32(32 - s))


def _bswap32(x: np.ndarray) -> np.ndarray:
    return x.byteswap()


def _md5_lanes(words: np.ndarray, nblocks: int):
    """words: (n, nblocks*16) little-endian uint32. Returns 4 uint32 state
    vectors (a, b, c, d) after digesting every lane's message."""
    a = np.full(words.shape[0], _INIT[0], np.uint32)
    b = np.full(words.shape[0], _INIT[1], np.uint32)
    c = np.full(words.shape[0], _INIT[2], np.uint32)
    d = np.full(words.shape[0], _INIT[3], np.uint32)
    for blk in range(nblocks):
        m = words[:, blk * 16:(blk + 1) * 16]
        A, B, C, D = a.copy(), b.copy(), c.copy(), d.copy()
        for i in range(64):
            if i < 16:
                f = (B & C) | (~B & D)
            elif i < 32:
                f = (D & B) | (~D & C)
            elif i < 48:
                f = B ^ C ^ D
            else:
                f = C ^ (B | ~D)
            f = f + A + _K[i] + m[:, _G[i]]
            A, D, C = D, C, B
            B = C + _rotl(f, int(_S[i]))  # C here is the pre-rotation B
        a += A
        b += B
        c += C
        d += D
    return a, b, c, d


def md5_order_keys(col) -> tuple[np.ndarray, np.ndarray]:
    """Two big-endian uint64 keys per row whose unsigned tuple order equals
    the ASCII order of ``hashlib.md5(row).hexdigest()``. Accepts a pyarrow
    string/binary Array or ChunkedArray (nulls not supported)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.cast(pa.large_binary())
    n = len(col)
    if n == 0:
        e = np.array([], dtype=np.uint64)
        return e, e
    offs = np.frombuffer(col.buffers()[1], dtype=np.int64,
                         count=n + 1, offset=8 * col.offset)
    data = np.frombuffer(col.buffers()[2] or b"", dtype=np.uint8)
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    # padded length per row: msg + 0x80 + zeros + 8-byte bit length,
    # rounded up to 64
    plens = ((lens + 8) // 64 + 1) * 64
    k1 = np.empty(n, dtype=np.uint64)
    k2 = np.empty(n, dtype=np.uint64)
    for plen in np.unique(plens):
        plen = int(plen)
        idx = np.nonzero(plens == plen)[0]
        gl = lens[idx]
        total = int(gl.sum())
        flat = np.zeros(len(idx) * plen, dtype=np.uint8)
        rowstart = np.arange(len(idx), dtype=np.int64) * plen
        if total:
            # scatter every message's bytes into its lane in one assignment
            src = _src_positions(offs, idx, gl, total)
            dest = np.repeat(rowstart - offs[idx], gl) + src
            flat[dest] = data[src]
        flat[rowstart + gl] = 0x80
        # little-endian 64-bit bit count in the last 8 bytes of each lane
        lanes = flat.reshape(len(idx), plen)
        lanes[:, plen - 8:] = (gl.astype("<u8") * 8).view(np.uint8) \
            .reshape(len(idx), 8)
        words = np.ascontiguousarray(lanes).view("<u4")
        a, b, c, d = _md5_lanes(words, plen // 64)
        k1[idx] = (_bswap32(a).astype(np.uint64) << np.uint64(32)) \
            | _bswap32(b).astype(np.uint64)
        k2[idx] = (_bswap32(c).astype(np.uint64) << np.uint64(32)) \
            | _bswap32(d).astype(np.uint64)
    return k1, k2


def _src_positions(offs: np.ndarray, idx: np.ndarray, gl: np.ndarray,
                   total: int) -> np.ndarray:
    """Flat data-buffer positions of every byte of the selected rows:
    concatenate(arange(offs[i], offs[i+1]) for i in idx) without a Python
    loop — cumulative-arange over the group's lengths."""
    starts = offs[idx]
    ends = np.cumsum(gl)
    begins = ends - gl
    return np.arange(total, dtype=np.int64) - np.repeat(begins, gl) \
        + np.repeat(starts, gl)
