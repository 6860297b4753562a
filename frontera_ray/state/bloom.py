"""Bloom filter over uint64 keys — the per-partition fallback membership
structure (north rule: "bloom fallback per partition").

Used when a seen-shard's cuckoo filter saturates (load > ~95%): the shard
freezes the cuckoo filter and routes new inserts to a bloom filter sized for
the remaining capacity. Vectorized numpy bit ops; byte-stable dump/restore.

k hash functions derived from one 64-bit key by multiply-shift (Dietzfelbinger
et al.) — h_i(x) = (x * odd_i) >> (64 - log2(m)).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"BLM1"
_MULTS = np.array(
    [
        0x9E3779B97F4A7C15,
        0xC2B2AE3D27D4EB4F,
        0x165667B19E3779F9,
        0x27D4EB2F165667C5,
        0x85EBCA77C2B2AE63,
        0xFF51AFD7ED558CCD,
        0xC4CEB9FE1A85EC53,
    ],
    dtype=np.uint64,
)


class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 1e-4):
        k = max(1, min(7, int(round(-np.log2(fp_rate)))))
        m_bits = max(64, int(capacity * 1.44 * -np.log2(fp_rate)))
        log2m = max(6, int(np.ceil(np.log2(m_bits))))
        self.log2m = log2m
        self.m = 1 << log2m
        self.k = k
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)
        self.count = 0

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(n, k) bit positions."""
        keys = keys.astype(np.uint64, copy=False)
        shift = np.uint64(64 - self.log2m)
        return np.stack(
            [((keys * _MULTS[i]) >> shift) for i in range(self.k)], axis=1
        )

    def add_batch(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.bits, word, bit)
        self.count += len(keys)

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        return ((self.bits[word] & bit) != 0).all(axis=1)

    def dump(self) -> bytes:
        header = struct.pack("<4sQQQ", _MAGIC, self.log2m, self.k, self.count)
        return header + self.bits.tobytes()

    @classmethod
    def restore(cls, data: bytes) -> "BloomFilter":
        magic, log2m, k, count = struct.unpack_from("<4sQQQ", data, 0)
        assert magic == _MAGIC
        obj = cls.__new__(cls)
        obj.log2m = log2m
        obj.m = 1 << log2m
        obj.k = k
        obj.count = count
        off = struct.calcsize("<4sQQQ")
        obj.bits = np.frombuffer(data, dtype=np.uint64, count=obj.m // 64, offset=off).copy()
        return obj
