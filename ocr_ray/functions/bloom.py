"""Bloom filter for broadcast semi/anti joins at corpus scale.

The exact path broadcasts the distinct key SET (fine up to ~10^8 keys);
beyond that a Bloom filter keeps the broadcast payload a few hundred MB for
10^10 keys at ~1% false positives.  Semi joins tolerate false positives
(extra candidate rows get dropped by the later exact check or are
acceptable over-selection); false negatives never occur.

Deterministic: hash seeds are fixed; the filter bytes are a pure function
of the inserted key set.
"""

from __future__ import annotations

import zlib

import numpy as np

_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F)


class BloomFilter:
    def __init__(self, n_bits: int, n_hashes: int = 4) -> None:
        assert n_hashes <= len(_SEEDS)
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def for_capacity(cls, n_keys: int, fp_rate: float = 0.01) -> "BloomFilter":
        """Size for a target false-positive rate (standard formula)."""
        n_bits = max(64, int(-n_keys * np.log(fp_rate) / (np.log(2) ** 2)))
        k = max(1, min(4, round(n_bits / max(1, n_keys) * np.log(2))))
        return cls(n_bits, k)

    def _positions(self, key: bytes) -> list[int]:
        return [zlib.crc32(key, seed) % self.n_bits
                for seed in _SEEDS[: self.n_hashes]]

    def add(self, key: bytes) -> None:
        for p in self._positions(key):
            self.bits[p >> 3] |= 1 << (p & 7)

    def __contains__(self, key: bytes) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(key))

    def add_many(self, keys) -> None:
        for k in keys:
            self.add(k)

    # -- vectorized integer-key path (the hot path for join keys) ---------
    #
    # Per-seed position = splitmix64(key ^ seed) % n_bits, all in numpy
    # uint64 arithmetic — no per-row Python.  This is a DIFFERENT hash
    # family from the bytes path above (crc32); a filter must be built and
    # probed through the same family.

    def _positions_u64(self, keys: np.ndarray) -> np.ndarray:
        """(n_hashes, len(keys)) bit positions for uint64/int64 keys."""
        k = keys.astype(np.uint64, copy=False)
        out = np.empty((self.n_hashes, len(k)), dtype=np.uint64)
        for i, seed in enumerate(_SEEDS[: self.n_hashes]):
            x = k ^ np.uint64(seed)
            x = x + np.uint64(0x9E3779B97F4A7C15)
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
            out[i] = x % np.uint64(self.n_bits)
        return out

    def add_many_u64(self, keys: np.ndarray) -> None:
        pos = self._positions_u64(np.asarray(keys)).ravel()
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))

    def contains_many_u64(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership test; boolean array (may have false
        positives, never false negatives vs add_many_u64)."""
        pos = self._positions_u64(np.asarray(keys))
        hit = np.ones(pos.shape[1], dtype=bool)
        for i in range(pos.shape[0]):
            p = pos[i]
            byte = self.bits[(p >> np.uint64(3)).astype(np.int64)]
            hit &= (byte & (np.uint8(1) << (p & np.uint64(7)).astype(np.uint8))) != 0
        return hit

    def union_inplace(self, other_bits: np.ndarray) -> None:
        """OR another filter's byte array in (for distributed build:
        per-batch partial filters fold into one on the driver)."""
        np.bitwise_or(self.bits, other_bits, out=self.bits)
