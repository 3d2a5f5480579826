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
