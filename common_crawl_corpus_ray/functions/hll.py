"""HyperLogLog distinct-count sketch (Flajolet et al. 2007), vectorized
and mergeable — the cardinality companion to the KLL quantile sketch
(functions/sketch.py).

Why: exact count-distinct over a 100-TB corpus means shuffling every
distinct value (the exact path ``domain_stats`` uses — correct, and kept
as the oracle-checked operator). The HLL path replaces that shuffle with
fixed 2^p-byte register arrays that merge by elementwise max: per-block
partials are tiny and the combine is associative, so the whole reduction
is one ``groupby`` over registers, never over values.

Uses the classic 32-bit-hash formulation: register index = top ``p`` bits,
rho = leading-zero count of the remaining ``32-p`` bits + 1 (computed
vectorized via float64 log2, exact for values < 2^32). Deterministic for
a fixed input multiset — order-independent by construction (max-merge).
"""

from __future__ import annotations

import numpy as np

_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(int(np.log2(m)), 0.7213 / (1.0 + 1.079 / m))


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        """Fold a batch of 32-bit hashes (any uint dtype; masked to 32)."""
        h = np.asarray(h, dtype=np.uint64) & np.uint64(0xFFFFFFFF)
        if h.size == 0:
            return self
        idx = (h >> np.uint64(32 - self.p)).astype(np.int64)
        w = (h & np.uint64((1 << (32 - self.p)) - 1)).astype(np.int64)
        # rho = (32-p) - bit_length(w) + 1; bit_length via log2 (exact
        # for ints < 2^32 in float64); w == 0 -> rho = 32-p+1
        bl = np.zeros(w.size, dtype=np.int64)
        nz = w > 0
        bl[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
        rho = ((32 - self.p) - bl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def count(self) -> int:
        # Every arithmetic step here is chosen to be BIT-IDENTICAL to the
        # DuckDB oracle (__ray_entry__.oracle_sql approx_distinct_words):
        # the harmonic sum is exact in float64 (each 2^-M[j] term and every
        # partial sum is an integer multiple of 2^-32 with numerator
        # < 2^53), the single rounding happens at the division, math.log is
        # glibc libm — the same ln DuckDB calls — and floor(x+0.5) is
        # half-away-from-zero on both engines (Python round() is banker's).
        import math
        m = self.m
        est = _alpha(m) * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:                       # small-range correction
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * math.log(m / zeros)
        elif est > (1 << 32) / 30.0:             # large-range correction
            est = -(1 << 32) * math.log(1.0 - est / (1 << 32))
        return int(math.floor(est + 0.5))

    # --- Arrow transport ---------------------------------------------------

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HyperLogLog":
        s = cls(p)
        s.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return s


def fnv1a32_batch(words: list[bytes]) -> np.ndarray:
    """Vectorized 32-bit FNV-1a over a list of byte strings — the same
    column-wise pattern as dedup_family.simhash64_batch (Python loop is
    O(max length), not O(total bytes))."""
    n = len(words)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = np.fromiter(map(len, words), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(words), dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    h = np.full(n, 0x811C9DC5, dtype=np.uint64)
    prime = np.uint64(0x01000193)
    mask = np.uint64(0xFFFFFFFF)
    for pos in range(int(lens.max())):
        m = lens > pos
        h[m] = ((h[m] ^ buf[starts[m] + pos].astype(np.uint64)) * prime) & mask
    return h


def fnv1a64_batch(words: list[bytes]) -> np.ndarray:
    """Vectorized 64-bit FNV-1a (same column-wise pattern; uint64 wrap is
    the FNV mod-2^64). 32 bits are not enough for per-document word
    identity — an in-document collision would merge two distinct words'
    counts (ADVICE round 2)."""
    n = len(words)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = np.fromiter(map(len, words), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(words), dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    for pos in range(int(lens.max())):
        m = lens > pos
        h[m] = (h[m] ^ buf[starts[m] + pos].astype(np.uint64)) * prime
    return h
