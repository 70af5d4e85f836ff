"""Per-file bloom filters for manifest-level point-read pruning.

The reference's heap supports a point read by TID — fetch exactly the one
page that holds a tuple (reference: src/heap/heap_file.cc:86-137,
``HeapFile::get_tuple``; SURVEY §2.1-4). Over immutable distributed
parquet there is no TID, but the *capability* — "touch only the storage
unit that can contain this key" — maps to per-file bloom filters carried
in the commit manifest: zone maps prune range predicates on clustered
keys; blooms prune ``=`` predicates even when every file spans the full
key range (hash-clustered or unclustered layouts, where min/max excludes
nothing). This is the same design as Delta's per-column bloom indexes and
Iceberg's puffin blobs, reduced to its minimum.

Scale: the filter is built once at commit time from the staged files'
key column (a column-pruned O(rows-in-file) pass that a production
writer folds into the write itself) and costs ~BITS_PER_KEY bits per row
in the manifest. A point lookup on a 100 TB table then schedules tasks
for the handful of files whose bloom admits the key instead of a
full-table scan wave — no false negatives ever (a bloom "no" is a proof
of absence), false positives only cost reading one extra file.

Determinism: hashing is blake2b over a canonical byte encoding, so the
same data always yields the same filter — results are reproducible
across sessions, and the oracle can pin the pruned file count.
"""

from __future__ import annotations

import base64
import hashlib
import math

BITS_PER_KEY = 32  # fpp ~ 6e-5 at k=8; manifest stays O(KB) per file
NUM_HASHES = 8


def _canon(value) -> bytes | None:
    """Canonical byte encoding of a lookup value (None = unsupported).

    Ints and strings only: equality lookups on floats are
    representation-fragile (0.1 + 0.2 != 0.3) in any engine, so we never
    claim bloom coverage for them — the zone/residual path still answers
    correctly, just without file skipping. Bools are ints in Python;
    excluded for the same reason they're excluded from zone maps.
    """
    if isinstance(value, bool) or value is None:
        return None
    if isinstance(value, int):
        return b"i" + str(value).encode()
    if isinstance(value, str):
        return b"s" + value.encode("utf-8")
    return None


def _hashes(data: bytes, m: int) -> list[int]:
    """Kirsch-Mitzenmacher double hashing: k indexes from one blake2b."""
    d = hashlib.blake2b(data, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd => full-period stride
    return [(h1 + i * h2) % m for i in range(NUM_HASHES)]


class BloomFilter:
    """Fixed-size bit-array bloom filter with deterministic hashing."""

    def __init__(self, m_bits: int, bits: bytearray | None = None) -> None:
        self.m = m_bits
        self.bits = bits if bits is not None else bytearray((m_bits + 7) // 8)

    @staticmethod
    def build(values, n_hint: int | None = None) -> "BloomFilter | None":
        """Build from an iterable of values; None if any value has an
        unsupported type (a partial bloom would create false negatives,
        which would silently drop rows — all-or-nothing is the only safe
        contract).

        BIT-IDENTICAL vectorized build (r12, guide §4): hashing stays
        per-value blake2b (the determinism contract), but the 8
        Kirsch-Mitzenmacher index derivations + bit sets per value —
        previously ~n·8 interpreted-Python mod/shift/or steps, the
        measured majority of every bloom-column commit — run as numpy
        array ops over the packed digests. Identity: (h1 + i·h2) % m ==
        ((h1%m) + i·(h2%m)) % m, and with m < 2^61 the reduced operands
        never overflow uint64, so every index (hence every bit) matches
        the scalar loop exactly (tests/test_manifest_bloom.py pins
        this)."""
        vals = list(values)
        n = n_hint if n_hint is not None else len(vals)
        m = max(64, n * BITS_PER_KEY)
        bf = BloomFilter(m)
        digests = []
        for v in vals:
            if v is None:
                continue  # NULL never matches an equality predicate
            data = _canon(v)
            if data is None:
                return None
            digests.append(hashlib.blake2b(data, digest_size=16).digest())
        if not digests:
            return bf
        import numpy as np

        d = np.frombuffer(b"".join(digests), dtype=">u8").reshape(-1, 2)
        h1 = d[:, 0] % np.uint64(m)
        h2 = (d[:, 1] | np.uint64(1)) % np.uint64(m)
        bits = np.zeros(len(bf.bits), dtype=np.uint8)
        for i in range(NUM_HASHES):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
            np.bitwise_or.at(
                bits,
                (idx >> np.uint64(3)).astype(np.int64),
                np.left_shift(
                    np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)
                ),
            )
        bf.bits = bytearray(bits.tobytes())
        return bf

    def might_contain(self, value) -> bool:
        """False is a PROOF the value was never added; True is "maybe"."""
        data = _canon(value)
        if data is None:
            return True  # unsupported type: cannot exclude
        return all(
            self.bits[idx >> 3] & (1 << (idx & 7)) for idx in _hashes(data, self.m)
        )

    # ------------------------------------------------------ serialization
    def to_b64(self) -> str:
        return f"{self.m}:" + base64.b64encode(bytes(self.bits)).decode()

    @staticmethod
    def from_b64(s: str) -> "BloomFilter":
        m_str, payload = s.split(":", 1)
        return BloomFilter(int(m_str), bytearray(base64.b64decode(payload)))

    # --------------------------------------------------------------- info
    @property
    def fill_ratio(self) -> float:
        ones = sum(bin(b).count("1") for b in self.bits)
        return ones / self.m

    def expected_fpp(self) -> float:
        """Actual false-positive probability from the observed fill."""
        return self.fill_ratio ** NUM_HASHES if self.m else 1.0

    def __repr__(self) -> str:  # pragma: no cover
        return f"BloomFilter(m={self.m}, fill={self.fill_ratio:.4f})"


def harvest_blooms(files: list[str], columns: list[str]) -> dict:
    """path -> {column -> b64 bloom} from the staged files themselves.

    A column-pruned parquet read per (file, column) — O(rows) in the new
    file only, the same work a production writer does inline while the
    row batch is still in memory. Columns with unsupported value types
    simply get no bloom (pruning degrades to zone maps, never to wrong
    answers).
    """
    from urllib.parse import urlparse

    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for path in files:
        local = urlparse(path).path or path
        try:
            table = pq.read_table(local, columns=[c for c in columns])
        except Exception:
            continue  # unreadable / column absent: no bloom, no pruning
        entry = {}
        for col in columns:
            if col not in table.column_names:
                continue
            bf = BloomFilter.build(table.column(col).to_pylist())
            if bf is not None:
                entry[col] = bf.to_b64()
        if entry:
            out[path] = entry
    return out
