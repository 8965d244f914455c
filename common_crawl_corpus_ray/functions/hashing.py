"""Stable content hashing.

The reference's builtin ``hash()`` at cc_corpus.py:286 is salted per process
(PYTHONHASHSEED) and therefore broken for cross-worker dedup; its own
deduplication.py:88-94 uses SHA1-first-8-bytes instead. We provide both a
SHA1 variant (reference parity) and an MD5 variant. The MD5 one is what the
pipeline uses for ``text_hash`` because it is also expressible in DuckDB
(``CAST('0x' || SUBSTRING(md5(t), 1, 16) AS UBIGINT)``), which lets the SQL
oracle check dedup end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def md5_i64(text: str) -> int:
    """First 15 hex chars (60 bits) of MD5(utf-8 text) as a non-negative
    int64. 60 bits keeps the value inside int64 range: uint64 values above
    2^63 make Ray Data's shuffle fall back to pickled-object columns (Arrow
    conversion OverflowError), which silently de-vectorizes the dedup path.
    """
    return int(hashlib.md5(text.encode("utf-8")).hexdigest()[:15], 16)


def sha1_u64(text: str) -> int:
    """First 8 bytes of SHA1(utf-8 text) — parity with deduplication.py:92-94."""
    return int.from_bytes(hashlib.sha1(text.encode("utf-8")).digest()[:8], "big")


SQL_MD5_I64 = "CAST(CONCAT('0x', SUBSTRING(md5({col}), 1, 15)) AS BIGINT)"


def sql_md5_i64(col: str) -> str:
    """DuckDB expression computing the same int64 as :func:`md5_i64`."""
    return SQL_MD5_I64.format(col=col)


def md5_i64_array(texts) -> pa.Array:
    """Vectorized-enough md5->int64 over an Arrow/py sequence of strings.

    hashlib's C core dominates; the Python loop is ~1 microsecond/row, which
    is far below the regex scrub cost per row in the same stage.
    """
    md5 = hashlib.md5
    out = np.fromiter(
        (int(md5(t.encode("utf-8")).hexdigest()[:15], 16) for t in
         (texts.to_pylist() if isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts)),
        dtype=np.int64,
        count=len(texts),
    )
    return pa.array(out, type=pa.int64())


def fnv1a_u32(data: bytes) -> int:
    """32-bit FNV-1a — used for feature hashing and salted partitioning."""
    h = 0x811C9DC5
    for b in data:
        h ^= b
        h = (h * 0x01000193) & 0xFFFFFFFF
    return h


def salted_partition(clip_ids, num_partitions: int, salt: str = "s0") -> np.ndarray:
    """Deterministic salted partition ids for a batch of clip_ids.

    Breaks codec/duration skew: partition = fnv1a(clip_id + salt) % P
    (SURVEY.md section 4.1 'Skew').
    """
    ids = clip_ids.to_pylist() if isinstance(clip_ids, (pa.Array, pa.ChunkedArray)) else clip_ids
    out = np.fromiter(
        (fnv1a_u32((c + salt).encode("utf-8")) % num_partitions for c in ids),
        dtype=np.int32, count=len(ids),
    )
    return out
