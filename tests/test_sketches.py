"""Sketch accuracy: HyperLogLog distinct counts vs exact (DuckDB), plus
unit behavior (merge associativity, determinism)."""

import duckdb
import numpy as np
import pytest

from common_crawl_corpus_ray.functions.hll import HyperLogLog, fnv1a32_batch

SF = "/root/testdata/sf0.001"


def test_hll_accuracy_synthetic():
    rng = np.random.default_rng(0)
    true_n = 50_000
    vals = [f"item-{i}".encode() for i in rng.integers(0, true_n, 400_000)]
    exact = len(set(vals))
    est = HyperLogLog(12).add_hashes(fnv1a32_batch(vals)).count()
    assert est == pytest.approx(exact, rel=0.05)    # p=12 -> ~1.6% stderr


def test_hll_merge_equals_single_pass():
    vals = [f"x{i}".encode() for i in range(30_000)]
    whole = HyperLogLog(12).add_hashes(fnv1a32_batch(vals))
    parts = HyperLogLog(12)
    for s in range(0, len(vals), 7_000):
        chunk = HyperLogLog(12).add_hashes(fnv1a32_batch(vals[s:s + 7_000]))
        parts.merge(HyperLogLog.from_bytes(chunk.to_bytes()))
    assert (whole.registers == parts.registers).all()
    assert whole.count() == parts.count()


def test_fnv1a32_batch_parity():
    def fnv1a32(b: bytes) -> int:
        h = 0x811C9DC5
        for ch in b:
            h = ((h ^ ch) * 0x01000193) & 0xFFFFFFFF
        return h
    words = [b"hello", b"", b"a", b"longer-word-here", "日本".encode()]
    got = fnv1a32_batch(words)
    assert got.tolist() == [fnv1a32(w) for w in words]


def test_approx_distinct_words_vs_exact(ray_session):
    from common_crawl_corpus_ray.pipelines import analytics as A
    got = {r["source"]: r["n_words_approx"]
           for r in A.approx_distinct_words(SF).take_all()}
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT source, count(DISTINCT w) AS n FROM ("
        f"SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w "
        f"FROM read_parquet('{SF}/documents.parquet')) GROUP BY source"
    ).df().set_index("source")["n"].to_dict()
    assert set(got) == set(exact)
    for src in exact:
        assert got[src] == pytest.approx(exact[src], rel=0.08), src


def test_hll_sql_parity_raw_branch():
    """The sf fixtures' ~31-word vocab only ever hits the linear-counting
    branch of HyperLogLog.count, so the hash-green driver compare never
    exercises the raw harmonic estimate. This pins Python-vs-DuckDB
    BIT-IDENTITY on a 30k-distinct-word corpus (raw branch: est > 2.5m for
    p=12) by running the exact oracle CTE chain over the same words."""
    from common_crawl_corpus_ray.pipelines.analytics import (
        approx_distinct_words_sql)
    rng = np.random.default_rng(7)
    words = sorted({f"w{i}x{j}" for i, j in
                    zip(rng.integers(0, 6000, 60_000),
                        rng.integers(0, 7, 60_000))})
    py = HyperLogLog(12).add_hashes(
        fnv1a32_batch([w.encode() for w in words])).count()
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(source VARCHAR, text VARCHAR)")
    # one doc per 1000 words keeps list_reduce rows reasonable
    for s in range(0, len(words), 1000):
        con.execute("INSERT INTO documents VALUES ('s', ?)",
                    [" ".join(words[s:s + 1000])])
    sql = con.execute(approx_distinct_words_sql()).fetchone()[1]
    est_exact = HyperLogLog(12)
    est_exact.add_hashes(fnv1a32_batch([w.encode() for w in words]))
    assert est_exact.count() > 2.5 * 4096, "fixture must hit the raw branch"
    assert sql == py
