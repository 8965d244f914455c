"""Independent (non-SQL) references for the round-5 planning ops: the
speed-perturb manifest's integer fan-out rule and the value-count
percentile's rank rule, checked against single-node numpy/pandas
spellings of the same rules plus run-to-run determinism. The DuckDB
oracles in test_queries_vs_duckdb.py are the primary gate; these pin the
rules against a second, SQL-free derivation so an oracle bug can't hide
a matching engine bug."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from common_crawl_corpus_ray.functions.hashing import md5_i64
from common_crawl_corpus_ray.pipelines import clips_queries as C

SF_DIR = "/root/testdata/sf0.001"


def _fixture_df() -> pd.DataFrame:
    uri = C.ensure_clips(SF_DIR, with_audio=False)
    return pq.read_table(uri, columns=["clip_id", "dur_ms"]).to_pandas()


def test_augment_plan_matches_single_node_rule(ray_session):
    got = (C.audio_augment_plan(SF_DIR).to_pandas()
           .sort_values(["clip_id", "aug"]).reset_index(drop=True))
    src = _fixture_df()
    rows = []
    for name, num, den in C.AUG_FACTORS:
        rows.append(pd.DataFrame({
            "clip_id": src["clip_id"],
            "aug": name,
            "aug_dur_ms": src["dur_ms"].astype(np.int64) * num // den,
            "shard": [md5_i64(f"{c}|{name}") % C.AUG_SHARDS
                      for c in src["clip_id"]],
        }))
    want = (pd.concat(rows).sort_values(["clip_id", "aug"])
            .reset_index(drop=True).astype({"aug_dur_ms": "int64",
                                            "shard": "int64"}))
    assert len(got) == 3 * len(src)
    assert got["shard"].between(0, C.AUG_SHARDS - 1).all()
    pd.testing.assert_frame_equal(got, want)


def test_augment_plan_deterministic(ray_session):
    a = (C.audio_augment_plan(SF_DIR).to_pandas()
         .sort_values(["clip_id", "aug"]).reset_index(drop=True))
    b = (C.audio_augment_plan(SF_DIR).to_pandas()
         .sort_values(["clip_id", "aug"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_global_percentiles_matches_sorted_rank_rule(ray_session):
    got = (C.global_percentiles(SF_DIR).to_pandas()
           .sort_values("pct").reset_index(drop=True))
    dur = np.sort(_fixture_df()["dur_ms"].to_numpy().astype(np.int64))
    n = len(dur)
    want = pd.DataFrame({
        "pct": list(C.PCTS),
        # smallest value whose cumulative count reaches ceil(p*n/100):
        # with a fully sorted array that is simply the element at
        # rank-1 (0-indexed), since cumcount at index i is i+1.
        "dur_ms": [int(dur[(p * n + 99) // 100 - 1]) for p in C.PCTS],
    }).astype({"pct": "int64", "dur_ms": "int64"})
    pd.testing.assert_frame_equal(got, want)


def test_percentile_rank_rule_edge_cases():
    """The ceil-rank rule on tiny hand-checked domains: p99 of n=2 is the
    max (rank ceil(1.98)=2), p50 of n=1 is the only value, and a
    100-element 0..99 ramp gives p50=49, p90=89, p99=98 (1-indexed ranks
    50/90/99)."""
    for vals, p, expect in [
        ([7, 3], 99, 7),
        ([5], 50, 5),
        (list(range(100)), 50, 49),
        (list(range(100)), 90, 89),
        (list(range(100)), 99, 98),
    ]:
        dur = np.sort(np.asarray(vals, np.int64))
        n = len(dur)
        assert int(dur[(p * n + 99) // 100 - 1]) == expect, (vals, p)
