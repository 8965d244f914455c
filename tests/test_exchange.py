"""Unit tests for the manual bucket exchange (stages/exchange.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from common_crawl_corpus_ray.stages.exchange import bucket_exchange


def _make_sum_reduce():
    # a closure, not a module-level function: test modules aren't importable
    # in Ray workers, so the reduce fn must pickle by value
    def _sum_reduce(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("v", "sum")])
        return g.rename_columns(["k", "total"])
    return _sum_reduce


_sum_reduce = _make_sum_reduce()


def _mk(ray_session, rows, nblocks=4):
    import ray.data as rd
    ds = rd.from_arrow(pa.table(rows))
    return ds.repartition(nblocks)


def test_exchange_matches_global_groupby(ray_session):
    rng = np.random.default_rng(7)
    k = rng.integers(0, 100, size=5000)
    v = rng.integers(0, 10, size=5000)
    ds = _mk(ray_session, {"k": k, "v": v, "bucket": (k % 8).astype(np.int32)})
    outs = bucket_exchange(ds, 8, _sum_reduce)
    got = pa.concat_tables(outs).to_pandas().sort_values("k").reset_index(drop=True)
    import pandas as pd
    want = (pd.DataFrame({"k": k, "v": v}).groupby("k", as_index=False)["v"]
            .sum().rename(columns={"v": "total"}))
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert (got["total"].to_numpy() == want["total"].to_numpy()).all()


def test_exchange_single_bucket(ray_session):
    ds = _mk(ray_session, {"k": [1, 1, 2], "v": [10, 20, 30],
                           "bucket": pa.array([0, 0, 0], pa.int32())}, nblocks=2)
    outs = bucket_exchange(ds, 1, _sum_reduce)
    got = pa.concat_tables(outs).to_pandas().sort_values("k")
    assert got["total"].tolist() == [30, 30]


def test_exchange_empty_dataset(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.int64()),
                                 "bucket": pa.array([], pa.int32())}))
    outs = bucket_exchange(ds, 4, _sum_reduce)
    assert sum(t.num_rows for t in outs) == 0


def test_exchange_tolerates_bucketless_empty_blocks(ray_session):
    """Empty blocks that skipped the upstream UDF keep the raw schema
    (no bucket column); the exchange must ignore them."""
    import ray.data as rd
    full = pa.table({"k": [1, 2], "v": [5, 6],
                     "bucket": pa.array([0, 1], pa.int32())})
    raw_empty = pa.table({"other": pa.array([], pa.string())})
    ds = rd.from_arrow([full, raw_empty])
    outs = bucket_exchange(ds, 2, _sum_reduce)
    got = pa.concat_tables(outs).to_pandas().sort_values("k")
    assert got["total"].tolist() == [5, 6]


def test_pair_buckets_scaling():
    """Pair-exchange bucket counts scale with the row-count hint: tiny
    inputs don't pay 64-task fixed costs, huge ones don't get O(N/64)
    reduces; always a power of two, clamped to [4, 1024]."""
    from common_crawl_corpus_ray.stages.dedup_family import _pair_buckets

    assert _pair_buckets(None) == 64          # no hint -> legacy constant
    assert _pair_buckets(0) == 64
    assert _pair_buckets(1_000) == 4          # lo clamp: tiny stays cheap
    assert _pair_buckets(5_050) == 16         # real work widens quickly
    assert _pair_buckets(16_384) == 32
    assert _pair_buckets(10**8) == 1024       # hi clamp
    for n in (1, 999, 5_000_000, 7_777_777):
        nb = _pair_buckets(n)
        assert nb & (nb - 1) == 0 and 4 <= nb <= 1024
