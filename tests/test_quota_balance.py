"""quota_balance edge cases: the distributed exact-prefix-sum cut must be
a pure function of content — bucket classification (keep-all / drop-all /
boundary) composed with the in-boundary-bucket cumsum has to reproduce the
single-node rule exactly at every budget, including the degenerate ones."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from common_crawl_corpus_ray.functions.hashing import md5_i64
from common_crawl_corpus_ray.pipelines.analytics import quota_balance


def _reference_cut(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    """Single-node spelling of the rule: per group, order by (h, id),
    keep while the running total BEFORE the row is < budget."""
    df = df.assign(h=[md5_i64(str(i)) for i in df["id"]])
    out = []
    for _, g in df.groupby("grp", sort=True):
        g = g.sort_values(["h", "id"], kind="stable")
        cum_before = g["w"].cumsum() - g["w"]
        out.append(g.loc[cum_before < budget, ["id", "grp", "w"]])
    return (pd.concat(out).sort_values("id").reset_index(drop=True)
            if out else df[["id", "grp", "w"]].iloc[:0])


def _run(tbl: pa.Table, budget: int, tmpdir) -> pd.DataFrame:
    import ray.data as rd
    path = str(tmpdir / f"quota_{budget}.parquet")
    pq.write_table(tbl, path)
    ds = quota_balance(lambda: rd.read_parquet(path),
                       "id", "grp", "w", budget, id_is_int=True)
    df = ds.to_pandas()
    if df.empty:   # zero-row union: Ray yields a schemaless empty frame
        df = pd.DataFrame({"id": [], "grp": [], "w": []})
    return (df.sort_values("id").reset_index(drop=True)
            .astype({"id": "int64", "w": "int64", "grp": "str"}))


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(7)
    n = 2000
    return pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "grp": pa.array(["g%d" % (i % 3) for i in range(n)], pa.string()),
        "w": pa.array(rng.integers(0, 50, n), pa.int64()),  # zeros included
    })


@pytest.mark.parametrize("budget", [0, 1, 37, 5_000, 10**9])
def test_quota_matches_reference_rule(ray_session, tmp_path, table, budget):
    got = _run(table, budget, tmp_path)
    want = (_reference_cut(table.to_pandas().rename(columns=str), budget)
            .astype({"id": "int64", "w": "int64"}))
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_quota_membership_is_partitioning_independent(ray_session, tmp_path,
                                                      table):
    """Same rows, different block layout -> identical membership (the
    property that makes the cut safe to run on any cluster size)."""
    import ray.data as rd
    path = str(tmp_path / "quota_shuffled.parquet")
    pq.write_table(table.take(np.random.default_rng(3).permutation(
        table.num_rows)), path)
    a = _run(table, 1234, tmp_path)
    ds = quota_balance(
        lambda: rd.read_parquet(path).repartition(17),
        "id", "grp", "w", 1234, id_is_int=True)
    b = (ds.to_pandas().sort_values("id").reset_index(drop=True)
         .astype({"id": "int64", "w": "int64"}))
    pd.testing.assert_frame_equal(a, b)
