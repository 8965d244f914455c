"""Edge-case tests for the round-5 graph/interval/SCD2 ops over handwritten
tables — structures the sf fixtures never guarantee (a known-K4 clique with
exact triangle counts, touching/contained/duplicate intervals, every SCD2
row class), each checked against the same DuckDB oracle SQL so the two
engines' edge behavior is pinned together, not separately."""

import itertools

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from common_crawl_corpus_ray.pipelines import analytics as A
from common_crawl_corpus_ray.pipelines.analytics import _pairs_within_runs


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _oracle(d, table, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{d}/{table}.parquet')")
    return con.execute(sql).fetchdf()


def test_pairs_within_runs_matches_itertools():
    rng = np.random.default_rng(7)
    counts = rng.integers(1, 9, size=40).astype(np.int64)
    li, ri = _pairs_within_runs(counts)
    want = []
    off = 0
    for c in counts:
        want.extend(itertools.combinations(range(off, off + int(c)), 2))
        off += int(c)
    got = list(zip(li.tolist(), ri.tolist()))
    assert got == want          # order AND content: every i<j pair per run


def test_pairs_within_runs_empty_and_singletons():
    for counts in ([1, 1, 1], [], [0], [0, 0]):
        li, ri = _pairs_within_runs(np.array(counts, np.int64))
        assert len(li) == 0 and len(ri) == 0


@pytest.fixture(scope="module")
def k4_dir(tmp_path_factory):
    """lineitem whose orders form a K4 clique on parts 10,20,30,40: every
    pair co-occurs in exactly 2 orders (the support threshold boundary),
    plus a support-1 pair (50,60) that must be pruned."""
    d = tmp_path_factory.mktemp("k4")
    rows = []
    ok = 0
    for u, v in itertools.combinations([10, 20, 30, 40], 2):
        for _ in range(2):
            rows += [(ok, u), (ok, v)]
            ok += 1
    rows += [(ok, 50), (ok, 60)]          # support 1 -> not an edge
    o, p = zip(*rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(o, pa.int64()),
        "l_partkey": pa.array(p, pa.int64())}), f"{d}/lineitem.parquet")
    return str(d)


def test_triangle_count_k4_exact(ray_session, k4_dir):
    got = _canon(A.triangle_count(k4_dir).to_pandas())
    # K4 has 4 triangles; every node sits in C(3,2)=3 of them
    assert got["part_key"].tolist() == [10, 20, 30, 40]
    assert got["n_triangles"].tolist() == [3, 3, 3, 3]
    exp = _canon(_oracle(k4_dir, "lineitem", A.triangle_count_sql()))
    assert got.equals(exp)


@pytest.fixture(scope="module")
def cycle4_dir(tmp_path_factory):
    """A 4-cycle 1-2-3-4-1 (each edge support 2): it has open wedges but
    ZERO triangles — some probe buckets receive only wedge rows (the
    review-caught empty-edge IndexError path) and the final result must
    still come back EMPTY WITH SCHEMA, not column-less."""
    d = tmp_path_factory.mktemp("cyc4")
    rows = []
    ok = 0
    for u, v in [(1, 2), (2, 3), (3, 4), (1, 4)]:
        for _ in range(2):
            rows += [(ok, u), (ok, v)]
            ok += 1
    o, p = zip(*rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(o, pa.int64()),
        "l_partkey": pa.array(p, pa.int64())}), f"{d}/lineitem.parquet")
    return str(d)


def test_triangle_count_cycle_is_empty_with_schema(ray_session, cycle4_dir):
    ds = A.triangle_count(cycle4_dir)
    # the Dataset-level schema must survive an all-empty result (the
    # typed empty table of the final exchange pins it; Dataset.to_pandas
    # itself drops columns on zero blocks — a Ray quirk, so assert on
    # the Dataset schema, the API contract)
    assert ds.schema().names == ["part_key", "n_triangles"]
    assert ds.count() == 0
    exp = _oracle(cycle4_dir, "lineitem", A.triangle_count_sql())
    assert len(exp) == 0


@pytest.fixture(scope="module")
def iv_dir(tmp_path_factory):
    """events with every island edge case: touching intervals (must merge
    under s > pm), an interval contained in its neighbor, two intervals
    opening at the same microsecond, and a user with one event.

    Durations are (1 + event_id % 7) * 30s, so event_id selects duration:
    id 6 -> 7 slots = 210s, id 13 -> 7 slots, id 0 -> 1 slot = 30s."""
    d = tmp_path_factory.mktemp("iv")
    base = 1_700_000_000_000_000          # us epoch, arbitrary
    ev = [
        # user 1: [0,210s) then touching [210s,240s) -> ONE island of 240s
        (6, 1, base),
        (0, 1, base + 210_000_000),
        # user 1: far-away singleton -> second island (30s)
        (7, 1, base + 10_000_000_000),
        # user 2: [0,210s) contains [60s,90s); same-start [0,30s) -> 1 island
        (13, 2, base),
        (14, 2, base + 60_000_000),
        (21, 2, base),
        # user 3: single event
        (28, 3, base + 5),
    ]
    i, u, t = zip(*ev)
    pq.write_table(pa.table({
        "event_id": pa.array(i, pa.int64()),
        "user_id": pa.array(u, pa.int64()),
        "ts": pa.array(list(t), pa.timestamp("us"))}), f"{d}/events.parquet")
    return str(d)


def test_interval_union_edge_islands(ray_session, iv_dir):
    got = _canon(A.interval_union(iv_dir).to_pandas())
    exp = _canon(_oracle(iv_dir, "events", A.interval_union_sql()))
    assert got.equals(exp)
    by = got.set_index("user_id")
    assert by.loc[1, "n_islands"] == 2
    assert by.loc[1, "covered_us"] == 240_000_000 + 30_000_000
    assert by.loc[2, "n_islands"] == 1        # contained + same-start merge
    assert by.loc[2, "covered_us"] == 210_000_000
    assert by.loc[3, "n_islands"] == 1


@pytest.fixture(scope="module")
def scd_dir(tmp_path_factory):
    """customer covering every SCD2 row class: key%10 = 8 (deleted),
    4 (changed), 2 (added clone), and an untouched survivor."""
    d = tmp_path_factory.mktemp("scd")
    pq.write_table(pa.table({
        "c_custkey": pa.array([8, 4, 2, 5], pa.int64()),
        "c_mktsegment": pa.array(["AUTO", "BUILDING", "MACHINERY",
                                  "HOUSEHOLD"], pa.string())}),
        f"{d}/customer.parquet")
    return str(d)


def test_scd2_merge_row_classes(ray_session, scd_dir):
    got = _canon(A.scd2_merge(scd_dir).to_pandas())
    exp = _canon(_oracle(scd_dir, "customer", A.scd2_merge_sql()))
    assert got.equals(exp)
    rows = {(r.c_custkey, r.valid_from, r.valid_to): r.c_mktsegment
            for r in got.itertuples()}
    assert rows[(8, 1, 2)] == "AUTO"                 # deleted: closed at v2
    assert rows[(4, 1, 2)] == "BUILDING"             # changed: old closed
    assert rows[(4, 2, A.SCD_OPEN)] == "MOVED"       # ...new open row
    assert rows[(2, 1, A.SCD_OPEN)] == "MACHINERY"   # unchanged survivor
    assert rows[(-3, 2, A.SCD_OPEN)] == "MACHINERY"  # added negative clone
    assert rows[(5, 1, A.SCD_OPEN)] == "HOUSEHOLD"
    assert len(rows) == 6
