"""Golden-hash pins for the queries the driver can only rows-check
(`err: no_oracle` in CORRECTNESS_r*.json): every input is a deterministic
seeded fixture, so row count + canonical content hash are stable run to
run — drift in any of these operators fails HERE even though no SQL oracle
can see it. Regenerate a pin ONLY for an intentional semantic change (run
the query at sf0.001 through `content_hash` below and update the constant
in the same commit that changes the semantics).

Also bounds the genuinely-approximate ANN variants: measured recall@k of
the LSH / IVF paths against the exact brute-force top-k, with a floor —
"approximate" with a number attached, not unverifiable.
"""

import hashlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

# (row_count, md5 of canonicalized content) per rows-only query at sf0.001
GOLDEN = {
    "ann_lsh_topk": (100, "64d67bd31fec4adca27ccba4ac4a9fb8"),
    "ann_ivf_topk": (100, "fb484d91e16e94fd30e476d303f2f3bb"),
    "lid_documents": (500, "e85d1c13cd6400ec854ed2ffcdbd7e0b"),
    "audio_decode_stats": (3, "fe736e8551cb3fa25aca3b69d02bb865"),
    "image_resize": (200, "96f43c844bfb1bbd89e93ac887f2e9c9"),
    "image_features": (200, "cab5df915095413aacc581b398e6d63a"),
    "video_frame_sample": (400, "9eb0efc69a85ce6ded52e101e95df491"),
    "clips_pipeline": (1000, "2338d1ad8f0f54086efae3320bde4481"),
    "embedding_kmeans": (500, "fbc513cbd1c70978aa0fd2a7ea72eca2"),
}


def _cell(v):
    if isinstance(v, (bytes, bytearray)):
        return hashlib.md5(bytes(v)).hexdigest()
    if isinstance(v, np.ndarray):
        return str(np.round(v, 6).tolist())
    if isinstance(v, list):
        return str(v)
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_integer_dtype(df[c]) and df[c].dtype != np.uint64:
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = np.round(df[c].astype("float64"), 9)
        if df[c].dtype == object:
            df[c] = df[c].map(_cell)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def content_hash(df: pd.DataFrame) -> str:
    df = canon(df)
    h = hashlib.md5()
    h.update(("|".join(df.columns)).encode())
    for c in df.columns:
        h.update(df[c].astype(str).str.cat(sep=",").encode())
    return h.hexdigest()


def _to_df(res) -> pd.DataFrame:
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    return pd.DataFrame(res)


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__
    return __ray_entry__


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_pin(entry_mod, name):
    res = _to_df(entry_mod.queries()[name](SF))
    want_rows, want_hash = GOLDEN[name]
    assert len(res) == want_rows, f"{name}: {len(res)} rows != {want_rows}"
    got = content_hash(res)
    assert got == want_hash, (
        f"{name}: content hash {got} != pinned {want_hash} — the operator's "
        f"output drifted; if intentional, regenerate the pin in this commit")


RECALL_FLOOR = {"ann_lsh_topk": 0.80, "ann_ivf_topk": 0.75}
# Measured on the seeded fixture: lsh 0.87 (20-table multiprobe),
# ivf 0.84 (nprobe 8/16) at sf0.001; 0.83/0.80 at sf0.01. The fixture is
# near-isotropic (top-1 cosine ~0.37 in 64-dim) — the worst case for both
# structures — so these floors pin the approximation from below; a
# regression in table hashing or probe selection breaks them.


@pytest.mark.parametrize("name", sorted(RECALL_FLOOR))
def test_ann_recall_floor(entry_mod, name):
    qs = entry_mod.queries()
    exact = _to_df(qs["ann_cosine_topk"](SF))
    approx = _to_df(qs[name](SF))
    want = exact.groupby("query_id")["neighbor_id"].apply(set)
    got = approx.groupby("query_id")["neighbor_id"].apply(set)
    hits = sum(len(got.get(q, set()) & want[q]) for q in want.index)
    recall = hits / want.map(len).sum()
    assert recall >= RECALL_FLOOR[name], f"{name} recall@k {recall:.3f}"


def test_lid_documents_matches_committed_fixture(entry_mod):
    """Full-frame equality against a committed expected parquet at sf0.01
    (stronger and more debuggable than the hash pin: a drift shows WHICH
    doc changed). The NB/FastLid models are deterministic linear algebra
    and per-text scores are batch-composition-independent, so the frame is
    bit-stable run to run. Regenerate the fixture only with an intentional
    semantic change, in the same commit."""
    import os

    import pyarrow.parquet as pq

    got = _to_df(entry_mod.queries()["lid_documents"]("/root/testdata/sf0.01"))
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = pq.read_table(os.path.join(os.path.dirname(__file__), "fixtures",
                                      "lid_documents_sf0.01.parquet")
                         ).to_pandas()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)


# the other golden-only queries, pinned the same way: committed expected
# parquet at sf0.01, stored and compared through canon() (bit-stability
# across runs verified twice before committing each fixture — the decode
# partials and the kmeans reduce are order-fixed by construction)
FRAME_FIXTURES = ["audio_decode_stats", "embedding_kmeans"]


@pytest.mark.parametrize("name", FRAME_FIXTURES)
def test_golden_query_matches_committed_fixture(entry_mod, name):
    import os

    import pyarrow.parquet as pq

    got = canon(_to_df(entry_mod.queries()[name]("/root/testdata/sf0.01")))
    want = pq.read_table(os.path.join(os.path.dirname(__file__), "fixtures",
                                      f"{name}_sf0.01.parquet")).to_pandas()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want)
