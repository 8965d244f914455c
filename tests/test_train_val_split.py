"""train_val_split edge cases: the two-cut stratified holdout must be a
pure function of content — bucket classification (train-all / val-all /
test-all / boundary) composed with the in-boundary-bucket rank rule has
to reproduce the single-node ceil-quota spelling exactly at every
percentage pair, including the degenerate ones, and must be independent
of the input's block layout."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from common_crawl_corpus_ray.functions.hashing import md5_i64
from common_crawl_corpus_ray.pipelines.analytics import train_val_split


def _reference_split(df: pd.DataFrame, t_pct: int, v_pct: int
                     ) -> pd.DataFrame:
    """Single-node spelling: per lang, order by (md5_i64(doc_id), doc_id);
    rank r gets train if r < ceil(t%*n), val if r < ceil((t+v)%*n),
    else test."""
    df = df.assign(h=[md5_i64(str(i)) for i in df["doc_id"]])
    out = []
    for _, g in df.groupby("lang", sort=True):
        g = g.sort_values(["h", "doc_id"], kind="stable")
        n = len(g)
        t1 = (t_pct * n + 99) // 100
        t2 = ((t_pct + v_pct) * n + 99) // 100
        r = np.arange(n)
        split = np.where(r < t1, "train", np.where(r < t2, "val", "test"))
        out.append(pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                                 "lang": g["lang"].to_numpy(object),
                                 "split": split}))
    return pd.concat(out).sort_values("doc_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    rng = np.random.default_rng(11)
    n = 2000
    d = tmp_path_factory.mktemp("split_docs")
    # skewed language sizes, including a 1-doc and a 3-doc language so
    # the ceil rule's corner cases (every doc train; boundary bucket
    # straddles BOTH cuts) are exercised
    langs = (["en"] * 1200 + ["de"] * 500 + ["fr"] * 296
             + ["xx"] * 3 + ["yy"])
    pq.write_table(pa.table({
        "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
        "lang": pa.array(langs, pa.string()),
    }), str(d / "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("t_pct,v_pct",
                         [(80, 10), (0, 0), (100, 0), (50, 50), (1, 1)])
def test_split_matches_reference_rule(ray_session, docs_dir, t_pct, v_pct):
    got = (train_val_split(docs_dir, t_pct, v_pct).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = _reference_split(
        pq.read_table(f"{docs_dir}/documents.parquet").to_pandas(),
        t_pct, v_pct)
    pd.testing.assert_frame_equal(got, want)


def test_split_quotas_are_exact(ray_session, docs_dir):
    df = train_val_split(docs_dir, 80, 10).to_pandas()
    sizes = df.groupby("lang")["split"].value_counts().unstack(fill_value=0)
    for lang, row in sizes.iterrows():
        n = int(row.sum())
        t1 = (80 * n + 99) // 100
        t2 = (90 * n + 99) // 100
        assert int(row.get("train", 0)) == t1, lang
        assert int(row.get("val", 0)) == t2 - t1, lang
        assert int(row.get("test", 0)) == n - t2, lang


def test_split_is_partitioning_independent(ray_session, docs_dir, tmp_path,
                                           monkeypatch):
    """Same rows, different block layout -> identical labels (the
    property an unseeded split_proportionately lacks)."""
    t = pq.read_table(f"{docs_dir}/documents.parquet")
    shuffled = t.take(np.random.default_rng(5).permutation(t.num_rows))
    d2 = tmp_path / "reordered"
    d2.mkdir()
    pq.write_table(shuffled, str(d2 / "documents.parquet"), row_group_size=97)
    a = (train_val_split(docs_dir).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (train_val_split(str(d2)).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
