"""Edge-case tests for the round-5 corpus-hygiene ops over a handwritten
corpus — cases the sf fixtures never exercise (docs shorter than the
substring window, single-doc languages, typo words colliding with the
lexicon), each still checked against the same DuckDB oracle so the two
engines' edge behavior is pinned together, not separately."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from common_crawl_corpus_ray.pipelines import analytics as A

_DOCS = [
    # doc 0: shorter than the 40-char substring window -> zero windows
    (0, "tiny doc", "en", "src0"),
    # docs 1/2: byte-identical 60-char bodies -> every window duplicated
    (1, "the quick brown fox jumps over the lazy dog again and again", "en",
     "src0"),
    (2, "the quick brown fox jumps over the lazy dog again and again", "en",
     "src1"),
    # doc 3: shares a 40+-char prefix with 1/2 but diverges -> partial dups
    (3, "the quick brown fox jumps over the lazy cat asleep on the mat",
     "fr", "src1"),
    # doc 4: unique text, sole member of its language (NTILE n=1 path)
    (4, "completely unrelated content with no shared windows at all here",
     "de", "src2"),
]


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hygiene")
    ids, texts, langs, srcs = zip(*_DOCS)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def con(corpus_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{corpus_dir}/documents.parquet')")
    return c


def _match(ray_ds, sql, con, sort_cols):
    got = ray_ds.to_pandas()
    want = con.execute(sql).fetchdf()
    assert list(sorted(got.columns)) == list(sorted(want.columns))
    got = got[sorted(got.columns)].sort_values(sort_cols).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(sort_cols).reset_index(drop=True)
    for c in got.columns:
        if pd.api.types.is_integer_dtype(want[c]):
            got[c] = got[c].astype("int64")
            want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want, atol=1e-9, rtol=0)
    return got


def test_substring_dedup_short_doc_and_identical_pair(
        ray_session, corpus_dir, con):
    got = _match(A.substring_dedup(corpus_dir), A.substring_dedup_sql(),
                 con, ["doc_id"])
    by_id = got.set_index("doc_id")
    # doc 0 is shorter than the window: zero windows, never a dup
    assert by_id.loc[0, "n_windows"] == 0
    assert not by_id.loc[0, "has_dup"]
    # doc 2 duplicates doc 1 byte-for-byte: every window duplicated
    assert by_id.loc[2, "n_dup_windows"] == by_id.loc[2, "n_windows"] > 0
    # doc 1 is the first occurrence: owns its windows
    assert not by_id.loc[1, "has_dup"]
    # doc 3 shares the long prefix only: some but not all windows dup
    assert 0 < by_id.loc[3, "n_dup_windows"] < by_id.loc[3, "n_windows"]


def test_ccnet_buckets_single_member_language(ray_session, corpus_dir, con):
    got = _match(A.ccnet_buckets(corpus_dir), A.ccnet_buckets_sql(),
                 con, ["doc_id"])
    # a one-doc language lands in 'head' (NTILE(3) of n=1)
    assert got.set_index("doc_id").loc[4, "bucket"] == "head"


def test_boilerplate_prefix_single_doc_source(ray_session, corpus_dir, con):
    got = _match(A.boilerplate_prefix(corpus_dir),
                 A.boilerplate_prefix_sql(), con, ["source"])
    by_src = got.set_index("source")
    # single-doc source: the whole (planted-header + text) string is the LCP
    assert by_src.loc["src2", "prefix_len"] == len("[src2] ") + len(
        _DOCS[4][1])
    # multi-doc source with diverging bodies: exactly the planted header
    assert by_src.loc["src1", "prefix"].startswith("[src1] the quick brown")


def test_winsorize_degenerate_groups(ray_session, corpus_dir, con):
    got = _match(A.winsorize(corpus_dir), A.winsorize_sql(),
                 con, ["doc_id"])
    by_id = got.set_index("doc_id")
    # single-doc language: Q1 == Q3 == its own value, nothing clipped
    assert not by_id.loc[4, "clipped"]
    assert by_id.loc[4, "n_chars_winsor"] == by_id.loc[4, "n_chars"]


def test_dsir_and_tfidf_run_on_tiny_corpus(ray_session, corpus_dir, con):
    _match(A.dsir_weights(corpus_dir), A.dsir_weights_sql(), con,
           ["doc_id"])
    got = _match(A.tfidf_topk(corpus_dir), A.tfidf_topk_sql(), con,
                 ["doc_id", "rank"])
    # every doc emits at most K ranked terms, ranks contiguous from 1
    assert (got.groupby("doc_id")["rank"].max() <= 3).all()
    assert (got.groupby("doc_id")["rank"].min() == 1).all()


def test_skyline_filter_matches_brute_force_and_is_distributive():
    """_skyline_filter == the O(n^2) dominance definition on random
    integer point sets, and the distributive property the distributed
    split relies on (skyline of unioned local skylines == global
    skyline) holds across random partitions."""
    import numpy as np

    from common_crawl_corpus_ray.pipelines.analytics import _skyline_filter

    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(1, 50))
        x = rng.integers(0, 8, n).astype(np.int64)
        y = rng.integers(0, 8, n).astype(np.int64)
        got = set(_skyline_filter(x, y).tolist())
        brute = {i for i in range(n)
                 if not any(x[j] >= x[i] and y[j] >= y[i]
                            and (x[j] > x[i] or y[j] > y[i])
                            for j in range(n))}
        assert got == brute
        cut = n // 2
        k1 = _skyline_filter(x[:cut], y[:cut])
        k2 = _skyline_filter(x[cut:], y[cut:])
        cx = np.concatenate([x[:cut][k1], x[cut:][k2]])
        cy = np.concatenate([y[:cut][k1], y[cut:][k2]])
        km = _skyline_filter(cx, cy)
        assert (sorted(zip(cx[km], cy[km]))
                == sorted(zip(x[list(brute)], y[list(brute)])))


def test_corpus_diff_change_structure(ray_session):
    """The diff must recover exactly the derivation: every %10==3 doc is
    'removed', every %10==7 'modified', every %10==1 cloned id 'added' —
    and nothing else (unchanged docs must not leak into the diff)."""
    import pyarrow.parquet as pq

    from common_crawl_corpus_ray.pipelines.analytics import corpus_diff
    sf = "/root/testdata/sf0.001"
    ids = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_numpy()
    got = corpus_diff(sf).to_pandas().sort_values("doc_id")
    by = {c: set(g["doc_id"]) for c, g in got.groupby("change")}
    assert by["removed"] == {int(i) for i in ids if i % 10 == 3}
    assert by["modified"] == {int(i) for i in ids if i % 10 == 7}
    assert by["added"] == {-int(i) - 1 for i in ids if i % 10 == 1}
    assert len(got) == sum(len(v) for v in by.values())


def test_pagerank_mass_and_hubs(ray_session):
    """Structural invariants beyond the oracle: total rank mass stays
    within the damped-teleport fixed-point envelope, and the k=1 edge
    map's 5-to-1 collision (gcd(5, 500)) makes its images genuine hubs —
    the top rank must exceed the uniform start."""
    from common_crawl_corpus_ray.pipelines.analytics import (PR_INIT,
                                                             pagerank)
    df = pagerank("/root/testdata/sf0.001").to_pandas()
    n = len(df)
    assert df["rank_micro"].min() >= 150_000          # teleport floor
    assert df["rank_micro"].max() > PR_INIT           # hubs concentrate
    # mass: teleport adds 0.15/node/iter, damping keeps <= 0.85 of sum;
    # after 5 iters total mass stays within [0.4, 1.2] of the start mass
    total = df["rank_micro"].sum()
    assert 0.4 * n * PR_INIT < total < 1.2 * n * PR_INIT


# --- round-5 final-session trio edges --------------------------------------

_ENT_DOCS = [
    (0, "aaaaaaaa"),              # uniform -> entropy exactly 0
    (1, "ab"),                    # two singleton chars: ent = 2*ln(2)
    (2, "  世界\U0001f600"),  # space run + CJK + astral plane
    (3, "x"),                     # single char: ln(1) - ln(1) = 0
]


@pytest.fixture(scope="module")
def ent_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("entropy")
    ids, texts = zip(*_ENT_DOCS)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(d / "documents.parquet"))
    return str(d)


def test_char_entropy_edges(ray_session, ent_dir):
    got = (A.char_entropy(ent_dir).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # uniform and single-char docs have exactly zero entropy (the
    # quantization must not leak a stray micro-nat on the n == c_i case)
    assert got.loc[0, "ent_u"] == 0 and got.loc[3, "ent_u"] == 0
    assert got.loc[1, "ent_u"] > 0
    # astral-plane text: n_cp counts code points, not UTF-16 units
    assert got.loc[2, "n_cp"] == 5
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"read_parquet('{ent_dir}/documents.parquet')")
    want = (c.execute(A.char_entropy_sql()).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_source_similarity_edges(ray_session, corpus_dir, con):
    # pins the single-doc-source and tiny-vocab edges against the oracle
    # (srcs here hold 1-2 docs; sf sources never drop that low)
    got = A.source_similarity(corpus_dir)
    want = con.execute(A.source_similarity_sql()).fetchdf()
    gd = (got.to_pandas().sort_values(["src_a", "src_b"])
          .reset_index(drop=True))
    wd = (want[sorted(want.columns)].sort_values(["src_a", "src_b"])
          .reset_index(drop=True))
    pd.testing.assert_frame_equal(gd[sorted(gd.columns)], wd)
