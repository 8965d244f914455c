"""Edge-case pins for the final-session operators (pii_audit,
rank_ensemble, watermark_late_events, vocab_growth) over handwritten
tables — boundary cases the sf fixtures hit only by accident (exact
lateness boundary, rank ties on both signals, a doc that is all
whitespace), each checked against the SAME DuckDB oracle so the two
engines' edge behavior is pinned together, not separately."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from common_crawl_corpus_ray.pipelines import analytics as A

_DOCS = [
    # doc 0: two emails + one phone (counts > docs), plus a url
    (0, "mail a@b.com and c@d.org or call +1 (555) 123-4567 http://x.y",
     "en", "src0"),
    # doc 1: toxicity in mixed case (the (?i) flag path) and a hashtag
    (1, "you STUPID Idiot #rant", "en", "src0"),
    # doc 2: all whitespace -> zero tokens, zero bigrams, no PII
    (2, " \t\n ", "en", "src1"),
    # doc 3: single word -> one unigram type, zero bigrams
    (3, "lonely", "fr", "src1"),
    # docs 4/5: identical n_chars AND identical word count -> rank ties
    # broken by doc_id on BOTH signals
    (4, "tie one xx", "de", "src2"),
    (5, "tie two yy", "de", "src2"),
]

_EVENTS = [
    # (event_id, user_id, ts_us) — arrival order is event_id order.
    # watermark before an event = max ts of prior arrivals; late iff
    # ts < watermark - 300s (STRICT: the exact-boundary event is on time).
    (0, 1, "2026-01-01 10:00:00"),   # first arrival: never late
    (1, 1, "2026-01-01 10:10:00"),   # advances watermark
    (2, 2, "2026-01-01 10:05:00"),   # 5 min behind wm -> inside 300s, on time
    (3, 2, "2026-01-01 10:05:00.000001"),  # 1us inside the boundary
    (4, 3, "2026-01-01 10:04:59.999999"),  # 1us beyond 300s -> late
    (5, 3, "2026-01-01 10:05:00"),   # EXACTLY wm - 300s -> on time (strict <)
    (6, 1, "2026-01-01 09:00:00"),   # way late
    (7, 1, "2026-01-01 11:00:00"),   # ahead of watermark, on time
]


@pytest.fixture(scope="module")
def table_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("final_ops")
    ids, texts, langs, srcs = zip(*_DOCS)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(d / "documents.parquet"))
    eid, uid, ts = zip(*_EVENTS)
    pq.write_table(pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(pd.to_datetime(list(ts), format="mixed")
                       .astype("datetime64[us]"), pa.timestamp("us")),
        "event_type": pa.array(["e"] * len(eid), pa.string()),
        "value": pa.array([0.0] * len(eid), pa.float64()),
        "props": pa.array(["{}"] * len(eid), pa.string()),
    }), str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def con(table_dir):
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{table_dir}/{t}.parquet')")
    return c


def _match(res, sql, con, sort_cols):
    got = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    want = con.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns)
    got = got[sorted(got.columns)].sort_values(sort_cols).reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(sort_cols).reset_index(drop=True)
    for c in got.columns:
        if pd.api.types.is_integer_dtype(want[c]):
            got[c] = got[c].astype("int64")
            want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got, want, atol=0, rtol=0)
    return got


def test_pii_audit_counts_and_case_insensitive_tox(
        ray_session, table_dir, con):
    got = _match(A.pii_audit(table_dir), A.pii_audit_sql(), con, ["source"])
    by = got.set_index("source")
    # doc 0: 2 emails, 1 phone, 1 url; doc 1: 2 tox matches (case-blind)
    assert by.loc["src0", "n_email"] == 2
    assert by.loc["src0", "n_phone"] == 1
    assert by.loc["src0", "n_url"] == 1
    assert by.loc["src0", "n_tox"] == 2
    # docs_with_pii counts DOCS (doc 0 only), not matches
    assert by.loc["src0", "docs_with_pii"] == 1
    # whitespace-only + single-word sources carry nothing
    assert by.loc["src1", ["n_email", "n_phone", "n_url", "n_tox",
                           "docs_with_pii"]].sum() == 0


def test_rank_ensemble_double_tie_breaks_by_doc_id(
        ray_session, table_dir, con):
    got = _match(A.rank_ensemble(table_dir), A.rank_ensemble_sql(),
                 con, ["doc_id"])
    by = got.set_index("doc_id")
    # docs 4 and 5 tie on BOTH signals; doc_id breaks both ties
    assert by.loc[4, "r_chars"] + 1 == by.loc[5, "r_chars"]
    assert by.loc[4, "r_words"] + 1 == by.loc[5, "r_words"]
    assert by.loc[4, "borda"] + 2 == by.loc[5, "borda"]
    # ranks are permutations of 1..n per signal
    n = len(by)
    assert sorted(by["r_chars"]) == list(range(1, n + 1))
    assert sorted(by["r_words"]) == list(range(1, n + 1))


def test_watermark_strict_boundary_and_first_event(
        ray_session, table_dir, con):
    got = _match(A.watermark_late_events(table_dir),
                 A.watermark_late_events_sql(), con, ["event_id"])
    late = got.set_index("event_id")["late"]
    # first arrival has no watermark
    assert not late.loc[0]
    # 5-min-behind and 1us-inside-boundary events are on time
    assert not late.loc[2] and not late.loc[3]
    # 1us beyond the 300s allowance is late; the EXACT boundary is not
    assert late.loc[4]
    assert not late.loc[5]
    # grossly late and ahead-of-watermark events
    assert late.loc[6]
    assert not late.loc[7]


def test_vocab_growth_whitespace_doc_and_single_word(
        ray_session, table_dir, con):
    got = _match(A.vocab_growth(table_dir), A.vocab_growth_sql(),
                 con, ["decile"])
    # totals: every distinct unigram/bigram counted exactly once
    all_words = set()
    all_bigrams = set()
    for _, t, _, _ in _DOCS:
        toks = [w for w in t.split() if w]
        all_words.update(toks)
        all_bigrams.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    assert got["new_words"].sum() == len(all_words)
    assert got["new_bigrams"].sum() == len(all_bigrams)
    # cumulative columns are running sums of the per-decile columns
    assert (got["vocab_words"].to_numpy()
            == got["new_words"].cumsum().to_numpy()).all()
    # doc 2 (whitespace-only) and doc 3 (single word) contribute no
    # bigrams: deciles covering only those docs emit no bigram rows
    assert got["vocab_bigrams"].iloc[-1] == len(all_bigrams)
