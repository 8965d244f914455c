"""Local replica of the graft driver's correctness gate: every queries()
entry with an oracle_sql() runs side-by-side against DuckDB at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__
    return __ray_entry__


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def to_pandas(res):
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64") if df[c].dtype != np.uint64 else df[c]
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_QUERIES = [
    "scrub_regex", "heuristic_rules", "token_count", "text_hash",
    "quality_score", "fingerprint", "exact_dedup_first", "exact_dedup_none",
    "pages_group", "lang_rollup", "partition_rollup", "domain_stats", "median_mad",
    "sample_chunks", "zscore_outliers", "top_longest", "seeded_sample",
    "semi_anti_join",
    "events_window", "sessionize", "ann_cosine_topk",
    "ngram_jaccard_dedup", "embedding_dup_exact",
    # round 2: new operators + rows-only entries upgraded to exact oracles
    "url_parse", "annotate_region", "asof_join",
    "simhash_dedup", "embedding_dup_lsh",
    "token_count_bpe", "events_sliding_window", "group_topk",
    "repetition_score", "winnow_fingerprint", "text_search_topk",
    # round 3: minhash upgraded to an exact oracle (HUGEINT multiply-shift
    # signatures, bit-identical banding + verify)
    "minhash_dedup",
    # round 3: HLL estimate in exact integer-harmonic arithmetic; M17
    # standalone gensim-order token-filter chain
    "approx_distinct_words", "token_filter_chain",
    # round 3: one-to-many interval range join (keyed co-location);
    # language-balanced deterministic sampling (per-stratum seeded_sample)
    "range_join", "stratified_sample",
    # round 3: connected components over verified near-dup pairs
    # (recursive-CTE transitive-closure oracle) + keep-best-per-cluster
    "dedup_clusters", "dedup_keep_best",
    # round 3: deterministic training-export sharding (seeded hash order);
    # incremental dedup vs a persisted prior-corpus hash index
    "shard_assign", "dedup_incremental",
    # round 3: integer-exact pricing rollup + large-large hash equi-join
    # over the TPC-H-shaped tables
    "tpch_q1", "hash_join",
    # round 4: keep-best over the minhash detector; cross-crawl NEAR-dup
    # vs a persisted prior band index; clustering driven by minhash; the
    # exact-dup collapse semantics pin; sub-document sentence dedup
    "dedup_keep_best_minhash", "dedup_incremental_near",
    "dedup_clusters_minhash", "minhash_dedup_exactdups", "sentence_dedup",
    "vocab_topk",
    # round 4: benchmark decontamination (exact word-5-gram overlap vs a
    # deterministic held-out slice, broadcast gram set + rolling hash);
    # GPT-style concat-then-chunk sequence packing (window-sum oracle)
    "decontaminate", "pack_sequences",
    # round 5 (cont.): canonical-URL keep-first dedup (self-colliding URL
    # synth: every (4m, 4m+1) pair differs only by 'www.' + tracking
    # params), D4-style frequency downsampling over planted dup clusters
    # (sizes 1/2/3, deterministic hash threshold), and GPT-3-style
    # fractional 5-gram decontamination (n_hits*8 >= n_grams)
    "url_dedup", "soft_dedup", "contamination_overlap",
    # round 5 (cont.): Broder containment dedup — excerpt plants (prefix
    # 2/5 of donor words + a novel citation suffix) score in (0.8, 1.0)
    # where Jaccard sits ~0.4; same capped inverted-index machinery
    "containment_dedup",
    # round 5 (cont.): exact cosine radius search (data-dependent neighbor
    # count; threshold on the unrounded float64 sim, >=4e-4 fixture margin)
    "ann_range_search",
    # round 5 (cont.): JSON props extraction + per-type rollup (shared RE2
    # spelling both engines; exact distinct users via two-level pairs)
    "json_props_rollup",
    # round 5 (cont.): TPC-H Q3 three-way join (custkey semi exchange ->
    # orderkey join exchange -> per-bucket top-10, integer micro money)
    "tpch_q3",
    # round 5 (cont.): star-schema profit rollup over broadcast dims
    # (part/supplier/nation — the last unused fixture tables)
    "star_profit",
    # round 5 (cont.): long->wide pivot (fixed type vocabulary, block-side
    # pivot partials, per-column Sum reduce; integer cents spend)
    "user_event_pivot",
    # round 5: simhash detector composed into the cluster policies
    # (detector x policy matrix closed) — oracle swaps the pairs CTE of
    # the cluster SQL for the bit-identical simhash band join
    "dedup_clusters_simhash", "dedup_keep_best_simhash",
    # round 5: distributed exact prefix-sum quota cut (per-lang char
    # budget in stable-hash order; window cum-sum oracle) + exact-integer
    # temperature-sampled mix (alpha=0.5 via isqrt == floor-sqrt-double)
    "corpus_balance", "temperature_mix", "train_val_split",
    # round 5: embedding modality composed into the cluster policy (LSH
    # cosine pairs -> connected components; recursive-closure oracle over
    # the exact-cosine pair set)
    "embedding_dup_clusters",
    # round 5: multi-crawl NEAR-dup index evolution — crawl-1 survivors
    # appended to the persisted band+text tables as version 2, crawl-2
    # probed against the union; oracle simulates the full two-crawl
    # history with the same perms/bands/shingles
    "near_index_evolution",
    # round 5: embedding-axis index evolution — crawl-1 novel vectors
    # appended to the sig-keyed index, crawl-2 drops must trace to BOTH
    # sides (exact-cosine two-crawl simulation oracle)
    "embedding_index_evolution",
    # round 5: standalone crawl-1 leg (new-vs-prior, version-1 pinned)
    "embedding_incremental",
    # round 5: simhash lifecycle (sixth detector) — banded incremental
    # probe + evolution, word-REVERSAL novelty (simhash is word-order
    # invariant, so scrambles would be hamming-0 dups)
    "simhash_incremental", "simhash_index_evolution",
    # round 5: exact-detector evolution twin on the text axis (survivor
    # hashes appended as version 2; crawl-2 anti-probes the union)
    "hash_index_evolution",
    # round 5: seventh detector — ngram-Jaccard lifecycle over a
    # persisted inverted index (frozen version-1 hot set; probes the
    # SAME derived crawl streams as the minhash lifecycle)
    "ngram_incremental", "ngram_index_evolution",
    # round 5 (cont.): exact substring (40-char window) dedup — natural
    # small-vocab window sharing, no planting; window identity = 64-bit
    # rolling hash (decontaminate precedent)
    "substring_dedup",
    # round 5 (final): iterative PageRank over a functional link graph
    # (partitioned rank state, integer micro-unit fixed point, 5 chained
    # CTE levels in the oracle) + versioned-corpus snapshot diff
    # (added/removed/modified by key, md5-hash compare, FULL OUTER oracle)
    "pagerank", "corpus_diff",
    # round 5 (cont.): DSIR importance weights (hashed-unigram LLR vs the
    # decontaminate target slice; micro-nat integer quantization)
    "dsir_weights",
    # round 5 (cont.): per-doc top-3 tf-idf terms (integer-exact surrogate
    # ranking key tf*(N-df); float tf-idf is annotation only)
    "tfidf_topk",
    # round 5 (cont.): CCNet-style per-language quality terciles (exact
    # DuckDB NTILE semantics on an integer micro-ratio key)
    "ccnet_buckets",
    # round 5 (cont.): SymSpell-blocked fuzzy string join (levenshtein
    # oracle; planted 'tble' typo in every 11th doc)
    "spell_candidates",
    # round 5 (cont.): per-source boilerplate prefix via the min/max LCP
    # identity (planted '[source] ' header both engines)
    "boilerplate_prefix",
    # round 5 (cont.): per-language interquartile winsorization (DuckDB
    # quantile_disc rank rule replicated exactly; integer order stats)
    "winsorize",
    # round 5 (cont.): PMI collocations (HUGEINT surrogate rank key,
    # noise floor c_ab >= 5, float PMI annotation-only)
    "pmi_bigrams",
    # round 5 (cont.): column profiling audit (exact distinct, VARCHAR-
    # domain min/max, null counts)
    "profile_columns",
    # round 5 (cont.): 24h-windowed ordered funnel (view->click->purchase
    # first-qualifying chain; discriminates 15->6->3 at sf0.001)
    "event_funnel",
    # round 5 (cont.): weekly cohort retention (engine-neutral integer
    # epoch-week identity, int64 microsecond arithmetic)
    "cohort_retention",
    # round 5 (cont.): behavioral Markov transition matrix (lead() over
    # tie-free per-user order; exact-int conditional probabilities)
    "event_transitions",
    # round 5 (cont.): referential-integrity audit (three FK edges,
    # withheld-decile parent plant, keyed anti-probe)
    "fk_orphans",
    # round 5 (cont.): BM25 retrieval (k1=1.2 b=0.75 as exact integer
    # rationals; Robertson idf signs preserved)
    "bm25_topk",
    # round 5 (cont.): grouped OLS regression (exact integer moments,
    # one double division per statistic, bit-identical floats)
    "ols_by_lang",
    # round 5 (cont.): 2-D Pareto skyline (NOT EXISTS dominance oracle;
    # integer axes, distributive local prune)
    "skyline_docs",
    # round 5 (final): triangle census over the co-purchase graph
    # (degree-oriented wedges; support >= 2 edge prune mirrored in SQL),
    # per-user interval-union coverage (boundary sweep vs window-max
    # islands SQL), and SCD2 dimension merge (version-interval rows,
    # FULL OUTER oracle)
    "triangle_count", "interval_union", "scd2_merge",
    # round 5 (final): GROUPING SETS rollup (four levels, one corpus
    # pass, COALESCE-sentinel rolled keys)
    "cube_rollup",
    # round 5 (final): peak concurrency (sweep-line max, time-range
    # exchange, RANGE-peer window oracle)
    "peak_concurrency",
    # round 5 (final): pairwise source-vocabulary Jaccard (integer
    # milli-Jaccard, word-keyed exchange)
    "source_similarity",
    # round 5 (final): per-doc char entropy (micro-nat integer surrogate,
    # per-term floor quantization on both engines)
    "char_entropy",
    # round 5 (final): k-anonymity audit (QI group sizes via one keyed
    # exchange) and lang x source PMI (bounded contingency, micro-nats)
    "k_anonymity", "lang_source_mi",
    # round 5 (final session): per-source PII/toxicity audit (raw-text
    # match counts per scrub class), multi-signal Borda rank ensemble
    # (distributed exact row_number, no global sort), streaming watermark
    # late-event annotation (distributed prefix max), and Heaps-law
    # vocabulary growth by corpus decile
    "pii_audit", "rank_ensemble", "watermark_late_events", "vocab_growth",
    # round 5 (final session): frequency-floor heavy hitters (exact
    # Misra-Gries candidates + broadcast verify, no word shuffle) and
    # per-type hourly burst detection (cross-multiplied integer rates)
    "heavy_hitters", "event_rate_anomaly",
    # round 5 (final session): mixed-script confusion flag (shared CJK
    # class), Q4-shaped EXISTS semi-join aggregate (distinct-key combiner,
    # no row multiplication), week-over-week trend (explicit Monday
    # truncation matching date_trunc('week'))
    "script_mix", "tpch_q4", "weekly_trend",
    # round 5 (final session): per-source HHI/Gini concentration in
    # integer micro-units, and a byte-exact edit-distance near-dup join
    # (DuckDB levenshtein is byte-based; the Ray DP matches that unit)
    "lang_concentration", "edit_distance_dedup",
    # round 5 (final session): estimated-similarity join (matching
    # signature positions over banded candidates, star-collapsed),
    # per-language exact quantiles without a sort, and a bloom-pruned
    # exact semi join (bitset broadcast + keyed verify)
    "minhash_sim_join", "lang_length_quantiles", "bloom_semi_join",
    # round 5 (final session): Gopher dup-5-gram char fraction (exact
    # interval union, planted boilerplate footers) and corpus-derived
    # stop-word fraction (top-K broadcast-back, integer milli)
    "dup_ngram_chars", "stopword_coverage",
    # round 5 (final session): NFC normalize-before-hash audit (planted
    # combining sequences; unicodedata == utf8proc on stable NFC) and
    # hash-partition skew diagnostics over the exchanges' md5 key hash
    "nfc_normalize_scan", "partition_skew",
    # round 5 (cont. session): TPC-H Q5 six-table regional revenue (the
    # c_nationkey == s_nationkey cross-side predicate), per-dimension
    # embedding moments (floor-micro int64, shuffle-free partials), top-k
    # ordered behavioral paths (ordered string_agg through two keyed
    # exchanges), and the leakage-safe cluster-hash holdout split
    "tpch_q5", "embedding_dim_stats", "event_paths", "split_leak_purge",
    # round 5 (cont. session): quality-gate threshold sweep (integer
    # cross-multiplied compares, bounded combiner), deterministic
    # contrastive negative sampling (hash function of (doc_id, j, N)),
    # and session-grain conversion (gap sessionize + any-purchase)
    "filter_sweep", "negative_samples", "session_conversion",
    # round 5 (cont. session): weight-proportional priority sample
    # (integer u // w keys, distributed top-k)
    "weighted_sample",
    # round 5 (cont. session): bounded-depth BFS hop distances (chained
    # frontier CTE oracle) and the exact-integer two-sample KS drift test
    "graph_distance", "ks_drift",
    # round 5 (cont. session): dedup cluster-size histogram (closure +
    # GROUP BY size) and bloom-pruned incremental dedup (same output as
    # dedup_incremental — the exact SQL is its oracle verbatim)
    "dup_cluster_hist", "dedup_incremental_bloom",
    # round 5 (cont. session): rolling 7-day distinct active users
    # (sliding DISTINCT via per-user run merge + boundary diffs)
    "active_users_window",
    # round 5 (cont. session): Count-Min sketch point queries (grid and
    # collision overestimates pinned bit-exactly in SQL)
    "countmin_words",
    # round 5 (cont. session): time-bounded stream-stream join (sliding
    # per-row window aggregate over a composite-key searchsorted)
    "stream_window_join",
    # round 5 (cont. session): Z-order clustering key (bit interleave
    # stated verbatim in SQL)
    "zorder_layout",
    # round 5 (cont. session): exact median over an unbounded domain
    # (histogram refinement; lower-median rank rule stated both engines)
    "exact_median_price",
]


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(entry_mod, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = canon(to_pandas(q(SF_DIR)))
    want = canon(con.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(want[c]):
            assert np.allclose(got[c].to_numpy(dtype=np.float64),
                               want[c].to_numpy(dtype=np.float64),
                               atol=1e-9, rtol=0, equal_nan=True), c
        else:
            mism = (got[c].astype(str) != want[c].astype(str))
            assert not mism.any(), f"{c}: {got[c][mism].head(3)} vs {want[c][mism].head(3)}"


CLIPS_FIXTURE_QUERIES = [
    "codec_validity",
    # round 4: audio-modality operators with exact fixture-parquet oracles
    "audio_chunk", "silence_trim", "audio_resample", "audio_dedup",
    "speech_rate_filter",
    # round 4: cross-modal word->chunk alignment; manifest-export round
    # trip digested back against the chunk oracle; length-bucketed ASR
    # batch planning
    "transcript_align", "export_chunks_digest", "audio_batch_pack",
    # round 4: cross-crawl incremental payload dedup vs the persisted
    # prior-corpus digest index
    "audio_dedup_incremental",
    # round 4: decoded-domain cross-codec dedup (planted-pair oracle)
    "audio_perceptual_dedup",
    # round 5: per-codec audio-ms quota cut (distributed prefix sum);
    # cross-modal contamination dedup (transcript-vs-document-text hash
    # semi-join against the keyed index, planted leaks)
    "audio_balance", "cross_modal_dedup",
    # round 5: speed-perturb augmentation manifest (integer-exact 3x
    # fan-out + hash shards); exact global percentiles by value counting
    "audio_augment_plan", "global_percentiles",
    # round 5: audio detector composed into the cluster policies (closure
    # of the planted star structure in integer arithmetic; keep-best =
    # max-duration window over the same closure)
    "audio_perceptual_clusters", "audio_keep_best",
    # round 5: incremental-matrix completion — new clips perceptually
    # matching the prior corpus are flagged with their exact donor
    "audio_perceptual_incremental",
    # round 5: multi-crawl index evolution — crawl-1 accepted clips are
    # APPENDED to the persisted index (lancelite version 2), crawl-2
    # probes the evolved union and must find partners on BOTH sides
    "audio_index_evolution",
    # round 5: exact-detector evolution twin on the audio axis (survivor
    # payload digests appended as version 2)
    "payload_index_evolution",
    # round 5 (final session): per-(codec, sr) storage/transcode plan
    "audio_storage_plan",
    # round 5 (final session): planted-saturation clipping detection —
    # real threshold scan over decoded PCM, integer-exact counts
    "audio_clipping_detect",
]


@pytest.mark.parametrize("name", CLIPS_FIXTURE_QUERIES)
def test_clips_query_matches_oracle_at_driver_sf(entry_mod, name):
    """Clip-table queries' oracles read the derived clips parquet
    directly, baked at the driver's oracle scale (sf0.01) — so these
    compare there instead of SF_DIR."""
    from common_crawl_corpus_ray.pipelines.clips_queries import ORACLE_SF
    got = canon(to_pandas(entry_mod.queries()[name](ORACLE_SF)))
    want = canon(duckdb.connect().execute(
        entry_mod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        assert got[c].astype(str).equals(want[c].astype(str)), c


ROWS_ONLY = ["ann_lsh_topk", "lid_documents",
             "ann_ivf_topk", "codec_validity"]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(entry_mod, name):
    res = to_pandas(entry_mod.queries()[name](SF_DIR))
    assert res is not None
    if name == "lid_documents":
        assert len(res) == 500 and set(res.columns) == {"doc_id", "lang_pred", "score"}
    if name in ("ann_lsh_topk", "ann_ivf_topk"):
        assert set(res.columns) == {"query_id", "neighbor_id", "sim"}
    if name == "codec_validity":
        # the fixture plants a dur_ms mismatch on every 10th clip; the
        # predicate must drop exactly those
        from common_crawl_corpus_ray.pipelines import clips_queries as C
        n = C.clips_count(SF_DIR)
        assert len(res) == n - (n + 9) // 10


def test_entry_smoke(entry_mod):
    out = to_pandas(entry_mod.entry())
    assert len(out) > 0
    assert "keep" in out.columns and "drop_reason" in out.columns
    assert out["keep"].sum() > 0
