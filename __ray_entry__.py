"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship clips quality-filter pipeline at sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md section 2 (plus the training-data-pipeline additions: dedup
family, ANN, text analysis, multimodal audio); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_registered = False


def _setup() -> None:
    """Make package modules worker-safe: Ray workers do not inherit the
    driver's sys.path, so register every package module for pickle-by-value
    (stage callables then serialize with their code, no worker import)."""
    global _registered
    # import the full surface first so every submodule is in sys.modules
    from common_crawl_corpus_ray.pipelines import (analytics, clips_queries,  # noqa: F401
                                                   quality_filter)
    from common_crawl_corpus_ray.stages import (ann, decide, dedup_family,  # noqa: F401
                                                scoring, scrub_rules)
    if _registered:
        return
    import ray.cloudpickle as rcp
    for name, mod in list(sys.modules.items()):
        if name.startswith("common_crawl_corpus_ray"):
            try:
                rcp.register_pickle_by_value(mod)
            except Exception:
                pass
    _registered = True


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    _setup()
    from common_crawl_corpus_ray.pipelines import clips_queries
    return clips_queries.clips_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    _setup()
    import numpy as np
    import pyarrow.parquet as pq

    from common_crawl_corpus_ray.pipelines import analytics as A
    from common_crawl_corpus_ray.pipelines import clips_queries as C
    from common_crawl_corpus_ray.stages import ann, dedup_family

    def ann_query(sf_dir: str, approximate: bool = False):
        import ray.data as rd
        t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        import pyarrow.compute as pc
        q = t.filter(pc.less(t["vec_id"], A.ANN_NUM_QUERIES))
        qids = q["vec_id"].to_numpy(zero_copy_only=False)
        qmat = np.stack([np.asarray(e, dtype=np.float64) for e in q["embedding"].to_pylist()])
        ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        fn = ann.lsh_topk if approximate else ann.brute_force_topk
        return fn(ds, qids, qmat, k=A.ANN_K)

    def minhash(sf_dir: str):
        ds = C.mutated_docs(sf_dir)
        return dedup_family.minhash_dedup_pairs(ds, "doc_id", "text", threshold=0.7)

    def simhash(sf_dir: str):
        ds = C.mutated_docs(sf_dir)
        return dedup_family.simhash_dedup_pairs(ds, "doc_id", "text", max_hamming=8)

    return {
        # --- scrub / rules / scalar functions (M7-M18, SURVEY 2.2/2.8) ---
        "scrub_regex": A.scrub_docs,
        "heuristic_rules": A.heuristic_rules,
        "token_count": A.token_count,
        "text_hash": A.text_hash,
        "quality_score": A.quality_score,
        "fingerprint": A.fingerprint,
        # --- dedup family (D1-D4) ---
        "exact_dedup_first": A.exact_dedup_first,
        "exact_dedup_none": A.exact_dedup_none,
        "minhash_dedup": minhash,
        "simhash_dedup": simhash,
        # --- aggregations / groupbys (G1-G6) ---
        "pages_group": A.pages_group,
        "lang_rollup": A.lang_rollup,
        "domain_stats": A.domain_stats,
        "median_mad": A.median_mad,
        "sample_chunks": A.sample_chunks,
        # --- outlier cut / sorts / joins (O1-O4, J1-J5, M3/M4) ---
        "zscore_outliers": A.zscore_outliers,
        "top_longest": A.top_longest,
        "semi_anti_join": A.semi_anti_join,
        # --- stream-shaped ---
        "events_window": A.events_window,
        "sessionize": A.sessionize,
        # --- similarity search ---
        "ann_cosine_topk": ann_query,
        "ann_lsh_topk": lambda sf: ann_query(sf, approximate=True),
        # --- models / multimodal / flagship ---
        "lid_documents": C.lid_documents,
        "audio_decode_stats": C.audio_decode_stats,
        "clips_pipeline": C.clips_pipeline,
    }


def oracle_sql() -> dict[str, str]:
    _setup()
    from common_crawl_corpus_ray.functions import spec
    from common_crawl_corpus_ray.pipelines import analytics as A

    z = spec  # keep import obvious
    ann_sql = f"""
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < {A.ANN_NUM_QUERIES})
SELECT qid AS query_id, vec_id AS neighbor_id,
       ROUND(list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])), 4) AS sim
FROM q, embeddings
WHERE vec_id != qid
QUALIFY row_number() OVER (
    PARTITION BY qid
    ORDER BY list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])) DESC, vec_id
) <= {A.ANN_K}"""

    return {
        "scrub_regex": A.scrub_docs_sql(),
        "heuristic_rules": A.heuristic_rules_sql(),
        "token_count": A.token_count_sql(),
        "text_hash": A.text_hash_sql(),
        "quality_score": A.quality_score_sql(),
        "fingerprint": A.fingerprint_sql(),
        "exact_dedup_first": A.exact_dedup_first_sql(),
        "exact_dedup_none": A.exact_dedup_none_sql(),
        "pages_group": A.pages_group_sql(),
        "lang_rollup": A.lang_rollup_sql(),
        "domain_stats": A.domain_stats_sql(),
        "median_mad": A.median_mad_sql(),
        "sample_chunks": A.sample_chunks_sql(),
        "zscore_outliers": A.zscore_outliers_sql(),
        "top_longest": A.top_longest_sql(),
        "semi_anti_join": A.semi_anti_join_sql(),
        "events_window": A.events_window_sql(),
        "sessionize": A.sessionize_sql(),
        "ann_cosine_topk": ann_sql,
        # minhash_dedup / simhash_dedup / ann_lsh_topk / lid_documents /
        # audio_decode_stats / clips_pipeline: not SQL-expressible
        # (models, LSH, audio) -> driver records rows-only checks.
    }
