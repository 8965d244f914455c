"""common_crawl_corpus_ray — a Ray-Data-native quality-filter engine.

A from-scratch rebuild of the *semantics* of jonathandunn/common_crawl_corpus
(language-ID + heuristic quality rules + PII/markup scrub + exact dedup +
perplexity outlier cut) re-expressed as Ray Data pipelines over zero-copy
Arrow batches, targeting Lance-style tables of audio clip + transcript pairs.

Layout:
    functions/  — pure, vectorizable kernels (scrub spec, rules, hashing)
    audio/      — numpy audio codecs (pcm_s16le / ulaw / alaw) + SNR
    synth/      — deterministic synthetic corpus + clips-table generators
    models/     — from-scratch LID (hashed char-n-gram NB) + char n-gram LM
    stages/     — Ray Data map_batches stages (stateless fns + actor pools)
    sources/    — lancelite: versioned parquet-fragment table format
    pipelines/  — end-to-end pipeline compositions
    state/      — per-partition lineage manifests (checkpoint / resume)
    oracle/     — independent single-process reference oracle (golden labels)

The reference repo's execution model (pandas file loops, mp.Pool) is NOT
reproduced; see SURVEY.md for the semantic mapping with file:line citations.
"""

__version__ = "0.1.0"
