"""Stage 1: fused scrub + heuristic-rules transform (stateless, vectorized).

One ``map_batches`` body covering the reference's whole narrow chain
(cc_corpus.py:237-294): regex scrub (utilities.py:265-270 + PII/toxicity
additions), pre/post length rules, illegal-char rule, alpha-content rule,
CJK-aware minimum length, punctuation caps, word count and stable content
hash. Everything except the md5 loop runs as pyarrow.compute (RE2) kernels
over zero-copy Arrow batches — no Python-per-row work in the regex path.

Input:  the clips schema (only ``transcript`` is read; other columns pass
        through untouched — audio bytes are never copied or decoded here).
Output: input columns + transcript_scrubbed, n_words, text_hash,
        rule_reason ("" if all heuristic rules pass).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions import spec
from ..functions.hashing import md5_i64_array

_RE2_STEPS = spec.scrub_steps("re2")
_CJK_CLASS_RE2 = spec.render_class(spec.CJK_RANGES, "re2")


def scrub_array(raw: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Apply the full scrub chain to a string array (RE2 kernels)."""
    out = raw
    for _, pat, rep in _RE2_STEPS:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=rep)
    return out


def n_words_array(scrubbed) -> pa.Array:
    """Python-``str.split()``-equivalent word count on space-collapsed text."""
    trimmed = pc.utf8_trim(scrubbed, " ")
    n = pc.add(pc.count_substring(trimmed, " "), 1)
    return pc.if_else(pc.equal(pc.utf8_length(trimmed), 0),
                      pa.scalar(0, pa.int32()), pc.cast(n, pa.int32()))


def rule_reason_array(raw, scrubbed) -> pa.Array:
    """First-failing heuristic rule id per row ("" when all pass).

    Conditions are evaluated vectorized and combined lowest-priority-first,
    so the highest-priority failing rule overwrites (== "first failing" in
    the reference's sequential chain, cc_corpus.py:237-294).
    """
    len_raw = pc.utf8_length(raw)
    len_scr = pc.utf8_length(scrubbed)

    pre_short = pc.less_equal(len_raw, spec.PRE_MIN_LEN)
    post_short = pc.less_equal(len_scr, spec.POST_MIN_LEN)
    illegal = pc.match_substring_regex(scrubbed, spec.ILLEGAL_CLASS)

    alpha_only = pc.replace_substring_regex(scrubbed, pattern=spec.NUMERIC_PATTERN,
                                            replacement="")
    alpha_only = pc.replace_substring_regex(alpha_only, pattern=spec.PUNCT_PATTERN,
                                            replacement=" ")
    alpha_short = pc.less_equal(pc.utf8_length(alpha_only), spec.ALPHA_MIN_LEN)

    has_cjk = pc.match_substring_regex(scrubbed, _CJK_CLASS_RE2)
    min_needed = pc.if_else(has_cjk, pa.scalar(spec.CJK_MIN_LEN),
                            pa.scalar(spec.LATIN_MIN_LEN))
    too_short = pc.less(len_scr, min_needed)

    caps_violated = pa.array([False] * len(raw)) if len(raw) else pa.array([], pa.bool_())
    for char, cap in spec.PUNCT_CAPS:
        caps_violated = pc.or_(caps_violated,
                               pc.greater_equal(pc.count_substring(scrubbed, char), cap))

    reason = pa.nulls(len(raw), pa.string())
    reason = pc.fill_null(reason, "")
    for cond, rid in reversed([
        (pre_short, "pre_short"),
        (post_short, "post_short"),
        (illegal, "illegal_char"),
        (alpha_short, "alpha_short"),
        (too_short, "min_len"),
        (caps_violated, "punct_caps"),
    ]):
        reason = pc.if_else(cond, rid, reason)
    return reason


def scrub_rules_batch(batch: pa.Table) -> pa.Table:
    """The map_batches body: clips schema in, + derived columns out."""
    raw = batch["transcript"]
    scrubbed = scrub_array(raw)
    if isinstance(scrubbed, pa.ChunkedArray):
        scrubbed = scrubbed.combine_chunks()
    batch = batch.append_column("transcript_scrubbed", scrubbed)
    batch = batch.append_column("n_words", n_words_array(scrubbed))
    batch = batch.append_column("text_hash", md5_i64_array(scrubbed))
    batch = batch.append_column("rule_reason", rule_reason_array(raw, scrubbed))
    return batch
