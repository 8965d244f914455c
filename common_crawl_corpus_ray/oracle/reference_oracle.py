"""Independent single-process oracle for the quality-filter decision.

A deliberately boring pandas/Python-``re`` transcription of the decision
semantics (reference: cc_corpus.py:237-294 rules, deduplication.py:88-104
dedup, geoWAC.py:19-67 dual-LID gate, outlier_detection.py:77-123 perplexity
cut). The Ray pipeline must reproduce these labels exactly (F1 >= 0.99 on
``keep``; string equality on ``transcript_scrubbed``).

Shares only the *spec* (functions/spec.py) and the *model artifacts* with
the pipeline — the execution code paths are disjoint (Python re vs RE2,
row loops vs Arrow kernels, single process vs distributed).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..functions import spec
from ..functions.hashing import md5_i64

_PY_STEPS = [(name, re.compile(pat), rep.replace("\\1", "\\g<1>").replace("\\2", "\\g<2>"))
             for name, pat, rep in spec.scrub_steps("python")]
_ILLEGAL_SET = set(spec.ILLEGAL_CHARS)
_CJK_RE = re.compile(spec.render_class(spec.CJK_RANGES, "python"))
_NUMERIC_RE = re.compile(spec.NUMERIC_PATTERN)
_PUNCT_RE = re.compile(spec.PUNCT_PATTERN)


def scrub(text: str) -> str:
    for _, rx, rep in _PY_STEPS:
        text = rx.sub(rep, text)
    return text


def rule_reason(raw: str, scrubbed: str) -> str:
    if len(raw) <= spec.PRE_MIN_LEN:
        return "pre_short"
    if len(scrubbed) <= spec.POST_MIN_LEN:
        return "post_short"
    if any(c in _ILLEGAL_SET for c in scrubbed):
        return "illegal_char"
    alpha_only = _PUNCT_RE.sub(" ", _NUMERIC_RE.sub("", scrubbed))
    if len(alpha_only) <= spec.ALPHA_MIN_LEN:
        return "alpha_short"
    min_needed = spec.CJK_MIN_LEN if _CJK_RE.search(scrubbed) else spec.LATIN_MIN_LEN
    if len(scrubbed) < min_needed:
        return "min_len"
    for char, cap in spec.PUNCT_CAPS:
        if scrubbed.count(char) >= cap:
            return "punct_caps"
    return spec.KEEP_REASON


def n_words(scrubbed: str) -> int:
    return len(scrubbed.split())


def scrub_rules_frame(transcripts: pd.Series) -> pd.DataFrame:
    """Rules-only golden columns for a series of raw transcripts."""
    scrubbed = transcripts.map(scrub)
    return pd.DataFrame({
        "transcript_scrubbed": scrubbed,
        "n_words": scrubbed.map(n_words).astype("int32"),
        "text_hash": scrubbed.map(md5_i64).astype("int64"),
        "rule_reason": [rule_reason(r, s) for r, s in zip(transcripts, scrubbed)],
    }, index=transcripts.index)


def golden_labels(clips: pd.DataFrame, lid_primary, lid_secondary, lm_by_lang) -> pd.DataFrame:
    """Full golden-label frame over a clips DataFrame (clip_id, transcript).

    ``lid_primary`` / ``lid_secondary``: fitted models with a
    ``predict(list[str]) -> list[str]`` method; ``lm_by_lang``: dict
    lang -> NGramLM with ``logprob(text) -> float``. The models are shared
    artifacts; the decision logic below is the oracle's own.
    """
    df = clips[["clip_id"]].copy()
    base = scrub_rules_frame(clips["transcript"])
    df = pd.concat([df, base], axis=1)
    scrubbed = df["transcript_scrubbed"]

    # --- dual LID + agreement gate (geoWAC.py:19-41,67) ---
    df["lang"] = lid_primary.predict(scrubbed.tolist())
    sec = np.asarray(lid_secondary.predict(scrubbed.tolist()), dtype=object)
    short = scrubbed.str.len().to_numpy() <= spec.LID_AGREE_MIN_LEN
    sec[short] = "ukn"
    df["lang2"] = sec
    df["lang_agree"] = df["lang"] == df["lang2"]

    # --- exact dedup among rules-pass rows, keep first = min clip_id ---
    rules_pass = df["rule_reason"] == spec.KEEP_REASON
    cand = df[rules_pass]
    winners = cand.groupby("text_hash")["clip_id"].transform("min")
    is_dup = pd.Series(False, index=df.index)
    is_dup.loc[cand.index] = cand["clip_id"] != winners
    df["is_dup"] = is_dup

    # --- perplexity (outlier_detection.py:77-92): Probability = log prob,
    #     Perplexity = Probability / N_Words (negative; higher = predictable)
    df["log_prob"] = [lm_by_lang[l].logprob(t) if l in lm_by_lang else 0.0
                      for l, t in zip(df["lang"], scrubbed)]
    df["ppl"] = df["log_prob"] / df["n_words"].clip(lower=1)

    # --- decision order: rules > lid_disagree > dup > ppl_outlier ---
    reason = df["rule_reason"].copy()
    alive = reason == spec.KEEP_REASON
    reason[alive & ~df["lang_agree"]] = "lid_disagree"
    alive = reason == spec.KEEP_REASON
    reason[alive & df["is_dup"]] = "dup"
    alive = reason == spec.KEEP_REASON

    # per-language median/MAD modified Z over the still-alive rows
    # (outlier_detection.py:95-113)
    df["z_score"] = 0.0
    df["ppl_bucket"] = "IN"
    for lang, grp in df[alive].groupby("lang"):
        med = float(np.median(grp["ppl"]))
        mad = float(np.median(np.abs(grp["ppl"] - med)))
        z = np.zeros(len(grp)) if mad == 0.0 else (spec.Z_SCALE * (grp["ppl"] - med) / mad)
        df.loc[grp.index, "z_score"] = z
        df.loc[grp.index[z > spec.Z_CUT], "ppl_bucket"] = "HIGH"
        df.loc[grp.index[z < -spec.Z_CUT], "ppl_bucket"] = "LOW"
    reason[alive & (df["ppl_bucket"] != "IN")] = "ppl_outlier"

    df["drop_reason"] = reason
    df["keep"] = reason == spec.KEEP_REASON
    return df
