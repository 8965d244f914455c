"""Deterministic offline model training ("no external data").

The reference trains its outlier LM on the very corpus it scores
(outlier_detection.py:58-74) — a streaming-hostile design. The rebuild
trains all models offline on the seeded synthetic per-language corpora
(SURVEY.md section 7.2), so scoring stages are pure map stages.

``build_models()`` is deterministic and cached per process; actor pools
call it in ``__init__`` (once per actor, not per batch).
"""

from __future__ import annotations

from functools import lru_cache

from ..synth import corpus
from .fastlid import FastLid
from .nb_lid import NBLid
from .ngram_lm import NGramLM


@lru_cache(maxsize=1)
def build_models():
    """Return (primary FastLid, secondary NBLid, {lang: NGramLM})."""
    corp = {lang: corpus.training_corpus(lang) for lang in corpus.LANGS}
    primary = FastLid.train(corp)
    secondary = NBLid.train(corp)
    lms = {lang: NGramLM.train(sents) for lang, sents in corp.items()}
    return primary, secondary, lms
