"""Deterministic offline model training ("no external data").

The reference trains its outlier LM on the very corpus it scores
(outlier_detection.py:58-74) — a streaming-hostile design. The rebuild
trains all models offline on the seeded synthetic per-language corpora
(SURVEY.md section 7.2), so scoring stages are pure map stages.

``build_models()`` is deterministic and cached per process; actor pools
call it in ``__init__`` (once per actor, not per batch).
"""

from __future__ import annotations

from ..synth import corpus
from .fastlid import FastLid
from .nb_lid import NBLid
from .ngram_lm import NGramLM

# NOTE: deliberately NOT functools.lru_cache — lru_cache wrappers define a
# __reduce__ that pickles by qualified-name reference, which breaks the
# pickle-by-value worker-shipping path (__ray_entry__._setup). The cache
# lives on builtins so it is never captured in by-value module pickles
# (builtins is always pickled by reference) and built models never ship
# inside task/actor pickles.


def build_models():
    """Return (primary FastLid, secondary NBLid, {lang: NGramLM}).

    Deterministic; cached once per process."""
    import builtins
    cached = getattr(builtins, "_ccc_ray_model_cache", None)
    if cached is not None:
        return cached
    corp = {lang: corpus.training_corpus(lang) for lang in corpus.LANGS}
    primary = FastLid.train(corp)
    secondary = NBLid.train(corp)
    lms = {lang: NGramLM.train(sents) for lang, sents in corp.items()}
    result = (primary, secondary, lms)
    builtins._ccc_ray_model_cache = result
    return result
