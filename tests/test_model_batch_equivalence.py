"""The vectorized batch paths of the scoring models must agree with their
per-text reference paths (same weights, same gram sets, float64-aligned
accumulation) — this is what keeps the Ray pipeline and the line-faithful
oracle interchangeable."""

import numpy as np
import pytest

from common_crawl_corpus_ray.models import train
from common_crawl_corpus_ray.models.fastlid import _gram_ids as fl_grams
from common_crawl_corpus_ray.models.nb_lid import _gram_ids as nb_grams


@pytest.fixture(scope="module")
def models():
    return train.build_models()


EDGE_TEXTS = ["", "a", "ab", "abc", " ", "  ", "日本語のテストです",
              "mixed ascii と 日本語", "\n\t", "x" * 500]


def _texts():
    rng = np.random.default_rng(11)
    words = ["the", "quick", "brown", "fox", "salta", "über", "chien",
             "porta", "语言", "mundo", "farbe", "nuit"]
    out = [" ".join(rng.choice(words, size=rng.integers(1, 60)))
           for _ in range(300)]
    return out + EDGE_TEXTS


def test_fastlid_batch_matches_per_text(models):
    primary, _, _ = models
    texts = _texts()
    got = primary.predict(texts)
    W, labels = primary.W, primary.labels
    for t, g in zip(texts, got):
        h = fl_grams(t)
        want = labels[0] if h.size == 0 else \
            labels[int(np.argmax(W[:, h].astype(np.float64).sum(axis=1)))]
        assert g == want, repr(t)


def test_nblid_batch_matches_per_text(models):
    _, secondary, _ = models
    texts = _texts()
    got = secondary.predict(texts)
    W, labels = secondary.W, secondary.labels
    for t, g in zip(texts, got):
        h = nb_grams(t)
        want = "ukn" if h.size == 0 else \
            labels[int(np.argmax(W[:, h].astype(np.float64).sum(axis=1)))]
        assert g == want, repr(t)


def test_ngramlm_batch_matches_per_text(models):
    _, _, lms = models
    texts = _texts()
    for lang in ("eng", "cmn"):
        lm = lms[lang]
        batch = lm.logprob_batch(texts)
        single = np.array([lm.logprob(t) for t in texts])
        np.testing.assert_allclose(batch, single, rtol=0, atol=1e-8)


def test_batch_results_independent_of_batching(models):
    """Scoring must not depend on how texts are grouped into batches."""
    primary, secondary, lms = models
    texts = _texts()
    whole = (primary.predict(texts), secondary.predict(texts),
             lms["eng"].logprob_batch(texts))
    piecewise = ([], [], [])
    for i in range(0, len(texts), 37):
        chunk = texts[i:i + 37]
        piecewise[0].extend(primary.predict(chunk))
        piecewise[1].extend(secondary.predict(chunk))
        piecewise[2].extend(lms["eng"].logprob_batch(chunk).tolist())
    assert whole[0] == piecewise[0]
    assert whole[1] == piecewise[1]
    np.testing.assert_allclose(whole[2], piecewise[2], atol=1e-9)
