"""Property-based spot checks (SURVEY.md 5.6): seeded random inputs, the
vectorized Arrow pipeline kernels must agree with the line-faithful oracle
functions, and audio codecs must round-trip above the SNR bar."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from common_crawl_corpus_ray.audio import codecs
from common_crawl_corpus_ray.oracle import reference_oracle as oracle
from common_crawl_corpus_ray.stages.scrub_rules import scrub_rules_batch

# text with the alphabets the rules care about: ascii, CJK, emoji, URLs,
# punctuation runs, whitespace zoo
_TEXT = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4E80),
        st.characters(min_codepoint=0x3040, max_codepoint=0x309F),
        st.sampled_from(list("\t\n ©«®»|{}/\\[]*=_.-()&@#")),
        st.sampled_from(["😀", "🚀", "☀"]),
    ),
    max_size=220,
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8))
def test_scrub_and_rules_match_oracle(texts):
    batch = pa.table({
        "clip_id": pa.array([f"c{i}" for i in range(len(texts))]),
        "transcript": pa.array(texts, pa.string()),
    })
    out = scrub_rules_batch(batch)
    for raw, got_scrub, got_reason, got_nw in zip(
            texts, out["transcript_scrubbed"].to_pylist(),
            out["rule_reason"].to_pylist(), out["n_words"].to_pylist()):
        want_scrub = oracle.scrub(raw)
        assert got_scrub == want_scrub, repr(raw)
        assert got_reason == oracle.rule_reason(raw, want_scrub), repr(raw)
        assert got_nw == oracle.n_words(want_scrub), repr(raw)


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**32 - 1), st.sampled_from(["pcm_s16le", "ulaw", "alaw"]))
def test_codec_roundtrip_snr(seed, codec):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(16, 4000))
    # realistic audio range, leaving headroom so companding error stays small
    x = np.clip(rng.standard_normal(n) * 0.25, -0.999, 0.999).astype(np.float32)
    payload = codecs.encode(x, codec)
    assert codecs.num_samples(len(payload), codec) == n
    y = codecs.decode(payload, codec)
    assert y.shape == x.shape
    assert codecs.snr_db(x, y) >= 30.0


@settings(max_examples=150, deadline=None)
@given(_TEXT)
def test_scrub_idempotent(text):
    once = oracle.scrub(text)
    assert oracle.scrub(once) == once
