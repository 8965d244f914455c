import numpy as np
import pytest

from common_crawl_corpus_ray.audio import codecs
from common_crawl_corpus_ray.synth import clips


@pytest.mark.parametrize("codec", codecs.CODECS)
def test_roundtrip_snr(codec):
    rng = np.random.default_rng(1)
    x = (0.35 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)
         + 0.004 * rng.standard_normal(8000)).astype(np.float32)
    y = codecs.decode(codecs.encode(x, codec), codec)
    assert len(y) == len(x)
    assert codecs.snr_db(x, y) >= 30.0


@pytest.mark.parametrize("codec", codecs.CODECS)
def test_decode_deterministic(codec):
    x = np.linspace(-0.9, 0.9, 1000).astype(np.float32)
    b1, b2 = codecs.encode(x, codec), codecs.encode(x, codec)
    assert b1 == b2


def test_num_samples():
    x = np.zeros(100, dtype=np.float32)
    for c in codecs.CODECS:
        assert codecs.num_samples(len(codecs.encode(x, c)), c) == 100


def test_clip_audio_invariant():
    """Per-row invariant seed: decode(bytes) vs ground-truth PCM, SNR>=30dB."""
    t, _ = clips.clips_table(40)
    for i in range(t.num_rows):
        codec = t["codec"][i].as_py()
        payload = t["bytes"][i].as_py()
        sr = t["sr_hz"][i].as_py()
        n = codecs.num_samples(len(payload), codec)
        truth = clips.ground_truth_pcm(i, n, sr)
        got = codecs.decode(payload, codec)
        assert codecs.snr_db(truth, got) >= 30.0
