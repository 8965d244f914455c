"""Numpy audio codecs: pcm_s16le, G.711 mu-law, G.711 A-law, plus SNR.

The reference operates on text only; the rebuild's input table carries an
encoded audio payload per clip (BASELINE.json input_hint). The per-row
invariant is: audio ``bytes`` pass through the pipeline unchanged, and
decode(bytes) must reconstruct the ground-truth PCM at SNR >= 30 dB.

All transforms are pure numpy (no audio libs exist in this sandbox) and are
vectorized over whole clips; they run inside map_batches stages.
"""

from __future__ import annotations

import numpy as np

CODECS = ("pcm_s16le", "ulaw", "alaw")

_MU = 255.0
_A = 87.6
_A_LOG = 1.0 + np.log(_A)


# --- pcm_s16le --------------------------------------------------------------

def encode_pcm_s16le(x: np.ndarray) -> bytes:
    q = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2")
    return q.tobytes()


def decode_pcm_s16le(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<i2").astype(np.float32) / 32767.0


# --- G.711 mu-law (continuous formula, 8-bit quantization) ------------------

def encode_ulaw(x: np.ndarray) -> bytes:
    x = np.clip(x, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    q = np.clip(np.rint((y + 1.0) * 127.5), 0, 255).astype(np.uint8)
    return q.tobytes()


def decode_ulaw(b: bytes) -> np.ndarray:
    q = np.frombuffer(b, dtype=np.uint8).astype(np.float32)
    y = q / 127.5 - 1.0
    x = np.sign(y) * (np.expm1(np.abs(y) * np.log1p(_MU))) / _MU
    return x.astype(np.float32)


# --- G.711 A-law (continuous formula, 8-bit quantization) -------------------

def encode_alaw(x: np.ndarray) -> bytes:
    x = np.clip(x, -1.0, 1.0)
    ax = np.abs(x)
    y = np.where(ax < 1.0 / _A,
                 _A * ax / _A_LOG,
                 (1.0 + np.log(np.maximum(_A * ax, 1e-30))) / _A_LOG)
    y = np.sign(x) * y
    q = np.clip(np.rint((y + 1.0) * 127.5), 0, 255).astype(np.uint8)
    return q.tobytes()


def decode_alaw(b: bytes) -> np.ndarray:
    q = np.frombuffer(b, dtype=np.uint8).astype(np.float32)
    y = q / 127.5 - 1.0
    ay = np.abs(y)
    x = np.where(ay < 1.0 / _A_LOG,
                 ay * _A_LOG / _A,
                 np.exp(ay * _A_LOG - 1.0) / _A)
    return (np.sign(y) * x).astype(np.float32)


_ENCODERS = {"pcm_s16le": encode_pcm_s16le, "ulaw": encode_ulaw, "alaw": encode_alaw}
_DECODERS = {"pcm_s16le": decode_pcm_s16le, "ulaw": decode_ulaw, "alaw": decode_alaw}


def encode(x: np.ndarray, codec: str) -> bytes:
    return _ENCODERS[codec](x)


def decode(b: bytes, codec: str) -> np.ndarray:
    return _DECODERS[codec](b)


BYTES_PER_SAMPLE = {"pcm_s16le": 2, "ulaw": 1, "alaw": 1}


def num_samples(payload_len: int, codec: str) -> int:
    return payload_len // BYTES_PER_SAMPLE[codec]


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against ground truth ``ref``."""
    ref = ref.astype(np.float64)
    test = test.astype(np.float64)
    noise = ref - test
    p_sig = float(np.sum(ref * ref))
    p_noise = float(np.sum(noise * noise))
    if p_noise == 0.0:
        return float("inf")
    return 10.0 * np.log10(max(p_sig, 1e-30) / p_noise)
