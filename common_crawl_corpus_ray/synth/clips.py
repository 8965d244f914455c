"""Deterministic generator for the input clips table (BASELINE.json input_hint).

Schema: (clip_id string, bytes binary, sr_hz int32, dur_ms int32,
codec string, transcript string) + a sidecar (clip_id, stratum, true_lang)
table for test assertions (FIXTURES.md F1).

Every row is a pure function of its integer index: the per-clip RNG is
seeded from fnv1a(clip_id), so generation is order- and partition-independent
and can run as a Ray Data ``map_batches`` over ``ray.data.range(n)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..audio import codecs
from ..functions.hashing import fnv1a_u32
from . import corpus
from .corpus import CJK_LANG, LATIN_LANGS

STRATA = [
    ("clean", 0.42),
    ("short15", 0.01), ("short16", 0.01), ("short49", 0.01), ("short50", 0.01),
    ("cjk14", 0.01), ("cjk15", 0.01),
    ("markup", 0.07),
    ("emoji", 0.04),
    ("illegal", 0.04),
    ("numeric", 0.04),
    ("punctcaps", 0.06),
    ("dup", 0.08),
    ("pii", 0.07),
    ("ppl_high", 0.04),
    ("ppl_low", 0.04),
    ("mixed_lang", 0.04),
]
_STRAT_NAMES = [s for s, _ in STRATA]
_STRAT_W = np.array([w for _, w in STRATA])
_STRAT_W = _STRAT_W / _STRAT_W.sum()

_SR_CHOICES = np.array([8000, 16000, 22050, 44100], dtype=np.int32)
_SR_W = np.array([0.5, 0.3, 0.15, 0.05])
_CODEC_CHOICES = ["pcm_s16le", "ulaw", "alaw"]
_CODEC_W = np.array([0.8, 0.15, 0.05])

# Default clip-duration cap. Module-level so query-time plant projections
# that REGENERATE a donor signal from the synth seed (audio_ops's
# perceptual plants) share the fixture generator's spelling instead of
# hardcoding a literal that silently diverges if a fixture is ever
# generated with a non-default cap.
MAX_DUR_MS = 3000

_ILLEGAL = list("|©«®»˂˃˄˅/\\{}")
_EMOJIS = ["\U0001F600", "\U0001F680", "☀", "\U0001F918", "❤️"]


def clip_id_of(i: int) -> str:
    return f"clip-{i:012d}"


def _rng(i: int, tag: str) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64([42, fnv1a_u32(f"{clip_id_of(i)}:{tag}".encode())]))


def _pick_lang(rng) -> str:
    return LATIN_LANGS[int(rng.integers(0, len(LATIN_LANGS)))]


def _exact_len_text(lang: str, rng, n: int) -> str:
    t = corpus.gen_text(lang, rng, n + 24)
    return t[:n].rstrip() + "x" * (n - len(t[:n].rstrip()))


def _transcript(i: int, n_dup_groups: int) -> tuple[str, str, str]:
    """Return (transcript, stratum, true_lang) for row i."""
    rng = _rng(i, "text")
    stratum = _STRAT_NAMES[int(rng.choice(len(_STRAT_NAMES), p=_STRAT_W))]
    lang = _pick_lang(rng)

    if stratum == "clean":
        return corpus.gen_text(lang, rng, int(rng.integers(120, 320))), stratum, lang
    if stratum.startswith("short"):
        return _exact_len_text(lang, rng, int(stratum[5:])), stratum, lang
    if stratum == "cjk14" or stratum == "cjk15":
        n = int(stratum[3:])
        chars = corpus.gen_text(CJK_LANG, rng, n + 12).replace(" ", "")
        return chars[:n], stratum, CJK_LANG
    if stratum == "markup":
        base_n = int(rng.choice([30, 80, 200]))
        base = corpus.gen_text(lang, rng, base_n)
        bits = ["http://foo.example/page", "<b>bold</b>", "@user", "#topic"]
        k = int(rng.integers(1, 4))
        return base + " " + " ".join(bits[:k]), stratum, lang
    if stratum == "emoji":
        base_n = int(rng.choice([40, 180]))
        base = corpus.gen_text(lang, rng, base_n)
        em = "".join(_EMOJIS[int(j)] for j in rng.integers(0, len(_EMOJIS), size=3))
        return base + " " + em, stratum, lang
    if stratum == "illegal":
        base = corpus.gen_text(lang, rng, 120)
        ch = _ILLEGAL[int(rng.integers(0, len(_ILLEGAL)))]
        pos = int(rng.integers(0, len(base)))
        return base[:pos] + ch + base[pos:], stratum, lang
    if stratum == "numeric":
        # digit/punct-heavy with a tiny alpha tail straddling the
        # alpha-content boundary (cc_corpus.py:272-273); avoids 9+ char
        # digit runs so the phone scrub doesn't fire first
        punct = "!?;:," * int(rng.integers(4, 9))
        num = str(int(rng.integers(10**3, 10**6)))
        alpha = "".join("ab"[int(j)] for j in rng.integers(0, 2, size=int(rng.integers(2, 15))))
        return punct + " " + num + " " + alpha, stratum, lang
    if stratum == "punctcaps":
        base = corpus.gen_text(lang, rng, 160)
        char, cap = [("-", 4), ("(", 4), (")", 4), ("=", 2), ("_", 2),
                     (".", 15), ("&", 4), ("[", 3), ("]", 3), ("*", 5)][int(rng.integers(0, 10))]
        k = cap - 1 + int(rng.integers(0, 2))   # at cap-1 (pass) or cap (fail)
        return base + " " + char * k, stratum, lang
    if stratum == "dup":
        g = fnv1a_u32(f"dupgroup:{i % max(1, n_dup_groups)}".encode())
        grng = np.random.Generator(np.random.PCG64([42, g]))
        glang = _pick_lang(grng)
        return corpus.gen_text(glang, grng, 200), stratum, glang
    if stratum == "pii":
        base = corpus.gen_text(lang, rng, 170)
        user = "user" + str(int(rng.integers(10, 9999)))
        email = f"{user}@mail{int(rng.integers(1, 99))}.example.com"
        phone = f"+1 ({int(rng.integers(200, 999))}) {int(rng.integers(200, 999))}-{int(rng.integers(1000, 9999))}"
        tox = ["idiot", "stupid", "moron"][int(rng.integers(0, 3))]
        return f"{base} contact {email} or {phone} you {tox}", stratum, lang
    if stratum == "ppl_high":
        common = corpus.vocab(lang)[0]
        rare = corpus.vocab(lang)[int(rng.integers(300, 400))]
        return rare + " " + " ".join([common] * 40), stratum, lang
    if stratum == "ppl_low":
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz  "))
        return "".join(letters[rng.integers(0, len(letters), size=220)]).strip(), stratum, lang
    if stratum == "mixed_lang":
        lang_b = _pick_lang(rng)
        while lang_b == lang:
            lang_b = _pick_lang(rng)
        return (corpus.gen_text(lang, rng, 110) + " " +
                corpus.gen_text(lang_b, rng, 110)), stratum, lang
    raise AssertionError(stratum)


def ground_truth_pcm(i: int, n_samples: int, sr: int) -> np.ndarray:
    """Seeded sinusoid+noise mixture; reproducible from the clip index.

    Buffer-reusing evaluation of
    ``(0.35*sin(2*pi*f1*t) + 0.2*sin(2*pi*f2*t)) + 0.004*randn`` with the
    same operation order/associativity as the naive expression, so the
    output is bit-identical to the original formula (pinned by
    test_ground_truth_pcm_bit_identity) while allocating 3 temporaries
    instead of 9 — this runs per clip in both fixture generation and the
    decode-invariant check, so constant factors matter."""
    rng = _rng(i, "audio")
    f1 = rng.uniform(80.0, min(3500.0, sr * 0.45))
    f2 = rng.uniform(80.0, min(3500.0, sr * 0.45))
    t = np.arange(n_samples, dtype=np.float64)
    t /= sr
    x = t * (2 * np.pi * f1)
    np.sin(x, out=x)
    x *= 0.35
    t *= 2 * np.pi * f2
    np.sin(t, out=t)
    t *= 0.2
    x += t
    noise = rng.standard_normal(n_samples)
    noise *= 0.004
    x += noise
    return x.astype(np.float32)


def _audio_fields(i: int, max_dur_ms: int) -> tuple[bytes, int, int, str]:
    rng = _rng(i, "meta")
    sr = int(_SR_CHOICES[int(rng.choice(4, p=_SR_W))])
    dur = int(np.clip(rng.lognormal(np.log(800.0), 0.5), 200, max_dur_ms))
    codec = _CODEC_CHOICES[int(rng.choice(3, p=_CODEC_W))]
    n = max(1, dur * sr // 1000)
    pcm = ground_truth_pcm(i, n, sr)
    return codecs.encode(pcm, codec), sr, dur, codec


def gen_batch(indices: np.ndarray, n_total: int, max_dur_ms: int = MAX_DUR_MS,
              with_audio: bool = True) -> pa.Table:
    """Generate clip rows for the given indices (a Ray map_batches body)."""
    n_dup_groups = max(1, n_total // 40)
    ids, payloads, srs, durs, cods, texts, strata, tlangs = [], [], [], [], [], [], [], []
    for i in indices:
        i = int(i)
        text, stratum, lang = _transcript(i, n_dup_groups)
        if with_audio:
            b, sr, dur, codec = _audio_fields(i, max_dur_ms)
        else:
            b, sr, dur, codec = b"", 16000, 1000, "pcm_s16le"
        ids.append(clip_id_of(i))
        payloads.append(b)
        srs.append(sr)
        durs.append(dur)
        cods.append(codec)
        texts.append(text)
        strata.append(stratum)
        tlangs.append(lang)
    return pa.table({
        "clip_id": pa.array(ids, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "sr_hz": pa.array(srs, pa.int32()),
        "dur_ms": pa.array(durs, pa.int32()),
        "codec": pa.array(cods, pa.string()),
        "transcript": pa.array(texts, pa.string()),
        "stratum": pa.array(strata, pa.string()),
        "true_lang": pa.array(tlangs, pa.string()),
    })


CLIPS_COLUMNS = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
SIDECAR_COLUMNS = ["clip_id", "stratum", "true_lang"]


def clips_table(n: int, with_audio: bool = True,
                max_dur_ms: int = MAX_DUR_MS) -> tuple[pa.Table, pa.Table]:
    """In-process generation for tests: (clips, sidecar) Arrow tables."""
    t = gen_batch(np.arange(n), n, max_dur_ms=max_dur_ms, with_audio=with_audio)
    return t.select(CLIPS_COLUMNS), t.select(SIDECAR_COLUMNS)
