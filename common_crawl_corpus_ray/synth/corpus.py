"""Deterministic per-language synthetic text ("no external data").

Seven synthetic languages: six Latin-script languages with strongly distinct
letter distributions (so the from-scratch LID models are learnable) and one
CJK-script language (to exercise the 15-char CJK rule, cc_corpus.py:276-284).

Everything is seeded; the same (lang, seed) always yields the same text.
"""

from __future__ import annotations

import numpy as np

LATIN_LANGS = ["eng", "fra", "deu", "spa", "ita", "por"]
CJK_LANG = "cmn"
LANGS = LATIN_LANGS + [CJK_LANG]

_VOCAB_SIZE = 400
_WORD_LEN_LO, _WORD_LEN_HI = 2, 9
_GLOBAL_SEED = 42

_vocab_cache: dict[str, list[str]] = {}


def _lang_rng(lang: str) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64([_GLOBAL_SEED, hash_lang(lang)]))


def hash_lang(lang: str) -> int:
    h = 2166136261
    for b in lang.encode():
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


def _latin_alphabet(lang: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-language letter subset + Zipf-ish weights, deterministically distinct."""
    rng = _lang_rng(lang)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    perm = rng.permutation(26)
    chosen = letters[perm[:16]]          # 16-letter alphabet per language
    w = 1.0 / np.arange(1, 17) ** 0.8    # skewed frequency profile
    rng.shuffle(w)
    return chosen, w / w.sum()


def vocab(lang: str) -> list[str]:
    """Deterministic word list for a language."""
    if lang in _vocab_cache:
        return _vocab_cache[lang]
    rng = _lang_rng(lang)
    if lang == CJK_LANG:
        # 500 characters from a language-specific CJK sub-block; "words" are
        # 1-3 character sequences.
        base = 0x4E00 + (hash_lang(lang) % 64) * 16
        chars = [chr(base + int(i)) for i in rng.choice(4000, size=500, replace=False)]
        words = []
        for _ in range(_VOCAB_SIZE):
            k = int(rng.integers(1, 4))
            words.append("".join(rng.choice(chars, size=k)))
    else:
        alpha, w = _latin_alphabet(lang)
        words = []
        seen = set()
        while len(words) < _VOCAB_SIZE:
            k = int(rng.integers(_WORD_LEN_LO, _WORD_LEN_HI + 1))
            word = "".join(rng.choice(alpha, size=k, p=w))
            if word not in seen:
                seen.add(word)
                words.append(word)
    _vocab_cache[lang] = words
    return words


_WORD_WEIGHTS: dict[str, np.ndarray] = {}


def _weights(lang: str) -> np.ndarray:
    if lang not in _WORD_WEIGHTS:
        w = 1.0 / np.arange(1, _VOCAB_SIZE + 1) ** 1.05   # Zipf over vocab
        _WORD_WEIGHTS[lang] = w / w.sum()
    return _WORD_WEIGHTS[lang]


def gen_text(lang: str, rng: np.random.Generator, target_chars: int) -> str:
    """Sample words until the sentence reaches target_chars characters."""
    words = vocab(lang)
    w = _weights(lang)
    out: list[str] = []
    total = 0
    while total < target_chars:
        word = words[int(rng.choice(_VOCAB_SIZE, p=w))]
        out.append(word)
        total += len(word) + 1
    return " ".join(out)


def training_corpus(lang: str, n_sentences: int = 300, target_chars: int = 200,
                    seed: int = 7) -> list[str]:
    """Deterministic clean training sentences for LID / LM model fitting."""
    rng = np.random.Generator(np.random.PCG64([seed, hash_lang(lang)]))
    return [gen_text(lang, rng, target_chars) for _ in range(n_sentences)]
