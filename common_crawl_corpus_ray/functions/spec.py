"""The single source of truth for scrub + quality-rule semantics.

Every pattern and threshold below is defined ONCE as data and rendered for
the three engines that must agree bit-for-bit:

  * pyarrow.compute (RE2)  — the Ray Data pipeline hot path
  * Python ``re``          — the independent single-process oracle
  * DuckDB (RE2)           — the SQL correctness oracle

Character classes are spelled out in ASCII (no ``\\s`` / ``\\d`` / ``\\b``
shorthand except where noted) because Python's ``re`` is Unicode-aware while
RE2's shorthands are ASCII-only; explicit classes make the engines agree.

Semantics mirror the reference pipeline (citations are to /root/reference):
  * scrub regexes: utilities.py:265-270 (http/@/#/markup), utilities.py:222
    (emoji), gensim split_alphanum / strip_multiple_whitespaces used at
    cc_corpus.py:264-266; rebuild additions per the north rule: email,
    phone, toxicity-word scrub.
  * heuristic rules: cc_corpus.py:237-294 (pre/post length 15, illegal
    chars utilities.py:9, alpha-content 12, CJK-aware min length 15/50,
    punctuation-frequency caps).
  * dual-LID agreement threshold 150: geoWAC.py:19-41,67.
  * modified Z-score cut +-3 with 0.6745 scale: outlier_detection.py:95-113.
"""

from __future__ import annotations

import string
from dataclasses import dataclass

# --- character classes (ASCII-explicit so RE2 == Python re) -----------------

WS_CHARS = " \t\n\r\f\x0b"
WS_CLASS = r"[ \t\n\r\f\x0B]"
NON_WS_CLASS = r"[^ \t\n\r\f\x0B]"

# Unicode block ranges, rendered per engine flavor.
EMOJI_RANGES = [
    (0x1F300, 0x1F5FF),
    (0x1F600, 0x1F64F),
    (0x1F680, 0x1F6FF),
    (0x1F900, 0x1F9FF),
    (0x1FA70, 0x1FAFF),
    (0x2600, 0x26FF),
    (0x2700, 0x27BF),
    (0xFE0F, 0xFE0F),
]

# CJK / Hangul / Hiragana / Katakana blocks (cc_corpus.py:276-284 uses
# alphabet_detector; we pin the equivalent Unicode blocks).
CJK_RANGES = [
    (0x1100, 0x11FF),   # Hangul Jamo
    (0x3040, 0x309F),   # Hiragana
    (0x30A0, 0x30FF),   # Katakana
    (0x3130, 0x318F),   # Hangul Compatibility Jamo
    (0x31F0, 0x31FF),   # Katakana Phonetic Extensions
    (0x3400, 0x4DBF),   # CJK Extension A
    (0x4E00, 0x9FFF),   # CJK Unified Ideographs
    (0xAC00, 0xD7AF),   # Hangul Syllables
]


def render_class(ranges: list[tuple[int, int]], flavor: str) -> str:
    """Render a list of codepoint ranges as a regex character class.

    flavor: "python" -> ``[\\U0001F300-\\U0001F5FF...]``
            "re2"    -> ``[\\x{1F300}-\\x{1F5FF}...]`` (pyarrow + DuckDB)
    """
    parts = []
    for lo, hi in ranges:
        if flavor == "python":
            a, b = f"\\U{lo:08X}", f"\\U{hi:08X}"
        elif flavor == "re2":
            a, b = f"\\x{{{lo:X}}}", f"\\x{{{hi:X}}}"
        else:
            raise ValueError(flavor)
        parts.append(a if lo == hi else f"{a}-{b}")
    return "[" + "".join(parts) + "]"


# --- toxicity word list (synthetic, deterministic; north-rule addition) -----

TOXIC_WORDS = [
    "idiot", "stupid", "moron", "dumbass", "scumbag",
    "loser", "garbagehuman", "trashperson", "hateful", "vileworm",
]

# --- scrub chain ------------------------------------------------------------


@dataclass(frozen=True)
class ScrubStep:
    name: str
    pattern: str        # flavor-neutral unless flavored is set
    replacement: str
    flavored: bool = False  # pattern differs per flavor (call render below)


def _tox_pattern() -> str:
    return r"(?i)\b(?:" + "|".join(TOXIC_WORDS) + r")\b"


def scrub_steps(flavor: str) -> list[tuple[str, str, str]]:
    """Ordered (name, pattern, replacement) for the given regex flavor.

    Order matters and is part of the spec:
      urls and markup first (utilities.py:265-270), then PII replacement
      (email before @-mention so addresses aren't half-eaten), then
      mention/hashtag, toxicity, emoji, alphanum splitting and whitespace
      collapse (gensim equivalents, cc_corpus.py:264-266).
    """
    emoji_cls = render_class(EMOJI_RANGES, flavor)
    return [
        ("url", rf"http{NON_WS_CLASS}+", ""),
        ("tags", r"<[^>]*>", ""),
        ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "[EMAIL]"),
        ("phone", r"\+?[0-9][0-9\-() .]{7,}[0-9]", "[PHONE]"),
        ("mention", rf"@{NON_WS_CLASS}+", ""),
        ("hashtag", rf"#{NON_WS_CLASS}+", ""),
        ("tox", _tox_pattern(), "[TOX]"),
        ("emoji", emoji_cls + "+", ""),
        ("alnum1", r"([a-zA-Z]+)([0-9]+)", r"\1 \2"),
        ("alnum2", r"([0-9]+)([a-zA-Z]+)", r"\1 \2"),
        ("ws", WS_CLASS + "+", " "),
        ("trim", "^ +| +$", ""),
    ]


def sql_scrub_expr(col: str) -> str:
    """Nested DuckDB regexp_replace expression implementing the scrub chain."""
    expr = col
    for _, pat, rep in scrub_steps("re2"):
        p = pat.replace("'", "''")
        r = rep.replace("\\", "\\").replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr


# --- heuristic rules --------------------------------------------------------

ILLEGAL_CHARS = ("|", "©", "«", "®", "»",
                 "˂", "˃", "˄", "˅",
                 "/", "\\", "{", "}")  # utilities.py:9

PRE_MIN_LEN = 15       # drop if len(raw) <= 15          cc_corpus.py:256
POST_MIN_LEN = 15      # drop if len(scrubbed) <= 15     cc_corpus.py:269
ALPHA_MIN_LEN = 12     # drop if alpha-only len <= 12    cc_corpus.py:272-273
CJK_MIN_LEN = 15       # min len when CJK present        cc_corpus.py:276-284
LATIN_MIN_LEN = 50     # min len otherwise (strict <)
LID_AGREE_MIN_LEN = 150  # secondary LID needs len > 150  geoWAC.py:19-22
Z_CUT = 3.0            # modified Z-score cut             outlier_detection.py:104-113
Z_SCALE = 0.6745       # Iglewicz-Hoaglin constant        outlier_detection.py:98

# (char, cap): count(char) must be < cap, all must hold  cc_corpus.py:287-291
PUNCT_CAPS = [
    ("-", 4), ("(", 4), (")", 4), ("=", 2), ("_", 2),
    (".", 15), ("&", 4), ("[", 3), ("]", 3), ("*", 5),
]


def _escape_class_char(c: str) -> str:
    if c in r"\^]-[":
        return "\\" + c
    return c


ILLEGAL_CLASS = "[" + "".join(_escape_class_char(c) for c in ILLEGAL_CHARS) + "]"

# gensim strip_numeric / strip_punctuation equivalents (cc_corpus.py:272)
NUMERIC_PATTERN = "[0-9]+"
PUNCT_CLASS = "[" + "".join(_escape_class_char(c) for c in string.punctuation) + "]"
PUNCT_PATTERN = PUNCT_CLASS + "+"   # replaced with a single space

# drop_reason rule ids in priority order (first failing wins)
RULE_IDS = [
    "pre_short",      # len(raw) <= 15
    "post_short",     # len(scrubbed) <= 15
    "illegal_char",   # any ILLEGAL_CHARS in scrubbed
    "alpha_short",    # alpha-only length <= 12
    "min_len",        # len(scrubbed) < 15 (CJK) / 50 (otherwise)
    "punct_caps",     # any punctuation-frequency cap violated
    "lid_disagree",   # primary/secondary LID disagreement (stage 2)
    "dup",            # exact duplicate, not the min-clip_id winner (stage 3)
    "ppl_outlier",    # |modified Z| > 3 on per-language perplexity (stage 3)
]

KEEP_REASON = ""  # drop_reason for kept rows
