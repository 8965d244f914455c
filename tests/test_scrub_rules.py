import numpy as np
import pandas as pd
import pyarrow as pa

from common_crawl_corpus_ray.oracle import reference_oracle as oracle
from common_crawl_corpus_ray.stages import scrub_rules
from common_crawl_corpus_ray.synth import clips


def run_stage(texts):
    batch = pa.table({"clip_id": [f"c{i}" for i in range(len(texts))],
                      "transcript": pa.array(texts, pa.string())})
    return scrub_rules.scrub_rules_batch(batch)


def test_scrub_semantics():
    out = run_stage([
        "see http://x.com/page now",
        "hello <b>bold</b> world",
        "mail me at john.doe99@example.com today",
        "call +1 (555) 123-4567 now",
        "ping @user and #topic",
        "you are a stupid idiot",
        "smile \U0001F600\U0001F680 end",
        "abc123def and   spaced\ttext",
    ])
    s = out["transcript_scrubbed"].to_pylist()
    assert s[0] == "see now"
    assert s[1] == "hello bold world"
    assert s[2] == "mail me at [EMAIL] today"
    assert s[3] == "call [PHONE] now"
    assert s[4] == "ping and"
    assert s[5] == "you are a [TOX] [TOX]"
    assert s[6] == "smile end"
    assert s[7] == "abc 123 def and spaced text"


def test_rule_boundaries():
    cjk = "世界和平好" * 3   # 15 CJK chars
    cases = [
        ("x" * 15, "pre_short"),            # len <= 15 on raw
        ("x" * 16, "min_len"),              # passes pre, fails latin 50
        ("hello world this is a perfectly fine sentence ok yes", ""),
        ("a" * 49, "min_len"),              # 49 < 50
        ("a" * 50, ""),
        (cjk[:14] + "  padfiller", ""),     # CJK >= 15 total len passes
        (cjk[:15], "pre_short"),            # 15 CJK chars: raw len 15 <= 15
        ("b" * 30 + "|" + "b" * 30, "illegal_char"),
        ("12345678a12345678b12345678c", "alpha_short"),
        ("word " * 12 + "........ .......", "punct_caps"),    # 15 dots >= cap
    ]
    texts = [t for t, _ in cases]
    out = run_stage(texts)
    got = out["rule_reason"].to_pylist()
    for (t, want), g in zip(cases, got):
        if want != "any":
            assert g == want, (repr(t[:40]), want, g)


def test_punct_caps_exact():
    base = "a perfectly reasonable long sentence about nothing much here "
    for char, cap in [("-", 4), ("(", 4), (")", 4), ("=", 2), ("_", 2),
                      (".", 15), ("&", 4), ("[", 3), ("]", 3), ("*", 5)]:
        at_cap = run_stage([base + char * cap])["rule_reason"].to_pylist()[0]
        below = run_stage([base + char * (cap - 1)])["rule_reason"].to_pylist()[0]
        assert at_cap == "punct_caps", (char, cap, at_cap)
        assert below == "", (char, cap, below)


def test_cjk_threshold():
    cjk16 = "世界和平" * 4          # 16 CJK chars, raw len 16
    assert run_stage([cjk16])["rule_reason"].to_pylist() == [""]
    latin16 = "abcdefgh ijklmnop"
    assert run_stage([latin16])["rule_reason"].to_pylist() == ["min_len"]


def test_parity_vs_oracle_on_synth():
    """Pipeline (RE2/Arrow) must match the oracle (Python re/pandas) exactly."""
    t, _ = clips.clips_table(1500, with_audio=False)
    texts = t["transcript"].to_pylist()
    out = run_stage(texts)
    golden = oracle.scrub_rules_frame(pd.Series(texts))
    assert out["transcript_scrubbed"].to_pylist() == golden["transcript_scrubbed"].tolist()
    assert out["rule_reason"].to_pylist() == golden["rule_reason"].tolist()
    assert out["n_words"].to_pylist() == golden["n_words"].tolist()
    assert out["text_hash"].to_pylist() == golden["text_hash"].tolist()


def test_parity_on_adversarial_random_strings():
    rng = np.random.default_rng(123)
    pool = list("abc DEF123 .-()=_[]*&|/\\{}<>@#" "©世界あ가") + \
        ["http://x.y", "@u", "#t", "a@b.co", "\U0001F600", "idiot", "+1 555 123 4567"]
    texts = []
    for _ in range(400):
        k = int(rng.integers(1, 30))
        texts.append(" ".join(str(pool[int(j)]) for j in rng.integers(0, len(pool), size=k)))
    out = run_stage(texts)
    golden = oracle.scrub_rules_frame(pd.Series(texts))
    assert out["transcript_scrubbed"].to_pylist() == golden["transcript_scrubbed"].tolist()
    assert out["rule_reason"].to_pylist() == golden["rule_reason"].tolist()
    assert out["n_words"].to_pylist() == golden["n_words"].tolist()
