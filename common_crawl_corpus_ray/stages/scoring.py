"""Stage 2: stateful scoring actor — dual LID + perplexity in one pass.

Replaces the reference's per-file ``mp.Pool(maxtasksperchild=1)`` model
reloading (cc_corpus.py:394-398 — the model was reloaded for EVERY file)
with a Ray Data actor pool: models are built once per actor in
``__init__`` and reused for every batch (SURVEY.md section 2.3 A1/A2/A4).

Use as::

    ds.map_batches(TranscriptScorer, batch_format="pyarrow",
                   batch_size=1024, concurrency=(2, 8), num_cpus=1)

Adds columns: lang, lang2, lang_agree, log_prob, ppl.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import spec
from ..models import train


class TranscriptScorer:
    def __init__(self, lid_agree_min_len: int = spec.LID_AGREE_MIN_LEN):
        self.primary, self.secondary, self.lms = train.build_models()
        self.lid_agree_min_len = lid_agree_min_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        scrubbed = batch["transcript_scrubbed"]
        texts = scrubbed.to_pylist()

        lang = self.primary.predict(texts)
        sec = self.secondary.predict(texts)
        lens = pc.utf8_length(scrubbed).to_numpy(zero_copy_only=False)
        # secondary LID only trusted above the reference's 150-char
        # threshold (geoWAC.py:19-22); below it the vote is "ukn"
        lang2 = [s if ln > self.lid_agree_min_len else "ukn"
                 for s, ln in zip(sec, lens)]
        agree = [a == b for a, b in zip(lang, lang2)]

        # perplexity LM is per predicted language: batch-score each
        # language's texts in one vectorized call instead of per row
        lms = self.lms
        lang_arr = np.asarray(lang, dtype=object)
        log_prob = np.zeros(len(texts), dtype=np.float64)
        for l in set(lang):
            idx = np.nonzero(lang_arr == l)[0]
            log_prob[idx] = lms[l].logprob_batch([texts[i] for i in idx])
        n_words = batch["n_words"].to_numpy(zero_copy_only=False).astype(np.float64)
        ppl = log_prob / np.maximum(n_words, 1.0)

        batch = batch.append_column("lang", pa.array(lang, pa.string()))
        batch = batch.append_column("lang2", pa.array(lang2, pa.string()))
        batch = batch.append_column("lang_agree", pa.array(agree, pa.bool_()))
        batch = batch.append_column("log_prob", pa.array(log_prob, pa.float64()))
        batch = batch.append_column("ppl", pa.array(ppl, pa.float64()))
        return batch
