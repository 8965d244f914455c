"""Keyed side-table lookup over a lancelite table's fragment range index.

This is the scale replacement for "to_pandas() the whole side table and
broadcast it" (the round-1 phase-D anti-pattern): the side table (decision
rows, dup flags, ...) is written with per-fragment [min, max] key stats in
the manifest (``lancelite.write_dataset(key_stats=...)``); lookups then load
ONLY the fragments whose key range overlaps the batch's keys, with a small
per-actor LRU of indexed fragments.

Why this is 100-TB-safe for the flagship: phase A-C preserve block lineage
(map_batches keeps input order), so each decision fragment covers a narrow
clip_id range matching an input fragment — a phase-D task touches O(1)
decision fragments, never the table. The memory bound is explicit:
``max_cached`` fragments per actor, regardless of table size. A worst-case
input (keys uncorrelated with fragment ranges) degrades to fragment reloads,
not to OOM.

The reference has no equivalent (its join-back is a pandas merge in one
process, cc_corpus.py:443-459); this is the Ray-native redesign.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from . import lancelite


class KeyedFragmentIndex:
    """Immutable range index of a lancelite table: per-fragment key
    [min, max] from the manifest. Pickles small (paths + bounds only), so
    it broadcasts to actors for free."""

    def __init__(self, uri: str, key: str, version: int | None = None):
        man = lancelite.manifest(uri, version)
        entries = [e for e in man["fragments"] if e.get("rows", 0) > 0]
        for e in entries:
            if "stats" not in e or key not in e["stats"]:
                raise ValueError(
                    f"fragment {e['path']} has no {key!r} stats — write the "
                    f"table with lancelite.write_dataset(key_stats={key!r})")
        entries.sort(key=lambda e: e["stats"][key][0])
        self.key = key
        self.paths = [os.path.join(uri, e["path"]) for e in entries]
        self.mins = [e["stats"][key][0] for e in entries]
        self.maxs = [e["stats"][key][1] for e in entries]

    def fragments_for(self, lo, hi) -> list[str]:
        """Paths of fragments whose [min, max] overlaps [lo, hi]."""
        return [p for p, mn, mx in zip(self.paths, self.mins, self.maxs)
                if not (mx < lo or mn > hi)]


class KeyedBatchJoiner:
    """Per-actor lookup state: resolves a batch of keys to side-table rows,
    loading overlapping fragments on demand with an LRU cache.

    Construct once in an actor's ``__init__`` (the index is broadcast; the
    cache is per-actor). ``lookup(keys)`` returns a pandas frame positioned
    row-for-row with ``keys`` (inner semantics: missing keys raise).
    """

    def __init__(self, index: KeyedFragmentIndex,
                 columns: list[str] | None = None, max_cached: int = 8):
        self.index = index
        self.columns = columns
        self.max_cached = max_cached
        self._frags: OrderedDict[str, pd.DataFrame] = OrderedDict()

    def _fragment(self, path: str) -> pd.DataFrame:
        df = self._frags.get(path)
        if df is None:
            t = pq.read_table(path, columns=self.columns)
            df = t.to_pandas().set_index(self.index.key)
            self._frags[path] = df
            while len(self._frags) > self.max_cached:
                self._frags.popitem(last=False)
        else:
            self._frags.move_to_end(path)
        return df

    def _frame_for(self, keys) -> pd.DataFrame | None:
        paths = self.index.fragments_for(min(keys), max(keys))
        if not paths:
            return None
        if len(paths) == 1:
            return self._fragment(paths[0])
        return pd.concat([self._fragment(p) for p in paths])

    @staticmethod
    def _keys(keys) -> list:
        if isinstance(keys, (pa.Array, pa.ChunkedArray)):
            return keys.to_pylist()
        return list(keys)

    def lookup(self, keys) -> pd.DataFrame:
        """Inner lookup: every key must exist (raises KeyError otherwise);
        result rows are positioned row-for-row with ``keys``."""
        keys = self._keys(keys)
        if not keys:
            return pd.DataFrame()
        df = self._frame_for(keys)
        if df is None:
            raise KeyError("no side-table fragment overlaps the batch keys")
        return df.loc[keys]

    def lookup_left(self, keys) -> pd.DataFrame:
        """Left lookup: missing keys yield all-NaN rows (same positional
        contract as :meth:`lookup`)."""
        keys = self._keys(keys)
        if not keys:
            return pd.DataFrame()
        df = self._frame_for(keys)
        if df is None:
            return pd.DataFrame(index=keys,
                                columns=[c for c in (self.columns or [])
                                         if c != self.index.key])
        return df.reindex(keys)


def attach_columns(batch: pa.Table, joiner: KeyedBatchJoiner, key: str,
                   types: dict[str, pa.DataType]) -> pa.Table:
    """Append the side table's ``types`` columns to ``batch`` by key."""
    sub = joiner.lookup(batch[key])
    for col, typ in types.items():
        batch = batch.append_column(col, pa.array(sub[col].tolist(), typ))
    return batch
