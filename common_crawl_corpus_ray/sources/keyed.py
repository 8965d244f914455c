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

The join itself is Arrow-native: each fragment is key-sorted once at load;
a batch lookup is one ``np.searchsorted`` over the sorted keys plus one
Arrow ``take`` per output column — no pandas index, no per-row Python
(measured ~2x on the sf0.1 phase-D wall vs the .loc/tolist version).

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
    cache is per-actor)."""

    def __init__(self, index: KeyedFragmentIndex,
                 columns: list[str] | None = None, max_cached: int = 8):
        self.index = index
        self.columns = columns
        self.max_cached = max_cached
        self._frags: OrderedDict[str, tuple[np.ndarray, pa.Table]] = OrderedDict()
        self._merged_key: tuple | None = None
        self._merged: tuple[np.ndarray, pa.Table] | None = None

    @staticmethod
    def _sorted_fragment(t: pa.Table, key: str) -> tuple[np.ndarray, pa.Table]:
        keys = t[key].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        take = pa.array(order)
        return keys[order], t.take(take).combine_chunks()

    def _fragment(self, path: str) -> tuple[np.ndarray, pa.Table]:
        got = self._frags.get(path)
        if got is None:
            t = pq.read_table(path, columns=self.columns)
            got = self._sorted_fragment(t, self.index.key)
            self._frags[path] = got
            while len(self._frags) > self.max_cached:
                self._frags.popitem(last=False)
        else:
            self._frags.move_to_end(path)
        return got

    def _side_for(self, keys: np.ndarray) -> tuple[np.ndarray, pa.Table] | None:
        """(sorted keys, key-sorted table) covering the batch's key range."""
        paths = self.index.fragments_for(keys.min(), keys.max())
        if not paths:
            return None
        if len(paths) == 1:
            return self._fragment(paths[0])
        # memoize the last multi-fragment merge: consecutive batches from
        # the same block straddle the same fragment pair
        mkey = tuple(paths)
        if self._merged_key == mkey:
            return self._merged
        parts = [self._fragment(p) for p in paths]
        t = pa.concat_tables([p[1] for p in parts], promote_options="default")
        merged = self._sorted_fragment(t, self.index.key)
        self._merged_key, self._merged = mkey, merged
        return merged

    @staticmethod
    def _keys_np(keys) -> np.ndarray:
        if isinstance(keys, (pa.Array, pa.ChunkedArray)):
            return keys.to_numpy(zero_copy_only=False)
        a = np.asarray(keys)
        # unicode dtype has no min/minimum ufunc loops; object arrays do
        return a.astype(object) if a.dtype.kind in "US" else a

    def probe(self, keys) -> tuple[np.ndarray, np.ndarray, pa.Table | None]:
        """(row indices into the side table, found mask, side table) for a
        batch of keys — one searchsorted, no per-row Python."""
        k = self._keys_np(keys)
        if k.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, bool), None
        side = self._side_for(k)
        if side is None:
            return np.zeros(k.size, np.int64), np.zeros(k.size, bool), None
        skeys, stable = side
        idx = np.clip(np.searchsorted(skeys, k), 0, skeys.size - 1)
        found = skeys[idx] == k
        return idx, found, stable

    def take_columns(self, keys, types: dict[str, pa.DataType]) -> dict[str, pa.Array]:
        """Side columns aligned row-for-row with ``keys``; every key must
        exist (inner semantics — raises on a miss)."""
        idx, found, stable = self.probe(keys)
        if idx.size and (stable is None or not found.all()):
            raise KeyError("side table is missing keys present in the batch")
        out = {}
        take = pa.array(idx)
        for col, typ in types.items():
            arr = stable[col] if stable is not None else pa.nulls(0, typ)
            out[col] = arr.take(take).cast(typ) if idx.size else pa.nulls(0, typ)
        return out

    # --- pandas-shaped compatibility lookups (tests, small tools) ----------

    def lookup(self, keys) -> pd.DataFrame:
        """Inner lookup: every key must exist (raises KeyError otherwise);
        result rows are positioned row-for-row with ``keys``."""
        idx, found, stable = self.probe(keys)
        if idx.size == 0:
            return pd.DataFrame()
        if stable is None or not found.all():
            raise KeyError("side table is missing keys present in the batch")
        return stable.take(pa.array(idx)).to_pandas().set_index(self.index.key)

    def lookup_left(self, keys) -> pd.DataFrame:
        """Left lookup: missing keys yield all-NaN rows (same positional
        contract as :meth:`lookup`)."""
        k = self._keys_np(keys)
        if k.size == 0:
            return pd.DataFrame()
        idx, found, stable = self.probe(k)
        cols = [c for c in (self.columns or
                            (stable.column_names if stable is not None else []))
                if c != self.index.key]
        out = pd.DataFrame(index=k, columns=cols)
        if stable is not None and found.any():
            sub = stable.take(pa.array(idx[found])).to_pandas()
            for c in cols:
                vals = out[c].to_numpy(dtype=object)
                vals[found] = sub[c].to_numpy(dtype=object)
                out[c] = vals
        return out


def attach_columns(batch: pa.Table, joiner: KeyedBatchJoiner, key: str,
                   types: dict[str, pa.DataType]) -> pa.Table:
    """Append the side table's ``types`` columns to ``batch`` by key."""
    cols = joiner.take_columns(batch[key], types)
    for col, arr in cols.items():
        batch = batch.append_column(col, arr)
    return batch
