"""Worker-side cache for broadcast objects.

``ray.get`` of a plain-Python object (dicts, object-dtype arrays, class
instances) re-deserializes on every call — only numpy buffers are zero-copy.
Stages that resolve a broadcast ref per *batch* (plain-function
``map_batches``, exchange reducers) would otherwise pay that deserialization
once per block. ``cached_get`` memoizes per worker process; entries live for
the worker's lifetime (a handful of refs per job, all small by contract).
"""

from __future__ import annotations

from typing import Any

_CACHE: dict[str, Any] = {}


def cached_get(ref) -> Any:
    """ray.get with a per-worker-process memo. Pass through non-refs."""
    import ray
    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
