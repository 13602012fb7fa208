"""Stable fingerprints for metrics, constraints, and suites.

Same identity semantics as the reference's ``IDDict.to_id``
(/root/reference/src/data_profiler/core/id_dict.py:5-23): md5 of the
sorted-key JSON serialization. The fingerprint serves double duty as the
metric-dedup key in the planner and as the checkpoint key in the results
table (so a changed suite invalidates prior checkpoints).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any


def _jsonable(value: Any) -> Any:
    if isinstance(value, dict):
        return {str(k): _jsonable(v) for k, v in sorted(value.items(), key=lambda kv: str(kv[0]))}
    if isinstance(value, (list, tuple)):
        return [_jsonable(v) for v in value]
    if isinstance(value, (set, frozenset)):
        return sorted(_jsonable(v) for v in value)
    if isinstance(value, (str, int, float, bool)) or value is None:
        return value
    return repr(value)


def fingerprint(obj: Any) -> str:
    """md5 hex digest of the canonical JSON form of ``obj``."""
    canonical = json.dumps(_jsonable(obj), sort_keys=True, separators=(",", ":"))
    return hashlib.md5(canonical.encode("utf-8")).hexdigest()
