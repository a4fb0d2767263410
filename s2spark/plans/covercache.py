"""Driver-side memo + disk cache for covering computations.

A covering is a pure function of (region geometry, coverer parameters) —
an index-build artifact, not data — so recomputing it on every query
construction is wasted serial driver time (an Amdahl term: it never
parallelizes).  This generalizes the cache spatial_join.py has carried
since round 3 for polygon coverings to any region kind (rects, caps,
polylines, radius-expanded unions): callers provide a stable key and a
compute thunk returning a JSON-serializable list of rows.

The disk tier lives under <repo>/.cache/coverings (gitignored), the same
location and lifecycle as the polygon covering cache; in production this
would be shared storage next to the other index artifacts.
"""

from __future__ import annotations

import hashlib
import json
import os

_MEMO: dict[str, list] = {}
_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".cache", "coverings")


def _digest(key) -> str:
    return hashlib.sha256(repr(key).encode()).hexdigest()[:32]


def cached_rows(key, compute):
    """Rows for `key`, from memo, disk, or `compute()` (list of lists/tuples).
    Returned rows are lists (JSON round-trip normalizes tuples)."""
    dig = _digest(key)
    rows = _MEMO.get(dig)
    if rows is not None:
        return rows
    path = os.path.join(_DIR, "r_" + dig + ".json")
    try:
        with open(path) as f:
            rows = json.load(f)
    except (OSError, ValueError):
        rows = None
    if rows is None:
        rows = [list(r) for r in compute()]
        try:
            os.makedirs(_DIR, exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(rows, f)
            os.replace(tmp, path)
        except OSError:
            pass
    _MEMO[dig] = rows
    return rows
