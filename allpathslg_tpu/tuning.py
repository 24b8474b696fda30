"""Kernel tuning registry.

Device-kernel variant choices (e.g. flat lax.sort vs bucketed grouping for
k-mer counting) are performance-equivalent in semantics but not in speed,
and the winner depends on the chip generation and XLA version. Choices are
measured once on the target hardware (scripts/tune_count.py) and persisted
in `kernel_tuning.json` next to this file; the env var
`APLG_COUNT_ENGINE=flat|bucketed` overrides for experiments.

(ref: the reference hard-codes its analogous choices per build — e.g.
naif_kmer pass counts sized to L2; here the registry replaces recompiling.)
"""

from __future__ import annotations

import functools
import json
import os

_TUNING_FILE = os.path.join(os.path.dirname(__file__), "kernel_tuning.json")

DEFAULTS = {
    # k-mer counting/spectrum engine: "flat" = one global lax.sort;
    # "bucketed" = VMEM row sorts + quantile buckets (ops/bucket_count.py)
    "count_engine": "flat",
}


@functools.lru_cache(maxsize=1)
def _load() -> dict:
    try:
        with open(_TUNING_FILE) as f:
            return {**DEFAULTS, **json.load(f)}
    except Exception:
        return dict(DEFAULTS)


def get(key: str) -> str:
    env = os.environ.get("APLG_" + key.upper())
    if env:
        return env
    return _load().get(key, DEFAULTS[key])


def save(updates: dict) -> str:
    cur = dict(_load())
    cur.update(updates)
    with open(_TUNING_FILE, "w") as f:
        json.dump(cur, f, indent=1, sort_keys=True)
    _load.cache_clear()
    return _TUNING_FILE
