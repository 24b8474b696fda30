"""Run directory: stage artifacts + manifest = the checkpoint/resume system.

The reference's checkpointing IS its Makefile DAG over complete-on-rename
binary files (ref: RunAllPathsLG generated Makefile, SURVEY.md §5.4). Here:
a run directory holds one .npz per named artifact plus `manifest.json`
mapping each completed stage to its input hash, outputs and metrics; the
runner skips stages whose inputs are unchanged and outputs present.
Writes go through a temp file + rename so interrupted stages never leave
half-written artifacts.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from typing import Dict, List, Optional

import numpy as np


class RunDir:
    def __init__(self, path: str):
        import threading
        self.path = path
        os.makedirs(path, exist_ok=True)
        self.manifest_path = os.path.join(path, "manifest.json")
        self.manifest: Dict = {"stages": {}, "created": time.time()}
        self._manifest_lock = threading.Lock()
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                self.manifest = json.load(f)

    # ---- artifacts ----
    def _file(self, name: str) -> str:
        return os.path.join(self.path, name + ".npz")

    def save_arrays(self, name: str, **arrays) -> str:
        # uncompressed: base-code arrays are hundreds of MB at genome scale
        # and zlib costs minutes of host CPU per stage (ref analog: raw
        # feudal binary files, not compressed)
        tmp = self._file(name) + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez(fh, **{k: np.asarray(v) for k, v in arrays.items()})
        os.replace(tmp, self._file(name))
        return self._file(name)

    def load_arrays(self, name: str) -> Dict[str, np.ndarray]:
        with np.load(self._file(name)) as z:
            return {k: z[k] for k in z.files}

    def has(self, name: str) -> bool:
        return os.path.exists(self._file(name))

    def file_path(self, name: str) -> str:
        return os.path.join(self.path, name)

    # ---- stage bookkeeping ----
    @staticmethod
    def hash_of(*parts) -> str:
        h = hashlib.sha1()
        for p in parts:
            if isinstance(p, np.ndarray):
                h.update(p.tobytes())
            else:
                h.update(str(p).encode())
        return h.hexdigest()[:16]

    def stage_done(self, stage: str, inputs_hash: str, outputs: List[str]) -> bool:
        rec = self.manifest["stages"].get(stage)
        if rec is None or rec.get("inputs_hash") != inputs_hash:
            return False
        return all(os.path.exists(os.path.join(self.path, o)) for o in rec["outputs"])

    def mark_done(self, stage: str, inputs_hash: str, outputs: List[str],
                  metrics: Optional[Dict] = None, elapsed: float = 0.0):
        # lock: concurrent DAG stages (stage_workers > 1) mark_done from
        # different threads; the manifest write must be atomic per update
        with self._manifest_lock:
            self.manifest["stages"][stage] = {
                "inputs_hash": inputs_hash,
                "outputs": outputs,
                "metrics": metrics or {},
                "elapsed_s": round(elapsed, 3),
                "finished": time.time(),
            }
            tmp = self.manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self.manifest, f, indent=1)
            os.replace(tmp, self.manifest_path)

    def metrics(self, stage: str) -> Dict:
        rec = self.manifest["stages"].get(stage) or {}
        return rec.get("metrics", {})
