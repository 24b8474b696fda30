"""Workaround for a rare XLA-CPU executable/argument mismatch race.

Under concurrent DAG stage threads (pipeline/stages.py `_run_dag`,
stage_workers>=2), a jitted function occasionally dispatches against an
executable whose parameter count is one higher than the supplied argument
buffers ("Execution supplied N buffers but compiled program expected N+1
buffers") — observed on the CPU backend for several unrelated pure
functions (align/lookup._gapped_rescue, ops/banded.banded_align) when two
shape-specializations first-compile near-simultaneously. The compiled
cache entry itself is wrong: clearing the function's jit cache and
recompiling the SAME arguments succeeds deterministically.

`call_buffer_safe` wraps a jit callable with exactly that recovery. It is
safe because every wrapped function is pure (no donation, no stateful
effects); the only cost is a recompile on the rare trip.
"""

from __future__ import annotations

import threading

_LOCK = threading.Lock()


def _is_buffer_mismatch(e: Exception) -> bool:
    s = str(e)
    return "buffers" in s and "compiled program expected" in s


def _is_transient_remote(e: Exception) -> bool:
    """Remote-compile/tunnel hiccups seen on the axon backend (HTTP body
    truncation, connection resets) — retryable, the service recovers."""
    s = str(e)
    return ("remote_compile" in s or "response body closed" in s
            or "connection reset" in s.lower())


def call_buffer_safe(jit_fn, *args, **kw):
    """Call a jitted pure function; on the buffer-count mismatch race,
    clear its compilation cache and retry once (serialized). Transient
    remote-service errors retry with backoff (the r5 binding run died to
    one mid-stage HTTP truncation from the remote compiler)."""
    import time

    for attempt in range(4):
        try:
            return jit_fn(*args, **kw)
        except ValueError as e:
            if not _is_buffer_mismatch(e):
                raise
            with _LOCK:
                try:
                    jit_fn.clear_cache()
                except AttributeError:
                    pass
                return jit_fn(*args, **kw)
        except Exception as e:  # jax.errors.JaxRuntimeError and kin
            if attempt == 3 or not _is_transient_remote(e):
                raise
            time.sleep(20 * (attempt + 1))
