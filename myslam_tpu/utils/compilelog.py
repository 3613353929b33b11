"""Compile-wall observability: record every expensive XLA compile.

Compile time is a first-class cost in this framework: the fused SLAM
programs are large (each costs tens of seconds to build cold through the
remote-TPU tunnel) and every change to traced code re-pays them.  Round 2
lost its benchmark artifact to exactly this — frame-0 compilation took
414 s cold and blew the driver's wall budget — so compiles are now
measured, logged to metrics.jsonl, and reported by bench.py.

JAX emits per-phase durations through jax._src.monitoring with the jitted
function's name attached; we keep everything over a small threshold
(tracing, MLIR lowering, and backend compile phases).  Persistent-cache
hits skip the backend_compile phase, so a warm run shows near-zero
backend compile seconds — the cold/warm distinction is visible directly
in the recorded totals.
"""

from __future__ import annotations

import threading

_lock = threading.Lock()
_records: list[dict] = []
_installed = False

_PHASES = (
    "jaxpr_trace_duration",
    "jaxpr_to_mlir_module_duration",
    "backend_compile_duration",
)


def install(threshold_secs: float = 0.5) -> None:
    """Register the (idempotent, process-global) compile listener."""
    global _installed
    if _installed:
        return
    from jax._src import monitoring

    def _listen(event: str, duration: float, **kw) -> None:
        phase = event.rsplit("/", 1)[-1]
        if phase in _PHASES and duration >= threshold_secs:
            with _lock:
                _records.append({
                    "compile_phase": phase.replace("_duration", ""),
                    "secs": round(float(duration), 2),
                    "fun": str(kw.get("fun_name", "?")),
                })

    monitoring.register_event_duration_secs_listener(_listen)
    _installed = True


def drain() -> list[dict]:
    """Return and clear the records accumulated since the last drain."""
    with _lock:
        out = _records[:]
        _records.clear()
    return out


def total_backend_secs(records: list[dict]) -> float:
    """Sum of actual XLA backend compiles (cache hits excluded)."""
    return sum(r["secs"] for r in records
               if r["compile_phase"] == "backend_compile")
