"""Offline summarization of jax.profiler traces (no TensorBoard needed).

The capability slot of the reference's LIKWID hardware-counter reports
(``benchmark.h:186-215``): after capturing a trace with
:func:`utils.profiling.trace`, these helpers parse the Chrome-trace JSON
that xprof writes and aggregate device-op durations, so kernel/copy/DMA
cost breakdowns are scriptable (used by tools/probe_profile.py and
tools/probe_alias_ab.py; the Z-plane aliasing optimization was found by
spotting 118 us/it of ``copy.*`` ops this way).
"""

from __future__ import annotations

import glob
import gzip
import json
import os


def _device_events(log_dir: str):
    """Yield (name, dur_us) for ops on TPU/device tracks of the newest
    trace file under ``log_dir`` (empty if no trace was written)."""
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return
    with gzip.open(max(paths, key=os.path.getmtime), "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname:
            continue
        yield e.get("name", "?"), float(e.get("dur", 0.0))


def op_durations(log_dir: str) -> dict[str, float]:
    """Total device time (us) per op name over the captured window."""
    out: dict[str, float] = {}
    for name, dur in _device_events(log_dir):
        out[name] = out.get(name, 0.0) + dur
    return out


def top_ops(log_dir: str, n: int = 25) -> list[tuple[str, float]]:
    """The n device ops with the largest total duration (us)."""
    return sorted(op_durations(log_dir).items(), key=lambda kv: -kv[1])[:n]


def total_matching(log_dir: str, prefix: str) -> float:
    """Total device time (us) of ops whose name starts with ``prefix``
    (e.g. ``"copy."`` to quantify XLA buffer copies)."""
    return sum(d for nm, d in op_durations(log_dir).items()
               if nm.startswith(prefix))
