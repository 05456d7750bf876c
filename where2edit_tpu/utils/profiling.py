"""Tracing / profiling helpers (SURVEY.md §5: the reference has none beyond
wall-clock timing in mapper/scripts/inference.py:65-86).

- ``trace(logdir)``: context manager around jax.profiler.trace.
- ``sync_fetch(res)``: force device completion by fetching one output
  element. On the axon remote tunnel ``jax.block_until_ready`` returns
  before the device finishes (measured: implied HBM bandwidth >600 TB/s
  under block_until_ready, ~500 GB/s — physical — under a value fetch), so
  every wall-clock measurement in this repo fences with a fetch.
- ``StageTimer``: named wall-clock stages with sync_fetch fencing.
- ``summarize_trace(logdir)``: parse the Chrome-format trace and aggregate
  device op durations (the tensorboard profile plugin converters are broken
  with this image's protobuf; the json trace is self-sufficient).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import time

import jax


def sync_fetch(res):
    """Fetch one element of the first and last leaves of ``res`` — the only
    reliable execution fence on remote-tunnel backends where
    block_until_ready resolves early. Returns ``res`` unchanged.

    When ``res`` collects outputs of several dispatched programs, the fetch
    of the last leaf fences all of them: a single device executes programs
    in dispatch order, and multi-program callers return results in that
    order. (Fetching every leaf would cost one ~40 ms tunnel roundtrip per
    leaf — a parameter tree has hundreds.)"""
    leaves = jax.tree_util.tree_leaves(res)
    for leaf in ({id(leaves[0]): leaves[0], id(leaves[-1]): leaves[-1]}.values()
                 if leaves else ()):
        # index the first element directly — ravel() would dispatch a full
        # on-device copy of the leaf inside the timed region
        jax.device_get(leaf[(0,) * leaf.ndim]
                       if getattr(leaf, "ndim", 0) else leaf)
    return res


@contextlib.contextmanager
def trace(logdir: str):
    with jax.profiler.trace(logdir):
        yield


class StageTimer:
    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result_holder=None):
        t0 = time.time()
        yield
        self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0

    def time_fn(self, name: str, fn, *args, **kwargs):
        t0 = time.time()
        out = sync_fetch(fn(*args, **kwargs))
        self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0
        return out

    def report(self) -> str:
        total = sum(self.stages.values()) or 1.0
        lines = [f"{name:32s} {dt * 1000:9.2f} ms  {dt / total * 100:5.1f}%"
                 for name, dt in sorted(self.stages.items(),
                                        key=lambda kv: -kv[1])]
        return "\n".join(lines)


def summarize_trace(logdir: str, top: int = 25) -> list[tuple[str, float, int]]:
    """Aggregate (op name, total ms, count) from the newest trace.json.gz."""
    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(files[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if name.startswith("$") or name.startswith("jit_"):
                continue  # python frames / whole-program spans
            agg[name] += e["dur"]
            cnt[name] += 1
    return [(name, dur / 1000.0, cnt[name])
            for name, dur in agg.most_common(top)]
