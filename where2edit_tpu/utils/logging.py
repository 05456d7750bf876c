"""Run logging: stdout tee (utils.py:375-391) + metrics (TB optional, JSONL
always — observability without heavyweight deps)."""

from __future__ import annotations

import json
import sys
import time


class Logger:
    """Tee stdout to a run.log file (reference utils.py:375-391)."""

    def __init__(self, stdout, filename: str):
        self.terminal = stdout
        self.logfile = filename

    def write(self, message):
        self.terminal.write(message)
        if self.logfile:
            try:
                with open(self.logfile, "a") as f:
                    f.write(message)
            except OSError:
                pass

    def flush(self):
        self.terminal.flush()


class MetricsWriter:
    """Scalar metrics → metrics.jsonl (+ tensorboard when importable)."""

    def __init__(self, log_dir: str):
        import os  # noqa: PLC0415

        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # noqa: PLC0415

            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        with open(self.path, "a") as f:
            f.write(json.dumps({"tag": tag, "value": float(value),
                                "step": int(step), "t": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self):
        if self._tb is not None:
            self._tb.close()


def read_scalars(log_dir: str) -> list:
    """Parse the metrics.jsonl rows a MetricsWriter produced — the
    programmatic consumer for dashboards/tests (tensorboard optional)."""
    import os  # noqa: PLC0415

    rows = []
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows
