"""Stage timers + CSV records.

Counterpart of the reference's observability layer: structured stage timers
(``DetectTimeInfo``, reference ``omr_core/src/detector.rs:42-80``) and the
benchmark CSV schema of ``examples/omr_time_analyze.rs:18-38`` (fields:
thread/device count, payload count, per-stage durations).
"""

from __future__ import annotations

import csv
import time
from contextlib import contextmanager
from dataclasses import dataclass, field, asdict

import jax


@dataclass
class TimingRecord:
    """One sweep record (CSV row), mirroring omr_time_analyze's ``Record``."""

    device_count: int = 0
    payload_count: int = 0
    gen_clues_time: float = 0.0
    gen_payloads_time: float = 0.0
    detect_time: float = 0.0
    detect_time_per_message: float = 0.0
    encode_indices_time: float = 0.0
    encode_payloads_time: float = 0.0
    decode_time: float = 0.0
    total_time: float = 0.0


class StageTimer:
    """Accumulating wall-clock stage timer with device synchronisation."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def time(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.stages[name] = self.stages.get(name, 0.0) + (
            time.perf_counter() - t0
        )
        return out


def write_csv(path: str, records: list[TimingRecord]):
    """Write sweep records (the ``benchmark.csv`` shape of
    ``examples/omr_time_analyze.rs:103-114``)."""
    if not records:
        return
    rows = [asdict(r) for r in records]
    with open(path, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
