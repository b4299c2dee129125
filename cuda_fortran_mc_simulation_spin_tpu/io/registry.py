"""Run registry: append-only log of completed runs.

Replaces the reference scripts' `gpu_*.log` lines
("model, size, sample, mcs, kbt, iseed, time, file",
/root/reference/scripts/fpm_run_ising3d.sh:50-60) with one JSON object
per line — same information, machine-readable.
"""

from __future__ import annotations

import dataclasses
import json
import time


def append(log_path: str, cfg, elapsed_sec: float, output_path: str | None,
           extra: dict | None = None) -> None:
    rec = {
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "elapsed_sec": round(elapsed_sec, 3),
        "output": output_path,
        **dataclasses.asdict(cfg),
    }
    if extra:
        rec.update(extra)
    with open(log_path, "a") as f:
        f.write(json.dumps(rec, default=str) + "\n")
