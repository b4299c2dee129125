"""Ensemble checkpoint / exact resume.

The reference has no state checkpointing at all (SURVEY.md §5.3-5.4); its
only resume-adjacent mechanism is `skip_curand` RNG fast-forward so
*separate jobs* consume disjoint stream segments.  Here resume is exact
and cheap by construction: per-history random streams are keyed by the
(sample, sweep) counters (core/rng.py), so a checkpoint only needs

  - the accumulator state (Kahan sums, f64),
  - the number of samples already folded in,
  - the config fingerprint (to refuse resuming a different run).

No lattice state needs saving between samples — each history is
regenerated exactly from its counters.  (Mid-sample checkpointing would
need the lattice + t, but a single sample is seconds even at the
reference's largest shapes, so sample granularity is the right cut.)
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Mapping

import numpy as np


# run-scheduling knobs that don't affect the physics of any sample:
# per-sample streams are keyed by (seed, stream, call index), so
# extending tot_sample or time-slicing a run resumes exactly
_SCHEDULING_FIELDS = ("tot_sample", "max_samples_this_run")


def config_fingerprint(cfg) -> str:
    d = dataclasses.asdict(cfg)
    for k in _SCHEDULING_FIELDS:
        d.pop(k, None)
    return hashlib.sha256(
        json.dumps(d, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def save(path: str, cfg, samples_done: int,
         accumulators: Mapping[str, object]) -> None:
    arrays: dict[str, np.ndarray] = {}
    for name, acc in accumulators.items():
        for k, v in acc.state_dict().items():
            arrays[f"{name}.{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            __fingerprint__=np.bytes_(config_fingerprint(cfg).encode()),
            __samples_done__=np.int64(samples_done),
            **arrays,
        )
    os.replace(tmp, path)


def load(path: str, cfg, accumulators: Mapping[str, object]) -> int:
    """Restore accumulators in place; returns samples_done.

    Raises ValueError on config mismatch.
    """
    with np.load(path) as z:
        fp = bytes(z["__fingerprint__"]).decode()
        if fp != config_fingerprint(cfg):
            raise ValueError(
                f"checkpoint {path} was written by a different config "
                f"(fingerprint {fp})"
            )
        samples_done = int(z["__samples_done__"])
        for name, acc in accumulators.items():
            prefix = f"{name}."
            d = {
                k[len(prefix):]: z[k]
                for k in z.files
                if k.startswith(prefix)
            }
            acc.load_state_dict(d)
    return samples_done
