"""Render a checkpoint's accumulated statistics into a .dat table.

Time-sliced production runs (--max-samples-this-run) hold their real
progress in the checkpoint between legs; this renders an honest
``*_partial.dat`` for an in-flight run without touching the device —
addressing the round-3 advisor finding that the OR literal's progress
lived only in the checkpoint while the named output sat empty.

Usage:
  python scripts/dump_partial_dat.py <registry.log> <output-path> \
      <checkpoint> <partial-dat-out>

The registry line whose "output" matches <output-path> supplies the
exact RunConfig (same fingerprint as the legs wrote), so checkpoint
loading re-validates physics-config identity.
"""

from __future__ import annotations

import dataclasses
import json
import sys

sys.path.insert(0, ".")

from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
from cuda_fortran_mc_simulation_spin_tpu.core import stats
from cuda_fortran_mc_simulation_spin_tpu.engine import protocols
from cuda_fortran_mc_simulation_spin_tpu.io import checkpoint, datfmt


def cfg_from_registry(registry: str, output: str) -> tuple[RunConfig, str]:
    fields = {f.name for f in dataclasses.fields(RunConfig)}
    rec = None
    with open(registry) as fh:
        for ln in fh:
            d = json.loads(ln)
            if d.get("output") == output:
                rec = d
    if rec is None:
        raise SystemExit(f"no registry entry for {output}")
    engine = rec.get("engine", "unknown")
    kw = {k: v for k, v in rec.items() if k in fields}
    return RunConfig(**kw), engine


def main(argv) -> None:
    registry, output, ck_path, out_path = argv[1:5]
    cfg, engine = cfg_from_registry(registry, output)
    op = stats.VarianceCovarianceKahan((len(cfg.measure_times)
                                        if cfg.measure_times
                                        else cfg.mcs,))
    done = checkpoint.load(ck_path, cfg, {"op": op})
    model = protocols.build_model(cfg)
    with open(out_path, "w") as out:
        protocols._emit_headers(cfg, model, out, out)
        out.write(f"# engine: {engine}\n")
        out.write(f"# PARTIAL: {done} / {cfg.tot_sample} samples "
                  "(checkpoint-rendered; legs resume bitwise)\n")
        datfmt.write_relaxation_table(out, model.nsites, cfg.mcs, op)
    print(f"wrote {out_path}: {done}/{cfg.tot_sample} samples")


if __name__ == "__main__":
    main(sys.argv)
