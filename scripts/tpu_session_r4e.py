"""One-process TPU batch, round 4e: the two production stages the r4d
session ran out of turns before reaching.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_session_r4e.py
     > /tmp/tpu_r4e.log 2>&1

Stages:
  1. PROD xy2d periodic 10000^2 relaxation (kbt=0.895, 1 sample) —
     /root/reference/app/xy2d_periodic_gpu_relaxation.f90:7-13.
  2. PROD from-disorder literal 1500^2 leg 1 (160 samples of 2222,
     checkpointed; later legs resume) — /root/reference/app/
     xy2d_periodic_gpu_relaxation_from_disorder.f90:9-15.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401  (claim the device once, up front)


def log(msg):
    print(msg, flush=True)


def stage(name):
    log(f"\n=== {name} === {time.strftime('%H:%M:%S')}")


def guarded(name, fn):
    stage(name)
    try:
        fn()
    except Exception as exc:  # noqa: BLE001
        log(f"STAGE FAILED {name}: {exc!r}")


def _cli(args):
    from cuda_fortran_mc_simulation_spin_tpu.runs.__main__ import main
    t0 = time.time()
    rc = main(args)
    log(f"cli rc={rc} elapsed={time.time() - t0:.1f}s: {' '.join(args)}")
    return rc


def s1_prod_xy_periodic_10000():
    _cli(["--model", "xy2d", "--nx", "10000", "--ny", "10000",
          "--kbt", "0.895", "--mcs", "10000", "--samples", "1",
          "--seed", "42",
          "--output",
          "data/production/xy2d_periodic_10000x10000_mcs10000_s1.dat",
          "--registry", "data/production/runs.log"])


def s2_prod_from_disorder_leg1():
    _cli(["--model", "xy2d", "--nx", "1500", "--ny", "1500",
          "--kbt", "0.890", "--protocol", "from_disorder",
          "--init-state", "random", "--mcs", "100000",
          "--samples", "2222", "--seed", "42",
          "--max-samples-this-run", "160",
          "--checkpoint", "data/production/xy_fd_1500.ck.npz",
          "--checkpoint-every", "40",
          "--output",
          "data/production/"
          "xy2d_from_disorder_1500x1500_mcs100000_s2222.dat",
          "--registry", "data/production/runs.log"])


def main():
    guarded("PROD xy periodic 10000^2", s1_prod_xy_periodic_10000)
    guarded("PROD from-disorder 1500^2 leg 1", s2_prod_from_disorder_leg1)
    stage("done")
    log(json.dumps({"ok": True}))


if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
