"""One-process TPU batch, round 4f: from-disorder literal leg 1 ONLY.

The xy2d periodic 10000^2 stage reproducibly crashes the TPU worker
(r4d stage 5, r4e, r4e2 logs) and takes any later stage down with it —
it is quarantined to its own diagnostic session (tpu_session_r4g).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_session_r4f.py
     > /tmp/tpu_r4f.log 2>&1
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401


def log(msg):
    print(msg, flush=True)


def _cli(args):
    from cuda_fortran_mc_simulation_spin_tpu.runs.__main__ import main
    t0 = time.time()
    rc = main(args)
    log(f"cli rc={rc} elapsed={time.time() - t0:.1f}s: {' '.join(args)}")
    return rc


def main():
    log(f"=== PROD from-disorder 1500^2 leg 1 === {time.strftime('%H:%M:%S')}")
    try:
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
    except Exception as exc:  # noqa: BLE001
        log(f"STAGE FAILED: {exc!r}")
    log(f"=== done === {time.strftime('%H:%M:%S')}")


if __name__ == "__main__":
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
