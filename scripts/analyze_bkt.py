"""Effective-exponent analysis of the XY from-disorder literal
(BKT quench, /root/reference/app/
xy2d_periodic_gpu_relaxation_from_disorder.f90:9-15).

Reports per-decade effective exponents of <|m|>(t) growth (raw and
with the BKT log-corrected length L(t) ~ (t/ln t)^(1/2)) and of the
autocorrelation decay A(t), for the ANALYSIS.md BKT section.

Usage: python scripts/analyze_bkt.py <dat> [dat2 ...]
"""

import sys

import numpy as np


def analyze(path):
    rows = np.asarray([[float(x) for x in ln.split()] for ln in
                       open(path)
                       if not ln.startswith("#") and ln.strip()])
    t, m, e, A = rows[:, 2], rows[:, 3], rows[:, 4], rows[:, 9]
    print(f"{path}: {len(rows)} rows, {int(rows[0,1])} samples")
    for lo, hi in ((10, 100), (100, 1000), (1000, 10000),
                   (10000, 100000)):
        w = (t >= lo) & (t <= hi)
        if w.sum() < 10:
            continue
        pm = np.polyfit(np.log(t[w]), np.log(m[w]), 1)[0]
        x = np.log(t[w] / np.log(t[w]))
        px = np.polyfit(x, np.log(m[w]), 1)[0]
        wA = w & (A > 0)
        pA = (np.polyfit(np.log(t[wA]), np.log(A[wA]), 1)[0]
              if wA.sum() > 10 else float("nan"))
        print(f"  [{lo:>6},{hi:>6}] m ~ t^{pm:+.4f}"
              f"  ~ (t/ln t)^{px:+.4f}"
              f"  A ~ t^{pA:+.4f}  e({hi})={e[w][-1]:.5f}")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        analyze(p)
