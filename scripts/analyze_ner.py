"""Effective NER exponents from production .dat tables.

The reference validates its runs by eye against the known
non-equilibrium-relaxation power laws (SURVEY.md section 4: runs at the
exactly-known critical points where m(t) ~ t^(-lambda) with
literature exponents).  This tool makes that check quantitative: it
reads any relaxation-format .dat produced by the framework
(10-column table of /root/reference/app/ising2d_gpu_relaxation.f90:45-51,
or the from-disorder formats), fits the log-log slope of <m>(t) over a
chosen window, and reports the effective exponent next to the
literature value.

Literature values (ordered-start NER decay m(t) ~ t^(-beta/(nu*z))):
  - 2D Ising at Tc: beta/nu = 1/8 exactly (Onsager), z = 2.1665(12)
    [Nightingale & Bloete 2000] -> lambda = 0.0577(1).
  - 3D Ising at Tc: beta/nu = 0.5181(3), z = 2.0245(15) -> 0.2559(9).
  - q=6 clock / XY in the BKT (massless) phase: power-law decay with a
    temperature-dependent exponent eta(T)/(2z); no single literature
    number, so we just report the fitted slope and its drift (the
    check is that decay IS a clean power law: local-slope drift small
    over the fit decade).

Usage: python scripts/analyze_ner.py data/production/foo.dat [--tmin A --tmax B]
"""

from __future__ import annotations

import argparse
import math
import sys


def read_dat(path):
    header = {}
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line.startswith("#"):
                body = line[1:].strip()
                if ":" in body:
                    k, v = body.split(":", 1)
                    header[k.strip()] = v.strip()
                continue
            rows.append([float(x) for x in line.split()])
    return header, rows


def fit_loglog(ts, ms):
    """Least-squares slope of log m vs log t, plus endpoint local slopes."""
    xs = [math.log(t) for t in ts]
    ys = [math.log(m) for m in ms]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    # rms residual of the fit, in log space
    rms = math.sqrt(
        sum((y - slope * x - intercept) ** 2 for x, y in zip(xs, ys)) / n
    )
    # local slope over the first and last quarter (power-law drift check)
    q = max(2, n // 4)

    def local(lo, hi):
        xs_, ys_ = xs[lo:hi], ys[lo:hi]
        m_ = len(xs_)
        sx_, sy_ = sum(xs_), sum(ys_)
        sxx_ = sum(x * x for x in xs_)
        sxy_ = sum(x * y for x, y in zip(xs_, ys_))
        return (m_ * sxy_ - sx_ * sy_) / (m_ * sxx_ - sx_ * sx_)

    return slope, rms, local(0, q), local(n - q, n)


LIT = {
    # (model hint in filename, kbt match): (lambda_lit, note)
    "ising2d": (0.0577, "2D Ising Tc: (beta/nu)/z = 0.125/2.1665"),
    "ising3d": (0.2559, "3D Ising Tc: 0.5181/2.0245"),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("dat")
    ap.add_argument("--tmin", type=float, default=None)
    ap.add_argument("--tmax", type=float, default=None)
    ap.add_argument("--col", type=int, default=3,
                    help="0-based column of <m> (default 3: relaxation table)")
    args = ap.parse_args(argv)

    header, rows = read_dat(args.dat)
    if not rows:
        print(f"{args.dat}: no data rows", file=sys.stderr)
        return 1
    mcs = max(r[2] for r in rows)
    tmin = args.tmin if args.tmin is not None else max(5.0, mcs ** 0.5)
    tmax = args.tmax if args.tmax is not None else mcs
    sel = [(r[2], r[args.col]) for r in rows
           if tmin <= r[2] <= tmax and r[args.col] > 0]
    if len(sel) < 8:
        print(f"{args.dat}: <8 usable points in [{tmin}, {tmax}]",
              file=sys.stderr)
        return 1
    ts, ms = zip(*sel)
    slope, rms, early, late = fit_loglog(ts, ms)
    lam = -slope

    lit = None
    for k, v in LIT.items():
        if k in args.dat:
            lit = v
    print(f"# file: {args.dat}")
    for k in ("nx, ny", "nx, ny, nz", "sample", "mcs", "kbt"):
        if k in header:
            print(f"#   {k}: {header[k]}")
    print(f"# fit window: t in [{tmin:g}, {tmax:g}]  ({len(sel)} points)")
    print(f"effective_lambda {lam:.5f}")
    print(f"fit_rms_log {rms:.4f}")
    print(f"local_lambda_early {-early:.5f}")
    print(f"local_lambda_late {-late:.5f}")
    if lit:
        lam_lit, note = lit
        print(f"literature_lambda {lam_lit}  # {note}")
        print(f"rel_dev_vs_literature {abs(lam - lam_lit) / lam_lit:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
