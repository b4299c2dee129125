"""scripts/analyze_ner.py: log-log slope extraction from .dat tables."""

import math
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_recovers_exact_power_law(tmp_path):
    dat = tmp_path / "ising2d_fake.dat"
    lam = 0.0577
    lines = ["# nx, ny: 8 8", "# sample: 4", "# mcs: 1000",
             "# kbt: 2.269", "# method: Metropolis"]
    for t in range(1, 1001):
        m = 0.9 * t ** (-lam)
        lines.append(f"64 4 {t} {m} -1.4 {m * m} 2.0 0.1 0.2 0.3")
    dat.write_text("\n".join(lines) + "\n")

    out = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "analyze_ner.py"), str(dat)],
        capture_output=True, text=True, check=True)
    vals = {}
    for line in out.stdout.splitlines():
        if line.startswith("#"):
            continue
        parts = line.split()
        vals[parts[0]] = float(parts[1])
    assert math.isclose(vals["effective_lambda"], lam, rel_tol=1e-3)
    assert vals["fit_rms_log"] < 1e-6
    assert math.isclose(vals["literature_lambda"], 0.0577)
    assert vals["rel_dev_vs_literature"] < 2e-3


def test_refuses_empty_table(tmp_path):
    dat = tmp_path / "empty.dat"
    dat.write_text("# mcs: 10\n")
    out = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "analyze_ner.py"), str(dat)],
        capture_output=True, text=True)
    assert out.returncode == 1
    assert "no data rows" in out.stderr
