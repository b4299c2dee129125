"""IO layer unit tests: g0 formatting, header block, registry."""

import io
import json

import numpy as np

from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
from cuda_fortran_mc_simulation_spin_tpu.io import datfmt, registry


def test_g0_formats():
    assert datfmt.g0(64) == "64"
    assert datfmt.g0(np.int64(7)) == "7"
    assert datfmt.g0("Metropolis") == "Metropolis"
    assert datfmt.g0(True) == "T"
    # f64 round-trip
    v = 2.26918531421
    assert float(datfmt.g0(v)) == v
    v = -1.4142135623730951
    assert float(datfmt.g0(np.float64(v))) == v


def test_header_block():
    out = io.StringIO()
    datfmt.write_header(out, {"size": 64, "nx, ny": (8, 8), "kbt": 2.5})
    lines = out.getvalue().splitlines()
    assert lines[0] == "# size: 64"
    assert lines[1] == "# nx, ny: 8 8"
    assert lines[2] == "# kbt: 2.5"


def test_registry_roundtrip(tmp_path):
    log = tmp_path / "runs.log"
    cfg = RunConfig(model="clock", nx=8, ny=8, q=6)
    registry.append(str(log), cfg, 12.5, "out.dat", {"protocol": "x"})
    registry.append(str(log), cfg, 3.25, None)
    recs = [json.loads(line) for line in log.read_text().splitlines()]
    assert len(recs) == 2
    assert recs[0]["model"] == "clock"
    assert recs[0]["elapsed_sec"] == 12.5
    assert recs[0]["protocol"] == "x"
    assert recs[1]["output"] is None


def test_sample_series_rows():
    out = io.StringIO()
    series = {"mx": np.array([0.5, 0.25]), "e": np.array([-1.0, -2.0])}
    datfmt.write_sample_series(out, 64, 3, series, order=("mx", "e"))
    rows = out.getvalue().splitlines()
    assert rows[0].split() == ["64", "3", "1", "0.5", "-1"]
    assert rows[1].split() == ["64", "3", "2", "0.25", "-2"]
