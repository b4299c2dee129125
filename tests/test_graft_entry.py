"""Driver entry points must stay importable/compilable."""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    state, obs = jax.jit(fn)(*args)
    assert set(obs) == {"m", "e"}
    assert float(obs["m"]) <= 1.0


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.multichip
@pytest.mark.parametrize("n", [1, 2, 4, 6, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)


def test_bench_json(tmp_path):
    import json
    import subprocess
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        cwd="/root/repo", env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
