"""Protocol drivers + IO: output format, checkpoint/resume, CLI."""

import io
import subprocess
import sys

import numpy as np
import pytest

from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
from cuda_fortran_mc_simulation_spin_tpu.engine import protocols


def _parse_table(text):
    rows = [
        [float(x) for x in line.split()]
        for line in text.splitlines()
        if line and not line.startswith("#")
    ]
    return np.array(rows)


def test_relaxation_output_format():
    cfg = RunConfig(model="ising2d", nx=8, ny=8, kbt=2.5, mcs=4,
                    tot_sample=3, use_pallas=False)
    out, err = io.StringIO(), io.StringIO()
    protocols.run_relaxation(cfg, out, err)
    text = out.getvalue()
    assert "# size: 64" in text
    assert "# kbt: 2.5" in text
    table = _parse_table(text)
    assert table.shape == (4, 10)
    np.testing.assert_array_equal(table[:, 0], 64)   # N
    np.testing.assert_array_equal(table[:, 1], 3)    # Nsample
    np.testing.assert_array_equal(table[:, 2], [1, 2, 3, 4])  # t
    assert "Sample: 3 / 3" in err.getvalue()


def test_relaxation_specific_times():
    cfg = RunConfig(model="ising2d", nx=8, ny=8, kbt=2.5, mcs=10,
                    tot_sample=2, measure_times=(1, 5, 10),
                    use_pallas=False)
    out = io.StringIO()
    protocols.run_relaxation(cfg, out, io.StringIO())
    table = _parse_table(out.getvalue())
    assert table.shape == (3, 10)
    np.testing.assert_array_equal(table[:, 2], [1, 5, 10])


def test_from_disorder_specific_times():
    cfg = RunConfig(model="xy2d", nx=8, ny=8, kbt=0.89, mcs=10,
                    tot_sample=2, measure_times=(2, 5, 10),
                    use_pallas=False)
    out = io.StringIO()
    protocols.run_from_disorder(cfg, out, io.StringIO())
    table = _parse_table(out.getvalue())
    assert table.shape == (3, 16)
    np.testing.assert_array_equal(table[:, 2], [2, 5, 10])


def test_samples_specific_times():
    cfg = RunConfig(model="xy2d", nx=8, ny=8, kbt=0.89, mcs=10,
                    tot_sample=1, init_state="random",
                    measure_times=(3, 7), use_pallas=False)
    out = io.StringIO()
    protocols.run_samples(cfg, out, io.StringIO())
    table = _parse_table(out.getvalue())
    assert table.shape == (2, 7)
    np.testing.assert_array_equal(table[:, 2], [3, 7])


def test_from_disorder_output():
    cfg = RunConfig(model="xy2d", nx=8, ny=8, kbt=0.89, mcs=3,
                    tot_sample=2, init_state="random", use_pallas=False)
    out = io.StringIO()
    protocols.run_from_disorder(cfg, out, io.StringIO())
    text = out.getvalue()
    assert "<|m|>" in text
    table = _parse_table(text)
    assert table.shape == (3, 16)
    # A(t) ≤ 1 and decays from ~1
    assert np.all(table[:, 9] <= 1.0 + 1e-6)


def test_samples_generic_models():
    """The samples protocol must work for non-XY models (raw m/e rows),
    not crash with an AttributeError."""
    cfg = RunConfig(model="ising2d", nx=8, ny=8, kbt=2.5, mcs=3,
                    tot_sample=2, use_pallas=False)
    out = io.StringIO()
    protocols.run_samples(cfg, out, io.StringIO())
    table = _parse_table(out.getvalue())
    assert table.shape == (6, 5)        # N, sample, t, m, e
    np.testing.assert_array_equal(table[:, 1], [1, 1, 1, 2, 2, 2])

    cfg = RunConfig(model="clock", nx=8, ny=8, q=6, kbt=0.91, mcs=2,
                    tot_sample=1, use_pallas=False)
    out = io.StringIO()
    protocols.run_samples(cfg, out, io.StringIO())
    table = _parse_table(out.getvalue())
    assert table.shape == (2, 6)        # N, sample, t, m, e, my


def test_samples_generic_rejects_xy_only_prep():
    cfg = RunConfig(model="ising2d", nx=8, ny=8, kbt=2.5, mcs=2,
                    tot_sample=1, init_state="finite_magne",
                    use_pallas=False)
    with pytest.raises(ValueError, match="periodic XY engine"):
        protocols.run_samples(cfg, io.StringIO(), io.StringIO())


def test_from_disorder_correlation_columns():
    cfg = RunConfig(model="xy2d", nx=8, ny=8, kbt=0.89, mcs=3,
                    tot_sample=2, init_state="random",
                    track_correlation=True, use_pallas=False)
    out = io.StringIO()
    protocols.run_from_disorder(cfg, out, io.StringIO())
    text = out.getvalue()
    assert "<corr>" in text and "<corr^2>" in text
    table = _parse_table(text)
    assert table.shape == (3, 18)       # 16 standard + corr, corr^2
    assert np.all(np.isfinite(table[:, 16:]))
    # <corr^2> >= <corr>^2 (Jensen)
    assert np.all(table[:, 17] >= table[:, 16] ** 2 - 1e-12)


def test_over_relaxation_header_parity():
    """OR runs keep `# method: Metropolis` and emit the separate schedule
    fields, matching /root/reference/app/xy2d_gpu_over_relaxation.f90:
    35-37."""
    cfg = RunConfig(model="xy2d", nx=8, ny=8, kbt=0.89, mcs=3,
                    tot_sample=1, n_over_relax=1, mcs_over_relax=2,
                    use_pallas=False)
    out = io.StringIO()
    protocols.run_relaxation(cfg, out, io.StringIO())
    text = out.getvalue()
    assert "# method: Metropolis\n" in text
    assert "# mcs_over_relax: 2" in text
    assert "# n_over_relax: 1" in text
    assert "OverRelaxation" not in text


def test_fix1mcs_runs():
    cfg = RunConfig(model="xy2d", nx=8, ny=8, kbt=0.89, mcs=3,
                    tot_sample=1, rotate_after_first_mcs=True,
                    use_pallas=False)
    out = io.StringIO()
    protocols.run_from_disorder(cfg, out, io.StringIO())
    assert _parse_table(out.getvalue()).shape == (3, 16)


def test_finite_magne_output():
    cfg = RunConfig(model="xy2d", nx=16, ny=16, kbt=0.89, mcs=3,
                    tot_sample=2, init_magne=0.3, use_pallas=False)
    out = io.StringIO()
    protocols.run_finite_magne(cfg, out, io.StringIO())
    table = _parse_table(out.getvalue())
    assert table.shape == (3, 14)


def test_finite_magne_samples_output():
    cfg = RunConfig(model="xy2d", nx=16, ny=16, kbt=0.89, mcs=3,
                    tot_sample=2, init_magne=0.3, use_pallas=False)
    out = io.StringIO()
    protocols.run_finite_magne_samples(cfg, out, io.StringIO())
    text = out.getvalue()
    # the reference's literal column-header line incl. its typo
    # (/root/reference/app/xy2d_periodic_gpu_relaxation_from_disorder_
    # finite_magne_samples.f90:40)
    assert "# N, smaple, time, m_x, e, m_y, A" in text
    table = _parse_table(text)
    # rows: samples × mcs, cols: N, sample, t, mx, e, my, A
    assert table.shape == (6, 7)
    np.testing.assert_array_equal(table[:, 1], [1, 1, 1, 2, 2, 2])


def test_mesh_relaxation_protocol():
    """Domain-sharded relaxation through the protocol layer on the
    8-device virtual mesh."""
    import jax

    if len(jax.devices()) < 8:
        import pytest as _pytest
        _pytest.skip("needs 8 virtual devices")
    cfg = RunConfig(model="ising2d", nx=16, ny=16, kbt=2.26918531421,
                    mcs=4, tot_sample=4, replicas=2,
                    mesh_dp=2, mesh_y=4, use_pallas=False)
    out = io.StringIO()
    protocols.run_relaxation(cfg, out, io.StringIO())
    table = _parse_table(out.getvalue())
    assert table.shape == (4, 10)
    np.testing.assert_array_equal(table[:, 1], 4)  # Nsample
    assert np.all(np.isfinite(table[:, 3:]))


def test_mesh_2d_relaxation_protocol():
    """(dx, dy) decomposition through the protocol layer: --mesh 1,2,2."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = RunConfig(model="ising2d", nx=512, ny=16, kbt=2.26918531421,
                    mcs=3, tot_sample=2, replicas=2,
                    mesh_dp=1, mesh_y=2, mesh_x=2, use_pallas=False)
    out = io.StringIO()
    protocols.run_relaxation(cfg, out, io.StringIO())
    table = _parse_table(out.getvalue())
    assert table.shape == (3, 10)
    assert np.all(np.isfinite(table))


def test_mesh_from_disorder_protocol():
    """from_disorder (the reference's richest protocol) under --mesh:
    sweeps in shard_map, prep/rotation/measurement global — output format
    identical to the single-device run and A(t) behaves."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = RunConfig(model="xy2d", nx=16, ny=16, kbt=0.89, mcs=3,
                    tot_sample=4, init_state="random", replicas=2,
                    mesh_dp=2, mesh_y=4, use_pallas=False)
    out = io.StringIO()
    protocols.run_from_disorder(cfg, out, io.StringIO())
    table = _parse_table(out.getvalue())
    assert table.shape == (3, 16)
    assert np.all(table[:, 9] <= 1.0 + 1e-6)      # <A> bounded
    assert np.all(np.isfinite(table))


def test_mesh_2d_from_disorder_protocol():
    """from_disorder on the (dx, dy) mesh: sweeps in shard_map with row
    AND column halos, prep/rotation/measurement global."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = RunConfig(model="xy2d", nx=512, ny=16, kbt=0.89, mcs=2,
                    tot_sample=2, init_state="random", replicas=2,
                    mesh_dp=2, mesh_y=2, mesh_x=2, use_pallas=False)
    out = io.StringIO()
    protocols.run_from_disorder(cfg, out, io.StringIO())
    table = _parse_table(out.getvalue())
    assert table.shape == (2, 16)
    assert np.all(np.isfinite(table))
    assert np.all(table[:, 9] <= 1.0 + 1e-6)


def test_mesh_fix1mcs_and_finite_magne():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = RunConfig(model="xy2d", nx=16, ny=16, kbt=0.89, mcs=2,
                    tot_sample=2, rotate_after_first_mcs=True,
                    replicas=2, mesh_dp=1, mesh_y=4, use_pallas=False)
    out = io.StringIO()
    protocols.run_from_disorder(cfg, out, io.StringIO())
    assert _parse_table(out.getvalue()).shape == (2, 16)

    cfg = RunConfig(model="xy2d", nx=16, ny=16, kbt=0.89, mcs=2,
                    tot_sample=2, init_magne=0.3, replicas=2,
                    mesh_dp=1, mesh_y=4, use_pallas=False)
    out = io.StringIO()
    protocols.run_finite_magne(cfg, out, io.StringIO())
    assert _parse_table(out.getvalue()).shape == (2, 14)


def test_mesh_over_relaxation_protocol():
    """OR schedule under --mesh (was: ValueError) — energy must be
    conserved by the OR sweeps themselves, checked via the relaxation
    protocol completing with finite outputs."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = RunConfig(model="xy2d", nx=16, ny=16, kbt=0.89, mcs=3,
                    tot_sample=2, n_over_relax=1, mcs_over_relax=2,
                    replicas=2, mesh_dp=2, mesh_y=4, use_pallas=False)
    out = io.StringIO()
    protocols.run_relaxation(cfg, out, io.StringIO())
    table = _parse_table(out.getvalue())
    assert table.shape == (3, 10)
    assert np.all(np.isfinite(table))


def test_mesh_sharded_or_conserves_energy():
    """The halo-exchanged OR sweep is microcanonical: energy of a state
    is unchanged (to f32 tolerance) by over-relaxation on the mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from cuda_fortran_mc_simulation_spin_tpu.core import rng
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.parallel import (
        domain,
        mesh as mesh_mod,
    )

    model = XY2D(nx=16, ny=16, kbt=0.89, backend="jnp")
    msh = mesh_mod.make_mesh(1, 4)
    state = domain.replicated_init(model, msh, 2, "random",
                                   rng.base_key(0))
    sweep = domain._make_local_step(model, msh, n_over_relax=2,
                                    with_obs=False)
    e0 = [float(model.energy_sum(jax.tree.map(lambda x: x[r], state)))
          for r in range(2)]
    # OR-only effect: run with a frozen Metropolis by taking the energy
    # after a full (metropolis+OR) step and comparing to a pure
    # metropolis step from the same state/key
    step_or = jax.jit(lambda s, k: sweep(s, k, True))
    step_plain = jax.jit(lambda s, k: domain._make_local_step(
        model, msh, n_over_relax=2, with_obs=False)(s, k, False))
    key = rng.base_key(1)
    st_or = jax.device_get(step_or(state, key))
    st_plain = jax.device_get(step_plain(state, key))
    for r in range(2):
        e_or = float(model.energy_sum(
            jax.tree.map(lambda x: x[r], st_or)))
        e_plain = float(model.energy_sum(
            jax.tree.map(lambda x: x[r], st_plain)))
        # the Metropolis part is identical (same key); OR must not move
        # the energy beyond f32 rounding
        assert e_or == pytest.approx(e_plain, abs=2e-2)
    assert e0  # states were non-degenerate


def test_checkpoint_resume_exact(tmp_path):
    """Interrupted run + resume must equal an uninterrupted run exactly
    (counter-based streams make this bitwise)."""
    ck = str(tmp_path / "ck.npz")
    cfg = RunConfig(model="ising2d", nx=8, ny=8, kbt=2.5, mcs=4,
                    tot_sample=6, use_pallas=False)

    out_full = io.StringIO()
    protocols.run_relaxation(cfg, out_full, io.StringIO())

    # partial run: stop after 3 samples by checkpointing every sample and
    # truncating via a 3-sample config first... simpler: run 3-sample
    # config into the checkpoint, then resume the 6-sample config from it
    # (fingerprint must match, so write the checkpoint with the 6-sample
    # config via the internal API).
    from cuda_fortran_mc_simulation_spin_tpu.core import rng, stats
    from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sw
    from cuda_fortran_mc_simulation_spin_tpu.io import checkpoint
    from cuda_fortran_mc_simulation_spin_tpu.models import build_model
    import jax

    model = build_model(cfg)
    op = stats.VarianceCovarianceKahan((cfg.mcs,))
    runner = jax.jit(sw.make_sample_runner(model, cfg.mcs, "allup"))
    base = rng.base_key(cfg.seed, cfg.stream)
    for s in range(3):
        series = jax.device_get(runner(rng.sample_key(base, s)))
        op.add_data(np.asarray(series["m"], np.float64),
                    np.asarray(series["e"], np.float64))
    checkpoint.save(ck, cfg, 3, {"op": op})

    out_resumed = io.StringIO()
    err = io.StringIO()
    protocols.run_relaxation(cfg, out_resumed, err, checkpoint_path=ck)
    assert "# resumed at sample 3" in err.getvalue()
    t_full = _parse_table(out_full.getvalue())
    t_res = _parse_table(out_resumed.getvalue())
    np.testing.assert_array_equal(t_full, t_res)


def test_checkpoint_rejects_other_config(tmp_path):
    from cuda_fortran_mc_simulation_spin_tpu.core import stats
    from cuda_fortran_mc_simulation_spin_tpu.io import checkpoint

    cfg1 = RunConfig(model="ising2d", nx=8, ny=8, mcs=4, tot_sample=6)
    cfg2 = RunConfig(model="ising2d", nx=8, ny=8, mcs=4, tot_sample=6,
                     kbt=2.0)
    ck = str(tmp_path / "ck.npz")
    checkpoint.save(ck, cfg1, 2,
                    {"op": stats.VarianceCovarianceKahan((4,))})
    with pytest.raises(ValueError, match="different config"):
        checkpoint.load(ck, cfg2,
                        {"op": stats.VarianceCovarianceKahan((4,))})
    # scheduling fields (tot_sample, max_samples_this_run) are NOT part
    # of the physics fingerprint: extending a run resumes exactly
    cfg3 = RunConfig(model="ising2d", nx=8, ny=8, mcs=4, tot_sample=8)
    assert checkpoint.load(
        ck, cfg3, {"op": stats.VarianceCovarianceKahan((4,))}) == 2


def test_max_samples_this_run_two_stage_bitwise(tmp_path):
    """A run time-sliced with --max-samples-this-run, resumed with the
    same command, equals the uninterrupted run bitwise."""
    ck = str(tmp_path / "ck.npz")
    cfg_full = RunConfig(model="ising2d", nx=8, ny=8, kbt=2.5, mcs=4,
                         tot_sample=6, use_pallas=False)
    out_full = io.StringIO()
    protocols.run_relaxation(cfg_full, out_full, io.StringIO())

    cfg_slice = RunConfig(model="ising2d", nx=8, ny=8, kbt=2.5, mcs=4,
                          tot_sample=6, use_pallas=False,
                          max_samples_this_run=2)
    err1 = io.StringIO()
    protocols.run_relaxation(cfg_slice, io.StringIO(), err1,
                             checkpoint_path=ck)
    assert "stopping after 2 samples this run" in err1.getvalue()
    err2 = io.StringIO()
    protocols.run_relaxation(cfg_slice, io.StringIO(), err2,
                             checkpoint_path=ck)
    assert "# resumed at sample 2" in err2.getvalue()
    assert "stopping after 2 samples this run" in err2.getvalue()
    out3 = io.StringIO()
    err3 = io.StringIO()
    protocols.run_relaxation(cfg_full, out3, err3, checkpoint_path=ck)
    assert "# resumed at sample 4" in err3.getvalue()
    np.testing.assert_array_equal(
        _parse_table(out_full.getvalue()),
        _parse_table(out3.getvalue()))


def test_engine_stamp_in_output_and_stderr():
    """Every run stamps which engine produced the data — the analog of
    the reference's print_version data-file stamping
    (/root/reference/src/clock/clock_tableall_gpu_m.f90:47-50)."""
    cfg = RunConfig(model="ising2d", nx=8, ny=8, kbt=2.5, mcs=3,
                    tot_sample=2, use_pallas=False)
    out, err = io.StringIO(), io.StringIO()
    protocols.run_relaxation(cfg, out, err)
    assert "# engine: " in out.getvalue()
    assert "# engine: " in err.getvalue()
    assert protocols.LAST_ENGINE

    cfg_fd = RunConfig(model="xy2d", nx=8, ny=8, kbt=0.9, mcs=2,
                       tot_sample=2, replicas=2, use_pallas=False)
    out2, err2 = io.StringIO(), io.StringIO()
    protocols.run_from_disorder(cfg_fd, out2, err2)
    assert "# engine: XY disorder phase engine (batched)" \
        in out2.getvalue()


def test_max_samples_this_run_from_disorder_bitwise(tmp_path):
    """The disorder protocols honor --max-samples-this-run too
    (time-sliced production of the 1500^2 x 1e5-MCS from-disorder
    flagship): sliced + resumed == uninterrupted, bitwise."""
    ck = str(tmp_path / "ck.npz")
    kw = dict(model="xy2d", nx=8, ny=8, kbt=0.9, mcs=3, tot_sample=4,
              use_pallas=False)
    out_full = io.StringIO()
    protocols.run_from_disorder(RunConfig(**kw), out_full, io.StringIO())

    cfg_slice = RunConfig(**kw, max_samples_this_run=2)
    err1 = io.StringIO()
    protocols.run_from_disorder(cfg_slice, io.StringIO(), err1,
                                checkpoint_path=ck)
    assert "stopping after 2 samples this run" in err1.getvalue()
    out2 = io.StringIO()
    err2 = io.StringIO()
    protocols.run_from_disorder(cfg_slice, out2, err2,
                                checkpoint_path=ck)
    assert "# resumed at sample 2" in err2.getvalue()
    np.testing.assert_array_equal(
        _parse_table(out_full.getvalue()),
        _parse_table(out2.getvalue()))
    with pytest.raises(ValueError, match="needs --checkpoint"):
        protocols.run_from_disorder(cfg_slice, io.StringIO(),
                                    io.StringIO())


def test_cli_end_to_end(tmp_path):
    out_file = tmp_path / "run.dat"
    reg = tmp_path / "runs.log"
    cmd = [
        sys.executable, "-m", "cuda_fortran_mc_simulation_spin_tpu.runs",
        "--model", "clock", "--nx", "8", "--ny", "8", "--q", "6",
        "--kbt", "0.91", "--mcs", "3", "--samples", "2",
        "--backend", "jnp",
        "--output", str(out_file), "--registry", str(reg),
    ]
    import os
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon TPU plugin's sitecustomize (on PYTHONPATH) force-registers
    # itself and overrides jax_platforms; keep the subprocess on pure CPU
    env["PYTHONPATH"] = "/root/repo"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    table = _parse_table(out_file.read_text())
    assert table.shape == (3, 10)
    assert "Sample: 2 / 2" in r.stderr
    import json
    rec = json.loads(reg.read_text().splitlines()[0])
    assert rec["model"] == "clock" and rec["protocol"] == "relaxation"
