"""NER protocol drivers — the reference's app/*.f90 layer.

Each function runs one complete experiment from a RunConfig: per-sample
initial-state preparation, the jitted sweep/measure scan, host-side Kahan
aggregation, and the reference-format .dat emission on ``out`` with
progress on ``err`` (stdout = dataset, stderr = progress — the
reference's channel convention, SURVEY.md §5.5).

Protocol ↔ reference app map:

- relaxation             → {ising2d,ising3d,clock,clock_multi,xy2d}
                           _gpu_relaxation (ordered start, m/e var-cov)
- over_relaxation        → xy2d_*_over_relaxation (Metropolis + OR mix)
- from_disorder          → xy2d_periodic_gpu_relaxation_from_disorder
                           (+_fix1mcs via cfg.rotate_after_first_mcs)
- finite_magne           → ..._from_disorder_finite_magne
- finite_magne_samples   → ..._finite_magne_samples (raw per-sample rows)
- specific-times         → the missing *_specific_times apps'
                           `bin` schedule via cfg.measure_times

Checkpoint/resume: pass ``checkpoint_path`` — accumulators are saved
every ``checkpoint_every`` histories and runs resume exactly
(io/checkpoint.py).
"""

from __future__ import annotations

import functools
import os
import sys
import time
from typing import IO

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cuda_fortran_mc_simulation_spin_tpu.config import RunConfig
from cuda_fortran_mc_simulation_spin_tpu.core import rng, stats
from cuda_fortran_mc_simulation_spin_tpu.engine import sweep as sweep_mod
from cuda_fortran_mc_simulation_spin_tpu.io import checkpoint, datfmt
from cuda_fortran_mc_simulation_spin_tpu.models import build_model


def _header_fields(cfg: RunConfig, model, extra: dict | None = None
                   ) -> dict:
    fields = {
        "size": model.nsites,
        "nx, ny": (cfg.nx, cfg.ny) if cfg.model != "ising3d"
        else (cfg.nx, cfg.ny, cfg.nz),
        "sample": cfg.tot_sample,
        "mcs": cfg.mcs,
        "kbt": cfg.kbt,
        "initial seed": cfg.seed,
        "n_skip": cfg.stream,
    }
    if cfg.n_over_relax > 0:
        # match the reference OR app headers: separate schedule fields,
        # method stays "Metropolis"
        # (/root/reference/app/xy2d_gpu_over_relaxation.f90:35-37)
        fields["mcs_over_relax"] = cfg.mcs_over_relax or cfg.mcs
        fields["n_over_relax"] = cfg.n_over_relax
    fields["method"] = "Metropolis"
    if extra:
        fields.update(extra)
    return fields


def _emit_headers(cfg, model, out, err, extra=None):
    datfmt.write_header(out, _header_fields(cfg, model, extra))
    datfmt.write_header(err, _header_fields(cfg, model, extra))


def _progress(err: IO[str], tot: int):
    def cb(done, total):
        err.write(f"Sample: {done} / {total}\n")
        err.flush()
    return cb


def _filter_times(series: dict, cfg: RunConfig) -> dict:
    """Apply the specific-times observable schedule (`bin` protocol,
    /root/reference/scripts/fpm_run_ising3d_relaxations_specific_times.sh:
    11,36): keep only rows at cfg.measure_times (1-based)."""
    if cfg.measure_times is None:
        return series
    idx = np.asarray(cfg.measure_times, dtype=np.int64) - 1
    return {k: np.take(v, idx, axis=-1) for k, v in series.items()}


def _series_len(cfg: RunConfig) -> int:
    return (len(cfg.measure_times) if cfg.measure_times is not None
            else cfg.mcs)


def _multisweep_eligible(cfg, model, runner_kwargs) -> bool:
    """Use the VMEM-resident multi-sweep kernel when the run is a plain
    Ising2D/clock m/e relaxation on a lattice that fits VMEM."""
    if cfg.model not in ("ising2d", "clock") or runner_kwargs:
        return False
    try:
        # helical engines have no Pallas backend (no resolved_backend)
        if getattr(model, "resolved_backend", "jnp") != "pallas":
            return False
    except ValueError:
        return False
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_multisweep
    ny, half = model.color_shape
    return ising2d_multisweep.fits_vmem(ny, half)


def _multispin_eligible(cfg, model, runner_kwargs) -> bool:
    """Use the bit-packed multispin kernel for plain Ising2D m/e
    relaxations on packable shapes (ny % 256 == 0, nx % 256 == 0) —
    ~2.6× the int8 engines at 8192² and the only fused-measurement
    path above the VMEM-multisweep size cap."""
    if cfg.model not in ("ising2d", "ising3d") or runner_kwargs:
        return False
    try:
        if getattr(model, "resolved_backend", "jnp") != "pallas":
            return False
    except ValueError:
        return False
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_multispin
    if cfg.model == "ising3d":
        if model.nsites > ising2d_multispin.OBS_INT32_MAX_SITES:
            # fused int32 (m, e) accumulators would wrap — int8 f32
            # path (no committed 3-D workload comes near this)
            return False
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            ising3d_multispin,
        )
        _, ny, half = model.color_shape
        return ising3d_multispin.packable3d(ny, half)
    # 2-D lattices beyond the int32 cap route to per-tile exact
    # partials reduced in f32 (sweep_measure_packed tiled mode)
    ny, half = model.color_shape
    return ising2d_multispin.packable(ny, half)


def _clock_multispin_eligible(cfg, model, runner_kwargs) -> bool:
    """Use the bit-sliced packed q=6 clock engine
    (ops/clock_multispin.py) for plain clock m/e relaxations on
    packable shapes — attacks the reference's largest production
    workload (clock 2000²-class × 10⁵ MCS × 5000 samples)."""
    if cfg.model != "clock" or runner_kwargs:
        return False
    if os.environ.get("SPINLAT_CLOCK_PACKED") == "0":
        return False
    if jax.default_backend() in ("cpu", "gpu"):
        return False
    if getattr(model, "backend", "auto") == "jnp":
        return False        # --use-pallas false opts out of kernels
    from cuda_fortran_mc_simulation_spin_tpu.ops import clock_multispin
    # aligned shapes take the fused-obs kernel; other even shapes (the
    # literal 2000x2000 / 1000x1000 committed geometries) the padded
    # engine (same kernel on padded planes + masked observables)
    if clock_multispin.clock_packable(model) \
            or clock_multispin.clock_padded_packable(model):
        return True
    from cuda_fortran_mc_simulation_spin_tpu.ops import clock4_multispin
    if (clock4_multispin.clock4_packable(model)
            or clock4_multispin.clock4_padded_packable(model)):
        return True
    from cuda_fortran_mc_simulation_spin_tpu.ops import clock3_multispin
    return (clock3_multispin.clock3_packable(model)
            or clock3_multispin.clock3_padded_packable(model))


def _wrap_runner(runner, batch):
    """Jit the runner (unless it is a host-chunked dispatch loop, which
    must not be re-jitted into one program) and squeeze the replica
    axis for batch-1 runs."""
    chunked = getattr(runner, "host_chunked", False)
    engine = getattr(runner, "engine", None)
    if not chunked:
        runner = jax.jit(runner)
    if batch == 1:
        inner = runner
        squeezed = lambda k: jax.tree.map(  # noqa: E731
            lambda v: v[0], inner(k))
        runner = squeezed if chunked else jax.jit(squeezed)
    if engine is not None:
        try:
            runner.engine = engine
        except AttributeError:
            pass  # jitted callables accept attributes; belt-and-braces
    return runner


# engine stamped on the most recent run — the analog of the reference's
# `print_version` data-file stamping (/root/reference/src/clock/
# clock_tableall_gpu_m.f90:47-50); emitted as a `# engine:` stderr line
# and a registry field by runs/__main__.py
LAST_ENGINE: str | None = None


def _stamp_engine(runner, err, default: str) -> None:
    global LAST_ENGINE
    LAST_ENGINE = getattr(runner, "engine", default)
    err.write(f"# engine: {LAST_ENGINE}\n")


def _ensemble_loop(cfg, runner, fold, err, accs, base, batch, start,
                   checkpoint_path, checkpoint_every):
    """The shared sample loop: run batches keyed by the global call
    index, fold into accumulators, checkpoint on cadence, and honor the
    --max-samples-this-run time-slice budget (checkpoint + clean stop;
    the next invocation with the same physics config resumes)."""
    progress = _progress(err, cfg.tot_sample)
    budget = cfg.max_samples_this_run
    if budget and not checkpoint_path:
        raise ValueError(
            "max_samples_this_run needs --checkpoint (the next "
            "invocation resumes from it)")
    done = start
    for call in range(start // batch, cfg.tot_sample // batch):
        series = jax.device_get(runner(rng.sample_key(base, call)))
        series = {k: np.asarray(v, np.float64) for k, v in series.items()}
        fold(_filter_times(series, cfg))
        done = (call + 1) * batch
        progress(done, cfg.tot_sample)
        if (checkpoint_path and checkpoint_every
                and done % checkpoint_every == 0):
            checkpoint.save(checkpoint_path, cfg, done, accs)
        if budget and done - start >= budget and done < cfg.tot_sample:
            err.write(f"# stopping after {done - start} samples this "
                      f"run ({done} / {cfg.tot_sample} total); resume "
                      "with the same command\n")
            break
    if checkpoint_path:
        checkpoint.save(checkpoint_path, cfg, done, accs)


def _run_accumulating(cfg, model, accumulators, fold, err,
                      checkpoint_path=None, checkpoint_every=0,
                      runner_kwargs=None):
    """Shared ensemble loop: batch runner + Kahan fold + checkpointing."""
    base = rng.base_key(cfg.seed, cfg.stream)
    batch = cfg.replicas * cfg.samples_per_call
    if cfg.tot_sample % max(batch, 1):
        raise ValueError("tot_sample must be divisible by the batch size")
    runner_kwargs = runner_kwargs or {}
    if cfg.mesh_dp * cfg.mesh_y * cfg.mesh_x > 1:
        # domain-sharded multi-chip execution (parallel/domain.py):
        # replicas over dp, lattice rows/planes over y
        from cuda_fortran_mc_simulation_spin_tpu.parallel import (
            domain,
            mesh as mesh_mod,
        )
        msh = mesh_mod.make_mesh(cfg.mesh_dp, cfg.mesh_y, cfg.mesh_x)
        runner = _wrap_runner(
            domain.make_sharded_sample_runner(
                model, msh, cfg.mcs, max(batch, 1), cfg.init_state,
                **runner_kwargs,
            ), batch)
    elif sweep_mod.helical_pallas_eligible(
            model, runner_kwargs.get("n_over_relax", 0)):
        # helical XY (and any budget-bound packed runner below)
        # dispatches per MCS chunk from the host (device execution
        # deadline) — _wrap_runner leaves those un-jitted
        runner = _wrap_runner(
            sweep_mod.make_helical_runner(
                model, cfg.mcs, max(batch, 1), cfg.init_state,
                **runner_kwargs,
            ), batch)
    elif _multispin_eligible(cfg, model, runner_kwargs):
        mk = (sweep_mod.make_multispin3d_runner
              if cfg.model == "ising3d"
              else sweep_mod.make_multispin_runner)
        runner = _wrap_runner(
            mk(model, cfg.mcs, max(batch, 1), cfg.init_state), batch)
    elif _clock_multispin_eligible(cfg, model, runner_kwargs):
        runner = _wrap_runner(
            sweep_mod.make_clock_multispin_runner(
                model, cfg.mcs, max(batch, 1), cfg.init_state
            ), batch)
    elif _multisweep_eligible(cfg, model, runner_kwargs):
        runner = _wrap_runner(
            sweep_mod.make_multisweep_runner(
                model, cfg.mcs, max(batch, 1), cfg.init_state
            ), batch)
    elif sweep_mod.xy_padded_eligible(model, runner_kwargs):
        runner = _wrap_runner(
            sweep_mod.make_xy_padded_runner(
                model, cfg.mcs, max(batch, 1), cfg.init_state,
                **runner_kwargs,
            ), batch)
    elif batch == 1:
        # already unbatched — bypass _wrap_runner's axis squeeze but
        # keep its rule: host-chunked dispatch loops must not be
        # re-jitted into one device program
        runner = sweep_mod.make_sample_runner(
            model, cfg.mcs, cfg.init_state, **runner_kwargs)
        if not getattr(runner, "host_chunked", False):
            eng = getattr(runner, "engine", None)
            runner = jax.jit(runner)
            if eng is not None:
                runner.engine = eng
    else:
        runner = _wrap_runner(
            sweep_mod.make_batch_runner(model, cfg.mcs, batch,
                                        cfg.init_state, **runner_kwargs),
            batch)

    _stamp_engine(
        runner, err,
        f"domain-sharded mesh ({cfg.mesh_dp},{cfg.mesh_y},{cfg.mesh_x})"
        if cfg.mesh_dp * cfg.mesh_y * cfg.mesh_x > 1
        else "phase engine")
    start = 0
    if checkpoint_path:
        try:
            done = checkpoint.load(checkpoint_path, cfg, accumulators)
            start = (done // batch) * batch
            err.write(f"# resumed at sample {done}\n")
        except FileNotFoundError:
            pass
    _ensemble_loop(cfg, runner, fold, err, accumulators, base, batch,
                   start, checkpoint_path, checkpoint_every)


# ---------------------------------------------------------------------------
# relaxation (+ over-relaxation mix): ordered/random start, m/e var-cov
# ---------------------------------------------------------------------------

def run_relaxation(cfg: RunConfig, out: IO[str] = sys.stdout,
                   err: IO[str] = sys.stderr,
                   checkpoint_path: str | None = None,
                   checkpoint_every: int = 0) -> stats.VarianceCovarianceKahan:
    """ising2d/ising3d/clock/xy2d *_relaxation and *_over_relaxation apps
    (/root/reference/app/ising2d_gpu_relaxation.f90:34-51,
    /root/reference/app/xy2d_gpu_over_relaxation.f90:40-49)."""
    model = build_model(cfg)
    _emit_headers(cfg, model, out, err)
    L = _series_len(cfg)
    op = stats.VarianceCovarianceKahan((L,))

    def fold(series):
        op.add_data(series["m"], series["e"])

    runner_kwargs = {}
    if cfg.n_over_relax > 0:
        runner_kwargs = dict(
            n_over_relax=cfg.n_over_relax,
            mcs_over_relax=cfg.mcs_over_relax or cfg.mcs,
        )
    t0 = time.time()
    _run_accumulating(cfg, model, {"op": op}, fold, err,
                      checkpoint_path, checkpoint_every, runner_kwargs)
    err.write(f"# elapsed: {time.time() - t0:.3f}s\n")
    out.write(f"# engine: {LAST_ENGINE}\n")
    if cfg.measure_times is None:
        datfmt.write_relaxation_table(out, model.nsites, cfg.mcs, op)
    else:
        _write_specific_times_table(out, model.nsites, cfg.measure_times,
                                    op)
    return op


def _write_specific_times_table(out, nall, times, op):
    n = op.num_sample()
    m1, m2 = op.mean1(), op.mean2()
    s1, s2 = op.square_mean1(), op.square_mean2()
    v1, v2, cv = op.var1(), op.var2(), op.cov()
    for j, t in enumerate(times):
        row = [nall, n, t, m1[j], m2[j], s1[j], s2[j],
               nall * v1[j], nall * v2[j], nall * cv[j]]
        out.write(" ".join(datfmt.g0(v) for v in row) + "\n")


# ---------------------------------------------------------------------------
# XY disorder protocols (autocorrelation-carrying runners)
# ---------------------------------------------------------------------------

def _xy_disorder_runner(model, cfg: RunConfig, prep: str):
    """run(sample_key) -> series dict with mx, my, e, A.

    prep: "rotate_first"  — random start, rotate to x-axis, snapshot
          (from_disorder, /root/reference/app/
          xy2d_periodic_gpu_relaxation_from_disorder.f90:39-41);
          "fix1mcs"       — random start, snapshot, rotate spins AND
          snapshot after the first MCS (:48 of the fix1mcs app);
          "finite_magne"  — prep_finite_magne(cfg.init_magne), snapshot;
          "small_magne" / "near_magne" — threshold-driven preps.
    """
    mcs = cfg.mcs
    n_inv = 1.0 / model.nsites
    n_or = cfg.n_over_relax
    mcs_or = cfg.mcs_over_relax or mcs

    def run(sample_key: jax.Array) -> dict[str, jax.Array]:
        k_init = rng.init_key(sample_key)
        if prep == "rotate_first":
            state = model.init_state("random", k_init)
            state = model.rotate_magne_toward_xaxis(state)
        elif prep == "fix1mcs":
            state = model.init_state("random", k_init)
        elif prep == "finite_magne":
            state = model.prep_finite_magne(k_init, cfg.init_magne)
        elif prep == "small_magne":
            state = model.prep_small_magne(k_init, cfg.init_magne)
        elif prep == "near_magne":
            state = model.prep_small_magne(k_init, cfg.init_magne,
                                           tol=cfg.near_magne_tol)
        else:
            raise ValueError(prep)
        snap = state

        def body(carry, t):
            state, snap = carry
            state = model.sweep(state, rng.sweep_key(sample_key, t))
            if prep == "fix1mcs":
                def rot(args):
                    s, sn = args
                    mx, my = model.magne_sums(s)
                    th = -jnp.arctan2(my, mx)
                    return model.rotate(s, th), model.rotate(sn, th)
                state, snap = lax.cond(t == 1, rot, lambda a: a,
                                       (state, snap))
            if n_or > 0:
                def do_or(s):
                    return lax.fori_loop(
                        0, n_or, lambda i, x: model.over_relax_sweep(x), s
                    )
                state = lax.cond(t <= mcs_or, do_or, lambda s: s, state)
            mx, my = model.magne_sums(state)
            obs = {
                "mx": mx * n_inv,
                "my": my * n_inv,
                "e": model.energy_sum(state) * n_inv,
                "A": model.autocorrelation_sum(state, snap) * n_inv,
            }
            if cfg.track_correlation:
                obs["corr"] = model.correlation_sum(state) * n_inv
            return (state, snap), obs

        _, series = lax.scan(body, (state, snap), jnp.arange(1, mcs + 1))
        return series

    return run


def _xy_init_for_prep(model, cfg: RunConfig, prep: str, key: jax.Array):
    """(state, snapshot) for one history under the given preparation."""
    if prep == "rotate_first":
        state = model.init_state("random", key)
        state = model.rotate_magne_toward_xaxis(state)
    elif prep == "fix1mcs":
        state = model.init_state("random", key)
    elif prep == "finite_magne":
        state = model.prep_finite_magne(key, cfg.init_magne)
    elif prep == "small_magne":
        state = model.prep_small_magne(key, cfg.init_magne)
    elif prep == "near_magne":
        state = model.prep_small_magne(key, cfg.init_magne,
                                       tol=cfg.near_magne_tol)
    else:
        raise ValueError(prep)
    return state, state


def _xy_disorder_batched_runner(model, cfg: RunConfig, prep: str,
                                batch: int):
    """run(call_key) -> series dicts (batch, mcs) for a replica batch.

    Sweeps go through model.sweep_batched (Pallas replica grid axis on
    TPU); preparation, rotations and measurement are pure jnp and vmap.
    """
    mcs = cfg.mcs
    n_inv = 1.0 / model.nsites
    n_or = cfg.n_over_relax
    mcs_or = cfg.mcs_over_relax or mcs
    use_fused = (model.resolved_backend == "pallas"
                 and not cfg.track_correlation)
    # with no OR schedule, measurement fuses INTO phase b (saves the
    # separate measurement kernel's full re-read of state+snapshot —
    # the protocol is HBM-bound); with OR, measure after the OR sweeps
    fuse_in_phase = use_fused and n_or == 0

    def measure_one(state, snap):
        mx, my = model.magne_sums(state)
        obs = {
            "mx": mx * n_inv,
            "my": my * n_inv,
            "e": model.energy_sum(state) * n_inv,
            "A": model.autocorrelation_sum(state, snap) * n_inv,
        }
        if cfg.track_correlation:
            obs["corr"] = model.correlation_sum(state) * n_inv
        return obs

    def measure_batch(state, snap):
        if use_fused:
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                xy2d_measure_pallas,
            )
            return xy2d_measure_pallas.measure(model, state, snap)
        return jax.vmap(measure_one)(state, snap)

    def rot_one(state, snap):
        mx, my = model.magne_sums(state)
        th = -jnp.arctan2(my, mx)
        return model.rotate(state, th), model.rotate(snap, th)

    def run(call_key: jax.Array) -> dict[str, jax.Array]:
        init_keys = jax.vmap(
            lambda r: jax.random.fold_in(rng.init_key(call_key), r)
        )(jnp.arange(batch))
        state, snap = jax.vmap(
            lambda k: _xy_init_for_prep(model, cfg, prep, k)
        )(init_keys)

        def body(carry, t):
            state, snap = carry
            if fuse_in_phase:
                from cuda_fortran_mc_simulation_spin_tpu.ops import (
                    xy2d_pallas,
                )
                state, obs = xy2d_pallas.sweep_measure(
                    model, state, snap, rng.sweep_key(call_key, t)
                )
                if prep == "fix1mcs":
                    # rotation applies after the first MCS; re-measure
                    # the rotated state so the t=1 row matches
                    def rot_and_remeasure(args):
                        state, snap, _ = args
                        state, snap = jax.vmap(rot_one)(state, snap)
                        return state, snap, measure_batch(state, snap)

                    state, snap, obs = lax.cond(
                        t == 1, rot_and_remeasure, lambda a: a,
                        (state, snap, obs),
                    )
                return (state, snap), obs
            state = model.sweep_batched(state, rng.sweep_key(call_key, t))
            if prep == "fix1mcs":
                state, snap = lax.cond(
                    t == 1,
                    lambda a: jax.vmap(rot_one)(*a),
                    lambda a: a,
                    (state, snap),
                )
            if n_or > 0:
                or_sweep = model.over_relax_sweep_batched

                def do_or(s):
                    return lax.fori_loop(
                        0, n_or, lambda i, x: or_sweep(x), s
                    )

                state = lax.cond(t <= mcs_or, do_or, lambda s: s, state)
            return (state, snap), measure_batch(state, snap)

        _, series = lax.scan(body, (state, snap), jnp.arange(1, mcs + 1))
        return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), series)

    return run


def _xy_multisweep_eligible(cfg: RunConfig, model, prep: str) -> bool:
    """Route to the VMEM-resident int16-angle multisweep kernel
    (ops/xy2d_multisweep.py) — OPT-IN via SPINLAT_XY_ANGLE_MS=1.

    Measured negative result (BENCHMARKS.md): the angle representation
    is transcendental-bound (~7.7×10⁹ site-updates/s at 1536²) and
    loses to the f32 phase kernels with fused in-phase measurement, so
    it is not the default despite its elegance (exact |S|=1, int16
    rotations, zero HBM lattice traffic)."""
    import os

    if os.environ.get("SPINLAT_XY_ANGLE_MS") != "1":
        return False
    if cfg.track_correlation or cfg.mesh_dp * cfg.mesh_y * cfg.mesh_x > 1:
        return False
    if cfg.n_over_relax > 0:
        # kernel applies OR on every sweep; partial schedules and the
        # fix1mcs+OR combination fall back to the f32 path
        full = cfg.mcs_over_relax in (0, cfg.mcs)
        if not full or prep == "fix1mcs":
            return False
    try:
        if model.resolved_backend != "pallas":
            return False
    except ValueError:
        return False
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_multisweep
    ny, half = model.color_shape
    return xy2d_multisweep.fits_vmem(ny, half) and ny % 16 == 0


def _xy_disorder_multisweep_runner(model, cfg: RunConfig, prep: str,
                                   batch: int, chunk: int = 64):
    """run(call_key) -> {mx, my, e, A: (batch, mcs)} on the VMEM int16-
    angle multisweep kernel: S sweeps + fused measurement per kernel
    invocation, the fast path for the reference's flagship 1500²-class
    from-disorder protocol
    (/root/reference/app/xy2d_periodic_gpu_relaxation_from_disorder
    .f90:9-15)."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        xy2d_multisweep as ms,
    )

    mcs = cfg.mcs
    fix1 = prep == "fix1mcs"
    n_or = cfg.n_over_relax
    n_inv = 1.0 / model.nsites

    def measure_t1(state, snap):
        mx, my = model.magne_sums(state)
        return {
            "mx": mx * n_inv,
            "my": my * n_inv,
            "e": model.energy_sum(state) * n_inv,
            "A": model.autocorrelation_sum(state, snap) * n_inv,
        }

    def rot_one(state, snap):
        mx, my = model.magne_sums(state)
        th = -jnp.arctan2(my, mx)
        return model.rotate(state, th), model.rotate(snap, th)

    def run(call_key: jax.Array) -> dict[str, jax.Array]:
        init_keys = jax.vmap(
            lambda r: jax.random.fold_in(rng.init_key(call_key), r)
        )(jnp.arange(batch))
        state, snap = jax.vmap(
            lambda k: _xy_init_for_prep(model, cfg, prep, k)
        )(init_keys)
        first = None
        t0 = 0
        if fix1:
            # sweep 1 + rotation + its measurement run on the f32 path;
            # the kernel takes over from t=2 on the rotated state
            state = model.sweep_batched(state, rng.sweep_key(call_key, 1))
            state, snap = jax.vmap(rot_one)(state, snap)
            first = jax.vmap(measure_t1)(state, snap)
            t0 = 1
        pa, pb = ms.state_to_angles(state)
        sa, sb = ms.state_to_angles(snap)
        remaining = mcs - t0
        c_sz = min(chunk, remaining)
        n_chunks = -(-remaining // c_sz)

        def body(carry, c):
            pa, pb = carry
            pa, pb, series = ms.multisweep(
                model, pa, pb, sa, sb, rng.sweep_key(call_key, c + 2),
                c_sz, n_or=n_or,
            )
            return (pa, pb), series

        _, series = lax.scan(body, (pa, pb), jnp.arange(n_chunks))
        out = {}
        for k, v in series.items():
            v = jnp.moveaxis(v, 0, 1).reshape(batch, n_chunks * c_sz)
            v = v[:, :remaining]
            if first is not None:
                v = jnp.concatenate([first[k][:, None], v], axis=1)
            out[k] = v
        return out

    return run


def _xy_resident_eligible(cfg: RunConfig, model, prep: str) -> bool:
    """Route to the VMEM-resident f32 multisweep (ops/xy2d_resident.py)
    — the default fast path for the from-disorder protocol family on
    lattices whose state + snapshot planes fit VMEM (incl. the literal
    1500² whose nx/2 = 750 fails the streaming kernels' lane tiling).
    Zero HBM lattice traffic between sweeps vs ~16 plane reads/MCS on
    the per-phase path (BENCHMARKS.md)."""
    if os.environ.get("SPINLAT_XY_RESIDENT") == "0":
        return False
    if os.environ.get("SPINLAT_XY_ANGLE_MS") == "1":
        return False        # explicit A/B opt-in for the angle engine
    if jax.default_backend() in ("cpu", "gpu"):
        return False
    if getattr(model, "backend", "auto") == "jnp":
        return False
    if cfg.track_correlation or cfg.n_over_relax > 0:
        return False
    if max(cfg.replicas, 1) > 1:
        # the replica grid axis double-buffers the whole resident
        # plane set across grid steps — R=2 at 1500² exceeded scoped
        # VMEM (121M > 110M, measured r4b); samples run sequentially
        return False
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_resident
    return xy2d_resident.fits(model, snapshot=True)


def _xy_disorder_resident_runner(model, cfg: RunConfig, prep: str,
                                 batch: int, chunk: int = 64):
    """run(call_key) -> {mx, my, e, A: (batch, mcs)} on the VMEM-
    resident f32 multisweep: state + t=0 snapshot live in VMEM for
    ``chunk`` MCS per kernel invocation with per-sweep fused
    (mx, my, e, A) — the engine for the reference's 1500² × 10⁵ MCS
    from-disorder workload (/root/reference/app/
    xy2d_periodic_gpu_relaxation_from_disorder.f90:9-15,39-61)."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        xy2d_resident as xr,
    )

    mcs = cfg.mcs
    fix1 = prep == "fix1mcs"
    half = model.nx // 2
    n_inv = 1.0 / model.nsites

    def measure_t1(state, snap):
        mx, my = model.magne_sums(state)
        return {
            "mx": mx * n_inv,
            "my": my * n_inv,
            "e": model.energy_sum(state) * n_inv,
            "A": model.autocorrelation_sum(state, snap) * n_inv,
        }

    def rot_one(state, snap):
        mx, my = model.magne_sums(state)
        th = -jnp.arctan2(my, mx)
        return model.rotate(state, th), model.rotate(snap, th)

    def run(call_key: jax.Array) -> dict[str, jax.Array]:
        init_keys = jax.vmap(
            lambda r: jax.random.fold_in(rng.init_key(call_key), r)
        )(jnp.arange(batch))
        state, snap = jax.vmap(
            lambda k: _xy_init_for_prep(model, cfg, prep, k)
        )(init_keys)
        first = None
        t0 = 0
        if fix1:
            # sweep 1 + rotation + its measurement run on the jnp
            # path; the kernel takes over from t=2 on the rotated state
            state = model.sweep_batched(state,
                                        rng.sweep_key(call_key, 1))
            state, snap = jax.vmap(rot_one)(state, snap)
            first = jax.vmap(measure_t1)(state, snap)
            t0 = 1
        planes = xr.pad_planes(tuple(state), half)
        snaps = xr.pad_planes(tuple(snap), half)
        remaining = mcs - t0
        c_sz = min(chunk, remaining)
        n_chunks = -(-remaining // c_sz)

        def body(planes, c):
            planes, series = xr.multisweep(
                model, planes, snaps, rng.sweep_key(call_key, c + 2),
                c_sz,
            )
            return planes, series

        _, series = lax.scan(body, planes, jnp.arange(n_chunks))
        out = {}
        for k, v in series.items():
            v = jnp.moveaxis(v, 0, 1).reshape(batch, n_chunks * c_sz)
            v = v[:, :remaining]
            if first is not None:
                v = jnp.concatenate([first[k][:, None], v], axis=1)
            out[k] = v
        return out

    return run


def _xy_disorder_padded_eligible(cfg: RunConfig, model, prep: str
                                 ) -> bool:
    """Route disorder protocols at lane-UNALIGNED widths (nx/2 not a
    128 multiple) through the streaming lane-padded kernels instead of
    the ~10x slower XLA-fused jnp sweeps — the same padded-plane
    technique that rescued the relaxation/OR protocols
    (ops/xy2d_pallas padded API), extended with a padded fused
    (mx, my, e, A) snapshot kernel.  Aligned widths keep the existing
    fused aligned path; VMEM-resident shapes (the literal 1500²) keep
    the resident engine (routing order in _run_xy_disorder).
    Match: /root/reference/app/
    xy2d_periodic_gpu_relaxation_from_disorder.f90:9-15 at non-1500²
    sizes."""
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas

    if os.environ.get("SPINLAT_XY_PADDED") == "0":
        return False
    if type(model) is not XY2D:
        return False
    if cfg.track_correlation:
        return False
    interp = xy2d_pallas._padded_interp()
    if getattr(model, "backend", "auto") == "jnp" and not interp:
        return False
    if jax.default_backend() in ("cpu", "gpu") and not interp:
        return False
    ny, half = model.color_shape
    return ny % 8 == 0 and half % 128 != 0


def _xy_padded_disorder_angle(cfg: RunConfig) -> bool:
    """f32-angle routing rule for the padded disorder runner — same
    data-driven rule as make_xy_padded_runner (r5b A/B: angle wins
    1.49x on Metropolis-only schedules, loses 0.955x with OR);
    SPINLAT_XY_PERIODIC_ANGLE overrides both ways."""
    env = os.environ.get("SPINLAT_XY_PERIODIC_ANGLE")
    if env is not None:
        return env == "1"
    return cfg.n_over_relax == 0


def _xy_disorder_padded_runner(model, cfg: RunConfig, prep: str,
                               batch: int):
    """run(call_key) -> {mx, my, e, A: (batch, mcs)} on zero-padded
    color planes: Metropolis sweeps through the padded kernels with the
    fused snapshot measurement on the no-OR hot path (the f32-angle
    engine's sweep_measure_snap_angle when _xy_padded_disorder_angle
    routes it — A(t) is one cos polynomial on the angle difference);
    OR schedules and the fix1mcs rotation unpad for the exact jnp
    measurement/rotation (pads are exact zeros throughout, so padding
    round-trips losslessly).  Host-chunked past the dispatch deadline
    with global-t keys (bitwise-identical legs)."""
    from cuda_fortran_mc_simulation_spin_tpu.engine.sweep import (
        _host_chunk_runner,
        _sweeps_per_dispatch,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas as xp

    mcs = cfg.mcs
    fix1 = prep == "fix1mcs"
    n_or = cfg.n_over_relax
    mcs_or = cfg.mcs_over_relax or mcs
    ny, half = model.color_shape
    n_inv = 1.0 / model.nsites

    if _xy_padded_disorder_angle(cfg):
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            xy2d_pallas_angle as xa,
        )

        def to_padded(state):
            return xa.pack_angles(state, half)

        def unpad(planes):
            return xa.unpack_angles(planes, half)

        sweep_measure_snap = functools.partial(
            xa.sweep_measure_snap_angle, model)
        sweep_fn = functools.partial(xa.sweep_angle, model)
        or_fn = functools.partial(xa.or_sweep_angle, model)
    else:
        def to_padded(state):
            return xp.pad_planes(state, half)

        def unpad(planes):
            return xp.unpad_planes(planes, half)

        sweep_measure_snap = functools.partial(
            xp.padded_sweep_measure_snap, model)
        sweep_fn = functools.partial(xp.padded_sweep, model)

        def or_fn(p):
            return xp.padded_or_sweep(model, p)

    def measure_one(state, snap):
        mx, my = model.magne_sums(state)
        return {
            "mx": mx * n_inv,
            "my": my * n_inv,
            "e": model.energy_sum(state) * n_inv,
            "A": model.autocorrelation_sum(state, snap) * n_inv,
        }

    def measure_padded(planes, snaps):
        return jax.vmap(measure_one)(unpad(planes), unpad(snaps))

    def rot_one(state, snap):
        mx, my = model.magne_sums(state)
        th = -jnp.arctan2(my, mx)
        return model.rotate(state, th), model.rotate(snap, th)

    def rot_padded(planes, snaps):
        state, snap = jax.vmap(rot_one)(unpad(planes), unpad(snaps))
        return (to_padded(state), to_padded(snap))

    def init_fn(call_key):
        init_keys = jax.vmap(
            lambda r: jax.random.fold_in(rng.init_key(call_key), r)
        )(jnp.arange(batch))
        state, snap = jax.vmap(
            lambda k: _xy_init_for_prep(model, cfg, prep, k)
        )(init_keys)
        return (to_padded(state), to_padded(snap))

    def make_body(call_key):
        def body(carry, t):
            planes, snaps = carry
            key = rng.sweep_key(call_key, t)
            if n_or == 0:
                planes, obs = sweep_measure_snap(planes, snaps, key)
                if fix1:
                    def rot_and_remeasure(args):
                        planes, snaps, _ = args
                        planes, snaps = rot_padded(planes, snaps)
                        return (planes, snaps,
                                measure_padded(planes, snaps))

                    planes, snaps, obs = lax.cond(
                        t == 1, rot_and_remeasure, lambda a: a,
                        (planes, snaps, obs),
                    )
                return (planes, snaps), obs
            planes = sweep_fn(planes, key)
            if fix1:
                planes, snaps = lax.cond(
                    t == 1, lambda a: rot_padded(*a), lambda a: a,
                    (planes, snaps),
                )

            def do_or(p):
                return lax.fori_loop(
                    0, n_or, lambda i, x: or_fn(x), p)

            planes = lax.cond(t <= mcs_or, do_or, lambda p: p, planes)
            return (planes, snaps), measure_padded(planes, snaps)

        return body

    budget_sweeps = _sweeps_per_dispatch(
        model.nsites * (1 + max(n_or, 0)), batch, 1.0e10)
    if mcs > budget_sweeps:
        def chunk_fn(carry, call_key, t0, size):
            carry, series = lax.scan(
                make_body(call_key), carry,
                t0 + jnp.arange(1, size + 1))
            return carry, jax.tree.map(
                lambda x: jnp.swapaxes(x, 0, 1), series)

        return _host_chunk_runner(
            jax.jit(init_fn), jax.jit(chunk_fn, static_argnums=3),
            mcs, budget_sweeps)

    def run(call_key: jax.Array) -> dict[str, jax.Array]:
        _, series = lax.scan(make_body(call_key), init_fn(call_key),
                             jnp.arange(1, mcs + 1))
        return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), series)

    return run


def _xy_disorder_mesh_runner(model, cfg: RunConfig, prep: str,
                             batch: int):
    """Domain-sharded XY disorder runner: sweeps in shard_map, prep /
    rotation / measurement as global jnp on the sharded arrays
    (parallel/domain.make_sharded_xy_disorder_runner)."""
    from cuda_fortran_mc_simulation_spin_tpu.parallel import (
        domain,
        mesh as mesh_mod,
    )

    n_inv = 1.0 / model.nsites

    def measure_one(state, snap):
        mx, my = model.magne_sums(state)
        obs = {
            "mx": mx * n_inv,
            "my": my * n_inv,
            "e": model.energy_sum(state) * n_inv,
            "A": model.autocorrelation_sum(state, snap) * n_inv,
        }
        if cfg.track_correlation:
            obs["corr"] = model.correlation_sum(state) * n_inv
        return obs

    msh = mesh_mod.make_mesh(cfg.mesh_dp, cfg.mesh_y, cfg.mesh_x)
    return domain.make_sharded_xy_disorder_runner(
        model, msh, cfg.mcs, batch,
        init_fn=lambda k: _xy_init_for_prep(model, cfg, prep, k),
        measure_fn=measure_one,
        fix1mcs=(prep == "fix1mcs"),
        n_over_relax=cfg.n_over_relax,
        mcs_over_relax=cfg.mcs_over_relax or cfg.mcs,
    )


def _run_xy_disorder(cfg: RunConfig, prep: str, out, err,
                     header_extra: dict,
                     checkpoint_path=None, checkpoint_every=0):
    model = build_model(cfg)
    if not hasattr(model, "rotate_magne_toward_xaxis"):
        raise ValueError(
            "disorder protocols need the periodic XY engine: use even "
            f"nx (got nx={cfg.nx}, which selects the helical layout)"
        )
    _emit_headers(cfg, model, out, err, header_extra)
    L = _series_len(cfg)
    op_abs = stats.VarianceCovarianceKahan((L,))   # (|m|, e)
    op_xy = stats.VarianceCovarianceKahan((L,))    # (mx, my)
    op = stats.VarianceCovarianceKahan((L,))       # (mx, e)
    op_y = stats.VarianceCovarianceKahan((L,))     # (my, e)
    ac = stats.VarianceKahan((L,))
    accs = {"op_abs": op_abs, "op_xy": op_xy, "op": op, "op_y": op_y,
            "ac": ac}
    if cfg.track_correlation:
        accs["corr"] = stats.VarianceKahan((L,))

    base = rng.base_key(cfg.seed, cfg.stream)
    batch = max(cfg.replicas, 1)
    if cfg.tot_sample % batch:
        raise ValueError("tot_sample must be divisible by replicas")
    if cfg.mesh_dp * cfg.mesh_y * cfg.mesh_x > 1:
        runner = _xy_disorder_mesh_runner(model, cfg, prep, batch)
        engine = (f"XY disorder domain-sharded mesh "
                  f"({cfg.mesh_dp},{cfg.mesh_y},{cfg.mesh_x})")
    elif _xy_resident_eligible(cfg, model, prep):
        runner = jax.jit(
            _xy_disorder_resident_runner(model, cfg, prep, batch)
        )
        engine = "xy2d_resident (VMEM-resident f32 multisweep)"
    elif _xy_multisweep_eligible(cfg, model, prep):
        runner = jax.jit(
            _xy_disorder_multisweep_runner(model, cfg, prep, batch)
        )
        engine = "xy2d_multisweep (int16-angle VMEM, opt-in)"
    elif _xy_disorder_padded_eligible(cfg, model, prep):
        runner = _xy_disorder_padded_runner(model, cfg, prep, batch)
        if not getattr(runner, "host_chunked", False):
            runner = jax.jit(runner)
        engine = ("xy2d periodic lane-padded Pallas (disorder, "
                  "f32-angle)" if _xy_padded_disorder_angle(cfg)
                  else "xy2d periodic lane-padded Pallas (disorder)")
    elif batch == 1:
        runner = jax.jit(_xy_disorder_runner(model, cfg, prep))
        engine = "XY disorder phase engine (single history)"
    else:
        runner = jax.jit(
            _xy_disorder_batched_runner(model, cfg, prep, batch)
        )
        engine = "XY disorder phase engine (batched)"
    _stamp_engine(runner, err, engine)

    start = 0
    if checkpoint_path:
        try:
            start = checkpoint.load(checkpoint_path, cfg, accs)
            err.write(f"# resumed at sample {start}\n")
        except FileNotFoundError:
            pass

    def fold(series):
        mabs = np.hypot(series["mx"], series["my"])
        op_abs.add_data(mabs, series["e"])
        op_xy.add_data(series["mx"], series["my"])
        op.add_data(series["mx"], series["e"])
        op_y.add_data(series["my"], series["e"])
        ac.add_data(series["A"])
        if cfg.track_correlation:
            accs["corr"].add_data(series["corr"])

    t0 = time.time()
    _ensemble_loop(cfg, runner, fold, err, accs, base, batch,
                   (start // batch) * batch,
                   checkpoint_path, checkpoint_every)
    err.write(f"# elapsed: {time.time() - t0:.3f}s\n")
    out.write(f"# engine: {LAST_ENGINE}\n")
    return model, accs


def run_from_disorder(cfg: RunConfig, out: IO[str] = sys.stdout,
                      err: IO[str] = sys.stderr, **ckpt) -> dict:
    """xy2d_periodic_gpu_relaxation_from_disorder (+_fix1mcs via
    cfg.rotate_after_first_mcs); emits
    output_abs_parameters_from_disorder."""
    prep = "fix1mcs" if cfg.rotate_after_first_mcs else "rotate_first"
    extra = {"initial state": "disorder"}
    model, accs = _run_xy_disorder(cfg, prep, out, err, extra, **ckpt)
    datfmt.write_abs_parameters_from_disorder(
        out, model.nsites, _series_len(cfg),
        accs["op_abs"], accs["op_xy"], accs["ac"],
        times=cfg.measure_times, correlation=accs.get("corr"),
    )
    return accs


def run_finite_magne(cfg: RunConfig, out: IO[str] = sys.stdout,
                     err: IO[str] = sys.stderr, **ckpt) -> dict:
    """..._from_disorder_finite_magne: prep |m|=m0, emit
    output_parameters_from_disorder columns
    (/root/reference/app/..._finite_magne.f90:40-75)."""
    extra = {"initial state": "disorder",
             "Initial finite magne": cfg.init_magne}
    model, accs = _run_xy_disorder(cfg, "finite_magne", out, err, extra,
                                   **ckpt)
    datfmt.write_parameters_from_disorder(
        out, model.nsites, _series_len(cfg),
        accs["op"], accs["op_y"], accs["ac"],
        times=cfg.measure_times, correlation=accs.get("corr"),
    )
    return accs


_PREP_FOR_INIT = {
    "random": "rotate_first",
    "finite_magne": "finite_magne",
    "small_magne": "small_magne",
    "near_magne": "near_magne",
}


def run_samples(cfg: RunConfig, out: IO[str] = sys.stdout,
                err: IO[str] = sys.stderr) -> None:
    """Raw per-sample time series, no aggregation — the *_samples apps
    (/root/reference/app/
    xy2d_periodic_gpu_relaxation_from_disorder_finite_magne_samples.f90:
    40-58 and the scripts-only ..._from_disorder_samples).  Preparation
    follows cfg.init_state.  Row: N, sample, t, m_x, e, m_y, A for the
    periodic XY engine; N, sample, t, m, e [, m_y] for the other models
    (the samples concept is not XY-specific, but autocorrelation and the
    rotation preps are)."""
    model = build_model(cfg)
    if not hasattr(model, "rotate_magne_toward_xaxis"):
        _run_samples_generic(cfg, model, out, err)
        return
    prep = _PREP_FOR_INIT.get(cfg.init_state, "rotate_first")
    extra = {"initial state": "disorder"}
    if prep == "finite_magne":
        extra["Initial finite magne"] = cfg.init_magne
    _emit_headers(cfg, model, out, err, extra)
    base = rng.base_key(cfg.seed, cfg.stream)
    runner = jax.jit(_xy_disorder_runner(model, cfg, prep))
    _stamp_engine(runner, err,
                  "XY disorder phase engine (single history)")
    out.write(f"# engine: {LAST_ENGINE}\n")
    progress = _progress(err, cfg.tot_sample)
    order = ("mx", "e", "my", "A")
    header_cols = "# N, smaple, time, m_x, e, m_y, A"  # sic — the
    # reference's literal header incl. typo (/root/reference/app/
    # xy2d_periodic_gpu_relaxation_from_disorder_finite_magne_samples
    # .f90:40)
    if cfg.track_correlation:
        order += ("corr",)
        header_cols += ", corr"
    out.write(header_cols + "\n")
    for s in range(cfg.tot_sample):
        series = jax.device_get(runner(rng.sample_key(base, s)))
        series = {k: np.asarray(v, np.float64) for k, v in series.items()}
        series = _filter_times(series, cfg)
        datfmt.write_sample_series(
            out, model.nsites, s + 1, series,
            order=order, times=cfg.measure_times,
        )
        progress(s + 1, cfg.tot_sample)


def _run_samples_generic(cfg: RunConfig, model, out, err) -> None:
    """Per-sample raw series for Ising/clock/helical engines: plain
    Metropolis histories, columns m, e (+ m_y for planar spins)."""
    if cfg.init_state not in ("allup", "random"):
        raise ValueError(
            f"init_state={cfg.init_state!r} requires the periodic XY "
            f"engine (--model xy2d with even nx); model {cfg.model!r} "
            "supports allup/random starts"
        )
    _emit_headers(cfg, model, out, err)
    base = rng.base_key(cfg.seed, cfg.stream)
    inner = sweep_mod.make_sample_runner(model, cfg.mcs, cfg.init_state)
    runner = jax.jit(inner)
    _stamp_engine(inner, err, "phase engine (single history)")
    out.write(f"# engine: {LAST_ENGINE}\n")
    progress = _progress(err, cfg.tot_sample)
    order = None
    for s in range(cfg.tot_sample):
        series = jax.device_get(runner(rng.sample_key(base, s)))
        series = {k: np.asarray(v, np.float64) for k, v in series.items()}
        series = _filter_times(series, cfg)
        if order is None:
            order = ("m", "e") + (("my",) if "my" in series else ())
        datfmt.write_sample_series(
            out, model.nsites, s + 1, series,
            order=order, times=cfg.measure_times,
        )
        progress(s + 1, cfg.tot_sample)


def run_finite_magne_samples(cfg: RunConfig, out: IO[str] = sys.stdout,
                             err: IO[str] = sys.stderr) -> None:
    """..._finite_magne_samples: run_samples with finite-magne prep."""
    import dataclasses
    cfg = dataclasses.replace(cfg, init_state="finite_magne")
    run_samples(cfg, out, err)


PROTOCOLS = {
    "relaxation": run_relaxation,
    "from_disorder": run_from_disorder,
    "finite_magne": run_finite_magne,
    "finite_magne_samples": run_finite_magne_samples,
    "samples": run_samples,
}
