"""Jitted Monte Carlo schedules.

The reference's inner loop launches 6+ kernels per MCS from the host and
pulls two scalars back every sweep (/root/repo/SURVEY.md §3.1; call sites
/root/reference/app/ising2d_gpu_relaxation.f90:38-43).  Here the *entire
sample history* — mcs sweeps, optional over-relaxation, per-sweep
measurement — runs inside one `lax.scan` under `jit`; the only
device→host transfer is the (mcs, n_obs) observable series per sample
(or per batch of vmapped samples).

Keying: sweep t of sample s draws from the (base -> s -> sweep-domain
-> t) fold_in chain; initial-state and preparation draws live under
their own purpose domains of the sample key (core/rng.py) so no sweep
index can alias them.  This is the declarative replacement of the
reference's sequential XORWOW stream with `skip_curand` offsets.
"""

from __future__ import annotations

from typing import Any, Callable

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from cuda_fortran_mc_simulation_spin_tpu.core import rng

# Per-dispatch execution budget.  The device worker enforces an RPC
# execution deadline (~5 min measured; a monolithic 10⁴-MCS scan at
# the committed 10001×10000 XY geometry crashed it) — any runner whose
# single dispatch is estimated to exceed this budget splits its scan
# into host-level chunks.  Sweep keys are pure functions of the GLOBAL
# sweep/chunk index, so chunked trajectories are bitwise identical to
# the monolithic scan.
_DISPATCH_BUDGET_S = 120.0

# conservative site-update rate for the GENERIC (jnp-fallback) phase
# engines — the XY periodic model at lane-unaligned widths (10000² has
# nx/2 = 5000) runs XLA-fused jnp sweeps at ~1.5e9 site/s; a monolithic
# 10⁴-MCS dispatch there is ~11 min and reproducibly crashed the device
# worker (r4d/r4e logs), so the generic sample/batch runners host-chunk
# too when the estimated dispatch exceeds the budget
_EST_GENERIC_RATE = 5.0e8

# conservative measured flip rates (BENCHMARKS.md) for the dispatch
# estimate — underestimates only make chunks smaller, never unsafe
_EST_PACKED_RATE = {
    "ising2d": 3.0e11,
    "ising3d": 1.5e11,
    "clock": 6.0e10,
    # helical fast paths (BENCHMARKS.md: packed 1.86e11, masked clock
    # saturates at 1.73e10 — the clock estimate is extra-conservative
    # because a 501x500 x R=100 x 1e5-MCS single dispatch crashed the
    # device worker well under the nominal deadline)
    "ising2d_helical_packed": 1.2e11,
    "ising2d_helical": 2.0e10,
    "clock_helical": 5.0e9,
    "clock_helical_packed": 4.0e10,
    "ising3d_helical_packed": 8.0e10,
    "ising3d_helical_stream": 1.5e10,
}


def _sweeps_per_dispatch(nsites: int, batch: int, rate: float) -> int:
    """Sweeps fitting the dispatch budget at the estimated rate."""
    per_sweep = batch * nsites / rate
    return max(1, int(_DISPATCH_BUDGET_S / per_sweep))


def _tag(run, name: str):
    """Stamp the runner with the engine it routes to — the analog of
    the reference's `print_version` data-file stamping
    (/root/reference/src/clock/clock_tableall_gpu_m.f90:47-50); the
    protocol layer emits it as a `# engine:` header line and a
    registry field."""
    run.engine = name
    return run


def make_sample_runner(
    model,
    mcs: int,
    init_kind: str = "allup",
    n_over_relax: int = 0,
    mcs_over_relax: int = 0,
    prepare: Callable[[Any, jax.Array], Any] | None = None,
    measure: Callable[[Any], dict[str, jax.Array]] | None = None,
) -> Callable[[jax.Array], dict[str, jax.Array]]:
    """Build `run(sample_key) -> {name: (mcs,) f32}` for one MC history.

    - ``init_kind``: initial state per sample (allup/random/...), built
      fresh each sample as in the reference's sample loop
      (/root/reference/app/ising2d_gpu_relaxation.f90:34-36).
    - ``n_over_relax``/``mcs_over_relax``: after each Metropolis sweep with
      t ≤ mcs_over_relax, run n_over_relax over-relaxation sweeps
      (/root/reference/app/xy2d_gpu_over_relaxation.f90:45-47).
    - ``prepare``: optional post-init hook (rotation, autocorrelation
      snapshot, finite-magne prep — see engine/protocols.py).
    - ``measure``: observable fn; defaults to ``model.observables``.
    """
    measure = measure or model.observables

    def make_body(sample_key):
        def body(state, t):
            state = model.sweep(state, rng.sweep_key(sample_key, t))
            if n_over_relax > 0:
                def do_or(s):
                    def or_body(i, s):
                        return model.over_relax_sweep(s)
                    return lax.fori_loop(0, n_over_relax, or_body, s)
                if mcs_over_relax >= mcs:
                    state = do_or(state)
                else:
                    state = lax.cond(
                        t <= mcs_over_relax, do_or, lambda s: s, state
                    )
            return state, measure(state)

        return body

    def init_fn(sample_key):
        state = model.init_state(init_kind, rng.init_key(sample_key))
        if prepare is not None:
            state = prepare(state, rng.prepare_key(sample_key))
        return state

    budget_sweeps = _sweeps_per_dispatch(
        getattr(model, "nsites", 1), 1, _EST_GENERIC_RATE)
    if mcs > budget_sweeps:
        # sweep keys are pure functions of the GLOBAL t, so the chunked
        # trajectory is bitwise identical to the monolithic scan
        def chunk_fn(state, sample_key, t0, size):
            state, series = lax.scan(
                make_body(sample_key), state, t0 + jnp.arange(1, size + 1)
            )
            return state, jax.tree.map(lambda v: v[None], series)

        base = _host_chunk_runner(
            jax.jit(init_fn), jax.jit(chunk_fn, static_argnums=3),
            mcs, budget_sweeps)

        def run(sample_key: jax.Array) -> dict[str, jax.Array]:
            return jax.tree.map(lambda v: v[0], base(sample_key))

        run.host_chunked = True
        return _tag(run, "phase engine (single history)")

    def run(sample_key: jax.Array) -> dict[str, jax.Array]:
        _, series = lax.scan(make_body(sample_key), init_fn(sample_key),
                             jnp.arange(1, mcs + 1))
        return series

    return _tag(run, "phase engine (single history)")


def make_batch_runner(
    model,
    mcs: int,
    batch: int,
    init_kind: str = "allup",
    n_over_relax: int = 0,
    mcs_over_relax: int = 0,
    prepare: Callable[[Any, jax.Array], Any] | None = None,
    measure: Callable[[Any], dict[str, jax.Array]] | None = None,
) -> Callable[[jax.Array], dict[str, jax.Array]]:
    """Build `run(call_key) -> {name: (batch, mcs) f32}` advancing a whole
    replica batch per device step (model.sweep_batched: Pallas replica
    grid axis on TPU, vmap on CPU)."""
    measure_batch = None
    if measure is None and hasattr(model, "observables_batched"):
        measure_batch = model.observables_batched
    measure = measure or model.observables

    def init_fn(call_key):
        init_keys = jax.vmap(
            lambda r: jax.random.fold_in(rng.init_key(call_key), r)
        )(jnp.arange(batch))
        state = jax.vmap(lambda k: model.init_state(init_kind, k))(init_keys)
        if prepare is not None:
            prep_keys = jax.vmap(
                lambda r: jax.random.fold_in(rng.prepare_key(call_key), r)
            )(jnp.arange(batch))
            state = jax.vmap(prepare)(state, prep_keys)
        return state

    def make_body(call_key):
        or_measure = (
            getattr(model, "over_relax_sweep_measure_batched", None)
            if measure_batch is not None else None
        )

        def body(state, t):
            state = model.sweep_batched(state, rng.sweep_key(call_key, t))
            if n_over_relax > 0:
                or_sweep = getattr(
                    model, "over_relax_sweep_batched", None
                ) or (lambda s: jax.vmap(model.over_relax_sweep)(s))

                if or_measure is not None:
                    # the LAST OR sweep carries the fused measurement —
                    # no separate whole-lattice observables pass on the
                    # schedule's hot branch
                    def do_or_measure(s):
                        s = lax.fori_loop(
                            0, n_over_relax - 1,
                            lambda i, s2: or_sweep(s2), s)
                        return or_measure(s)

                    if mcs_over_relax >= mcs:
                        return do_or_measure(state)
                    return lax.cond(
                        t <= mcs_over_relax, do_or_measure,
                        lambda s: (s, measure_batch(s)), state,
                    )

                def do_or(s):
                    def or_body(i, s):
                        return or_sweep(s)
                    return lax.fori_loop(0, n_over_relax, or_body, s)
                if mcs_over_relax >= mcs:
                    state = do_or(state)
                else:
                    state = lax.cond(
                        t <= mcs_over_relax, do_or, lambda s: s, state
                    )
            if measure_batch is not None:
                return state, measure_batch(state)
            return state, jax.vmap(measure)(state)

        return body

    budget_sweeps = _sweeps_per_dispatch(
        getattr(model, "nsites", 1), batch, _EST_GENERIC_RATE)
    if mcs > budget_sweeps:
        # sweep keys are pure functions of the GLOBAL t — bitwise
        # identical to the monolithic scan (see make_sample_runner)
        def chunk_fn(state, call_key, t0, size):
            state, series = lax.scan(
                make_body(call_key), state, t0 + jnp.arange(1, size + 1)
            )
            return state, jax.tree.map(
                lambda x: jnp.swapaxes(x, 0, 1), series)

        run = _host_chunk_runner(
            jax.jit(init_fn), jax.jit(chunk_fn, static_argnums=3),
            mcs, budget_sweeps)
        return _tag(run, "phase engine (batched)")

    def run(call_key: jax.Array) -> dict[str, jax.Array]:
        _, series = lax.scan(make_body(call_key), init_fn(call_key),
                             jnp.arange(1, mcs + 1))
        # (mcs, batch) -> (batch, mcs)
        return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), series)

    return _tag(run, "phase engine (batched)")


def _invocation_chunked(init_fn, body_fn, mcs, chunk, batch, est_rate,
                        nsites):
    """Scan of fixed-``chunk``-sweep kernel invocations keyed by the
    GLOBAL invocation index, grouped into host-level dispatches that
    fit the execution budget (`body_fn(carry, call_key, ci) ->
    (carry, {k: (batch, chunk)})`).  The final invocation always runs
    the full ``chunk`` (the helical kernels take ``sweeps`` statically;
    surplus columns are truncated), so the chunked trajectory is
    bitwise identical to the monolithic scan."""
    n_chunks = -(-mcs // chunk)
    padded = n_chunks * chunk
    budget_sweeps = _sweeps_per_dispatch(nsites, batch, est_rate)
    g_inv = max(1, budget_sweeps // chunk)

    def span(carry, call_key, ci0, n_inv):
        def body(c, ci):
            return body_fn(c, call_key, ci)

        carry, series = lax.scan(body, carry, ci0 + jnp.arange(n_inv))
        return carry, {
            k: jnp.moveaxis(v, 0, 1).reshape(batch, n_inv * chunk)
            for k, v in series.items()
        }

    if n_chunks <= g_inv:
        def run(call_key: jax.Array) -> dict[str, jax.Array]:
            _, series = span(init_fn(call_key), call_key,
                             jnp.int32(0), n_chunks)
            return {k: v[:, :mcs] for k, v in series.items()}

        return run

    def chunk_fn(carry, call_key, t0, size):
        return span(carry, call_key, t0 // chunk, size // chunk)

    base = _host_chunk_runner(
        jax.jit(init_fn),
        jax.jit(chunk_fn, static_argnums=3),
        padded, g_inv * chunk)

    def run(call_key: jax.Array) -> dict[str, jax.Array]:
        out = base(call_key)
        return {k: v[:, :mcs] for k, v in out.items()}

    run.host_chunked = True
    return run


def _host_chunk_runner(init_fn, chunk_fn, mcs, dispatch_chunk):
    """Host-level dispatch loop: `init_fn(key) -> carry`;
    `chunk_fn(carry, key, t0, size) -> (carry, {k: (batch, size)})`
    (jitted, `size` static).  Sweep keys are pure functions of the
    global sweep index, so the chunked trajectory is bitwise identical
    to a monolithic scan.  The returned runner is tagged
    ``host_chunked`` — callers must NOT wrap it in jax.jit."""
    def run(call_key: jax.Array) -> dict[str, jax.Array]:
        carry = init_fn(call_key)
        parts, t0 = [], 0
        while t0 < mcs:
            size = min(dispatch_chunk, mcs - t0)
            carry, part = chunk_fn(carry, call_key, jnp.int32(t0), size)
            parts.append(part)
            t0 += size
        if len(parts) == 1:
            return parts[0]
        return jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=1), *parts)

    run.host_chunked = True
    return run


def _make_packed_runner(model, mcs, batch, init_kind, resident,
                        multisweep_fn, stream_fn, est_rate):
    """Shared body of the multispin runners: init + pack once, then
    either chunked VMEM-resident multisweeps or streamed phase pairs,
    with per-sweep fused (m, e) either way.  Histories whose single
    dispatch would exceed the device execution deadline are split into
    host-level dispatch chunks (bitwise identical — keys are global)."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_multispin

    chunk = min(64, mcs)
    n_full = mcs // chunk
    rest = mcs - n_full * chunk

    budget_sweeps = _sweeps_per_dispatch(model.nsites, batch, est_rate)

    def init_fn(call_key):
        init_keys = jax.vmap(
            lambda r: jax.random.fold_in(rng.init_key(call_key), r)
        )(jnp.arange(batch))
        state = jax.vmap(lambda k: model.init_state(init_kind, k))(
            init_keys
        )
        return (ising2d_multispin.pack_color(state.a),
                ising2d_multispin.pack_color(state.b))

    if resident:
        # kernel invocations advance `chunk` sweeps; the sample key and
        # the GLOBAL start index t0 = ci*chunk key each invocation, so
        # engines with unified global-t seeding (ising2d_multispin)
        # reproduce the streaming/sharded trajectories bitwise and the
        # others stay deterministic per global position
        def resident_span(c, call_key, ci0, n_inv):
            def body(c, ci):
                wa, wb, obs = multisweep_fn(
                    model, c[0], c[1], call_key, chunk, t0=ci * chunk,
                )
                return (wa, wb), obs

            c, series = lax.scan(body, c, ci0 + jnp.arange(n_inv))
            return c, {
                # (n_inv, batch, chunk) -> (batch, n_inv*chunk)
                k: jnp.moveaxis(v, 0, 1).reshape(batch, n_inv * chunk)
                for k, v in series.items()
            }

        def tail_fn(c, call_key):
            # `sweeps` is a static kernel arg, so the remainder runs at
            # its exact length instead of a padded full chunk
            wa, wb, t = multisweep_fn(
                model, c[0], c[1], call_key, rest,
                t0=jnp.int32(n_full * chunk),
            )
            return (wa, wb), t

        g_inv = max(1, budget_sweeps // chunk)
        if n_full <= g_inv:
            def run(call_key: jax.Array) -> dict[str, jax.Array]:
                c = init_fn(call_key)
                c, parts = resident_span(c, call_key, jnp.int32(0),
                                         n_full)
                if rest:
                    _, tail = tail_fn(c, call_key)
                    parts = {
                        k: jnp.concatenate([parts[k], tail[k]], axis=1)
                        for k in parts
                    }
                return parts

            return run

        @functools.partial(jax.jit, static_argnums=3)
        def chunk_fn(c, call_key, t0, size):
            if size % chunk == 0:
                return resident_span(c, call_key, t0 // chunk,
                                     size // chunk)
            # final host chunk carrying the sub-invocation remainder
            n_inv = size // chunk
            c, parts = resident_span(c, call_key, t0 // chunk, n_inv)
            c, tail = tail_fn(c, call_key)
            return c, {
                k: jnp.concatenate([parts[k], tail[k]], axis=1)
                for k in parts
            }

        return _host_chunk_runner(
            jax.jit(init_fn), chunk_fn, mcs, g_inv * chunk)

    def stream_span(c, call_key, t0, size):
        def body(c, t):
            wa, wb, obs = stream_fn(
                model, c[0], c[1], rng.sweep_key(call_key, t)
            )
            return (wa, wb), obs

        c, series = lax.scan(body, c, t0 + jnp.arange(1, size + 1))
        return c, jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), series)

    if mcs <= budget_sweeps:
        def run(call_key: jax.Array) -> dict[str, jax.Array]:
            c = init_fn(call_key)
            _, series = stream_span(c, call_key, jnp.int32(0), mcs)
            return series

        return run

    return _host_chunk_runner(
        jax.jit(init_fn),
        jax.jit(stream_span, static_argnums=3),
        mcs, budget_sweeps)


def make_multispin_runner(
    model,
    mcs: int,
    batch: int,
    init_kind: str = "allup",
) -> Callable[[jax.Array], dict[str, jax.Array]]:
    """`run(call_key) -> {m,e: (batch, mcs)}` on the bit-packed
    multispin kernel (ops/ising2d_multispin.py) with per-sweep (m, e)
    fused into phase b — the fastest Ising2D ensemble path, and the
    only fused-measurement one for lattices beyond the VMEM-multisweep
    size cap.  Lattices whose packed planes fit VMEM run the whole-
    lattice multisweep kernel (S sweeps per invocation, zero HBM
    traffic between sweeps); larger ones stream phase pairs."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising2d_multispin

    ny, half = model.color_shape
    resident = ising2d_multispin.multisweep_fits_vmem(ny, half)
    return _tag(_make_packed_runner(
        model, mcs, batch, init_kind,
        resident,
        ising2d_multispin.multisweep_packed,
        ising2d_multispin.sweep_measure_packed,
        _EST_PACKED_RATE["ising2d"],
    ), "ising2d_multispin bit-packed "
       + ("(resident multisweep)" if resident
          else "(streaming phase pairs)"))


def make_multispin3d_runner(
    model,
    mcs: int,
    batch: int,
    init_kind: str = "allup",
) -> Callable[[jax.Array], dict[str, jax.Array]]:
    """3-D analog of :func:`make_multispin_runner`
    (ops/ising3d_multispin.py): VMEM-resident whole-volume multisweep
    when the packed volume fits, streaming z-plane phases otherwise."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import ising3d_multispin

    nz, ny, half = model.color_shape
    resident = ising3d_multispin.multisweep3d_fits_vmem(nz, ny, half)
    return _tag(_make_packed_runner(
        model, mcs, batch, init_kind,
        resident,
        ising3d_multispin.multisweep_packed3d,
        ising3d_multispin.sweep_measure_packed3d,
        _EST_PACKED_RATE["ising3d"],
    ), "ising3d_multispin bit-packed "
       + ("(resident multisweep)" if resident
          else "(streaming z-plane phases)"))


def make_clock_multispin_runner(
    model,
    mcs: int,
    batch: int,
    init_kind: str = "allup",
) -> Callable[[jax.Array], dict[str, jax.Array]]:
    """`run(call_key) -> {m,e: (batch, mcs)}` on the bit-sliced q=6
    clock engine (ops/clock_multispin.py) with per-sweep (2m, 2e) fused
    into phase b — the packed ensemble path for the reference's largest
    production workload class (clock 2000²-class × 10⁵ MCS × 5000
    samples, /root/reference/app/
    clock_dual_lattice_yhalf_tableall_gpu_relaxation.f90:8-9).

    Aligned shapes take the fused-obs kernel; other even shapes (the
    literal 2000x2000 / 1000x1000 committed geometries) run the padded
    engine (same kernel on padded planes + masked observables).  q=6
    takes the CRT bit-sliced engine; q=4 its 2-bit-digit companion
    (ops/clock4_multispin.py); q=3 the Z₃ two-plane companion
    (ops/clock3_multispin.py)."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import clock_multispin

    if getattr(model, "q", None) == 4:
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            clock4_multispin as eng,
        )
        pack = eng.pack_clock4_color
        pack_padded = eng.pack_clock4_color_padded
        sm_plain = eng.sweep_measure_packed4
        sm_padded = eng.sweep_measure_packed4_padded
        aligned = eng.clock4_packable(model)
    elif getattr(model, "q", None) == 3:
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            clock3_multispin as eng,
        )
        pack = eng.pack_clock3_color
        pack_padded = eng.pack_clock3_color_padded
        sm_plain = eng.sweep_measure_packed3
        sm_padded = eng.sweep_measure_packed3_padded
        aligned = eng.clock3_packable(model)
    else:
        pack = clock_multispin.pack_clock_color
        pack_padded = clock_multispin.pack_clock_color_padded
        sm_plain = clock_multispin.sweep_measure_packed6
        sm_padded = clock_multispin.sweep_measure_packed6_padded
        aligned = clock_multispin.clock_packable(model)

    spec = None
    if not aligned:
        spec = clock_multispin.padded_spec(*model.color_shape)
        if spec is None:
            raise ValueError("shape is neither aligned- nor "
                             "padded-packable for the packed clock "
                             "engine")

    def init_fn(call_key):
        init_keys = jax.vmap(
            lambda r: jax.random.fold_in(rng.init_key(call_key), r)
        )(jnp.arange(batch))
        state = jax.vmap(lambda k: model.init_state(init_kind, k))(
            init_keys
        )
        if spec is not None:
            return (pack_padded(state.a, spec),
                    pack_padded(state.b, spec))
        return pack(state.a), pack(state.b)

    def span(c, call_key, t0, size):
        def body(c, t):
            if spec is not None:
                wa, wb, obs = sm_padded(
                    model, spec, c[0], c[1], rng.sweep_key(call_key, t))
            else:
                wa, wb, obs = sm_plain(
                    model, c[0], c[1], rng.sweep_key(call_key, t)
                )
            return (wa, wb), obs

        c, series = lax.scan(body, c, t0 + jnp.arange(1, size + 1))
        return c, jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), series)

    name = (f"clock q={getattr(model, 'q', 6)} bit-sliced packed"
            + (" (padded)" if spec is not None else ""))
    budget_sweeps = _sweeps_per_dispatch(
        model.nsites, batch, _EST_PACKED_RATE["clock"])
    if mcs <= budget_sweeps:
        def run(call_key: jax.Array) -> dict[str, jax.Array]:
            c = init_fn(call_key)
            _, series = span(c, call_key, jnp.int32(0), mcs)
            return series

        return _tag(run, name)

    return _tag(_host_chunk_runner(
        jax.jit(init_fn), jax.jit(span, static_argnums=3),
        mcs, budget_sweeps), name)


def make_multisweep_runner(
    model,
    mcs: int,
    batch: int,
    init_kind: str = "allup",
    chunk: int = 32,
) -> Callable[[jax.Array], dict[str, jax.Array]]:
    """`run(call_key) -> {m,e: (batch, mcs)}` on the VMEM-resident
    multi-sweep kernel (ops/ising2d_multisweep.py): S sweeps + in-kernel
    measurement per kernel invocation, scanned to cover mcs.

    The production-ensemble fast path for small/medium Ising/clock
    lattices (the reference's 1001×1000 × 1.44M-sample and 2000² × 5000-
    sample workload classes,
    /root/reference/app/ising2d_gpu_relaxation.f90:6-8,
    /root/reference/app/clock_dual_lattice_yhalf_tableall_gpu_relaxation
    .f90:8-9)."""
    from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        clock_multisweep,
        ising2d_multisweep,
    )

    ms = (clock_multisweep.multisweep if isinstance(model, Clock2D)
          else ising2d_multisweep.multisweep)
    chunk = min(chunk, mcs)
    n_chunks = -(-mcs // chunk)
    padded = n_chunks * chunk

    def run(call_key: jax.Array) -> dict[str, jax.Array]:
        init_keys = jax.vmap(
            lambda r: jax.random.fold_in(rng.init_key(call_key), r)
        )(jnp.arange(batch))
        state = jax.vmap(lambda k: model.init_state(init_kind, k))(init_keys)

        def body(state, c):
            state, obs = ms(
                model, state, rng.sweep_key(call_key, c), chunk
            )
            return state, obs

        _, series = lax.scan(body, state, jnp.arange(n_chunks))
        # (n_chunks, batch, chunk) -> (batch, mcs)
        out = {}
        for k, v in series.items():
            v = jnp.moveaxis(v, 0, 1).reshape(batch, padded)
            out[k] = v[:, :mcs]
        return out

    return _tag(run, "int8 VMEM multisweep")


def helical_pallas_eligible(model, n_over_relax: int = 0) -> bool:
    """True when the fused helical Pallas path (ops/helical_pallas.py)
    serves this model on this backend."""
    from cuda_fortran_mc_simulation_spin_tpu.models.clock_helical import (
        Clock2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d_helical import (
        Ising2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d_helical import (
        XY2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import helical_pallas

    if jax.default_backend() in ("cpu", "gpu"):
        return False
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d_helical import (
        Ising3DHelical,
    )

    if isinstance(model, Ising3DHelical):
        if n_over_relax != 0:
            return False
        if os.environ.get("SPINLAT_HELICAL3D_PACKED") == "0":
            return False
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            helical3d_multispin as h3,
        )

        return (h3.fits(model) or h3.fits_stream_halo(model)
                or h3.fits_stream(model))
    if isinstance(model, (Ising2DHelical, Clock2DHelical)):
        if n_over_relax != 0:
            return False
        if (isinstance(model, Ising2DHelical)
                and os.environ.get("SPINLAT_HELICAL_PACKED") != "0"):
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                helical_multispin,
            )

            # the flat packed engine has much looser shape gates than
            # the masked kernels (no ny tiling requirement)
            if helical_multispin.fits(model):
                return True
        if (isinstance(model, Clock2DHelical)
                and os.environ.get("SPINLAT_CLOCK_HELICAL_PACKED")
                != "0"):
            from cuda_fortran_mc_simulation_spin_tpu.ops import (
                clock_helical_multispin,
            )

            if clock_helical_multispin.fits(model):
                return True
        if not helical_pallas.ising_fits_vmem(model.ny, model.nx):
            return False
        # ny without a multiple-of-8 divisor runs in single-block mode
        return (model.ny % 8 == 0
                or helical_pallas.single_block_ok(model.ny, model.nx))
    return isinstance(model, XY2DHelical) and model.ny % 8 == 0


def make_helical_runner(
    model,
    mcs: int,
    batch: int,
    init_kind: str = "allup",
    n_over_relax: int = 0,
    mcs_over_relax: int = 0,
    chunk: int = 64,
    xy_dispatch_chunk: int | None = None,
) -> Callable[[jax.Array], dict[str, jax.Array]]:
    """`run(call_key) -> {obs: (batch, mcs)}` on the fused helical
    Pallas kernels — the fast path for the reference's committed odd-nx
    geometries (1001×1000 Ising, 501×500 clock, 10001×10000 XY;
    /root/reference/app/ising2d_gpu_relaxation.f90:8-9,
    /root/reference/app/clock_gpu_relaxation.f90:6-13,
    /root/reference/app/xy2d_gpu_relaxation.f90:9-10).

    Ising/clock run the whole-lattice VMEM multisweep (no OR — it's an
    XY feature); XY runs streaming masked phase kernels on lane-padded
    planes with the OR schedule and per-sweep packed measurement.
    """
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d_helical import (
        XY2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.ising3d_helical import (
        Ising3DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import helical_pallas as hp

    if isinstance(model, Ising3DHelical):
        # flat even/odd bit-packed 3-D engine for the reference's
        # committed odd geometries 151x151x150 / 501x501x500 /
        # 1001x1000x1000 (ops/helical3d_multispin.py): VMEM-resident
        # multisweep for 151³-class volumes, streaming phase pairs
        # above that
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            helical3d_multispin as h3,
        )

        m_half = model.nsites // 2
        resident = h3.fits(model)
        halo = not resident and h3.fits_stream_halo(model)

        def init3_fn(call_key):
            init_keys = jax.vmap(
                lambda r: jax.random.fold_in(rng.init_key(call_key), r)
            )(jnp.arange(batch))
            flat = jax.vmap(lambda k: model.init_state(init_kind, k))(
                init_keys
            )
            a = flat[:, 0::2]
            b = flat[:, 1::2]
            if resident:
                return (h3.pack_flat(a, m_half),
                        h3.pack_flat(b, m_half))
            if halo:
                return (
                    h3.pack_flat_halo(a, m_half, model.nx, model.nxy),
                    h3.pack_flat_halo(b, m_half, model.nx, model.nxy),
                )
            return (h3.pack_flat_stream(a, m_half),
                    h3.pack_flat_stream(b, m_half))

        ms = (h3.multisweep if resident
              else h3.multisweep_stream_halo if halo
              else h3.multisweep_stream)
        chunk3 = min(chunk, mcs)

        def body3_fn(c, call_key, ci):
            wa, wb, obs = ms(
                model, c[0], c[1], rng.sweep_key(call_key, ci), chunk3,
            )
            return (wa, wb), obs

        est = _EST_PACKED_RATE[
            "ising3d_helical_packed" if resident or halo
            else "ising3d_helical_stream"]
        return _tag(_invocation_chunked(
            init3_fn, body3_fn, mcs, chunk3, batch, est, model.nsites),
            "helical3d_multispin "
            + ("(resident multisweep)" if resident
               else "(block-halo streaming)" if halo
               else "(streaming phase pairs)"))

    if isinstance(model, XY2DHelical):
        mcs_or = mcs_over_relax or mcs
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            xy2d_helical_dense as xhd,
        )

        # One device dispatch per MCS *chunk*, not per full history: a
        # single 10⁴-MCS scan at the committed 10001×10000 geometry
        # executes for many minutes and trips the device worker's RPC
        # execution deadline ("TPU worker process crashed"), measured
        # to the exact stage in /tmp-probe isolation — stages up to
        # mcs≈3 pass, the monolithic 10⁴ scan faults.  Sweep keys are
        # pure functions of the GLOBAL sweep index t, so chunked
        # trajectories are bitwise identical to the monolithic scan.
        # The returned runner is a host-level loop (tagged
        # host_chunked) — callers must NOT wrap it in jax.jit.
        dispatch_chunk = xy_dispatch_chunk or (
            1024 if n_over_relax else 2048)

        if (xhd.fits(model)
                and os.environ.get("SPINLAT_XY_DENSE") != "0"):
            # dense ragged dual-color engine: every lane's trig/exp is
            # useful work and a phase writes only the updated color
            # (the masked full-width kernels idle half the VPU).
            # The f32-ANGLE storage variant (half the lattice traffic
            # on this HBM-bound path; same Markov chain — see its
            # module docstring) is the DEFAULT: it measured 1.94x the
            # component engine in a contention-honest on-chip A/B
            # (BENCHMARKS.md §5) and carries the same host-chunk and
            # trajectory pins (tests/test_xy2d_dense_angle.py).
            # SPINLAT_XY_DENSE_ANGLE=0 opts back into the component
            # (cos,sin) engine.
            angle = os.environ.get("SPINLAT_XY_DENSE_ANGLE", "1") == "1"
            if angle:
                from cuda_fortran_mc_simulation_spin_tpu.ops import (
                    xy2d_helical_dense_angle as xhd,  # noqa: F811
                )
            @functools.partial(jax.jit, static_argnums=3)
            def _chunk_d(planes, call_key, t0, size):
                def body(planes, t):
                    if n_over_relax == 0:
                        planes, obs = xhd.sweep_measure(
                            model, planes, rng.sweep_key(call_key, t))
                        return planes, obs
                    planes = xhd.sweep(
                        model, planes, rng.sweep_key(call_key, t))

                    def do_or(p):
                        # the LAST OR sweep carries the fused (m, my,
                        # e) — no separate whole-lattice observables()
                        # pass on the schedule's hot branch
                        p = lax.fori_loop(
                            0, n_over_relax - 1,
                            lambda i, p2: xhd.over_relax_sweep(
                                model, p2),
                            p,
                        )
                        return xhd.over_relax_sweep_measure(model, p)

                    def no_or(p):
                        return p, xhd.observables(model, p)

                    return lax.cond(t <= mcs_or, do_or, no_or, planes)

                planes, series = lax.scan(
                    body, planes, t0 + jnp.arange(1, size + 1))
                return planes, jax.tree.map(
                    lambda x: jnp.swapaxes(x, 0, 1), series)

            @jax.jit
            def _init_d(call_key):
                init_keys = jax.vmap(
                    lambda r: jax.random.fold_in(
                        rng.init_key(call_key), r)
                )(jnp.arange(batch))
                state = jax.vmap(
                    lambda k: model.init_state(init_kind, k)
                )(init_keys)
                return xhd.pack_state(state, model.ny, model.nx)

            def run(call_key: jax.Array) -> dict[str, jax.Array]:
                planes = _init_d(call_key)
                parts, t0 = [], 0
                while t0 < mcs:
                    size = min(dispatch_chunk, mcs - t0)
                    planes, part = _chunk_d(
                        planes, call_key, jnp.int32(t0), size)
                    parts.append(part)
                    t0 += size
                return jax.tree.map(
                    lambda *xs: jnp.concatenate(xs, axis=1), *parts)

            run.host_chunked = True
            return _tag(run, "xy2d_helical_dense_angle (f32-angle)"
                        if angle
                        else "xy2d_helical_dense (ragged dual-color)")

        @functools.partial(jax.jit, static_argnums=3)
        def _chunk_m(carry, call_key, t0, size):
            def body(carry, t):
                sx, sy = carry
                if n_over_relax == 0:
                    # measurement fused into the offset-1 phase kernel
                    sx, sy, obs = hp.xy_sweep_measure_packed(
                        model, sx, sy, rng.sweep_key(call_key, t)
                    )
                    return (sx, sy), obs
                sx, sy = hp.xy_sweep_packed(
                    model, sx, sy, rng.sweep_key(call_key, t)
                )

                def do_or(c):
                    return lax.fori_loop(
                        0, n_over_relax,
                        lambda i, c2: hp.xy_over_relax_sweep_packed(
                            model, *c2
                        ),
                        c,
                    )
                sx, sy = lax.cond(
                    t <= mcs_or, do_or, lambda c: c, (sx, sy)
                )
                return (sx, sy), hp.xy_observables_packed(model, sx, sy)

            carry, series = lax.scan(
                body, carry, t0 + jnp.arange(1, size + 1))
            return carry, jax.tree.map(
                lambda x: jnp.swapaxes(x, 0, 1), series)

        @jax.jit
        def _init_m(call_key):
            init_keys = jax.vmap(
                lambda r: jax.random.fold_in(rng.init_key(call_key), r)
            )(jnp.arange(batch))
            state = jax.vmap(lambda k: model.init_state(init_kind, k))(
                init_keys
            )
            return hp.xy_pack_state(state, model.ny, model.nx)

        def run(call_key: jax.Array) -> dict[str, jax.Array]:
            carry = _init_m(call_key)
            parts, t0 = [], 0
            while t0 < mcs:
                size = min(dispatch_chunk, mcs - t0)
                carry, part = _chunk_m(
                    carry, call_key, jnp.int32(t0), size)
                parts.append(part)
                t0 += size
            return jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=1), *parts)

        run.host_chunked = True
        return _tag(run, "helical_pallas XY (masked streaming)")

    from cuda_fortran_mc_simulation_spin_tpu.models.clock_helical import (
        Clock2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.models.ising2d_helical import (
        Ising2DHelical,
    )
    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        helical_multispin as hms,
    )

    if (isinstance(model, Ising2DHelical) and hms.fits(model)
            and os.environ.get("SPINLAT_HELICAL_PACKED") != "0"):
        # flat even/odd bit-packed engine: ~4x the masked kernels on
        # the committed 1001x1000 geometry (BENCHMARKS.md)
        m_half = model.nsites // 2
        chunk = min(chunk, mcs)

        def init_fn(call_key):
            init_keys = jax.vmap(
                lambda r: jax.random.fold_in(rng.init_key(call_key), r)
            )(jnp.arange(batch))
            flat = jax.vmap(lambda k: model.init_state(init_kind, k))(
                init_keys
            )
            a, b = hms.split_flat(flat)
            return (hms.pack_flat(a, m_half), hms.pack_flat(b, m_half))

        def body_fn(c, call_key, ci):
            wa, wb, obs = hms.multisweep(
                model, c[0], c[1], rng.sweep_key(call_key, ci), chunk,
            )
            return (wa, wb), obs

        return _tag(_invocation_chunked(
            init_fn, body_fn, mcs, chunk, batch,
            _EST_PACKED_RATE["ising2d_helical_packed"], model.nsites),
            "helical_multispin (flat even/odd bit-packed)")

    from cuda_fortran_mc_simulation_spin_tpu.ops import (
        clock_helical_multispin as chm,
    )

    if (isinstance(model, Clock2DHelical) and chm.fits(model)
            and os.environ.get("SPINLAT_CLOCK_HELICAL_PACKED") != "0"):
        # flat even/odd bit-sliced q=6 engine for the committed
        # 501x500 clock geometry (BENCHMARKS.md)
        m_half = model.nsites // 2
        chunk = min(chunk, mcs)

        def init_fn(call_key):
            init_keys = jax.vmap(
                lambda r: jax.random.fold_in(rng.init_key(call_key), r)
            )(jnp.arange(batch))
            flat = jax.vmap(lambda k: model.init_state(init_kind, k))(
                init_keys
            )
            a, b = chm.split_flat(flat)
            return (chm.pack_clock_flat(a, m_half),
                    chm.pack_clock_flat(b, m_half))

        def body_fn(c, call_key, ci):
            wa3, wb3, obs = chm.multisweep(
                model, c[0], c[1], rng.sweep_key(call_key, ci), chunk,
            )
            return (wa3, wb3), obs

        return _tag(_invocation_chunked(
            init_fn, body_fn, mcs, chunk, batch,
            _EST_PACKED_RATE["clock_helical_packed"], model.nsites),
            "clock_helical_multispin (bit-sliced packed)")

    ms = (hp.clock_multisweep if isinstance(model, Clock2DHelical)
          else hp.ising_multisweep)
    chunk = min(chunk, mcs)

    def init_fn(call_key):
        init_keys = jax.vmap(
            lambda r: jax.random.fold_in(rng.init_key(call_key), r)
        )(jnp.arange(batch))
        return jax.vmap(lambda k: model.init_state(init_kind, k))(
            init_keys
        )

    def body_fn(state, call_key, ci):
        return ms(model, state, rng.sweep_key(call_key, ci), chunk)

    est = _EST_PACKED_RATE[
        "clock_helical" if isinstance(model, Clock2DHelical)
        else "ising2d_helical"]
    return _tag(
        _invocation_chunked(
            init_fn, body_fn, mcs, chunk, batch, est, model.nsites),
        "helical_pallas multisweep (masked "
        + ("clock)" if isinstance(model, Clock2DHelical)
           else "Ising)"))


def run_ensemble(
    model,
    mcs: int,
    tot_sample: int,
    base_key: jax.Array,
    accumulate: Callable[[dict[str, Any]], None],
    init_kind: str = "allup",
    replicas: int = 1,
    samples_per_call: int = 1,
    progress: Callable[[int, int], None] | None = None,
    **runner_kwargs,
) -> None:
    """Drive tot_sample independent histories, folding each per-sample
    observable series into host-side accumulators.

    Replica axis (``replicas`` > 1) vmaps independent histories inside a
    single device program — the reference's `clock_gpu_multi_m` n_multi
    axis (/root/reference/src/clock_gpu_multi_m.f90:66) and
    `xy2d_periodic_samples_gpu_m` thread-per-replica engine
    (/root/reference/src/xy2d_periodic_samples_gpu_m.f90:56,189), done the
    JAX way.  ``samples_per_call`` additionally batches sequential samples
    into one dispatch.

    Effective histories = tot_sample (counted in units of single
    histories; must be divisible by replicas * samples_per_call).
    """
    batch = replicas * samples_per_call
    if tot_sample % batch:
        raise ValueError(
            f"tot_sample={tot_sample} not divisible by "
            f"replicas*samples_per_call={batch}"
        )

    if batch == 1:
        runner = jax.jit(
            make_sample_runner(model, mcs, init_kind, **runner_kwargs)
        )
    else:
        runner = jax.jit(
            make_batch_runner(model, mcs, batch, init_kind, **runner_kwargs)
        )

    n_calls = tot_sample // batch
    for call in range(n_calls):
        series = jax.device_get(runner(rng.sample_key(base_key, call)))
        accumulate(series)
        if progress is not None:
            progress((call + 1) * batch, tot_sample)


# ---------------------------------------------------------------------------
# lane-padded periodic XY runner (ops/xy2d_pallas padded API): the
# committed geometries whose color width nx/2 is no lane multiple
# (10000^2, 4000^2) previously fell to the ~16x slower jnp fallback
# ---------------------------------------------------------------------------

def xy_padded_eligible(model, runner_kwargs=None) -> bool:
    """True when the (possibly lane-padded) periodic XY Pallas runner
    serves this model: periodic XY2D on TPU with 8-row tiling, either

    - nx/2 NOT a lane multiple (zero-padded planes; previously the
      ~10x slower jnp fallback), any schedule; or
    - nx/2 a lane multiple AND an OR-free schedule: the runner then
      runs unpadded and routes the f32-angle engine, measured 1.60x
      the component batch runner at aligned 8192^2 Metropolis
      (scripts/tpu_session_r5d.py; OR-bearing aligned schedules keep
      the fused component kernels per the r5b 0.955x result).
    """
    from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D

    if os.environ.get("SPINLAT_XY_PADDED") == "0":
        return False
    if type(model) is not XY2D:
        return False
    if getattr(model, "backend", "auto") == "jnp":
        return False
    if jax.default_backend() in ("cpu", "gpu"):
        return False
    ny, half = model.color_shape
    if ny % 8 != 0:
        return False
    if half % 128 != 0:
        return True
    n_or = (runner_kwargs or {}).get("n_over_relax", 0)
    return (n_or == 0
            and os.environ.get("SPINLAT_XY_PERIODIC_ANGLE") != "0")


def make_xy_padded_runner(model, mcs, batch, init_kind,
                          n_over_relax=0, mcs_over_relax=0):
    """`run(call_key) -> {m, my, e: (batch, mcs)}` on zero-padded color
    planes (ops/xy2d_pallas padded kernels; pads never flip, fused obs
    exact).  Mirrors make_batch_runner's schedule incl. the
    Metropolis+OR mix (/root/reference/app/
    xy2d_periodic_gpu_over_relaxation.f90:42-45), host-chunked past the
    dispatch deadline with global-t keying (bitwise-identical legs)."""
    from cuda_fortran_mc_simulation_spin_tpu.ops import xy2d_pallas as xp

    ny, half = model.color_shape
    mcs_or = mcs_over_relax or mcs

    # f32-ANGLE storage variant (ops/xy2d_pallas_angle): ONE plane per
    # color instead of two — halves HBM lattice traffic.  The r5b
    # on-chip A/B (BENCHMARKS.md): 1.49x on the Metropolis-only
    # schedule (10000^2), 0.955x with OR in the mix (4000^2 — the
    # angle OR's atan2 flips that phase compute-bound), so the angle
    # engine routes by default exactly on OR-free schedules.
    # SPINLAT_XY_PERIODIC_ANGLE=1/0 overrides either way.
    env_angle = os.environ.get("SPINLAT_XY_PERIODIC_ANGLE")
    angle = (n_over_relax == 0 if env_angle is None
             else env_angle == "1")
    if angle:
        from cuda_fortran_mc_simulation_spin_tpu.ops import (
            xy2d_pallas_angle as xa,
        )

        def pack(state):
            return xa.pack_angles(state, half)

        sweep_fn = functools.partial(xa.sweep_angle, model)
        or_fn = functools.partial(xa.or_sweep_angle, model)
        or_meas_fn = functools.partial(xa.or_sweep_measure_angle, model)
        sweep_meas_fn = functools.partial(xa.sweep_measure_angle, model)
        from cuda_fortran_mc_simulation_spin_tpu.ops.xy2d_pallas import (
            pad_width,
        )
        pad = "lane-padded " if pad_width(half) != half else ""
        name = f"xy2d periodic {pad}Pallas (f32-angle)"
    else:
        def pack(state):
            return xp.pad_planes(state, half)

        sweep_fn = functools.partial(xp.padded_sweep, model)
        or_fn = functools.partial(xp.padded_or_sweep, model)
        or_meas_fn = functools.partial(xp.padded_or_sweep_measure,
                                       model)
        sweep_meas_fn = functools.partial(xp.padded_sweep_measure,
                                          model)
        name = "xy2d periodic lane-padded Pallas"

    def init_fn(call_key):
        init_keys = jax.vmap(
            lambda r: jax.random.fold_in(rng.init_key(call_key), r)
        )(jnp.arange(batch))
        state = jax.vmap(lambda k: model.init_state(init_kind, k))(
            init_keys)
        return pack(state)

    def make_body(call_key):
        def with_or(planes, key):
            planes = sweep_fn(planes, key)
            planes = lax.fori_loop(
                0, n_over_relax - 1,
                lambda i, p: or_fn(p), planes)
            return or_meas_fn(planes)

        def body(planes, t):
            key = rng.sweep_key(call_key, t)
            if n_over_relax == 0:
                return sweep_meas_fn(planes, key)
            if mcs_or >= mcs:
                return with_or(planes, key)
            return lax.cond(
                t <= mcs_or,
                lambda p: with_or(p, key),
                lambda p: sweep_meas_fn(p, key),
                planes,
            )

        return body

    budget_sweeps = _sweeps_per_dispatch(
        model.nsites * (1 + max(n_over_relax, 0)), batch, 1.0e10)
    if mcs > budget_sweeps:
        def chunk_fn(planes, call_key, t0, size):
            planes, series = lax.scan(
                make_body(call_key), planes, t0 + jnp.arange(1, size + 1)
            )
            return planes, jax.tree.map(
                lambda x: jnp.swapaxes(x, 0, 1), series)

        return _tag(_host_chunk_runner(
            jax.jit(init_fn), jax.jit(chunk_fn, static_argnums=3),
            mcs, budget_sweeps), name)

    def run(call_key: jax.Array) -> dict[str, jax.Array]:
        _, series = lax.scan(make_body(call_key), init_fn(call_key),
                             jnp.arange(1, mcs + 1))
        return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), series)

    return _tag(run, name)
