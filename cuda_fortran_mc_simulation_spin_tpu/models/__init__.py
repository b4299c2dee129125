from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D  # noqa: F401
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D  # noqa: F401
from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D  # noqa: F401
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D  # noqa: F401


def build_model(cfg):
    """RunConfig -> model instance (the reference selects engines at the
    fpm-target level; here it is one config field).

    Odd nx selects the helical (skew-periodic) flat engines for ising2d
    and xy2d — the reference's exact committed geometries (1001×1000,
    10001×10000) run unchanged; even sizes use the canonical dual-color
    periodic engines.
    """
    backend = "auto"
    if cfg.use_pallas is True:
        backend = "pallas"
    elif cfg.use_pallas is False:
        backend = "jnp"
    if cfg.model == "ising2d":
        if cfg.nx % 2 == 1:
            from cuda_fortran_mc_simulation_spin_tpu.models.\
                ising2d_helical import Ising2DHelical
            return Ising2DHelical(nx=cfg.nx, ny=cfg.ny, kbt=cfg.kbt)
        return Ising2D(nx=cfg.nx, ny=cfg.ny, kbt=cfg.kbt, backend=backend)
    if cfg.model == "ising3d":
        if cfg.nx % 2 == 1:
            # the reference's committed 3-D geometries are odd-nx
            # helical: 151x151x150, 501x501x500, 1001x1000x1000
            # (/root/reference/scripts/fpm_run_ising3d.sh:7-9,
            # app/ising3d_gpu_relaxation.f90:8-10)
            from cuda_fortran_mc_simulation_spin_tpu.models.\
                ising3d_helical import Ising3DHelical
            return Ising3DHelical(nx=cfg.nx, ny=cfg.ny, nz=cfg.nz,
                                  kbt=cfg.kbt)
        return Ising3D(nx=cfg.nx, ny=cfg.ny, nz=cfg.nz, kbt=cfg.kbt,
                       backend=backend)
    if cfg.model == "clock":
        if cfg.nx % 2 == 1:
            from cuda_fortran_mc_simulation_spin_tpu.models.\
                clock_helical import Clock2DHelical
            return Clock2DHelical(nx=cfg.nx, ny=cfg.ny, kbt=cfg.kbt,
                                  q=cfg.q)
        return Clock2D(nx=cfg.nx, ny=cfg.ny, kbt=cfg.kbt, q=cfg.q,
                       backend=backend)
    if cfg.model == "xy2d":
        if cfg.nx % 2 == 1:
            from cuda_fortran_mc_simulation_spin_tpu.models.\
                xy2d_helical import XY2DHelical
            return XY2DHelical(nx=cfg.nx, ny=cfg.ny, kbt=cfg.kbt)
        return XY2D(nx=cfg.nx, ny=cfg.ny, kbt=cfg.kbt, backend=backend)
    raise ValueError(f"unknown model {cfg.model!r}")
