from cuda_fortran_mc_simulation_spin_tpu.models.clock import Clock2D  # noqa: F401
from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D  # noqa: F401
from cuda_fortran_mc_simulation_spin_tpu.models.ising3d import Ising3D  # noqa: F401
from cuda_fortran_mc_simulation_spin_tpu.models.xy2d import XY2D  # noqa: F401


def build_model(cfg):
    """RunConfig -> model instance (the reference selects engines at the
    fpm-target level; here it is one config field)."""
    backend = "auto"
    if cfg.use_pallas is True:
        backend = "pallas"
    elif cfg.use_pallas is False:
        backend = "jnp"
    if cfg.model == "ising2d":
        return Ising2D(nx=cfg.nx, ny=cfg.ny, kbt=cfg.kbt, backend=backend)
    if cfg.model == "ising3d":
        return Ising3D(nx=cfg.nx, ny=cfg.ny, nz=cfg.nz, kbt=cfg.kbt,
                       backend=backend)
    if cfg.model == "clock":
        return Clock2D(nx=cfg.nx, ny=cfg.ny, kbt=cfg.kbt, q=cfg.q,
                       backend=backend)
    if cfg.model == "xy2d":
        return XY2D(nx=cfg.nx, ny=cfg.ny, kbt=cfg.kbt, backend=backend)
    raise ValueError(f"unknown model {cfg.model!r}")
