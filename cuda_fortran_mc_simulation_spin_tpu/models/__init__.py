from cuda_fortran_mc_simulation_spin_tpu.models.ising2d import Ising2D  # noqa: F401
