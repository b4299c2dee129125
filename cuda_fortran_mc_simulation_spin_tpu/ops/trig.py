"""Fast unit-circle trigonometry for the XY/clock hot paths.

The XY Metropolis kernel needs (cos 2πu, sin 2πu) per site per sweep
(candidate spin, /root/reference/src/xy2d_periodic_gpu_m.f90:368-387).
The TPU VPU's hardware cos/sin are multi-pass ops: at 1536² the whole
phase kernel runs 1.95 Gsite/s with them and 3.09 Gsite/s with the
polynomial below (measured, BENCHMARKS.md) — the pair of
transcendentals costs more than the entire rest of the kernel.

``cos_sin_2pi`` folds the angle to a quarter period and evaluates
degree-3 minimax polynomials in r² (Chebyshev-fitted over r ∈ [-½, ½]
quarter-turns): max abs error 1.1e-7 vs float64, |S|−1 ≤ 1.3e-7 —
float32 roundoff level, so no renormalization is needed (the VPU
transcendentals are only ~1 ulp better).

Used by BOTH the jnp model paths and the Pallas kernels so the
bitwise jnp↔kernel equivalence tests keep holding: the helper is pure
mul/add/select jnp, which lowers identically in XLA and Mosaic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# cos((π/2) r) ≈ C0 + C1 r² + C2 r⁴ + C3 r⁶,  r ∈ [-0.5, 0.5]
_C = (9.9999998075e-01, -1.2336977754e+00,
      2.5360837309e-01, -2.0438343895e-02)
# sin((π/2) r) ≈ r (S0 + S1 r² + S2 r⁴ + S3 r⁶)
_S = (1.5707963234e+00, -6.4596361199e-01,
      7.9681932446e-02, -4.6074307448e-03)


def cos_sin_2pi(u: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(cos 2πu, sin 2πu) for u ∈ [0, 1), f32 in / f32 out.

    Quadrant fold: 2πu = (π/2)(n + r) with n ∈ {0..4}, |r| ≤ ½; the
    quarter-period (cos, sin) pair is rotated into place by n mod 4
    with selects and one sign flip.
    """
    u = u.astype(jnp.float32)
    a = 4.0 * u
    n = jnp.floor(a + 0.5)
    r = a - n
    m = n.astype(jnp.int32) & 3
    w = r * r
    cq = jnp.float32(_C[0]) + w * (
        jnp.float32(_C[1]) + w * (jnp.float32(_C[2])
                                  + w * jnp.float32(_C[3])))
    sq = r * (jnp.float32(_S[0]) + w * (
        jnp.float32(_S[1]) + w * (jnp.float32(_S[2])
                                  + w * jnp.float32(_S[3]))))
    swap = (m & 1) == 1
    c = jnp.where(swap, -sq, cq)
    s = jnp.where(swap, cq, sq)
    sign = jnp.where(m >= 2, jnp.float32(-1.0), jnp.float32(1.0))
    return sign * c, sign * s
