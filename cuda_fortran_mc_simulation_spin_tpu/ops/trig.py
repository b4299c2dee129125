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


# e^(-r) ≈ Σ _ER[k] r^k on r ∈ [-ln2/2, ln2/2] (Chebyshev, rel 6e-9)
_ER = (9.9999999997e-01, -1.0000000281e+00, 5.0000000844e-01,
       -1.6666455876e-01, 4.1666280339e-02, -8.3719121942e-03,
       1.3944600787e-03)
_LOG2E = 1.4426950408889634
# Cody-Waite ln2 split: hi has 9 mantissa bits, so n·hi is exact for
# the n ≤ 182 this domain produces; lo mops up the rest
_LN2_HI = 0.693359375
_LN2_LO = -2.1219444005469057e-04


def exp_neg(x: jax.Array) -> jax.Array:
    """e^(-x) for x ≥ 0, f32 — the Metropolis acceptance probability
    exp(-βΔE) (clamped ΔE ≥ 0).  n = round(x·log₂e); r = x - n·ln2 via
    a Cody-Waite hi/lo split (argument reduction stays exact); e^(-r)
    by polynomial; 2^(-n) by writing the exponent bits directly.

    Rel err ≤ ~2e-7 (f32 roundoff); exp_neg(0) == 1.0 exactly, so
    ΔE ≤ 0 always accepts.  n is clamped so the exponent never wraps:
    p < 2^-126 is unreachable anyway (uniforms have 2^-24 granularity,
    so any p below that never accepts)."""
    x = x.astype(jnp.float32)
    # magic-number round-to-nearest: adding 1.5·2²³ forces the mantissa
    # to integer precision; the low mantissa bits then ARE the integer,
    # so no round op and no float→int convert
    t = x * jnp.float32(_LOG2E) + jnp.float32(12582912.0)
    n = t - jnp.float32(12582912.0)
    ni = jax.lax.bitcast_convert_type(t, jnp.int32) - jnp.int32(0x4B400000)
    r = (x - n * jnp.float32(_LN2_HI)) - n * jnp.float32(_LN2_LO)
    p = jnp.float32(_ER[6])
    for c in (_ER[5], _ER[4], _ER[3], _ER[2], _ER[1], _ER[0]):
        p = p * r + jnp.float32(c)
    ni = jnp.minimum(ni, jnp.int32(126))
    scale = jax.lax.bitcast_convert_type(
        (jnp.int32(127) - ni) << jnp.int32(23), jnp.float32
    )
    return p * scale


def cos_sin_2pi(u: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(cos 2πu, sin 2πu) for u ∈ (-1, 1), f32 in / f32 out.

    Quadrant fold: 2πu = (π/2)(n + r) with n ∈ {-4..4}, |r| ≤ ½; the
    quarter-period (cos, sin) pair is rotated into place by n mod 4
    with selects and one sign flip.  Negative u is a supported part of
    the domain (xy2d_multisweep feeds int16-unit phase *differences*
    in (-1, 1)): `jnp.floor` rounds toward -∞ and the int32 `& 3`
    is two's-complement, so together they implement a true mod-4 —
    do not replace them with a truncating cast or a float `% 4`.
    Accuracy degrades gracefully for large |u| (argument reduction is
    exact only while 4u stays within f32 integer precision).
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


# atan(t)/(2π) on the half-octant |t| ≤ tan(π/8): odd minimax fit,
# max err 4.6e-8 turns (least-squares on 2e5 points)
_AT = (1.5915465081e-01, -5.3026171236e-02,
       3.1232619285e-02, -1.7416252601e-02)
_TAN_PI_8 = 0.41421356237309503


def atan2_2pi(y: jax.Array, x: jax.Array) -> jax.Array:
    """atan2(y, x) in TURNS ∈ [-0.5, 0.5], f32 — the over-relaxation
    reflection angle of the local field (θ' = 2φ - θ needs φ once per
    site; the VPU's multi-pass transcendental is avoided like cos/sin
    above).  Half-octant reduction: one divide, a degree-7 odd
    polynomial, then octant fixups in turns (no π multiplications).
    Max abs error ~5e-8 turns vs float64.  atan2_2pi(0, 0) = 0."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(ax, ay)
    # fold [tan(π/8), 1] -> [-tan(π/8), tan(π/8)]: atan(n/d) = π/4 +
    # atan((n-d)/(n+d)); one select keeps the single divide
    fold = num > jnp.float32(_TAN_PI_8) * den
    s1 = jnp.where(fold, num - den, num)
    s2 = jnp.where(fold, num + den, den)
    t = s1 / jnp.maximum(s2, jnp.float32(1e-37))
    w = t * t
    r = t * (jnp.float32(_AT[0]) + w * (
        jnp.float32(_AT[1]) + w * (jnp.float32(_AT[2])
                                   + w * jnp.float32(_AT[3]))))
    r = jnp.where(fold, r + jnp.float32(0.125), r)
    r = jnp.where(ay > ax, jnp.float32(0.25) - r, r)
    r = jnp.where(x < 0, jnp.float32(0.5) - r, r)
    return jnp.where(y < 0, -r, r)
