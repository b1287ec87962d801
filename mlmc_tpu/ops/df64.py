"""Double-float (two-f32) arithmetic for f32-only accelerators.

A double-float ("df") number is an unevaluated pair of f32s ``(hi, lo)``
with ``hi = fl(hi + lo)``, carrying ~49 significant bits — enough to track
an all-f64 host computation to ~1e-14 relative per operation on hardware
whose widest native float is f32 (TPU VPU).

This module is the shared primitive layer:

* error-free transforms: ``two_sum`` (Knuth), ``fast_two_sum`` (Dekker),
  ``two_prod`` via 12-bit Dekker splits — branch-free, contraction-safe
  (an FMA formed by the compiler only sharpens the error terms),
* df ring ops (``df_add``/``df_sub``/``df_mul``/``df_div`` and the
  exact-f32-operand shortcuts), accurate to ~2^-48 relative,
* pairwise-halving reductions and dot products along an axis,
* ``df_exp``: range-reduced Taylor evaluation in df arithmetic with an
  EXACT power-of-two rescale (bit-constructed, no transcedental ``exp2``
  — TPU approximates transcendentals), ~1e-13 relative over |x| <= 80,
* host-side f64 <-> df conversion helpers.

Everything is plain jnp and runs identically under jit on CPU/TPU and
inside Pallas kernel bodies (``ops/pallas_extended.py`` imports its EFTs
from here). Division is safe on hardware with approximate dividers: the
quotient is refined from an exactly-computed remainder.

Used by the extended-precision estimation tier (ops/pallas_extended.py)
and the on-device maxent Newton solver (tool/simple_distribution.py) —
the pieces that track the reference's all-f64 numpy pipeline
(reference mlmc/quantity/quantity_estimate.py:64-77,
mlmc/tool/simple_distribution.py:259-327) on f32 hardware.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ #
# error-free transformations
# ------------------------------------------------------------------ #
def two_sum(a, b):
    """Exact addition: fl(a+b) plus its rounding error (Knuth)."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def fast_two_sum(a, b):
    """Exact addition assuming |a| >= |b|."""
    s = a + b
    return s, b - (s - a)


def split12(a):
    """Dekker split into 12-bit halves."""
    c = a * 4097.0
    ah = c - (c - a)
    return ah, a - ah


def two_prod(a, b):
    """Exact product: fl(a*b) plus its rounding error (Dekker; an FMA
    contraction of any sub-term only makes the error term sharper)."""
    p = a * b
    ah, al = split12(a)
    bh, bl = split12(b)
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


# ------------------------------------------------------------------ #
# df ring operations
# ------------------------------------------------------------------ #
def df_add(ahi, alo, bhi, blo):
    """df + df (Joldes et al. accurate DW+DW, ~2^-48 relative error)."""
    sh, sl = two_sum(ahi, bhi)
    th, tl = two_sum(alo, blo)
    vh, vl = fast_two_sum(sh, sl + th)
    return fast_two_sum(vh, vl + tl)


def df_neg(hi, lo):
    return -hi, -lo


def df_sub(ahi, alo, bhi, blo):
    return df_add(ahi, alo, -bhi, -blo)


def df_mul(ahi, alo, bhi, blo):
    """df * df (products of the lows dropped: O(2^-49) relative)."""
    p, e = two_prod(ahi, bhi)
    return fast_two_sum(p, e + (ahi * blo + alo * bhi))


def df_mul_f32(ahi, alo, c):
    """df * exact-f32 scalar."""
    p, e = two_prod(ahi, c)
    return fast_two_sum(p, e + alo * c)


def df_div_f32(ahi, alo, c):
    """df / exact-f32 scalar via one Newton correction step.

    Tolerates an approximate hardware divider: the initial quotient's
    remainder is computed exactly (two_prod) and re-divided once."""
    q0 = ahi / c
    p, e = two_prod(q0, c)
    r_hi, r_lo = df_add(ahi, alo, -p, -e)
    return fast_two_sum(q0, (r_hi + r_lo) / c)


def df_div(ahi, alo, bhi, blo):
    """df / df via quotient refinement from the exact remainder."""
    q0 = ahi / bhi
    p, e = two_prod(q0, bhi)
    r_hi, r_lo = df_add(ahi, alo, -p, -e)
    r = (r_hi + r_lo) - q0 * blo
    return fast_two_sum(q0, r / bhi)


# ------------------------------------------------------------------ #
# reductions
# ------------------------------------------------------------------ #
def _pow2_at_least(n):
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def df_sum(hi, lo, axis=-1):
    """df reduction along ``axis`` as ONE variadic ``lax.reduce`` whose
    combiner is a df add.

    A hand-built halving tree of sliced df_adds triggers pathological
    XLA:CPU compile/runtime behavior when composed with a non-trivial
    producer (measured 30 ms / compile hangs vs 0.1 ms for this form on a
    [256] reduction fed by an exp chain; optimization_barrier does not
    help). The variadic reduce is a single HLO op, so fusion heuristics
    never see the tree. XLA may apply the combiner in any association;
    df_add keeps ~2^-48 relative error per fold in every order, so the
    result error is bounded the same way (n*2^-48*max|term| worst case,
    random-sign in practice)."""
    zero = jnp.zeros((), dtype=hi.dtype)

    def comb(a, b):
        return df_add(a[0], a[1], b[0], b[1])

    return jax.lax.reduce((hi, lo), (zero, zero), comb, (axis % hi.ndim,))


def df_sum_pairwise(hi, lo, axis=-1):
    """Deterministic pairwise-halving df reduction (zero-padded to a
    power of two). Bit-reproducible association; prefer ``df_sum`` in
    compiled code (see its note on XLA pathology)."""
    hi = jnp.moveaxis(hi, axis, -1)
    lo = jnp.moveaxis(lo, axis, -1)
    n = hi.shape[-1]
    m = _pow2_at_least(n)
    if m != n:
        pad = [(0, 0)] * (hi.ndim - 1) + [(0, m - n)]
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    while m > 1:
        half = m // 2
        hi, lo = df_add(hi[..., :half], lo[..., :half],
                        hi[..., half:], lo[..., half:])
        m = half
    return hi[..., 0], lo[..., 0]


def df_dot(ahi, alo, bhi, blo, axis=-1):
    """df dot product along ``axis`` (broadcasting elementwise df_mul,
    then a pairwise df reduction)."""
    ph, plo = df_mul(ahi, alo, bhi, blo)
    return df_sum(ph, plo, axis=axis)


# ------------------------------------------------------------------ #
# exponential
# ------------------------------------------------------------------ #
_LN2 = float(np.log(np.float64(2.0)))
_LN2_HI = float(np.float32(_LN2))
_LN2_LO = float(np.float64(_LN2) - np.float64(np.float32(_LN2)))
_INV_LN2 = float(np.float32(1.0 / _LN2))
#: Taylor coefficients 1/12! .. 1/0! as df pairs (Horner order)
_EXP_COEFS = [
    (float(np.float32(1.0 / math.factorial(k))),
     float(np.float64(1.0 / math.factorial(k))
           - np.float64(np.float32(1.0 / math.factorial(k)))))
    for k in range(12, -1, -1)
]


def _exact_pow2(k):
    """2^k for integer-valued f32 k in [-126, 127], constructed from the
    exponent bits (TPU's exp2 is an approximation; this is exact)."""
    ki = k.astype(jnp.int32)
    return jax.lax.bitcast_convert_type((ki + 127) << 23, jnp.float32)


def df_exp(hi, lo, clip=80.0):
    """exp of a df argument, ~1e-13 relative over clipped |x| <= ``clip``.

    Range reduction x = k*ln2 + r with a df ln2 (both products exact via
    two_prod), degree-12 df Taylor on |r| <= ln2/2 (tail < 2^-52), exact
    2^k rescale. Arguments beyond +-clip saturate (their lo is dropped);
    80 keeps every intermediate far from f32 overflow — the maxent solver
    caps its exponents the same way the reference clips to +-200
    (reference simple_distribution.py:104), and converged densities live
    at O(1) exponents.

    Relative accuracy degrades for results below ~1e-26 (the lo limb
    underflows into f32 denormals; measured 6e-8 relative at exp(-80)) —
    ABSOLUTE error stays tiny (< 1e-33), which is what integral
    accumulation needs from the far tails.
    """
    clip = jnp.float32(clip)
    out_of_range = (hi > clip) | (hi < -clip)
    hi = jnp.clip(hi, -clip, clip)
    lo = jnp.where(out_of_range, jnp.float32(0.0), lo)

    k = jnp.round(hi * jnp.float32(_INV_LN2))
    p1, e1 = two_prod(k, jnp.float32(_LN2_HI))
    p2, e2 = two_prod(k, jnp.float32(_LN2_LO))
    r_hi, r_lo = df_add(hi, lo, -p1, -e1)
    r_hi, r_lo = df_add(r_hi, r_lo, -p2, -e2)

    c0 = _EXP_COEFS[0]
    acc_hi = jnp.full_like(r_hi, jnp.float32(c0[0]))
    acc_lo = jnp.full_like(r_hi, jnp.float32(c0[1]))
    for c_hi, c_lo in _EXP_COEFS[1:]:
        acc_hi, acc_lo = df_mul(acc_hi, acc_lo, r_hi, r_lo)
        acc_hi, acc_lo = df_add(acc_hi, acc_lo,
                                jnp.full_like(r_hi, jnp.float32(c_hi)),
                                jnp.full_like(r_hi, jnp.float32(c_lo)))
    s = _exact_pow2(k)
    return acc_hi * s, acc_lo * s


# ------------------------------------------------------------------ #
# host-side conversions
# ------------------------------------------------------------------ #
def df_const(value):
    """Split a host f64 scalar into an (hi, lo) pair of python floats."""
    hi = np.float32(value)
    lo = np.float32(np.float64(value) - np.float64(hi))
    return float(hi), float(lo)


def df_split_array(x):
    """Split a host f64 array into (hi, lo) f32 numpy arrays."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def df_to_f64(hi, lo):
    """Recombine a df pair into a host f64 array."""
    return np.asarray(hi, dtype=np.float64) + np.asarray(lo, dtype=np.float64)
