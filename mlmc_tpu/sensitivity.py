"""Variance-based global sensitivity analysis (Sobol' indices) — beyond
the reference, which has no sensitivity-analysis capability at all.

A UQ framework that estimates E[Q] and reconstructs densities is usually
asked the next question too: WHICH inputs drive the variance of Q?
First-order indices ``S_i = Var(E[Q|x_i])/Var(Q)`` and total-effect
indices ``S_Ti = 1 − Var(E[Q|x_~i])/Var(Q)`` answer it, and the standard
estimators (Saltelli's pick-freeze design with Jansen's 1999 difference
estimators — the configuration recommended by Saltelli et al. 2010,
"Variance based sensitivity analysis of model output") are a perfect TPU
workload: one design matrix of ``n·(d+2)`` model evaluations, reduced to
``2d+4`` accumulator scalars, all inside one jitted program.

TPU-first design (mirrors `mlmc_tpu.qmc.MLQMC`'s streaming economics):

- the pick-freeze blocks A and B are the first/last ``d`` columns of ONE
  ``2d``-dimensional Owen-scrambled Sobol' sequence (`ops.sobol`), so
  the design itself converges at QMC rates;
- ``R`` independent scramblings run vmapped in one dispatch; indices are
  estimated per scrambling and the spread across scramblings gives
  honest standard errors (the same randomization story as MLQMC);
- the chunk loop has a traced trip count — ONE executable serves every
  ``n`` — and only ``[R, 2d+4]`` accumulators cross the host link;
- f32 accumulation is compensated with the fusion-hardened two_sum
  (`ops/df64`), as in the MLQMC driver.

Estimators (per scrambling; f_A, f_B, f_ABi are the model on the A / B /
"A with column i from B" blocks):

- variance: pooled unbiased variance of (f_A, f_B)
- first order (Jansen):  V_i  = V − Σ_j (f_B − f_ABi)² / (2n)
- total effect (Jansen): VT_i =      Σ_j (f_A − f_ABi)² / (2n)
"""
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mlmc_tpu.ops import sobol

__all__ = ["sobol_indices", "SobolIndices"]


class SobolIndices(dict):
    """Result mapping with attribute access (``res.first_order`` ==
    ``res["first_order"]``)."""

    __getattr__ = dict.__getitem__


def sobol_indices(fn: Callable, dim: int, n: int = 1 << 13,
                  n_randomizations: int = 8, seed: int = 0,
                  chunk_size: int = 1 << 11, dtype=None,
                  transform: Optional[Callable] = None) -> SobolIndices:
    """Estimate first-order and total-effect Sobol' indices of ``fn``.

    :param fn: pure jnp model ``f(x [m, dim]) -> y [m]`` over the unit
        hypercube (after ``transform``, if given)
    :param dim: number of input factors
    :param n: pick-freeze design size per randomization (rounded up to a
        multiple of the chunk; total model evaluations are
        ``n_randomizations · n · (dim + 2)``)
    :param n_randomizations: independent Owen scramblings; indices are
        estimated per scrambling and reported as mean ± standard error
        across them
    :param seed: scramble master seed
    :param chunk_size: design points per scan step inside the dispatch
    :param dtype: accumulation dtype (default: jnp.result_type(float))
    :param transform: optional pointwise map applied to the uniform
        design columns before ``fn`` (e.g.
        ``mlmc_tpu.ops.sobol.normals_from_uniforms`` for Gaussian
        factors) — applied to A and B once, so frozen columns are
        bit-identical across the AB_i blocks
    :return: :class:`SobolIndices` with ``first_order`` / ``total_effect``
        ``[dim]`` arrays, their ``*_se`` standard errors, ``variance``,
        ``mean``, ``n`` and ``n_evaluations``
    """
    dim = int(dim)
    if dim < 1:
        raise ValueError("dim must be >= 1")
    R = int(n_randomizations)
    if R < 2:
        raise ValueError("need >= 2 randomizations for standard errors")
    chunk = int(chunk_size)
    if chunk & (chunk - 1):
        raise ValueError("chunk_size must be a power of two")
    n = int(n)
    chunk = min(chunk, max(64, 1 << (n - 1).bit_length()))
    n_chunks = -(-n // chunk)
    n = n_chunks * chunk
    work_dtype = jnp.dtype(dtype or jnp.result_type(float))

    dv = jnp.asarray(sobol.direction_numbers(2 * dim))
    key = jax.random.key(seed)
    seeds = jax.vmap(lambda k: sobol.scramble_seeds(k, 2 * dim))(
        jax.random.split(key, R))                    # [R, 2d]

    if work_dtype == jnp.float32:
        from mlmc_tpu.ops.df64 import two_sum
    else:
        def two_sum(a, b):
            return a + b, jnp.zeros_like(a)

    eye = jnp.eye(dim, dtype=bool)

    def eval_blocks(start, sds):
        u = sobol.sobol_uniforms(dv, start, chunk, sds, dtype=work_dtype)
        a, b = u[:, :dim], u[:, dim:]
        if transform is not None:
            a, b = transform(a), transform(b)
        f_a = fn(a)
        f_b = fn(b)
        # AB_i: A with column i taken from B — [d, chunk, dim]
        ab = jnp.where(eye[:, None, :], b[None], a[None])
        f_ab = fn(ab.reshape(dim * chunk, dim)).reshape(dim, chunk)
        return f_a.astype(work_dtype), f_b.astype(work_dtype), \
            f_ab.astype(work_dtype)

    def one_rand(n_chunks, sds):
        zs = jnp.zeros((), work_dtype)
        zd = jnp.zeros((dim,), work_dtype)
        init = ((zs, zs), (zs, zs), (zs, zs), (zs, zs), (zd, zd), (zd, zd))

        def add(c, x):
            s, e = two_sum(c[0], x)
            return s, c[1] + e

        def body(c, carry):
            sa, sa2, sb, sb2, d1, dt = carry
            f_a, f_b, f_ab = eval_blocks(
                jnp.uint32(c) * jnp.uint32(chunk), sds)
            sa = add(sa, jnp.sum(f_a))
            sa2 = add(sa2, jnp.sum(f_a * f_a))
            sb = add(sb, jnp.sum(f_b))
            sb2 = add(sb2, jnp.sum(f_b * f_b))
            d1 = add(d1, jnp.sum((f_b[None] - f_ab) ** 2, axis=1))
            dt = add(dt, jnp.sum((f_a[None] - f_ab) ** 2, axis=1))
            return sa, sa2, sb, sb2, d1, dt

        out = jax.lax.fori_loop(0, n_chunks, body, init)
        return tuple(s + e for s, e in out)

    @jax.jit
    def run(n_chunks, seeds):
        return jax.vmap(lambda sd: one_rand(n_chunks, sd))(seeds)

    sa, sa2, sb, sb2, d1, dt = jax.device_get(run(n_chunks, seeds))
    sa, sa2, sb, sb2 = (np.asarray(x, np.float64) for x in (sa, sa2, sb, sb2))
    d1, dt = np.asarray(d1, np.float64), np.asarray(dt, np.float64)
    if not all(np.all(np.isfinite(x)) for x in (sa, sa2, sb, sb2, d1, dt)):
        raise FloatingPointError(
            "model produced non-finite values on the design; Sobol-index "
            "estimators cannot drop points without bias")

    m = (sa + sb) / (2 * n)                       # [R]
    var = ((sa2 + sb2) / (2 * n) - m * m) * (2 * n) / (2 * n - 1)
    if np.any(var <= 0):
        raise ValueError("model variance is zero on the design; "
                         "Sobol' indices are undefined")
    s1 = (var[:, None] - d1 / (2 * n)) / var[:, None]      # [R, d]
    st = (dt / (2 * n)) / var[:, None]

    def agg(x):
        return (np.mean(x, axis=0),
                np.std(x, axis=0, ddof=1) / np.sqrt(R))

    s1_m, s1_se = agg(s1)
    st_m, st_se = agg(st)
    return SobolIndices(
        first_order=s1_m, first_order_se=s1_se,
        total_effect=st_m, total_effect_se=st_se,
        variance=float(np.mean(var)), mean=float(np.mean(m)),
        n=n, n_randomizations=R, n_evaluations=R * n * (dim + 2))
