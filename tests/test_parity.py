"""Numerical parity: device pipelines vs independent numpy f64 computation
on the SAME sample draws (x64 enabled by conftest).

The BASELINE.json north star asks for agreement with reference estimates to
1e-10; since the reference is numpy f64, we verify the fused device
estimator reproduces a from-scratch numpy f64 implementation of the same
telescoped estimator exactly (same keys -> same draws -> sums agree to
accumulation-order noise ~1e-12).
"""
import numpy as np
import jax
import jax.numpy as jnp

from mlmc_tpu.moments import Legendre
from mlmc_tpu.random.distributions import Norm
from mlmc_tpu.sim.synth_simulation import SynthSimulation
from mlmc_tpu.ops.fused_estimate import fused_level_moments


def _numpy_reference_level(level_key, n, chunk, fine_step, coarse_step,
                           domain, R, is_level0):
    """From-scratch numpy f64 mirror of one level's telescoped moment sums,
    drawing the SAME samples (jax keys) as the device pipeline."""
    a, b = domain
    sums = np.zeros(R)
    sums2 = np.zeros(R)
    cov_f = np.zeros((R, R))
    cov_c = np.zeros((R, R))
    n_valid = 0
    n_chunks = -(-n // chunk)
    for c in range(n_chunks):
        idx = np.arange(c * chunk, (c + 1) * chunk, dtype=np.uint32)
        keys = jax.vmap(lambda j: jax.random.fold_in(level_key, j))(
            jnp.asarray(idx))
        # same split/draw structure as SynthSimulation.scalar_batch_fn
        def draw(key):
            vk, _ = jax.random.split(key)
            return jax.random.normal(vk, ())
        x = np.asarray(jax.vmap(draw)(keys), dtype=np.float64)
        in_range = idx < n

        err = np.sqrt(1e-4 + np.abs(x))
        fine = x + fine_step * err
        coarse = x + coarse_step * err
        t_f = (fine - a) / (b - a) * 2 - 1
        t_c = (coarse - a) / (b - a) * 2 - 1
        valid = in_range & (np.abs(t_f) <= 1)
        if not is_level0:
            valid = valid & (np.abs(t_c) <= 1)
        pf = np.polynomial.legendre.legvander(t_f, R - 1) * valid[:, None]
        pc = (np.zeros_like(pf) if is_level0
              else np.polynomial.legendre.legvander(t_c, R - 1) * valid[:, None])
        d = pf - pc
        sums += d.sum(0)
        sums2 += (d * d).sum(0)
        cov_f += pf.T @ pf
        cov_c += pc.T @ pc
        n_valid += int(valid.sum())
    return sums, sums2, cov_f, cov_c, n_valid


def test_fused_pipeline_f64_parity():
    """Device fused estimator == numpy f64 mirror to ~1e-12 (same draws)."""
    assert jax.config.read("jax_enable_x64")
    R = 25
    domain = (-4.0, 4.0)
    mfn = Legendre(R, domain)
    n, chunk = 20000, 4096
    distr = Norm()

    for lvl, (h, hc) in enumerate([(0.5, 0.0), (0.25, 0.5)]):
        fn = SynthSimulation.scalar_batch_fn(h, hc, distr)
        level_key = jax.random.fold_in(jax.random.key(11), lvl)
        acc = fused_level_moments(fn, mfn, level_key, n, chunk,
                                  is_level0=(lvl == 0),
                                  acc_dtype=jnp.float64)
        s, s2, cf, cc, nv = _numpy_reference_level(
            level_key, n, chunk, h, hc, domain, R, lvl == 0)

        assert int(acc.n_valid) == nv
        # identical draws -> agreement limited only by summation order
        assert np.allclose(np.asarray(acc.sums), s, rtol=0, atol=1e-10)
        assert np.allclose(np.asarray(acc.sums2), s2, rtol=1e-13, atol=1e-10)
        assert np.allclose(np.asarray(acc.cov_fine), cf, rtol=1e-13, atol=1e-9)
        assert np.allclose(np.asarray(acc.cov_coarse), cc, rtol=1e-13,
                           atol=1e-9)
