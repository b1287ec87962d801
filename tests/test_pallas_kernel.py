"""Pallas fused kernel correctness.

The deterministic body (QoI -> Legendre Vandermonde -> sums/cov) is tested
EXACTLY against numpy via the noise-input variant (interpret mode on the
CPU mesh; on-core RNG has no CPU emulation — pltpu.prng_random_bits is a
zero stub there, so the RNG variant runs only on real TPU via bench.py).
"""
import numpy as np
import pytest
import jax

from mlmc_tpu.ops.pallas_kernels import synth_moment_pipeline_from_noise
from mlmc_tpu.moments import Legendre


R = 8
DOMAIN = (-4.0, 4.0)
FINE, COARSE = 0.25, 0.5
N = 8192 * 2


def _numpy_reference(x):
    """Exact numpy mirror of the kernel body."""
    mfn = Legendre(R, DOMAIN, safe_eval=False)
    err = np.sqrt(1e-4 + np.abs(x))
    fine = x + FINE * err
    coarse = x + COARSE * err
    t_f = (fine - 0.0) * (2.0 / 8.0)
    t_c = (coarse - 0.0) * (2.0 / 8.0)
    valid = (np.abs(t_f) <= 1) & (np.abs(t_c) <= 1)
    pf = np.polynomial.legendre.legvander(t_f, R - 1) * valid[:, None]
    pc = np.polynomial.legendre.legvander(t_c, R - 1) * valid[:, None]
    d = pf - pc
    return dict(
        sums=d.sum(0), sums2=(d * d).sum(0),
        cov_f=pf.T @ pf, cov_c=pc.T @ pc, n_valid=valid.sum())


def test_kernel_exact_vs_numpy():
    rng = np.random.default_rng(0)
    # include values outside the domain to exercise the zero-column path
    x = np.concatenate([rng.normal(size=N - 64),
                        rng.uniform(3.2, 6.0, size=64)]).astype(np.float32)
    rng.shuffle(x)

    r = jax.tree.map(np.asarray, synth_moment_pipeline_from_noise(
        x, R, fine_step=FINE, coarse_step=COARSE, domain=DOMAIN,
        chunk=8192, interpret=True))
    ref = _numpy_reference(x.astype(np.float64))

    assert float(r.n_valid) == ref["n_valid"]
    assert np.allclose(r.sums, ref["sums"], rtol=1e-4, atol=1e-3)
    assert np.allclose(r.sums2, ref["sums2"], rtol=1e-4, atol=1e-3)
    assert np.allclose(r.cov_fine, ref["cov_f"], rtol=1e-4, atol=2e-2)
    assert np.allclose(r.cov_coarse, ref["cov_c"], rtol=1e-4, atol=2e-2)


def test_kernel_accumulates_across_chunks():
    """Two chunks == concatenation of per-chunk numpy results."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=N).astype(np.float32)
    r_all = jax.tree.map(np.asarray, synth_moment_pipeline_from_noise(
        x, R, fine_step=FINE, coarse_step=COARSE, domain=DOMAIN,
        chunk=8192, interpret=True))
    ref = _numpy_reference(x.astype(np.float64))
    assert np.allclose(r_all.sums, ref["sums"], rtol=1e-4, atol=1e-3)
    assert float(r_all.n_valid) == ref["n_valid"]


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="on-core PRNG requires real TPU")
def test_kernel_rng_statistics():
    from mlmc_tpu.ops.pallas_kernels import synth_moment_pipeline

    r = jax.tree.map(np.asarray, synth_moment_pipeline(
        7, R, 1 << 20, fine_step=FINE, coarse_step=COARSE, domain=DOMAIN))
    n = float(r.n_valid)
    assert n > 0.99 * (1 << 20)
    assert abs(r.cov_fine[0, 0] / n - 1) < 1e-6


def test_from_samples_generic():
    """Generic stored-samples kernel vs numpy on arbitrary QoIs with NaNs."""
    from mlmc_tpu.ops.pallas_kernels import moment_pipeline_from_samples

    rng = np.random.default_rng(5)
    n = 10000  # non-multiple of chunk -> tail padding path
    fine = rng.normal(0, 1.5, size=n)
    coarse = fine + rng.normal(0, 0.1, size=n)
    fine[::97] = np.nan  # masked results
    coarse[::131] = np.nan

    r = jax.tree.map(np.asarray, moment_pipeline_from_samples(
        fine, coarse, R, domain=DOMAIN, chunk=2048, interpret=True))

    mfn = Legendre(R, DOMAIN, safe_eval=False)
    t_f, t_c = fine / 4.0, coarse / 4.0
    valid = (~np.isnan(fine)) & (~np.isnan(coarse)) \
        & (np.abs(t_f) <= 1) & (np.abs(t_c) <= 1)
    pf = np.polynomial.legendre.legvander(np.nan_to_num(t_f), R - 1) \
        * valid[:, None]
    pc = np.polynomial.legendre.legvander(np.nan_to_num(t_c), R - 1) \
        * valid[:, None]
    d = pf - pc
    assert float(r.n_valid) == valid.sum()
    assert np.allclose(r.sums, d.sum(0), rtol=1e-4, atol=1e-3)
    assert np.allclose(r.cov_fine, pf.T @ pf, rtol=1e-4, atol=2e-2)


def test_from_samples_level0():
    from mlmc_tpu.ops.pallas_kernels import moment_pipeline_from_samples

    rng = np.random.default_rng(8)
    fine = rng.normal(size=4096)
    r = jax.tree.map(np.asarray, moment_pipeline_from_samples(
        fine, np.zeros_like(fine), R, domain=DOMAIN, chunk=2048,
        is_level0=True, interpret=True))
    mfn_v = np.polynomial.legendre.legvander(fine / 4.0, R - 1)
    assert np.allclose(r.sums, mfn_v.sum(0), rtol=1e-4, atol=1e-3)
    assert np.allclose(r.cov_coarse, 0.0)


def test_estimate_moments_fast_matches_regular():
    """Fast path == regular estimate_mean on the same stored samples."""
    from mlmc_tpu import Memory, SynthSimulation, DeviceBatchPool, Sampler
    from mlmc_tpu import estimator as est_mod
    from mlmc_tpu.quantity.quantity import make_root_quantity
    from mlmc_tpu.random.distributions import Norm

    distr = Norm()
    sim = SynthSimulation(dict(distr=distr, complexity=2))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=13, min_bucket=64),
                      sim, [[0.1], [0.01]])
    sampler.set_initial_n_samples([300, 80])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    q = make_root_quantity(storage, q_specs=sim.result_format())
    vq = q["length"][1]["10"][0]
    mfn = Legendre(6, distr.ppf([0.001, 0.999]))
    est = est_mod.Estimate(vq, storage, mfn)
    means_ref, vars_ref = est.estimate_moments(mfn)
    means_fast, vars_fast = est.estimate_moments_fast(mfn)
    # fast path computes in f32 -> tolerance accordingly
    assert np.allclose(np.asarray(means_ref), means_fast, atol=5e-5)
    assert np.allclose(np.asarray(vars_ref), vars_fast, rtol=1e-3, atol=1e-7)
