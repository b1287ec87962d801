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
