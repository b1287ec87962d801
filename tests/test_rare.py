"""Subset-simulation tests: Gaussian and chi-squared tail closed forms
(the ladder must reproduce probabilities plain MC cannot see at these
sample counts), the non-rare direct path, conditional-expectation
diagnostics, and validation contracts."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats

from mlmc_tpu.rare import subset_simulation


def test_gaussian_tail_closed_form():
    """P[theta_0 > 4] = Phi(-4) = 3.167e-5 in d=6: five p0=0.1 rungs.
    Plain MC at the same 2048-particle budget would see ~0 hits."""
    exact = stats.norm.sf(4.0)
    out = subset_simulation(lambda th: th[0], gamma=4.0, d=6,
                            n_particles=2048, n_moves=8,
                            key=jax.random.key(1))
    assert abs(out["log_p"] - np.log(exact)) < 5 * out["log_p_se"] + 0.05
    assert out["p_lo"] < out["p"] < out["p_hi"]
    assert out["n_stages"] >= 4                 # it really laddered
    assert out["thresholds"][-1] == 4.0
    # adapted acceptance lands in the conditional-sampling band
    assert 0.2 < out["acc_rates"][-1] < 0.7


def test_chi2_tail_nonlinear():
    """Spherical failure domain: P[||theta||^2 > 45] in d=10 — the
    chi-squared survival function, ~2e-6."""
    exact = stats.chi2.sf(45.0, 10)
    out = subset_simulation(lambda th: jnp.sum(th * th), gamma=45.0,
                            d=10, n_particles=2048, n_moves=8,
                            key=jax.random.key(2))
    assert abs(out["log_p"] - np.log(exact)) < 5 * out["log_p_se"] + 0.1
    # the conditional population really lives on the event
    assert np.all(np.sum(out["theta"] ** 2, axis=1) > 45.0)


def test_not_rare_direct():
    """gamma below the (1-p0) quantile: single direct MC stage."""
    out = subset_simulation(lambda th: th[0], gamma=0.0, d=3,
                            n_particles=2048, key=jax.random.key(3))
    assert out["n_stages"] == 1
    assert abs(out["p"] - 0.5) < 0.05


def test_conditional_qoi():
    """E[theta_0 | theta_0 > 3] = phi(3)/Phi(-3) = 3.283; the other
    coordinates stay centered."""
    exact = stats.norm.pdf(3.0) / stats.norm.sf(3.0)
    out = subset_simulation(lambda th: th[0], gamma=3.0, d=4,
                            n_particles=2048, n_moves=8,
                            qoi_fn=lambda th: th, key=jax.random.key(4))
    assert abs(out["cond_qoi"][0] - exact) < \
        6 * out["cond_qoi_se"][0] + 0.05
    assert np.all(np.abs(out["cond_qoi"][1:]) <
                  6 * out["cond_qoi_se"][1:] + 0.1)


def test_validation():
    with pytest.raises(ValueError, match="divisible"):
        subset_simulation(lambda th: th[0], gamma=1.0, d=2,
                          n_particles=100)
    with pytest.raises(ValueError, match="p0"):
        subset_simulation(lambda th: th[0], gamma=1.0, d=2,
                          n_particles=2048, p0=1.5)
    # a response bounded below gamma must fail loudly, not loop
    with pytest.raises(RuntimeError, match="ladder"):
        subset_simulation(lambda th: jnp.tanh(th[0]), gamma=2.0, d=2,
                          n_particles=512, max_stages=8,
                          key=jax.random.key(5))
    # a response that TIES at gamma (clipped) must fail loudly, not
    # return p ~ 0 with a NaN conditional population
    with pytest.raises(RuntimeError, match="ties"):
        subset_simulation(lambda th: jnp.minimum(th[0], 1.0), gamma=1.0,
                          d=2, n_particles=512, key=jax.random.key(6))
