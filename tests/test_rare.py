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


def test_cross_entropy_is_gaussian_tail():
    """CE-IS reproduces the linear-Gaussian closed form P[w.theta > g]
    = Phi(-g/|w|) at p ~ 1e-7 (far beyond plain MC) with iid-weight
    error bars and a healthy weight ESS."""
    from math import erfc, sqrt
    from mlmc_tpu.rare import cross_entropy_is

    w = np.array([1.0, 2.0, -1.0, 0.5])
    w = w / np.linalg.norm(w)
    wj = jnp.asarray(w)
    gamma = 5.2
    p_exact = 0.5 * erfc(gamma / sqrt(2.0))           # ~ 1e-7
    out = cross_entropy_is(lambda th: wj @ th, gamma, d=4,
                           key=jax.random.key(0),
                           qoi_fn=lambda th: th)
    assert abs(out["p"] - p_exact) < 5 * out["p_se"], \
        (out["p"], p_exact, out["p_se"])
    assert out["p_se"] < 0.1 * p_exact                # sharp estimate
    assert out["weight_ess"] > 0.01
    # the tilt found the design point: mu ~ gamma * w
    assert np.linalg.norm(out["mu"] - gamma * w) < 0.5
    # conditional QoI given failure points along w
    cq = out["cond_qoi"] / np.linalg.norm(out["cond_qoi"])
    assert cq @ w > 0.99
    with pytest.raises(ValueError, match="rho"):
        cross_entropy_is(lambda th: wj @ th, gamma, d=4, rho=2.0)


def test_cross_entropy_is_agrees_with_subset():
    """Both rare-event tiers land on the same chi-squared tail."""
    from math import exp
    from mlmc_tpu.rare import cross_entropy_is

    # P[||theta||^2 > gamma] for d=2: exp(-gamma/2) (chi2_2 tail)
    gamma = 25.0
    p_exact = exp(-gamma / 2.0)                       # ~ 3.7e-6
    # the failure domain is a RING: a mean shift cannot capture it
    # (symmetric elite -> zero mean), the documented fallback case —
    # the full tilt WIDENS sigma (floored at 1) to cover it and IS
    # stays unbiased; only the ESS degrades
    ce = cross_entropy_is(lambda th: jnp.sum(th * th), gamma, d=2,
                          key=jax.random.key(1), n_final=1 << 16,
                          tilt="full")
    assert abs(ce["p"] - p_exact) < 6 * ce["p_se"], \
        (ce["p"], p_exact, ce["p_se"])
    ss = subset_simulation(lambda th: jnp.sum(th * th), gamma, d=2,
                           n_particles=2048, key=jax.random.key(2))
    agree = abs(ce["log_p"] - ss["log_p"])
    assert agree < 6 * np.hypot(ce["p_se"] / max(ce["p"], 1e-300),
                                ss["log_p_se"]), agree
