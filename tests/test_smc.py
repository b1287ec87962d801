"""Tempered SMC tests: the conjugate linear-Gaussian closed form for
BOTH the posterior and the model evidence, multimodal robustness (a
tempered population does not need to tunnel), the hierarchical
model-switch importance bridge (evidence must target the FINE model),
and the input-validation contracts."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlmc_tpu.smc import smc_tempering, hierarchical_smc


def _linear_problem(d=3, n_obs=5, noise=0.5, seed=0):
    """Returns (loglik_qoi, exact posterior mean/cov, exact log Z)."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n_obs, d))
    theta_true = rng.normal(size=d)
    y = A @ theta_true + noise * rng.normal(size=n_obs)
    Sigma = np.linalg.inv(np.eye(d) + A.T @ A / noise ** 2)
    mu = Sigma @ A.T @ y / noise ** 2
    # evidence: y ~ N(0, A A^T + noise^2 I) under the N(0, I) prior
    S = A @ A.T + noise ** 2 * np.eye(n_obs)
    log_z = -0.5 * (n_obs * np.log(2 * np.pi) + np.linalg.slogdet(S)[1]
                    + y @ np.linalg.solve(S, y))
    Aj, yj = jnp.asarray(A), jnp.asarray(y)
    const = -0.5 * n_obs * np.log(2 * np.pi * noise ** 2)

    def loglik_qoi(th):
        r = Aj @ th - yj
        return const - 0.5 * jnp.sum(r * r) / noise ** 2, th

    return loglik_qoi, mu, Sigma, float(log_z)


def test_smc_linear_gaussian_posterior_and_evidence():
    """Posterior mean matches the conjugate closed form within the
    island CLT error, and log Z matches the marginal-likelihood closed
    form — the capability MCMC alone cannot provide."""
    fn, mu, Sigma, log_z = _linear_problem()
    out = smc_tempering(fn, d=3, n_particles=2048, n_moves=8,
                        key=jax.random.key(1))
    assert out["lambdas"][0] == 0.0 and out["lambdas"][-1] == 1.0
    assert all(b > a for a, b in zip(out["lambdas"], out["lambdas"][1:]))
    assert np.all(np.abs(out["mean"] - mu) < 6 * out["se"] + 0.02)
    assert abs(out["log_evidence"] - log_z) < \
        6 * out["log_evidence_se"] + 0.05
    # the population carries the posterior spread, not a collapsed point
    emp_sd = out["theta"].std(axis=0, ddof=1)
    assert np.allclose(emp_sd, np.sqrt(np.diag(Sigma)), rtol=0.35)
    # rejuvenation acceptance stays in a healthy band (beta adapts)
    assert 0.05 < np.mean(out["acc_rates"]) < 0.9


def test_smc_bimodal_population():
    """A symmetric bimodal posterior (modes at +-2): the tempered
    population keeps BOTH modes — the failure mode of a single chain."""
    def loglik_qoi(th):
        t = th[0]
        la = -0.5 * ((t - 2.0) / 0.3) ** 2
        lb = -0.5 * ((t + 2.0) / 0.3) ** 2
        return jnp.logaddexp(la, lb), th[:1]

    out = smc_tempering(loglik_qoi, d=1, n_particles=1024, n_moves=6,
                        key=jax.random.key(2))
    frac_pos = float(np.mean(out["theta"][:, 0] > 0))
    assert 0.25 < frac_pos < 0.75
    # both modes are where they should be
    pos = out["theta"][out["theta"][:, 0] > 0, 0]
    neg = out["theta"][out["theta"][:, 0] < 0, 0]
    assert abs(pos.mean() - 2.0) < 0.25 and abs(neg.mean() + 2.0) < 0.25


def test_hierarchical_smc_bridge_targets_fine_model():
    """Anneal early stages on a BIASED coarse model: the importance
    bridge at the switch must land the particles on the fine posterior
    and the evidence on the FINE model's closed form."""
    fn_fine, mu, _, log_z = _linear_problem(seed=3)

    def fn_coarse(th):
        ll, qoi = fn_fine(0.85 * th)       # deliberately wrong model
        return ll, th

    out = hierarchical_smc([fn_coarse, fn_fine], d=3, n_particles=2048,
                           n_moves=8, key=jax.random.key(4))
    assert np.all(np.abs(out["mean"] - mu) < 6 * out["se"] + 0.03)
    assert abs(out["log_evidence"] - log_z) < \
        6 * out["log_evidence_se"] + 0.1
    # the schedule actually visited both models
    assert out["levels"][0] == 0 and out["levels"][-1] == 1
    # coarse evaluations dominate the early budget
    assert out["n_forward"][0] > 0 and out["n_forward"][1] > 0
    # single-model hierarchy degenerates to plain tempering
    solo = hierarchical_smc([fn_fine], d=3, n_particles=512,
                            key=jax.random.key(5))
    assert "levels" not in solo


def test_smc_validation():
    fn, *_ = _linear_problem()
    with pytest.raises(ValueError, match="divisible"):
        smc_tempering(fn, d=3, n_particles=100)
    with pytest.raises(ValueError, match="increasing"):
        hierarchical_smc([fn, fn, fn], d=3, n_particles=64,
                         switch_lambdas=[0.7, 0.3])
    with pytest.raises(ValueError, match="increasing"):
        hierarchical_smc([fn, fn], d=3, n_particles=64,
                         switch_lambdas=[1.0])
