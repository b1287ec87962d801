"""Multilevel MCMC tests: pCN exactness on conjugate-Gaussian targets,
the coupled-kernel fixed point, telescoping consistency, correction
variance decay, diagnostics, and the Darcy inverse-problem smoke run.

The conjugate linear-Gaussian case gives CLOSED-FORM posteriors: forward
``F(theta) = A theta + b``, prior N(0, I), noise N(0, s^2 I) =>
posterior N(mu*, Sigma*) with ``Sigma* = (I + A^T A / s^2)^{-1}`` and
``mu* = Sigma* A^T (y - b) / s^2`` — every chain statistic is checked
against it, with across-chain CLT error bars (independent chains make
the bars honest without autocorrelation corrections).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlmc_tpu.mcmc import (run_pcn, run_coupled, run_mlda, run_unbiased,
                           MLMCMC, ess, split_rhat, make_darcy_inverse,
                           gaussian_loglik)


def _gaussian_problem(d=3, n_obs=5, noise=0.5, seed=0, shift=0.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n_obs, d))
    theta_true = rng.normal(size=d)
    y = A @ theta_true + noise * rng.normal(size=n_obs)
    b = shift * np.ones(n_obs)
    Sigma = np.linalg.inv(np.eye(d) + A.T @ A / noise ** 2)
    mu = Sigma @ A.T @ (y - b) / noise ** 2
    Aj, yj, bj = jnp.asarray(A), jnp.asarray(y), jnp.asarray(b)

    def loglik_qoi(theta):
        obs = Aj @ theta + bj
        return gaussian_loglik(obs, yj, noise), theta

    return loglik_qoi, mu, Sigma


def test_pcn_gaussian_posterior():
    """pCN recovers the exact conjugate posterior mean and variance."""
    loglik, mu, Sigma = _gaussian_problem()
    res = run_pcn(loglik, d=3, n_steps=3000, n_chains=64, burn=1000,
                  key=jax.random.key(1))
    assert 0.1 < res.acc_rate < 0.6          # adaptation targets 0.234
    # mean: within 6 across-chain standard errors (+ tiny abs floor)
    assert np.all(np.abs(res.mean - mu) < 6 * res.se + 1e-3), \
        (res.mean, mu, res.se)
    # marginal variances: pooled over steps+chains, 15% tolerance
    var = res.qoi.reshape(-1, 3).var(axis=0)
    assert np.allclose(var, np.diag(Sigma), rtol=0.15)
    assert res.ess > 500
    assert res.rhat < 1.1


def test_pcn_stationarity():
    """Chains started AT the exact posterior stay there (invariance of
    the pCN kernel) — a sharper check than ergodic-average convergence:
    any acceptance-rule bug shows up as immediate drift."""
    loglik, mu, Sigma = _gaussian_problem(seed=3)
    rng = np.random.default_rng(11)
    L = np.linalg.cholesky(Sigma)
    B = 512
    theta0 = mu + rng.normal(size=(B, 3)) @ L.T
    res = run_pcn(loglik, d=3, n_steps=50, n_chains=B, burn=0,
                  adapt=False, beta=0.4, theta0=theta0,
                  key=jax.random.key(2))
    # across-chain se of the all-steps mean
    assert np.all(np.abs(res.mean - mu) < 6 * res.se + 1e-3)
    var = res.qoi.reshape(-1, 3).var(axis=0)
    assert np.allclose(var, np.diag(Sigma), rtol=0.2)


def test_coupled_identical_likelihood_fixed_point():
    """With identical level likelihoods the coupled difference is
    exactly zero in BOTH modes: the crn chains share the init and every
    accept decision; the dodwell fine chain accepts every proposal."""
    loglik, _, _ = _gaussian_problem()
    res = run_coupled(loglik, loglik, d=3, n_steps=200, n_chains=16,
                      burn=50, key=jax.random.key(4))
    assert res.mismatch_rate == 0.0
    assert np.max(np.abs(res.diff)) == 0.0
    res_d = run_coupled(loglik, loglik, d=3, n_steps=100, n_chains=16,
                        burn=20, key=jax.random.key(4), mode="dodwell")
    assert res_d.acc_rate == 1.0
    assert np.max(np.abs(res_d.diff)) == 0.0


def test_mlmcmc_telescoping_and_variance_decay():
    """3-level hierarchy with likelihood shifts decaying 4x per level:
    the telescoped posterior mean matches the exact FINE posterior, each
    correction matches its closed form, and the correction se decays."""
    shifts = [0.4, 0.1, 0.025]
    fns, mus = [], []
    for s in shifts:
        loglik, mu, _ = _gaussian_problem(seed=0, shift=s)
        fns.append(loglik)
        mus.append(mu)
    ml = MLMCMC(fns, d=3, subsample=3)
    out = ml.run(n_steps=[3000, 1200, 1200], n_chains=48,
                 key=jax.random.key(5))
    # telescoped total == fine posterior mean
    assert np.all(np.abs(out["mean"] - mus[-1]) < 6 * out["se"] + 2e-3), \
        (out["mean"], mus[-1], out["se"])
    # each correction matches mu_l - mu_{l-1}
    for l in (1, 2):
        exact = mus[l] - mus[l - 1]
        got = out["level_means"][l]
        se = out["level_ses"][l]
        assert np.all(np.abs(got - exact) < 6 * se + 2e-3)
    # coupling: CORRECTION se decays as the likelihoods converge (the
    # level-0 term is a full-posterior chain, not a correction — its se
    # is a different animal and is excluded from the ordering)
    se_norm = np.linalg.norm(out["level_ses"], axis=1)
    assert se_norm[2] < se_norm[1]
    # and the pooled coupled-difference spread shrinks with the level
    # likelihood gap (4x per level in this hierarchy)
    sd1 = out["results"][1].diff.reshape(-1, 3).std(axis=0)
    sd2 = out["results"][2].diff.reshape(-1, 3).std(axis=0)
    assert np.all(sd2 < sd1)
    # crn coupling: accept/reject mismatches get rarer as levels converge
    assert (out["results"][2].mismatch_rate
            < out["results"][1].mismatch_rate)


def test_ess_and_rhat_diagnostics():
    rng = np.random.default_rng(0)
    n, B = 400, 8
    iid = rng.normal(size=(n, B))
    e = ess(iid)
    assert 0.7 * n * B < e < 1.4 * n * B
    assert split_rhat(iid) < 1.05
    # strongly autocorrelated AR(1): ESS ~ n*B*(1-rho)/(1+rho) << n*B
    rho = 0.99
    ar = np.empty((n, B))
    ar[0] = rng.normal(size=B)
    for t in range(1, n):
        ar[t] = rho * ar[t - 1] + np.sqrt(1 - rho ** 2) * rng.normal(size=B)
    assert ess(ar) < 0.1 * n * B
    # chains at different means: R-hat flags disagreement
    apart = iid + 10.0 * np.arange(B)[None, :]
    assert split_rhat(apart) > 2.0


def test_mlda_exact_despite_bad_coarse():
    """MLDA targets the FINE posterior exactly at any subsampling — even
    when the coarse screening levels are strongly biased (shift 0.4 is
    ~4 posterior sds of model error), the fine marginal is untouched;
    the hierarchy only costs acceptance rate, never correctness."""
    fns, mus, Sigma = [], [], None
    for s in (0.4, 0.1, 0.0):
        loglik, mu, Sig = _gaussian_problem(seed=0, shift=s)
        fns.append(loglik)
        mus.append(mu)
        Sigma = Sig
    res = run_mlda(fns, d=3, n_steps=1500, n_chains=48,
                   subsamples=[3, 3], beta=0.5, key=jax.random.key(1))
    assert np.all(np.abs(res.mean - mus[-1]) < 6 * res.se + 1e-3)
    var = res.qoi.reshape(-1, 3).var(axis=0)
    assert np.allclose(var, np.diag(Sigma), rtol=0.15)
    assert res.rhat < 1.1
    # a two-level variant with an ACCURATE coarse level accepts more
    # than one whose coarse level is the badly-shifted model
    good = run_mlda([fns[1], fns[2]], d=3, n_steps=400, n_chains=32,
                    subsamples=3, beta=0.5, key=jax.random.key(2))
    bad = run_mlda([fns[0], fns[2]], d=3, n_steps=400, n_chains=32,
                   subsamples=3, beta=0.5, key=jax.random.key(2))
    assert good.acc_rate > bad.acc_rate


def test_darcy_inverse_smoke():
    """End-to-end Bayesian Darcy inversion on tiny grids: the posterior
    concentrates toward the data relative to the prior."""
    prob = make_darcy_inverse([4, 8], n_modes=8, sigma=1.0,
                              noise_std=0.05,
                              obs_points=[[0.3, 0.3], [0.3, 0.7],
                                          [0.7, 0.3], [0.7, 0.7]])
    theta_true, clean, data = prob["synthetic"](42)
    fns = prob["loglik_qoi_fns"](jnp.asarray(data))
    ml = MLMCMC(fns, d=prob["d"], subsample=2)
    out = ml.run(n_steps=240, n_chains=16, burn=80, key=jax.random.key(6))
    assert np.all(np.isfinite(out["mean"])) and np.all(out["se"] > 0)
    assert 0.02 < out["acc_rates"][0] < 0.98
    # posterior-mean theta fits the data better than the prior mean
    res0 = out["results"][0]
    theta_hat = jnp.asarray(res0.theta.mean(axis=0))
    ll_hat, _ = fns[-1](theta_hat)
    ll_prior, _ = fns[-1](jnp.zeros(prob["d"]))
    assert float(ll_hat) > float(ll_prior)
    # the coupled level is well-behaved too
    assert out["results"][1].acc_rate > 0.05


def test_unbiased_mcmc_gaussian():
    """Coupled-pair debiased estimator recovers the conjugate posterior
    mean with honest iid across-pair errors; all pairs meet."""
    loglik, mu, Sigma = _gaussian_problem(seed=5)
    out = run_unbiased(loglik, d=3, k=40, m=200, n_pairs=256,
                       beta=0.35, key=jax.random.key(7))
    assert out["frac_unmet"] == 0.0
    assert np.all(out["tau"] >= 1.0)
    assert 0.05 < out["acc_rate"] < 0.8
    assert np.all(np.abs(out["mean"] - mu) < 5 * out["se"] + 1e-3), \
        (out["mean"], mu, out["se"])
    assert out["H"].shape == (256, 3)
    with pytest.raises(ValueError, match="k <= m"):
        run_unbiased(loglik, d=3, k=50, m=20)
    with pytest.raises(ValueError, match="beta"):
        run_unbiased(loglik, d=3, k=5, beta=1.5)


def test_unbiased_mcmc_removes_burnin_bias():
    """The whole point: at a horizon far too short for burn-in (chains
    initialized 4 sigma off), the naive ergodic average is biased by
    many of its own standard errors; the coupled-pair estimator stays
    within its CLT band at the SAME horizon."""
    loglik, mu, Sigma = _gaussian_problem(seed=6)
    B, k, m = 512, 5, 40
    rng = np.random.default_rng(13)
    off0 = 4.0 + rng.normal(size=(B, 3))
    out = run_unbiased(loglik, d=3, k=k, m=m, n_pairs=B, beta=0.35,
                       n_max=500,
                       theta0_sampler=lambda kk: 4.0 + jax.random.normal(
                           kk, (B, 3)),
                       key=jax.random.key(8))
    assert out["frac_unmet"] == 0.0
    assert np.all(np.abs(out["mean"] - mu) < 6 * out["se"] + 0.02), \
        (out["mean"], mu, out["se"])
    naive = run_pcn(loglik, d=3, n_steps=m + 1, n_chains=B, burn=k,
                    adapt=False, beta=0.35, theta0=off0,
                    key=jax.random.key(9))
    bias = np.abs(naive.mean - mu)
    # significantly biased: worst component many naive-se out
    assert np.max(bias / (naive.se + 1e-12)) > 8.0, (bias, naive.se)
