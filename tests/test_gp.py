"""GP emulation tier: predictive-equation consistency, interval
calibration, and the Forrester multifidelity benchmark."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.gp import GP, MultilevelGP, rbf_kernel


def test_gp_predict_matches_closed_form_and_interpolates():
    """predict() must reproduce the textbook GP equations at the fitted
    hyperparameters, and near-noiseless fits interpolate the data."""
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 2, size=(12, 1))
    y = np.sin(3 * X[:, 0]) + 0.5 * X[:, 0]
    gp = GP(noise=1e-4).fit(X, y, n_steps=200)
    Xs = np.linspace(0, 2, 7)[:, None]
    mu, sd = gp.predict(Xs)
    # hand-computed posterior mean from the same hyperparameters
    h = gp.hyperparameters
    lls = jnp.log(jnp.asarray(h["lengthscales"]))
    lsf = jnp.log(h["signal_sd"])
    K = np.array(rbf_kernel(jnp.asarray(X), jnp.asarray(X), lls, lsf))
    # mirror fit()'s scale-aware jitter (1e-10 * sf^2 on x64)
    K = K + (h["noise_sd"] ** 2
             + 1e-10 * h["signal_sd"] ** 2) * np.eye(len(X))
    Ks = np.asarray(rbf_kernel(jnp.asarray(Xs), jnp.asarray(X), lls,
                               lsf))
    mu_ref = h["mean"] + Ks @ np.linalg.solve(K, y - h["mean"])
    assert np.allclose(mu, mu_ref, atol=1e-8)
    # interpolation at the data
    mu_tr, sd_tr = gp.predict(X)
    assert np.max(np.abs(mu_tr - y)) < 1e-2
    assert np.all(sd_tr < 0.05)
    with pytest.raises(RuntimeError, match="fit"):
        GP().predict(Xs)
    with pytest.raises(ValueError, match="X \\[n, d\\]"):
        GP().fit(X, y[:3])


def test_gp_learns_noise_and_calibrated_intervals():
    rng = np.random.default_rng(1)
    n, sn = 120, 0.1
    X = rng.uniform(0, 2, size=(n, 1))
    f = lambda x: np.sin(3 * x) + 0.5 * x
    y = f(X[:, 0]) + sn * rng.standard_normal(n)
    gp = GP().fit(X, y, n_steps=400)
    h = gp.hyperparameters
    assert 0.5 * sn < h["noise_sd"] < 2.0 * sn, h
    Xs = np.linspace(0.05, 1.95, 200)[:, None]
    mu, sd = gp.predict(Xs)
    err = np.abs(mu - f(Xs[:, 0]))
    assert np.sqrt(np.mean(err ** 2)) < 0.08
    # proper calibration: held-out noisy OBSERVATIONS against the full
    # predictive (latent + learned noise) at 2sd ~ 95% nominal
    y_new = f(Xs[:, 0]) + sn * rng.standard_normal(len(Xs))
    mu_n, sd_n = gp.predict(Xs, include_noise=True)
    cov = np.mean(np.abs(y_new - mu_n) < 2 * sd_n)
    assert 0.85 < cov <= 1.0, cov
    # the optimization actually descended
    assert gp.nll_trace[-1] < gp.nll_trace[0] - 1.0


def _forrester(x):
    return (6 * x - 2) ** 2 * np.sin(12 * x - 4)


def test_multilevel_gp_forrester():
    """The classic Forrester-Sobester-Keane cokriging benchmark: 5
    expensive + 25 cheap runs beat 5 expensive runs alone by a wide
    margin, and the autoregressive rho ~ 2 is recovered (f_hi = 2 f_lo
    + linear discrepancy by construction)."""
    x_lo = np.linspace(0, 1, 25)[:, None]
    y_lo = 0.5 * _forrester(x_lo[:, 0]) + 10 * (x_lo[:, 0] - 0.5) - 5
    x_hi = np.array([0.0, 0.3, 0.55, 0.8, 1.0])[:, None]
    y_hi = _forrester(x_hi[:, 0])

    ml = MultilevelGP(noise=1e-4).fit([(x_lo, y_lo), (x_hi, y_hi)],
                                      n_steps=300)
    single = GP(noise=1e-4).fit(x_hi, y_hi, n_steps=300)
    xs = np.linspace(0, 1, 101)[:, None]
    truth = _forrester(xs[:, 0])
    mu_ml, sd_ml = ml.predict(xs)
    mu_s, _ = single.predict(xs)
    rmse_ml = np.sqrt(np.mean((mu_ml - truth) ** 2))
    rmse_s = np.sqrt(np.mean((mu_s - truth) ** 2))
    assert rmse_ml < 0.35 * rmse_s, (rmse_ml, rmse_s)
    assert rmse_ml < 0.5
    assert 1.5 < ml.rhos[1] < 2.5, ml.rhos
    # composed intervals stay USEFUL (ML-II on 5 fine points is known
    # to be overconfident, and the Le Gratiet composition ignores
    # rho's own estimation error — this is a sanity floor, not a
    # calibration claim; the calibration claim lives in the
    # single-level held-out test above)
    cov = np.mean(np.abs(mu_ml - truth) < 3 * sd_ml + 1e-3)
    assert cov > 0.7
    with pytest.raises(ValueError, match="one level"):
        MultilevelGP().fit([])


def test_bayes_opt_finds_global_minimum():
    """EI-driven optimization localizes the Branin global minima
    (f* = 0.397887) in ~30 expensive evaluations — far beyond random
    search at the same budget."""
    from mlmc_tpu.gp import bayes_opt

    def branin(x):
        a, b, c = 1.0, 5.1 / (4 * np.pi ** 2), 5.0 / np.pi
        r, s, t = 6.0, 10.0, 1.0 / (8 * np.pi)
        return (a * (x[1] - b * x[0] ** 2 + c * x[0] - r) ** 2
                + s * (1 - t) * jnp.cos(x[0]) + s)

    bounds = np.array([[-5.0, 10.0], [0.0, 15.0]])
    out = bayes_opt(branin, bounds, n_init=10, n_iter=25,
                    noise=1e-6, key=jax.random.key(0))
    assert out["y_best"] < 0.397887 + 0.25, out["y_best"]
    # random search at the same total budget does clearly worse
    rng = np.random.default_rng(1)
    xr = bounds[:, 0] + (bounds[:, 1] - bounds[:, 0]) * rng.uniform(
        size=(35, 2))
    yr = np.array([float(branin(jnp.asarray(x))) for x in xr])
    assert out["y_best"] < yr.min()
    assert out["X"].shape == (35, 2)
    with pytest.raises(ValueError, match="bounds"):
        bayes_opt(branin, np.array([[1.0, 0.0]]))
