"""Ensemble Kalman inversion tests: the linear-Gaussian closed form
(ES-MDA is exact for linear forward maps in the large-ensemble limit),
schedule invariance, the inflation-schedule contract, and the
hierarchical Darcy calibration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlmc_tpu.eki import esmda, hierarchical_esmda
from mlmc_tpu.mcmc import make_darcy_inverse


def _linear_problem(d=3, n_obs=5, noise=0.5, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n_obs, d))
    theta_true = rng.normal(size=d)
    y = A @ theta_true + noise * rng.normal(size=n_obs)
    Sigma = np.linalg.inv(np.eye(d) + A.T @ A / noise ** 2)
    mu = Sigma @ A.T @ y / noise ** 2
    Aj = jnp.asarray(A)
    return (lambda th: Aj @ th), jnp.asarray(y), mu, Sigma


def test_esmda_linear_gaussian_exact():
    """For a linear forward map, the T-step ES-MDA ensemble samples the
    exact conjugate posterior (mean AND covariance) as J -> inf."""
    fwd, y, mu, Sigma = _linear_problem()
    out = esmda(fwd, y, noise_std=0.5, n_ens=4000, n_steps=4, d=3,
                key=jax.random.key(1))
    # mean: MC error ~ sd/sqrt(J) ~ 0.004; allow 6x
    assert np.all(np.abs(out["mean"] - mu) < 0.03)
    emp_cov = np.cov(out["theta"].T)
    assert np.allclose(emp_cov, Sigma, atol=0.12 * np.max(np.diag(Sigma)),
                       rtol=0.12)
    # misfit decreases monotonically to ~1 noise sd per observation
    assert out["misfit"][-1] < out["misfit"][0]


def test_esmda_step_count_invariance_linear():
    """Linear case: one global update (plain ES) and four damped updates
    land on the same posterior mean (both exact in the limit)."""
    fwd, y, mu, _ = _linear_problem(seed=2)
    one = esmda(fwd, y, noise_std=0.5, n_ens=4000, n_steps=1, d=3,
                key=jax.random.key(3))
    four = esmda(fwd, y, noise_std=0.5, n_ens=4000, n_steps=4, d=3,
                 key=jax.random.key(4))
    assert np.all(np.abs(one["mean"] - four["mean"]) < 0.05)
    assert np.all(np.abs(one["mean"] - mu) < 0.03)


def test_alpha_schedule_contract():
    fwd, y, _, _ = _linear_problem()
    with pytest.raises(ValueError, match="sum"):
        esmda(fwd, y, noise_std=0.5, n_ens=8, d=3, n_steps=2,
              alphas=[2.0, 3.0])
    # a schedule shorter than n_steps must not silently drop updates
    with pytest.raises(ValueError, match="n_steps"):
        esmda(fwd, y, noise_std=0.5, n_ens=8, d=3, n_steps=4,
              alphas=[2.0, 2.0])
    with pytest.raises(ValueError, match="n_steps"):
        hierarchical_esmda([fwd, fwd], y, noise_std=0.5, n_ens=8, d=3,
                           n_steps=4, alphas=[2.0, 2.0])
    # heteroscedastic noise vector accepted
    out = esmda(fwd, y, noise_std=jnp.full(5, 0.5), n_ens=64, n_steps=2,
                d=3, key=jax.random.key(0))
    assert np.all(np.isfinite(out["mean"]))


def test_hierarchical_esmda_darcy():
    """Calibrate the Darcy log-conductivity on a 4/8 hierarchy: the
    hierarchical schedule matches the fine-only calibration while paying
    fine solves only for the tail updates."""
    prob = make_darcy_inverse([4, 8], n_modes=8, noise_std=0.05,
                              obs_points=[[0.3, 0.3], [0.3, 0.7],
                                          [0.7, 0.3], [0.7, 0.7]])
    theta_true, clean, data = prob["synthetic"](42)
    fwds = [lambda th, n=n: prob["forward"](th, n)[0]
            for n in prob["level_ns"]]

    fine = esmda(fwds[-1], jnp.asarray(data), noise_std=0.05, n_ens=48,
                 n_steps=4, d=prob["d"], key=jax.random.key(5))
    hier = hierarchical_esmda(fwds, jnp.asarray(data), noise_std=0.05,
                              n_ens=48, n_steps=4, d=prob["d"],
                              key=jax.random.key(5))
    # both cut the prior misfit substantially...
    assert fine["misfit"][-1] < 0.5 * fine["misfit"][0]
    assert hier["misfit"][-1] < 0.5 * hier["misfit"][0]
    # ...and agree on the final data fit within 30%
    assert hier["misfit"][-1] < 1.3 * fine["misfit"][-1] + 0.2
    # fine solves: hierarchical pays them only on the last level's steps
    assert hier["n_forward"][-1] < fine["n_forward"]


def test_forward_accounting_and_theta0():
    """n_forward reports ACTUAL solves (intermediate stages skip the
    final diagnostic pass), and a user initial ensemble is honored."""
    fwd, y, _, _ = _linear_problem()
    out = esmda(fwd, y, noise_std=0.5, n_ens=16, n_steps=3, d=3,
                alphas=[3.0, 3.0, 3.0])
    assert out["n_forward"] == 4 * 16          # 3 steps + final obs
    assert len(out["misfit"]) == 4
    hier = hierarchical_esmda([fwd, fwd], y, noise_std=0.5, n_ens=16,
                              n_steps=4, d=3)
    assert hier["n_forward"] == [2 * 16, 3 * 16]   # final obs fine-only
    assert len(hier["misfit"]) == 5
    # explicit theta0 must seed the first stage
    theta0 = np.full((16, 3), 7.0)
    out0 = esmda(fwd, y, noise_std=0.5, n_ens=16, n_steps=1,
                 alphas=[1.0], theta0=theta0)
    h0 = hierarchical_esmda([fwd, fwd], y, noise_std=0.5, n_ens=16,
                            n_steps=2, theta0=theta0,
                            key=jax.random.key(0))
    # a constant ensemble has zero anomalies: the update is a no-op,
    # so theta0 visibly propagates through both drivers
    np.testing.assert_allclose(out0["theta"], theta0, atol=1e-12)
    np.testing.assert_allclose(h0["theta"], theta0, atol=1e-12)