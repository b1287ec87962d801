"""Ensemble Kalman filter tests: the exact Kalman filter closed form
(means AND innovation log-likelihood, both analysis schemes), the
deterministic-vs-stochastic sampling-error ordering, Lorenz-96 chaotic
tracking, and validation contracts."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlmc_tpu.filter import enkf, kalman_filter, lorenz96_step


def _linear_ssm(d=4, k=2, T=40, seed=0):
    rng = np.random.default_rng(seed)
    M = 0.9 * np.linalg.qr(rng.normal(size=(d, d)))[0]  # stable rotation
    H = rng.normal(size=(k, d))
    q, r = 0.3, 0.4
    x = rng.normal(size=d)
    xs, ys = [], []
    for _ in range(T):
        x = M @ x + q * rng.normal(size=d)
        ys.append(H @ x + r * rng.normal(size=k))
        xs.append(x.copy())
    kf = kalman_filter(M, H, q ** 2 * np.eye(d), r ** 2 * np.eye(k),
                       np.zeros(d), np.eye(d), np.array(ys))
    Mj, Hj = jnp.asarray(M), jnp.asarray(H)

    def transition(x, key, t):
        w = jax.random.normal(key, x.shape, x.dtype)
        return x @ Mj.T + q * w

    observe = lambda x: Hj @ x
    return transition, observe, np.array(ys), np.array(xs), kf, r


@pytest.mark.parametrize("method", ["perturbed", "etkf"])
def test_linear_gaussian_matches_kalman(method):
    """Large-ensemble EnKF reproduces the exact Kalman filter: the
    analysis means track KF means well within the KF posterior sd, and
    the innovation log-likelihood lands within a few percent."""
    transition, observe, ys, xs, kf, r = _linear_ssm()
    out = enkf(transition, observe, ys, noise_std=r, n_ens=2048, d=4,
               method=method, key=jax.random.key(1))
    sd = np.sqrt(np.array([np.trace(c) / 4 for c in kf["covs"]]))
    rmse = np.sqrt(np.mean((out["means"] - kf["means"]) ** 2, axis=1))
    assert np.all(rmse < 0.5 * sd)
    assert abs(out["loglik"] - kf["loglik"]) < 0.02 * abs(kf["loglik"])
    # and the filter genuinely tracks the latent state
    track = np.sqrt(np.mean((out["means"] - xs) ** 2))
    prior = np.sqrt(np.mean(xs ** 2))
    assert track < 0.7 * prior


def test_etkf_beats_perturbed_at_small_ensemble():
    """The deterministic transform avoids observation-noise sampling
    error: at J = 16 its deviation from the exact KF means is smaller
    (seed-averaged over 5 runs)."""
    transition, observe, ys, _, kf, r = _linear_ssm(seed=1)

    def dev(method, s):
        out = enkf(transition, observe, ys, noise_std=r, n_ens=16, d=4,
                   method=method, key=jax.random.key(s))
        return np.sqrt(np.mean((out["means"] - kf["means"]) ** 2))

    p = np.mean([dev("perturbed", s) for s in range(5)])
    e = np.mean([dev("etkf", s) for s in range(5)])
    assert e < p


def test_lorenz96_tracking():
    """40-d Lorenz-96, every other variable observed: the filter must
    track far below the no-assimilation (free-run) error and keep a
    healthy spread."""
    d, T = 40, 60
    step = lorenz96_step(dt=0.05)
    key = jax.random.key(2)
    # truth: spin up one trajectory
    x = 3.0 + jax.random.normal(jax.random.fold_in(key, 0), (1, d))
    for t in range(50):
        x = step(x, None, t)
    truth, ys = [], []
    rng = np.random.default_rng(3)
    xt = x
    for t in range(T):
        xt = step(xt, None, t)
        truth.append(np.asarray(xt[0]))
        ys.append(truth[-1][::2] + 1.0 * rng.normal(size=d // 2))
    observe = lambda xx: xx[::2]

    out = enkf(step, observe, np.array(ys), noise_std=1.0, n_ens=64,
               d=d, x0=np.asarray(x) + np.random.default_rng(4).normal(
                   size=(64, d)), inflation=1.05, method="etkf",
               key=jax.random.key(5))
    rmse = np.sqrt(np.mean((out["means"][T // 2:]
                            - np.array(truth)[T // 2:]) ** 2))
    free = enkf(step, observe, np.array(ys), noise_std=1e6, n_ens=64,
                d=d, x0=np.asarray(x) + np.random.default_rng(4).normal(
                    size=(64, d)), method="etkf",
                key=jax.random.key(5))
    free_rmse = np.sqrt(np.mean((free["means"][T // 2:]
                                 - np.array(truth)[T // 2:]) ** 2))
    assert rmse < 1.0          # below the observation noise
    assert rmse < 0.35 * free_rmse
    assert out["spread"][-1] > 0.05    # no covariance collapse


def test_validation():
    transition, observe, ys, _, _, r = _linear_ssm(T=3)
    with pytest.raises(ValueError, match="method"):
        enkf(transition, observe, ys, r, n_ens=8, d=4, method="3dvar")
    with pytest.raises(ValueError, match="inflation"):
        enkf(transition, observe, ys, r, n_ens=8, d=4, inflation=0.5)


# ----------------------------------------------------------------------- #
# multilevel EnKF
# ----------------------------------------------------------------------- #
def _ou_euler_level(kappa, sig_m, window, n_sub):
    """OU transition over one assimilation window by n_sub Euler
    substeps, counter-derived noise (same key at any n_sub => pathwise
    close — the MLEnKF coupling)."""
    def transition(x, key, t):
        dt = window / n_sub
        z = jax.random.normal(key, (n_sub,) + x.shape, x.dtype)
        for j in range(n_sub):
            x = x - kappa * x * dt + sig_m * np.sqrt(dt) * z[j]
        return x

    return transition


def test_mlenkf_identical_kernels_zero_correction():
    """ETKF analysis is deterministic in the ensemble and propagation
    shares keys: identical fine/coarse kernels must give EXACTLY zero
    corrections."""
    from mlmc_tpu.filter import multilevel_enkf

    tr = _ou_euler_level(1.0, 0.5, 0.5, 4)
    data = np.asarray(jax.random.normal(jax.random.key(1), (6, 1)))
    res = multilevel_enkf(lambda lev: tr, lambda x: x, data, 0.4,
                          n_levels=3, d=1, n_ens=16, n_replicates=4,
                          method="etkf", key=jax.random.key(2))
    assert np.all(np.asarray(res["correction_l1"]) == 0.0), res[
        "correction_l1"]
    assert np.allclose(res["means"], res["level_means"][0])


def test_mlenkf_ou_vs_exact_kalman():
    """Euler-hierarchy OU filtering: the telescoped means land on the
    exact (continuous-transition) Kalman filter within the replicate
    error bars + the finest-level Euler bias, and corrections decay
    with level."""
    from mlmc_tpu.filter import kalman_filter, multilevel_enkf

    kappa, sig_m, window, obs_sd = 1.0, 0.5, 0.5, 0.3
    T = 8
    rng = np.random.default_rng(7)
    a = np.exp(-kappa * window)
    q = sig_m ** 2 * (1 - a ** 2) / (2 * kappa)
    x_true, data = 0.0, []
    for _ in range(T):
        x_true = a * x_true + np.sqrt(q) * rng.normal()
        data.append([x_true + obs_sd * rng.normal()])
    data = np.asarray(data)
    kf = kalman_filter([[a]], [[1.0]], [[q]], [[obs_sd ** 2]],
                       [0.0], [[1.0]], data)

    res = multilevel_enkf(
        lambda lev: _ou_euler_level(kappa, sig_m, window, 2 ** lev),
        lambda x: x, data, obs_sd, n_levels=4, d=1,
        n_ens=[256, 128, 64, 32], n_replicates=8, method="etkf",
        key=jax.random.key(3))
    err = np.abs(res["means"][:, 0] - kf["means"][:, 0])
    band = 5 * res["means_se"][:, 0] + 0.08   # finest Euler bias margin
    assert np.all(err < band), (err, band)
    c = np.asarray(res["correction_l1"])
    assert c[-1] < c[0], c                     # decay across the ladder


def test_mlenkf_perturbed_couples():
    """The perturbed-observation pair shares its perturbation draw:
    corrections stay small (far below the filtered-signal scale) and
    the telescoped answer agrees with a single fine-level ETKF run."""
    from mlmc_tpu.filter import multilevel_enkf

    data = np.asarray(jax.random.normal(jax.random.key(5), (6, 1)))
    res = multilevel_enkf(
        lambda lev: _ou_euler_level(1.0, 0.5, 0.5, 2 ** lev),
        lambda x: x, data, 0.3, n_levels=3, d=1, n_ens=64,
        n_replicates=6, method="perturbed", key=jax.random.key(6))
    scale = np.abs(res["means"]).mean() + 0.1
    assert np.asarray(res["correction_l1"]).max() < 0.5 * scale
    with pytest.raises(ValueError, match="n_ens gives"):
        multilevel_enkf(lambda lev: _ou_euler_level(1, .5, .5, 1),
                        lambda x: x, data, 0.3, n_levels=3, d=1,
                        n_ens=[8, 8], key=jax.random.key(7))
