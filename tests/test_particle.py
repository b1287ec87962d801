"""Particle filter tier: bootstrap PF against the exact Kalman filter
and an exact dense grid filter, MLPF coupling contracts."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.filter import kalman_filter
from mlmc_tpu.particle import (particle_filter,
                               multilevel_particle_filter)


def _linear_gaussian(T=40, d=2, seed=0):
    rng = np.random.default_rng(seed)
    M = np.array([[0.9, 0.1], [0.0, 0.8]])
    H = np.array([[1.0, 0.0]])
    q, r = 0.3, 0.4
    x = rng.standard_normal(d)
    ys = []
    for _ in range(T):
        x = M @ x + q * rng.standard_normal(d)
        ys.append(H @ x + r * rng.standard_normal(1))
    return M, H, q, r, np.array(ys)


def test_pf_matches_kalman_filter():
    M, H, q, r, ys = _linear_gaussian()
    kf = kalman_filter(M, H, q**2 * np.eye(2), r**2 * np.eye(1),
                       np.zeros(2), np.eye(2), ys)
    Mj, Hj = jnp.asarray(M), jnp.asarray(H)

    def trans(x, key, t):
        return x @ Mj.T + q * jax.random.normal(key, x.shape, x.dtype)

    def ll(x, y):
        res = (y - Hj @ x) / r
        return -0.5 * jnp.sum(res * res)

    out = particle_filter(trans, ll, ys, n_particles=2 ** 14, d=2,
                          key=jax.random.key(1))
    # filtered means within 5 island-se (and se itself sane)
    err = np.abs(out["means"] - kf["means"])
    assert np.all(err < 5.0 * np.maximum(out["means_se"], 0.01))
    # unbiased evidence: log of island-mean within a few percent
    assert abs(out["loglik"] - kf["loglik"]) < 0.02 * abs(kf["loglik"])
    assert 0.0 < out["resample_frac"] <= 1.0
    assert out["ess"].shape == (len(ys),)


def _grid_filter(f, q, loglik, ys, grid, p0):
    """Exact dense filter for a 1-d model x' = f(x, t) + N(0, q^2)."""
    g = grid[:, None]
    p = p0 / p0.sum()
    means = []
    for t, y in enumerate(ys):
        fx = f(grid, t)[None, :]                     # [1, G] sources
        trans = np.exp(-0.5 * ((g - fx) / q) ** 2)   # [G_new, G_old]
        p = trans @ p
        p = p * np.exp(loglik(grid, y))
        p = p / p.sum()
        means.append(float(np.sum(grid * p)))
    return np.array(means)


def test_pf_nonlinear_vs_grid_filter():
    """The UNGM benchmark (bimodal posterior — quadratic observation
    cannot distinguish sign) against an exact 1600-point grid filter."""
    q, r, T = np.sqrt(10.0), 1.0, 40
    rng = np.random.default_rng(2)

    def f_np(x, t):
        return (0.5 * x + 25.0 * x / (1.0 + x * x)
                + 8.0 * np.cos(1.2 * t))

    x = 0.1
    ys = []
    for t in range(T):
        x = f_np(x, t) + q * rng.standard_normal()
        ys.append(x * x / 20.0 + r * rng.standard_normal())
    ys = np.array(ys)[:, None]

    grid = np.linspace(-40, 40, 1600)
    exact = _grid_filter(f_np, q,
                         lambda xg, y: -0.5 * ((y[0] - xg ** 2 / 20.0)
                                               / r) ** 2,
                         ys, grid, np.exp(-0.5 * (grid / 5.0) ** 2))

    def trans(xx, key, t):
        drift = (0.5 * xx + 25.0 * xx / (1.0 + xx * xx)
                 + 8.0 * jnp.cos(1.2 * t))
        return drift + q * jax.random.normal(key, xx.shape, xx.dtype)

    def ll(xx, y):
        return -0.5 * ((y[0] - xx[0] ** 2 / 20.0) / r) ** 2

    out = particle_filter(
        trans, ll, ys, n_particles=2 ** 15, d=1, key=jax.random.key(3),
        x0_sampler=lambda k: 5.0 * jax.random.normal(k, (2 ** 15, 1)))
    err = np.abs(out["means"][:, 0] - exact)
    tol = 5.0 * np.maximum(out["means_se"][:, 0], 0.15)
    assert np.mean(err < tol) > 0.9, (err / tol).max()
    # and the filter actually tracks: far better than the prior mean 0
    assert np.mean(err) < 0.3 * np.mean(np.abs(exact))


def test_pf_contracts():
    def trans(x, key, t):
        return x

    def ll(x, y):
        return jnp.zeros(())

    ys = np.zeros((3, 1))
    with pytest.raises(ValueError, match="ess_threshold"):
        particle_filter(trans, ll, ys, 64, 1, ess_threshold=1.5)
    with pytest.raises(ValueError, match="multiple"):
        particle_filter(trans, ll, ys, 65, 1, n_islands=8)
    with pytest.raises(ValueError, match="n_levels"):
        multilevel_particle_filter(lambda l: trans, ll, ys, 0, 1)


def _ou_levels(n_levels, delta=0.5, theta=1.0, sigma=1.0):
    """Euler transitions for OU over one observation window, sharing
    the finest-resolution Brownian path through the key so same-key
    fine/coarse propagations are pathwise coupled."""
    n_fin = 2 ** (n_levels - 1)

    def make(lev):
        n_sub = 2 ** lev
        blk = n_fin // n_sub
        dt = delta / n_sub

        def trans(x, key, t):
            dw = jax.random.normal(key, (x.shape[0], n_fin), x.dtype)
            dw = (dw * np.sqrt(delta / n_fin)).reshape(
                x.shape[0], n_sub, blk).sum(-1)

            def body(i, xx):
                return xx + (-theta * xx) * dt + sigma * dw[:, i]

            return jax.lax.fori_loop(0, n_sub, body, x[:, 0])[:, None]

        return trans

    return make


def test_mlpf_identical_kernels_give_exact_zero():
    make = _ou_levels(3)
    fine = make(2)
    ys = np.asarray(
        np.random.default_rng(5).standard_normal((10, 1)))

    out = multilevel_particle_filter(
        lambda lev: fine, lambda x, y: -0.5 * (y[0] - x[0]) ** 2,
        ys, n_levels=3, d=1, n_particles=512,
        key=jax.random.key(6))
    assert np.all(out["correction_l1"] == 0.0)
    assert np.allclose(out["means"], out["level_means"][0])


def test_mlpf_telescopes_and_corrections_decay():
    n_levels, T = 4, 30
    make = _ou_levels(n_levels)
    rng = np.random.default_rng(7)
    # simulate data from the fine model (host Euler, same scheme)
    n_fin, delta, theta, sigma, r = 8, 0.5, 1.0, 1.0, 0.5
    x = 0.0
    ys = []
    for t in range(T):
        for _ in range(n_fin):
            x = x + (-theta * x) * (delta / n_fin) + sigma * np.sqrt(
                delta / n_fin) * rng.standard_normal()
        ys.append(x + r * rng.standard_normal())
    ys = np.array(ys)[:, None]

    def ll(x, y):
        return -0.5 * ((y[0] - x[0]) / r) ** 2

    out = multilevel_particle_filter(
        make, ll, ys, n_levels=n_levels, d=1,
        n_particles=[8192, 4096, 2048, 1024], key=jax.random.key(8))
    # coupled corrections decay with level (strong-rate coupling)
    c = out["correction_l1"]
    assert c[0] > c[-1] * 1.5, c
    # telescoped estimate matches a fine-only bootstrap PF
    fine_pf = particle_filter(make(n_levels - 1), ll, ys,
                              n_particles=2 ** 14, d=1,
                              key=jax.random.key(9))
    err = np.abs(out["means"] - fine_pf["means"])
    band = 5.0 * np.sqrt(out["means_se"] ** 2
                         + fine_pf["means_se"] ** 2) + 0.02
    assert np.mean(err < band) > 0.9, (err / band).max()


def test_coupled_resample_marginals():
    """The maximal coupling must preserve BOTH marginals exactly:
    empirical ancestor frequencies match the weight vectors."""
    from mlmc_tpu.particle import _coupled_resample
    m, reps = 16, 4000
    rng = np.random.default_rng(11)
    logwf = jnp.asarray(np.log(rng.dirichlet(np.ones(m))))[None, :]
    logwc = jnp.asarray(np.log(rng.dirichlet(np.ones(m))))[None, :]
    dtype = jnp.asarray(1.0).dtype
    counts_f = np.zeros(m)
    counts_c = np.zeros(m)
    same = 0
    res = jax.jit(lambda k: _coupled_resample(
        jnp.tile(logwf, (reps, 1)), jnp.tile(logwc, (reps, 1)),
        k, m, dtype))
    idxf, idxc = jax.device_get(res(jax.random.key(12)))
    counts_f = np.bincount(idxf.ravel(), minlength=m)
    counts_c = np.bincount(idxc.ravel(), minlength=m)
    n = reps * m
    wf = np.exp(np.asarray(logwf[0]))
    wc = np.exp(np.asarray(logwc[0]))
    se_f = np.sqrt(wf * (1 - wf) / n)
    se_c = np.sqrt(wc * (1 - wc) / n)
    assert np.all(np.abs(counts_f / n - wf) < 6 * se_f + 1e-4)
    assert np.all(np.abs(counts_c / n - wc) < 6 * se_c + 1e-4)
    # and the coupling is maximal: same-ancestor fraction ~ sum min(w)
    alpha = np.minimum(wf, wc).sum()
    frac_same = float(np.mean(idxf == idxc))
    # same-index can also happen by chance in the residual branch
    assert frac_same >= alpha - 6 * np.sqrt(alpha * (1 - alpha) / n)


def test_pf_mesh_sharded_islands():
    """Islands shard across the virtual 8-device mesh: statistically
    equivalent to the single-device run (salted per-shard streams), and
    the divisibility contract is loud."""
    from mlmc_tpu.parallel import SampleMesh
    M, H, q, r, ys = _linear_gaussian(seed=4)
    kf = kalman_filter(M, H, q**2 * np.eye(2), r**2 * np.eye(1),
                       np.zeros(2), np.eye(2), ys)
    Mj, Hj = jnp.asarray(M), jnp.asarray(H)

    def trans(x, key, t):
        return x @ Mj.T + q * jax.random.normal(key, x.shape, x.dtype)

    def ll(x, y):
        res = (y - Hj @ x) / r
        return -0.5 * jnp.sum(res * res)

    mesh = SampleMesh()
    out = particle_filter(trans, ll, ys, n_particles=2 ** 13, d=2,
                          key=jax.random.key(2), n_islands=16,
                          mesh=mesh)
    err = np.abs(out["means"] - kf["means"])
    assert np.all(err < 5.0 * np.maximum(out["means_se"], 0.02))
    assert abs(out["loglik"] - kf["loglik"]) < 0.03 * abs(kf["loglik"])
    assert out["particles"].shape == (16, 2 ** 13 // 16, 2)
    with pytest.raises(ValueError, match="divide"):
        particle_filter(trans, ll, ys, n_particles=1200, d=2,
                        n_islands=12, mesh=mesh)


def test_mlpf_mesh_sharded():
    """MLPF levels shard islands over the virtual mesh; identical
    kernels still give exactly zero corrections per shard."""
    from mlmc_tpu.parallel import SampleMesh
    make = _ou_levels(3)
    fine = make(2)
    ys = np.asarray(np.random.default_rng(5).standard_normal((8, 1)))
    out = multilevel_particle_filter(
        lambda lev: fine, lambda x, y: -0.5 * (y[0] - x[0]) ** 2,
        ys, n_levels=3, d=1, n_particles=512, n_islands=16,
        key=jax.random.key(6), mesh=SampleMesh())
    assert np.all(out["correction_l1"] == 0.0)
    assert np.allclose(out["means"], out["level_means"][0])
