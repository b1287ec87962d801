"""Risk tier: CVaR against Gaussian closed forms, differentiable MLMC
gradients against exact derivatives, optimization convergence."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.risk import (cvar_empirical, cvar_mlmc, mlmc_gradient,
                           optimize_expectation, optimize_cvar)


def _phi(z):
    return np.exp(-0.5 * z * z) / np.sqrt(2 * np.pi)


def _z_alpha(alpha):
    from math import erf, sqrt
    # inverse normal CDF by bisection (no scipy dependency)
    lo, hi = -10.0, 10.0
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if 0.5 * (1.0 + erf(mid / sqrt(2.0))) < alpha:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def test_cvar_empirical_gaussian():
    alpha = 0.95
    rng = np.random.default_rng(0)
    x = rng.standard_normal(400_000)
    out = cvar_empirical(x, alpha)
    za = _z_alpha(alpha)
    exact = _phi(za) / (1 - alpha)
    assert abs(out["var"] - za) < 0.02
    assert abs(out["cvar"] - exact) < 5 * out["cvar_se"] + 0.01
    with pytest.raises(ValueError, match="alpha"):
        cvar_empirical(x, 1.5)


def _quad_hierarchy(a0=0.3):
    """X_l = Z + a_l (Z^2 - 1), a_l = a0 2^-l: corrections decay
    geometrically and the FINEST level has the closed-form tail
    E[X 1{Z>z}] = (1 + a z) phi(z) (X monotone in Z for small a)."""

    def pair_fn(level, keys):
        z = jax.vmap(jax.random.normal)(keys)

        def f(lv):
            return z + a0 * 0.5 ** lv * (z * z - 1.0)

        coarse = f(level - 1) if level > 0 else jnp.zeros_like(z)
        return f(level), coarse, jnp.ones(z.shape, bool)

    return pair_fn


def test_cvar_mlmc_matches_closed_form():
    alpha, n_levels, a0 = 0.9, 4, 0.3
    a = a0 * 0.5 ** (n_levels - 1)
    pair_fn = _quad_hierarchy(a0)
    out = cvar_mlmc(pair_fn, n_levels, alpha, target_se=5e-3,
                    bandwidth=[0.4, 0.2, 0.1, 0.05], seed=3)
    za = _z_alpha(alpha)
    # X(z) = z + a(z^2-1) is monotone on the support: VaR = X(za) and
    # CVaR = E[X | Z > za] = [phi(za)(1 + a za) + a(1-alpha)*0]/(1-a)..
    # via E[Z 1] = phi, E[Z^2 1] = (1-alpha) + za phi:
    var_exact = za + a * (za * za - 1.0)
    tail = (_phi(za) + a * ((1 - alpha) + za * _phi(za))
            - a * (1 - alpha))
    cvar_exact = tail / (1 - alpha) + 0.0
    assert abs(out["var"] - var_exact) < 6 * out["var_se"] + 0.02
    assert abs(out["cvar"] - cvar_exact) < 6 * out["cvar_se"] + 0.02
    # corrections decay at the coupling rate
    c = np.abs(out["level_corrections"])
    assert c[1] > c[-1] * 1.5
    # allocation puts most samples on the coarse levels
    assert out["n_per_level"][0] >= out["n_per_level"][-1]


def _quad_obj(mu=1.3, s=0.7):
    """f_l(theta, Z) = (theta - mu - s(1+2^-l) Z)^2: every level's
    exact gradient is 2(theta - mu); per-sample corrections decay."""

    def obj_fn(level, theta, keys):
        z = jax.vmap(jax.random.normal)(keys)

        def f(lv):
            r = theta[0] - mu - s * (1.0 + 0.5 ** lv) * z
            return r * r

        coarse = f(level - 1) if level > 0 else jnp.zeros_like(z)
        return f(level), coarse, jnp.ones(z.shape, bool)

    return obj_fn


def test_mlmc_gradient_matches_closed_form():
    theta = jnp.array([2.0])
    out = mlmc_gradient(_quad_obj(), theta, n_levels=4,
                        n_per_level=[16384, 8192, 4096, 2048],
                        key=jax.random.key(1))
    # E[f_L] = (theta-mu)^2 + s^2 (1+2^-L)^2, grad = 2(theta - mu)
    g = np.asarray(out["grad"])[0]
    assert abs(g - 2.0 * (2.0 - 1.3)) < 0.05, g
    sL = 0.7 * (1 + 0.5 ** 3)
    assert abs(out["value"] - ((2.0 - 1.3) ** 2 + sL ** 2)) < 0.05
    # value-correction variance decays with level
    v = out["level_variances"]
    assert v[1] > v[3] * 2.0
    with pytest.raises(ValueError, match="levels"):
        mlmc_gradient(_quad_obj(), theta, 4, [1, 2])


def test_optimize_expectation_converges():
    out = optimize_expectation(_quad_obj(), jnp.array([4.0]),
                               n_levels=3,
                               n_per_level=[2048, 512, 128],
                               n_steps=250, key=jax.random.key(2))
    theta = float(np.asarray(out["theta"])[0])
    assert abs(theta - 1.3) < 0.05, theta
    # the objective trajectory actually descends
    assert np.mean(out["values"][-25:]) < np.mean(out["values"][:25])


def test_optimize_cvar_symmetric_problem():
    """CVaR_a[(theta - Z)^2] over Z~N(0,1) is minimized at theta=0,
    where the 0.9-quantile of Z^2 is chi2_1(0.9) and t converges to
    (a smoothed version of) it."""

    def obj_fn(level, theta, keys):
        z = jax.vmap(jax.random.normal)(keys)
        f = (theta[0] - z) ** 2
        return f, f, jnp.ones(z.shape, bool)

    out = optimize_cvar(obj_fn, jnp.array([1.5]), alpha=0.9,
                        n_levels=1, n_per_level=8192, n_steps=400,
                        smoothing=0.02, key=jax.random.key(4))
    theta = float(np.asarray(out["theta"])[0])
    assert abs(theta) < 0.1, theta
    chi2_90 = 2.705543  # chi^2_1 0.9-quantile
    assert abs(out["t"] - chi2_90) < 0.25, out["t"]
    # cvar estimate above var, below silly bounds
    assert out["cvar"] > out["t"]
    with pytest.raises(ValueError, match="smoothing"):
        optimize_cvar(obj_fn, jnp.array([0.0]), 0.9, 1, 64,
                      smoothing=-1.0)


def test_greeks_pathwise_mlmc():
    """Option Greeks as MLMC pathwise gradients straight through the
    SDE integrator: jax.grad flows through every coupled Milstein
    level. The European call's delta/vega land on Black-Scholes
    Phi(d1) / S0 phi(d1) sqrt(T); the DIGITAL delta — which plain
    pathwise differentiation cannot touch (a.s.-zero derivative of an
    indicator) — works through the conditional-expectation smoothing
    of sim/sde.py and lands on exp(-rT) phi(d2) / (S0 sigma sqrt(T))."""
    import scipy.stats as st

    from mlmc_tpu.sim.sde import (SDEModel, coupled_path_functionals,
                                  digital_call_smoothed, european_call)

    r, sig0, s0_0, K = 0.05, 0.2, 1.0, 1.0
    disc = float(np.exp(-r))
    steps = [(16, 0), (64, 16), (256, 64)]

    def make_obj(payoff_of):
        def obj(level, theta, keys):
            s0, sigma = theta
            model = SDEModel(
                drift=lambda s, t: r * s,
                diffusion=lambda s, t: sigma * s,
                diffusion_ds=lambda s, t: sigma * jnp.ones_like(s),
                s0=s0)
            nf, nc = steps[level]
            cfg = dict(model=model, scheme="milstein", total_time=1.0,
                       n_fine=nf, n_coarse=nc, path_extras=True)
            pf_f, _, pf_c = coupled_path_functionals(cfg, keys=keys)
            payoff = payoff_of()
            fine = payoff(pf_f)
            coarse = (payoff(pf_c) if pf_c is not None
                      else jnp.zeros_like(fine))
            return fine, coarse, jnp.ones(fine.shape[0], bool)

        return obj

    theta = (jnp.asarray(s0_0), jnp.asarray(sig0))
    d1 = (np.log(s0_0 / K) + (r + 0.5 * sig0 ** 2)) / sig0
    d2 = d1 - sig0

    out = mlmc_gradient(make_obj(lambda: european_call(K, disc)),
                        theta, 3, [1 << 15, 1 << 13, 1 << 12],
                        key=jax.random.key(21))
    delta, vega = [float(np.asarray(g)) for g in out["grad"]]
    assert abs(delta - st.norm.cdf(d1)) < 0.01, delta
    assert abs(vega - s0_0 * st.norm.pdf(d1)) < 0.02, vega

    out = mlmc_gradient(make_obj(lambda: digital_call_smoothed(K, disc)),
                        theta, 3, [1 << 15, 1 << 13, 1 << 12],
                        key=jax.random.key(22))
    delta_dig = float(np.asarray(out["grad"][0]))
    exact = disc * st.norm.pdf(d2) / (s0_0 * sig0)
    assert abs(delta_dig - exact) < 0.05 * exact, (delta_dig, exact)
