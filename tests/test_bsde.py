"""BSDE solver (bsde.py) — beyond-reference tier.

Anchors, each a closed form:

* ``f = 0``: plain Feynman-Kac — the GBM call expectation
  ``e^{rT} BS``;
* ``f = -r y``: linear discounting — the Black-Scholes price;
* ``f = -r y - z (mu - r)/sigma`` with a WRONG drift ``mu != r``: the
  classic Black-Scholes driver — the Z regression performs the measure
  change and the r-discounted price must come back (the sharpest test
  of the martingale-representation term);
* a manufactured NONLINEAR driver around ``u(t, x) =
  e^{alpha (T - t)} sin(x)`` on Brownian motion: exact
  ``(Y_0, Z_0) = (e^{alpha T} sin(x0), e^{alpha T} cos(x0))``, the
  quadratic term active pathwise;
* Euler bias decreases with n_steps.
"""
import numpy as np
import pytest
import jax.numpy as jnp
import jax

from mlmc_tpu.bsde import solve_bsde
from mlmc_tpu.sim.sde import SDEModel, black_scholes_call, gbm

R, SIG, T = 0.05, 0.2, 1.0


def test_feynman_kac_and_discounting():
    """f = 0 gives E[g(X_T)]; f = -r y discounts it to the BS price
    (CLT + O(dt) Euler allowance)."""
    model = gbm(R, SIG, 1.0)
    g = lambda x: jnp.maximum(x - 1.0, 0.0)
    bs = black_scholes_call(1.0, 1.0, R, SIG, T)
    out0 = solve_bsde(model, g, lambda t, x, y, z: 0.0 * y, T, 32,
                      n_paths=1 << 16, key=jax.random.key(1))
    ref0 = np.exp(R * T) * bs
    assert abs(out0["y0"] - ref0) < 6 * out0["y0_se"] + 2e-3, \
        (out0["y0"], ref0)
    out1 = solve_bsde(model, g, lambda t, x, y, z: -R * y, T, 32,
                      n_paths=1 << 16, key=jax.random.key(2))
    assert abs(out1["y0"] - bs) < 6 * out1["y0_se"] + 2e-3, \
        (out1["y0"], bs)


def test_black_scholes_driver_measure_change():
    """Forward drift mu = 0.15 != r, driver
    f = -r y - z (mu - r)/sigma: the Z term must remove the drift
    mispricing and return the r-discounted Black-Scholes price. The
    naive discount-only driver is verifiably WRONG here (>> its own
    error bar), so the agreement is attributable to the Z regression."""
    mu = 0.15
    model = gbm(mu, SIG, 1.0)
    g = lambda x: jnp.maximum(x - 1.0, 0.0)
    bs = black_scholes_call(1.0, 1.0, R, SIG, T)
    lam = (mu - R) / SIG
    out = solve_bsde(model, g,
                     lambda t, x, y, z: -R * y - lam * z, T, 50,
                     n_paths=1 << 17, degree=5,
                     key=jax.random.key(3))
    assert abs(out["y0"] - bs) < 6 * out["y0_se"] + 4e-3, \
        (out["y0"], bs, out["y0_se"])
    naive = solve_bsde(model, g, lambda t, x, y, z: -R * y, T, 50,
                       n_paths=1 << 16, key=jax.random.key(4))
    assert naive["y0"] - bs > 0.02   # drift mispricing really is there


def test_manufactured_nonlinear_exact():
    """u(t, x) = e^{alpha(T-t)} sin(x) on X = x0 + W: driver
    f = (alpha + 1/2) y + c (y^2 - u(t,x)^2) keeps u exact while the
    quadratic term is active pathwise; pins Y_0 AND Z_0 inside their
    honest CLT bands (+ a small trapezoid-bias allowance)."""
    alpha, c, x0 = 0.4, 0.5, 0.8
    model = SDEModel(drift=lambda x, t: jnp.zeros_like(x),
                     diffusion=lambda x, t: jnp.ones_like(x), s0=x0)

    def u_exact(t, x):
        return jnp.exp(alpha * (T - t)) * jnp.sin(x)

    def driver(t, x, y, z):
        return (alpha + 0.5) * y + c * (y ** 2 - u_exact(t, x) ** 2)

    out = solve_bsde(model, lambda x: jnp.sin(x), driver, T, 32,
                     n_paths=1 << 16, degree=6, scale=1.0,
                     key=jax.random.key(5))
    y_ref = float(np.exp(alpha * T) * np.sin(x0))
    z_ref = float(np.exp(alpha * T) * np.cos(x0))
    assert abs(out["y0"] - y_ref) < 6 * out["y0_se"] + 5e-3, \
        (out["y0"], y_ref, out["y0_se"])
    assert abs(out["z0"] - z_ref) < 6 * out["z0_se"] + 0.01, \
        (out["z0"], z_ref, out["z0_se"])


def test_error_bars_are_honest():
    """The reported y0_se is the PATHWISE-accumulator CLT error: over
    independent seeds the normalized errors must behave like unit
    z-scores (max |z| under 5 over 5 runs), not like the ~10x
    understated smoothed-value bars the naive estimator gives."""
    alpha, c, x0 = 0.4, 0.5, 0.8
    model = SDEModel(drift=lambda x, t: jnp.zeros_like(x),
                     diffusion=lambda x, t: jnp.ones_like(x), s0=x0)
    u_ex = lambda t, x: jnp.exp(alpha * (T - t)) * jnp.sin(x)
    drv = lambda t, x, y, z: (alpha + 0.5) * y \
        + c * (y ** 2 - u_ex(t, x) ** 2)
    y_ref = float(np.exp(alpha * T) * np.sin(x0))
    zs = []
    for s in range(5):
        out = solve_bsde(model, lambda x: jnp.sin(x), drv, T, 16,
                         n_paths=1 << 14, degree=6, scale=1.0,
                         key=jax.random.key(200 + s))
        zs.append((out["y0"] - y_ref) / out["y0_se"])
    assert max(abs(v) for v in zs) < 5.0, zs
    assert np.std(zs) > 0.2, zs   # bars not wildly over-inflated either


def test_validation():
    model = gbm(R, SIG, 1.0)
    with pytest.raises(ValueError, match="n_steps"):
        solve_bsde(model, lambda x: x, lambda t, x, y, z: y, T, 0)
    with pytest.raises(ValueError, match="picard"):
        solve_bsde(model, lambda x: x, lambda t, x, y, z: y, T, 4,
                   picard=0)
