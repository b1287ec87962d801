"""Longstaff-Schwartz optimal stopping (sim/american.py) —
beyond-reference capability.

Validation: the CRR binomial Bermudan backward induction on the same
exercise dates (the discrete dynamic program is exact up to tree
resolution), the American-call = European-call identity on
non-dividend GBM, early-exercise premium ordering, SDEModel substep
integration, and mesh-pooled regression parity.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.sim.american import (bermudan_binomial, call_payoff,
                                   lsmc_price, put_payoff)
from mlmc_tpu.sim.sde import black_scholes_call, gbm


R, SIG, T = 0.06, 0.2, 1.0


def test_bermudan_put_vs_binomial():
    """Out-of-sample LSMC price must bracket the binomial Bermudan
    value: a statistical lower bound (suboptimal stopping rule), but
    within regression accuracy of it; the in-sample value sits on the
    optimistic side."""
    tree = bermudan_binomial(1.0, 1.0, R, SIG, T, n_dates=16,
                             n_steps=4096)
    res = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=16,
                     sigma=SIG, degree=3, n_paths=1 << 16,
                     key=jax.random.key(3))
    assert res["price"] <= tree + 4 * res["price_se"], (res, tree)
    assert res["price"] >= tree - 6e-4 - 4 * res["price_se"], \
        (res["price"], tree, res["price_se"])
    assert res["price_insample"] >= res["price"] - 4 * res["price_se"]
    assert 0.0 < res["exercise_frac"] < 0.5
    # the paired European control matches Black-Scholes put parity
    euro_put = (black_scholes_call(1.0, 1.0, R, SIG, T)
                - 1.0 + np.exp(-R * T))
    assert abs(res["european"] - euro_put) < 5e-3


def test_early_exercise_premium_ordering():
    """Bermudan put > European put (positive premium), and more
    exercise dates never cheapen the claim (within noise)."""
    res16 = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=16,
                       sigma=SIG, n_paths=1 << 15,
                       key=jax.random.key(5))
    res2 = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=2,
                      sigma=SIG, n_paths=1 << 15,
                      key=jax.random.key(6))
    prem = res16["price"] - res16["european"]
    assert prem > 4 * res16["price_se"], res16
    assert res16["price"] >= res2["price"] - 2 * (
        res16["price_se"] + res2["price_se"])


def test_american_call_no_dividend_is_european():
    """Never optimal to exercise a call on a non-dividend asset: the
    LS price must land on Black-Scholes and the fitted rule must
    essentially never exercise."""
    bs = black_scholes_call(1.0, 1.0, R, SIG, T)
    res = lsmc_price(call_payoff(1.0), 1.0, R, T, n_dates=8,
                     sigma=SIG, n_paths=1 << 15,
                     key=jax.random.key(7))
    assert abs(res["price"] - bs) < 4 * res["price_se"] + 2e-3, \
        (res["price"], bs)
    assert res["exercise_frac"] < 0.05, res["exercise_frac"]


def test_sde_model_substeps_match_exact_gbm():
    """Euler substeps through the generic SDEModel path converge to
    the exact-transition price (weak bias at n_sub=8 below the
    combined statistical bands)."""
    res_exact = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=8,
                           sigma=SIG, n_paths=1 << 15,
                           key=jax.random.key(9))
    res_model = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=8,
                           model=gbm(R, SIG, 1.0), scheme="euler",
                           n_sub=8, n_paths=1 << 15,
                           key=jax.random.key(9))
    tol = 4 * (res_exact["price_se"] + res_model["price_se"]) + 1e-3
    assert abs(res_exact["price"] - res_model["price"]) < tol


def test_mesh_pooled_regression():
    """Path-sharded LSMC: the psum-pooled normal equations reproduce
    the single-device stopping rule statistically (same-seed runs are
    salted per shard, so compare prices within CLT bands)."""
    from mlmc_tpu.parallel import SampleMesh

    res1 = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=8,
                      sigma=SIG, n_paths=1 << 15,
                      key=jax.random.key(11))
    res8 = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=8,
                      sigma=SIG, n_paths=1 << 15,
                      key=jax.random.key(11), mesh=SampleMesh())
    tol = 5 * (res1["price_se"] + res8["price_se"])
    assert abs(res1["price"] - res8["price"]) < tol, (res1["price"],
                                                      res8["price"])
    # coefficients of the two fits describe the same rule: continuation
    # values agree where it matters (at the money; the basis is the
    # CENTERED monomials of s/scale - 1, so at-the-money x = 0)
    x = 0.0
    c1, c8 = res1["coef"][0], res8["coef"][0]
    v1 = sum(c * x ** k for k, c in enumerate(c1))
    v8 = sum(c * x ** k for k, c in enumerate(c8))
    assert abs(v1 - v8) < 0.02, (v1, v8)


def test_validation_errors():
    with pytest.raises(ValueError, match="exactly one"):
        lsmc_price(put_payoff(1.0), 1.0, R, T, 4)
    with pytest.raises(ValueError, match="exactly one"):
        lsmc_price(put_payoff(1.0), 1.0, R, T, 4, sigma=0.2,
                   model=gbm())
    with pytest.raises(ValueError, match="multiple"):
        bermudan_binomial(1.0, 1.0, R, SIG, T, n_dates=3, n_steps=100)


def test_dual_upper_bound_brackets():
    """The dual (martingale) bound must sit ABOVE the binomial value
    within CLT error, the out-of-sample LSMC price below it — a true
    two-sided bracket with no tree needed — and the gap must be tight
    (the regression surface is good, so the approximate-value
    martingale is nearly optimal)."""
    from mlmc_tpu.sim.american import lsmc_dual_bound

    tree = bermudan_binomial(1.0, 1.0, R, SIG, T, n_dates=8,
                             n_steps=4096)
    # the dual needs a GLOBALLY valid surface: itm_only=False
    res = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=8, sigma=SIG,
                     n_paths=1 << 15, key=jax.random.key(17),
                     itm_only=False)
    dual = lsmc_dual_bound(put_payoff(1.0), 1.0, R, T, n_dates=8,
                           coef=res["coef"], sigma=SIG,
                           n_paths=1 << 13, n_inner=64,
                           key=jax.random.key(18))
    assert dual["upper"] + 4 * dual["upper_se"] > tree, (dual, tree)
    assert res["price"] - 4 * res["price_se"] < dual["upper"]
    gap = dual["upper"] - res["price"]
    assert gap < 0.05 * tree + 4 * (dual["upper_se"]
                                    + res["price_se"]), (gap, tree)
    with pytest.raises(ValueError, match="degree"):
        lsmc_dual_bound(put_payoff(1.0), 1.0, R, T, 8,
                        coef=res["coef"], sigma=SIG, degree=7)


def test_system_lsmc_degenerate_heston_matches_binomial():
    """xi -> 0 with v0 = theta freezes the Heston variance: the 2-D
    system price must land on the GBM Bermudan binomial with
    sigma = sqrt(theta), up to CLT + Euler-substep bias."""
    from mlmc_tpu.sim.sde import heston

    model = heston(mu=R, kappa=2.0, theta=SIG ** 2, xi=1e-5, rho=0.0,
                   s0=1.0, v0=SIG ** 2)
    res = lsmc_price(lambda s: jnp.maximum(1.0 - s[..., 0], 0.0),
                     1.0, R, T, n_dates=8, model=model, n_sub=16,
                     degree=3, n_paths=1 << 15, key=jax.random.key(21))
    tree = bermudan_binomial(1.0, 1.0, R, SIG, T, n_dates=8,
                             n_steps=4096)
    err = abs(res["price"] - tree)
    assert err < 4 * res["price_se"] + 3e-3, (res["price"], tree)
    # total-degree (S, v) basis at degree 3: C(2+3, 3) = 10 terms
    assert res["coef"].shape == (7, 10)


def test_system_lsmc_heston_put_orderings():
    """Real Heston: the European leg matches put-call parity of the
    semi-analytic pricer within CLT + Euler bias, and the Bermudan
    price sits above it (early-exercise premium >= 0)."""
    from mlmc_tpu.sim.sde import heston, heston_call_price

    params = dict(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
    model = heston(mu=R, s0=1.0, **params)
    res = lsmc_price(lambda s: jnp.maximum(1.0 - s[..., 0], 0.0),
                     1.0, R, T, n_dates=8, model=model, n_sub=16,
                     degree=3, n_paths=1 << 15, key=jax.random.key(22))
    call = heston_call_price(1.0, 1.0, R, T=T, **params)
    euro_put = call - 1.0 + np.exp(-R * T)       # parity
    B = 1 << 15
    euro_se = 2.0 / np.sqrt(B)                   # crude payoff-var bound
    assert abs(res["european"] - euro_put) < 4 * euro_se + 3e-3, (
        res["european"], euro_put)
    assert res["price"] > res["european"] - 4 * res["price_se"]
    assert res["exercise_frac"] > 0.0


def test_system_lsmc_validation():
    from mlmc_tpu.sim.sde import heston

    model = heston()
    with pytest.raises(ValueError, match="euler"):
        lsmc_price(lambda s: s[..., 0], 1.0, R, T, 4, model=model,
                   scheme="milstein")
    with pytest.raises(ValueError, match="components"):
        lsmc_price(lambda s: s[..., 0], 1.0, R, T, 4, model=model,
                   scale=(1.0,))


def test_dual_bound_model_dynamics():
    """The nested-MC dual (no closed-form CV) on SDEModel/SDESystem
    dynamics: on degenerate Heston (xi -> 0 = GBM sigma=0.2) the upper
    bound must sit above the binomial value and the bracket must be
    reasonably tight; the scalar-SDEModel branch cross-checks against
    the exact-GBM CV branch (same surface, plain-MC inner can only sit
    HIGHER in expectation, within CLT noise)."""
    from mlmc_tpu.sim.american import lsmc_dual_bound
    from mlmc_tpu.sim.sde import heston

    model = heston(mu=R, kappa=2.0, theta=SIG ** 2, xi=1e-5, rho=0.0,
                   s0=1.0, v0=SIG ** 2)
    put = lambda s: jnp.maximum(1.0 - s[..., 0], 0.0)
    fit = lsmc_price(put, 1.0, R, T, n_dates=8, model=model, n_sub=4,
                     degree=3, n_paths=1 << 14, itm_only=False,
                     key=jax.random.key(31))
    dual = lsmc_dual_bound(put, 1.0, R, T, 8, coef=fit["coef"],
                           model=model, n_sub=4, n_paths=1 << 11,
                           n_inner=256, key=jax.random.key(32))
    tree = bermudan_binomial(1.0, 1.0, R, SIG, T, n_dates=8,
                             n_steps=4096)
    assert dual["upper"] + 4 * dual["upper_se"] > tree, (dual, tree)
    gap = dual["upper"] - fit["price"]
    assert gap < 0.5 * tree + 4 * dual["upper_se"], (gap, tree)

    # scalar SDEModel branch vs the closed-form-CV GBM branch
    fit_g = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=8, sigma=SIG,
                       n_paths=1 << 14, itm_only=False,
                       key=jax.random.key(33))
    d_cv = lsmc_dual_bound(put_payoff(1.0), 1.0, R, T, 8,
                           coef=fit_g["coef"], sigma=SIG,
                           n_paths=1 << 11, n_inner=256,
                           key=jax.random.key(34))
    d_mc = lsmc_dual_bound(put_payoff(1.0), 1.0, R, T, 8,
                           coef=fit_g["coef"], model=gbm(R, SIG, 1.0),
                           n_sub=8, n_paths=1 << 11, n_inner=256,
                           key=jax.random.key(34))
    # nested-MC Jensen inflation only pushes UP (+ CLT/Euler slack)
    tol = 4 * (d_cv["upper_se"] + d_mc["upper_se"]) + 3e-3
    assert d_mc["upper"] > d_cv["upper"] - tol, (d_mc, d_cv)
    assert d_mc["upper"] < d_cv["upper"] + 0.3 * tree


def test_dual_bound_model_validation():
    from mlmc_tpu.sim.american import lsmc_dual_bound
    from mlmc_tpu.sim.sde import heston

    model = heston()
    coef = np.zeros((7, 10))
    with pytest.raises(ValueError, match="exactly one"):
        lsmc_dual_bound(lambda s: s, 1.0, R, T, 8, coef=coef)
    with pytest.raises(ValueError, match="exactly one"):
        lsmc_dual_bound(lambda s: s, 1.0, R, T, 8, coef=coef,
                        sigma=SIG, model=model)
    with pytest.raises(ValueError, match="euler"):
        lsmc_dual_bound(lambda s: s, 1.0, R, T, 8, coef=coef,
                        model=model, scheme="milstein")
    with pytest.raises(ValueError, match="no total degree"):
        lsmc_dual_bound(lambda s: s, 1.0, R, T, 8,
                        coef=np.zeros((7, 11)), model=model)


def test_swing_single_right_is_bermudan():
    """n_rights=1 must reproduce the Bermudan LSMC (same key -> same
    panels, same decision rule, same global regression)."""
    from mlmc_tpu.sim.american import lsmc_swing

    kw = dict(sigma=SIG, degree=3, n_paths=1 << 14,
              key=jax.random.key(51))
    sw = lsmc_swing(put_payoff(1.0), 1.0, R, T, n_dates=8, n_rights=1,
                    **kw)
    be = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=8,
                    itm_only=False, **kw)
    assert abs(sw["price"] - be["price"]) < 1e-4, (sw["price"],
                                                   be["price"])


def test_swing_full_rights_is_sum_of_europeans():
    """n_rights = n_dates removes scarcity: exercise whenever ITM is
    optimal, so the value equals the SUM of European puts across the
    dates — a closed-form anchor for the multiple-stopping recursion."""
    from mlmc_tpu.sim.american import lsmc_swing

    n_dates = 6
    sw = lsmc_swing(put_payoff(1.0), 1.0, R, T, n_dates=n_dates,
                    n_rights=n_dates, sigma=SIG, degree=3,
                    n_paths=1 << 15, key=jax.random.key(52))
    total = 0.0
    for i in range(1, n_dates + 1):
        t = i * T / n_dates
        call = black_scholes_call(1.0, 1.0, R, SIG, t)
        total += call - 1.0 + np.exp(-R * t)         # parity, disc to 0
    assert abs(sw["price"] - total) < 4 * sw["price_se"] + 2e-3, (
        sw["price"], total)
    # the whole value curve: increasing in rights, concave increments
    p = sw["prices_by_rights"]
    assert np.all(np.diff(p) > -1e-12)
    inc = np.diff(np.concatenate([[0.0], p]))
    assert np.all(np.diff(inc) < 1e-4), inc


def test_swing_validation():
    from mlmc_tpu.sim.american import lsmc_swing

    with pytest.raises(ValueError, match="n_rights"):
        lsmc_swing(put_payoff(1.0), 1.0, R, T, n_dates=4, n_rights=5,
                   sigma=SIG)
    with pytest.raises(ValueError, match="n_rights"):
        lsmc_swing(put_payoff(1.0), 1.0, R, T, n_dates=4, n_rights=0,
                   sigma=SIG)


def test_ml_dual_matches_plain_and_decays():
    """The multilevel nested dual telescopes EXACTLY to the plain
    estimator's E[U(n_L)]: same fine inner-sample count, independent
    keys, CLT agreement — while the correction levels' means decay
    ~ 1/n_l (the Jensen inflation of the max) and their variances sit
    orders below level 0's (the whole point: the n_L bound at ~n_0
    inner cost per path)."""
    from mlmc_tpu.sim.american import lsmc_dual_bound, lsmc_dual_bound_ml

    model = gbm(mu=R, sigma=SIG, s0=1.0)
    fit = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=4,
                     model=model, n_sub=1, degree=3, n_paths=1 << 12,
                     itm_only=False, key=jax.random.key(61))
    plain = lsmc_dual_bound(put_payoff(1.0), 1.0, R, T, 4, fit["coef"],
                            model=model, n_sub=1, n_paths=1 << 11,
                            n_inner=32, key=jax.random.key(62))
    ml = lsmc_dual_bound_ml(put_payoff(1.0), 1.0, R, T, 4, fit["coef"],
                            model=model, n_sub=1, n0_inner=8,
                            n_levels=2, n_paths=1 << 11,
                            key=jax.random.key(63))
    tol = 4 * np.hypot(ml["upper_se"], plain["upper_se"])
    assert abs(ml["upper"] - plain["upper"]) < tol, (ml["upper"],
                                                     plain["upper"], tol)
    # a valid upper bound on the fitted lower bound
    assert ml["upper"] > fit["price"] - tol - 4 * fit["price_se"]
    vs = [lv["var"] for lv in ml["levels"]]
    assert vs[1] < 0.05 * vs[0], vs
    assert vs[2] < vs[1], vs
    # correction means: negative (the bound TIGHTENS with more inner
    # samples) and shrinking
    ms = [lv["mean"] for lv in ml["levels"]]
    assert ms[1] < 0 and ms[2] < 0, ms
    assert abs(ms[2]) < abs(ms[1]), ms
    assert ml["bias_indicator"] == abs(ms[2])
    assert ml["inner_evals"] < ml["single_level_evals"], ml


def test_ml_dual_validation():
    from mlmc_tpu.sim.american import lsmc_dual_bound_ml

    model = gbm(mu=R, sigma=SIG, s0=1.0)
    coef = np.zeros((3, 4))
    with pytest.raises(ValueError, match="n0_inner"):
        lsmc_dual_bound_ml(put_payoff(1.0), 1.0, R, T, 4, coef, model,
                           n0_inner=3)
    with pytest.raises(ValueError, match="entries"):
        lsmc_dual_bound_ml(put_payoff(1.0), 1.0, R, T, 4, coef, model,
                           n_levels=2, n_paths=[128, 128])


def test_degree7_f32_qr_stability():
    """Conditioning regression for the TSQR fit: the old
    normal-equation solve worked at cond(G)^2 — the equilibrated
    early-date monomial Gram keeps a Hilbert-like cond ~ 5.8^K, so
    degree >= 6 tipped f32 into garbage (BASELINE.md american row
    documented the cap). QR works at cond(G): the degree-6/7 f32
    prices must stay within regression accuracy of the binomial value
    and must not collapse below the degree-3 rule (a richer basis can
    only improve the stopping rule up to noise)."""
    tree = bermudan_binomial(1.0, 1.0, R, SIG, T, n_dates=16,
                             n_steps=4096)
    prices = {}
    for deg in (3, 6, 7):
        res = lsmc_price(put_payoff(1.0), 1.0, R, T, n_dates=16,
                         sigma=SIG, degree=deg, n_paths=1 << 15,
                         key=jax.random.key(7), dtype=jnp.float32)
        assert np.isfinite(res["price"]), (deg, res)
        assert res["price"] <= tree + 4 * res["price_se"], (deg, res)
        assert res["price"] >= tree - 2e-3 - 4 * res["price_se"], (
            deg, res["price"], tree)
        prices[deg] = (res["price"], res["price_se"])
    assert prices[7][0] >= prices[3][0] - 5 * (prices[7][1]
                                               + prices[3][1]), prices


def test_mesh_tsqr_degree6_parity():
    """The mesh fit is textbook TSQR (local QR + all-gathered R
    factors): at degree 6 / f32 the sharded stopping rule must agree
    with the single-device one — prices within CLT bands and the
    at-the-money continuation values close."""
    from mlmc_tpu.parallel import SampleMesh

    kw = dict(n_dates=8, sigma=SIG, degree=6, n_paths=1 << 14,
              key=jax.random.key(13), dtype=jnp.float32)
    res1 = lsmc_price(put_payoff(1.0), 1.0, R, T, **kw)
    res8 = lsmc_price(put_payoff(1.0), 1.0, R, T, mesh=SampleMesh(),
                      **kw)
    tol = 5 * (res1["price_se"] + res8["price_se"])
    assert abs(res1["price"] - res8["price"]) < tol, (res1["price"],
                                                      res8["price"])
    v1, v8 = res1["coef"][0][0], res8["coef"][0][0]   # ATM: x = 0
    assert abs(v1 - v8) < 0.02, (v1, v8)
