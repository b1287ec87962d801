"""Nested-expectation MLMC (mlmc_tpu/nested.py): antithetic exactness
under linear g, variance-decay advantage over prefix coupling, the
closed-form Gaussian information problem through both the unbiased and
truncated drivers, and multi-decision EVPPI."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mlmc_tpu.nested import (nested_level_fn, nested_value_fn, g_max0,
                             evppi_level_fn, gaussian_information_fn,
                             evppi_gaussian_exact)


def _keys(n, seed=0):
    return jax.random.split(jax.random.key(seed), n)


def test_identity_g_collapses_exactly():
    """With g = identity the antithetic correction is algebraically
    zero: mean(all) == (mean(first half) + mean(second half)) / 2."""
    inner = gaussian_information_fn()
    fn = nested_level_fn(inner, g=lambda m: m, n0=2)
    for lev in (1, 2, 4):
        d = np.asarray(fn(lev, _keys(256, lev)))
        assert np.abs(d).max() < 1e-12, (lev, np.abs(d).max())


def test_antithetic_beats_prefix_coupling():
    """V_l of the antithetic correction must decay faster than the
    prefix-coupled value differences under the kinked EVPPI g
    (beta ~ 1.5 vs ~ 1, Giles & Goda 2019)."""
    inner = gaussian_information_fn(sigma_y=1.0, sigma_x=2.0)
    anti = nested_level_fn(inner, g=g_max0, n0=2)
    value = nested_value_fn(inner, g=g_max0, n0=2)
    keys = _keys(1 << 13, 7)
    v_anti, v_pref = [], []
    for lev in (2, 3, 4, 5):
        da = np.asarray(anti(lev, keys))
        dp = np.asarray(value((lev,), keys)) - np.asarray(
            value((lev - 1,), keys))
        v_anti.append(da.var())
        v_pref.append(dp.var())
    v_anti, v_pref = np.array(v_anti), np.array(v_pref)
    # both decay; antithetic decays faster and is smaller at depth
    assert np.all(np.diff(np.log2(v_anti)) < -1.0)
    assert v_anti[-1] < 0.5 * v_pref[-1]
    # measured antithetic rate ~ 2^-1.5 per level or better
    rate = (np.log2(v_anti[0]) - np.log2(v_anti[-1])) / 3
    assert rate > 1.2, rate


def test_unbiased_nested_gaussian_closed_form():
    """UnbiasedMLMC over the antithetic corrections estimates
    E[max(0, Y)] with zero inner-sampling bias."""
    from mlmc_tpu.unbiased import GeometricLevels, UnbiasedMLMC

    sigma_y, mu = 1.3, 0.2
    inner = gaussian_information_fn(sigma_y=sigma_y, sigma_x=1.5, mu=mu)
    fn = nested_level_fn(inner, g=g_max0, n0=2)
    mc = UnbiasedMLMC(fn, GeometricLevels(2.0 ** -1.25),
                      estimator="single", seed=3, chunk_size=1024,
                      cost_fn=lambda lv: 2.0 ** lv)
    out = mc.run(target_var=4e-6)
    exact = evppi_gaussian_exact(sigma_y=sigma_y, mu=mu)
    assert out["target_met"]
    assert abs(out["mean"] - exact) < 6 * np.sqrt(out["var"]) + 1e-3


def test_mimc_truncated_driver_on_value_form():
    """1-D MIMC over the prefix-coupled value form is the truncated
    adaptive nested driver; its estimate approaches the closed form
    with the documented O(1/N_L) remainder."""
    from mlmc_tpu.mimc import MIMC

    inner = gaussian_information_fn(sigma_y=1.0, sigma_x=1.0)
    value = nested_value_fn(inner, g=g_max0, n0=4)
    iset = [(l,) for l in range(6)]
    m = MIMC(value, iset, seed=5, chunk_size=1 << 11,
             cost_fn=lambda a: 2.0 ** a[0])
    res = m.run(target_var=1e-6)
    exact = evppi_gaussian_exact(sigma_y=1.0)
    # remainder ~ c / N_L = c / (4 * 2^5); generous envelope + 6 sigma
    assert abs(res["mean"] - exact) < 6 * np.sqrt(res["var"]) + 4e-3
    assert res["target_met"]


def test_multi_decision_evppi():
    """Two decisions (act: mu + Y + X, don't: 0): E[max_d E[f_d|Y]]
    equals the scalar closed form E[max(0, mu + Y)]."""
    sigma_y, mu = 1.0, -0.3
    base = gaussian_information_fn(sigma_y=sigma_y, sigma_x=2.0, mu=mu)

    def inner2(keys, offsets):
        act = base(keys, offsets)                       # [C, n]
        return jnp.stack([jnp.zeros_like(act), act], axis=-1)

    fn = evppi_level_fn(inner2, n0=2)
    keys = _keys(1 << 14, 11)
    # telescoped partial sum to level 5 ~ value at N = 64 (bias ~ 1/64)
    total = sum(float(jnp.mean(fn(lev, keys))) for lev in range(6))
    exact = evppi_gaussian_exact(sigma_y=sigma_y, mu=mu)
    assert abs(total - exact) < 0.02, (total, exact)


def test_validation():
    inner = gaussian_information_fn()
    with pytest.raises(ValueError, match="even"):
        nested_level_fn(inner, n0=3)
    with pytest.raises(ValueError, match="n0"):
        nested_level_fn(inner, n0=0)
    with pytest.raises(ValueError, match="n0"):
        nested_value_fn(inner, n0=0)
    # n0 = 1: level 0 is a single draw, corrections start at level 1
    fn = nested_level_fn(inner, n0=1)
    d0 = np.asarray(fn(0, _keys(64)))
    assert d0.shape == (64,)
    d1 = np.asarray(fn(1, _keys(64)))
    assert np.all(np.isfinite(d1))


def test_evppi_rejects_scalar_inner():
    """A scalar inner_fn through evppi_level_fn would silently max over
    the batch axis — it must raise instead."""
    inner = gaussian_information_fn()
    fn = evppi_level_fn(inner, n0=2)
    with pytest.raises(ValueError, match="multi-decision"):
        fn(1, _keys(16))
