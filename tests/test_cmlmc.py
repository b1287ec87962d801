"""Continuation MLMC (cmlmc.py) — beyond-reference capability.

Validation: the error contract |bias| + z*se <= eps on a synthetic
hierarchy with EXACT known limit and rates (and on the Euler GBM call
against Black-Scholes), adaptive level growth as eps shrinks, rate
recovery, and input validation.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.cmlmc import cmlmc

MU, BIAS_C, ALPHA, BETA = 2.0, 0.6, 1.0, 1.5
STEPS = [0.5 ** k for k in range(12)]         # h = 1 .. 1/2048


def synth_pair(level, keys):
    """Exactly telescoping synthetic hierarchy: level value
    ``mu + c h^alpha + s(h) Z`` with the SAME Z fine/coarse, so
    corrections are deterministic-plus-noise with variance
    ~ (s(h_f) - s(h_c))^2 ~ h^beta and the h -> 0 limit is exactly mu."""
    z = jax.vmap(lambda k: jax.random.normal(k, ()))(keys)
    h_f = jnp.asarray(STEPS)[level]

    def value(h):
        return MU + BIAS_C * h ** ALPHA + 0.8 * h ** (BETA / 2) * z

    fine = value(h_f)
    coarse = (value(jnp.asarray(STEPS)[level - 1]) if level > 0
              else jnp.zeros_like(fine))
    return fine, coarse, jnp.ones(keys.shape[0], bool)


def test_error_contract_and_level_growth():
    """|estimate - mu| must respect eps across tolerances, and the
    chosen L must grow as eps shrinks (the bias fit drives it)."""
    res_loose = cmlmc(synth_pair, STEPS, eps=2e-2, seed=1,
                      n_pilot=1 << 10, chunk_size=1 << 10)
    res_tight = cmlmc(synth_pair, STEPS, eps=1e-3, seed=2,
                      n_pilot=1 << 10, chunk_size=1 << 10)
    for res, eps in ((res_loose, 2e-2), (res_tight, 1e-3)):
        assert res["bias_target_met"], res
        assert abs(res["mean"] - MU) < eps, (res["mean"], eps)
        assert res["error_bound"] <= eps * 1.05, res["error_bound"]
    assert res_tight["n_levels"] > res_loose["n_levels"], (
        res_loose["n_levels"], res_tight["n_levels"])
    # theory: bias c h^alpha <= (1-theta) eps => h_L <= eps/(2c)
    h_L = STEPS[res_tight["n_levels"] - 1]
    assert BIAS_C * h_L < 4 * 1e-3, h_L


def test_rate_recovery():
    """The final fits must land near the constructed alpha/beta."""
    res = cmlmc(synth_pair, STEPS, eps=1e-3, seed=3,
                n_pilot=1 << 11, chunk_size=1 << 10)
    assert abs(res["rates"]["alpha"] - ALPHA) < 0.3, res["rates"]
    assert abs(res["rates"]["beta"] - BETA) < 0.5, res["rates"]


def test_gbm_euler_call_vs_black_scholes():
    """End to end on the canonical SDE workload: Euler GBM European
    call (weak alpha ~ 1, beta ~ 1), priced to eps against the closed
    form through the shared pair_fn adapter."""
    from mlmc_tpu.cdf_estimate import simulation_pair_fn
    from mlmc_tpu.sim.sde import (SDESimulation, black_scholes_call,
                                  european_call, gbm)

    r, sig = 0.05, 0.2
    sim = SDESimulation(dict(
        model=gbm(r, sig, 1.0), scheme="euler",
        payoff=european_call(1.0, float(np.exp(-r)))))
    steps = [1 / 2, 1 / 8, 1 / 32, 1 / 128, 1 / 512]
    pair_fn, n_levels = simulation_pair_fn(sim, [[h] for h in steps])
    res = cmlmc(pair_fn, steps, eps=2e-3, seed=5, n_stages=3,
                n_pilot=1 << 11, chunk_size=1 << 11)
    bs = black_scholes_call(1.0, 1.0, r, sig, 1.0)
    assert abs(res["mean"] - bs) < 2e-3, (res["mean"], bs)
    assert res["error_bound"] <= 2e-3 * 1.05
    assert res["n_levels"] >= 3


def test_validation():
    with pytest.raises(ValueError, match="decrease"):
        cmlmc(synth_pair, [0.5, 0.5], eps=1e-2)
    with pytest.raises(ValueError, match="2-level"):
        cmlmc(synth_pair, [0.5], eps=1e-2)
    with pytest.raises(ValueError, match="theta"):
        cmlmc(synth_pair, STEPS, eps=1e-2, theta=1.5)
    with pytest.raises(ValueError, match="eps"):
        cmlmc(synth_pair, STEPS, eps=0.0)


def test_mesh_sharded_matches_single_device():
    """mesh= shards every level program across the 8-device virtual
    mesh; the continuation must take the same decisions (same counts,
    same level choice) and land on the same estimate to
    reduction-order rounding."""
    from mlmc_tpu.parallel.mesh import SampleMesh
    from mlmc_tpu.cmlmc import cmlmc

    kw = dict(eps=2e-3, seed=6, n_stages=2, n_pilot=1 << 10,
              chunk_size=1 << 10, cost_fn=lambda lv: 2.0 ** lv)
    r1 = cmlmc(synth_pair, STEPS, **kw)
    r8 = cmlmc(synth_pair, STEPS, mesh=SampleMesh(), **kw)
    assert r1["n_levels"] == r8["n_levels"]
    np.testing.assert_array_equal(r1["n_per_level"], r8["n_per_level"])
    np.testing.assert_allclose(r1["level_means"], r8["level_means"],
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(r1["mean"], r8["mean"], rtol=1e-10)
    with pytest.raises(ValueError, match="divide"):
        cmlmc(synth_pair, STEPS, eps=1e-2, chunk_size=10,
              mesh=SampleMesh())
