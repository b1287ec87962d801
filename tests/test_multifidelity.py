"""Multifidelity Monte Carlo (mlmc_tpu/multifidelity.py): pilot moment
recovery against exact correlations, the closed-form optimal allocation,
surrogate-bias-immune unbiasedness, empirical-vs-predicted estimator
variance, and model subset selection."""
import numpy as np
import pytest

from mlmc_tpu.multifidelity import MFMC, synth_fidelity_models


COSTS = np.array([1.0, 0.05, 0.001])


def test_pilot_recovers_exact_moments():
    models = synth_fidelity_models(mean=1.0, sigma0=2.0, rhos=(0.95, 0.8),
                                   biases=(0.3, -0.5))
    mf = MFMC(models, costs=COSTS, seed=0, chunk_size=2048)
    st = mf.pilot(1 << 14)
    assert np.allclose(st["sigma"], [2.0, 1.0, 1.0], rtol=0.05)
    assert np.allclose(st["rho"], [1.0, 0.95, 0.8], atol=0.02)
    assert abs(st["mean"][0] - 1.0) < 0.1
    assert np.allclose(st["costs"], COSTS)


def test_allocation_closed_form():
    """Exact pilot stats injected -> allocation must match the paper's
    closed form (Peherstorfer et al. 2016, Thm. 3.4)."""
    models = synth_fidelity_models(sigma0=2.0, rhos=(0.95, 0.8),
                                   biases=(0.0, 0.0))
    mf = MFMC(models, costs=COSTS, seed=1)
    sigma = np.array([2.0, 1.0, 1.0])
    rho = np.array([1.0, 0.95, 0.8])
    mf._pilot_stats = dict(sigma=sigma, rho=rho, costs=COSTS,
                           n_pilot=0, mean=np.zeros(3))
    budget = 1000.0
    sel = mf.select_models(budget)
    assert sel["subset"] == (0, 1, 2)
    r1 = np.sqrt(COSTS[0] * (0.95 ** 2 - 0.8 ** 2)
                 / (COSTS[1] * (1 - 0.95 ** 2)))
    r2 = np.sqrt(COSTS[0] * 0.8 ** 2 / (COSTS[2] * (1 - 0.95 ** 2)))
    m0 = budget / (COSTS[0] + COSTS[1] * r1 + COSTS[2] * r2)
    m = m0 * np.array([1.0, r1, r2])
    assert np.allclose(sel["m"], m, rtol=1e-12)
    var = 4.0 / m0 - ((1 / m[0] - 1 / m[1]) * 0.95 ** 2
                      + (1 / m[1] - 1 / m[2]) * 0.8 ** 2) * 4.0
    assert np.isclose(sel["var"], var, rtol=1e-12)
    # regression coefficients alpha_k = rho_k sigma_0 / sigma_k
    assert np.allclose(sel["alpha"], [1.0, 1.9, 1.6])
    # and it beats plain MC
    assert sel["var"] < sel["var_mc"]


def test_estimator_unbiased_and_variance_calibrated():
    """Surrogates with BIASES 0.3 / -0.5 must not shift the estimate
    (prefix differences cancel them), and the empirical variance over
    independent runs must match the closed-form prediction."""
    models = synth_fidelity_models(mean=1.0, sigma0=1.0, rhos=(0.95, 0.8),
                                   biases=(0.3, -0.5))
    mf = MFMC(models, costs=COSTS, seed=0, chunk_size=1024)
    ests, preds = [], []
    for s in range(24):
        mf.reseed(1000 + s)
        out = mf.estimate(budget=200.0, n_pilot=4096)
        ests.append(out["mean"])
        preds.append(out["var"])
        assert out["speedup"] > 1.0
    ests = np.array(ests)
    pred = float(np.mean(preds))
    # unbiased: mean of runs within 6 sigma of the run-mean spread
    assert abs(ests.mean() - 1.0) < 6 * np.sqrt(pred / len(ests))
    emp = ests.var(ddof=1)
    assert 0.4 < emp / pred < 2.5, (emp, pred)
    # and the variance genuinely beats same-budget plain MC
    var_mc = 1.0 * COSTS[0] / 200.0
    assert pred < 0.6 * var_mc


def test_select_models_drops_useless_surrogate():
    """An expensive, weakly correlated surrogate must be excluded."""
    models = synth_fidelity_models(sigma0=1.0, rhos=(0.9, 0.3),
                                   biases=(0.0, 0.0))
    mf = MFMC(models, costs=[1.0, 0.01, 0.5], seed=2)
    mf._pilot_stats = dict(sigma=np.ones(3),
                           rho=np.array([1.0, 0.9, 0.3]),
                           costs=np.array([1.0, 0.01, 0.5]),
                           n_pilot=0, mean=np.zeros(3))
    sel = mf.select_models(100.0)
    assert 2 not in sel["subset"]
    assert sel["subset"] == (0, 1)


def test_validation_errors():
    models = synth_fidelity_models()
    with pytest.raises(ValueError, match="at least"):
        MFMC(models[:1])
    with pytest.raises(ValueError, match="positive"):
        MFMC(models, costs=[1.0, -0.1, 0.2])
    with pytest.raises(ValueError, match="positive"):
        MFMC(models, costs=[1.0, 0.1])
    mf = MFMC(models, costs=COSTS)
    with pytest.raises(ValueError, match="pilot"):
        mf.select_models(1.0)
    with pytest.raises(ValueError, match="one bias"):
        synth_fidelity_models(rhos=(0.9,), biases=(0.1, 0.2))


def test_negative_correlation_surrogate():
    """Anticorrelated surrogates reduce variance exactly like positive
    ones (rho enters the allocation squared, alpha carries the sign)."""
    models = synth_fidelity_models(sigma0=1.0, rhos=(-0.9,), biases=(0.0,))
    mf = MFMC(models, costs=[1.0, 0.01], seed=4)
    mf._pilot_stats = dict(sigma=np.ones(2),
                           rho=np.array([1.0, -0.9]),
                           costs=np.array([1.0, 0.01]),
                           n_pilot=0, mean=np.zeros(2))
    sel = mf.select_models(100.0)
    assert sel["subset"] == (0, 1)
    assert sel["alpha"][1] < 0
    mf2 = MFMC(models, costs=[1.0, 0.01], seed=4)
    mf2._pilot_stats = dict(sigma=np.ones(2),
                            rho=np.array([1.0, 0.9]),
                            costs=np.array([1.0, 0.01]),
                            n_pilot=0, mean=np.zeros(2))
    assert np.isclose(sel["var"], mf2.select_models(100.0)["var"])
