"""Multilevel BLUE (mlblue.py) — beyond-reference capability.

Validation: unbiasedness + variance calibration on an exact-covariance
Gaussian model family, optimality against the same-budget MLMC
telescope's closed-form variance, allocation behavior, and input
validation.
"""
import numpy as np
import pytest
import jax

from mlmc_tpu.mlblue import blue_variance, default_groups, mlblue
from mlmc_tpu.multifidelity import synth_fidelity_models

COSTS = [1.0, 0.05, 0.01]


def _models():
    """Exact-correlation family: corr(f0, fk) = rho_k, Var = 1."""
    return synth_fidelity_models(mean=1.0, sigma0=1.0,
                                 rhos=(0.98, 0.9), biases=(0.4, -0.2))


def test_blue_unbiased_and_calibrated():
    """The BLUE must target model 0's mean (surrogate biases must NOT
    leak) and its plug-in variance must calibrate against independent
    replicates."""
    ests, vars_ = [], []
    for s in range(12):
        res = mlblue(_models(), COSTS, budget=200.0, seed=s,
                     n_pilot=1 << 12, chunk_size=1 << 10)
        ests.append(res["mean"])
        vars_.append(res["var"])
    ests = np.asarray(ests)
    v = float(np.mean(vars_))
    assert abs(ests.mean() - 1.0) < 6 * np.sqrt(v / len(ests)), (
        ests.mean(), v)
    ratio = ests.var(ddof=1) / v
    assert 0.3 < ratio < 3.0, ratio          # 12-replicate chi2 band


def test_blue_beats_or_matches_mlmc():
    """BLUE is optimal over linear unbiased combinations, so its
    model-predicted variance at a budget can never sit above the
    optimally-allocated pair-telescope's closed form (reported as
    efficiency_vs_mlmc >= ~1)."""
    res = mlblue(_models(), COSTS, budget=500.0, seed=3,
                 n_pilot=1 << 13, chunk_size=1 << 10)
    assert res["efficiency_vs_mlmc"] > 0.95, res["efficiency_vs_mlmc"]
    # and the high-correlation surrogates must attract most samples
    n = res["n_per_group"]
    cheap = [k for k, g in enumerate(res["groups"]) if 0 not in g]
    assert n[cheap].sum() > 0


def test_allocation_objective_consistency():
    """blue_variance at the returned allocation reproduces the
    reported plug-in variance."""
    res = mlblue(_models(), COSTS, budget=300.0, seed=5,
                 n_pilot=1 << 12, chunk_size=1 << 10)
    v = blue_variance(res["groups"], res["pilot_cov"],
                      res["n_per_group"])
    assert np.isclose(v, res["var"], rtol=1e-10)


def test_target_var_mode():
    """target_var mode scales the optimal shape until the predicted
    variance meets the target."""
    res = mlblue(_models(), COSTS, target_var=1e-4, seed=7,
                 n_pilot=1 << 12, chunk_size=1 << 8)
    assert res["var"] <= 1.2e-4, res["var"]


def test_validation():
    models = _models()
    with pytest.raises(ValueError, match="exactly one"):
        mlblue(models, COSTS)
    with pytest.raises(ValueError, match="cover"):
        mlblue(models, COSTS, budget=10.0, groups=[(0, 1)])
    with pytest.raises(ValueError, match="one cost"):
        mlblue(models, [1.0], budget=10.0)
    assert default_groups(3) == [(0,), (1,), (2,), (0, 1), (1, 2),
                                 (0, 1, 2)]


def test_useless_surrogate_stays_identifiable():
    """A zero-correlation surrogate attracts no allocation, but Psi
    must stay nonsingular (the coverage guard bumps its cheapest
    group) and the estimate must stay calibrated."""
    models = synth_fidelity_models(mean=1.0, sigma0=1.0,
                                   rhos=(0.98, 0.0), biases=(0.4, 0.0))
    res = mlblue(models, COSTS, budget=200.0, seed=11,
                 n_pilot=1 << 12, chunk_size=1 << 10)
    assert np.isfinite(res["mean"]) and np.isfinite(res["var"])
    assert abs(res["mean"] - 1.0) < 8 * np.sqrt(res["var"])
    # every model appears in some positive group
    n, gs = res["n_per_group"], res["groups"]
    for i in range(3):
        assert any(n[k] > 0 and i in g for k, g in enumerate(gs)), i
