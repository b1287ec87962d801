"""Expected-information-gain tests: the linear-Gaussian mutual
information closed form (plain nested AND unbiased MLMC estimators),
the Jensen bias direction, design ranking/monotonicity, and noise
scaling."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mlmc_tpu.oed import (eig_nmc, expected_information_gain,
                          linear_gaussian_eig, make_eig_inner)


def _design(rows, seed=0, d=3):
    rng = np.random.default_rng(seed)
    G = rng.normal(size=(rows, d))
    Gj = jnp.asarray(G)
    return G, (lambda th: Gj @ th)


def test_linear_gaussian_closed_form_nmc():
    G, fwd = _design(4)
    exact = linear_gaussian_eig(G, 0.5)
    out = eig_nmc(fwd, 0.5, d=3, n_outer=4096, n_inner=1024,
                  key=jax.random.key(1))
    assert abs(out["eig"] - exact) < 6 * out["se"] + 0.02
    assert out["se"] < 0.05


def test_nmc_bias_is_upward():
    """-log of a noisy inner mean overestimates EIG (Jensen): the
    crude-inner estimate must exceed the rich-inner one."""
    G, fwd = _design(4, seed=1)
    crude = eig_nmc(fwd, 0.5, d=3, n_outer=8192, n_inner=8,
                    key=jax.random.key(2))
    rich = eig_nmc(fwd, 0.5, d=3, n_outer=8192, n_inner=1024,
                   key=jax.random.key(2))
    assert crude["eig"] > rich["eig"] + 2 * crude["se"]


def test_unbiased_mlmc_eig():
    """The randomized-truncation MLMC estimator hits the closed form
    with a pure statistical error bar — no inner-count bias to tune."""
    G, fwd = _design(4, seed=2)
    exact = linear_gaussian_eig(G, 0.5)
    out = expected_information_gain(fwd, 0.5, d=3, target_var=4e-4,
                                    seed=3)
    assert out["target_met"]
    assert abs(out["mean"] - exact) < 6 * out["se"] + 0.02


def test_design_ranking_and_noise_scaling():
    """More observation rows => more information (closed form AND
    estimator agree on the ranking); noisier observations => less."""
    G4, fwd4 = _design(4, seed=4)
    G2, fwd2 = _design(2, seed=5)
    exact4 = linear_gaussian_eig(G4, 0.5)
    exact2 = linear_gaussian_eig(G2, 0.5)
    # nested design: the 2-row design is a subset of its 4-row extension
    G4n = np.vstack([G2, np.asarray(_design(2, seed=6)[0])])
    assert linear_gaussian_eig(G4n, 0.5) > exact2
    assert linear_gaussian_eig(G2, 2.0) < exact2
    e4 = eig_nmc(fwd4, 0.5, d=3, n_outer=2048, n_inner=512,
                 key=jax.random.key(7))
    e2 = eig_nmc(fwd2, 0.5, d=3, n_outer=2048, n_inner=512,
                 key=jax.random.key(8))
    if exact4 > exact2:
        assert e4["eig"] > e2["eig"]
    else:
        assert e2["eig"] > e4["eig"]


def test_inner_fn_contract_and_validation():
    """Likelihood ratios at offset draws are reproducible through the
    (key, offset) contract and bounded sanely; odd n_inner rejected."""
    _, fwd = _design(3, seed=9)
    inner = make_eig_inner(fwd, 0.5, d=3)
    keys = jax.random.split(jax.random.key(0), 4)
    offs = jnp.arange(6, dtype=jnp.uint32)
    r1 = inner(keys, offs)
    r2 = inner(keys, offs)
    assert r1.shape == (4, 6)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    assert np.all(np.asarray(r1) >= 0)
    with pytest.raises(ValueError, match="even"):
        eig_nmc(fwd, 0.5, d=3, n_outer=8, n_inner=3)
