"""ML2R (multilevel Richardson-Romberg, mlmc_tpu/ml2r.py) — weight
identities, exact bias cancellation on a closed-form polynomial
expansion (where the unweighted telescope on the SAME samples shows its
full bias), allocation contract, and validation."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.ml2r import ml2r, ml2r_weights


def test_weight_identities():
    h = [0.5, 0.25, 0.125, 0.0625]
    for alpha in (1.0, 2.0, 0.5):
        w, W = ml2r_weights(h, alpha)
        assert abs(w.sum() - 1.0) < 1e-12
        for k in range(1, len(h)):
            s = sum(wj * hj ** (k * alpha) for wj, hj in zip(w, h))
            # normalize: the raw moments differ by orders of magnitude
            scale = max(abs(wj) * hj ** (k * alpha)
                        for wj, hj in zip(w, h))
            assert abs(s) < 1e-10 * scale, (alpha, k)
        assert abs(W[0] - 1.0) < 1e-12           # tail sums: W_0 = 1
        assert np.allclose(W, np.cumsum(w[::-1])[::-1])


def test_weight_validation():
    with pytest.raises(ValueError, match="decrease"):
        ml2r_weights([0.25, 0.5])
    with pytest.raises(ValueError, match="alpha"):
        ml2r_weights([0.5, 0.25], alpha=0.0)
    with pytest.raises(ValueError, match="ill-conditioned"):
        # 16 geometric levels overwhelm the f64 Vandermonde
        ml2r_weights([2.0 ** -k for k in range(16)], alpha=0.25)


def _poly_pair_fn(h, c0=2.0, c1=0.5, c2=0.3, noise=0.2, jump=0.3,
                  beta=1.5):
    """Closed-form weak expansion E[Y_l] = c0 + c1 h_l + c2 h_l^2 with
    O(1) sample noise and a coupled correction noise of variance
    ~ h^beta — an analytically transparent MLMC/ML2R testbed."""
    hj = jnp.asarray(h)

    def pair_fn(level, keys):
        def one(k):
            z, zc = jax.random.normal(k, (2,))
            def y(hl):
                return (c0 + c1 * hl + c2 * hl * hl + noise * z
                        + jump * hl ** (beta / 2.0) * zc)
            fine = y(hj[level])
            coarse = y(hj[level - 1]) if level else 0.0
            return fine, coarse
        fine, coarse = jax.vmap(one)(keys)
        return fine, coarse, jnp.ones(keys.shape[0], bool)

    return pair_fn


def test_polynomial_bias_cancels_exactly():
    """Three levels kill h and h^2 — the ENTIRE expansion here — so
    ML2R is unbiased while the unweighted telescope on the very same
    samples carries its full c1 h_L + c2 h_L^2 bias."""
    h = [0.5, 0.25, 0.125]
    res = ml2r(_poly_pair_fn(h), h, target_var=1e-8, alpha=1.0,
               seed=2, chunk_size=1 << 12)
    assert res["target_met"]
    mlmc_bias = 0.5 * h[-1] + 0.3 * h[-1] ** 2
    err_ml2r = abs(res["mean"] - 2.0)
    err_mlmc = abs(res["mean_mlmc"] - 2.0)
    assert err_ml2r < 6 * res["se"], (err_ml2r, res["se"])
    # the telescope shows its closed-form bias (se is way below it)
    assert abs(err_mlmc - mlmc_bias) < 0.2 * mlmc_bias
    assert err_ml2r < 0.05 * err_mlmc
    # weighted allocation: level 0 dominates the sample budget
    assert res["n_per_level"][0] == res["n_per_level"].max()


def test_alpha_two_expansion():
    """A pure h^2 expansion (c1 = 0) with alpha=2: two levels suffice
    to cancel it."""
    h = [0.5, 0.25]
    res = ml2r(_poly_pair_fn(h, c1=0.0, c2=0.4), h, target_var=4e-8,
               alpha=2.0, seed=3)
    assert abs(res["mean"] - 2.0) < 6 * res["se"]
    err_mlmc = abs(res["mean_mlmc"] - 2.0)
    assert err_mlmc > 5 * abs(res["mean"] - 2.0)


def test_validation():
    with pytest.raises(ValueError, match="2-level"):
        ml2r(lambda l, k: None, [0.5], target_var=1e-6)
    with pytest.raises(ValueError, match="target_var"):
        ml2r(lambda l, k: None, [0.5, 0.25], target_var=0.0)


def test_mesh_sharded_matches_single_device():
    """mesh= shards chunks over the 8-device virtual mesh with the same
    sample-index -> key mapping: estimates must agree with the
    single-device run to reduction-order rounding."""
    from mlmc_tpu.parallel.mesh import SampleMesh

    h = [0.5, 0.25, 0.125]
    kw = dict(target_var=1e-7, alpha=1.0, seed=4, chunk_size=1 << 10,
              n_pilot=1 << 11, cost_fn=lambda lv: 2.0 ** lv)
    r1 = ml2r(_poly_pair_fn(h), h, **kw)
    r8 = ml2r(_poly_pair_fn(h), h, mesh=SampleMesh(), **kw)
    np.testing.assert_array_equal(r1["n_per_level"], r8["n_per_level"])
    np.testing.assert_allclose(r1["level_means"], r8["level_means"],
                               rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(r1["mean"], r8["mean"], rtol=1e-11)
    with pytest.raises(ValueError, match="divide"):
        ml2r(_poly_pair_fn(h), h, target_var=1e-6, chunk_size=10,
             mesh=SampleMesh())
