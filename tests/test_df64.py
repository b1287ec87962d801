"""Double-float (two-f32) arithmetic library tests.

The df layer (mlmc_tpu/ops/df64.py) backs the extended-precision
estimation tier and the on-device maxent Newton solver on f32-only
hardware; these tests pin every primitive against f64 on CPU (the ops are
plain IEEE f32 add/mul/div, identical on TPU — the TPU-specific risks,
non-correctly-rounded sqrt/transcendentals, are never used).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.ops import df64


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


def _split(x):
    return tuple(map(jnp.asarray, df64.df_split_array(x)))


def test_df_split_roundtrip(rng):
    x = rng.standard_normal(1000) * np.exp(rng.uniform(-20, 20, 1000))
    hi, lo = df64.df_split_array(x)
    rel = np.abs(df64.df_to_f64(hi, lo) - x) / np.abs(x)
    assert rel.max() < 2**-48


def test_df_mul_div_accuracy(rng):
    a = rng.standard_normal(5000) * 10
    b = rng.standard_normal(5000) + 3.0
    ah, al = _split(a)
    bh, bl = _split(b)
    ph, plo = jax.jit(df64.df_mul)(ah, al, bh, bl)
    rel = np.abs(df64.df_to_f64(ph, plo) - a * b) / np.abs(a * b)
    assert rel.max() < 1e-13
    qh, ql = jax.jit(df64.df_div)(ah, al, bh, bl)
    rel = np.abs(df64.df_to_f64(qh, ql) - a / b) / np.abs(a / b)
    assert rel.max() < 1e-13


def test_df_exp_accuracy(rng):
    # relative accuracy holds while the result's lo limb stays a NORMAL
    # f32 (results >= ~1e-26, i.e. arguments >= ~-58); further down the lo
    # limb underflows gradually and only absolute accuracy remains
    # (documented in df_exp)
    x = rng.uniform(-55, 80, 20000)
    eh, el = jax.jit(df64.df_exp)(*_split(x))
    rel = np.abs(df64.df_to_f64(eh, el) - np.exp(x)) / np.exp(x)
    assert rel.max() < 1e-12, rel.max()
    # far tail: absolute error only
    x = rng.uniform(-200, -55, 2000)
    eh, el = jax.jit(df64.df_exp)(*_split(x))
    assert np.abs(df64.df_to_f64(eh, el) - np.exp(np.maximum(x, -80.0))).max() < 1e-24


def test_df_sum_dot_accuracy(rng):
    # ill-conditioned alternating series: plain f32 loses ~6 digits here
    a = rng.standard_normal(8192) * np.exp(rng.uniform(0, 6, 8192))
    b = rng.standard_normal(8192)
    ah, al = _split(a)
    bh, bl = _split(b)
    sh, sl = jax.jit(lambda h, l: df64.df_sum(h, l, axis=0))(ah, al)
    ref = np.sum(a)
    assert abs(df64.df_to_f64(sh, sl) - ref) < 1e-10 * np.sum(np.abs(a))
    dh, dl = jax.jit(lambda *t: df64.df_dot(*t, axis=0))(ah, al, bh, bl)
    ref = float(a @ b)
    assert abs(df64.df_to_f64(dh, dl) - ref) < 1e-10 * float(np.abs(a) @ np.abs(b))
    # pairwise variant agrees to df resolution
    ph, pl = jax.jit(lambda h, l: df64.df_sum_pairwise(h, l, axis=0))(ah, al)
    assert abs(df64.df_to_f64(ph, pl) - df64.df_to_f64(sh, sl)) \
        < 2**-40 * np.sum(np.abs(a))


def test_df_sum_axis_shapes(rng):
    m = rng.standard_normal((37, 13))
    mh, ml = _split(m)
    for axis in (0, 1, -1):
        sh, sl = jax.jit(lambda h, l, ax=axis: df64.df_sum(h, l, axis=ax))(mh, ml)
        ref = m.sum(axis=axis)
        assert sh.shape == ref.shape
        assert np.abs(df64.df_to_f64(sh, sl) - ref).max() < 1e-11


def test_exact_pow2():
    k = jnp.arange(-126, 128, dtype=jnp.float32)
    s = np.asarray(jax.jit(df64._exact_pow2)(k), dtype=np.float64)
    assert np.array_equal(s, 2.0 ** np.arange(-126, 128, dtype=np.float64))
