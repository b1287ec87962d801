"""Rank-1 lattice rules (ops/lattice.py) — algebraic and statistical
pins: the dual-lattice character identity (exact), finite-Fourier-band
integrands integrated exactly, CBC beating random generating vectors
in closed-form worst-case error, shift-averaged unbiasedness, the
measured ~n^-2 convergence on periodic smoothness (vs MC's n^-1), and
the tent transform recovering it for non-periodic integrands."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mlmc_tpu.ops.lattice import (cbc_vector, lattice_estimate,
                                  lattice_points, p_alpha, tent)


def test_points_exact_group_structure():
    """Nodes are the cyclic group frac(i z / n): integer-exact (the
    uint32 product mod a power of two is exact), first node 0, and the
    set is shift-invariant as a multiset."""
    n, d = 64, 5
    z = cbc_vector(n, d)
    u = np.asarray(lattice_points(z, n))
    assert u.shape == (n, d)
    expect = (np.arange(n)[:, None] * z[None, :] % n) / n
    np.testing.assert_allclose(u, expect, atol=1e-15)
    # shifting by a lattice node permutes the node set
    u_sh = np.asarray(lattice_points(z, n, shift=expect[3]))
    assert np.allclose(np.sort(u_sh, axis=0), np.sort(u, axis=0),
                       atol=1e-12)


def test_dual_lattice_character_identity():
    """(1/n) sum_i e^{2 pi i h.x_i} has modulus EXACTLY 1 for h in the
    dual lattice (h.z = 0 mod n) and EXACTLY 0 otherwise — the
    algebraic fingerprint of a lattice rule, robust to any shift."""
    n, d = 256, 4
    z = cbc_vector(n, d)
    shift = np.asarray(
        jax.random.uniform(jax.random.key(1), (d,), jnp.float64))
    u = np.asarray(lattice_points(z, n, shift=shift), np.float64)
    h_dual = np.zeros(d, np.int64)
    h_dual[0], h_dual[1] = z[1], -1          # h.z = z1*1 - z1 = 0
    assert (h_dual @ z) % n == 0
    h_out = np.zeros(d, np.int64)
    h_out[0] = 1                             # h.z = 1 != 0 mod n
    for h, mod in ((h_dual, 1.0), (h_out, 0.0)):
        s = np.exp(2j * np.pi * (u @ h)).mean()
        assert abs(abs(s) - mod) < 1e-10, (h, s)


def test_finite_band_integrand_exact():
    """An integrand whose Fourier support is {-1, 0, 1}^d is integrated
    EXACTLY by any lattice whose dual contains no such nonzero h —
    every shift estimate equals the true integral to rounding."""
    n, d = 1 << 10, 4
    z = cbc_vector(n, d)
    k = np.arange(n)
    for h in _small_h(d):
        if np.any(h):
            assert (h @ z) % n != 0, h

    def fn(u):
        return jnp.prod(1.0 + 0.5 * jnp.sin(2.0 * jnp.pi * u), axis=1)

    out = lattice_estimate(fn, d, n=n, n_shifts=4)
    np.testing.assert_allclose(out["per_shift"], 1.0, atol=5e-13)


def _small_h(d):
    from itertools import product
    return [np.asarray(h, np.int64) for h in product((-1, 0, 1),
                                                     repeat=d)]


def test_cbc_beats_random_vectors():
    """The CBC vector's closed-form worst-case P_2 is below the median
    of random coprime generating vectors (the CBC averaging argument
    guarantees at-most-average; in practice it is far better)."""
    n, d = 1 << 9, 6
    z = cbc_vector(n, d)
    e_cbc = p_alpha(z, n)
    rng = np.random.default_rng(0)
    e_rand = [p_alpha(np.concatenate([[1], rng.choice(
        np.arange(1, n, 2), d - 1)]), n) for _ in range(20)]
    assert e_cbc < np.median(e_rand), (e_cbc, np.median(e_rand))
    assert e_cbc <= min(e_rand) * 1.5


def test_unbiased_smooth_nonperiodic():
    """Shift-averaged estimate of prod exp(u_j) lands on (e-1)^d within
    6 spread-based standard errors."""
    d = 4

    def fn(u):
        return jnp.prod(jnp.exp(u), axis=1)

    out = lattice_estimate(fn, d, n=1 << 11, n_shifts=16, seed=3)
    truth = (np.e - 1.0) ** d
    assert abs(out["mean"] - truth) < 6.0 * out["se"] + 1e-9, out


def test_periodic_convergence_beats_mc():
    """Across-shift variance on the periodic product
    prod (1 + B2(u_j)) drops by >> the MC factor 16 when n grows
    16x (theory: ~16^2, up to logs)."""
    d = 3

    def fn(u):
        return jnp.prod(1.0 + (u * u - u + 1.0 / 6.0), axis=1)

    var = {}
    for n in (1 << 8, 1 << 12):
        out = lattice_estimate(fn, d, n=n, n_shifts=32, seed=4)
        var[n] = out["per_shift"].var(ddof=1)
    ratio = var[1 << 8] / max(var[1 << 12], 1e-300)
    assert ratio > 40.0, (var, ratio)


def test_tent_transform_helps_nonperiodic():
    """The baker's transform periodizes prod exp(u_j): variance at the
    same n drops by > 4x (theory: O(n^-2) -> O(n^-4) squared error),
    and the estimate stays unbiased."""
    d = 3

    def fn(u):
        return jnp.prod(jnp.exp(u), axis=1)

    plain = lattice_estimate(fn, d, n=1 << 11, n_shifts=32, seed=5)
    tented = lattice_estimate(fn, d, n=1 << 11, n_shifts=32, seed=5,
                              use_tent=True)
    truth = (np.e - 1.0) ** d
    assert abs(tented["mean"] - truth) < 6.0 * tented["se"] + 1e-9
    v_p = plain["per_shift"].var(ddof=1)
    v_t = tented["per_shift"].var(ddof=1)
    assert v_t < v_p / 4.0, (v_p, v_t)


def test_validation_errors():
    with pytest.raises(ValueError, match="power of two"):
        cbc_vector(100, 3)
    with pytest.raises(ValueError, match="power of two"):
        lattice_points([1, 3], 12)
    with pytest.raises(ValueError, match="shifts"):
        lattice_estimate(lambda u: u[:, 0], 1, n_shifts=1)
    with pytest.raises(FloatingPointError):
        lattice_estimate(lambda u: jnp.log(u[:, 0] - 2.0), 1,
                         n=1 << 8, n_shifts=4)
    # exact-range caps: f32 residues round past 2^24; past 2^33 even f64
    # lattices would WRAP in the uint32 index arithmetic (advisor r4) —
    # both must refuse loudly, never silently produce wrong nodes
    with pytest.raises(ValueError, match="exact range"):
        lattice_points([1, 3], 1 << 26, count=4, dtype=jnp.float32)
    with pytest.raises(ValueError, match="exact range"):
        lattice_points([1, 3], 1 << 33, count=4, dtype=jnp.float64)


def test_extensible_prefixes_are_lattices():
    """Bit-reversed enumeration: the first 2^k sequence positions are
    EXACTLY the 2^k-point lattice with the same z (as sets), for every
    embedded size — the prefix property MLQMC-style doubling needs —
    and start/count slicing composes with the full enumeration."""
    from mlmc_tpu.ops.lattice import lattice_points_extensible

    n_max, d = 1 << 8, 3
    z = cbc_vector(n_max, d)
    seq = np.asarray(lattice_points_extensible(z, n_max), np.float64)
    for k in (1, 2, 4, 16, 64, 256):
        small = np.asarray(lattice_points(z, k), np.float64)
        got = np.sort(seq[:k], axis=0)
        want = np.sort(small % 1.0, axis=0)
        np.testing.assert_allclose(got, want, atol=1e-14, err_msg=str(k))
    tail = np.asarray(lattice_points_extensible(z, n_max, start=100,
                                                count=50))
    np.testing.assert_allclose(tail, seq[100:150], atol=0)


def test_mesh_sharded_parity():
    """Pod scaling: sharding the R shifts over the 8-device mesh gives
    per-shift estimates identical to the single-device run (each shift
    is independent — no cross-device reduction exists to reorder)."""
    from mlmc_tpu.parallel.mesh import SampleMesh

    def fn(u):
        return jnp.prod(jnp.exp(u), axis=1)

    kw = dict(n=1 << 10, n_shifts=16, seed=9)
    solo = lattice_estimate(fn, 4, **kw)
    pod = lattice_estimate(fn, 4, mesh=SampleMesh(), **kw)
    np.testing.assert_allclose(pod["per_shift"], solo["per_shift"],
                               rtol=1e-13)
    with pytest.raises(ValueError, match="divide"):
        lattice_estimate(fn, 4, n=1 << 10, n_shifts=6,
                         mesh=SampleMesh())


def test_tent_preserves_uniformity():
    """tent maps U[0,1) to U[0,1): moments of tent(u) over a fine
    lattice match the uniform moments."""
    u = lattice_points(cbc_vector(1 << 12, 2), 1 << 12,
                       shift=np.array([0.31, 0.77]))
    t = np.asarray(tent(u))
    assert abs(t.mean() - 0.5) < 1e-3
    assert abs((t * t).mean() - 1.0 / 3.0) < 1e-3


def test_fast_cbc_matches_direct_greedy():
    """The FFT fast CBC evaluates the SAME candidate errors as the
    direct O(n^2) sweep (group correlations over (Z/2^t)* are exact to
    machine eps), so the greedy quality must match: near-ties may pick
    the mirror z -> n - z (identical P_alpha by B_2 symmetry) or flip
    a rounding-level tie, but the worst-case error cannot degrade."""
    for n in (16, 64, 256):
        zd = cbc_vector(n, 6, method="direct")
        zf = cbc_vector(n, 6, method="fft")
        pd, pf = p_alpha(zd, n), p_alpha(zf, n)
        assert pf <= pd * (1 + 1e-9), (n, pd, pf)
    # larger n: rounding-level tie flips in the greedy may cost a hair
    zd = cbc_vector(1 << 10, 6, method="direct")
    zf = cbc_vector(1 << 10, 6, method="fft")
    assert p_alpha(zf, 1 << 10) <= p_alpha(zd, 1 << 10) * 1.01


def test_fast_cbc_scales_to_2e16():
    """n = 2^16 construction (out of reach for the direct sweep on
    this 1-core host) lands in well under a minute and still beats the
    random-generating-vector median — VERDICT r3 item 7."""
    import time

    n, dim = 1 << 16, 8
    t0 = time.perf_counter()
    z = cbc_vector(n, dim)
    wall = time.perf_counter() - t0
    assert wall < 30.0, wall
    assert z.shape == (dim,) and z[0] == 1 and np.all(z % 2 == 1)
    pz = p_alpha(z, n)
    rng = np.random.default_rng(1)
    ps = [p_alpha(np.concatenate([[1],
                                  rng.integers(0, n // 2, dim - 1) * 2
                                  + 1]), n)
          for _ in range(9)]
    assert pz < np.median(ps), (pz, np.median(ps))
