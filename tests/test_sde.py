"""SDE path-simulation family (sim/sde.py) — beyond-reference capability.

Validation layers: deterministic Brownian-bridge algebra, strong
convergence against the exact GBM solution ON THE SAME Brownian path,
the textbook MLMC variance-decay rates (beta ~ 1 Euler / ~ 2 Milstein),
telescoping consistency, antithetic unbiasedness + measured gain,
exact-law checks (OU Gaussian terminal, CIR mean), Sampler/Quantity
integration, and QMC adapter behavior (bridge effectiveness + price vs
Black-Scholes).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mlmc_tpu.quantity.quantity_estimate as qe
from mlmc_tpu import Memory, DeviceBatchPool, Sampler
from mlmc_tpu.quantity.quantity import make_root_quantity
from mlmc_tpu.sim.sde import (
    SDEModel, SDESimulation, asian_call, black_scholes_call,
    brownian_bridge_increments, cir, coupled_path_functionals,
    european_call, european_put, gbm, lookback_call, ornstein_uhlenbeck,
    sde_qmc_level_fns, terminal_value,
)


def test_brownian_bridge_matrix_is_orthogonal():
    """R @ R.T = I (the bridge re-parametrizes i.i.d. increments) and
    dimension 0 is the terminal value: its total increment weight is
    W(T)/sqrt(dt) = sqrt(n)."""
    for n in (1, 2, 5, 16, 63, 128):
        R = brownian_bridge_increments(n)
        assert np.max(np.abs(R @ R.T - np.eye(n))) < 1e-12, n
        assert abs(R[:, 0].sum() - np.sqrt(n)) < 1e-12, n


def test_gbm_strong_convergence_same_path():
    """Milstein terminal vs the exact GBM solution driven by the SAME
    Brownian path: error small at n=256 and shrinking ~linearly in dt
    (strong order 1)."""
    mu, sigma = 0.05, 0.2
    model = gbm(mu, sigma, 1.0)
    z = np.asarray(jax.random.normal(jax.random.key(0), (4096, 256)))

    def rel_err(n):
        cfg = dict(model=model, scheme="milstein", total_time=1.0,
                   n_fine=n, n_coarse=n // 2)
        pf, _, _ = jax.jit(
            lambda zz: coupled_path_functionals(cfg, z=zz))(z[:, :n])
        w_T = np.sqrt(1.0 / n) * z[:, :n].sum(axis=1)
        exact = np.exp((mu - 0.5 * sigma ** 2) + sigma * w_T)
        return float(np.mean(np.abs(np.asarray(pf.terminal) - exact)
                             / exact))

    e256, e64 = rel_err(256), rel_err(64)
    assert e256 < 1e-4, e256
    assert 2.5 < e64 / e256 < 6.5, (e64, e256)    # ~4 for strong order 1


def _level_var(model, payoff, scheme, n_f, m, anti, seed=3, B=1 << 16):
    keys = jax.random.split(jax.random.key(seed), B)
    cfg = dict(model=model, scheme=scheme, total_time=1.0, n_fine=n_f,
               n_coarse=n_f // m, antithetic=anti)
    pf_f, pf_fa, pf_c = jax.jit(
        lambda k: coupled_path_functionals(cfg, keys=k))(keys)
    v = payoff(pf_f)
    if anti:
        v = 0.5 * (v + payoff(pf_fa))
    d = np.asarray(v - payoff(pf_c))
    return float(d.var()), float(d.mean())


def test_mlmc_variance_decay_rates():
    """Textbook Giles rates on the GBM European call: per-level variance
    halves per level for Euler (beta ~ 1) and quarters for Milstein
    (beta ~ 2); Milstein levels are far below Euler levels."""
    model = gbm(0.05, 0.2, 1.0)
    payoff = european_call(1.0, discount=np.exp(-0.05))
    vars_e = [_level_var(model, payoff, "euler", n, 2, False)[0]
              for n in (32, 64, 128)]
    vars_m = [_level_var(model, payoff, "milstein", n, 2, False)[0]
              for n in (32, 64, 128)]
    for v0, v1 in zip(vars_e, vars_e[1:]):
        assert 1.5 < v0 / v1 < 2.7, vars_e
    for v0, v1 in zip(vars_m, vars_m[1:]):
        assert 3.0 < v0 / v1 < 5.2, vars_m
    assert vars_m[0] < 0.05 * vars_e[0], (vars_m[0], vars_e[0])


def test_telescoping_consistency():
    """E[coarse of level (n=64, m=2)] must equal E[fine of a 32-step
    level] — the coarse path's law IS a plain 32-step path (summed
    increments are exact N(0, dt_c) draws). 6-sigma band."""
    model = gbm(0.05, 0.2, 1.0)
    payoff = european_call(1.0)
    B = 1 << 16
    keys = jax.random.split(jax.random.key(11), B)
    cfg_hi = dict(model=model, scheme="euler", total_time=1.0,
                  n_fine=64, n_coarse=32)
    _, _, pf_c = jax.jit(
        lambda k: coupled_path_functionals(cfg_hi, keys=k))(keys)
    keys2 = jax.random.split(jax.random.key(12), B)
    cfg_lo = dict(model=model, scheme="euler", total_time=1.0,
                  n_fine=32, n_coarse=0)
    pf_f, _, _ = jax.jit(
        lambda k: coupled_path_functionals(cfg_lo, keys=k))(keys2)
    a, b = np.asarray(payoff(pf_c)), np.asarray(payoff(pf_f))
    sigma = np.sqrt(a.var() / B + b.var() / B)
    assert abs(a.mean() - b.mean()) < 6 * sigma, (a.mean(), b.mean(), sigma)


def test_antithetic_gain_and_unbiasedness():
    """The Giles-Szpruch twin reverses each coarse interval's increments:
    no effect where the scheme update commutes (GBM terminal — the
    product of per-step factors is order-invariant) but a real variance
    cut on order-sensitive functionals (Asian average, additive-noise OU
    terminal); the level mean must be unchanged within 6 sigma."""
    model = gbm(0.05, 0.2, 1.0)
    asian = asian_call(1.0)
    vp, mp = _level_var(model, asian, "milstein", 64, 2, False)
    va, ma = _level_var(model, asian, "milstein", 64, 2, True)
    assert va < 0.45 * vp, (va, vp)               # measured gain ~4.1x
    B = 1 << 16
    assert abs(mp - ma) < 6 * np.sqrt(vp / B + va / B), (mp, ma)

    ou = ornstein_uhlenbeck(2.0, 0.5, 0.5, 1.0)
    vp_ou, _ = _level_var(ou, terminal_value(), "euler", 64, 2, False)
    va_ou, _ = _level_var(ou, terminal_value(), "euler", 64, 2, True)
    assert va_ou < 0.55 * vp_ou, (va_ou, vp_ou)   # measured gain ~3x

    # order-invariant case: the twin is a no-op, never a pessimization
    vt, _ = _level_var(model, european_call(1.0), "euler", 64, 2, False)
    vta, _ = _level_var(model, european_call(1.0), "euler", 64, 2, True)
    assert vta < 1.05 * vt


def test_ou_exact_terminal_law():
    """Euler OU terminal at fine dt matches the exact Gaussian law:
    mean/variance within 6-sigma + O(dt) bias allowance."""
    kappa, theta, sigma, s0 = 1.5, 0.3, 0.4, 1.0
    model = ornstein_uhlenbeck(kappa, theta, sigma, s0)
    n, B = 512, 1 << 16
    keys = jax.random.split(jax.random.key(7), B)
    cfg = dict(model=model, scheme="euler", total_time=1.0, n_fine=n,
               n_coarse=0)
    pf, _, _ = jax.jit(lambda k: coupled_path_functionals(cfg, keys=k))(keys)
    s = np.asarray(pf.terminal)
    mean_exact = theta + (s0 - theta) * np.exp(-kappa)
    var_exact = sigma ** 2 * (1 - np.exp(-2 * kappa)) / (2 * kappa)
    bias = 3.0 / n                                 # O(dt) weak error slack
    assert abs(s.mean() - mean_exact) < 6 * s.std() / np.sqrt(B) + bias
    assert abs(s.var() - var_exact) < 0.02 * var_exact + bias


def test_cir_full_truncation_stays_finite():
    """Feller-violating CIR (2 kappa theta < sigma^2): full-truncation
    Euler keeps every path finite and the terminal mean matches the
    exact ``theta + (s0-theta) e^{-kappa T}`` (exact for CIR too)."""
    kappa, theta, sigma, s0 = 1.0, 0.04, 0.6, 0.04
    model = cir(kappa, theta, sigma, s0)
    n, B = 256, 1 << 15
    keys = jax.random.split(jax.random.key(21), B)
    cfg = dict(model=model, scheme="euler", total_time=1.0, n_fine=n,
               n_coarse=n // 2)
    pf_f, _, pf_c = jax.jit(
        lambda k: coupled_path_functionals(cfg, keys=k))(keys)
    s = np.asarray(pf_f.terminal)
    assert np.all(np.isfinite(s))
    assert np.all(np.isfinite(np.asarray(pf_c.terminal)))
    mean_exact = theta + (s0 - theta) * np.exp(-kappa)
    assert abs(s.mean() - mean_exact) < 6 * s.std() / np.sqrt(B) + 2.0 / n


def test_sampler_integration_and_quantity_payoff_composition():
    """qoi='functionals' stores (terminal, average, maximum, minimum);
    the European call composes post-hoc in the Quantity algebra and
    matches Black-Scholes within its own standard error."""
    rate, sigma = 0.05, 0.2
    sim = SDESimulation(dict(model=gbm(rate, sigma, 1.0),
                             scheme="milstein", qoi="functionals"))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=5), sim,
                      [[1 / 8], [1 / 32]])
    sampler.set_initial_n_samples([4000, 1000])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()
    assert storage.get_n_collected() == [4000, 1000]

    root = make_root_quantity(storage, sim.result_format())
    term = root["terminal"][1.0]["-"][0]
    payoff_q = np.maximum(term - 1.0, 0.0) * np.exp(-rate)
    m = qe.estimate_mean(payoff_q)
    price = float(np.ravel(m.mean)[0])
    se = float(np.sqrt(np.ravel(m.var)[0]))
    bs = black_scholes_call(1.0, 1.0, rate, sigma, 1.0)
    assert abs(price - bs) < 6 * se + 2e-3, (price, bs, se)

    # path-functional ordering invariant: min <= avg <= max per sample
    chunk = next(storage.chunks(level_id=0))
    vals = np.asarray(root.samples(chunk))        # [M, N, 2]
    t_i, a_i, mx_i, mn_i = 0, 1, 2, 3
    assert np.all(vals[mn_i, :, 0] <= vals[a_i, :, 0] + 1e-12)
    assert np.all(vals[a_i, :, 0] <= vals[mx_i, :, 0] + 1e-12)
    assert np.all(vals[mn_i, :, 0] <= vals[t_i, :, 0])
    assert np.all(vals[t_i, :, 0] <= vals[mx_i, :, 0])


def test_payoff_qoi_single_sample_host_path():
    sim = SDESimulation(dict(model=gbm(), payoff=lookback_call()))
    level_sim = sim.level_instance([1 / 16], [1 / 4])
    fine, coarse = SDESimulation.calculate(level_sim.config_dict, 42)
    assert fine.shape == (1,) and coarse.shape == (1,)
    assert np.isfinite(fine).all() and np.isfinite(coarse).all()
    assert fine[0] >= 0.0                          # S_T - min >= 0


def test_qmc_adapter_bridge_and_price():
    """MLQMC over the SDE adapter: the telescoped price matches
    Black-Scholes (weak bias at n=128 Milstein is ~1e-4), and the
    Brownian-bridge ordering beats raw increment order on the coarsest
    level by a wide margin at equal budget."""
    from mlmc_tpu.qmc import MLQMC

    rate, sigma = 0.05, 0.2
    sim = SDESimulation(dict(model=gbm(rate, sigma, 1.0),
                             scheme="milstein",
                             payoff=european_call(
                                 1.0, discount=np.exp(-rate))))
    steps = [[1 / 8], [1 / 32], [1 / 128]]
    fns, dims = sde_qmc_level_fns(sim, steps)
    assert dims == [8, 32, 128]
    ml = MLQMC(fns, dims, n_randomizations=12, seed=7, chunk_size=1 << 11)
    res = ml.run(target_var=1e-9, n_init=1 << 11)
    assert res["target_met"]
    bs = black_scholes_call(1.0, 1.0, rate, sigma, 1.0)
    assert abs(res["mean"] - bs) < 6 * np.sqrt(res["var"]) + 3e-4
    assert np.all(res["mc_variance_reduction"] > 5.0), \
        res["mc_variance_reduction"]

    fns_raw, _ = sde_qmc_level_fns(sim, steps, bridge=False)
    ml_raw = MLQMC(fns_raw, dims, n_randomizations=12, seed=7,
                   chunk_size=1 << 11)
    ml_b = MLQMC(fns, dims, n_randomizations=12, seed=7,
                 chunk_size=1 << 11)
    ml_raw.extend(0, 1 << 12)
    ml_b.extend(0, 1 << 12)
    _, ev_raw = ml_raw.level_estimates()
    _, ev_b = ml_b.level_estimates()
    assert ev_b[0] < 0.05 * ev_raw[0], (ev_b[0], ev_raw[0])


def test_validation_errors():
    with pytest.raises(ValueError, match="euler"):
        coupled_path_functionals(
            dict(model=gbm(), scheme="rk4", total_time=1.0, n_fine=4,
                 n_coarse=2),
            keys=jax.random.split(jax.random.key(0), 2))
    with pytest.raises(ValueError, match="diffusion_ds"):
        coupled_path_functionals(
            dict(model=cir(), scheme="milstein", total_time=1.0, n_fine=4,
                 n_coarse=2),
            keys=jax.random.split(jax.random.key(0), 2))
    with pytest.raises(ValueError, match="integer factor"):
        SDESimulation(dict(model=gbm())).level_instance([1 / 5], [1 / 3])
    with pytest.raises(ValueError, match="antithetic"):
        SDESimulation(dict(model=gbm(), qoi="functionals", antithetic=True))
    with pytest.raises(ValueError, match="payoff"):
        sde_qmc_level_fns(
            SDESimulation(dict(model=gbm(), qoi="functionals")), [[0.5]])
    with pytest.raises(ValueError, match="exactly one"):
        coupled_path_functionals(
            dict(model=gbm(), total_time=1.0, n_fine=4, n_coarse=2))


def test_z_width_validated():
    """A too-narrow z matrix must raise (dynamic_slice would silently
    clamp and reuse the last increments)."""
    cfg = dict(model=gbm(), scheme="euler", total_time=1.0, n_fine=8,
               n_coarse=4)
    z = np.zeros((4, 6))
    with pytest.raises(ValueError, match="n_fine"):
        coupled_path_functionals(cfg, z=z)


# ---------------------------------------------------------------------- #
# multi-dimensional systems
# ---------------------------------------------------------------------- #
def test_heston_pricer_degenerates_to_black_scholes():
    """xi -> 0 with v0 = theta freezes the variance at theta: the
    semi-analytic Heston call must converge to Black-Scholes with
    sigma = sqrt(theta)."""
    from mlmc_tpu.sim.sde import heston_call_price

    p_bs = black_scholes_call(1.0, 1.0, 0.05, 0.2, 1.0)
    p_h = heston_call_price(1.0, 1.0, 0.05, kappa=2.0, theta=0.04,
                            xi=1e-4, rho=0.0, v0=0.04, T=1.0)
    assert abs(p_h - p_bs) < 1e-8, (p_h, p_bs)


def test_heston_mlmc_matches_semi_analytic_price():
    """Full-truncation Euler MLMC over the 2-D Heston system reprices
    the European call against the characteristic-function pricer within
    the telescoped 6-sigma band + an O(dt) bias allowance (measured err
    8.5e-6 at these sizes)."""
    from mlmc_tpu.sim.sde import (coupled_system_functionals, heston,
                                  heston_call_price)

    params = dict(kappa=2.0, theta=0.04, xi=0.3, rho=-0.7, v0=0.04)
    p_ref = heston_call_price(1.0, 1.0, 0.05, T=1.0, **params)
    model = heston(mu=0.05, s0=1.0, **params)
    disc = np.exp(-0.05)
    payoff = lambda pf: disc * jnp.maximum(pf.terminal[:, 0] - 1.0, 0.0)
    B = 1 << 16
    keys = jax.random.split(jax.random.key(0), B)
    total, var_total = 0.0, 0.0
    for nf, nc in [(32, 0), (128, 32), (512, 128)]:
        cfg = dict(model=model, total_time=1.0, n_fine=nf, n_coarse=nc)
        pf_f, _, pf_c = jax.jit(
            lambda k: coupled_system_functionals(cfg, k))(keys)
        d = np.asarray(payoff(pf_f)
                       - (payoff(pf_c) if pf_c is not None else 0.0))
        total += d.mean()
        var_total += d.var() / B
    assert abs(total - p_ref) < 6 * np.sqrt(var_total) + 5e-4, (total, p_ref)


def test_heston_level_variance_decays_and_antithetic_unbiased():
    from mlmc_tpu.sim.sde import coupled_system_functionals, heston

    model = heston()
    payoff = lambda pf: jnp.maximum(pf.average[:, 0] - 1.0, 0.0)
    B = 1 << 15
    keys = jax.random.split(jax.random.key(4), B)

    def lv(nf, nc, anti):
        cfg = dict(model=model, total_time=1.0, n_fine=nf, n_coarse=nc,
                   antithetic=anti)
        pf_f, pf_fa, pf_c = jax.jit(
            lambda k: coupled_system_functionals(cfg, k))(keys)
        v = payoff(pf_f)
        if anti:
            v = 0.5 * (v + payoff(pf_fa))
        d = np.asarray(v - payoff(pf_c))
        return float(d.var()), float(d.mean())

    v64, m64 = lv(64, 32, False)
    v256, m256 = lv(256, 128, False)
    assert v256 < 0.7 * v64, (v64, v256)          # beta ~ 1 Euler decay
    va, ma = lv(64, 32, True)
    assert va < 1.05 * v64                         # never a pessimization
    assert abs(ma - m64) < 6 * np.sqrt(2 * v64 / B), (ma, m64)


def test_system_simulation_contract():
    """SDESystemSimulation through the Sampler: functionals QoI exposes
    per-component terminal/average/max/min; the asset max bounds the
    terminal and the variance component stays near theta."""
    from mlmc_tpu.sim.sde import SDESystemSimulation

    sim = SDESystemSimulation(dict(model="heston", qoi="functionals"))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=6), sim,
                      [[1 / 16], [1 / 64]])
    sampler.set_initial_n_samples([512, 128])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()
    root = make_root_quantity(storage, sim.result_format())
    chunk = next(storage.chunks(level_id=0))
    term = np.asarray(root["terminal"].samples(chunk))[:, :, 0]  # [2, N]
    mx = np.asarray(root["maximum"].samples(chunk))[:, :, 0]
    assert np.all(term[0] <= mx[0] + 1e-12)       # asset component
    assert np.all(term[0] > 0)
    assert 0.0 < term[1].mean() < 0.1             # variance ~ theta=0.04
    with pytest.raises(ValueError, match="Euler"):
        SDESystemSimulation(dict(model="heston", scheme="milstein"))


# ----------------------------------------------------------------------- #
# continuous-monitoring path payoffs (Giles 2008 §5)
# ----------------------------------------------------------------------- #
def _keys(seed, n):
    return jax.random.split(jax.random.key(seed), n)


def test_path_extras_invariants_and_parity():
    """Extras tracking must not perturb the base functionals (bit
    parity), the BGK-shifted extrema must bracket the grid extrema, and
    the bridge survival must be a probability that is EXACTLY zero
    whenever a grid node already crossed the barrier."""
    from mlmc_tpu.sim.sde import coupled_path_functionals

    model = gbm(0.05, 0.2, 1.0)
    keys = _keys(21, 4096)
    cfg = dict(model=model, scheme="milstein", total_time=1.0,
               n_fine=64, n_coarse=16, path_extras=True, barrier=0.85)
    pf, _, pc = jax.jit(
        lambda k: coupled_path_functionals(cfg, keys=k))(keys)
    cfg0 = dict(cfg, path_extras=False)
    cfg0.pop("barrier")
    pf0, _, pc0 = jax.jit(
        lambda k: coupled_path_functionals(cfg0, keys=k))(keys)
    for a, b in ((pf.terminal, pf0.terminal), (pf.minimum, pf0.minimum),
                 (pc.average, pc0.average), (pc.maximum, pc0.maximum)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.asarray(pf.shifted_minimum)
                  <= np.asarray(pf.minimum) + 1e-12)
    assert np.all(np.asarray(pf.shifted_maximum)
                  >= np.asarray(pf.maximum) - 1e-12)
    surv = np.exp(np.asarray(pf.log_survival))
    assert np.all((surv >= 0.0) & (surv <= 1.0))
    crossed = np.asarray(pf.minimum) <= 0.85
    assert crossed.any() and (~crossed).any()
    assert np.all(surv[crossed] == 0.0)
    assert np.all(surv[~crossed] > 0.0)
    # config validation: barrier without extras is a loud error
    with pytest.raises(ValueError, match="path_extras"):
        coupled_path_functionals(dict(cfg0, barrier=0.85), keys=keys[:4])


def _telescoped_price(model, payoff, cfg_extra, n_levels=4, n0=16,
                      refine=4, N=1 << 14, seed=40):
    """Telescoped MLMC estimate + its CLT se over a fixed hierarchy."""
    from mlmc_tpu.sim.sde import coupled_path_functionals

    tot, var, lvars = 0.0, 0.0, []
    for lev in range(n_levels):
        nf = n0 * refine ** lev
        cfg = dict(model=model, scheme="milstein", total_time=1.0,
                   n_fine=nf, n_coarse=0 if lev == 0 else nf // refine,
                   **cfg_extra)
        pf_f, _, pf_c = jax.jit(lambda k, cfg=cfg:
                                coupled_path_functionals(cfg, keys=k))(
            _keys(seed + lev, N))
        d = np.asarray(payoff(pf_f) - (payoff(pf_c)
                                       if pf_c is not None else 0.0))
        tot += d.mean()
        var += d.var() / N
        lvars.append(d.var())
    return tot, np.sqrt(var), lvars


def test_lookback_bb_price_and_bias():
    """Floating-strike lookback: the BGK-shifted MLMC price lands on
    the Goldman-Sosin-Gatto closed form with the coupled variance
    still decaying (measured beta ~ 1 with the separable shift — it
    fixes the BIAS: on common paths at h=1/64 the raw grid minimum is
    ~1.2e-2 low against the continuous closed form, the shifted one
    lands within the O(h) weak-error band)."""
    from mlmc_tpu.sim.sde import (lookback_call_bb, lookback_call,
                                  lookback_call_price,
                                  coupled_path_functionals)

    r, sig = 0.05, 0.2
    model = gbm(r, sig, 1.0)
    disc = np.exp(-r)
    exact = lookback_call_price(1.0, r, sig, 1.0)
    est, se, lvars = _telescoped_price(
        model, lookback_call_bb(disc), dict(path_extras=True))
    assert abs(est - exact) < 6 * se + 2e-3, (est, exact, se)
    assert lvars[2] < 0.45 * lvars[1], lvars     # beta >= 1 decay
    # single-level bias at h = 1/64 on COMMON paths
    cfg = dict(model=model, scheme="milstein", total_time=1.0,
               n_fine=64, n_coarse=0, path_extras=True)
    pf, _, _ = jax.jit(lambda k: coupled_path_functionals(
        cfg, keys=k))(_keys(78, 1 << 15))
    m_raw = float(np.mean(np.asarray(lookback_call(disc)(pf))))
    m_bb = float(np.mean(np.asarray(lookback_call_bb(disc)(pf))))
    assert exact - m_raw > 5e-3, (m_raw, exact)
    assert abs(m_bb - exact) < 4e-3, (m_bb, exact)


def test_barrier_survival_price():
    """Down-and-out call: the bridge-survival payoff telescopes to the
    Merton closed form, and on COMMON paths the raw discrete knock-out
    (grid-min indicator) sits strictly above it — the within-step
    crossing mass the indicator misses (indicator >= survival product
    pathwise, equality only at survival 1/0)."""
    from mlmc_tpu.sim.sde import (barrier_call_down_out,
                                  barrier_down_out_call_price,
                                  coupled_path_functionals)

    r, sig, Bar = 0.05, 0.2, 0.85
    model = gbm(r, sig, 1.0)
    disc = np.exp(-r)
    exact = barrier_down_out_call_price(1.0, 1.0, Bar, r, sig, 1.0)
    est, se, _ = _telescoped_price(
        model, barrier_call_down_out(1.0, disc),
        dict(path_extras=True, barrier=Bar))
    assert abs(est - exact) < 6 * se + 3e-3, (est, exact, se)

    # paired discrete-vs-bridge monitoring at n=64
    cfg = dict(model=model, scheme="milstein", total_time=1.0,
               n_fine=64, n_coarse=0, path_extras=True, barrier=Bar)
    pf, _, _ = jax.jit(lambda k: coupled_path_functionals(
        cfg, keys=k))(_keys(77, 1 << 15))
    call = disc * np.maximum(np.asarray(pf.terminal) - 1.0, 0.0)
    raw = call * (np.asarray(pf.minimum) > Bar)
    bridged = call * np.exp(np.asarray(pf.log_survival))
    diff = raw - bridged
    assert np.all(diff >= -1e-12)
    se_d = diff.std() / np.sqrt(diff.size)
    assert diff.mean() > 4 * se_d, (diff.mean(), se_d)


def test_digital_smoothing_price_and_variance():
    """Cash-or-nothing call: the conditional-expectation payoff
    telescopes to exp(-rT) Phi(d2) and its coupled level variance sits
    far below the raw indicator's (which decays only ~ sqrt(h))."""
    from mlmc_tpu.sim.sde import (digital_call_smoothed, digital_call,
                                  black_scholes_digital)

    r, sig = 0.05, 0.2
    model = gbm(r, sig, 1.0)
    disc = np.exp(-r)
    exact = black_scholes_digital(1.0, 1.0, r, sig, 1.0)
    est, se, lv_s = _telescoped_price(
        model, digital_call_smoothed(1.0, disc), dict(path_extras=True))
    assert abs(est - exact) < 6 * se + 3e-3, (est, exact, se)
    _, _, lv_raw = _telescoped_price(model, digital_call(1.0, disc), {})
    # coupled-level variances: smoothing wins by an order of magnitude
    assert lv_s[1] < 0.15 * lv_raw[1], (lv_s, lv_raw)
    assert lv_s[2] < 0.15 * lv_raw[2], (lv_s, lv_raw)
