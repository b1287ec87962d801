"""Composition contract sweep (docs/compositions.md — VERDICT r3 item
6): every claimed-valid (family x option) cell RUNS a tiny coupled
batch to finite results, and every claimed-invalid cell raises a loud
ValueError — so an option silently accepted-but-ignored (a statistical
no-op, the worst failure mode as the estimator estate grows) cannot
ship. Driver-seam contracts (simulation_pair_fn, sde_qmc_level_fns,
MLQMC) are asserted at the same granularity."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mlmc_tpu.sim.sde as sde
from mlmc_tpu.sim.jumps import JumpDiffusionSimulation
from mlmc_tpu.sim.levy import VarianceGammaSimulation


def _gbm_sim(opts):
    return sde.SDESimulation({"model": sde.gbm(), **opts})


def _system_sim(opts):
    return sde.SDESystemSimulation({
        "model": sde.heston(),
        "payoff": lambda pf: jnp.maximum(pf.terminal[:, 0] - 1.0, 0.0),
        **opts})


FAMILIES = {
    "gbm": _gbm_sim,
    "heston": _system_sim,
    "jumps": JumpDiffusionSimulation,
    "vg": VarianceGammaSimulation,
}

# (family, option-dict, expected): expected None = runs finite,
# else the ValueError match pattern
CELLS = [
    # scheme=milstein
    ("gbm", {"scheme": "milstein"}, None),
    ("heston", {"scheme": "milstein"}, "Euler"),
    ("jumps", {"scheme": "milstein"}, "Euler"),
    ("vg", {"scheme": "milstein"}, "exact"),
    # antithetic (Giles-Szpruch twin)
    ("gbm", {"antithetic": True}, None),
    ("heston", {"antithetic": True}, None),
    ("jumps", {"antithetic": True}, "antithetic|continuous"),
    ("vg", {"antithetic": True}, "antithetic|pure-jump"),
    # drift_shift (Girsanov importance sampling)
    ("gbm", {"drift_shift": 0.3}, None),
    ("heston", {"drift_shift": 0.3}, "scalar"),
    ("jumps", {"drift_shift": 0.3}, "drift_shift|likelihood"),
    ("vg", {"drift_shift": 0.3}, "drift_shift|pure-jump"),
    # path_extras (Brownian-bridge refinements)
    ("gbm", {"path_extras": True}, None),
    ("heston", {"path_extras": True}, None),
    ("jumps", {"path_extras": True}, "path_extras|bridge"),
    ("vg", {"path_extras": True}, "path_extras|pure-jump"),
    # qoi='functionals' (post-hoc payoff composition)
    ("gbm", {"qoi": "functionals"}, None),
    ("heston", {"qoi": "functionals"}, None),
    ("jumps", {"qoi": "functionals"}, None),
    ("vg", {"qoi": "functionals"}, None),
    # option x option
    ("gbm", {"qoi": "functionals", "antithetic": True}, "antithetic"),
    ("gbm", {"qoi": "functionals", "drift_shift": 0.3}, None),
    ("gbm", {"antithetic": True, "drift_shift": 0.3}, None),
    ("gbm", {"payoff": "smoothed_digital"}, "path_extras"),
    ("gbm", {"payoff": "smoothed_digital", "path_extras": True}, None),
    ("gbm", {"payoff": "smoothed_digital", "path_extras": True,
             "drift_shift": 0.3}, "drift_shift"),
    ("gbm", {"payoff": "lookback_bb"}, "path_extras"),
    ("gbm", {"payoff": "lookback_bb", "path_extras": True}, None),
]


def _materialize(opts):
    opts = dict(opts)
    if opts.get("payoff") == "smoothed_digital":
        opts["payoff"] = sde.digital_call_smoothed(1.0)
    elif opts.get("payoff") == "lookback_bb":
        opts["payoff"] = sde.lookback_call_bb(1.0)
    return opts


def _cell_id(cell):
    fam, opts, expected = cell
    tag = "+".join(f"{k}={v}" if not callable(v) else k
                   for k, v in opts.items())
    return f"{fam}:{tag}:{'ok' if expected is None else 'raises'}"


@pytest.mark.parametrize("cell", CELLS, ids=_cell_id)
def test_family_option_cell(cell):
    fam, opts, expected = cell
    ctor = FAMILIES[fam]
    if expected is not None:
        with pytest.raises(ValueError, match=expected):
            sim = ctor(_materialize(opts))
            lvl = sim.level_instance([0.25], [0.5])
            keys = jax.random.split(jax.random.key(0), 8)
            type(sim).calculate_batch(lvl.config_dict, keys)
        return
    sim = ctor(_materialize(opts))
    keys = jax.random.split(jax.random.key(0), 8)
    for params, coarse in (([0.25], [0.5]), ([0.25], [0])):
        lvl = sim.level_instance(params, coarse)
        f, c, failed = type(sim).calculate_batch(lvl.config_dict, keys)
        f, c = np.asarray(f), np.asarray(c)
        assert f.shape[0] == 8 and np.all(np.isfinite(f)), (fam, opts)
        assert not np.any(np.asarray(failed)), (fam, opts)
        # the declared format matches what the batch emits — a format
        # mismatch is exactly the silent no-op class this sweep exists
        # to catch (ADVICE r3: jumps drift_shift declared a log_weight
        # column its batch never wrote)
        m_declared = sum(int(np.prod(s.shape)) * len(s.times)
                         * len(s.locations)
                         for s in sim.result_format())
        assert f.reshape(8, -1).shape[1] == m_declared, (
            fam, opts, f.shape, m_declared)


def test_pair_fn_adapter_spans_all_families():
    """simulation_pair_fn adapts every batch-path family to the
    pair_fn(level, keys) drivers (cmlmc/ml2r/cvar/cdf seam)."""
    from mlmc_tpu.cdf_estimate import simulation_pair_fn

    for fam, ctor in FAMILIES.items():
        sim = ctor({})
        pair_fn, L = simulation_pair_fn(sim, [[0.5], [0.25]])
        assert L == 2
        keys = jax.random.split(jax.random.key(1), 8)
        for level in range(L):
            f, c, ok = pair_fn(level, keys)
            assert np.all(np.isfinite(np.asarray(f))), fam
            assert np.asarray(ok).all(), fam
            if level == 0:
                assert np.all(np.asarray(c) == 0.0), fam


def test_qmc_seam_contracts():
    """sde_qmc_level_fns: payoff QoI only; drift_shift and antithetic
    COMPOSE through the bridge (tiny-run finiteness + weights present);
    MLQMC rejects failure injection loudly."""
    from mlmc_tpu.qmc import MLQMC, synth_qmc_level_fns
    from mlmc_tpu.sim.sde import sde_qmc_level_fns

    with pytest.raises(ValueError, match="payoff"):
        sde_qmc_level_fns(_gbm_sim({"qoi": "functionals"}),
                          [[0.5], [0.25]])
    with pytest.raises(ValueError, match="nan_fraction|failure"):
        synth_qmc_level_fns([[0.5], [0.25]], nan_fraction=0.1)

    for opts in ({"drift_shift": 0.4}, {"antithetic": True},
                 {"drift_shift": 0.4, "antithetic": True}):
        fns, dims = sde_qmc_level_fns(_gbm_sim(opts), [[0.5], [0.25]])
        ml = MLQMC(fns, dims, n_randomizations=4, seed=2,
                   chunk_size=64)
        ml.extend(0, 128)
        ml.extend(1, 128)
        means, _ = ml.level_estimates()
        assert np.all(np.isfinite(means)), (opts, means)
