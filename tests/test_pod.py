"""POD reduced-basis surrogates (pod.py) — beyond-reference capability.

Validation: out-of-sample reproduction quality of the Galerkin-reduced
Darcy flux, snapshot-energy accounting, and the surrogate plugged into
MFMC as a coupled low-fidelity model.
"""
import numpy as np
import jax

from mlmc_tpu.pod import pod_darcy_surrogate

CFG = dict(sigma=1.0, corr_length=0.3)


def test_pod_reproduction_quality():
    """Held-out keys: the reduced flux tracks the full solve (rho >
    0.97), and the snapshot spectrum decays (99%+ energy at rank)."""
    out = pod_darcy_surrogate(CFG, n=32, rank=24, n_snapshots=64)
    assert out["energy"][out["rank"] - 1] > 0.99
    keys = jax.random.split(jax.random.key(7), 256)
    red = np.asarray(jax.jit(out["model"])(keys))
    full = np.asarray(jax.jit(out["full_model"])(keys))
    rho = np.corrcoef(red, full)[0, 1]
    assert rho > 0.97, rho
    assert np.sqrt(np.mean((red - full) ** 2)) < 0.3 * full.std()
    # rank saturates: a rank-4 basis must be visibly worse
    out4 = pod_darcy_surrogate(CFG, n=32, rank=4, n_snapshots=64)
    red4 = np.asarray(jax.jit(out4["model"])(keys))
    rho4 = np.corrcoef(red4, full)[0, 1]
    assert rho4 < rho, (rho4, rho)


def test_pod_in_mfmc():
    """The POD surrogate as an MFMC low-fidelity model: pilot rho high,
    both models selected, variance reduction > 1, and the estimate
    stays calibrated (surrogate bias must not leak — MFMC
    unbiasedness)."""
    from mlmc_tpu.multifidelity import MFMC

    out = pod_darcy_surrogate(CFG, n=32, rank=24, n_snapshots=64)
    mf = MFMC([out["full_model"], out["model"]], costs=[1.0, 0.12],
              seed=5, chunk_size=1 << 8)
    st = mf.pilot(1 << 10)
    assert st["rho"][0] > 0.97, st["rho"]
    res = mf.estimate(budget=3000.0)
    assert res["speedup"] > 1.2, res["speedup"]
    # calibration: a plain full-model mean with matched effort
    keys = jax.random.split(jax.random.key(31), 2048)
    full = np.asarray(jax.jit(out["full_model"])(keys))
    tol = 6 * np.sqrt(res["var"] + full.var() / full.size)
    assert abs(res["mean"] - full.mean()) < tol, (res["mean"],
                                                  full.mean())
