"""Secondary benchmarks: BASELINE configs 2 (shooting) and 5 (diffusion)
on the real chip. Not part of the driver's bench contract (bench.py stays
the single-line headline); run manually, numbers recorded in BASELINE.md.

Usage: python bench_extra.py
"""
import json
import time

import numpy as np
import jax

from mlmc_tpu.sim.shooting import ShootingSimulation1D
from mlmc_tpu.sim.diffusion import DiffusionSimulation


def bench_shooting():
    sim = ShootingSimulation1D(dict(
        start_position=(0.0, 0.0), start_velocity=(10.0, 0.0),
        area_borders=(-100.0, 200.0, -300.0, 400.0), max_time=10.0,
        complexity=20.0, n_modes=256,
        fields_params=dict(model="gauss", corr_length=1.0, sigma=0.5,
                           log=False)))
    level_sim = sim.level_instance([0.02], [0.1])  # fine n=1000 steps
    cfg = level_sim.config_dict
    B = 8192
    keys = jax.random.split(jax.random.key(0), B)
    fn = jax.jit(lambda k: ShootingSimulation1D.calculate_batch(cfg, k))
    out = fn(keys)
    _ = float(np.asarray(out[0])[0, 0])
    t0 = time.perf_counter()
    reps = 5
    for i in range(reps):
        out = fn(jax.random.split(jax.random.key(i + 1), B))
        _ = float(np.asarray(out[0])[0, 0])
    dt = (time.perf_counter() - t0) / reps
    return dict(workload="shooting 1D, 1000+200 Euler steps, 256 modes",
                samples_per_s=round(B / dt, 1), wall_s=round(dt, 4))


def bench_diffusion():
    sim = DiffusionSimulation(dict(sigma=1.0, corr_length=0.3, n_modes=256))
    level_sim = sim.level_instance([1 / 64], [1 / 16])
    cfg = level_sim.config_dict
    B = 256
    keys = jax.random.split(jax.random.key(0), B)
    fn = jax.jit(lambda k: DiffusionSimulation.calculate_batch(cfg, k))
    out = fn(keys)
    _ = float(np.asarray(out[0])[0, 0])
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out = fn(jax.random.split(jax.random.key(i + 1), B))
        _ = float(np.asarray(out[0])[0, 0])
    dt = (time.perf_counter() - t0) / reps
    return dict(workload="Darcy 64^2+16^2 grids, CG solve, 256-mode GRF",
                samples_per_s=round(B / dt, 1), wall_s=round(dt, 4))


if __name__ == "__main__":
    results = {}
    for name, fn in [("shooting", bench_shooting),
                     ("diffusion", bench_diffusion)]:
        try:
            results[name] = fn()
        except Exception as e:  # tunnel flakiness must not sink the rest
            results[name] = {"error": str(e)[:200]}
    print(json.dumps(results))
