"""Shooting ODE simulations — device-native (BASELINE.json config 2).

Re-design of reference examples/shooting/simulation_shooting_{1,2}D.py:
a projectile with state (X, V) integrated by explicit Euler under a random
force field F(t), QoI = final y (1D) or final position (2D); leaving the
area borders poisons the sample with NaN (reference
simulation_shooting_1D.py:86-121).

TPU re-design:

* the Euler loop is a ``lax.scan`` with a carried out-of-bounds flag
  (data-dependent ``break`` -> masked carry),
* the random force field is a spectral GRF (random Fourier features):
  ``F(t) = sigma*sqrt(2/M) sum_m cos(k_m t + phi_m)``; phases are drawn
  per-sample from the PRNG key, so fine and coarse trajectories of one
  sample share EXACTLY the same field realization evaluated on their own
  time grids (the reference shares one field sampled on concatenated
  point sets, simulation_shooting_1D.py:76-82),
* ``calculate_batch`` vmaps the whole sample over keys — a level batch is
  one fused XLA program.
"""
import copy
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from mlmc_tpu.sim.simulation import Simulation
from mlmc_tpu.quantity.quantity_spec import QuantitySpec
from mlmc_tpu.level_simulation import LevelSimulation


def _spectral_wave_numbers(model, corr_length, mode_no, seed=0):
    """Wave numbers for the 1-D spectral force field (see
    random/correlated_field.SpectralCorrelatedField for the derivation)."""
    key = jax.random.key(seed)
    if model == "exp":
        y = jax.random.normal(key, (mode_no,))
        w = jax.random.chisquare(jax.random.fold_in(key, 1), 1.0, (mode_no,))
        k = y / jnp.sqrt(w) / corr_length
    else:  # gauss
        k = jax.random.normal(key, (mode_no,)) * (np.sqrt(2.0) / corr_length)
    return k


class ShootingSimulation1D(Simulation):
    """1D shooting: QoI = final height y."""

    N_MODES = 512
    result_dim = 1

    def __init__(self, config):
        """:param config: dict with keys
        start_position [2], start_velocity [2], area_borders [4],
        max_time, complexity (n_elements = complexity / step),
        fields_params: dict(model='gauss'|'exp', corr_length, sigma, log)
        """
        super().__init__()
        self._config = config
        self.need_workspace = False

    def level_instance(self, fine_level_params: List[float],
                       coarse_level_params: List[float]) -> LevelSimulation:
        config = copy.deepcopy(self._config)
        config["fine"] = {"step": float(fine_level_params[0])}
        config["coarse"] = {"step": float(coarse_level_params[0])}
        config["res_format"] = self.result_format()
        config["fine"]["n_elements"] = int(config["complexity"] / config["fine"]["step"])
        if config["coarse"]["step"] > 0:
            config["coarse"]["n_elements"] = int(
                config["complexity"] / config["coarse"]["step"])
        else:
            config["coarse"]["n_elements"] = 0
        fp = config.get("fields_params", {})
        config["_wave_numbers"] = _spectral_wave_numbers(
            fp.get("model", "gauss"), fp.get("corr_length", 0.1),
            config.get("n_modes", self.N_MODES), seed=fp.get("seed", 0))
        return LevelSimulation(config_dict=config,
                               task_size=self.n_ops_estimate(fine_level_params[0]),
                               nan_result_is_failure=False)

    # ------------------------------------------------------------------ #
    @classmethod
    def _force_field(cls, config, key, times):
        """Spectral GRF evaluated at given times; shared per-sample phases."""
        k = config["_wave_numbers"]
        fp = config.get("fields_params", {})
        sigma = fp.get("sigma", 1.0)
        log = fp.get("log", True)
        phases = jax.random.uniform(key, (k.shape[0],), maxval=2 * np.pi)
        field = jnp.sqrt(2.0 / k.shape[0]) * jnp.sum(
            jnp.cos(times[:, None] * k[None, :] + phases[None, :]), axis=1)
        field = sigma * field
        return jnp.exp(field) if log else field

    @classmethod
    def _run_trajectory(cls, config, forces, n_elements):
        """Euler integration as lax.scan; out-of-borders -> NaN carry."""
        dt = config["max_time"] / n_elements
        borders = jnp.asarray(config["area_borders"], dtype=forces.dtype)
        X0 = jnp.asarray(config["start_position"], dtype=forces.dtype)
        V0 = jnp.asarray(config["start_velocity"], dtype=forces.dtype)

        def step(carry, f):
            X, V, out = carry
            X = X + dt * V
            V = V + dt * f
            oob = ((X[0] > borders[1]) | (X[0] < borders[0])
                   | (X[1] > borders[3]) | (X[1] < borders[2]))
            return (X, V, out | oob), None

        (X, V, out), _ = jax.lax.scan(step, (X0, V0, jnp.asarray(False)), forces)
        return jnp.where(out, jnp.nan, X)

    @classmethod
    def _calculate_one(cls, config, key):
        n_fine = config["fine"]["n_elements"]
        n_coarse = config["coarse"]["n_elements"]
        t_fine = jnp.linspace(0.0, config["max_time"], n_fine)
        forces_fine = cls._force_field(config, key, t_fine)
        fine_X = cls._run_trajectory(config, forces_fine, n_fine)
        if n_coarse > 0:
            t_coarse = jnp.linspace(0.0, config["max_time"], n_coarse)
            forces_coarse = cls._force_field(config, key, t_coarse)
            coarse_X = cls._run_trajectory(config, forces_coarse, n_coarse)
        else:
            coarse_X = jnp.zeros_like(fine_X)
        return cls._extract_result(fine_X), cls._extract_result(coarse_X)

    @classmethod
    def _extract_result(cls, X):
        return X[1:2]  # final y

    @classmethod
    def calculate(cls, config, seed):
        """Host single-sample path (reference calculate contract)."""
        key = jax.random.key(np.uint32(seed))
        fine, coarse = cls._calculate_one(config, key)
        return np.asarray(fine), np.asarray(coarse)

    @classmethod
    def calculate_batch(cls, config, keys, attempts=None):
        """Level batch: keys [B] -> (fine [B, M], coarse [B, M], failed [B])."""
        fine, coarse = jax.vmap(lambda k: cls._calculate_one(config, k))(keys)
        # NaN QoI (out of borders) is a valid stored result in the reference,
        # masked during estimation — never a failed sample
        failed = jnp.zeros(keys.shape[0], dtype=bool)
        return fine, coarse, failed

    def n_ops_estimate(self, step):
        return self._config["complexity"] / step

    def result_format(self) -> List[QuantitySpec]:
        return [QuantitySpec(name="target", unit="m", shape=(1,), times=[10],
                             locations=["0"])]


class ShootingSimulation2D(ShootingSimulation1D):
    """2D shooting: QoI = final position (x, y); independent force per axis."""

    result_dim = 2

    @classmethod
    def _force_field(cls, config, key, times):
        k1, k2 = jax.random.split(key)
        fx = super()._force_field(config, k1, times)
        fy = super()._force_field(config, k2, times)
        return jnp.stack([fx, fy], axis=1)  # [T, 2]

    @classmethod
    def _extract_result(cls, X):
        return X  # final (x, y)

    def result_format(self) -> List[QuantitySpec]:
        return [QuantitySpec(name="target", unit="m", shape=(2,), times=[10],
                             locations=["0"])]
