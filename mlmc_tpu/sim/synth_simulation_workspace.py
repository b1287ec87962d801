"""Workspace-based synthetic simulation (host path).

Re-design of reference mlmc/sim/synth_simulation.py:148-296
(SynthSimulationWorkspace): the simulation reads its configuration from a
YAML file copied into a per-sample workspace directory — the pattern used
by external-binary simulations (FlowSim). Exercises the host pools'
workspace machinery (copy common files, chdir, failed-dir moves); it is
deliberately NOT a device simulation.
"""
import os
from typing import List

import numpy as np
import yaml

from mlmc_tpu.sim.synth_simulation import SynthSimulation
from mlmc_tpu.level_simulation import LevelSimulation


class SynthSimulationWorkspace(SynthSimulation):
    """Synthetic sample computed from a config YAML in the sample workspace."""

    n_nans = 0
    nan_fraction = 0
    len_results = 0

    CONFIG_FILE = "synth_sim_config.yaml"

    def __init__(self, config):
        """:param config: dict with key config_yaml (path to the YAML file
        with keys distr ('norm'), nan_fraction)"""
        self.config_yaml = config["config_yaml"]
        SynthSimulationWorkspace.n_nans = 0
        SynthSimulationWorkspace.nan_fraction = config.get("nan_fraction", 0.0)
        SynthSimulationWorkspace.len_results = 0
        self.need_workspace = True

    @staticmethod
    def sample_fn(x, h):
        return x + h * np.sqrt(1e-4 + np.abs(x))

    @staticmethod
    def sample_fn_no_error(x, h):
        return x

    def level_instance(self, fine_level_params: List[float],
                       coarse_level_params: List[float]) -> LevelSimulation:
        config = dict()
        config["fine"] = {"step": fine_level_params[0]}
        config["coarse"] = {"step": coarse_level_params[0]}
        config["res_format"] = self.result_format()
        job_weight = 20000
        return LevelSimulation(config_dict=config,
                               common_files=[self.config_yaml],
                               task_size=1.0 / job_weight,
                               need_sample_workspace=True)

    @staticmethod
    def generate_random_samples(distr, seed, size):
        """Host RNG draw; injects NaN failures at the configured rate."""
        SynthSimulationWorkspace.len_results += 1
        if distr == "norm":
            import scipy.stats as stats

            frozen = stats.norm(loc=1, scale=2)
        else:
            raise NotImplementedError(
                "Other distributions are not implemented yet")
        frozen.random_state = np.random.RandomState(seed)
        y = frozen.rvs(size=size)
        frac = SynthSimulationWorkspace.nan_fraction
        if SynthSimulationWorkspace.n_nans / \
                (1e-10 + SynthSimulationWorkspace.len_results) < frac:
            SynthSimulationWorkspace.n_nans += 1
            y = np.full(size, np.nan)
        return y, y

    @staticmethod
    def calculate(config, seed):
        """Runs INSIDE the sample workspace (cwd holds the config YAML)."""
        config_file = SynthSimulationWorkspace._read_config()
        SynthSimulationWorkspace.nan_fraction = config_file["nan_fraction"]
        quantity_format = config["res_format"]

        fine_random, coarse_random = SynthSimulationWorkspace.generate_random_samples(
            config_file["distr"], seed, int(np.prod(quantity_format[0].shape)))

        fine_step = config["fine"]["step"]
        coarse_step = config["coarse"]["step"]
        fine_result = SynthSimulationWorkspace.sample_fn(
            np.asarray(fine_random), fine_step)
        if coarse_step == 0:
            coarse_result = np.zeros(len(fine_result))
        else:
            coarse_result = SynthSimulationWorkspace.sample_fn(
                np.asarray(coarse_random), coarse_step)

        if np.any(np.isnan(fine_result)) or np.any(np.isnan(coarse_result)):
            raise Exception("result is nan")

        results = []
        for result in [fine_result, coarse_result]:
            quantities = []
            for quantity in quantity_format:
                if coarse_step == 0:
                    locations = np.array(
                        [result for _ in range(len(quantity.locations))])
                else:
                    locations = np.array(
                        [result + i for i in range(len(quantity.locations))])
                times = np.array([locations for _ in range(len(quantity.times))])
                quantities.append(times)
            results.append(np.array(quantities))
        return results[0].flatten(), results[1].flatten()

    # workspace simulations have no device batch path
    calculate_batch = None

    def n_ops_estimate(self, step):
        return (1 / step) ** 2 * np.log(max(1 / step, 2.0))

    @staticmethod
    def _read_config():
        with open(os.path.join(os.getcwd(),
                               SynthSimulationWorkspace.CONFIG_FILE)) as f:
            return yaml.safe_load(f)
