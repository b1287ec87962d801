"""Sample scheduling / collection driver.

Re-design of reference mlmc/sampler.py:9-287. The Sampler stays a host-side
driver (the only Python loop in the framework): it decides per-level target
counts, hands sample ids to the pool, and stores finished results. With the
DeviceBatchPool, "scheduling" is just building index vectors — the actual
execution is one jitted batch per level inside ``pool.get_finished()``.
"""
import time
import numpy as np
from typing import List

from mlmc_tpu.sample_storage import SampleStorage
from mlmc_tpu.sampling_pool import SamplingPool
from mlmc_tpu.sim.simulation import Simulation
from mlmc_tpu.tool.log import get_logger, event

_log = get_logger("sampler")


class Sampler:
    """Manages sample scheduling, result collection and storage."""

    ADDING_SAMPLES_TIMEOUT = 1e-15

    def __init__(
        self,
        sample_storage: SampleStorage,
        sampling_pool: SamplingPool,
        sim_factory: Simulation,
        level_parameters: List[List[float]],
        seed=1234,
    ):
        """
        :param sample_storage: stores scheduled ids, results, result format
        :param sampling_pool: calculates samples
        :param sim_factory: simulation factory creating level instances
        :param level_parameters: per-level simulation steps
        :param seed: global seed for host-side randomness
        """
        np.random.seed(seed)
        self.sample_storage = sample_storage
        self._sampling_pool = sampling_pool

        self._n_target_samples = np.zeros(len(level_parameters))
        self._level_sim_objects = []
        self._create_level_sim_objects(level_parameters, sim_factory)

        sample_storage.save_global_data(
            level_parameters=level_parameters, result_format=sim_factory.result_format()
        )

        self._n_scheduled_samples = [
            len(level_scheduled)
            for level_id, level_scheduled in sample_storage.load_scheduled_samples().items()
        ]
        if not self._n_scheduled_samples:
            self._n_scheduled_samples = np.zeros(len(level_parameters))

        self._check_failed_samples()

    @property
    def n_levels(self):
        return len(self._level_sim_objects)

    @property
    def n_finished_samples(self):
        return self.sample_storage.n_finished()

    def _create_level_sim_objects(self, level_parameters, sim_factory):
        n_levels = len(level_parameters)
        for level_id in range(n_levels):
            if level_id == 0:
                level_sim = sim_factory.level_instance(level_parameters[level_id], [0])
            else:
                level_sim = sim_factory.level_instance(
                    level_parameters[level_id], level_parameters[level_id - 1]
                )
            level_sim.calculate = sim_factory.calculate
            level_sim.calculate_batch = getattr(sim_factory, "calculate_batch", None)
            level_sim.result_format = sim_factory.result_format()
            level_sim.level_id = level_id
            self._level_sim_objects.append(level_sim)

    def sample_range(self, n0, nL):
        """Geometric sequence of length n_levels decreasing from n0 to nL."""
        return np.round(np.exp2(np.linspace(np.log2(n0), np.log2(nL), self.n_levels))).astype(int)

    def set_initial_n_samples(self, n_samples=None):
        """Set per-level target sample counts (geometric fill from [n0, nL])."""
        if n_samples is None:
            n_samples = [100, 10]
        n_samples = np.atleast_1d(n_samples)
        if len(n_samples) == 1:
            n_samples = np.array([n_samples[0], 10])
        if len(n_samples) == 2:
            n0, nL = n_samples
            n_samples = self.sample_range(n0, nL)
        self._n_target_samples = n_samples

    def _get_sample_tag(self, level_id):
        return "L{:02d}_S{:07d}".format(level_id, int(self._n_scheduled_samples[level_id]))

    def schedule_samples(self, timeout=None):
        """Schedule the gap between target and scheduled counts per level."""
        self.ask_sampling_pool_for_samples(timeout=timeout)
        plan_samples = self._n_target_samples - self._n_scheduled_samples

        for level_id, n_samples in enumerate(plan_samples):
            samples = []
            for _ in range(int(n_samples)):
                sample_id = self._get_sample_tag(level_id)
                level_sim = self._level_sim_objects[level_id]
                self._sampling_pool.schedule_sample(sample_id, level_sim)
                self._n_scheduled_samples[level_id] += 1
                samples.append(sample_id)
            if samples:
                self.sample_storage.save_scheduled_samples(level_id, samples)
                event(_log, "scheduled", level=level_id, n=len(samples))

    def _check_failed_samples(self):
        unfinished_sample_ids = self.sample_storage.unfinished_ids()
        self._sampling_pool.have_permanent_samples(unfinished_sample_ids)

    def ask_sampling_pool_for_samples(self, sleep=0, timeout=None):
        """Collect finished samples; block until none running (or timeout)."""
        if timeout is None:
            timeout = 0
        elif timeout <= 0:
            return 1

        n_running = 1
        t0 = time.perf_counter()
        while n_running > 0:
            successful_samples, failed_samples, n_running, n_ops = self._sampling_pool.get_finished()
            self._store_samples(successful_samples, failed_samples, n_ops)
            time.sleep(sleep)
            if 0 < timeout < (time.perf_counter() - t0):
                break
        return n_running

    def _store_samples(self, successful_samples, failed_samples, n_ops):
        from mlmc_tpu.sampling_pool import BulkResults

        for level_id, res in successful_samples.items():
            n = len(res.ids) if isinstance(res, BulkResults) else len(res)
            if n:
                event(_log, "collected", level=level_id, n=n)
        for level_id, res in failed_samples.items():
            if len(res):
                event(_log, "failed", level=level_id, n=len(res))

        tupled = {}
        for level_id, res in successful_samples.items():
            if isinstance(res, BulkResults):
                self.sample_storage.save_samples_bulk(
                    level_id, res.ids, res.fine, res.coarse)
            else:
                tupled[level_id] = res
        if tupled or failed_samples:
            self.sample_storage.save_samples(tupled, failed_samples)
        self.sample_storage.save_n_ops(n_ops)

    def process_adding_samples(self, n_estimated, sleep=0, add_coeff=0.1, timeout=ADDING_SAMPLES_TIMEOUT):
        """Adaptive add: schedule add_coeff of the gap towards n_estimated.

        :return: True when scheduled == estimated on all levels
        """
        self.ask_sampling_pool_for_samples(timeout=timeout)
        n_scheduled = self.l_scheduled_samples()

        new_scheduled = np.where(
            (n_estimated * add_coeff) > (n_estimated - n_scheduled),
            n_estimated,
            n_scheduled + (n_estimated - n_scheduled) * add_coeff,
        )
        n_scheduled = np.ceil(np.where(n_estimated < n_scheduled, n_scheduled, new_scheduled))

        greater_items = np.where(np.greater(n_estimated, n_scheduled))[0]
        self.set_scheduled_and_wait(n_scheduled, greater_items, sleep, timeout=timeout)

        return np.all(n_estimated[greater_items] == n_scheduled[greater_items])

    def set_scheduled_and_wait(self, n_scheduled, greater_items, sleep, fin_sample_coef=0.5, timeout=1e-7):
        """Schedule and wait until at least half the samples are done."""
        self.set_level_target_n_samples(n_scheduled)
        self.schedule_samples(timeout=timeout)

        n_finished = self.n_finished_samples
        while np.any(n_finished[greater_items] < fin_sample_coef * np.asarray(n_scheduled)[greater_items]):
            time.sleep(sleep)
            self.ask_sampling_pool_for_samples(timeout=timeout)
            n_finished = self.n_finished_samples

    def set_level_target_n_samples(self, n_samples):
        for level, n in enumerate(n_samples):
            self._n_target_samples[level] = max(self._n_target_samples[level], n)

    def l_scheduled_samples(self):
        return self._n_scheduled_samples

    def renew_failed_samples(self):
        """Reschedule failed sample ids and clear the failed store."""
        failed_samples = self.sample_storage.failed_samples()
        for level_id, sample_ids in failed_samples.items():
            level_id = int(level_id)
            for sample_id in sample_ids:
                level_sim = self._level_sim_objects[level_id]
                self._sampling_pool.schedule_sample(sample_id, level_sim)
        self.sample_storage.clear_failed()
