"""Sample persistence contract + in-memory backend.

Re-design of reference mlmc/sample_storage.py:9-338. The contract (chunked
[M, N, 2] reads, scheduled/failed bookkeeping, n_ops cost accounting) is kept
so the Quantity layer and the Sampler are backend-agnostic. ``Memory`` holds
per-level contiguous numpy arrays (host pinned staging for the device
estimators); the HDF5 backend lives in sample_storage_hdf.py.
"""
import itertools
import numpy as np
from abc import ABCMeta, abstractmethod
from typing import List, Dict

from mlmc_tpu.quantity.quantity_spec import QuantitySpec, ChunkSpec

# default number of samples per streamed chunk (Memory storage streams one
# chunk per level; chunking matters for the HDF/out-of-core backends)
DEFAULT_CHUNK_SAMPLES = 512 * 1024


class SampleStorage(metaclass=ABCMeta):
    """Store and retrieve sample data (results, schedules, costs)."""

    @abstractmethod
    def save_samples(self, successful_samples, failed_samples):
        """Write results to storage."""

    def save_samples_bulk(self, level_id, ids, fine, coarse):
        """Bulk write path: whole level batch as arrays (no per-sample
        tuples). Default adapter wraps into the tuple contract; array-native
        backends override. fine/coarse: [N, M]."""
        res = [(sid, (f, c)) for sid, f, c in zip(ids, fine, coarse)]
        self.save_samples({level_id: res}, {})

    @abstractmethod
    def save_result_format(self, res_spec: List[QuantitySpec]):
        """Save result format."""

    @abstractmethod
    def load_result_format(self) -> List[QuantitySpec]:
        """Load result format."""

    @abstractmethod
    def save_global_data(self, result_format: List[QuantitySpec], level_parameters=None):
        """Save global data: result_format, level_parameters."""

    @abstractmethod
    def save_scheduled_samples(self, level_id, samples):
        """Save scheduled sample ids."""

    @abstractmethod
    def load_scheduled_samples(self):
        """:return: Dict[level_id, List[sample_id: str]]"""

    @abstractmethod
    def sample_pairs(self):
        """:return: List[Array[M, N, 2]]"""

    def chunks(self, level_id=None, n_samples=None):
        """Generator of ChunkSpec over levels (reference sample_storage.py:58-69)."""
        assert isinstance(n_samples, (type(None), int)), "n_samples param must be int"
        level_ids = self.get_level_ids()
        if level_id is not None:
            level_ids = [level_id]
        return itertools.chain(*[self._level_chunks(lid, n_samples) for lid in level_ids])

    @abstractmethod
    def _level_chunks(self, level_id, n_samples=None):
        """Generator of ChunkSpec for one level."""

    @abstractmethod
    def n_finished(self):
        """Number of finished samples per level."""

    @abstractmethod
    def save_n_ops(self, n_ops: Dict[int, List[float]]):
        """Save per-level cost accounting [total time, n samples]."""

    @abstractmethod
    def get_n_ops(self):
        """Cost (time) per sample for each level."""

    @abstractmethod
    def unfinished_ids(self):
        """Get unfinished sample ids."""

    @abstractmethod
    def get_level_ids(self):
        """List of level ids."""

    @abstractmethod
    def get_n_levels(self):
        """Number of levels."""

    @abstractmethod
    def get_level_parameters(self):
        """Level parameters (simulation steps)."""

    @abstractmethod
    def get_n_collected(self):
        """Number of collected results per level."""


class Memory(SampleStorage):
    """In-RAM storage: per-level [N, 2, M] float arrays (reference :135-338)."""

    def __init__(self, chunk_size=None):
        self._failed = {}
        self._results = {}
        self._successful_sample_ids = {}
        self._scheduled = {}
        self._result_specification = []
        self._n_ops = {}
        self._n_finished = {}
        self._level_parameters = []
        # in samples per chunk; None = single chunk per level
        self._chunk_size = chunk_size
        super().__init__()

    def save_samples(self, successful_samples, failed_samples):
        self._save_successful(successful_samples)
        self._save_failed(failed_samples)

    def save_samples_bulk(self, level_id, ids, fine, coarse):
        from mlmc_tpu.tags import TagChain

        pairs = np.stack([np.asarray(fine, dtype=np.float64),
                          np.asarray(coarse, dtype=np.float64)], axis=1)
        self._successful_sample_ids.setdefault(level_id, TagChain()).extend(ids)
        self._n_finished[level_id] = self._n_finished.get(level_id, 0) + len(ids)
        if level_id not in self._results:
            self._results[level_id] = pairs
        else:
            self._results[level_id] = np.concatenate(
                (self._results[level_id], pairs), axis=0)

    def save_global_data(self, result_format, level_parameters=None):
        self.save_result_format(result_format)
        self._level_parameters = level_parameters

    def _save_successful(self, samples):
        """:param samples: Dict[level_id, List[Tuple[sample_id, (fine, coarse)]]]"""
        for level_id, res in samples.items():
            if len(res) == 0:
                continue
            from mlmc_tpu.tags import TagChain

            ids = [s_id for s_id, _ in res]
            pairs = np.array([np.stack([np.ravel(f), np.ravel(c)]) for s_id, (f, c) in res],
                             dtype=np.float64)  # [N, 2, M]
            self._successful_sample_ids.setdefault(level_id, TagChain()).extend(ids)
            self._n_finished[level_id] = self._n_finished.get(level_id, 0) + pairs.shape[0]
            if level_id not in self._results:
                self._results[level_id] = pairs
            else:
                self._results[level_id] = np.concatenate((self._results[level_id], pairs), axis=0)

    def _save_failed(self, samples):
        for level_id, res in samples.items():
            self._failed.setdefault(level_id, []).extend(res)
            self._n_finished[level_id] = self._n_finished.get(level_id, 0) + len(res)

    def save_result_format(self, res_spec: List[QuantitySpec]):
        self._result_specification = res_spec

    def n_finished(self):
        if not self._n_finished:
            return np.zeros(0)
        n_levels = max(self._n_finished.keys()) + 1
        n_finished = np.zeros(n_levels)
        for level_id, n_fin in self._n_finished.items():
            n_finished[level_id] = n_fin
        return n_finished

    def load_result_format(self) -> List[QuantitySpec]:
        return self._result_specification

    def save_scheduled_samples(self, level_id, samples):
        from mlmc_tpu.tags import TagChain

        self._scheduled.setdefault(level_id, TagChain()).extend(samples)

    def load_scheduled_samples(self):
        return self._scheduled

    def sample_pairs(self):
        levels_results = [None] * len(self._results)
        for level_id in self.get_level_ids():
            results = self.sample_pairs_level(ChunkSpec(level_id=level_id))
            levels_results[level_id] = results
        return levels_results

    def _level_chunks(self, level_id, n_samples=None):
        n_total = len(self._results[level_id][:n_samples])
        chunk = self._chunk_size or n_total or 1
        for i, start in enumerate(range(0, max(n_total, 1), chunk)):
            yield ChunkSpec(
                chunk_id=i,
                chunk_slice=slice(start, min(start + chunk, n_total), 1),
                level_id=level_id,
            )

    def sample_pairs_level(self, chunk_spec):
        """:return: np.ndarray [M, chunk size, 2] (level 0: [M, chunk size, 1])"""
        results = self._results[int(chunk_spec.level_id)]
        if chunk_spec.chunk_slice is not None:
            chunk = results[chunk_spec.chunk_slice]
        else:
            chunk = results
        # level 0 has no coarse part: strip the auxiliary zero slot
        if chunk_spec.level_id == 0:
            chunk = chunk[:, :1, :]
        return chunk.transpose((2, 0, 1))  # [M, chunk size, 2]

    def save_n_ops(self, n_ops):
        """:param n_ops: iterable of (level_id, [time, n_samples])"""
        for level, (time, n_samples) in n_ops:
            if level not in self._n_ops:
                self._n_ops[level] = 0
            if n_samples != 0:
                self._n_ops[level] += time / n_samples

    def get_n_ops(self):
        n_ops = [0.0] * (max(self._n_ops.keys()) + 1 if self._n_ops else 0)
        for level, time in self._n_ops.items():
            n_ops[level] = time
        return n_ops

    def unfinished_ids(self):
        return []

    def failed_samples(self):
        return {str(level_id): [s_id for s_id, _ in fails] for level_id, fails in self._failed.items()}

    def clear_failed(self):
        self._failed = {}

    def get_level_ids(self):
        return list(self._results.keys())

    def get_n_collected(self):
        n_collected = [0] * len(self._results)
        for level_id in self.get_level_ids():
            n_collected[int(level_id)] = len(self._results[int(level_id)])
        return n_collected

    def get_n_levels(self):
        return len(self._results)

    def get_level_parameters(self):
        return self._level_parameters


class DeviceMemory(Memory):
    """HBM-resident storage: per-level results stay DEVICE arrays end to end.

    SURVEY §2's designated TPU equivalent of the reference Memory storage
    ("HBM-resident per-level ring buffers"). With a DeviceBatchPool running
    ``device_results=True``, samples are produced, stored, and estimated
    without ever crossing the host<->device link — on a remote-attached TPU
    the link is the entire cost of stored-sample estimation (a 1e6-sample
    x 30-component chunk is ~0.1 GB per pass).

    The id/cost/failure bookkeeping stays on host (tiny); only the result
    payload lives in HBM.
    """

    def save_samples_bulk(self, level_id, ids, fine, coarse):
        import jax.numpy as jnp
        from mlmc_tpu.tags import TagChain

        pairs = jnp.stack([jnp.asarray(fine), jnp.asarray(coarse)], axis=1)
        self._successful_sample_ids.setdefault(level_id, TagChain()).extend(ids)
        self._n_finished[level_id] = self._n_finished.get(level_id, 0) + len(ids)
        if level_id not in self._results:
            self._results[level_id] = pairs
        else:
            self._results[level_id] = jnp.concatenate(
                (self._results[level_id], pairs), axis=0)

    def _save_successful(self, samples):
        import jax.numpy as jnp

        for level_id, res in samples.items():
            if len(res) == 0:
                continue
            ids = [s_id for s_id, _ in res]
            fine = np.stack([np.ravel(f) for _, (f, _c) in res])
            coarse = np.stack([np.ravel(c) for _, (_f, c) in res])
            self.save_samples_bulk(level_id, ids, jnp.asarray(fine),
                                   jnp.asarray(coarse))

    def sample_pairs_level(self, chunk_spec):
        """:return: DEVICE array [M, chunk, 2] (level 0: [M, chunk, 1])."""
        results = self._results[int(chunk_spec.level_id)]
        chunk = (results[chunk_spec.chunk_slice]
                 if chunk_spec.chunk_slice is not None else results)
        if chunk_spec.level_id == 0:
            chunk = chunk[:, :1, :]
        return chunk.transpose((2, 0, 1))
