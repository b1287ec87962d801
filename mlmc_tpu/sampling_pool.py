"""Sample execution runtimes (pools).

Re-design of reference mlmc/sampling_pool.py:16-337. The pool contract is
kept (``schedule_sample`` / ``get_finished`` / ``have_permanent_samples``)
but the center of gravity moves on-device:

* ``DeviceBatchPool`` — THE TPU runtime: scheduled sample ids become PRNG
  keys (``fold_in(level_key, sample_index)``), a whole level batch runs as
  one jitted vmapped computation, results stay as device arrays until the
  storage stages them. Failure injection/NaN results become failed samples
  with reproducible (level, index, attempt) provenance. Batches are padded
  to bucket sizes so XLA reuses compiled executables across adaptive rounds.
* ``OneProcessPool`` / ``ProcessPool`` / ``ThreadPool`` — host loops kept
  for simulations that cannot express a device batch path (external
  binaries, workspace simulations), matching reference semantics including
  md5(sample_id) seeding (reference sampling_pool.py:75-84).
"""
import collections
import os
import queue
import shutil
import sys
import time
import hashlib
import traceback
import numpy as np
import jax
import jax.numpy as jnp
from abc import ABC, abstractmethod
from typing import List

from mlmc_tpu.level_simulation import LevelSimulation


# bulk level results: arrays instead of per-sample tuples (storages with
# save_samples_bulk consume these without marshalling)
BulkResults = collections.namedtuple("BulkResults", ["ids", "fine", "coarse"])


def _round_up_bucket(n, min_bucket=256):
    """Next power-of-two bucket ≥ n (bounds the number of XLA compilations)."""
    b = min_bucket
    while b < n:
        b *= 2
    return b


class SamplingPool(ABC):
    """Runtime environment for samples (reference sampling_pool.py:16-126)."""

    FAILED_DIR = "failed"
    SEVERAL_SUCCESSFUL_DIR = "several_successful"
    N_SUCCESSFUL = 5

    def __init__(self, work_dir=None, debug=False):
        self._output_dir = None
        if work_dir is not None:
            work_dir = os.path.abspath(work_dir)
            self._output_dir = os.path.join(work_dir, "output")
        self._debug = debug
        self._create_dir()
        self._create_dir(SamplingPool.FAILED_DIR)
        self._successful_dir = self._create_dir(SamplingPool.SEVERAL_SUCCESSFUL_DIR)

    def _create_dir(self, directory=""):
        if self._output_dir is not None:
            directory = os.path.join(self._output_dir, directory)
            if os.path.exists(directory) and not self._debug:
                shutil.rmtree(directory)
            os.makedirs(directory, mode=0o775, exist_ok=True)
            return directory

    @abstractmethod
    def schedule_sample(self, sample_id, level_sim: LevelSimulation):
        """Queue one sample for calculation."""

    @abstractmethod
    def have_permanent_samples(self, sample_ids):
        """Inform the pool about scheduled-but-unfinished ids (resume)."""

    @abstractmethod
    def get_finished(self):
        """:return: (successful, failed, n_running, n_ops) per level."""

    @staticmethod
    def compute_seed(sample_id):
        """md5(sample_id) -> uint32 (parity with reference :75-84)."""
        h = hashlib.md5(sample_id.encode("ascii"))
        return np.frombuffer(h.digest(), dtype="uint32")[0]

    @staticmethod
    def calculate_sample(sample_id, level_sim, work_dir=None, seed=None):
        """Single-sample wrapper: timing + traceback capture + shape check."""
        if seed is None:
            seed = SamplingPool.compute_seed(sample_id)
        res = (None, None)
        err_msg = ""
        running_time = 0

        if level_sim.need_sample_workspace:
            SamplingPool.handle_sim_files(work_dir, sample_id, level_sim)
        try:
            start = time.time()
            res = level_sim.calculate(level_sim.config_dict, seed)
            running_time = time.time() - start

            if isinstance(res[0], np.ndarray) and isinstance(res[1], np.ndarray):
                flat_fine = res[0].flatten()
                flat_coarse = res[1].flatten()
                res_expected_len = int(
                    np.sum(
                        [
                            np.prod(spec.shape) * len(spec.times) * len(spec.locations)
                            for spec in level_sim.result_format
                        ]
                    )
                )
                assert len(flat_fine) == len(flat_coarse) == res_expected_len, (
                    "Unexpected result format, expected length: {}, result length: {}".format(
                        res_expected_len, len(flat_fine)
                    )
                )
        except Exception:
            err_msg = "".join(traceback.format_exception(*sys.exc_info()))

        return sample_id, res, err_msg, running_time

    # ---------------- workspace helpers (host sims) ---------------------- #
    @staticmethod
    def change_to_sample_directory(work_dir, path):
        sample_dir = os.path.join(work_dir, path)
        os.makedirs(sample_dir, mode=0o775, exist_ok=True)
        return sample_dir

    @staticmethod
    def copy_sim_files(files: List[str], sample_dir):
        for f in files:
            shutil.copy(f, sample_dir)

    @staticmethod
    def handle_sim_files(work_dir, sample_id, level_sim):
        if level_sim.need_sample_workspace:
            sample_dir = SamplingPool.change_to_sample_directory(work_dir, sample_id)
            if level_sim.common_files is not None:
                SamplingPool.copy_sim_files(level_sim.common_files, sample_dir)
            os.chdir(sample_dir)

    @staticmethod
    def move_dir(sample_id, sample_workspace, work_dir, dest_dir):
        if sample_workspace and work_dir is not None and dest_dir is not None:
            destination_dir = os.path.join(work_dir, dest_dir)
            sample_dir = SamplingPool.change_to_sample_directory(work_dir, sample_id)
            target = os.path.join(destination_dir, sample_id)
            if os.path.exists(target):
                shutil.rmtree(target, ignore_errors=True)
            shutil.copytree(sample_dir, target)

    @staticmethod
    def remove_sample_dir(sample_id, sample_workspace, work_dir):
        if sample_workspace and work_dir is not None:
            sample_dir = SamplingPool.change_to_sample_directory(work_dir, sample_id)
            shutil.rmtree(sample_dir, ignore_errors=True)

    @staticmethod
    def move_successful_rm(sample_id, level_sim, output_dir, dest_dir):
        if int(sample_id[-7:]) < SamplingPool.N_SUCCESSFUL:
            SamplingPool.move_dir(sample_id, level_sim.need_sample_workspace, output_dir, dest_dir)
        SamplingPool.remove_sample_dir(sample_id, level_sim.need_sample_workspace, output_dir)

    @staticmethod
    def move_failed_rm(sample_id, level_sim, output_dir, dest_dir):
        SamplingPool.move_dir(sample_id, level_sim.need_sample_workspace, output_dir, dest_dir)
        SamplingPool.remove_sample_dir(sample_id, level_sim.need_sample_workspace, output_dir)


class OneProcessPool(SamplingPool):
    """Everything runs inline in one process (reference :207-294)."""

    def __init__(self, work_dir=None, debug=False):
        super().__init__(work_dir=work_dir, debug=debug)
        self._failed_queues = {}
        self._queues = {}
        self._n_running = 0
        self.times = {}

    def schedule_sample(self, sample_id, level_sim):
        self._n_running += 1
        if self._output_dir is None and level_sim.need_sample_workspace:
            self._output_dir = os.getcwd()
        sample_id, result, err_msg, running_time = SamplingPool.calculate_sample(
            sample_id, level_sim, work_dir=self._output_dir
        )
        self._process_result(sample_id, result, err_msg, running_time, level_sim)

    def _process_result(self, sample_id, result, err_msg, running_time, level_sim):
        self._save_running_time(level_sim.level_id, running_time)
        if not err_msg:
            self._queues.setdefault(level_sim.level_id, queue.Queue()).put(
                (sample_id, (result[0], result[1]))
            )
            if not self._debug:
                SamplingPool.move_successful_rm(
                    sample_id, level_sim, output_dir=self._output_dir, dest_dir=self._successful_dir
                )
        else:
            if level_sim.need_sample_workspace:
                SamplingPool.move_failed_rm(
                    sample_id, level_sim, output_dir=self._output_dir,
                    dest_dir=SamplingPool.FAILED_DIR,
                )
            self._failed_queues.setdefault(level_sim.level_id, queue.Queue()).put(
                (sample_id, err_msg)
            )

    def _save_running_time(self, level_id, running_time):
        if level_id not in self.times:
            self.times[level_id] = [0, 0]
        if running_time != 0:
            self.times[level_id][0] += running_time
            self.times[level_id][1] += 1

    def have_permanent_samples(self, sample_ids):
        return False

    def get_finished(self):
        successful = self._queues_to_list(list(self._queues.items()))
        failed = self._queues_to_list(list(self._failed_queues.items()))
        return successful, failed, self._n_running, list(self.times.items())

    def _queues_to_list(self, queue_dict_list):
        results = {}
        for level_id, q in queue_dict_list:
            queue_list = list(q.queue)
            if not queue_list:
                continue
            results[level_id] = queue_list
            with q.mutex:
                q.queue.clear()
            self._n_running -= len(results[level_id])
        return results


class ProcessPool(OneProcessPool):
    """Multi-process local pool (reference :297-323) via concurrent.futures."""

    def __init__(self, n_processes, work_dir=None, debug=False):
        import concurrent.futures

        self._executor = concurrent.futures.ProcessPoolExecutor(max_workers=n_processes)
        self._futures = []
        super().__init__(work_dir=work_dir, debug=debug)

    def schedule_sample(self, sample_id, level_sim):
        self._n_running += 1
        if self._output_dir is None and level_sim.need_sample_workspace:
            self._output_dir = os.getcwd()
        fut = self._executor.submit(
            SamplingPool.calculate_sample, sample_id, level_sim, self._output_dir
        )
        fut._mlmc_sample_id = sample_id
        self._futures.append((fut, level_sim))

    def get_finished(self):
        pending = []
        for fut, level_sim in self._futures:
            if not fut.done():
                pending.append((fut, level_sim))
                continue
            try:
                result = fut.result()
            except Exception as exc:
                # executor-level failure (worker died, unpicklable config):
                # report it as a failed sample instead of crashing collection
                # and leaving the future to be re-processed on retry
                sample_id = getattr(fut, "_mlmc_sample_id", "<unknown>")
                self._process_result(
                    sample_id, None,
                    "executor failure: {}".format(exc), (0.0, 0.0), level_sim)
                continue
            self._process_result(*result, level_sim)
        self._futures = pending
        return super().get_finished()


class ThreadPool(ProcessPool):
    """Thread pool for external-binary simulations (reference :326-337)."""

    def __init__(self, n_thread, work_dir=None, debug=False):
        import concurrent.futures

        SamplingPool.__init__(self, work_dir=work_dir, debug=debug)
        self._executor = concurrent.futures.ThreadPoolExecutor(max_workers=n_thread)
        self._futures = []
        self._failed_queues = {}
        self._queues = {}
        self._n_running = 0
        self.times = {}


def _config_equal(a, b):
    """Structural equality of static config dicts (arrays by value)."""
    if a is None or b is None or a.keys() != b.keys():
        return a is b
    for k in a:
        va, vb = a[k], b[k]
        try:
            if isinstance(va, np.ndarray) or isinstance(vb, np.ndarray):
                if not np.array_equal(va, vb):
                    return False
            elif va != vb:
                return False
        except Exception:
            if va is not vb:
                return False
    return True


class DeviceBatchPool(SamplingPool):
    """TPU-native pool: a level's scheduled samples run as ONE device batch.

    Replaces the reference's per-sample process fan-out with data-parallel
    batch evaluation:

    * sample id ``L{l}_S{n}`` -> key ``fold_in(fold_in(root_key, l), n)`` —
      stable and replayable, mirroring the md5(sample_id) scheme,
    * `calculate_batch` jitted once per (level, bucket-size); batches padded
      to power-of-two buckets,
    * failed samples (simulation-raised NaN / injected failures) return to
      the sampler as failed ids; renewals re-run with attempt+1 salt,
    * per-level wall time recorded for the optimal-allocation formula C_l.

    Multi-chip: pass ``mesh_shard`` (see mlmc_tpu.parallel) to shard the
    batch axis across devices with psum-free independent evaluation.
    """

    def __init__(self, work_dir=None, debug=False, seed=0, min_bucket=256,
                 sharding=None, bulk=True, max_batch=65536,
                 device_results=False):
        super().__init__(work_dir=work_dir, debug=debug)
        self._bulk = bulk
        # keep result payloads as DEVICE arrays (pair with DeviceMemory to
        # avoid the host<->device round trip entirely); only the failure
        # mask crosses the link
        self._device_results = bool(device_results)
        self._max_batch = int(max_batch)
        self._root_key = jax.random.key(seed)
        self._pending = {}  # level_id -> list[(index array, attempt array)]
        self._attempts = {}  # level_id -> {index: times scheduled}
        self._level_sims = {}
        self.times = {}
        self._min_bucket = min_bucket
        self._sharding = sharding
        self._jit_cache = {}
        self._warm = set()  # (level, bucket) pairs that already compiled
        self._cold_times = {}  # compile-polluted first-call timings

    # ------------------------------------------------------------------ #
    def sample_key(self, level_id, sample_index):
        return jax.random.fold_in(jax.random.fold_in(self._root_key, level_id), sample_index)

    def schedule_level_batch(self, level_sim, indices, renew=False):
        """Queue a whole index array for one level — the Sampler's O(1)
        dispatch path (no per-sample strings). ``renew=True`` salts each
        index with its retry count so failed samples re-run with fresh
        randomness while staying replayable."""
        level_id = level_sim.level_id
        self._level_sims[level_id] = level_sim
        indices = np.asarray(indices, dtype=np.int64)
        if renew:
            att_map = self._attempts.setdefault(level_id, {})
            attempts = np.empty(len(indices), dtype=np.uint32)
            for k, i in enumerate(indices.tolist()):
                n_prev = att_map.get(i, 1)  # scheduled at least once before
                att_map[i] = n_prev + 1
                attempts[k] = n_prev
        else:
            attempts = np.zeros(len(indices), dtype=np.uint32)
        self._pending.setdefault(level_id, []).append((indices, attempts))

    def schedule_sample(self, sample_id, level_sim):
        from mlmc_tpu.tags import parse_tag

        _, idx = parse_tag(sample_id)
        level_id = level_sim.level_id
        att_map = self._attempts.setdefault(level_id, {})
        attempt = att_map.get(idx, 0)
        att_map[idx] = attempt + 1
        self._level_sims[level_id] = level_sim
        self._pending.setdefault(level_id, []).append(
            (np.array([idx], dtype=np.int64), np.array([attempt], dtype=np.uint32)))

    def have_permanent_samples(self, sample_ids):
        return False

    def n_pending(self):
        return sum(sum(len(seg[0]) for seg in v) for v in self._pending.values())

    def _batch_fn(self, level_id, bucket):
        """jit-compiled batch executable.

        Cached per (level, bucket size); simulations declaring
        ``DYNAMIC_CONFIG`` (level-varying scalar config entries, e.g. the
        fine/coarse steps) share ONE executable per bucket across levels —
        the scalars become traced arguments. Each compile costs 10-30 s
        over a remote-attached chip, so sharing cuts the adaptive loop's
        startup from O(levels x buckets) to O(buckets) compiles.
        """
        level_sim = self._level_sims[level_id]
        config = level_sim.config_dict
        calc_batch = level_sim.calculate_batch
        dyn_names = getattr(level_sim, "dynamic_config", None)
        if dyn_names:
            # structural static differences (is_level0) keep separate keys
            cache_key = ("shared", getattr(level_sim, "shared_token", 0),
                         bucket, bool(config.get("is_level0", False)))
        else:
            cache_key = (level_id, bucket)
        static_cfg = None
        if dyn_names:
            static_cfg = {k: v for k, v in config.items()
                          if k not in dyn_names}
            cached = self._jit_cache.get(cache_key)
            if cached is not None and not _config_equal(cached[1], static_cfg):
                # a level-varying entry was NOT declared in DYNAMIC_CONFIG:
                # sharing would silently bake the first level's value into
                # every level — fall back to a per-level executable
                cache_key = (level_id, bucket)
        if cache_key not in self._jit_cache:
            if dyn_names:
                baked_cfg = dict(static_cfg)

                def fn(dyn_vals, keys, attempts):
                    cfg = dict(baked_cfg)
                    cfg.update(zip(dyn_names, dyn_vals))
                    return calc_batch(cfg, keys, attempts)
            else:
                fn = lambda keys, attempts: calc_batch(config, keys, attempts)
            if self._sharding is not None:
                # data-parallel over the sample mesh: batch axis sharded,
                # XLA partitions the vmapped computation across devices
                in_sh = self._sharding.batch_sharding()
                shardings = ((None, in_sh, in_sh) if dyn_names
                             else (in_sh, in_sh))
                jitted = jax.jit(fn, in_shardings=shardings)
            else:
                jitted = jax.jit(fn)
            self._jit_cache[cache_key] = (jitted, static_cfg)
        fn_c, _ = self._jit_cache[cache_key]
        if dyn_names:
            # dtype follows the enabled precision: float32 on TPU, float64
            # under x64 — a hard f32 cast broke exact-tier bit parity with
            # the static-config pools (review finding)
            dyn_vals = tuple(jnp.asarray(config[k], dtype=float)
                             for k in dyn_names)
            return lambda keys, attempts: fn_c(dyn_vals, keys, attempts)
        return fn_c

    def execute_level(self, level_id):
        """Run all pending samples of one level as padded device batches.

        Batches larger than ``max_batch`` execute in slices so executable
        sizes (compile time, device memory) stay bounded and the bucket
        executables are reused across slices and adaptive rounds.
        """
        segments = self._pending.pop(level_id, None)
        if not segments:
            return {}, {}
        idxs = np.concatenate([seg[0] for seg in segments])
        attempts = np.concatenate([seg[1] for seg in segments])

        succ_all, fail_all = {}, {}
        # when the batch is sliced, every slice (incl. the remainder) uses
        # the max bucket: padding waste is <=1 slice of masked samples,
        # while a fresh remainder-sized bucket costs a 10-30 s remote
        # compile per adaptive round
        force = self._max_batch if len(idxs) > self._max_batch else None
        for start in range(0, len(idxs), self._max_batch):
            s, f = self._run_batch(level_id,
                                   idxs[start:start + self._max_batch],
                                   attempts[start:start + self._max_batch],
                                   force_bucket=force)
            for k, v in s.items():
                if k in succ_all and self._bulk:
                    prev = succ_all[k]
                    # keep device arrays on device when merging slices
                    xp = jnp if isinstance(prev.fine, jax.Array) else np
                    succ_all[k] = BulkResults(
                        prev.ids + v.ids,
                        xp.concatenate([prev.fine, v.fine]),
                        xp.concatenate([prev.coarse, v.coarse]))
                elif k in succ_all:
                    succ_all[k].extend(v)
                else:
                    succ_all[k] = v
            for k, v in f.items():
                fail_all.setdefault(k, []).extend(v)
        return succ_all, fail_all

    def _run_batch(self, level_id, idxs, attempts, force_bucket=None):
        """One padded device batch: keys from (level, index, attempt)."""
        from mlmc_tpu.tags import TagArray, format_tags

        level_sim = self._level_sims[level_id]
        n = len(idxs)
        bucket = force_bucket or _round_up_bucket(n, self._min_bucket)
        if self._sharding is not None:
            # bucket must tile evenly over the mesh's sample axis
            d = self._sharding.n_devices
            bucket = -(-bucket // d) * d

        idxs = idxs.astype(np.uint32)
        # pad to bucket with repeats of the last sample (discarded later)
        pad = bucket - n
        idxs_p = np.concatenate([idxs, np.full(pad, idxs[-1] if n else 0, dtype=np.uint32)])
        att_p = np.concatenate([attempts, np.zeros(pad, dtype=np.uint32)])

        level_key = jax.random.fold_in(self._root_key, level_id)
        keys = jax.vmap(lambda i: jax.random.fold_in(level_key, i))(jnp.asarray(idxs_p))

        # build the executable wrapper BEFORE the timed region; whether
        # the first call of this (key, bucket) still compiles is tracked so
        # compile time never pollutes the C_l cost model (a remote AOT
        # compile costs 10-30 s vs milliseconds of sample compute)
        fn = self._batch_fn(level_id, bucket)
        warm_key = (level_id, bucket)
        first_call = warm_key not in self._warm
        self._warm.add(warm_key)

        t0 = time.perf_counter()
        fine, coarse, failed = fn(keys, jnp.asarray(att_p))
        nan_fails = getattr(level_sim, "nan_result_is_failure", True)
        if self._device_results:
            # payload stays in HBM; only the [n]-bool mask crosses the link
            fine = fine[:n]
            coarse = coarse[:n]
            if nan_fails:
                failed = failed[:n] | jnp.any(jnp.isnan(fine), axis=1) \
                    | jnp.any(jnp.isnan(coarse), axis=1)
            failed = np.asarray(failed[:n])
            elapsed = time.perf_counter() - t0
        else:
            # timing must include a device->host TRANSFER: over the remote
            # tunnel block_until_ready acknowledges enqueue only (CLAUDE.md)
            fine = np.asarray(fine)[:n]
            elapsed = time.perf_counter() - t0
            coarse = np.asarray(coarse)[:n]
            failed = np.asarray(failed)[:n]
            if nan_fails:
                # parity with simulations that raise on NaN (SynthSimulation);
                # sims with NaN-as-QoI (shooting) store NaNs and mask later
                failed = failed | np.any(np.isnan(fine), axis=1) \
                    | np.any(np.isnan(coarse), axis=1)

        ok = ~failed
        failed_out = [(sid, "result is nan")
                      for sid in format_tags(level_id, idxs[failed]).tolist()]
        if self._bulk and not failed_out:
            # common case (no failures): skip the filtering gathers — on a
            # remote-attached device each variable-shape gather pays a
            # fresh compile (~1 s/slice measured)
            successful = BulkResults(TagArray(level_id, idxs), fine, coarse)
        elif self._bulk:
            ok_ids = TagArray(level_id, idxs[ok])
            successful = BulkResults(ok_ids, fine[ok], coarse[ok]) \
                if len(ok_ids) else []
        else:
            ok_pos = np.flatnonzero(ok)
            ok_ids = format_tags(level_id, idxs[ok_pos]).tolist()
            successful = [(sid, (fine[i], coarse[i]))
                          for sid, i in zip(ok_ids, ok_pos)]

        n_ok = int(np.count_nonzero(ok))
        if level_id not in self.times:
            self.times[level_id] = [0, 0]
        if n_ok:
            # charge wall time only to successful samples (reference
            # semantics). The first call per (level, bucket) includes the
            # XLA compile (10-30 s remote vs ms of compute), so cold calls
            # accumulate separately and only stand in for C_l until the
            # first warm measurement arrives.
            target = self.times[level_id] if not first_call \
                else self._cold_times.setdefault(level_id, [0, 0])
            target[0] += elapsed * n_ok / max(n, 1)
            target[1] += n_ok
        return ({level_id: successful} if n_ok else {}), (
            {level_id: failed_out} if failed_out else {}
        )

    def get_finished(self):
        successful = {}
        failed = {}
        for level_id in sorted(list(self._pending.keys())):
            s, f = self.execute_level(level_id)
            successful.update(s)
            failed.update(f)
        # warm (compile-free) timings win; compile-polluted cold timings
        # only stand in while a level has no warm measurement yet
        times = {lvl: list(t) for lvl, t in self._cold_times.items()}
        for lvl, t in self.times.items():
            if t[1]:
                times[lvl] = list(t)
        return successful, failed, self.n_pending(), list(times.items())
