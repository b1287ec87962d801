"""Quantity algebra suite — mirrors reference test/test_quantity_concept.py
(test_basics :32, test_binary_operations :177, test_condition :265,
test_functions :373, test_quantity_const :434, test_moments :526).
"""
import numpy as np
import pytest
import scipy.stats as stats

from mlmc_tpu import Memory, SampleStorageHDF, Sampler, DeviceBatchPool, Monomial
from mlmc_tpu.quantity.quantity import (
    Quantity, QuantityConst, make_root_quantity)
from mlmc_tpu.quantity.quantity_estimate import (
    estimate_mean, moments, moment, covariance, cache_clear)
from mlmc_tpu.quantity.quantity_spec import QuantitySpec
from mlmc_tpu.quantity.quantity_types import ScalarType
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.sim.synth_simulation import SynthSimulation
from mlmc_tpu.random.distributions import Norm


def fill_sample_storage(sample_storage):
    np.random.seed(123)
    n_levels = 3
    result_format = [
        QuantitySpec(name="depth", unit="mm", shape=(2, 2), times=[1, 2, 3],
                     locations=["30", "40"]),
        QuantitySpec(name="length", unit="m", shape=(2, 3), times=[1, 2, 3],
                     locations=["10", "20"]),
        QuantitySpec(name="width", unit="mm", shape=(2, 4), times=[1, 2, 3],
                     locations=["30", "40"]),
    ]
    sample_storage.save_global_data(result_format=result_format,
                                    level_parameters=np.ones((n_levels, 1)))
    sizes = [int(np.prod(q.shape) * len(q.times) * len(q.locations))
             for q in result_format]
    M = int(np.sum(sizes))

    successful = {}
    n_successful = 150
    for l_id in range(n_levels):
        successful[l_id] = []
        for sample_id in range(n_successful):
            fine = np.random.randint(5 + 5 * sample_id, 5 + 5 * (1 + sample_id),
                                     size=(M,)).astype(float)
            coarse = (np.zeros(M) if l_id == 0 else
                      np.random.randint(5 + 5 * sample_id, 5 + 5 * (1 + sample_id),
                                        size=(M,)).astype(float))
            successful[l_id].append((str(sample_id), (fine, coarse)))
        sample_storage.save_scheduled_samples(
            l_id, ["S{:07d}".format(i) for i in range(n_successful)])
    sample_storage.save_samples(successful, {})
    sample_storage.save_n_ops([(l, [0.5, n_successful]) for l in range(n_levels)])
    return result_format, sizes


@pytest.fixture(params=["memory", "hdf"])
def storage(request, tmp_path):
    if request.param == "memory":
        return Memory()
    return SampleStorageHDF(file_path=str(tmp_path / "quantity.hdf5"))


def test_basics(storage):
    result_format, sizes = fill_sample_storage(storage)
    root_quantity = make_root_quantity(storage, result_format)

    means = estimate_mean(root_quantity)
    assert len(means.mean) == np.sum(sizes)

    quantity_add = root_quantity + root_quantity
    means_add = estimate_mean(quantity_add)
    assert np.allclose(means.mean + means.mean, means_add.mean)

    length = root_quantity["length"]
    means_length = estimate_mean(length)
    assert np.allclose(means.mean[sizes[0]:sizes[0] + sizes[1]], means_length.mean)

    length_add = quantity_add["length"]
    assert np.allclose(estimate_mean(length_add).mean, means_length.mean * 2)

    depth = root_quantity["depth"]
    means_depth = estimate_mean(depth)
    assert np.allclose(means.mean[:sizes[0]], means_depth.mean)

    # time interpolation
    locations = length.time_interpolation(2.5)
    mean_interp_value = estimate_mean(locations)
    position = locations["10"]
    mean_position_1 = estimate_mean(position)
    assert np.allclose(mean_interp_value.mean[:len(mean_interp_value.mean) // 2],
                       mean_position_1.mean.flatten())

    # array indexing
    values_mean = estimate_mean(position)
    assert values_mean[1:2].mean.shape == (1, 3)
    assert values_mean[1].mean.shape == (3,)
    assert len(estimate_mean(position[:, 2]).mean) == 2
    assert len(estimate_mean(position[1, 2]).mean) == 1
    assert np.allclose(estimate_mean(position[:, :]).mean, mean_position_1.mean)
    assert len(estimate_mean(position[:1, 1:2]).mean) == 1
    assert len(estimate_mean(position[:2, ...]).mean.flatten()) == 6

    values = position[:, 2]
    values_mean = estimate_mean(values)
    assert values_mean.mean[1] == estimate_mean(values[1]).mean
    assert values_mean.mean[0] == estimate_mean(values[0]).mean

    position2 = locations["20"]
    mean_position_2 = estimate_mean(position2)
    assert np.allclose(mean_interp_value.mean[len(mean_interp_value.mean) // 2:],
                       mean_position_2.mean.flatten())

    width = root_quantity["width"]
    width_locations = width.time_interpolation(1.2)
    mean_width_interp = estimate_mean(width_locations)
    w1 = estimate_mean(width_locations["30"])
    w2 = estimate_mean(width_locations["40"])
    assert np.allclose(mean_width_interp.mean[:len(mean_width_interp.mean) // 2],
                       w1.mean.flatten())
    assert np.allclose(mean_width_interp.mean[len(mean_width_interp.mean) // 2:],
                       w2.mean.flatten())

    # structured constructors
    quantity_dict = Quantity.QDict([("depth", depth), ("length", length)])
    qd_mean = estimate_mean(quantity_dict)
    assert np.allclose(qd_mean.mean,
                       np.concatenate((means_depth.mean, means_length.mean)))

    length_concat = quantity_dict["length"]
    assert np.allclose(estimate_mean(length_concat).mean, means_length.mean)
    locations_c = length_concat.time_interpolation(2.5)
    mi = estimate_mean(locations_c)
    p1 = estimate_mean(locations_c["10"])
    assert np.allclose(mi.mean[:len(mi.mean) // 2], p1.mean.flatten())
    y = locations_c["10"][1, 2]
    y_mean = estimate_mean(y)
    y_add = np.add(5, y)
    assert np.allclose(estimate_mean(y_add).mean, y_mean.mean + 5)
    assert np.allclose(estimate_mean(quantity_dict["depth"]).mean, means_depth.mean)

    quantity_array = Quantity.QArray([[length, length], [length, length]])
    qa_mean = estimate_mean(quantity_array)
    assert np.allclose(qa_mean.mean.flatten(), np.tile(means_length.mean, 4))

    quantity_ts = Quantity.QTimeSeries([(0, locations), (1, locations)])
    ts_mean = estimate_mean(quantity_ts)
    assert np.allclose(ts_mean.mean, np.tile(mean_interp_value.mean, 2))

    quantity_field = Quantity.QField([("f1", length), ("f2", length)])
    qf_mean = estimate_mean(quantity_field)
    assert np.allclose(qf_mean.mean, np.tile(means_length.mean, 2))


def test_binary_operations(storage):
    result_format, sizes = fill_sample_storage(storage)
    root_quantity = make_root_quantity(storage, result_format)
    const = 5

    means = estimate_mean(root_quantity)
    means_add = estimate_mean(root_quantity + root_quantity)
    assert np.allclose(means.mean + means.mean, means_add.mean)

    means_add_const = estimate_mean(root_quantity + const)
    assert np.allclose(means_add_const.mean, means.mean + const)

    means_add3 = estimate_mean(root_quantity + root_quantity + root_quantity)
    assert np.allclose(3 * means.mean, means_add3.mean)

    means_sub_const = estimate_mean(root_quantity - const)
    assert np.allclose(means_sub_const.mean, means.mean - const)

    assert np.allclose(estimate_mean(root_quantity * const).mean, const * means.mean)
    assert np.allclose(estimate_mean(root_quantity / const).mean, means.mean / const)
    estimate_mean(root_quantity % const)  # mod runs

    quantity_add = root_quantity + root_quantity
    means_add = estimate_mean(quantity_add)
    assert np.allclose(means_add.mean[sizes[0]:sizes[0] + sizes[1]],
                       estimate_mean(quantity_add["length"]).mean)
    assert np.allclose(
        means_add.mean[sizes[0] + sizes[1]:],
        estimate_mean(quantity_add["width"]).mean)

    assert np.allclose(estimate_mean(root_quantity + root_quantity * const).mean,
                       means.mean + means.mean * const)
    estimate_mean(root_quantity + root_quantity * root_quantity)

    # right operators
    assert np.allclose(estimate_mean(const + root_quantity).mean, means_add_const.mean)
    assert np.allclose(estimate_mean(const - root_quantity).mean, -means_sub_const.mean)
    assert np.allclose(estimate_mean(const * root_quantity).mean, const * means.mean)
    assert len(estimate_mean(const / root_quantity).mean) == len(means.mean)
    assert len(estimate_mean(const % root_quantity).mean) == len(means.mean)


def test_condition(storage):
    result_format, sizes = fill_sample_storage(storage)
    root_quantity = make_root_quantity(storage, result_format)
    root_quantity_mean = estimate_mean(root_quantity)

    all_q = root_quantity.select(np.logical_or(0 < root_quantity, root_quantity < 10))
    assert np.allclose(root_quantity_mean.mean, estimate_mean(all_q).mean)

    with pytest.raises(Exception):
        estimate_mean(root_quantity.select(root_quantity < 0))

    all_q = root_quantity.select(0 < root_quantity)
    assert np.allclose(root_quantity_mean.mean, estimate_mean(all_q).mean)

    eq_q = root_quantity.select(root_quantity == root_quantity)
    assert np.allclose(root_quantity_mean.mean, estimate_mean(eq_q).mean)

    with pytest.raises(Exception):
        estimate_mean(root_quantity.select(root_quantity < root_quantity))

    mask = np.logical_and(0 < root_quantity, root_quantity < 10)
    mean_q_bounded = estimate_mean(root_quantity.select(mask))
    mean_q_bounded_2 = estimate_mean(
        root_quantity.select(0 < root_quantity, root_quantity < 10))
    assert np.allclose(mean_q_bounded.mean, mean_q_bounded_2.mean)

    quantity_add = root_quantity + root_quantity
    means_add_bounded = estimate_mean(
        quantity_add.select(0 < quantity_add, quantity_add < 20))
    assert np.allclose(means_add_bounded.mean, mean_q_bounded_2.mean * 2)

    mean_q_bounded_next = estimate_mean(
        root_quantity.select(10 < root_quantity, root_quantity < 20))
    means_add_bounded_2 = estimate_mean(
        quantity_add.select(20 < quantity_add, quantity_add < 40))
    assert np.allclose(means_add_bounded_2.mean, mean_q_bounded_next.mean * 2)

    means_3 = estimate_mean(quantity_add.select(root_quantity < quantity_add))
    assert len(means_3.mean) == len(root_quantity_mean.mean)

    with pytest.raises(Exception):
        estimate_mean(quantity_add.select(root_quantity > quantity_add))

    means_5 = estimate_mean(
        quantity_add.select(root_quantity < quantity_add, root_quantity < 10))
    assert len(means_5.mean) == len(mean_q_bounded.mean)

    length = root_quantity["length"]
    mean_length = estimate_mean(length)
    means_lt = estimate_mean(length.select(length < 10))  # just first sample
    assert len(mean_length.mean) == len(means_lt.mean)

    with pytest.raises(Exception):
        estimate_mean(quantity_add.select(root_quantity < quantity_add, length < 1))

    means_7 = estimate_mean(
        quantity_add.select(root_quantity < quantity_add, length < 10))
    assert np.allclose(means_7.mean, means_add_bounded.mean)

    means_le = estimate_mean(length.select(length <= 9))
    assert len(mean_length.mean) == len(means_le.mean)

    with pytest.raises(Exception):
        estimate_mean(length.select(length < 1))  # nothing matches

    means_lt_gt = estimate_mean(length.select(9 < length, length < 20))
    assert len(mean_length.mean) == len(means_lt_gt.mean)

    with pytest.raises(Exception):
        estimate_mean(length.select(10 ** 5 < length))
    with pytest.raises(Exception):
        estimate_mean(length.select(10 ** 5 <= length))
    with pytest.raises(Exception):
        estimate_mean(length.select(1 == length))

    means_ne = estimate_mean(length.select(-1 != length))
    assert np.allclose(means_ne.mean, mean_length.mean)


def test_functions(storage):
    result_format, sizes = fill_sample_storage(storage)
    root_quantity = make_root_quantity(storage, result_format)
    root_means = estimate_mean(root_quantity)
    M = int(np.sum(sizes))

    max_means = estimate_mean(np.max(root_quantity, axis=0, keepdims=True))
    assert len(max_means.mean) == 1

    sin_means = estimate_mean(np.sin(root_quantity))
    assert len(sin_means.mean) == M

    sum_means = estimate_mean(np.sum(root_quantity, axis=0, keepdims=True))
    assert len(sum_means.mean) == 1

    add_means = estimate_mean(np.add(root_quantity, root_quantity))
    assert np.allclose(add_means.mean.flatten(), root_means.mean * 2)

    x = np.ones(M)
    add_one = estimate_mean(np.add(x, root_quantity))
    assert np.allclose(root_means.mean + 1, add_one.mean.flatten())

    div_one = estimate_mean(np.divide(x, root_quantity))
    assert np.all(div_one.mean < 1)

    atan2 = estimate_mean(np.arctan2(x, root_quantity))
    assert np.all(atan2.mean < 1)

    max_el = estimate_mean(np.maximum(root_quantity, root_quantity))
    assert np.allclose(max_el.mean.flatten(), root_means.mean)

    length = root_quantity["length"]
    sin_length = estimate_mean(np.sin(length))
    assert np.allclose(sin_means.mean[sizes[0]:sizes[0] + sizes[1]], sin_length.mean)

    q_and = np.logical_and(True, root_quantity)
    with pytest.raises(TypeError):
        estimate_mean(q_and)

    cache_clear()
    x = np.ones((M, 5, 2))
    with pytest.raises(ValueError):
        np.add(x, root_quantity)
    with pytest.raises(ValueError):
        np.divide(x, root_quantity)


def test_quantity_const():
    x = QuantityConst(ScalarType(), 5)
    y = QuantityConst(ScalarType(), 10)
    z = x + y
    assert isinstance(z, QuantityConst)


def test_moments_through_dag():
    """Moments/covariance via the DAG + subsample statistics
    (reference test_moments :526-648, lighter subsample loop)."""
    np.random.seed(1234)
    n_moments = 3
    distr = Norm()
    sim = SynthSimulation(dict(distr=distr, complexity=2))
    storage = Memory()
    level_params = est_mod.determine_level_parameters(3, [0.5, 0.01])
    sampler = Sampler(storage, DeviceBatchPool(seed=2, min_bucket=32),
                      sim, level_params)
    true_domain = distr.ppf([0.0001, 0.9999])
    moments_fn = Monomial(n_moments, true_domain)

    sampler.set_initial_n_samples([100, 60, 15])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    root_quantity = make_root_quantity(storage, q_specs=sim.result_format())
    root_quantity_mean = estimate_mean(root_quantity)

    estimator = est_mod.Estimate(root_quantity, storage, moments_fn)
    target_var = 1e-2
    variances, n_ops = estimator.estimate_diff_vars_regression(
        sampler._n_scheduled_samples)
    n_estimated = est_mod.estimate_n_samples_for_target_variance(
        target_var, variances, n_ops, n_levels=sampler.n_levels)
    while not sampler.process_adding_samples(n_estimated, 0, 0.1):
        variances, n_ops = estimator.estimate_diff_vars_regression(
            sampler._n_scheduled_samples)
        n_estimated = est_mod.estimate_n_samples_for_target_variance(
            target_var, variances, n_ops, n_levels=sampler.n_levels)

    # mom_at_bottom=True
    moments_quantity = moments(root_quantity, moments_fn=moments_fn,
                               mom_at_bottom=True)
    moments_mean = estimate_mean(moments_quantity)
    values_mean = moments_mean["length"][1]["10"][0]
    # tolerance = 5 sigma of the target variance (the reference's atol=1e-2
    # only holds for its specific RNG stream)
    assert np.allclose(values_mean.mean[:2], [1, 0.5],
                       atol=5 * np.sqrt(target_var))
    assert np.all(values_mean.var < target_var)

    new_moments_mean = estimate_mean(moments_quantity + moments_quantity)
    assert np.allclose(moments_mean.mean + moments_mean.mean, new_moments_mean.mean)

    # mom_at_bottom=False
    moments_mean2 = estimate_mean(
        moments(root_quantity, moments_fn=moments_fn, mom_at_bottom=False))
    assert np.allclose(
        values_mean.mean,
        [moments_mean2[0].mean[0], moments_mean2[1].mean[0], moments_mean2[2].mean[0]],
        atol=1e-4)

    # central moments
    central_q = root_quantity - root_quantity_mean.mean
    monomial_fn = Monomial(n_moments, domain=true_domain, ref_domain=true_domain)
    central_mean = estimate_mean(
        moments(central_q, moments_fn=monomial_fn, mom_at_bottom=True))
    central_value_mean = central_mean["length"][1]["10"][0]
    assert np.isclose(central_value_mean.mean[0], 1, atol=1e-10)
    assert np.isclose(central_value_mean.mean[1], 0, atol=1e-2)

    # covariance
    cov_mean_q = estimate_mean(
        covariance(root_quantity, moments_fn=moments_fn, cov_at_bottom=True))
    cov_mean = cov_mean_q["length"][1]["10"][0]
    assert np.allclose(values_mean.mean, cov_mean.mean[:, 0])

    # single moment
    mom_mean = estimate_mean(moment(root_quantity, moments_fn=moments_fn, i=0))
    assert len(mom_mean["length"][1]["10"][0].mean) == 1

    # subsample statistics
    n_iter = 200
    chunks_means, chunks_vars, chunks_subsamples = [], [], []
    for _ in range(n_iter):
        sub_q = root_quantity.subsample([30, 15, 10])
        sub_mean = estimate_mean(
            moments(sub_q, moments_fn=moments_fn, mom_at_bottom=True))
        v = sub_mean["length"][1]["10"][0]
        chunks_means.append(v.mean)
        chunks_vars.append(v.var)
        chunks_subsamples.append(v.n_samples)
    assert np.allclose(np.mean(chunks_subsamples, axis=0), [30, 15, 10], rtol=0.5)
    assert np.allclose(np.mean(chunks_means, axis=0), values_mean.mean, atol=1e-2)


def test_mask_equals_select_estimates():
    """mask (traceable NaN-poisoning) gives the same estimates as select
    (row removal), while keeping the DAG fusable."""
    import numpy as np
    import mlmc_tpu.quantity.quantity_estimate as qe
    from mlmc_tpu import (Memory, SynthSimulation, DeviceBatchPool, Sampler,
                          Legendre, make_root_quantity)

    sim = SynthSimulation(dict(distr="norm", complexity=2))
    storage = Memory()
    sampler = Sampler(storage, DeviceBatchPool(seed=9, min_bucket=64), sim,
                      [[0.1], [0.01]])
    sampler.set_initial_n_samples([300, 100])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    root = make_root_quantity(storage, sim.result_format())
    expr = np.sin(root["length"][1]["10"]) * 2.0
    cond = expr < 0.5
    mfn = Legendre(5, (-4, 4))

    m_sel = qe.estimate_mean(qe.moments(expr.select(cond), mfn))
    m_msk = qe.estimate_mean(qe.moments(expr.mask(cond), mfn))
    assert np.allclose(np.asarray(m_sel.mean), np.asarray(m_msk.mean),
                       atol=1e-12)
    assert np.allclose(np.asarray(m_sel.var), np.asarray(m_msk.var),
                       atol=1e-12)
    assert list(m_sel.n_samples) == list(m_msk.n_samples)
    # and the masked DAG is traceable (fusable) while select is not
    assert expr.mask(cond).traceable()
    assert not expr.select(cond).traceable()


def test_fused_path_pad_not_laundered_by_ufuncs():
    """Review regression: the fused estimator pads chunks with NaN columns;
    a DAG with a non-NaN-propagating ufunc (fmax maps NaN -> finite) must
    NOT count pad columns as valid samples. Pad exclusion is positional,
    so eager (<8192 samples) and fused paths agree exactly."""
    import mlmc_tpu.quantity.quantity_estimate as qe
    from mlmc_tpu.quantity.quantity import make_root_quantity
    from mlmc_tpu import Memory, QuantitySpec

    spec = [QuantitySpec(name="v", unit="", shape=(1, 1), times=[0],
                         locations=["s"])]

    def fill(n0, n1):
        st = Memory()
        st.save_global_data(result_format=spec, level_parameters=[[0.5], [0.25]])
        rng = np.random.default_rng(0)
        for lvl, n in enumerate([n0, n1]):
            vals = rng.normal(size=n)
            rows = [("L{:02d}_S{:07d}".format(lvl, i),
                     (np.array([v]), np.array([v * 0.9])))
                    for i, v in enumerate(vals)]
            st.save_samples({lvl: rows}, {})
        return st

    # 9000 samples > 8192 -> fused path; 8999 is NOT a pow2 -> real padding
    st_big = fill(8999, 3000)
    root = make_root_quantity(st_big, q_specs=spec)
    q = np.fmax(root["v"][0]["s"][0, 0], -10.0)   # fmax(NaN, c) == c !
    assert q.traceable()
    m_fused = qe.estimate_mean(q)
    assert list(m_fused.n_samples) == [8999, 3000]      # no phantom samples
    assert list(m_fused.n_rm_samples) == [0, 0]         # and none negative

    # small storage (eager path) with the same draws must agree exactly
    st_small = fill(8999, 3000)
    st_small._chunk_size = None
    root2 = make_root_quantity(st_small, q_specs=spec)
    q2 = np.fmax(root2["v"][0]["s"][0, 0], -10.0)
    # force the eager path despite the volume: break traceability
    q2._traceable = False
    m_eager = qe.estimate_mean(q2)
    assert np.allclose(m_fused.mean, m_eager.mean, atol=1e-12)
    assert np.allclose(m_fused.l_vars, m_eager.l_vars, atol=1e-12)


def test_single_dispatch_estimate_parity():
    """The single-dispatch tier (whole estimate in ONE device program) must
    reproduce the chunked path exactly: means, vars, counts, NaN masking."""
    storage = Memory(chunk_size=64)  # many chunks per level on the slow path
    fill_sample_storage(storage)
    # poison a few samples per level with NaNs (mask_nan semantics)
    M = sum(int(np.prod(q.shape) * len(q.times) * len(q.locations))
            for q in storage.load_result_format())
    poisoned = {}
    for l_id in range(3):
        bad_fine = np.full(M, np.nan)
        poisoned[l_id] = [("P%07d" % k, (bad_fine, np.zeros(M)))
                         for k in range(3)]
    storage.save_samples(poisoned, {})

    root = make_root_quantity(storage, storage.load_result_format())
    expr = np.sin(root["length"][1]["10"]) * 2.0 + root["length"][2]["20"] / 3.0
    mq = moments(expr, Monomial(5, (0, 60)))
    assert mq.traceable()

    ref = estimate_mean(mq, single_dispatch=False)
    fast = estimate_mean(mq, single_dispatch=True)
    assert list(fast.n_samples) == list(ref.n_samples)
    assert list(fast.n_rm_samples) == list(ref.n_rm_samples)
    assert np.allclose(fast.mean, ref.mean, rtol=1e-12, atol=1e-13)
    assert np.allclose(fast.var, ref.var, rtol=1e-10, atol=1e-13)
    assert np.allclose(fast.l_means, ref.l_means, rtol=1e-12, atol=1e-13)
    assert np.allclose(fast.l_vars, ref.l_vars, rtol=1e-10, atol=1e-13)

    # the auto heuristic picks the single-dispatch tier past the threshold
    import mlmc_tpu.quantity.quantity_estimate as qe_mod
    assert mq.get_quantity_storage().payload_resident()
