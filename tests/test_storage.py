"""Storage round-trip matrix (mirrors reference test/test_storage.py:47-94
and test/test_hdf.py): {memory, hdf} x n_levels, write successful + failed
samples, read back sample_pairs / formats / n_ops; HDF reopen-and-append
covers resume.
"""
import numpy as np
import pytest

from mlmc_tpu.sample_storage import Memory
from mlmc_tpu.sample_storage_hdf import SampleStorageHDF
from mlmc_tpu.quantity.quantity_spec import QuantitySpec, ChunkSpec


def _make_storage(kind, tmp_path, name="st.hdf5"):
    if kind == "memory":
        return Memory()
    if kind == "bin":
        from mlmc_tpu.sample_storage_bin import SampleStorageBin

        return SampleStorageBin(dir_path=str(tmp_path / "binstore"))
    return SampleStorageHDF(file_path=str(tmp_path / name))


def _result_format():
    return [
        QuantitySpec(name="length", unit="m", shape=(2, 1), times=[1, 2, 3],
                     locations=["10", "20"]),
        QuantitySpec(name="width", unit="mm", shape=(2, 1), times=[1, 2, 3],
                     locations=["30", "40"]),
    ]


def _fill(storage, n_levels, rng, n=13, start=0):
    fmt = _result_format()
    M = int(sum(np.prod(q.shape) * len(q.times) * len(q.locations) for q in fmt))
    successful = {}
    failed = {}
    for lvl in range(n_levels):
        res = []
        for i in range(n):
            fine = rng.normal(size=M)
            coarse = np.zeros(M) if lvl == 0 else rng.normal(size=M)
            res.append(("L{:02d}_S{:07d}".format(lvl, start + i), (fine, coarse)))
        successful[lvl] = res
        failed[lvl] = [("L{:02d}_S{:07d}".format(lvl, start + n), "err msg")]
    storage.save_samples(successful, failed)
    return successful


@pytest.mark.parametrize("kind", ["memory", "hdf", "bin"])
@pytest.mark.parametrize("n_levels", [1, 2, 5])
def test_storage_roundtrip(tmp_path, kind, n_levels):
    rng = np.random.default_rng(123)
    storage = _make_storage(kind, tmp_path)
    level_params = [[0.5 ** (l + 1)] for l in range(n_levels)]
    storage.save_global_data(result_format=_result_format(),
                             level_parameters=level_params)

    for lvl in range(n_levels):
        storage.save_scheduled_samples(
            lvl, ["L{:02d}_S{:07d}".format(lvl, i) for i in range(14)])
    successful = _fill(storage, n_levels, rng)

    # formats
    fmt = storage.load_result_format()
    assert [q.name for q in fmt] == ["length", "width"]
    assert list(fmt[0].times) == [1, 2, 3]
    assert fmt[0].locations == ["10", "20"] or tuple(fmt[0].locations) == ("10", "20")

    # level params
    assert np.allclose(np.asarray(storage.get_level_parameters(), dtype=float),
                       np.asarray(level_params))

    # sample pairs: [M, N, 2], level 0 stripped to [M, N, 1]
    pairs = storage.sample_pairs()
    assert len(pairs) == n_levels
    M = successful[0][0][1][0].size
    assert pairs[0].shape == (M, 13, 1)
    for lvl in range(1, n_levels):
        assert pairs[lvl].shape == (M, 13, 2)
        fine_expected = successful[lvl][0][1][0]
        assert np.allclose(pairs[lvl][:, 0, 0], fine_expected)

    # counters
    assert storage.get_n_levels() == n_levels
    assert storage.get_n_collected() == [13] * n_levels
    assert np.all(storage.n_finished() == 14)  # 13 ok + 1 failed

    # failed bookkeeping + renew
    failed = storage.failed_samples()
    assert all(len(v) == 1 for v in failed.values())
    storage.clear_failed()
    assert all(len(v) == 0 for v in storage.failed_samples().values())

    # unfinished = scheduled - finished (1 failed cleared is still finished
    # for hdf? reference clears failed from failed dataset -> becomes
    # unfinished again); memory backend returns [] by design
    unfinished = storage.unfinished_ids()
    assert isinstance(unfinished, list)

    # n_ops accounting
    storage.save_n_ops([(lvl, [2.0, 10]) for lvl in range(n_levels)])
    n_ops = storage.get_n_ops()
    assert np.allclose(n_ops, 0.2)

    # chunked reads concatenate to the full level
    for lvl in range(n_levels):
        chunks = [storage.sample_pairs_level(cs) for cs in storage.chunks(level_id=lvl)]
        whole = np.concatenate(chunks, axis=1)
        assert whole.shape[1] == 13


def test_hdf_append_resume(tmp_path):
    """Close, reopen, append — the resume path (reference test_hdf_append)."""
    rng = np.random.default_rng(7)
    path = tmp_path / "resume.hdf5"
    storage = SampleStorageHDF(file_path=str(path))
    storage.save_global_data(result_format=_result_format(),
                             level_parameters=[[0.5], [0.25]])
    _fill(storage, 2, rng, n=5)
    storage.close()

    # reopen: schema + data must be there, appends must extend
    storage2 = SampleStorageHDF(file_path=str(path))
    assert storage2.get_n_collected() == [5, 5]
    fmt = storage2.load_result_format()
    assert [q.name for q in fmt] == ["length", "width"]
    _fill(storage2, 2, rng, n=3, start=100)
    assert storage2.get_n_collected() == [8, 8]
    pairs = storage2.sample_pairs()
    assert pairs[1].shape[1] == 8

    # result-format guard: incompatible format must be refused
    bad_fmt = [QuantitySpec(name="other", unit="m", shape=(1, 1), times=[1],
                            locations=["1"])]
    with pytest.raises(ValueError):
        storage2.save_result_format(bad_fmt)
    storage2.close()


def test_hdf_end_to_end_with_sampler(tmp_path):
    """Full adaptive run against HDF storage + device pool."""
    from mlmc_tpu import SynthSimulation, DeviceBatchPool, Sampler, Legendre
    from mlmc_tpu import estimator as est_mod
    from mlmc_tpu.quantity.quantity import make_root_quantity
    from mlmc_tpu.random.distributions import Norm

    distr = Norm()
    sim = SynthSimulation(dict(distr=distr, complexity=2))
    storage = SampleStorageHDF(file_path=str(tmp_path / "e2e.hdf5"))
    sampler = Sampler(storage, DeviceBatchPool(seed=3), sim, [[0.1], [0.01]])
    sampler.set_initial_n_samples([200, 50])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    value_q = quantity["length"][1]["10"][0]
    mfn = Legendre(5, distr.ppf([0.001, 0.999]))
    est = est_mod.Estimate(value_q, storage, mfn)
    means, variances = est.estimate_moments(mfn)
    assert means[0] == 1
    assert variances[0] == 0
    assert abs(means[1]) < 0.2
    storage.close()


def test_bin_storage_resume(tmp_path):
    """Native binary storage: close, reopen, append (resume)."""
    from mlmc_tpu.sample_storage_bin import SampleStorageBin

    rng = np.random.default_rng(5)
    path = str(tmp_path / "bin_resume")
    st = SampleStorageBin(dir_path=path)
    st.save_global_data(result_format=_result_format(),
                        level_parameters=[[0.5], [0.25]])
    _fill(st, 2, rng, n=7)
    st.close()

    st2 = SampleStorageBin(dir_path=path)
    assert st2.get_n_collected() == [7, 7]
    assert [q.name for q in st2.load_result_format()] == ["length", "width"]
    _fill(st2, 2, rng, n=4, start=100)
    assert st2.get_n_collected() == [11, 11]
    pairs = st2.sample_pairs()
    assert pairs[1].shape[1] == 11
    st2.close()


def test_bin_storage_end_to_end(tmp_path):
    from mlmc_tpu.sample_storage_bin import SampleStorageBin
    from mlmc_tpu import SynthSimulation, DeviceBatchPool, Sampler, Legendre
    from mlmc_tpu import estimator as est_mod
    from mlmc_tpu.quantity.quantity import make_root_quantity
    from mlmc_tpu.random.distributions import Norm

    distr = Norm()
    sim = SynthSimulation(dict(distr=distr, complexity=2))
    storage = SampleStorageBin(dir_path=str(tmp_path / "bin_e2e"))
    sampler = Sampler(storage, DeviceBatchPool(seed=3), sim, [[0.1], [0.01]])
    sampler.set_initial_n_samples([200, 50])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    value_q = quantity["length"][1]["10"][0]
    mfn = Legendre(5, distr.ppf([0.001, 0.999]))
    means, variances = est_mod.Estimate(value_q, storage, mfn).estimate_moments(mfn)
    assert means[0] == 1 and variances[0] == 0
    storage.close()


def test_device_memory_storage():
    """HBM-resident DeviceMemory + device_results pool produce identical
    estimates and bookkeeping to the host Memory path."""
    import numpy as np
    import mlmc_tpu.quantity.quantity_estimate as qe
    from mlmc_tpu import (Memory, DeviceMemory, SynthSimulation,
                          DeviceBatchPool, Sampler, Legendre,
                          make_root_quantity)

    res = []
    for storage, pool in [
            (Memory(), DeviceBatchPool(seed=4, min_bucket=64)),
            (DeviceMemory(), DeviceBatchPool(seed=4, min_bucket=64,
                                             device_results=True))]:
        sim = SynthSimulation(dict(distr="norm", complexity=2,
                                   nan_fraction=0.05))
        s = Sampler(storage, pool, sim, [[0.1], [0.01]])
        s.set_initial_n_samples([200, 100])
        s.schedule_samples()
        s.ask_sampling_pool_for_samples()
        root = make_root_quantity(storage, sim.result_format())
        q = root["length"][1]["10"][0]
        m = qe.estimate_mean(qe.moments(q, Legendre(5, (-4, 4))))
        res.append((np.asarray(m.mean), list(m.n_samples),
                    storage.get_n_collected(),
                    {k: list(v) for k, v in storage.failed_samples().items()}))
    assert np.allclose(res[0][0], res[1][0], atol=1e-12)
    assert res[0][1:] == res[1][1:]


def test_native_gmsh_parser_matches_python(tmp_path):
    """The C++ mesh parser and the Python GmshIO path must produce the
    same bulk-element extraction on a generated mesh (regions, boundary
    exclusion, center averaging), and the native $ElementData writer must
    be byte-compatible with the Python reader."""
    import numpy as np
    from mlmc_tpu import native
    from mlmc_tpu.sim.flow_sim import FlowSim

    if not native.available():
        import pytest
        pytest.skip("no native toolchain")

    # generated structured triangle mesh: G x G quads split in two, plus a
    # boundary line region along one edge
    G = 12
    rng = np.random.default_rng(0)
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat",
             "$PhysicalNames", "3",
             '2 1 "ground"', '2 4 "lake"', '1 2 ".bc_outflow"',
             "$EndPhysicalNames", "$Nodes", str((G + 1) ** 2)]
    def nid(i, j):
        return i * (G + 1) + j + 1
    for i in range(G + 1):
        for j in range(G + 1):
            lines.append("{} {} {} 0".format(nid(i, j), i / G, j / G))
    lines += ["$EndNodes", "$Elements", str(2 * G * G + G)]
    eid = 0
    for i in range(G):
        for j in range(G):
            region = 1 if rng.random() < 0.7 else 4
            eid += 1
            lines.append("{} 2 2 {} 11 {} {} {}".format(
                eid, region, nid(i, j), nid(i + 1, j), nid(i + 1, j + 1)))
            eid += 1
            lines.append("{} 2 2 {} 11 {} {} {}".format(
                eid, region, nid(i, j), nid(i + 1, j + 1), nid(i, j + 1)))
    for j in range(G):  # boundary lines (excluded from extraction)
        eid += 1
        lines.append("{} 1 2 2 22 {} {}".format(eid, nid(G, j),
                                                nid(G, j + 1)))
    path = tmp_path / "gen.msh"
    path.write_text("\n".join(lines) + "\n")

    fast = native.parse_gmsh_mesh(str(path))
    assert fast is not None
    assert len(fast["ele_ids"]) == 2 * G * G
    assert fast["region_map"] == {"ground": 1, "lake": 4, ".bc_outflow": 2}

    # cross-check against the full extract (which itself uses the native
    # path) vs a forced-Python extract
    data = FlowSim.extract_mesh(str(path))
    from mlmc_tpu.tool.gmsh_io import GmshIO
    mesh = GmshIO(str(path))
    node_xyz = {k: np.asarray(v) for k, v in mesh.nodes.items()}
    py_centers = []
    for ele_id, (_t, tags, node_ids) in mesh.elements.items():
        if tags[0] == 2:
            continue
        py_centers.append(np.mean([node_xyz[n] for n in node_ids], axis=0))
    py_centers = np.asarray(py_centers)
    extent = py_centers.max(axis=0) - py_centers.min(axis=0)
    keep = np.flatnonzero(extent > 1e-10 * extent.max())
    assert np.allclose(data["points"], py_centers[:, keep], atol=1e-14)

    # native fields writer -> Python reader round trip at n_comp=2
    vals = rng.normal(size=(2 * G * G, 2))
    fpath = tmp_path / "fields.msh"
    assert native.write_gmsh_fields(str(fpath), fast["ele_ids"],
                                    {"velocity": vals})
    back = GmshIO(str(fpath)).element_data["velocity"][0.0]
    got = np.asarray([back[int(e)] for e in fast["ele_ids"]])
    assert np.allclose(got, vals, atol=0)  # %.17g round-trips f64 exactly


def test_memory_gap_levels_and_zero_costs():
    """Regressions from review: a level whose samples ALL failed must not
    shift/crash the later levels' views, and a zero-cost level must stay
    in the n_ops vector (the allocation formula pairs it with variances
    index by index)."""
    m = Memory()
    m.save_samples(
        {1: [("L01_S0000000", (np.array([1.0]), np.array([2.0])))]},
        {0: [("L00_S0000000", "solver crash")]})
    assert m.get_n_collected() == [0, 1]
    pairs = m.sample_pairs()
    assert pairs[0] is None and pairs[1].shape == (1, 1, 2)
    assert m.failed_samples() == {"0": ["L00_S0000000"]}
    assert list(m.n_finished()) == [1, 1]

    m.save_n_ops([(0, (1.0, 10)), (1, (0.5, 10)), (2, (0.0, 10))])
    assert m.get_n_ops() == [0.1, 0.05, 0.0]


def test_native_gmsh_physical_names_after_elements(tmp_path):
    """msh2 section order is not fixed: boundary exclusion must hold when
    $PhysicalNames follows $Elements (review finding)."""
    from mlmc_tpu import native

    if not native.available():
        pytest.skip("no native toolchain")
    msh = tmp_path / "late.msh"
    msh.write_text("""$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
3
1 2 2 1 1 1 2 3
2 2 2 1 1 1 3 4
3 1 2 2 2 2 3
$EndElements
$PhysicalNames
2
2 1 "ground"
1 2 ".bc_outflow"
$EndPhysicalNames
""")
    parsed = native.parse_gmsh_mesh(str(msh))
    assert list(parsed["ele_ids"]) == [1, 2]
    assert parsed["region_map"][".bc_outflow"] == 2


def test_device_memory_reserve_capacity():
    """reserve_capacity pre-grows the device buffer to the target's power of
    two, keeping ONE buffer shape across subsequent appends (stable
    estimation-executable shapes in the adaptive loop) without changing any
    stored content."""
    import numpy as np
    import jax.numpy as jnp
    from mlmc_tpu import DeviceMemory

    st = DeviceMemory()
    ids = lambda lo, n: ["L00_S%07d" % i for i in range(lo, lo + n)]
    rng = np.random.default_rng(1)
    mk = lambda n: jnp.asarray(rng.normal(size=(n, 2, 3)).astype(np.float32))

    a = mk(100)
    st.save_samples_bulk(0, ids(0, 100), a[:, 0], a[:, 1])
    st.reserve_capacity(0, 5000)               # target known after round 1
    buf, n = st.raw_level_payload(0)
    assert buf.shape[0] == 8192 and n == 100   # grown straight to pow2(5000)
    b = mk(600)
    st.save_samples_bulk(0, ids(100, 600), b[:, 0], b[:, 1])
    buf2, n2 = st.raw_level_payload(0)
    assert buf2.shape[0] == 8192 and n2 == 700  # NO intermediate doubling
    got = np.asarray(st.sample_pairs()[0])      # [M, N, 1] (level 0: fine only)
    want_fine = np.concatenate([np.asarray(a), np.asarray(b)])[:, 0, :].T
    assert got.shape == (3, 700, 1)
    assert np.array_equal(got[:, :, 0], want_fine)

    # reserving BEFORE the first append sizes the initial allocation
    st2 = DeviceMemory()
    st2.reserve_capacity(0, 3000)
    st2.save_samples_bulk(0, ids(0, 10), mk(10)[:, 0], mk(10)[:, 1])
    buf3, _ = st2.raw_level_payload(0)
    assert buf3.shape[0] == 4096

    # smaller or equal reservation is a no-op
    st2.reserve_capacity(0, 100)
    buf4, _ = st2.raw_level_payload(0)
    assert buf4.shape[0] == 4096


def test_native_corrupted_inputs_fail_cleanly(tmp_path):
    """Corrupted native-format files must raise Python errors, not kill
    the process (m=0 header would divide by zero; an absurd gmsh section
    count would throw through the C ABI)."""
    import struct
    import mlmc_tpu.native as native

    if not native.available():
        pytest.skip("native library unavailable")

    # sample log with a zero-m header
    bad_log = tmp_path / "bad.bin"
    bad_log.write_bytes(struct.pack("<QII", 0x4D4C4D435F42494E, 1, 0) + b"\0" * 64)
    with pytest.raises(IOError):
        native.SampleLogReader(str(bad_log))

    # gmsh file claiming 10^18 nodes
    bad_msh = tmp_path / "bad.msh"
    bad_msh.write_text("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n"
                       "$Nodes\n1000000000000000000\n1 0 0 0\n$EndNodes\n"
                       "$Elements\n1\n1 2 2 1 1 1 1\n$EndElements\n")
    # contract: malformed sections -> None (Python reader fallback),
    # never a crash (the 1e18 reserve throws, caught at the C ABI)
    assert native.parse_gmsh_mesh(str(bad_msh)) is None


def test_memory_vectors_span_all_known_levels():
    """Per-level vectors must span every KNOWN level, not just levels
    that already hold results — a still-empty or all-failed high level
    used to shorten (or crash) the sampler's and estimator's indexing."""
    fmt = _result_format()
    M = int(sum(np.prod(q.shape) * len(q.times) * len(q.locations)
                for q in fmt))
    storage = Memory()
    storage.save_global_data(result_format=fmt,
                             level_parameters=[[0.5], [0.25], [0.125]])
    for lvl in range(3):
        storage.save_scheduled_samples(lvl, ["L%02d_S%07d" % (lvl, 0)])
    # level 0: one success; level 1: all failed; level 2: nothing finished
    storage.save_samples(
        {0: [("L00_S0000000", (np.zeros(M), np.zeros(M)))]},
        {1: [("L01_S0000000", "boom")]})
    storage.save_n_ops([(0, [1.0, 1])])

    assert storage.get_n_levels() == 3
    assert len(storage.get_n_collected()) == 3
    assert storage.get_n_collected() == [1, 0, 0]
    assert len(storage.n_finished()) == 3
    assert storage.n_finished().tolist() == [1.0, 1.0, 0.0]
    assert len(storage.get_n_ops()) == 3
    assert storage.get_n_ops()[1:] == [0.0, 0.0]
    pairs = storage.sample_pairs()
    assert len(pairs) == 3 and pairs[1] is None and pairs[2] is None

    # chunked read of a zero-collected level: empty, correctly shaped
    spec = next(storage.chunks(level_id=1))
    empty = storage.sample_pairs_level(spec)
    assert empty.shape == (M, 0, 2)


@pytest.mark.parametrize("kind", ["memory", "hdf", "bin"])
def test_empty_level_chunk_reads(tmp_path, kind):
    """Every backend returns an empty, correctly shaped chunk for a
    scheduled-but-empty level instead of crashing on missing data."""
    if kind == "bin":
        import mlmc_tpu.native as native
        if not native.available():
            pytest.skip("native library unavailable")
    fmt = _result_format()
    M = int(sum(np.prod(q.shape) * len(q.times) * len(q.locations)
                for q in fmt))
    storage = _make_storage(kind, tmp_path)
    storage.save_global_data(result_format=fmt,
                             level_parameters=[[0.5], [0.25]])
    for lvl in range(2):
        storage.save_scheduled_samples(lvl, ["L%02d_S%07d" % (lvl, 0)])
    # only level 0 collects anything
    storage.save_samples(
        {0: [("L00_S0000000", (np.zeros(M), np.zeros(M)))]}, {})

    assert storage.get_n_levels() == 2
    assert list(storage.get_n_collected()) == [1, 0]
    spec = next(storage.chunks(level_id=1))
    empty = storage.sample_pairs_level(spec)
    assert empty.shape[0] == M and empty.shape[1] == 0
