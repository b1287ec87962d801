"""Workspace simulation path, GmshIO round-trip, legacy Distribution."""
import os
import numpy as np
import pytest
import scipy.stats as stats
import yaml

from mlmc_tpu import (Memory, OneProcessPool, ThreadPool, Sampler, Legendre,
                      SynthSimulationWorkspace)
from mlmc_tpu import estimator as est_mod
from mlmc_tpu.quantity.quantity import make_root_quantity


@pytest.mark.parametrize("pool_factory", [OneProcessPool, lambda **kw: ThreadPool(2, **kw)])
def test_workspace_simulation(tmp_path, pool_factory):
    """Workspace sims: config YAML copied into per-sample dirs, chdir path
    (mirrors reference test_sampling_pools / SynthSimulationWorkspace)."""
    cfg_file = tmp_path / "synth_sim_config.yaml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump({"distr": "norm", "nan_fraction": 0.1}, f)

    sim = SynthSimulationWorkspace(dict(config_yaml=str(cfg_file)))
    storage = Memory()
    pool = pool_factory(work_dir=str(tmp_path / "work"), debug=False)
    sampler = Sampler(storage, pool, sim, [[0.1], [0.01]])
    sampler.set_initial_n_samples([30, 10])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    n_collected = storage.get_n_collected()
    n_failed = sum(len(v) for v in storage.failed_samples().values())
    assert n_collected[0] + n_collected[1] + n_failed == 40
    assert n_failed > 0  # nan_fraction injects failures

    quantity = make_root_quantity(storage, q_specs=sim.result_format())
    vq = quantity["length"][1]["10"][0]
    mfn = Legendre(4, stats.norm(1, 2).ppf([0.001, 0.999]))
    means, _ = est_mod.Estimate(vq, storage, mfn).estimate_moments(mfn)
    assert means[0] == 1


def test_gmsh_io_roundtrip(tmp_path):
    from mlmc_tpu.tool.gmsh_io import GmshIO

    io = GmshIO()
    io.nodes = {1: (0.0, 0.0, 0.0), 2: (1.0, 0.0, 0.0), 3: (0.0, 1.0, 0.0)}
    io.elements = {1: (2, [1, 1], [1, 2, 3])}  # one triangle
    io.physical = {"domain": (1, 2)}

    path = str(tmp_path / "mesh.msh")
    io.write_ascii(path)
    io2 = GmshIO(path)
    assert io2.nodes == io.nodes
    assert io2.elements == io.elements
    assert io2.physical == io.physical

    # fields write + read back
    fields_path = str(tmp_path / "fields.msh")
    io.write_fields(fields_path, [1], {"conductivity": np.array([[2.5]])})
    io3 = GmshIO(fields_path)
    data = io3.read_element_data()
    assert "conductivity" in data
    assert data["conductivity"][0.0][1] == [2.5]


def test_legacy_distribution_continuation():
    from mlmc_tpu.moments import Legendre as Leg
    from mlmc_tpu.tool.distribution import Distribution
    import mlmc_tpu.tool.simple_distribution as sd
    from tests.test_distribution import CutDistribution

    cut = CutDistribution(stats.norm(0, 1), quantile=0.001)
    n_moments = 21
    mfn = Leg(n_moments, cut.domain, safe_eval=False)
    exact_moments = sd.compute_semiexact_moments(mfn, cut.pdf, tol=1e-13)
    moments_data = np.stack((exact_moments, np.ones(n_moments)), axis=1)
    d = Distribution(mfn, moments_data, domain=cut.domain,
                     force_decay=cut.force_decay)
    result = d.estimate_density_minimize(tol=1e-8)
    assert result.success
    kl = sd.KL_divergence(cut.pdf, d.density, *cut.domain)
    assert kl < 1e-6, kl
    # schedule is geometric, odd, ends exactly at the final size
    sched = Distribution.size_schedule(21)
    assert sched[-1] == 21
    assert all(s % 2 == 1 for s in sched[:-1])
    assert sched == sorted(set(sched))


def test_frac_geom_gated():
    from mlmc_tpu.random import frac_geom

    with pytest.raises(ImportError):
        frac_geom.make_frac_mesh(None, 0.1, [], 0.1)


def test_external_command_simulation(tmp_path):
    """FlowSim-pattern: template render -> subprocess solver -> extraction,
    full MLMC over ThreadPool workspaces (solver = python one-liner that
    deterministically maps (step, seed) -> value)."""
    from mlmc_tpu.sim.external import ExternalCommandSimulation
    from mlmc_tpu.quantity.quantity_spec import QuantitySpec
    import sys

    template = tmp_path / "input.tmpl"
    template.write_text("step={step}\nseed={seed}\n")

    def extract(output_file, config):
        with open(output_file) as f:
            return np.array([float(f.read().strip())])

    solver = ("import sys\n"
              "lines = open(sys.argv[1]).read().split()\n"
              "step = float(lines[0].split('=')[1]); seed = int(lines[1].split('=')[1])\n"
              "import random; random.seed(seed)\n"
              "open(sys.argv[2], 'w').write(str(random.gauss(0, 1) + step))\n")

    sim = ExternalCommandSimulation(dict(
        command=[sys.executable, "-c", solver, "{input_file}", "{output_file}"],
        template_file=str(template),
        extract_result=extract,
        result_format=[QuantitySpec(name="val", unit="", shape=(1,),
                                    times=[0], locations=["0"])],
    ))
    storage = Memory()
    pool = ThreadPool(2, work_dir=str(tmp_path / "work"))
    sampler = Sampler(storage, pool, sim, [[0.5], [0.125]])
    sampler.set_initial_n_samples([12, 4])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    assert storage.get_n_collected() == [12, 4]
    pairs = storage.sample_pairs()
    # same seed => same random.gauss draw => fine - coarse == step difference
    diff = pairs[1][0, :, 0] - pairs[1][0, :, 1]
    assert np.allclose(diff, 0.125 - 0.5, atol=1e-12)


def test_flow_utils(tmp_path):
    from mlmc_tpu.tool.flow_utils import (create_corr_field,
                                          substitute_placeholders,
                                          force_mkdir)
    import jax

    # model zoo produces a sampling Fields instance
    fields = create_corr_field(model="exp", corr_length=0.5, dim=2,
                               log=True, mode_no=64)
    pts = np.random.default_rng(0).uniform(0, 1, size=(10, 2))
    fields.set_points(pts)
    out = fields.sample(jax.random.key(0))
    assert out["conductivity"].shape == (10,)
    assert np.all(out["conductivity"] > 0)  # log field

    # placeholder substitution
    tmpl = tmp_path / "in.tmpl"
    tmpl.write_text("mesh: <mesh_file>\nstep: <step>\nkeep: <unknown>\n")
    used = substitute_placeholders(str(tmpl), str(tmp_path / "out.txt"),
                                   {"mesh_file": "m.msh", "step": 0.25})
    text = (tmp_path / "out.txt").read_text()
    assert "m.msh" in text and "0.25" in text and "<unknown>" in text
    assert used == {"mesh_file", "step"}

    # force_mkdir semantics
    d = tmp_path / "wd"
    force_mkdir(str(d))
    (d / "junk").write_text("x")
    force_mkdir(str(d), force=True)
    assert not (d / "junk").exists()


def test_gmsh_binary_writer(tmp_path):
    from mlmc_tpu.tool.gmsh_io import GmshIO

    io = GmshIO()
    io.nodes = {1: (0.0, 0.0, 0.0), 2: (1.0, 0.0, 0.0), 3: (0.0, 1.0, 0.0)}
    io.elements = {1: (2, [1, 1], [1, 2, 3])}
    path = str(tmp_path / "bin.msh")
    io.write_binary(path)
    raw = open(path, "rb").read()
    assert raw.startswith(b"$MeshFormat\n2.2 1 8\n")
    assert b"$EndElements" in raw


def test_element_data_head(tmp_path):
    import io as _io
    from mlmc_tpu.tool.gmsh_io import GmshIO

    body = "1\n\"conductivity\"\n1\n0.5\n3\n0\n1\n2\n"
    head = GmshIO().read_element_data_head(_io.StringIO(body))
    assert head == ("conductivity", 0.5, 0, 1, 2)


def test_gmsh_v1_read(tmp_path):
    """Gmsh MSH v1 ($NOD/$ELM) files parse like the reference reader
    (reference gmsh_io.py:91-133)."""
    from mlmc_tpu.tool.gmsh_io import GmshIO

    msh = tmp_path / "legacy.msh"
    msh.write_text(
        "$NOD\n3\n1 0 0 0\n2 1 0 0\n3 0 1 0\n$ENDNOD\n"
        "$ELM\n1\n1 2 7 1 3 1 2 3\n$ENDELM\n")
    gio = GmshIO(str(msh))
    assert gio.nodes == {1: (0, 0, 0), 2: (1, 0, 0), 3: (0, 1, 0)}
    elm_type, tags, node_ids = gio.elements[1]
    assert elm_type == 2 and tags == [7, 1] and node_ids == [1, 2, 3]


def test_legacy_distribution_root_and_hard_target():
    """Legacy solver on a bimodal target at high moment count (continuation
    territory) + the root-solver path refining to grad ~ 0."""
    import numpy as np
    from mlmc_tpu.moments import Legendre as Leg
    from mlmc_tpu.tool.distribution import Distribution
    import mlmc_tpu.tool.simple_distribution as sd

    w, comps = (0.5, 0.5), (stats.norm(-1.5, 0.6), stats.norm(2.0, 1.0))

    def pdf(x):
        return sum(wi * c.pdf(x) for wi, c in zip(w, comps))

    lo = min(c.ppf(1e-6) for c in comps)
    hi = max(c.ppf(1 - 1e-6) for c in comps)
    R = 25
    mfn = Leg(R, (lo, hi), safe_eval=False)
    mu = sd.compute_semiexact_moments(mfn, pdf, tol=1e-13)
    d = Distribution(mfn, np.stack((mu, np.ones(R)), axis=1),
                     domain=(lo, hi), force_decay=(True, True))
    res = d.estimate_density_minimize(tol=1e-8)
    assert res.success, res
    kl = sd.KL_divergence(pdf, d.density, lo, hi)
    assert kl < 5e-4, kl  # bimodal, basis-limited at R=25

    sol = d.estimate_density(tol=1e-10)
    grad_norm = np.linalg.norm(sol.fun)
    assert grad_norm < 1e-7, grad_norm


# ---------------------------------------------------------------------- #
# FlowSim: the full gmsh+flow123d workflow with MOCK executables
# (the reference ships this path untested outside a PBS cluster)
# ---------------------------------------------------------------------- #
_MOCK_GMSH = '''#!/usr/bin/env python3
"""Mock gmsh: writes a canned msh2 square; finer clscale => more triangles."""
import sys
args = sys.argv[1:]
out = args[args.index("-o") + 1]
cl = float(args[args.index("-clscale") + 1])
header = """$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
2
2 1 "ground"
1 2 ".bc_outflow"
$EndPhysicalNames
"""
if cl <= 0.3:  # fine: 4 triangles around the center node
    body = """$Nodes
5
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
5 0.5 0.5 0
$EndNodes
$Elements
5
1 2 2 1 1 1 2 5
2 2 2 1 1 2 3 5
3 2 2 1 1 3 4 5
4 2 2 1 1 4 1 5
5 1 2 2 2 2 3
$EndElements
"""
else:  # coarse: 2 triangles
    body = """$Nodes
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
"""
open(out, "w").write(header + body)
'''

_MOCK_FLOW123D = '''#!/usr/bin/env python3
"""Mock flow123d: flux := mean(conductivity) read from the fields file;
fails if the rendered YAML still contains un-substituted placeholders."""
import os, sys
sys.path.insert(0, {repo_root!r})  # runs with cwd=scratch dir, no PYTHONPATH
import numpy as np
from mlmc_tpu.tool.gmsh_io import GmshIO
args = sys.argv[1:]
indir = args[args.index("-i") + 1]
outdir = args[args.index("-o") + 1]
yaml_path = args[args.index("-s") + 1]
text = open(yaml_path).read()
assert "<mesh_file>" not in text and "<conductivity>" not in text, text
mesh = GmshIO(os.path.join(indir, "fields_sample.msh"))
vals = mesh.element_data["conductivity"][0.0]
flux = -float(np.mean([v[0] for v in vals.values()]))
with open(os.path.join(outdir, "water_balance.yaml"), "w") as f:
    f.write("data:\\n- {time: 0, region: .bc_outflow, data: [%r, 0.0]}\\n"
            % flux)
'''


def _write_executable(path, text):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(path, "w") as f:
        f.write(text.replace("{repo_root!r}", repr(repo_root)))
    os.chmod(path, 0o755)


def test_flow_sim_mocked_binaries(tmp_path):
    """End-to-end FlowSim workflow: per-level mesh build, YAML rendering,
    joint fine/coarse field draw, solver invocation, flux extraction —
    driven by mock gmsh/flow123d executables through a real Sampler run
    on a ThreadPool (the private-scratch-dir design must be thread-safe)."""
    from mlmc_tpu.sim.flow_sim import FlowSim

    gmsh = tmp_path / "mock_gmsh"
    flow = tmp_path / "mock_flow123d"
    _write_executable(gmsh, _MOCK_GMSH)
    _write_executable(flow, _MOCK_FLOW123D)

    geo = tmp_path / "square.geo"
    geo.write_text("// geometry consumed by the mock\n")
    tmpl = tmp_path / "flow_input.yaml.tmpl"
    tmpl.write_text("mesh: <mesh_file>\ndt: <timestep_h1>\n"
                    "cond: <conductivity>\n")

    sim = FlowSim(dict(
        env={"gmsh": str(gmsh), "flow123d": str(flow), "gmsh_version": 2},
        fields_params=dict(model="fourier", corr_length=0.5, dim=2,
                           log=True, sigma=1, mode_no=64),
        yaml_file=str(tmpl), geo_file=str(geo),
        work_dir=str(tmp_path / "work")), clean=True)

    storage = Memory()
    pool = ThreadPool(2, work_dir=str(tmp_path / "out"))
    sampler = Sampler(storage, pool, sim, [[0.6], [0.2]])
    sampler.set_initial_n_samples([6, 4])
    sampler.schedule_samples()
    sampler.ask_sampling_pool_for_samples()

    assert list(storage.get_n_collected()) == [6, 4]
    assert not any(len(v) for v in storage.failed_samples().values())

    root = make_root_quantity(storage, q_specs=sim.result_format())
    q = root["conductivity"][1]["0"][0]
    chunk0 = np.asarray(q.samples(next(storage.chunks(level_id=0))))
    chunk1 = np.asarray(q.samples(next(storage.chunks(level_id=1))))
    # log-normal conductivity => strictly positive fluxes on both levels
    assert np.all(chunk0[..., 0] > 0)
    assert np.all(chunk1[..., :] > 0)
    # fine and coarse of one sample share the field draw: correlated but
    # not identical (different meshes average different centers)
    fine, coarse = chunk1[0, :, 0], chunk1[0, :, 1]
    assert not np.allclose(fine, coarse)
    assert np.corrcoef(fine, coarse)[0, 1] > 0.5

    # renewed sample replays bit-identically (explicit key from the seed)
    cfg = sampler._level_sim_objects[1].config_dict
    r1 = FlowSim.calculate(cfg, seed=123)
    r2 = FlowSim.calculate(cfg, seed=123)
    assert np.array_equal(r1[0], r2[0]) and np.array_equal(r1[1], r2[1])


def test_flow_sim_extract_mesh(tmp_path):
    """extract_mesh: boundary regions excluded, degenerate axis dropped,
    centers vectorized."""
    from mlmc_tpu.sim.flow_sim import FlowSim

    msh = tmp_path / "m.msh"
    msh.write_text("""$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
2
2 7 "bulk"
1 9 ".bc"
$EndPhysicalNames
$Nodes
4
1 0 0 0
2 2 0 0
3 2 2 0
4 0 2 0
$EndNodes
$Elements
3
1 2 2 7 1 1 2 3
2 2 2 7 1 1 3 4
3 1 2 9 2 2 3
$EndElements
""")
    data = FlowSim.extract_mesh(str(msh))
    assert data["points"].shape == (2, 2)          # 2 bulk elements, z dropped
    assert list(data["ele_ids"]) == [1, 2]
    assert list(data["point_region_ids"]) == [7, 7]
    assert data["region_map"] == {"bulk": 7, ".bc": 9}
    assert np.allclose(data["points"][0], [4 / 3, 2 / 3])


def test_flow_sim_keep_axes_joint(tmp_path):
    """The fine mesh decides the kept coordinate axes; a coarse mesh that
    is degenerate along extra axes (here: one single element — zero extent
    everywhere) must still come out with the fine mesh's dimension."""
    from mlmc_tpu.sim.flow_sim import FlowSim

    fine = tmp_path / "fine.msh"
    fine.write_text("""$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
1
2 1 "bulk"
$EndPhysicalNames
$Nodes
4
1 0 0 0
2 2 0 0
3 2 2 0
4 0 2 0
$EndNodes
$Elements
2
1 2 2 1 1 1 2 3
2 2 2 1 1 1 3 4
$EndElements
""")
    coarse = tmp_path / "coarse.msh"
    coarse.write_text("""$MeshFormat
2.2 0 8
$EndMeshFormat
$PhysicalNames
1
2 1 "bulk"
$EndPhysicalNames
$Nodes
3
1 0 0 0
2 2 0 0
3 0 2 0
$EndNodes
$Elements
1
1 2 2 1 1 1 2 3
$EndElements
""")
    f = FlowSim.extract_mesh(str(fine))
    assert f["keep_axes"] == (0, 1) and f["points"].shape == (2, 2)
    # single coarse element: alone it would keep all 3 axes (zero extent
    # everywhere); the fine mesh's decision makes the dims agree
    c = FlowSim.extract_mesh(str(coarse), keep_axes=f["keep_axes"])
    assert c["points"].shape == (1, 2)
    joint = np.concatenate([f["points"], c["points"]])
    assert joint.shape == (3, 2)

    # parsed meshes are cached (per-sample calculate() must not re-parse)
    again = FlowSim.extract_mesh(str(fine))
    assert again is f


def test_legacy_distribution_force_decay():
    """force_decay must actually shape the fit (review finding: the flag
    was a no-op). An exponential's density RISES toward the left domain
    edge; with the decay penalty on, the fitted density's growth toward
    that boundary (end_diff > 0) is suppressed by orders of magnitude."""
    from mlmc_tpu.moments import Legendre as Leg
    from mlmc_tpu.tool.distribution import Distribution
    import mlmc_tpu.tool.simple_distribution as sd

    pdf = stats.expon().pdf
    R = 7
    mfn = Leg(R, (0.0, 4.0), safe_eval=False)
    mu = sd.compute_semiexact_moments(mfn, pdf, tol=1e-12)
    data = np.stack((mu / (1 - np.exp(-4.0)), np.ones(R)), axis=1)

    probe = Distribution(mfn, data, domain=(0.0, 4.0),
                         force_decay=(True, False))
    rows = probe.end_point_derivatives()

    end_diffs = {}
    for decay in [(False, False), (True, False)]:
        d = Distribution(mfn, data, domain=(0.0, 4.0), force_decay=decay)
        assert d.estimate_density_minimize(tol=1e-7).success
        end_diffs[decay] = float((rows @ d.multipliers)[0])

    assert end_diffs[(False, False)] > 0.5          # boundary max, no penalty
    assert end_diffs[(True, False)] < 1e-3          # penalty suppresses it
