"""True multi-process (multi-host) validation via jax.distributed.

The reference marks its cluster tests @pytest.mark.pbs and skips them
(SURVEY.md §4 item 5); here two ACTUAL processes form a jax.distributed
cluster over localhost, build a global 2x4-device CPU mesh, run the
sharded MLMC step, and the results must (a) agree across processes and
(b) equal the single-process 8-device run.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


_WORKER = r"""
import json, os, sys
os.environ.pop("JAX_PLATFORMS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

coord, pid = sys.argv[1], int(sys.argv[2])
from mlmc_tpu.parallel import multihost, SampleMesh, sharded_mlmc_step
multihost.initialize(coordinator_address=coord, num_processes=2,
                     process_id=pid)
assert multihost.n_hosts() == 2
mesh = multihost.global_sample_mesh()
assert mesh.n_devices == 8, mesh.n_devices

import numpy as np
from mlmc_tpu.moments import Legendre
from mlmc_tpu.random.distributions import Norm
from mlmc_tpu.sim.synth_simulation import SynthSimulation
from mlmc_tpu.ops.fused_estimate import accumulators_to_estimates

steps = [0.5, 0.25]
fns = [SynthSimulation.scalar_batch_fn(h, 0.0 if i == 0 else steps[i - 1],
                                       Norm())
       for i, h in enumerate(steps)]
mfn = Legendre(5, (-4.0, 4.0))
step = sharded_mlmc_step(mesh, fns, mfn, [2048, 512], chunk_size=128)
accs = step(jax.random.key(7))
est = accumulators_to_estimates(jax.tree.map(lambda x: np.asarray(x), accs))
import numpy as np
print("RESULT " + json.dumps({
    "process": pid,
    "mean": est["mean"].tolist(),
    "n": est["n_samples"].tolist(),
}), flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_mesh(tmp_path):
    # pick a free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = "127.0.0.1:{}".format(port)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, coord, str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env, cwd="/root/repo")
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, err[-2000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][0]
        outs.append(json.loads(line[len("RESULT "):]))

    # both processes hold the SAME psum-reduced estimate
    assert np.allclose(outs[0]["mean"], outs[1]["mean"], atol=1e-12)
    assert outs[0]["n"] == outs[1]["n"]
    # counts are VALID samples: all drawn minus the few domain-clipped
    assert 2048 - 20 <= outs[0]["n"][0] <= 2048
    assert 512 - 20 <= outs[0]["n"][1] <= 512

    # and it equals the single-process 8-device run (chunk striding makes
    # the key mapping mesh-layout invariant)
    from mlmc_tpu.parallel import SampleMesh, sharded_mlmc_step
    from mlmc_tpu.moments import Legendre
    from mlmc_tpu.random.distributions import Norm
    from mlmc_tpu.sim.synth_simulation import SynthSimulation
    from mlmc_tpu.ops.fused_estimate import accumulators_to_estimates
    import jax

    steps = [0.5, 0.25]
    fns = [SynthSimulation.scalar_batch_fn(h, 0.0 if i == 0 else steps[i - 1],
                                           Norm())
           for i, h in enumerate(steps)]
    mfn = Legendre(5, (-4.0, 4.0))
    step = sharded_mlmc_step(SampleMesh(), fns, mfn, [2048, 512],
                             chunk_size=128)
    est = accumulators_to_estimates(
        jax.tree.map(np.asarray, step(jax.random.key(7))))
    assert np.allclose(est["mean"], outs[0]["mean"], atol=1e-12)
