"""Multi-HOST (multi-process) evidence: the CLI's mesh code path runs
unchanged across `jax.distributed` processes.

The reference is strictly single-GPU (/root/reference/main.py:327; no
torch.distributed anywhere — SURVEY.md section 2). This repo's scale-out
contract (spnerf_tpu/parallel/mesh.py) is: the launcher calls
`jax.distributed.initialize()`, after which `jax.devices()` spans hosts and
the SAME 1-D data mesh / shard_map training code stretches over DCN. The
virtual 8-device CPU tests elsewhere cover multi-DEVICE; this test covers
the multi-PROCESS axis with real cross-process collectives (Gloo on CPU):
two subprocesses, 2 local devices each, forming one 4-device global mesh,
running `Trainer.build_train_scan` — the program every training window
dispatches — on process-identical inputs.
"""

import pytest
import os
import re
import socket
import subprocess
import sys

import numpy as np



def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh_matches_single_process():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "mh_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    losses = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-2000:]
        m = re.search(r"MHLOSS (\d) ([\d.]+)", out)
        assert m, out[-2000:]
        losses[int(m.group(1))] = float(m.group(2))
    assert set(losses) == {0, 1}
    # both processes observe the identical replicated loss
    assert losses[0] == losses[1], losses

    # single-process oracle: the same program on a 4-device mesh in THIS
    # process (8 virtual devices available via conftest)
    import jax

    from __graft_entry__ import _fake_batch, _flagship_configs
    from spnerf_tpu.parallel import data_mesh
    from spnerf_tpu.train.loop import Trainer

    mc, rc, lc = _flagship_configs(n_samples=4, fc_units=32)
    mesh = data_mesh(4)
    tr = Trainer(mc, rc, lc, steps_per_epoch=10, max_steps=100, mesh=mesh)
    state = tr.replicate_state(tr.init_state(jax.random.PRNGKey(0)))
    data = tr.shard_data(_fake_batch(np.random.default_rng(0), 64 * 4))
    run = tr.build_train_scan(8 * 4, 2)
    state, ld = run(state, data, jax.random.PRNGKey(1))
    oracle = float(np.asarray(ld["loss"]).ravel()[0])
    # same devices, same math; only the collective's reduction topology may
    # differ between Gloo rings and the in-process all-reduce
    np.testing.assert_allclose(losses[0], oracle, rtol=1e-5, atol=1e-6)
