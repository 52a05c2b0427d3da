"""Subprocess worker for the 2-process `jax.distributed` mesh test.

Launched by tests/test_multihost.py as `python mh_worker.py <pid> <port>`.
Each process owns 2 virtual CPU devices; together they form the 4-device
global mesh. Runs the SAME Trainer code path the CLI dispatches
(`build_train_scan` over a data mesh) with process-identical inputs and
prints the resulting loss for the parent to compare across processes and
against the single-process oracle. This is the multi-host contract
documented in spnerf_tpu/parallel/mesh.py (jax.distributed.initialize by
the launcher, then the same 1-D data mesh spanning hosts)."""

import os
import sys

import numpy as np


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    assert jax.device_count() == 4, jax.devices()
    assert len(jax.local_devices()) == 2

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
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
    loss = float(np.asarray(ld["loss"].addressable_data(0)).ravel()[0])
    print(f"MHLOSS {pid} {loss:.8f}", flush=True)


if __name__ == "__main__":
    main()
