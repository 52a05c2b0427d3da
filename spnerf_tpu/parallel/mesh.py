"""Device mesh construction for ray data-parallel training.

The reference is strictly single-GPU (/root/reference/main.py:327, no
torch.distributed anywhere — SURVEY.md section 2). The TPU-native scale-out is a
1-D mesh over all devices with the ray batch sharded along it: the model is ~1.3 M
parameters, so replicated parameters + psum'd gradients over ICI is the optimal
layout (gradient all-reduce is ~5 MB — microseconds on ICI; any tensor/pipeline
split would only add latency at this size).

Multi-host: `jax.distributed.initialize()` should be called by the launcher before
building the mesh; `jax.devices()` then spans hosts and the same 1-D data mesh
stretches over DCN automatically.
"""

import numpy as np

import jax
from jax.sharding import Mesh


def device_count():
    return jax.device_count()


def data_mesh(n_devices=None, axis_name="data"):
    """1-D mesh over `n_devices` (default: all available)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def local_batch(global_batch, mesh):
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    assert global_batch % n == 0, (
        f"batch size {global_batch} not divisible by {n} devices"
    )
    return global_batch // n
