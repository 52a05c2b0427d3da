"""sp-nerf-tpu: a TPU-native (JAX / XLA / Pallas / pjit) satellite-photogrammetry NeRF
framework with the capabilities of ShiningFeng/SP-NeRF.

Layering (top to bottom), mirroring SURVEY.md section 1:

    cli/        train / eval entry points (CLI contract of reference main.py / eval.py)
    train/      jitted train step, losses, schedules, checkpointing, metrics
    ops/        rendering ops: sampling, compositing, render_rays, Pallas kernels
    models/     SPNeRF field (flax), positional mapping, Siren init
    data/       scene assembly (rays, rgbs, depth, semantics), batching, DSM extraction
    geo/        WGS-84 geodesy, UTM, RPC camera model, ray casting
    io/         GeoTIFF / JSON / depth-txt host I/O (no GDAL/rasterio dependency)
    parallel/   device mesh + sharding helpers (data parallelism over rays)
    evaluation/ DSM registration (C++ NCC + JAX cross-check), offline metric sweep
    native/     C++ sources for host-side kernels (NCC DSM registration)

The compute path is pure JAX (jit/pallas); geometry-heavy data preparation runs on the
host in float64 numpy (exactly like the reference, which casts rays with numpy + rpcm:
/root/reference/datasets/satellite_scene.py:21-68) and is cached.
"""

__version__ = "0.1.0"
