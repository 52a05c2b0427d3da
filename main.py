#!/usr/bin/env python
"""Train SP-NeRF (TPU-native). CLI-compatible with the reference
`python main.py --aoi_id ... --model sp-nerf ...` (/root/reference/main.py)."""

# pin the backend BEFORE importing any module that might touch jax device
# APIs at import time — once the backends initialize, a jax_platforms update
# no longer takes effect (the container's sitecustomize pre-imports jax)
from spnerf_tpu.utils.platform import apply_platform_env

apply_platform_env()

from spnerf_tpu.cli.train import main

if __name__ == "__main__":
    main()
