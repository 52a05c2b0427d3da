#!/usr/bin/env python
"""Train SP-NeRF (TPU-native). CLI-compatible with the reference
`python main.py --aoi_id ... --model sp-nerf ...` (/root/reference/main.py)."""

from spnerf_tpu.cli.train import main

if __name__ == "__main__":
    main()
