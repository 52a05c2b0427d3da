#!/usr/bin/env python
"""Offline metric sweep over saved validation outputs. CLI-compatible with the
reference `python eval.py --project_dir ... --exp_name ... --epoch_number N`
(/root/reference/eval.py)."""

# pin the backend BEFORE importing jax-touching modules (see main.py)
from spnerf_tpu.utils.platform import apply_platform_env

apply_platform_env()

from spnerf_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
