#!/usr/bin/env python
"""Offline metric sweep over saved validation outputs. CLI-compatible with the
reference `python eval.py --project_dir ... --exp_name ... --epoch_number N`
(/root/reference/eval.py)."""

from spnerf_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
