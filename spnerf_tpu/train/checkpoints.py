"""Checkpoint / resume via orbax.

TPU-native equivalent of the reference's Lightning ModelCheckpoint wiring
(/root/reference/main.py:315-325): save every `save_every_n_epochs` validation
epochs under `<output>/ckpts`, keep everything (`save_top_k=-1`), track the best
`val/psnr`, and resume the full (params, opt_state, step) train state from
`--ckpt_path`.
"""

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpts_dir):
        self.dir = os.path.abspath(ckpts_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=None,  # save_top_k=-1: keep all
                best_fn=lambda metrics: metrics.get("val_psnr", float("-inf")),
                best_mode="max",
                create=True,
            ),
        )

    def save(self, step, state, metrics=None):
        state = jax.device_get(state)
        self._mgr.save(
            int(step),
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        self._mgr.wait_until_finished()

    def restore(self, target_state, step: Optional[int] = None):
        """Restore into the structure of `target_state` (an abstract or concrete
        TrainState). step=None -> latest."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
            if hasattr(x, "dtype") else x,
            jax.device_get(target_state),
        )
        try:
            return self._mgr.restore(int(step),
                                     args=ocp.args.StandardRestore(abstract))
        except Exception as exc:
            raise RuntimeError(
                f"checkpoint restore from {self.dir} (step {step}) failed — "
                "the model built from the CURRENT flags must match the "
                "architecture that was trained (e.g. hash geometry defaults "
                "changed to 8x4 in round 2: pass the original "
                "--hash_levels/--hash_features; the run's opts.json records "
                f"them). Underlying error: {exc}") from exc

    def latest_step(self):
        return self._mgr.latest_step()

    def best_step(self):
        """Step with the highest recorded val_psnr (reference ModelCheckpoint
        tracks/prints the best ckpt, /root/reference/main.py:315-320).
        None when no checkpoint carries metrics."""
        return self._mgr.best_step()

    def step_path(self, step):
        return os.path.join(self.dir, str(int(step)))

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.close()
