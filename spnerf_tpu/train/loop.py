"""The jitted training loop: one XLA program per step, device-resident data.

TPU-native counterpart of the reference's Lightning wiring (/root/reference/main.py:
19-186 + configure_optimizers at :95-106). Key design differences (intentional,
documented — not a port):

  * the whole training scene lives on device; a step gathers its ray batch with
    `jnp.take` from keyed-PRNG indices instead of a host DataLoader
    (reference main.py:108-115 uses 4 worker processes + H2D copies per step);
  * there is no chunk loop — XLA sees the full (B, S) render and fuses it
    (reference main.py:60-73 chunks for GPU memory);
  * optimizer is optax adam (torch-default hyperparams) with the reference's
    StepLR(gamma=0.9)-per-epoch schedule as a staircase exponential decay;
  * sigma noise decays 0.9x per step from `noise_std` (main.py:155) — computed
    in-graph as noise_std * 0.9^step;
  * beta warmup (SNerfLoss for the first 2 epochs, main.py:150-153) and the
    ds/ss drop schedules are traced `where` switches, so one compiled program
    covers the whole run;
  * data parallelism shards the ray batch across a 1-D device mesh with
    `shard_map`; each device gathers from its local scene shard and gradients
    are `psum`-averaged — per-step semantics match the single-device path.
"""

import functools
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LossConfig, ModelConfig, RenderConfig
from ..models import SPNeRF, TransientEmbedding
from ..ops import render_rays
from . import losses


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    # occupancy grid (--occgrid): (res^3,) f32 density cache, or None.
    # None keeps the pytree/checkpoint layout of pre-occgrid runs.
    occ: Any = None


def make_lr_schedule(lr, steps_per_epoch, gamma=0.9):
    """StepLR(step_size=1 epoch, gamma=0.9) equivalent
    (reference modules/utils.py:317-318). `gamma` is exposed because the
    per-EPOCH decay couples lr to dataset size: at img_downscale 1 an epoch
    is 4x the ds2 ray count, so the same step budget sees 4x fewer decays
    and runs ~5x hotter late in training (measured to collapse depth-guided
    hash geometry at full res — RESULTS.md); gamma**4 ≈ 0.9 per ds2-epoch
    restores the ds2 lr-per-step trajectory."""
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=max(int(steps_per_epoch), 1),
        decay_rate=float(gamma),
        staircase=True,
    )


def _table_mask(params):
    """Pytree of bools marking hash-table leaves (param name "table").

    Used to scope optional regularizers to the NGP table rows only — the
    trunk/head kernels keep plain Adam semantics."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: bool(path)
        and getattr(path[-1], "key", None) == "table",
        params,
    )


def _scale_table_levels(gamma, n_levels):
    """Optax transform: multiply the hash TABLE update's level-l row by
    gamma**l (per-level lr decay — finer levels step slower). Placed AFTER
    scale_by_adam so it scales the effective lr, not the gradient (which
    Adam's normalization would cancel). Identity on every other leaf."""
    mult = (float(gamma) ** np.arange(n_levels, dtype=np.float64)).astype(
        np.float32)[:, None]

    def update_fn(updates, state, params=None):
        del params
        scaled = jax.tree_util.tree_map_with_path(
            lambda path, u: u * mult
            if (path and getattr(path[-1], "key", None) == "table") else u,
            updates,
        )
        return scaled, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def make_optimizer(lr_schedule, table_wd=0.0, table_level_lr_decay=1.0,
                   n_levels=8, weight_decay=0.0, grad_clip=0.0):
    """Adam (torch-default hyperparams), optionally with regularizers
    (all default OFF — the plain `optax.adam` path is kept bitwise
    identical, and its opt_state layout checkpoint-compatible):

      * table_wd: AdamW-style decoupled weight decay on the table rows only
        (decay added after Adam scaling, multiplied by the lr schedule) —
        the Instant-NGP-style remedy for stale/colliding table rows drifting.
      * table_level_lr_decay: gamma < 1 scales level l's effective lr by
        gamma**l so finer (higher-frequency) levels step slower — a
        smoothness prior on the multires pyramid.
      * weight_decay: AdamW-style decoupled decay on EVERY parameter (the
        reference trains plain Adam, main.py:151; this is the generic
        counterpart of the table-only knob above — measured a DSM win on
        the hash family, so exposed for the Siren family too). Composes
        with table_wd: table rows then decay at table_wd + weight_decay.
      * grad_clip: global-norm gradient clipping BEFORE Adam. Mitigation
        for the measured stochastic head-death at hash lr 1e-2 (one bad
        early step kills the albedo head's ReLU+sigmoid permanently —
        RESULTS.md autopsy); 0 = off.
    """
    if (table_wd == 0.0 and table_level_lr_decay == 1.0
            and weight_decay == 0.0 and grad_clip == 0.0):
        return optax.adam(lr_schedule, b1=0.9, b2=0.999, eps=1e-8)
    chain = []
    if grad_clip > 0.0:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    if table_level_lr_decay != 1.0:
        chain.append(_scale_table_levels(table_level_lr_decay, n_levels))
    if table_wd != 0.0:
        chain.append(optax.add_decayed_weights(table_wd, mask=_table_mask))
    if weight_decay != 0.0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*chain)


def scene_to_device_arrays(scene, pad_to: Optional[int] = None):
    """Pack the host scene into the dict of arrays the train step consumes.

    pad_to: optionally pad N up (repeating ray 0 with zero loss weight is not
    needed — sampling is with replacement, so padding just requires valid rows;
    we pad by wrapping, which keeps every row a real ray).
    """
    n = scene.rays.shape[0]
    arrays = {
        "rays": scene.rays,
        "rgbs": scene.rgbs,
        "ids": scene.ids.astype(np.int32),
        "depths": scene.depths,
        "valid_depth": scene.valid_depth,
        "depth_std": scene.depth_std,
        "sems": scene.sems.astype(np.int32),
    }
    if pad_to is not None and pad_to > n:
        idx = np.arange(pad_to) % n
        arrays = {k: v[idx] for k, v in arrays.items()}
    return arrays


def apply_compiler_options(jfn, options):
    """Wrap a jitted fn so it compiles with per-compile XLA DebugOptions.

    jax.jit has no compiler-options argument; the supported route is
    jfn.lower(*args).compile(compiler_options=...). Probed on the tunneled
    v5e: options DO reach the remote compiler (invalid names are rejected
    by the remote compile helper; xla_tpu_* fields are accepted), so this
    is a real tuning surface — exposed on the CLI as --xla_opts. The
    wrapper lowers lazily on first call (one shape signature per built
    step in this Trainer) and caches the compiled executable; donation
    semantics of the underlying jit are preserved by lower/compile.
    """
    if not options:
        return jfn
    cache = {}

    def wrapped(*args):
        if "exe" not in cache:
            cache["exe"] = jfn.lower(*args).compile(
                compiler_options=dict(options))
        return cache["exe"](*args)

    return wrapped


class Trainer:
    """Owns model configs, optimizer, and the compiled train/render steps."""

    def __init__(
        self,
        mc: ModelConfig,
        rc: RenderConfig,
        lc: LossConfig,
        lr=5e-4,
        lr_gamma=0.9,
        steps_per_epoch=1000,
        max_steps=30000,
        ds_drop=0.25,
        ss_drop=1.0,
        noise_std=0.0,
        t_vocab=30,
        mesh: Optional[Mesh] = None,
        donate=True,
        table_wd=0.0,
        table_level_lr_decay=1.0,
        weight_decay=0.0,
        grad_clip=0.0,
        occ_rows=4096,
        occ_decay=0.8,
        compiler_options=None,
    ):
        # optional per-compile XLA DebugOptions (dict), applied to the train
        # step/scan executables via lower().compile() — see
        # apply_compiler_options; CLI surface: --xla_opts k=v[,k=v...]
        self.compiler_options = dict(compiler_options or {})
        self.mc, self.rc, self.lc = mc, rc, lc
        self.steps_per_epoch = int(steps_per_epoch)
        self.max_steps = int(max_steps)
        self.ds_drop_step = float(np.round(ds_drop * max_steps))
        self.ss_drop_step = float(np.round(ss_drop * max_steps))
        self.noise_std0 = float(noise_std)
        # beta engages after first_beta_epoch epochs (reference --t, wired
        # through LossConfig; main.py:150-153)
        self.beta_warmup_step = (int(getattr(lc, "first_beta_epoch", 2))
                                 * self.steps_per_epoch)
        self.t_vocab = t_vocab
        self.mesh = mesh
        self.donate = donate

        from ..models import load_model

        dtype = jnp.bfloat16 if rc.compute_dtype == "bfloat16" else jnp.float32
        # hash lookup impl comes from mc.hash_impl ("auto" -> matmul_vjp on
        # accelerators: the factorized one-hot MXU backward, +26% integrated
        # on the v5e; --hash_impl selects xla / sorted_vjp / fused_vjp)
        self.model = load_model(mc, dtype)
        self.fine_model = (load_model(mc, dtype)
                           if rc.n_importance > 0 else None)
        self.t_embed = TransientEmbedding(vocab=t_vocab, dims=mc.t_embedding_dims) if mc.beta else None
        self.proposal_model = None
        if rc.proposal:
            from ..models.proposal import ProposalField

            self.proposal_model = ProposalField()

        # TRAINING runs the plain XLA path. Two rounds of fused training
        # kernels (trunk-only, then the full field: trunk + every head fwd+bwd
        # in VMEM with on-chip dW accumulation) both LOST to XLA on the v5e —
        # 67.4 and 68.5 ms/step vs 51.8 — and the kernel decomposition showed
        # why: the step is NOT activation-bandwidth-bound (the (N,512) saves
        # cost ~6 ms of 52 at batch 1024); XLA's layer-batched matmuls run at
        # ~88 TFLOP/s on the mixed fwd+bwd workload, so a recompute backward's
        # 4/3x FLOPs can at best tie. The fused FORWARD kernel, by contrast,
        # wins 5x standalone (8.5 vs 42.5 ms on 131k points) and is the
        # default for eval rendering (build_render_fn). Both training kernels
        # were measured, documented (CLAUDE.md round-2), and removed.
        # occupancy-grid update config (--occgrid): refresh `occ_rows` cells
        # per step (one contiguous slab, rotating offset — see ops/occgrid);
        # rows is snapped down to a divisor of res^3 so slabs tile exactly
        self.occ_rows = self.occ_decay = None
        if rc.occ_grid:
            n_cells = rc.occ_frames * rc.occ_res ** 3
            rows = min(max(int(occ_rows), 1), n_cells)
            while n_cells % rows:  # largest divisor of the cell count
                rows -= 1
            self.occ_rows = rows
            self.occ_decay = float(occ_decay)

        self.lr_schedule = make_lr_schedule(lr, steps_per_epoch,
                                            gamma=lr_gamma)
        self.tx = make_optimizer(self.lr_schedule, table_wd=table_wd,
                                 table_level_lr_decay=table_level_lr_decay,
                                 n_levels=mc.hash_levels,
                                 weight_decay=weight_decay,
                                 grad_clip=grad_clip)
        self._train_step = None
        self._render_fn = None

    # ------------------------------------------------------------------ init
    def init_state(self, key) -> TrainState:
        k1, k2, k3 = jax.random.split(key, 3)
        xyz = jnp.zeros((2, 3))
        sun = jnp.zeros((2, 3))
        t_emb = jnp.zeros((2, self.mc.t_embedding_dims)) if self.mc.beta else None
        sem = jnp.zeros((2,), jnp.int32) if self.mc.sem else None
        params = {"coarse": self.model.init(k1, xyz, sun, t_emb, sem)["params"]}
        if self.fine_model is not None:
            params["fine"] = self.fine_model.init(k2, xyz, sun, t_emb, sem)["params"]
        if self.t_embed is not None:
            params["t"] = self.t_embed.init(k3, jnp.zeros((2,), jnp.int32))["params"]
        if self.proposal_model is not None:
            params["proposal"] = self.proposal_model.init(
                jax.random.fold_in(key, 99), jnp.zeros((2, 3)))["params"]
        opt_state = self.tx.init(params)
        occ = None
        if self.rc.occ_grid:
            from ..ops.occgrid import init_grid

            occ = init_grid(self.rc.occ_res, self.rc.occ_frames)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state, occ=occ)

    # ------------------------------------------------------------- rendering
    def _field_apply(self, params, which="coarse", anneal=None):
        model = self.model if which == "coarse" else self.fine_model

        def apply(xyz, sun_d, t_emb, sem_labels, heads=None, solar_tail=0):
            kw = {"heads": heads, "solar_tail": solar_tail}
            if anneal is not None:  # hash models only (coarse-to-fine ramp)
                kw["anneal"] = anneal
            return model.apply({"params": params[which]}, xyz, sun_d, t_emb,
                               sem_labels, **kw)

        # the renderer may batch the solar pass into the view-ray pass with
        # per-row head pruning (ops/render._batch_solar_enabled)
        apply.supports_solar_tail = True
        return apply

    def _render(self, params, rays, ts, sems, key, train, valid_depth=None,
                target_depths=None, target_std=None, noise_std=0.0,
                anneal=None, occ=None):
        t_emb = None
        if self.t_embed is not None:
            t_emb = self.t_embed.apply({"params": params["t"]}, ts)
        fine_apply = (
            self._field_apply(params, "fine", anneal=anneal)
            if self.fine_model is not None else None
        )
        proposal_apply = None
        if self.proposal_model is not None:
            proposal_apply = lambda xyz: self.proposal_model.apply(
                {"params": params["proposal"]}, xyz)
        return render_rays(
            self._field_apply(params, "coarse", anneal=anneal),
            self.rc,
            rays,
            t_emb=t_emb,
            sems=sems if self.mc.sem else None,
            key=key,
            train=train,
            valid_depth=valid_depth,
            target_depths=target_depths,
            target_std=target_std,
            noise_std=noise_std,
            fine_field_apply=fine_apply,
            proposal_apply=proposal_apply,
            occ=occ,
        )

    # ------------------------------------------------------------ train step
    def _anneal(self, step):
        """Per-level hash feature weights at `step` (coarse-to-fine,
        BARF-style, --hash_anneal_steps): the 2 coarsest levels are always
        on; the rest ramp in linearly so all levels are fully open by
        hash_anneal_steps. None when annealing is off / non-hash."""
        if self.mc.encoding != "hash" or self.mc.hash_anneal_steps <= 0:
            return None
        L = self.mc.hash_levels
        keep = min(2, L)
        frac = jnp.minimum(
            step.astype(jnp.float32) / self.mc.hash_anneal_steps, 1.0)
        active = keep + (L - keep) * frac
        return jnp.clip(active - jnp.arange(L, dtype=jnp.float32), 0.0, 1.0)

    def _loss_fn(self, params, batch, key, step, occ=None):
        if self.noise_std0 == 0.0:
            noise_std = 0.0  # static: composite skips its PRNG entirely
        else:
            noise_std = self.noise_std0 * jnp.power(0.9, step.astype(jnp.float32))
        anneal = self._anneal(step)
        results = self._render(
            params,
            batch["rays"],
            batch["ids"],
            batch["sems"],
            key,
            train=True,
            valid_depth=batch["valid_depth"],
            target_depths=batch["depths"],
            target_std=batch["depth_std"],
            noise_std=noise_std,
            anneal=anneal,
            occ=occ,
        )
        use_beta = step >= self.beta_warmup_step
        total, loss_dict = losses.total_loss(
            results, batch, self.lc, step,
            self.ds_drop_step, self.ss_drop_step,
            use_beta_loss=use_beta,
        )
        if "w_prop_coarse" in results:
            from ..ops.proposal import interlevel_loss

            prop = self.lc.prop_lambda * interlevel_loss(
                results["z_prop_coarse"], results["w_prop_coarse"],
                results["z_vals_coarse"], results["weights_coarse"],
            )
            total = total + prop
            loss_dict["coarse_prop"] = prop
        typ = "fine" if f"rgb_fine" in results else "coarse"
        mse = jnp.mean((results[f"rgb_{typ}"] - batch["rgbs"]) ** 2)
        loss_dict["psnr"] = -10.0 * jnp.log10(mse)
        return total, loss_dict

    def _step_impl(self, state, data, key, axis_name=None):
        """One SGD step. data: full device-resident scene arrays; the batch is
        gathered from PRNG indices (with replacement)."""
        n = data["rays"].shape[0]
        k_idx, k_render = jax.random.split(jax.random.fold_in(key, state.step))
        if axis_name is not None:
            # distinct per-device stream; each device samples its local shard
            k_idx = jax.random.fold_in(k_idx, jax.lax.axis_index(axis_name))
            k_render = jax.random.fold_in(k_render, jax.lax.axis_index(axis_name))
        idx = jax.random.randint(k_idx, (self.batch_per_device,), 0, n)
        batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}

        (loss, loss_dict), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, batch, k_render, state.step, state.occ
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss_dict = jax.lax.pmean(loss_dict, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_occ = state.occ
        if state.occ is not None:
            # slab-sweep density-cache refresh (ops/occgrid.update_grid).
            # The key is deliberately NOT folded with the device axis: the
            # state (and so the grid) is replicated under shard_map, and a
            # per-device jitter would silently diverge the replicas.
            from ..ops.occgrid import update_grid

            k_occ = jax.random.fold_in(jax.random.fold_in(key, state.step),
                                       0x0CC)

            # the cached density must match the field the renderer composits:
            # under --hash_anneal_steps the fine levels are zero-weighted, so
            # the grid refresh applies the SAME per-level anneal
            occ_anneal = self._anneal(state.step)

            def sigma_fn(xyz):
                m = xyz.shape[0]
                sem = (jnp.full((m,), -100, jnp.int32)
                       if self.mc.sem else None)
                kw = {} if occ_anneal is None else {"anneal": occ_anneal}
                return self.model.apply(
                    {"params": new_params["coarse"]}, xyz,
                    jnp.zeros((m, 3), xyz.dtype), None, sem,
                    sigma_only=True, **kw)["sigma"]

            new_occ = update_grid(state.occ, sigma_fn, k_occ, state.step,
                                  self.rc.occ_res, self.occ_rows,
                                  self.occ_decay,
                                  frames=self.rc.occ_frames)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt, occ=new_occ)
        loss_dict["loss"] = loss
        loss_dict["lr"] = self.lr_schedule(state.step)
        return new_state, loss_dict

    def build_train_step(self, batch_size):
        """Compile the train step. With a mesh, data is sharded over rays and the
        state replicated; the step runs under shard_map with psum-averaged grads."""
        if self.mesh is None:
            self.batch_per_device = int(batch_size)

            @functools.partial(
                jax.jit,
                donate_argnums=(0,) if self.donate else (),
            )
            def step(state, data, key):
                return self._step_impl(state, data, key)

            step = apply_compiler_options(step, self.compiler_options)
            self._train_step = step
            return step

        mesh = self.mesh
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        assert batch_size % n_dev == 0, (batch_size, n_dev)
        self.batch_per_device = int(batch_size) // n_dev
        axis = mesh.axis_names[0]

        data_spec = P(axis)
        state_spec = P()

        @functools.partial(
            jax.jit,
            donate_argnums=(0,) if self.donate else (),
        )
        def step(state, data, key):
            def shard_fn(state, data, key):
                new_state, ld = self._step_impl(state, data, key, axis_name=axis)
                return new_state, ld

            return jax.shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(state_spec, data_spec, state_spec),
                out_specs=(state_spec, state_spec),
                check_vma=False,
            )(state, data, key)

        step = apply_compiler_options(step, self.compiler_options)
        self._train_step = step
        return step

    def build_train_scan(self, batch_size, inner_steps: int):
        """Compile a multi-step program: `inner_steps` SGD steps inside one
        lax.scan, so a single host dispatch drives a whole logging window.

        This removes per-step host->device dispatch latency entirely (the
        dominant cost through remote/tunneled runtimes, and non-trivial even
        locally) and is the idiomatic TPU training shape. Per-step semantics
        are identical to build_train_step: the PRNG folds in state.step, which
        increments inside the scan. Returns fn(state, data, key) ->
        (state, loss_dict_of_last_step).
        """
        if self.mesh is None:
            self.batch_per_device = int(batch_size)

            def body(state, _, data, key):
                new_state, ld = self._step_impl(state, data, key)
                return new_state, ld

            @functools.partial(jax.jit, donate_argnums=(0,) if self.donate else ())
            def run(state, data, key):
                state, lds = jax.lax.scan(
                    lambda s, x: body(s, x, data, key), state, None,
                    length=inner_steps)
                return state, jax.tree_util.tree_map(lambda a: a[-1], lds)

            return apply_compiler_options(run, self.compiler_options)

        mesh = self.mesh
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        assert batch_size % n_dev == 0, (batch_size, n_dev)
        self.batch_per_device = int(batch_size) // n_dev
        axis = mesh.axis_names[0]

        @functools.partial(jax.jit, donate_argnums=(0,) if self.donate else ())
        def run(state, data, key):
            def shard_fn(state, data, key):
                def body(s, _):
                    new_s, ld = self._step_impl(s, data, key, axis_name=axis)
                    return new_s, ld

                state2, lds = jax.lax.scan(body, state, None, length=inner_steps)
                return state2, jax.tree_util.tree_map(lambda a: a[-1], lds)

            return jax.shard_map(
                shard_fn, mesh=mesh,
                in_specs=(P(), P(axis), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )(state, data, key)

        return apply_compiler_options(run, self.compiler_options)

    def shard_data(self, data):
        """Place scene arrays on the mesh (sharded over rays) or the default
        device. Pads N to a multiple of the device count by wrapping."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in data.items()}
        axis = self.mesh.axis_names[0]
        n_dev = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
        n = data["rays"].shape[0]
        if n % n_dev:
            pad_n = (n // n_dev + 1) * n_dev
            idx = np.arange(pad_n) % n
            data = {k: np.asarray(v)[idx] for k, v in data.items()}
        sharding = NamedSharding(self.mesh, P(axis))
        return {k: jax.device_put(np.asarray(v), sharding) for k, v in data.items()}

    def replicate_state(self, state):
        if self.mesh is None:
            return state
        sharding = NamedSharding(self.mesh, P())
        return jax.device_put(state, sharding)

    # ------------------------------------------------------------- rendering (eval)
    # per-sample render outputs are composited on device and dropped from the
    # eval fetch: the tunneled host link is bandwidth-starved, and the (R, S)
    # arrays (weights, z_vals, transparency, solar-pass stacks) are ~98% of
    # the bytes while validation/image-saving only consumes per-ray values
    # (the reference composites sun/albedo on host from saved weights,
    # eval.py:60-101 — same math, moved on-device)
    _EVAL_DROP = ("weights", "transparency", "z_vals", "z_vals_unsort",
                  "weights_sc", "transparency_sc", "sun_sc", "z_prop",
                  "w_prop")

    @staticmethod
    def _lean_eval_outputs(out):
        out = dict(out)
        for typ in ("coarse", "fine"):
            wk = f"weights_{typ}"
            if wk not in out:
                continue
            w = out[wk][..., None]
            for key in ("sun", "albedo", "sky", "beta"):
                k = f"{key}_{typ}"
                if k in out and out[k].ndim == 3:
                    out[k] = jnp.sum(w * out[k], axis=-2)
        drop = {f"{name}_{typ}" for name in Trainer._EVAL_DROP
                for typ in ("coarse", "fine")}
        return {k: v for k, v in out.items() if k not in drop}

    def build_render_fn(self, chunk=40960, max_points=1_500_000, lean=True):
        """Whole-image renderer: jit once at a fixed chunk size, loop on host over
        padded chunks (eval-time only; the hot training path has no chunking).

        The ray chunk is capped so rays x samples stays under `max_points`:
        a full sp-nerf eval pass touches n_samples x (2 if guided) (+ solar
        pass) points per ray, and (N, 512) activations at millions of points
        OOM a 16 GB chip (seen at chunk=40960 x 256 samples).

        With rc.use_pallas (and a supported config), the field is evaluated by
        the fused Pallas kernel (ops/pallas/field_eval) instead of the XLA
        layer-by-layer path — forward-only rendering is where the fused kernel
        pays directly."""
        samples_per_ray = self.rc.n_samples * (2 if self.rc.guidedsample else 1)
        samples_per_ray += self.rc.n_importance
        if self.rc.solar_correction:
            samples_per_ray *= 2
        chunk = max(min(chunk, max_points // max(samples_per_ray, 1)), 1024)

        # the fused eval kernel is the DEFAULT on TPU backends (33 ms vs 51 ms
        # standalone-XLA on 131k points); --use_pallas forces it elsewhere
        # (interpret mode on CPU). Configs outside supports_config, and runs
        # with a separate fine model, fall back to the XLA path.
        use_pallas = False
        # proposal-sampler configs also stay on the XLA path: the fused branch
        # does not thread proposal_apply, so taking it would silently render
        # eval images with stratified sample placement unlike training
        if self.fine_model is None and not self.rc.proposal:
            from ..ops.pallas import supports_config

            on_accelerator = jax.default_backend() != "cpu"
            if self.rc.use_pallas or on_accelerator:
                use_pallas = supports_config(self.mc)

        post = self._lean_eval_outputs if lean else (lambda out: out)

        # --occgrid: eval renders thread the trained density grid through as
        # one extra replicated operand so sample PLACEMENT matches training
        # (render_image's `occ` kwarg; a uniform grid stands in when absent)
        with_occ = bool(self.rc.occ_grid)
        occ_specs = (P(),) if with_occ else ()

        if use_pallas:
            from ..ops.pallas import fused_field_apply
            from ..ops import render_rays as _render_rays

            interpret = jax.default_backend() == "cpu"

            @jax.jit
            def render_chunk(params, rays, ts, sems, *occ):
                fused = fused_field_apply(
                    params["coarse"], self.mc,
                    compute_dtype=self.rc.compute_dtype,
                    interpret=interpret,
                )
                t_emb = None
                if self.t_embed is not None:
                    t_emb = self.t_embed.apply({"params": params["t"]}, ts)
                return post(_render_rays(
                    fused, self.rc, rays,
                    t_emb=t_emb,
                    sems=sems if self.mc.sem else None,
                    key=None, train=False,
                    occ=occ[0] if occ else None,
                ))
        else:
            @jax.jit
            def render_chunk(params, rays, ts, sems, *occ):
                return post(self._render(params, rays, ts, sems, key=None,
                                         train=False,
                                         occ=occ[0] if occ else None))

        if self.mesh is not None:
            # shard eval rendering over rays: each device renders chunk/n_dev
            # rays of the chunk, outputs gathered (SURVEY.md section 5 —
            # "eval-image rendering sharded over rays and all-gathered")
            mesh = self.mesh
            axis = mesh.axis_names[0]
            n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            chunk = max(chunk // n_dev * n_dev, n_dev)
            inner = render_chunk

            @jax.jit
            def render_chunk(params, rays, ts, sems, *occ):
                def shard_fn(params, rays, ts, sems, *occ):
                    return inner(params, rays, ts, sems, *occ)

                return jax.shard_map(
                    shard_fn, mesh=mesh,
                    in_specs=(P(), P(axis), P(axis), P(axis)) + occ_specs,
                    out_specs=P(axis),
                    check_vma=False,
                )(params, rays, ts, sems, *occ)

        # G chunks render per device dispatch (lax.map: sequential on device,
        # one host round-trip per group). The tunneled chip pays ~seconds of
        # dispatch+fetch latency per execution, so whole-image rendering was
        # RTT-bound at 1 chunk/dispatch; grouping cuts round-trips G-fold.
        # Concurrent dispatches are NOT an alternative: they wedge the
        # tunneled runtime (verify SKILL.md), hence grouping + a depth-2
        # pipeline across groups.
        group = max(int(os.environ.get("SPNERF_EVAL_GROUP", "8")), 1)

        @jax.jit
        def render_group(params, rays_g, ts_g, sems_g, *occ):
            return jax.lax.map(
                lambda a: render_chunk(params, *a, *occ),
                (rays_g, ts_g, sems_g))

        def render_image(params, rays, t, sems=None, occ=None):
            # upload the parameter tree ONCE per image: callers pass host
            # numpy params (jax.device_get in run_validation), and jit does
            # not cache host->device transfers across calls — without this,
            # every group dispatch would re-send ~11 MB of flagship params
            # over the bandwidth-starved tunneled link
            if self.mesh is not None:
                params = jax.device_put(params, NamedSharding(self.mesh, P()))
            else:
                params = jax.device_put(params)
            occ_args = ()
            if with_occ:
                if occ is None:
                    from ..ops.occgrid import init_grid

                    # uniform prior
                    occ = init_grid(self.rc.occ_res, self.rc.occ_frames)
                occ = jnp.asarray(occ)
                occ_args = ((jax.device_put(
                    occ, NamedSharding(self.mesh, P()))
                    if self.mesh is not None else jax.device_put(occ)),)
            n = rays.shape[0]
            n_chunks = -(-n // chunk)
            n_groups = -(-n_chunks // group)
            total = n_groups * group * chunk
            pad = total - n
            r = np.concatenate(
                [rays, np.repeat(rays[-1:], pad, axis=0)], axis=0
            ) if pad else rays
            sm = (np.concatenate([sems, np.repeat(sems[-1:], pad, axis=0)])
                  if sems is not None else np.zeros((total,), np.int32))
            ts = np.full((total,), t, np.int32)
            r = r.reshape(n_groups, group, chunk, r.shape[-1])
            sm = np.asarray(sm).reshape(n_groups, group, chunk)
            ts = ts.reshape(n_groups, group, chunk)

            outs = []
            pending = []  # depth-2 dispatch pipeline across groups

            def materialize(out):
                out = jax.tree_util.tree_map(np.asarray, out)
                outs.append({k: v.reshape((group * chunk,) + v.shape[2:])
                             for k, v in out.items()})

            for g in range(n_groups):
                out = render_group(params, jnp.asarray(r[g]),
                                   jnp.asarray(ts[g]), jnp.asarray(sm[g]),
                                   *occ_args)
                pending.append(out)
                if len(pending) >= 2:
                    materialize(pending.pop(0))
            for item in pending:
                materialize(item)
            full = {k: np.concatenate([o[k] for o in outs], axis=0)[:n]
                    for k in outs[0]}
            return full

        self._render_fn = render_image
        return render_image
