"""Training entry point — CLI-compatible with the reference `python main.py ...`
(/root/reference/main.py:305-338 + modules/opt.py flag surface).

Structure of a run (mirroring the reference contract):
  output/<exp>/{ckpts, logs}; logs/opts.json config dump; train/test.txt copies;
  logs/{val,train}/{depth,dsm,rgb,gt_rgb,semantic,sun,albedo,beta,sky}/ images on
  save epochs; metrics.jsonl (+ TensorBoard) scalars; orbax checkpoints ranked by
  val/psnr; validation every --check_val_every_n_epoch epochs with PSNR/SSIM/MAE.

TPU-native differences (by design): one jitted train step over device-resident
data (no DataLoader), shard_map data parallelism over all local devices, keyed
deterministic PRNG end to end.
"""

import os
import shutil
import time

import numpy as np

import jax

from ..config import (
    build_train_parser,
    finalize_args,
    loss_config_from_args,
    model_config_from_args,
    parse_xla_opts,
    render_config_from_args,
)
from ..data import load_scene
from ..evaluation import compute_mae_and_save_dsm_diff, psnr, ssim
from ..evaluation.metrics import miou, overall_accuracy
from ..evaluation.dsm import dsm_from_latlonalt
from ..evaluation.outputs import save_nerf_output_to_images
from ..parallel import data_mesh
from ..train.checkpoints import CheckpointManager
from ..train.loop import Trainer, scene_to_device_arrays
from ..utils.logging import MetricLogger


def predefined_val_ts(img_id):
    """Transient-embedding index used at test time (reference eval.py:23-24)."""
    return 0


def _aoi_dirs(args, aoi):
    """Per-AOI dataset directories. Multi-AOI runs use one dataset dir per AOI:
    <project>/dataset/DFC2019_<n> by the DFC2019 naming convention, or an
    explicit --dataset_dir containing an {aoi} placeholder."""
    if args.dataset_dir and "{aoi}" in args.dataset_dir:
        base = args.dataset_dir.format(aoi=aoi)
    elif aoi == args.aoi_id.split(",")[0].strip() and "," not in args.aoi_id:
        return {"json_dir": args.json_dir, "img_dir": args.img_dir,
                "depth_dir": args.depth_dir, "sem_dir": args.sem_dir,
                "gt_dir": args.gt_dir}
    else:
        base = os.path.join(args.project_dir, "dataset",
                            f"DFC2019_{aoi.split('_')[-1]}")
    return {
        "json_dir": os.path.join(base, "JSON"),
        "img_dir": os.path.join(base, "RGB", aoi),
        "depth_dir": os.path.join(base, "Depth"),
        "sem_dir": os.path.join(base, "Semantic"),
        "gt_dir": os.path.join(base, "Truth"),
    }


def build_trainer_and_scene(args, mesh=None):
    kwargs = dict(
        img_downscale=args.img_downscale, stdscale=args.stdscale,
        margin=args.margin, sem=args.sem, num_sem_classes=args.num_sem_classes,
        dense_ss=args.dense_ss, sem_downscale=args.sem_downscale,
        load_depth=args.depth or args.model == "sp-nerf",
        cache_dir=args.cache_dir,
    )
    aois = [a.strip() for a in args.aoi_id.split(",") if a.strip()]
    if len(aois) > 1:
        from ..data.multi import load_scenes

        scene = load_scenes(aois, lambda a: _aoi_dirs(args, a), **kwargs)
    else:
        scene = load_scene(
            args.json_dir, args.img_dir, args.depth_dir, args.sem_dir,
            args.aoi_id, **kwargs,
        )
    steps_per_epoch = max(len(scene) // args.batch_size, 1)
    trainer = Trainer(
        model_config_from_args(args),
        render_config_from_args(args),
        loss_config_from_args(args),
        lr=args.lr,
        lr_gamma=getattr(args, "lr_gamma", 0.9),
        steps_per_epoch=steps_per_epoch,
        max_steps=args.max_train_steps,
        ds_drop=args.ds_drop,
        ss_drop=args.ss_drop,
        noise_std=args.noise_std,
        # jnp.take CLAMPS out-of-range ids (torch's nn.Embedding would raise),
        # so an undersized vocab would silently alias every extra image onto
        # the last embedding row — size it to the scene (multi-AOI offsets
        # make ids unique across AOIs, data/multi.py)
        t_vocab=max(args.t_embbeding_vocab, _scene_t_vocab(scene)),
        mesh=mesh,
        table_wd=getattr(args, "hash_table_wd", 0.0),
        table_level_lr_decay=getattr(args, "hash_level_lr_decay", 1.0),
        weight_decay=getattr(args, "weight_decay", 0.0),
        grad_clip=getattr(args, "grad_clip", 0.0),
        occ_rows=getattr(args, "occ_rows", 4096),
        occ_decay=getattr(args, "occ_decay", 0.8),
        compiler_options=parse_xla_opts(getattr(args, "xla_opts", "")),
    )
    return trainer, scene, steps_per_epoch


def _scene_t_vocab(scene):
    """Smallest transient-embedding vocab covering every train ray id and
    validation record of the (possibly multi-AOI) scene."""
    need = int(np.max(scene.ids)) + 1
    if hasattr(scene, "validation_items"):
        recs = (rec for _, _, rec in scene.validation_items())
    else:
        recs = iter(scene.val_images)
    for rec in recs:
        need = max(need, int(rec.t) + 1)
    return need


def _val_metrics(mean):
    """Checkpoint metrics dict from a validation summary. A NaN val_psnr
    (validation produced no val rows) would sort ABOVE real metrics in
    orbax's best_fn ordering; substitute -inf so metric-less saves never
    outrank real ones in `best_step()` / `tools render --step best`."""
    psnr_v = mean.get("psnr", float("nan"))
    if psnr_v != psnr_v:  # NaN
        psnr_v = float("-inf")
    return {"val_psnr": float(psnr_v)}


def _val_labels(items):
    """Per-item log labels for validation records. Multi-AOI runs can repeat
    an AOI (disjoint frame copies), which repeats image ids verbatim in the
    val log / metrics.jsonl; suffix a frame index so per-frame rows stay
    distinguishable. Unique ids (single-AOI, distinct AOIs) are unchanged."""
    frame_of, counts = {}, {}
    for _, sub, rec in items:
        frame_of.setdefault(id(sub), len(frame_of))
        counts[rec.img_id] = counts.get(rec.img_id, 0) + 1
    return [rec.img_id if counts[rec.img_id] == 1
            else f"{rec.img_id}.f{frame_of[id(sub)]}"
            for _, sub, rec in items]


def run_validation(trainer, scene, state, args, epoch, logger, save_images):
    """Render every validation image; log PSNR/SSIM/MAE
    (reference validation_step, main.py:188-299). `scene` is a SatelliteScene
    or a MultiScene (multi-AOI)."""
    render = trainer._render_fn or trainer.build_render_fn(chunk=args.chunk)
    params = jax.device_get(state.params)
    all_scalars = []
    if hasattr(scene, "validation_items"):
        items = list(scene.validation_items())
    else:
        items = [(args.aoi_id, scene, rec) for rec in scene.val_images]
    labels = _val_labels(items)
    for i, (aoi_id, sub_scene, rec) in enumerate(items):
        gt_dir = (_aoi_dirs(args, aoi_id)["gt_dir"]
                  if "," in args.aoi_id else args.gt_dir)
        sample = sub_scene.load_val_image(rec, with_sem=args.sem)
        t = predefined_val_ts(rec.img_id)
        # --occgrid: eval renders place samples by the trained grid too, so
        # validation measures the same sampling the model was trained under
        out = render(params, sample["rays"], t, sample.get("sems"),
                     occ=jax.device_get(state.occ))
        typ = "fine" if "rgb_fine" in out else "coarse"
        h, w = sample["h"], sample["w"]
        img = out[f"rgb_{typ}"].reshape(h, w, 3)
        gt = sample["rgbs"].reshape(h, w, 3)
        # on-device metrics: SSIM is shift-and-add (evaluation/metrics.py),
        # which avoids the depthwise conv the tunneled 'axon' platform
        # miscompiles — verified to match the CPU backend on hardware
        psnr_v = float(psnr(jax.numpy.asarray(img), jax.numpy.asarray(gt)))
        ssim_v = float(ssim(jax.numpy.asarray(img), jax.numpy.asarray(gt)))

        split = "train" if i == 0 else "val"  # image 0 is the train-debug view
        out_dir = os.path.join(args.logs_dir, split)
        mae_v = float("nan")
        try:
            depth = np.asarray(out[f"depth_{typ}"])
            lats, lons, alts = sub_scene.latlonalt_from_depth(sample["rays"], depth)
            tmp_dsm = os.path.join(out_dir, "dsm",
                                   f"tmp_pred_dsm_{rec.img_id}.tif")
            os.makedirs(os.path.dirname(tmp_dsm), exist_ok=True)
            dsm_from_latlonalt(lats, lons, alts, dsm_path=tmp_dsm)
            mae_v = compute_mae_and_save_dsm_diff(
                tmp_dsm, rec.img_id, aoi_id, gt_dir,
                os.path.join(out_dir, "dsm"), epoch, save=False,
            )
            os.remove(tmp_dsm)
        except Exception as exc:  # reference swallows MAE failures (main.py:272-287)
            print(f"MAE computation failed for {rec.img_id}: {exc}")

        if save_images:
            save_nerf_output_to_images(sub_scene, sample, out, out_dir, epoch,
                                       args.num_sem_classes, label=labels[i])

        # TensorBoard image grid: GT / prediction / depth (+ sem colors),
        # like reference main.py:221-250
        try:
            from ..evaluation.outputs import (
                convert_semantic_to_color,
                visualize_depth,
            )

            grid = [np.moveaxis(np.asarray(gt), -1, 0),
                    np.moveaxis(np.asarray(img), -1, 0),
                    np.moveaxis(
                        visualize_depth(
                            np.asarray(out[f"depth_{typ}"]).reshape(h, w)
                        ).astype(np.float32) / 255.0, -1, 0)]
            if f"sem_logits_{typ}" in out and "sems" in sample:
                pred_sem = np.argmax(out[f"sem_logits_{typ}"], -1).reshape(h, w)
                gt_sem = np.asarray(sample["sems"]).reshape(h, w)
                for sm in (gt_sem, pred_sem):
                    grid.append(np.moveaxis(
                        convert_semantic_to_color(
                            sm, args.num_sem_classes
                        ).astype(np.float32) / 255.0, -1, 0))
            logger.log_images(int(state.step),
                              f"{split}_{i}/GT_pred_depth_sems",
                              np.stack(grid))
        except Exception as exc:
            # image grids are best-effort, but never fail silently
            print(f"validation image grid failed for {rec.img_id}: {exc!r}")
        scalars = {"psnr": psnr_v, "ssim": ssim_v, "mae": mae_v}
        # semantic quality: the reference defines mIoU/OA but leaves them
        # commented out of its val loop (main.py:264-269,
        # modules/metrics.py:218-246) — surface them here. Pixels without a
        # ground-truth label (< 0) are excluded.
        if f"sem_logits_{typ}" in out and "sems" in sample:
            pred_sem = np.argmax(np.asarray(out[f"sem_logits_{typ}"]), -1).ravel()
            gt_sem = np.asarray(sample["sems"]).ravel()
            labeled = gt_sem >= 0
            if labeled.any():
                scalars["miou"] = float(miou(pred_sem[labeled],
                                             gt_sem[labeled],
                                             args.num_sem_classes))
                scalars["oa"] = float(overall_accuracy(pred_sem[labeled],
                                                       gt_sem[labeled]))
        logger.log(int(state.step), scalars, split=f"{split}_{labels[i]}")
        if split == "val":
            all_scalars.append(scalars)
        sem_str = (f" miou {scalars['miou']:.3f} oa {scalars['oa']:.3f}"
                   if "miou" in scalars else "")
        print(f"[val e{epoch}] {labels[i]}: psnr {psnr_v:.2f} ssim {ssim_v:.3f} "
              f"mae {mae_v:.3f}{sem_str}")

    keys = ("psnr", "ssim", "mae") + (
        ("miou", "oa") if any("miou" in s for s in all_scalars) else ())
    mean = {k: float(np.nanmean([s[k] for s in all_scalars if k in s]))
            for k in keys} if all_scalars else {}
    if mean:
        logger.log(int(state.step), mean, split="val")
    return mean


def _watchdog_supervise(args, argv):
    """Supervisor loop for --watchdog N: run the training CLI in a child
    process, kill + relaunch it with --auto_resume whenever metrics.jsonl
    stops advancing for N seconds or the child dies nonzero (the tunneled TPU
    runtime both hangs mid-dispatch and faults spontaneously — CLAUDE.md).
    The reference has no recovery story at all (SURVEY.md section 5: crash
    resume only via a manual --ckpt_path)."""
    import subprocess
    import sys

    # strip any user --exp_name and pin the RESOLVED one (plus
    # --no_timestamp_exp_name): a timestamped exp dir would make every child
    # derive a fresh directory and defeat both resume and progress monitoring
    base = []
    it = iter(list(argv))
    for a in it:
        if a == "--exp_name":
            next(it, None)
            continue
        if a.startswith("--exp_name="):
            continue
        base.append(a)
    cmd = ([sys.executable, "-m", "spnerf_tpu.cli.train"] + base
           + ["--exp_name", args.exp_name, "--no_timestamp_exp_name"])
    if "--auto_resume" not in cmd:
        cmd.append("--auto_resume")
    env = dict(os.environ, SPNERF_WATCHDOG_CHILD="1")
    # `-m spnerf_tpu.cli.train` must resolve regardless of the cwd the user
    # launched main.py from (running `python /path/to/main.py` from
    # elsewhere left the package unimportable in the child: 20 failed
    # relaunches on hardware before this fix)
    pkg_root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    metrics_path = os.path.join(args.logs_dir, "metrics.jsonl")
    poll_s = max(min(args.watchdog / 10.0, 5.0), 0.05)

    for attempt in range(args.watchdog_max_restarts + 1):
        if attempt:
            print(f"[watchdog] relaunch {attempt}/{args.watchdog_max_restarts}",
                  flush=True)
        child = subprocess.Popen(cmd, env=env)
        last_progress = time.time()
        # startup (imports, data load, checkpoint restore, first-window
        # compile) writes no metrics: give it a 3x grace so the watchdog can
        # be sized for the STEADY-STATE window cadence instead of the
        # worst-case cold compile, and so a loaded host doesn't kill children
        # mid-startup in a loop (observed as a flaky CI failure)
        try:
            last_mtime = os.path.getmtime(metrics_path)
        except OSError:
            last_mtime = None
        progressed = False
        killed = False
        while True:
            rc = child.poll()
            if rc is not None:
                break
            try:
                mtime = os.path.getmtime(metrics_path)
            except OSError:
                mtime = None
            if mtime is not None and mtime != last_mtime:
                last_mtime = mtime
                last_progress = time.time()
                progressed = True
            limit = args.watchdog if progressed else 3 * args.watchdog
            if time.time() - last_progress > limit:
                print(f"[watchdog] no progress for {limit}s; "
                      f"killing pid {child.pid}", flush=True)
                child.kill()
                child.wait()
                killed = True
                break
            time.sleep(poll_s)
        if not killed and rc == 0:
            return 0
        if not killed:
            print(f"[watchdog] child exited rc={rc}; relaunching", flush=True)
    raise SystemExit(
        f"watchdog: giving up after {args.watchdog_max_restarts} relaunches")


def main(argv=None):
    import sys

    from ..utils.platform import apply_platform_env

    apply_platform_env()
    parser = build_train_parser()
    args = parser.parse_args(argv)
    finalize_args(args)

    if (args.watchdog > 0
            and os.environ.get("SPNERF_WATCHDOG_CHILD") != "1"):
        return _watchdog_supervise(
            args, argv if argv is not None else sys.argv[1:])

    for split_file in ("train.txt", "test.txt"):
        src = os.path.join(args.json_dir, split_file)
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(args.logs_dir, split_file))

    n_dev = jax.device_count()
    use_dev = args.data_axis if args.data_axis > 0 else n_dev
    mesh = data_mesh(use_dev) if use_dev > 1 else None
    print(f"devices: {n_dev} available, {use_dev} used "
          f"({'mesh' if mesh else 'single'})")

    trainer, scene, steps_per_epoch = build_trainer_and_scene(args, mesh)
    print(f"scene: {len(scene)} rays, {steps_per_epoch} steps/epoch")

    key = jax.random.PRNGKey(args.seed)
    state = trainer.init_state(key)
    ckpt = CheckpointManager(args.ckpts_dir)
    if args.ckpt_path:
        restored = CheckpointManager(args.ckpt_path).restore(state)
        if restored is not None:
            state = restored
            print(f"resumed from {args.ckpt_path} at step {int(state.step)}")
    elif getattr(args, "auto_resume", False):
        # relaunch-and-continue for flaky runtimes: pick up this experiment's
        # newest checkpoint if one exists (the tunneled TPU worker can fault
        # spontaneously, killing the process but not the saved state)
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            print(f"auto-resumed {args.exp_name} at step {int(state.step)}")
        else:
            print(f"auto-resume: no checkpoint under {args.ckpts_dir}, "
                  "starting fresh")
    state = trainer.replicate_state(state)

    data = trainer.shard_data(scene_to_device_arrays(scene))
    # one host dispatch drives a whole logging window via lax.scan — no
    # per-step dispatch latency, and (on XLA:CPU) no concurrent in-flight
    # executions of a collective program (which deadlock its rendezvous)
    window_len = max(1, min(getattr(args, "log_every", 100),
                            args.max_train_steps))
    if args.encoding == "hash":
        # Long scans of the hash train step crash the tunneled TPU runtime
        # ("kernel fault", worker restart). Measured boundary (round 2):
        # trips x sparse-ops-per-step <= 2400 is safe (full config window 25,
        # light window 50), >= 4800 crashes (full window 50, light window
        # 200). A pure gather+scatter scan at 6400 sparse ops runs fine, and
        # lax.scan compiles its body once regardless of length — so this is a
        # runtime resource limit on sparse ops RETIRED per program execution
        # when interleaved with dense compute, not program size. Cap the scan
        # window so each dispatched program stays under the measured-safe
        # budget; correctness is unaffected (windows chain).
        n_enc_passes = (1 + int(args.guidedsample) + int(args.sc_lambda > 0)
                        + 2 * int(args.n_importance > 0))
        # +8: per-step sparse ops OUTSIDE the encoding (7 batch gathers in
        # Trainer._step_impl, transient-embedding gather) share the budget;
        # --occgrid adds one grid gather (occ_z_vals) PLUS a full
        # hash-encoding forward inside update_grid's sigma_fn (~hash_levels
        # table gathers — stop_gradient drops only the backward); the slab
        # update itself is pure dynamic_slice and costs none
        sparse_per_step = (n_enc_passes * (2 * args.hash_levels + 2) + 8
                           + (1 + args.hash_levels)
                           * int(getattr(args, "occgrid", False)))
        window_len = min(window_len, max(1, 2400 // sparse_per_step))
    run_window = trainer.build_train_scan(args.batch_size, window_len)
    run_tail = None
    trainer.build_render_fn(chunk=args.chunk)
    logger = MetricLogger(args.logs_dir)

    start_step = int(jax.device_get(state.step))
    if start_step >= args.max_train_steps:
        # a completed run re-invoked (e.g. an --auto_resume retry wrapper
        # looping after success): exit cleanly instead of re-validating and
        # tripping orbax's StepAlreadyExistsError on the final save
        print(f"already trained to step {start_step} >= "
              f"{args.max_train_steps}; nothing to do")
        logger.close()
        ckpt.close()
        return state
    run_key = jax.random.PRNGKey(args.seed + 1)
    last_epoch_validated = -1
    last_saved_step = -1
    t0 = time.time()
    step = start_step
    profiled = False
    while step < args.max_train_steps:
        # profile the second window (steady-state, post-compile)
        do_profile = (getattr(args, "profile", False) and not profiled
                      and step >= start_step + window_len)
        if do_profile:
            from ..utils.profiling import trace as profile_trace

            profiled = True
            profile_cm = profile_trace(os.path.join(args.logs_dir, "profile"))
            profile_cm.__enter__()
        remaining = args.max_train_steps - step
        if remaining >= window_len:
            state, loss_dict = run_window(state, data, run_key)
            done = window_len
        else:
            if run_tail is None:
                run_tail = trainer.build_train_scan(args.batch_size, remaining)
            state, loss_dict = run_tail(state, data, run_key)
            done = remaining
        step += done

        ld = jax.device_get(loss_dict)  # sync point
        if do_profile:
            profile_cm.__exit__(None, None, None)
        dt = time.time() - t0
        rays_s = done * args.batch_size / max(dt, 1e-9)
        logger.log(step, {**{k: float(v) for k, v in ld.items()},
                          "rays_per_sec": rays_s})
        print(f"step {step}: loss {float(ld['loss']):.5f} "
              f"psnr {float(ld['psnr']):.2f} | {rays_s:,.0f} rays/s")

        # test hook: simulate ONE mid-run hang (the tunneled-runtime failure
        # mode the watchdog exists for). First process to reach this point
        # creates the marker and stalls forever; relaunches proceed normally.
        hang_marker = os.environ.get("SPNERF_TEST_HANG_ONCE")
        if hang_marker and not os.path.exists(hang_marker):
            with open(hang_marker, "w"):
                pass
            print("[test-hook] simulating hang", flush=True)
            while True:
                time.sleep(3600)

        # validation when an eligible epoch boundary was crossed this window
        # (boundaries align to the window start within < window_len steps)
        epoch = step // steps_per_epoch
        if (epoch > 0 and epoch != last_epoch_validated
                and epoch % args.check_val_every_n_epoch == 0
                and step % steps_per_epoch < window_len):
            last_epoch_validated = epoch
            save_images = epoch % args.save_every_n_epochs == 0
            mean = run_validation(trainer, scene, state, args, epoch, logger,
                                  save_images)
            ckpt.save(step, state, metrics=_val_metrics(mean))
            last_saved_step = step
        t0 = time.time()

    # final validation+save — unless the loop's last window already validated
    # and saved at exactly max_train_steps (an aligned epoch boundary), where
    # a second ckpt.save(step) would raise orbax's StepAlreadyExistsError
    if last_saved_step != args.max_train_steps:
        mean = run_validation(trainer, scene, state, args,
                              args.max_train_steps // steps_per_epoch, logger,
                              True)
        ckpt.save(args.max_train_steps, state, metrics=_val_metrics(mean))
    logger.close()
    # surface best-by-val_psnr vs latest (reference ModelCheckpoint prints the
    # best ckpt path at the end, /root/reference/main.py:315-320)
    best = ckpt.best_step()
    latest = ckpt.latest_step()
    if latest is not None:
        print(f"latest checkpoint: step {latest} ({ckpt.step_path(latest)})")
    if best is not None:
        print(f"best checkpoint (val_psnr): step {best} "
              f"({ckpt.step_path(best)}) — render it offline with "
              f"`python -m spnerf_tpu.tools render --run_dir "
              f"{os.path.dirname(args.ckpts_dir)} --step best`")
    ckpt.close()
    print("training complete")
    return state


if __name__ == "__main__":
    main()
