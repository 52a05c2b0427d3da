"""Unified CLI for the reference's standalone helper scripts.

`python -m spnerf_tpu.tools <subcommand>` exposes the library equivalents of
the reference's one-off tools behind real argument parsers (most reference
mains hardcode their paths — /root/reference/datasets/convert2MicMac.py:52-60,
visualization/visualize_depth_in.py:122-169, visualize_depth_out.py:43-48;
only modules/utm_to_geocentric.py:30-36 takes --file_dir/--aoi_id, mirrored
here):

  utm-to-geocentric   MicMac *_3DPts.txt (UTM) -> *_3DPts_ecef.txt
                      (modules/utm_to_geocentric.py:10-29)
  convert-tiff        GeoTIFF -> MicMac-compatible uncompressed TIFF
                      (datasets/convert2MicMac.py:6-32)
  cal-rmse-depth      MAE/RMSE of MicMac input depth vs the lidar DSM
                      (datasets/cal_rmse_depth.py:147-181)
  viz-depth-in        sparse input-depth scatter / overlay / side-by-side
                      (visualization/visualize_depth_in.py)
  viz-dsm             DSM GeoTIFF -> viridis PNG
                      (visualization/visualize_depth_out.py:8-41)
  render              render every validation view (+ DSM/depth/sun/albedo/
                      semantic outputs) from a saved checkpoint. EXCEEDS the
                      reference: its offline eval never runs the network —
                      it can only score images saved during training
                      validation (/root/reference/eval.py:317-334), so a
                      checkpoint whose epoch was not validated with
                      save_images is unevaluable there. Here any checkpoint
                      renders offline, and `python eval.py` can then score it.
"""

import argparse
import glob
import json
import os
import sys


def _cmd_utm_to_geocentric(args):
    from .data.micmac import convert_3dpts_file

    if args.file:
        files = list(args.file)
    else:
        files = sorted(glob.glob(os.path.join(args.file_dir, "*_3DPts.txt")))
        if not files:
            sys.exit(f"no *_3DPts.txt under {args.file_dir}")
    for f in files:
        out = convert_3dpts_file(
            f, aoi_id=args.aoi_id, zone=args.zone,
            northern=not args.south)
        print(f"{f} -> {out}")


def _cmd_convert_tiff(args):
    from .data.micmac import convert_tiff

    os.makedirs(args.out_dir, exist_ok=True)
    for f in args.input:
        out = os.path.join(args.out_dir, os.path.basename(f))
        convert_tiff(f, out)
        print(f"{f} -> {out}")


def _cmd_cal_rmse_depth(args):
    from .data.micmac import cal_rmse_depth

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    stats = cal_rmse_depth(args.pts3d_ecef, args.gt_dir, args.aoi_id,
                           out_dir=args.out_dir)
    print(json.dumps(stats))


def _cmd_viz_depth_in(args):
    from .visualization.depth import visualize_depth_points

    visualize_depth_points(args.pts2d, args.pts3d, args.image,
                           args.out_prefix)
    print(f"wrote {args.out_prefix}_{{raw,overlay,side_by_side}}.png")


def _cmd_viz_dsm(args):
    from .visualization.depth import visualize_dsm

    visualize_dsm(args.dsm, args.output)
    print(f"wrote {args.output}")


def _cmd_render(args):
    from argparse import Namespace

    from .utils.platform import apply_platform_env, enable_compilation_cache

    apply_platform_env()
    enable_compilation_cache()
    import jax

    opts_path = os.path.join(args.run_dir, "logs", "opts.json")
    if not os.path.exists(opts_path):
        sys.exit(f"no {opts_path} — --run_dir must be a training output dir "
                 "(<project>/output/<exp_name>)")
    with open(opts_path) as f:
        rargs = Namespace(**json.load(f))
    if args.dataset_dir:
        # the dataset moved since training: re-derive the per-kind dirs the
        # same way finalize_args does (config.py)
        rargs.dataset_dir = args.dataset_dir
        rargs.depth_dir = os.path.join(args.dataset_dir, "Depth")
        rargs.json_dir = os.path.join(args.dataset_dir, "JSON")
        rargs.img_dir = os.path.join(args.dataset_dir, "RGB", rargs.aoi_id)
        rargs.sem_dir = os.path.join(args.dataset_dir, "Semantic")
        rargs.gt_dir = os.path.join(args.dataset_dir, "Truth")
    if args.chunk:
        rargs.chunk = args.chunk
    if args.img_downscale:
        # render at a different resolution than training: the field is
        # resolution-independent (rays come from the RPC at the requested
        # scale; scene normalization is fixed by the recorded scene.loc),
        # so a ds2-trained model can render its DSM from full-res rays
        rargs.img_downscale = float(args.img_downscale)
    if args.n_samples:
        # denser ray marching at eval only — the field is sample-agnostic;
        # more samples sharpen the composited depth the DSM is splatted from
        rargs.n_samples = int(args.n_samples)
    if args.out_dir:
        rargs.logs_dir = args.out_dir
    os.makedirs(rargs.logs_dir, exist_ok=True)

    from .cli.train import build_trainer_and_scene, run_validation
    from .train.checkpoints import CheckpointManager
    from .utils.logging import MetricLogger

    trainer, scene, steps_per_epoch = build_trainer_and_scene(rargs)
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(os.path.join(args.run_dir, "ckpts"))
    if args.step is None or args.step == "latest":
        step = ckpt.latest_step()
    elif args.step == "best":
        step = ckpt.best_step()
        if step is None:
            sys.exit("no checkpoint carries a val_psnr metric — "
                     "use --step latest or a numeric step")
    else:
        try:
            step = int(args.step)
        except ValueError:
            sys.exit(f"--step must be an integer, 'best' or 'latest' "
                     f"(got {args.step!r})")
    if step is None:
        sys.exit(f"no checkpoints under {args.run_dir}/ckpts")
    restored = ckpt.restore(state, step=step)
    if restored is None:
        sys.exit(f"checkpoint step {step} not found; "
                 f"available: {ckpt.all_steps()}")
    state = restored
    epoch = (args.epoch_number if args.epoch_number is not None
             else int(state.step) // max(steps_per_epoch, 1))
    logger = MetricLogger(rargs.logs_dir, tensorboard=False)
    mean = run_validation(trainer, scene, state, rargs, epoch, logger,
                          save_images=True)
    logger.close()
    ckpt.close()
    print(json.dumps({"step": int(state.step), "epoch_number": epoch,
                      **{k: round(v, 4) for k, v in mean.items()}}))


def _cmd_summarize_runs(args):
    """One table over training runs: per run dir, the recorded flags of
    interest, sustained throughput, and final per-view validation metrics
    (from logs/metrics.jsonl). Beyond the reference (which has no run
    bookkeeping at all); the offline evaluator remains `python eval.py`."""
    import numpy as np

    rows = []
    run_dirs = []
    for d in args.run_dir:
        mpath = os.path.join(d, "logs", "metrics.jsonl")
        if os.path.exists(mpath):
            run_dirs.append(d)
        else:
            run_dirs.extend(sorted(
                p for p in glob.glob(os.path.join(d, "*"))
                if os.path.exists(os.path.join(p, "logs", "metrics.jsonl"))))
    for d in run_dirs:
        name = os.path.basename(os.path.normpath(d))
        opts = {}
        opath = os.path.join(d, "logs", "opts.json")
        if os.path.exists(opath):
            with open(opath) as f:
                opts = json.load(f)
        last_step, rays, finals = 0, [], {}
        with open(os.path.join(d, "logs", "metrics.jsonl")) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                split = rec.get("split", "")
                step = int(rec.get("step", 0))
                if split == "train":
                    last_step = max(last_step, step)
                    if "rays_per_sec" in rec:
                        rays.append(float(rec["rays_per_sec"]))
                elif split.startswith("val_"):
                    # keep the NEWEST record per view
                    view = split[4:]
                    if step >= finals.get(view, (0, None))[0]:
                        finals[view] = (step, rec)
        # sustained rate: median of logged windows (first window includes
        # compile time, validation-adjacent windows run short)
        rate = float(np.median(rays)) if rays else float("nan")
        row = {"run": name, "steps": last_step, "rays_per_sec": round(rate),
               "encoding": opts.get("encoding", "?"),
               "views": {}}
        for view, (step, rec) in sorted(finals.items()):
            row["views"][view] = {k: round(float(rec[k]), 3)
                                  for k in ("psnr", "ssim", "mae")
                                  if k in rec and np.isfinite(rec[k])}
        rows.append(row)
    if args.json:
        print(json.dumps(rows))
        return
    def _view_label(v):
        # "JAX_269_011_RGB" -> "011"; keep any multi-AOI ".fN" frame suffix
        # ("JAX_269_011_RGB.f1" -> "011.f1"); fall back to the full name for
        # ids with fewer than two '_'-separated parts.
        parts = v.split("_")
        if len(parts) < 2:
            return v
        label = parts[-2]
        if "." in parts[-1]:
            label += parts[-1][parts[-1].index("."):]
        return label

    for row in rows:
        views = "  ".join(
            f"{_view_label(v)}: "
            + "/".join(str(m.get(k, "—")) for k in ("psnr", "ssim", "mae"))
            for v, m in row["views"].items())
        print(f"{row['run']:<16} {row['encoding']:<6} "
              f"step {row['steps']:<6} {row['rays_per_sec']:>7,} rays/s  "
              f"{views}")


def _cmd_warm_cache(args):
    """Pre-compile the steady-state training programs into the persistent XLA
    compilation cache (~/.cache/spnerf_jax).

    A fresh container starts with an empty cache; the first `bench.py` then
    spends ~7 min in remote compiles. Running this once early makes the later
    bench (and any same-shaped run) start warm: it compiles (1) the exact
    flagship scan-window program bench.py times, (2) a hash-encoding window
    (L8F4, T=2^19 — the hash defaults), (3) an occgrid flagship window. Real
    dataset runs compile their own scene-shaped programs on first window;
    this covers the synthetic-scene surface the driver exercises."""
    import time

    from .utils.platform import apply_platform_env, enable_compilation_cache

    apply_platform_env()
    enable_compilation_cache()
    import dataclasses

    import jax
    import numpy as np

    from .train.loop import Trainer
    from .utils.synth import bench_setup, fake_batch, flagship_configs

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        print(f"warmed {name} in {time.perf_counter() - t0:.1f} s",
              flush=True)

    def flagship():
        tr, state, data, run = bench_setup()
        state, ld = run(state, data, jax.random.PRNGKey(1))
        float(ld["loss"])  # host fetch = unambiguous sync

    timed("flagship scan window (bench program)", flagship)

    if not args.skip_hash:
        def hash_window():
            mc, rc, lc = flagship_configs()
            mc = dataclasses.replace(mc, encoding="hash")
            tr = Trainer(mc, rc, lc, lr=1e-2, steps_per_epoch=1000,
                         max_steps=30000)
            state = tr.init_state(jax.random.PRNGKey(0))
            data = {k: jax.numpy.asarray(v) for k, v in
                    fake_batch(np.random.default_rng(0), 65536).items()}
            # window bounded by the tunneled runtime's sparse-op budget
            run = tr.build_train_scan(1024, 25)
            state, ld = run(state, data, jax.random.PRNGKey(1))
            float(ld["loss"])

        timed("hash scan window", hash_window)

    if not args.skip_occgrid:
        def occ_window():
            mc, rc, lc = flagship_configs(n_samples=32)
            rc = dataclasses.replace(rc, occ_grid=True)
            tr = Trainer(mc, rc, lc, lr=5e-4, steps_per_epoch=1000,
                         max_steps=30000)
            state = tr.init_state(jax.random.PRNGKey(0))
            data = {k: jax.numpy.asarray(v) for k, v in
                    fake_batch(np.random.default_rng(0), 65536).items()}
            run = tr.build_train_scan(1024, 100)
            state, ld = run(state, data, jax.random.PRNGKey(1))
            float(ld["loss"])

        timed("occgrid scan window", occ_window)


def build_parser():
    p = argparse.ArgumentParser(
        prog="python -m spnerf_tpu.tools",
        description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="command", required=True)

    u = sub.add_parser("utm-to-geocentric",
                       help="MicMac *_3DPts.txt (UTM) -> *_3DPts_ecef.txt")
    u.add_argument("--file_dir", type=str,
                   help="directory of *_3DPts.txt files (reference flag)")
    u.add_argument("--file", type=str, nargs="*",
                   help="explicit file list (alternative to --file_dir)")
    u.add_argument("--aoi_id", type=str,
                   help="AOI id whose city prefix selects the UTM zone "
                        "(e.g. JAX_269)")
    u.add_argument("--zone", type=int, default=None,
                   help="explicit UTM zone (overrides --aoi_id)")
    u.add_argument("--south", action="store_true",
                   help="southern hemisphere (default northern)")
    u.set_defaults(fn=_cmd_utm_to_geocentric)

    c = sub.add_parser("convert-tiff",
                       help="re-encode GeoTIFFs MicMac-compatibly")
    c.add_argument("input", type=str, nargs="+")
    c.add_argument("--out_dir", type=str, required=True)
    c.set_defaults(fn=_cmd_convert_tiff)

    r = sub.add_parser("cal-rmse-depth",
                       help="score MicMac input depth against the lidar DSM")
    r.add_argument("--pts3d_ecef", type=str, required=True)
    r.add_argument("--gt_dir", type=str, required=True,
                   help="directory with <aoi>_DSM.{tif,txt}")
    r.add_argument("--aoi_id", type=str, required=True)
    r.add_argument("--out_dir", type=str, default=None,
                   help="optionally save the rasterized depth DSM here")
    r.set_defaults(fn=_cmd_cal_rmse_depth)

    vi = sub.add_parser("viz-depth-in",
                        help="visualize sparse input depth on the image")
    vi.add_argument("--pts2d", type=str, required=True)
    vi.add_argument("--pts3d", type=str, required=True)
    vi.add_argument("--image", type=str, required=True)
    vi.add_argument("--out_prefix", type=str, required=True)
    vi.set_defaults(fn=_cmd_viz_depth_in)

    vo = sub.add_parser("viz-dsm", help="DSM GeoTIFF -> viridis PNG")
    vo.add_argument("dsm", type=str)
    vo.add_argument("output", type=str)
    vo.set_defaults(fn=_cmd_viz_dsm)

    rd = sub.add_parser(
        "render",
        help="render validation views + DSM from a saved checkpoint "
             "(offline; the reference can only score images saved during "
             "training)")
    rd.add_argument("--run_dir", type=str, required=True,
                    help="training output dir: <project>/output/<exp_name>")
    rd.add_argument("--step", type=str, default=None,
                    help="checkpoint step to restore: a step number, 'best' "
                         "(highest recorded val_psnr) or 'latest' (default)")
    rd.add_argument("--epoch_number", type=int, default=None,
                    help="epoch label in output filenames (default: "
                         "step // steps_per_epoch, the label training would "
                         "have used)")
    rd.add_argument("--chunk", type=int, default=None,
                    help="override the recorded render chunk size")
    rd.add_argument("--img_downscale", type=float, default=None,
                    help="render at this downscale instead of the training "
                         "one (e.g. 1 to extract a full-resolution DSM from "
                         "a ds2-trained model)")
    rd.add_argument("--n_samples", type=int, default=None,
                    help="coarse samples per ray at render time (denser "
                         "marching than training sharpens the depth/DSM)")
    rd.add_argument("--dataset_dir", type=str, default=None,
                    help="override the recorded dataset location "
                         "(relocated runs)")
    rd.add_argument("--out_dir", type=str, default=None,
                    help="write logs/{val,train}/... outputs here instead "
                         "of the run's own logs dir")
    rd.set_defaults(fn=_cmd_render)

    sr = sub.add_parser(
        "summarize-runs",
        help="tabulate throughput + final per-view validation metrics "
             "across training run dirs (reads logs/metrics.jsonl)")
    sr.add_argument("run_dir", nargs="+",
                    help="run dirs (<project>/output/<exp>) or a parent "
                         "output/ dir to scan")
    sr.add_argument("--json", action="store_true",
                    help="machine-readable output")
    sr.set_defaults(fn=_cmd_summarize_runs)

    wc = sub.add_parser(
        "warm-cache",
        help="pre-compile the steady-state training programs into the "
             "persistent XLA compilation cache (fresh containers start "
             "cold; this turns the first bench.py from ~7 min into <1 min)")
    wc.add_argument("--skip-hash", action="store_true",
                    help="skip the hash-encoding window program")
    wc.add_argument("--skip-occgrid", action="store_true",
                    help="skip the occgrid window program")
    wc.set_defaults(fn=_cmd_warm_cache)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if (args.command == "utm-to-geocentric" and args.zone is None
            and not args.aoi_id):
        sys.exit("utm-to-geocentric needs --aoi_id or --zone")
    if (args.command == "utm-to-geocentric" and not args.file
            and not args.file_dir):
        sys.exit("utm-to-geocentric needs --file_dir or --file")
    args.fn(args)


if __name__ == "__main__":
    main()
