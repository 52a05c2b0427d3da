"""Configuration: flag surface, derived paths, and semantic class tables.

Mirrors the reference CLI contract (`Train_parser`, /root/reference/modules/opt.py:11-139)
flag-for-flag so a user of the reference can switch without relearning the interface,
while fixing its documented quirks:

  * `--dataset_dir` is a real flag (the reference hard-codes
    `<project>/dataset/DFC2019_269`, /root/reference/modules/opt.py:112-114);
  * `--exp_name` gets a timestamp suffix only when `--timestamp_exp_name` is set
    (default on, matching the reference behavior);
  * everything relevant to jit is carried in hashable frozen dataclasses so the
    train step compiles exactly once.
"""

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass
from datetime import datetime
from typing import Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Static architecture parameters of the SPNeRF field (hashable, jit-static)."""

    fc_layers: int = 8
    fc_units: int = 512
    skips: Tuple[int, ...] = (4,)
    mapping: bool = False
    mapping_sizes: Tuple[int, int] = (10, 4)
    siren: bool = True
    num_sem_classes: int = 5
    s_embedding_factor: int = 1
    t_embedding_dims: int = 4
    beta: bool = False
    sem: bool = False
    encoding: str = "siren"  # "siren" (SP-NeRF flagship) | "hash" (NGP-style)
    # hash-encoding geometry (encoding="hash" only). The TPU is
    # latency-bound on the per-(point, corner, level) gather/scatter rows,
    # so fewer, wider levels speed the step proportionally (rows scale with
    # hash_levels at constant total feature width). 8x4 is the measured
    # sweet spot on the v5e: 2.7x faster than NGP-classic 16x2 with equal
    # metrics on the bundled scene (README round-2); 16x2 remains available.
    hash_levels: int = 8
    hash_features: int = 4
    hash_log2T: int = 19
    hash_impl: str = "auto"  # "auto" | "xla" | "sorted_vjp" | "matmul_vjp" | "fused_vjp"
    # width of the NGP-style trunk/head MLPs (reference counterpart: the
    # Instant-NGP "small MLP" — 64 is NGP-classic). The hash step is
    # gather-bound on the v5e, so wider trunks are nearly free; a capacity
    # knob for scenes the 64-wide trunk underfits (e.g. multi-AOI, where
    # the trunk+heads are shared across disjoint frames)
    hash_hidden: int = 64
    hash_frames: int = 1  # disjoint multi-AOI frames (data/multi.py)
    # NGP direct (collision-free) indexing for levels whose dense grid fits
    # the table; False reproduces round<=2 checkpoints (hash everywhere)
    hash_direct_coarse: bool = True
    # store each level's table as one flat FEATURE-MAJOR (T*F,) row —
    # numerically identical, avoids TPU layout padding/conversion on the
    # narrow F-minor (T, F) shape (266.6 -> 220.1 ms/step integrated at
    # T=2^19); False reproduces round<=3 checkpoints (param shapes)
    hash_flat_table: bool = True
    # coarse-to-fine level annealing (BARF/nerfstudio practice, opt-in, no
    # reference counterpart): during the first N training steps the fine
    # levels' features ramp in linearly (the 2 coarsest levels are always
    # on), steering early optimization toward low-frequency structure.
    # 0 = off (default; bit-identical to pre-flag behavior). Training-only:
    # eval renders run fully open, which coincides once step >= N.
    hash_anneal_steps: int = 0


@dataclass(frozen=True)
class RenderConfig:
    """Static rendering parameters (hashable, jit-static)."""

    n_samples: int = 64
    n_importance: int = 0
    guidedsample: bool = False
    solar_correction: bool = False  # derived from sc_lambda > 0
    beta: bool = False
    sem: bool = False
    perturb: float = 1.0  # reference hard-codes 1.0 (modules/rendering.py:125)
    compute_dtype: str = "float32"  # "bfloat16" on TPU for the MLP matmuls
    use_pallas: bool = False  # fused Pallas MLP kernel for the field evaluation
    proposal: bool = False  # density-only proposal sampler (NGP-class stretch)
    n_proposal: int = 64  # proposal samples per ray
    # occupancy-grid guided coarse sampling (--occgrid, ops/occgrid.py):
    # redistributes the static coarse sample budget by a cached density grid
    # (NGP-style; no reference counterpart). Mutually exclusive with proposal.
    occ_grid: bool = False
    occ_res: int = 64  # grid resolution per axis (res^3 cells per frame)
    occ_bins: int = 128  # per-ray depth bins weighted by the grid
    occ_floor: float = 0.01  # uniform exploration floor per bin
    occ_frames: int = 1  # multi-AOI: one res^3 block per translated frame


@dataclass(frozen=True)
class LossConfig:
    """Static loss parameters (hashable, jit-static)."""

    sc_lambda: float = 0.0
    beta: bool = False
    ds_lambda: float = 0.0
    depth: bool = False
    gnll: bool = False
    usealldepth: bool = False
    margin: float = 0.0001
    stdscale: float = 1.0
    sem: bool = False
    ss_lambda: float = 4e-2
    first_beta_epoch: int = 2
    prop_lambda: float = 1.0  # proposal interlevel loss weight (stretch path)


SEMANTIC_CONFIG = {
    3: {
        "color_mapping": {0: [0, 255, 0], 1: [255, 0, 0], 2: [0, 0, 255]},
        "class_mapping": {0: 2, 1: 6, 2: 9},
        "semantic_names": {0: "Ground", 1: "Buildings", 2: "Water"},
        "label_mapping": {2: 0, 6: 1, 9: 2},
    },
    4: {
        "color_mapping": {0: [0, 255, 0], 1: [0, 128, 0], 2: [255, 0, 0], 3: [0, 0, 255]},
        "class_mapping": {0: 2, 1: 5, 2: 6, 3: 9},
        "semantic_names": {0: "Ground", 1: "Trees", 2: "Buildings", 3: "Water"},
        "label_mapping": {2: 0, 5: 1, 6: 2, 9: 3},
    },
    5: {
        "color_mapping": {
            0: [0, 255, 0],
            1: [0, 128, 0],
            2: [255, 0, 0],
            3: [0, 0, 255],
            4: [255, 255, 0],
        },
        "class_mapping": {0: 2, 1: 5, 2: 6, 3: 9, 4: 17},
        "semantic_names": {
            0: "Ground",
            1: "Trees",
            2: "Buildings",
            3: "Water",
            4: "Bridge/Elevated Road",
        },
        "label_mapping": {2: 0, 5: 1, 6: 2, 9: 3, 17: 4},
    },
}

IGNORE_LABEL = -100


def build_train_parser():
    """Argparse surface, flag-compatible with the reference Train_parser."""
    p = argparse.ArgumentParser(description="Train SP-NeRF (TPU-native)")
    # input / output paths
    p.add_argument("--project_dir", type=str, required=True)
    p.add_argument("--ckpt_path", type=str, default=None)
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from this experiment's newest checkpoint if "
                        "one exists (relaunch-and-continue after a runtime "
                        "fault; --ckpt_path takes precedence)")
    p.add_argument("--watchdog", type=int, default=0,
                   help="seconds of training silence (no metrics.jsonl "
                        "progress) after which the run is killed and "
                        "relaunched with --auto_resume; 0 disables. Set it "
                        "above the worst-case first-window compile time. "
                        "Recovery for runtimes that hang mid-dispatch "
                        "(observed twice on the tunneled TPU)")
    p.add_argument("--watchdog_max_restarts", type=int, default=20,
                   help="give up after this many watchdog relaunches")
    p.add_argument("--dataset_name", type=str, default="DFC2019_269",
                   help="dataset directory name under <project_dir>/dataset "
                        "(the reference hard-codes DFC2019_269)")
    p.add_argument("--dataset_dir", type=str, default=None,
                   help="explicit dataset dir (overrides --dataset_name)")
    # basic
    p.add_argument("--aoi_id", type=str, required=True)
    p.add_argument("--model", type=str, default="sp-nerf")
    p.add_argument("--exp_name", type=str, default=None)
    p.add_argument("--gpu_id", type=int, default=0,
                   help="accepted for CLI compatibility; device selection is "
                        "handled by JAX")
    # training / network
    # default resolves per encoding: 5e-4 (siren — the reference's value,
    # main.py:96) or 1e-2 (hash — NGP-style table lr; measured on the v5e:
    # 5e-4 costs ~1.3 m DSM MAE on the tuned-depth 3k schedule)
    p.add_argument("--lr", type=float, default=None,
                   help="learning rate (default: 5e-4 for siren, "
                        "1e-2 for --encoding hash)")
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--img_downscale", type=float, default=1.0)
    p.add_argument("--max_train_steps", type=int, default=500000)
    p.add_argument("--save_every_n_epochs", type=int, default=2)
    p.add_argument("--fc_units", type=int, default=512)
    p.add_argument("--fc_layers", type=int, default=8)
    p.add_argument("--n_samples", type=int, default=64)
    p.add_argument("--n_importance", type=int, default=0)
    p.add_argument("--noise_std", type=float, default=0.0)
    p.add_argument("--chunk", type=int, default=1024 * 5)
    # solar correction
    p.add_argument("--sc_lambda", type=float, default=0.0)
    # uncertainty
    p.add_argument("--beta", action="store_true")
    p.add_argument("--first_beta_epoch", type=int, default=2)
    p.add_argument("--t_embbeding_tau", type=int, default=4)
    p.add_argument("--t_embbeding_vocab", type=int, default=30)
    # depth supervision
    p.add_argument("--depth", action="store_true")
    p.add_argument("--ds_lambda", type=float, default=0.0)
    p.add_argument("--ds_drop", type=float, default=0.25)
    p.add_argument("--GNLL", action="store_true")
    p.add_argument("--usealldepth", action="store_true")
    p.add_argument("--margin", type=float, default=0.0001)
    p.add_argument("--stdscale", type=float, default=1.0)
    # semantic supervision
    p.add_argument("--sem", action="store_true")
    p.add_argument("--num_sem_classes", type=int, default=5)
    p.add_argument("--s_embedding_factor", type=int, default=1)
    p.add_argument("--sem_downscale", type=float, default=8.0)
    p.add_argument("--ignore_label", type=int, default=-100)
    p.add_argument("--dense_ss", action="store_true")
    p.add_argument("--ss_lambda", type=float, default=4e-2)
    p.add_argument("--ss_drop", type=float, default=1.0)
    # strategies
    p.add_argument("--mapping", action="store_true")
    p.add_argument("--guidedsample", action="store_true")
    p.add_argument("--encoding", type=str, default="siren",
                   choices=["siren", "hash"],
                   help="field trunk: siren (SP-NeRF flagship) or hash "
                        "(Instant-NGP-style multiresolution hash grid)")
    p.add_argument("--hash_levels", type=int, default=8,
                   help="hash encoding: number of resolution levels (fewer, "
                        "wider levels are faster on TPU at equal total "
                        "feature width; 8x4 measured 2.7x faster than "
                        "NGP-classic 16x2 at equal quality)")
    p.add_argument("--hash_features", type=int, default=4,
                   help="hash encoding: features per level")
    p.add_argument("--hash_log2T", type=int, default=19,
                   help="hash encoding: log2 of the per-level table size")
    p.add_argument("--hash_hidden", type=int, default=64,
                   help="hash trunk/head MLP width (NGP-classic 64). The "
                        "hash step is gather-bound on TPU, so wider trunks "
                        "cost little — a capacity knob for scenes 64 "
                        "underfits. Measured: 128 closes the multi-AOI "
                        "dual-frame gap entirely (1.05/1.09 vs 1.38/1.49 m "
                        "MAE) at equal speed; use 128 for multi-frame "
                        "--aoi_id runs")
    p.add_argument("--hash_impl", type=str, default="auto",
                   choices=["auto", "xla", "sorted_vjp", "matmul_vjp",
                            "fused_vjp"],
                   help="hash lookup backward: plain autodiff scatters (xla),"
                        " sorted scatter-add (sorted_vjp), factorized one-hot"
                        " MXU matmul (matmul_vjp), or one flat scatter across"
                        " levels (fused_vjp)")
    p.add_argument("--hash_anneal_steps", type=int, default=0,
                   help="coarse-to-fine: ramp the fine hash levels in over "
                        "the first N steps (0 = off; the 2 coarsest levels "
                        "are always active). Measured NEGATIVE with dense "
                        "depth supervision at short schedules (anneal 1000 "
                        "on the 3k tuned-depth run: MAE 1.54/1.66 vs "
                        "1.08/1.12 m control) — geometry converges early "
                        "under depth guidance and the ramp only delays it. "
                        "ALSO negative depth-free (--proposal 2k: MAE "
                        "4.65/4.61 vs 2.67/2.73 control; poses are "
                        "RPC-calibrated, so the BARF pose-ambiguity "
                        "rationale never applies). Kept opt-in for "
                        "non-DFC scenes")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clipping before Adam (0 = "
                        "off, the reference behavior). Mitigates the "
                        "measured stochastic albedo-head death at hash "
                        "lr 1e-2 (one bad early step saturates the head's "
                        "ReLU+sigmoid; bf16 sigmoid gradients underflow to "
                        "exactly 0, making it permanent — RESULTS.md)")
    p.add_argument("--lr_gamma", type=float, default=0.9,
                   help="per-EPOCH StepLR decay factor (reference "
                        "modules/utils.py:317-318 hard-codes 0.9). The "
                        "per-epoch schedule couples lr to dataset size: at "
                        "--img_downscale 1 an epoch is 4x the ds2 rays, so "
                        "an equal step budget sees 4x fewer decays and "
                        "trains ~5x hotter late (measured to collapse "
                        "depth-guided hash geometry at full res); 0.9**4 "
                        "= 0.656 restores the ds2 per-step trajectory")
    p.add_argument("--weight_decay", type=float, default=0.0,
                   help="AdamW-style decoupled weight decay on ALL "
                        "parameters (0 = off, the reference's plain-Adam "
                        "behavior). Generic counterpart of --hash_table_wd "
                        "for the Siren family; composes with it (table rows "
                        "then decay at the sum)")
    p.add_argument("--hash_table_wd", type=float, default=0.0,
                   help="AdamW-style decoupled weight decay on the hash "
                        "TABLE rows only (0 = off; trunk/heads always plain "
                        "Adam). Regularizes colliding/stale table rows")
    p.add_argument("--hash_level_lr_decay", type=float, default=1.0,
                   help="per-level lr decay on the hash table: level l "
                        "steps at lr * gamma**l (1.0 = off). A smoothness "
                        "prior — finer levels learn slower")
    p.add_argument("--no_hash_direct_coarse", action="store_true",
                   help="hash every level even when the dense grid fits the "
                        "table (pre-round-3 behavior; needed to evaluate "
                        "checkpoints trained before direct coarse indexing)")
    p.add_argument("--no_hash_flat_table", action="store_true",
                   help="store hash tables as (T, F) instead of flat (T*F,) "
                        "rows (needed to evaluate checkpoints trained "
                        "before flat table storage)")
    p.add_argument("--proposal", action="store_true",
                   help="density-only proposal network places the main "
                        "field's samples (interlevel loss)")
    p.add_argument("--n_proposal", type=int, default=64)
    p.add_argument("--prop_lambda", type=float, default=1.0)
    p.add_argument("--occgrid", action="store_true",
                   help="occupancy-grid guided coarse sampling (NGP-style "
                        "density cache, ops/occgrid.py): redistribute the "
                        "static coarse sample budget toward occupied space. "
                        "Multi-AOI runs keep one grid block per frame. "
                        "Mutually exclusive with --proposal. Measured as a "
                        "siren-flagship lever; a quality negative on "
                        "--encoding hash tuned-depth runs (README)")
    p.add_argument("--occ_res", type=int, default=64,
                   help="occupancy grid resolution per axis (res^3 cells)")
    p.add_argument("--occ_bins", type=int, default=128,
                   help="per-ray depth bins weighted by the grid")
    p.add_argument("--occ_floor", type=float, default=0.01,
                   help="uniform exploration floor per bin (keeps "
                        "empty-looking space sampled so wrong grids "
                        "recover). Measured on the v5e: 0.01 is right for "
                        "the siren flagship. On --encoding hash the grid "
                        "is measured-negative at useful schedules even at "
                        "the best floor (0.1 rescues 3k but loses 0.4 m "
                        "MAE at 10k; 0.01 costs ~0.8 m at 3k; 0.3 "
                        "regresses) — treat --occgrid as flagship-only "
                        "(README)")
    p.add_argument("--occ_rows", type=int, default=4096,
                   help="grid cells refreshed per train step (one contiguous "
                        "slab; snapped down to a divisor of occ_res^3)")
    p.add_argument("--occ_decay", type=float, default=0.8,
                   help="per-visit EMA decay of cached cell densities")
    # TPU-native extras (not in the reference)
    p.add_argument("--xla_opts", type=str, default="",
                   help="comma-separated k=v XLA DebugOptions applied to the "
                        "train step/scan compiles via lower().compile("
                        "compiler_options=...) — the only route that reaches "
                        "the tunneled remote compiler (env XLA_FLAGS does "
                        "not). Values parse as bool/int/float when they look "
                        "like one, else string. Example: --xla_opts "
                        "xla_tpu_enable_latency_hiding_scheduler=false,"
                        "xla_tpu_scoped_vmem_limit_kib=16384")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--precision", type=str, default="bf16", choices=["bf16", "fp32"],
                   help="MLP matmul precision (reference uses AMP fp16)")
    p.add_argument("--data_axis", type=int, default=0,
                   help="number of devices for ray data-parallelism; 0 = all")
    p.add_argument("--no_timestamp_exp_name", action="store_true")
    p.add_argument("--use_pallas", action="store_true",
                   help="force the fused Pallas field-evaluation kernel for "
                        "eval/validation rendering (it is the default on TPU "
                        "backends; this flag opts non-TPU backends in via "
                        "interpret mode). Training always uses the XLA path "
                        "— two generations of fused training kernels "
                        "measured slower (see train/loop.py)")
    p.add_argument("--check_val_every_n_epoch", type=int, default=2)
    p.add_argument("--log_every", type=int, default=100,
                   help="steps per scan window (one host dispatch + log line)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the second training "
                        "window into <logs>/profile (reference only exposes "
                        "Lightning's profiler='simple', main.py:333)")
    return p


def parse_xla_opts(spec):
    """Parse the --xla_opts string into a compiler_options dict.

    "k=v,k2=v2" -> {k: typed(v), ...}; values become bool for true/false,
    int/float when numeric, else stay strings (XLA DebugOptions fields are
    typed; the remote compile helper rejects unknown NAMES loudly but
    silently coerces string "1" vs int 1 differently for some fields, so we
    type eagerly).
    """
    opts = {}
    for item in (spec or "").split(","):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(
                f"--xla_opts entry {item!r} is not of the form key=value")
        k, v = item.split("=", 1)
        vl = v.strip().lower()
        if vl in ("true", "false"):
            val = vl == "true"
        else:
            try:
                val = int(v)
            except ValueError:
                try:
                    val = float(v)
                except ValueError:
                    val = v.strip()
        opts[k.strip()] = val
    return opts


def finalize_args(args, make_dirs=True):
    """Derive dataset/output paths, mirroring /root/reference/modules/opt.py:112-137."""
    if getattr(args, "lr", None) is None:
        # per-encoding default (see the --lr flag comment); resolved here so
        # opts.json records the value the run actually used
        args.lr = 1e-2 if getattr(args, "encoding", "siren") == "hash" \
            else 5e-4
    if getattr(args, "occgrid", False) and getattr(args, "proposal", False):
        # a proposal sampler already owns coarse sample placement
        raise SystemExit("--occgrid and --proposal are mutually exclusive "
                         "(both own coarse sample placement)")
    if args.dataset_dir is None:
        args.dataset_dir = os.path.join(args.project_dir, "dataset", args.dataset_name)
    args.depth_dir = os.path.join(args.dataset_dir, "Depth")
    args.json_dir = os.path.join(args.dataset_dir, "JSON")
    args.img_dir = os.path.join(args.dataset_dir, "RGB", args.aoi_id)
    args.sem_dir = os.path.join(args.dataset_dir, "Semantic")
    args.gt_dir = os.path.join(args.dataset_dir, "Truth")

    if args.exp_name is None:
        args.exp_name = args.aoi_id
    if getattr(args, "auto_resume", False):
        # a timestamped exp dir would defeat auto-resume (each relaunch
        # would derive a fresh ckpts_dir and silently restart from step 0)
        args.no_timestamp_exp_name = True
    if not getattr(args, "no_timestamp_exp_name", False):
        args.exp_name = f"{args.exp_name}-{datetime.now().strftime('%Y-%m-%d_%H-%M-%S')}"

    args.output_dir = os.path.join(args.project_dir, "output", args.exp_name)
    args.cache_dir = os.path.join(args.output_dir, "cache")
    args.ckpts_dir = os.path.join(args.output_dir, "ckpts")
    args.logs_dir = os.path.join(args.output_dir, "logs")
    if make_dirs:
        os.makedirs(args.logs_dir, exist_ok=True)
        with open(os.path.join(args.logs_dir, "opts.json"), "w") as f:
            json.dump({k: v for k, v in vars(args).items()}, f, indent=2, default=str)
    return args


def _aoi_frames(args) -> int:
    """Number of translated multi-AOI frames (comma-separated --aoi_id).
    Shared by the hash encoder's frame count and the occupancy grid's block
    count — they must agree with data/multi.py's scene translation."""
    return max(1, len(str(getattr(args, "aoi_id", "") or "").split(",")))


def model_config_from_args(args) -> ModelConfig:
    return ModelConfig(
        fc_layers=args.fc_layers,
        fc_units=args.fc_units,
        mapping=args.mapping,
        num_sem_classes=args.num_sem_classes,
        s_embedding_factor=args.s_embedding_factor,
        t_embedding_dims=args.t_embbeding_tau,
        beta=args.beta,
        sem=args.sem,
        encoding=getattr(args, "encoding", "siren"),
        hash_levels=getattr(args, "hash_levels", 8),
        hash_features=getattr(args, "hash_features", 4),
        hash_log2T=getattr(args, "hash_log2T", 19),
        hash_hidden=getattr(args, "hash_hidden", 64),
        hash_impl=getattr(args, "hash_impl", "auto"),
        hash_direct_coarse=not getattr(args, "no_hash_direct_coarse", False),
        hash_flat_table=not getattr(args, "no_hash_flat_table", False),
        hash_anneal_steps=getattr(args, "hash_anneal_steps", 0),
        # multi-AOI (comma-separated aoi_id): hash each AOI frame at full
        # resolution in its own pseudo-table (models/hashgrid.py frames)
        hash_frames=_aoi_frames(args),
    )


def render_config_from_args(args) -> RenderConfig:
    return RenderConfig(
        n_samples=args.n_samples,
        n_importance=args.n_importance,
        guidedsample=args.guidedsample,
        solar_correction=args.sc_lambda > 0,
        beta=args.beta,
        sem=args.sem,
        compute_dtype="bfloat16" if args.precision == "bf16" else "float32",
        use_pallas=getattr(args, "use_pallas", False),
        proposal=getattr(args, "proposal", False),
        n_proposal=getattr(args, "n_proposal", 64),
        occ_grid=getattr(args, "occgrid", False),
        occ_res=getattr(args, "occ_res", 64),
        occ_bins=getattr(args, "occ_bins", 128),
        occ_floor=getattr(args, "occ_floor", 0.01),
        # one grid block per translated AOI frame (same count as hash_frames)
        occ_frames=_aoi_frames(args),
    )


def loss_config_from_args(args) -> LossConfig:
    return LossConfig(
        sc_lambda=args.sc_lambda,
        beta=args.beta,
        ds_lambda=args.ds_lambda,
        depth=args.depth,
        gnll=args.GNLL,
        usealldepth=args.usealldepth,
        margin=args.margin,
        stdscale=args.stdscale,
        sem=args.sem,
        ss_lambda=args.ss_lambda,
        first_beta_epoch=args.first_beta_epoch,
        prop_lambda=getattr(args, "prop_lambda", 1.0),
    )


def asdict(cfg):
    return dataclasses.asdict(cfg)
