"""Offline evaluation — CLI-compatible with the reference `python eval.py ...`
(/root/reference/eval.py:317-439).

Walks the validation images saved during training at a chosen epoch
(logs/val/{dsm,rgb}/*_epoch{N}.tif), and per image computes: DSM altitude MAE
(ROI crop + NCC registration, with the offline NaN->min fill), PSNR, SSIM,
LPIPS(alex, when weights are available), and residual-map PNGs. Prints per-image
and mean metrics.
"""

import argparse
import os
import re

import numpy as np

from ..evaluation import psnr, ssim
from ..evaluation.lpips import lpips as lpips_fn
from ..evaluation.mae import dsm_pointwise_diff
from ..evaluation.metrics import miou, overall_accuracy
from ..io import read_geotiff


def plot_residual_map(residual_map_path, src_id, output_dir, clip_percent=98):
    """Original + percentile-enhanced residual PNGs (reference eval.py:252-288)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    residual, _ = read_geotiff(residual_map_path)
    residual = np.asarray(residual, np.float64)
    max_abs = np.nanmax(np.abs(residual))
    for name, cmap, vmin, vmax in (
        ("original", "RdBu", -max_abs, max_abs),
        ("enhanced", "coolwarm",
         np.nanpercentile(residual, 100 - clip_percent),
         np.nanpercentile(residual, clip_percent)),
    ):
        plt.figure(figsize=(10, 8))
        plt.imshow(residual, cmap=cmap, vmin=vmin, vmax=vmax)
        plt.colorbar(label="")
        plt.axis("off")
        out = os.path.join(output_dir, f"{src_id}_residual_map_{name}.png")
        plt.savefig(out, dpi=300, bbox_inches="tight", pad_inches=0)
        plt.close()


def _load_rgb(path):
    arr, _ = read_geotiff(path)
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.max() > 1.05:
        arr = arr / 255.0
    return np.clip(arr, 0.0, 1.0)


def _semantic_metrics(pred_sem_path, gt_cls_path):
    """mIoU / OA of a saved semantic prediction against the dataset CLS tif.

    Both rasters carry ORIGINAL DFC2019 class IDs (the validation saver remaps
    internal indices back, evaluation/outputs.py remap_semantics_to_original);
    both are remapped to internal indices via SEMANTIC_CONFIG.label_mapping and
    compared on pixels whose GT class is in the config. The reference defines
    these metrics but never surfaces them (modules/metrics.py:218-246,
    main.py:264-269) — this exceeds it."""
    from ..config import SEMANTIC_CONFIG

    pred, _ = read_geotiff(pred_sem_path)
    gt, _ = read_geotiff(gt_cls_path)
    pred = np.asarray(pred).squeeze().astype(np.int64)
    gt = np.asarray(gt).squeeze().astype(np.int64)
    if gt.shape != pred.shape:
        # prediction may be at a downscaled grid: nearest-neighbor the GT
        ri = (np.arange(pred.shape[0]) * gt.shape[0] / pred.shape[0]).astype(int)
        ci = (np.arange(pred.shape[1]) * gt.shape[1] / pred.shape[1]).astype(int)
        gt = gt[np.ix_(ri, ci)]
    # infer class count from the original IDs present in the prediction
    n_classes = None
    for n, cfg in sorted(SEMANTIC_CONFIG.items()):
        if set(np.unique(pred)).issubset(set(cfg["label_mapping"]) | {65}):
            n_classes = n
            break
    if n_classes is None:
        n_classes = max(SEMANTIC_CONFIG)
    label_map = SEMANTIC_CONFIG[n_classes]["label_mapping"]
    remap = np.full(max(max(label_map), 65) + 1, -1, np.int64)
    for orig, internal in label_map.items():
        remap[orig] = internal
    pred_i = remap[np.clip(pred, 0, len(remap) - 1)]
    gt_i = remap[np.clip(gt, 0, len(remap) - 1)]
    labeled = gt_i >= 0
    if not labeled.any():
        return float("nan"), float("nan")
    return (float(miou(pred_i[labeled], gt_i[labeled], n_classes)),
            float(overall_accuracy(pred_i[labeled], gt_i[labeled])))


def eval_aoi(args):
    pred_dsm_dir = os.path.join(args.logs_dir, "val", "dsm")
    pred_rgb_dir = os.path.join(args.logs_dir, "val", "rgb")
    pred_sem_dir = os.path.join(args.logs_dir, "val", "semantic")
    gt_dsm_dir = os.path.join(args.dataset_dir, "Truth")
    gt_rgb_base = os.path.join(args.dataset_dir, "RGB")
    epoch = args.epoch_number
    out_dir = os.path.join(args.output_dir, "dsm_diff")
    os.makedirs(out_dir, exist_ok=True)

    suffix = f"_epoch{epoch}.tif"
    files = sorted(f for f in os.listdir(pred_dsm_dir) if f.endswith(suffix))

    # fail loudly up front when LPIPS weights are absent: the reference always
    # reports LPIPS (eval.py:128-135), so silently averaging NaNs would
    # misrepresent a headline metric. --skip_lpips opts out explicitly.
    from ..evaluation.lpips import load_weights as _load_lpips_weights

    compute_lpips = not getattr(args, "skip_lpips", False)
    if compute_lpips and _load_lpips_weights() is None:
        raise SystemExit(
            "LPIPS weights not found: set SPNERF_LPIPS_WEIGHTS to an .npz "
            "produced by spnerf_tpu.evaluation.lpips.convert_torch_lpips_to_npz"
            " (run it on any machine with torch+lpips installed), or pass "
            "--skip_lpips to evaluate without the LPIPS metric."
        )

    stats = {"psnr": [], "ssim": [], "mae": [], "lpips": [], "miou": [],
             "oa": []}
    for fname in files:
        src_id = fname[: -len(suffix)]
        # multi-AOI runs with repeated frames save views under a ".fN"
        # frame-suffixed label (cli/train._val_labels); the dataset's GT
        # files carry the bare image id — strip the suffix for GT lookups
        # while keeping src_id for the per-view output naming
        gt_id = re.sub(r"\.f\d+$", "", src_id)
        aoi_id = "_".join(gt_id.split("_")[:2])
        pred_dsm_path = os.path.join(pred_dsm_dir, fname)
        pred_rgb_path = os.path.join(pred_rgb_dir, f"{src_id}{suffix}")
        gt_dsm_path = os.path.join(gt_dsm_dir, f"{aoi_id}_DSM.tif")
        gt_roi_path = os.path.join(gt_dsm_dir, f"{aoi_id}_DSM.txt")
        gt_rgb_path = os.path.join(gt_rgb_base, aoi_id, f"{gt_id}.tif")
        missing = [p for p in (pred_rgb_path, gt_dsm_path, gt_roi_path,
                               gt_rgb_path) if not os.path.exists(p)]
        if missing:
            print(f"{src_id}: missing {missing}, skipped")
            continue

        diff_path = os.path.join(out_dir, f"{src_id}_rdsm_diff_epoch{epoch}.tif")
        rdsm_path = os.path.join(out_dir, f"{src_id}_rdsm_epoch{epoch}.tif")
        err = dsm_pointwise_diff(
            pred_dsm_path, gt_dsm_path, np.loadtxt(gt_roi_path),
            out_rdsm_path=rdsm_path, out_err_path=diff_path, nan_fill_min=True,
        )
        mae_v = float(np.mean(np.abs(err)))
        plot_residual_map(diff_path, src_id, out_dir)

        pred_rgb = _load_rgb(pred_rgb_path)
        gt_rgb = _load_rgb(gt_rgb_path)
        if gt_rgb.shape != pred_rgb.shape:
            # run was trained with img_downscale > 1: bring the dataset GT to the
            # prediction's grid (the reference only supports downscale 1 here)
            from ..utils import resize_bilinear

            gt_rgb = resize_bilinear(
                gt_rgb, pred_rgb.shape[0], pred_rgb.shape[1]
            ).astype(np.float32)
        psnr_v = float(psnr(pred_rgb, gt_rgb))
        ssim_v = float(ssim(pred_rgb, gt_rgb))
        lpips_v = lpips_fn(pred_rgb, gt_rgb) if compute_lpips else float("nan")

        sem_str = ""
        pred_sem_path = os.path.join(pred_sem_dir, f"{src_id}{suffix}")
        gt_cls_path = os.path.join(args.dataset_dir, "Semantic",
                                   f"{aoi_id}_CLS.tif")
        if os.path.exists(pred_sem_path) and os.path.exists(gt_cls_path):
            miou_v, oa_v = _semantic_metrics(pred_sem_path, gt_cls_path)
            stats["miou"].append(miou_v)
            stats["oa"].append(oa_v)
            sem_str = f" / mIoU {miou_v:.3f} / OA {oa_v:.3f}"

        for k, v in (("psnr", psnr_v), ("ssim", ssim_v), ("mae", mae_v),
                     ("lpips", lpips_v)):
            stats[k].append(v)
        print(f"{src_id}: PSNR {psnr_v:.3f} / SSIM {ssim_v:.3f} / "
              f"LPIPS {lpips_v:.3f} / MAE {mae_v:.3f}{sem_str}")

    def _nmean(v):
        # all-NaN columns (e.g. lpips under --skip_lpips) stay NaN without
        # tripping numpy's "Mean of empty slice" warning
        a = np.asarray(v, dtype=float)
        return float(np.nanmean(a)) if a.size and np.isfinite(a).any() \
            else float("nan")

    print(f"\nMean PSNR: {_nmean(stats['psnr']):.3f}")
    print(f"Mean SSIM: {_nmean(stats['ssim']):.3f}")
    print(f"Mean MAE: {_nmean(stats['mae']):.3f}")
    print(f"Mean LPIPS: {_nmean(stats['lpips']):.3f}")
    if stats["miou"]:
        print(f"Mean mIoU: {_nmean(stats['miou']):.3f}")
        print(f"Mean OA: {_nmean(stats['oa']):.3f}")
    print()
    print("Eval finished!")
    return {k: _nmean(v) for k, v in stats.items()}


def build_test_parser():
    p = argparse.ArgumentParser(description="Evaluate SP-NeRF outputs (TPU-native)")
    p.add_argument("--project_dir", type=str, required=True)
    p.add_argument("--exp_name", type=str, required=True)
    p.add_argument("--dataset_dir", type=str, required=True)
    p.add_argument("--epoch_number", type=int, default=28)
    p.add_argument("--skip_lpips", action="store_true",
                   help="evaluate without LPIPS (no weights available)")
    return p


def main(argv=None):
    from ..utils.platform import apply_platform_env

    apply_platform_env()
    args = build_test_parser().parse_args(argv)
    args.logs_dir = os.path.join(args.project_dir, "output", args.exp_name, "logs")
    args.output_dir = os.path.join(args.project_dir, "output", args.exp_name, "eval")
    return eval_aoi(args)


if __name__ == "__main__":
    main()
