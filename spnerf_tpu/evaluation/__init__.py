from .dsm import dsm_from_latlonalt, rasterize_dsm
from .mae import compute_mae_and_save_dsm_diff, dsm_pointwise_diff
from .metrics import miou, overall_accuracy, psnr, ssim

__all__ = [
    "rasterize_dsm",
    "dsm_from_latlonalt",
    "dsm_pointwise_diff",
    "compute_mae_and_save_dsm_diff",
    "psnr",
    "ssim",
    "miou",
    "overall_accuracy",
]
