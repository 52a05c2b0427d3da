"""Depth visualization tools.

Capability-equivalent to the reference's visualization scripts
(/root/reference/visualization/visualize_depth_in.py:9-169 — sparse input-depth
scatter, padded depth image, overlay on the source image — and
visualize_depth_out.py:8-48 — DSM viridis PNG), without rasterio/cv2.
"""

import numpy as np

from ..io import read_geotiff, read_tiff


def padded_depth_image(image_shape, points_2d, values):
    """Scatter sparse per-pixel values into a NaN-padded (H, W) image
    (reference visualize_depth_in.generate_padded_depth_image)."""
    h, w = image_shape[:2]
    out = np.full((h, w), np.nan)
    pts = np.asarray(points_2d, np.int64)
    vals = np.asarray(values, np.float64)
    ok = (pts[:, 0] >= 0) & (pts[:, 0] < w) & (pts[:, 1] >= 0) & (pts[:, 1] < h)
    out[pts[ok, 1], pts[ok, 0]] = vals[ok]
    return out


def visualize_depth_points(pts2d_path, pts3d_path, image_path, out_prefix):
    """Input-depth viz: raw depth image, overlay on the RGB, side by side
    (reference visualize_depth_in.py main flow)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts2d = np.loadtxt(pts2d_path, dtype=np.int64).reshape(-1, 2)
    pts3d = np.loadtxt(pts3d_path, dtype=np.float64).reshape(-1, 3)
    img = read_tiff(image_path)
    depth = padded_depth_image(img.shape, pts2d, pts3d[:, 2])

    plt.figure(figsize=(7, 7))
    im = plt.imshow(depth, cmap="viridis", interpolation="nearest")
    plt.axis("off")
    plt.colorbar(im, label="Depth (Z value)")
    plt.savefig(f"{out_prefix}_raw.png", dpi=300, bbox_inches="tight")
    plt.close()

    overlay_depth_on_image(img, depth, f"{out_prefix}_overlay.png")

    fig, axes = plt.subplots(1, 2, figsize=(14, 7))
    axes[0].imshow(img)
    axes[0].set_axis_off()
    axes[1].imshow(depth, cmap="viridis", interpolation="nearest")
    axes[1].set_axis_off()
    plt.savefig(f"{out_prefix}_side_by_side.png", dpi=300, bbox_inches="tight")
    plt.close()
    return depth


def overlay_depth_on_image(image, depth_image, output_path, alpha=0.6):
    """Depth scatter overlaid on the source image."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(7, 7))
    plt.imshow(image)
    masked = np.ma.masked_invalid(depth_image)
    plt.imshow(masked, cmap="viridis", alpha=alpha, interpolation="nearest")
    plt.axis("off")
    plt.savefig(output_path, dpi=300, bbox_inches="tight", pad_inches=0)
    plt.close()


def visualize_dsm(dsm_path, output_path):
    """DSM GeoTIFF -> viridis PNG, NaNs shown at the minimum altitude
    (reference visualize_depth_out.visualize_and_save_dsm)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dsm, _ = read_geotiff(dsm_path)
    dsm = np.asarray(dsm, np.float64)
    dsm_min = np.nanmin(dsm)
    dsm = np.nan_to_num(dsm, nan=dsm_min)

    plt.figure(figsize=(10, 8))
    plt.imshow(dsm, cmap="viridis", vmin=dsm_min, vmax=np.nanmax(dsm))
    plt.colorbar()
    plt.axis("off")
    plt.savefig(output_path, dpi=300, bbox_inches="tight", pad_inches=0)
    plt.close()
    return output_path
