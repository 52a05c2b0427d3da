"""DSM extraction: UTM point cloud -> gridded Digital Surface Model.

Replaces the reference's `plyflatten` C-backed rasterizer
(/root/reference/datasets/satellite_scene.py:540-547, called with radius=1,
sigma=inf) with a JAX scatter rasterizer that runs on TPU:

  * each point lands in cell (col, row) = (floor((x-xoff)/res), floor((yoff-y)/res));
  * with radius r it contributes to the (2r+1)^2 neighborhood of that cell with
    Gaussian weights exp(-d^2 / (2 sigma^2)) — sigma=inf gives uniform weights,
    so each cell is the plain average of contributing points (the reference's
    configuration);
  * empty cells are NaN (plyflatten behavior).

The scatter is a single `segment_sum` over static shapes, so it jits cleanly and
is embarrassingly data-parallel over points.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geo import latlon_to_utm
from ..io import write_geotiff
from ..geo.utm import utm_epsg


def rasterize_dsm(
    easts,
    norths,
    alts,
    xoff,
    yoff,
    resolution,
    xsize: int,
    ysize: int,
    radius: int = 1,
    sigma: float = np.inf,
):
    """Average-splat rasterization. Returns (ysize, xsize) float32 with NaNs.

    The origin subtraction happens in float64 on host: UTM northings near the
    DFC2019 scenes are ~3.4e6 m, where float32 spacing (~0.25-0.5 m) is
    comparable to the 0.5 m cell size — casting before subtracting would move
    points one row/column nondeterministically. The reference rasterizes in
    double via plyflatten (satellite_scene.py:540-547); only the small
    origin-relative fractional coordinates go to the f32 device splat.
    """
    easts = np.asarray(easts, np.float64)
    norths = np.asarray(norths, np.float64)
    fx = ((easts - float(xoff)) / float(resolution)).astype(np.float32)
    fy = ((float(yoff) - norths) / float(resolution)).astype(np.float32)
    return _splat(fx, fy, jnp.asarray(alts, jnp.float32),
                  xsize=int(xsize), ysize=int(ysize), radius=int(radius),
                  sigma=float(sigma))


@functools.partial(jax.jit,
                   static_argnames=("xsize", "ysize", "radius", "sigma"))
def _splat(fx, fy, alts, *, xsize: int, ysize: int, radius: int, sigma: float):
    cx = jnp.floor(fx).astype(jnp.int32)
    cy = jnp.floor(fy).astype(jnp.int32)

    num = jnp.zeros(ysize * xsize, jnp.float32)
    den = jnp.zeros(ysize * xsize, jnp.float32)
    alts = jnp.asarray(alts, jnp.float32)
    use_gauss = np.isfinite(sigma)

    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            col = cx + dx
            row = cy + dy
            ok = (col >= 0) & (col < xsize) & (row >= 0) & (row < ysize)
            if use_gauss:
                d2 = (col + 0.5 - fx) ** 2 + (row + 0.5 - fy) ** 2
                w = jnp.exp(-d2 / (2.0 * sigma**2))
            else:
                w = jnp.ones_like(fx)
            w = jnp.where(ok, w, 0.0)
            idx = jnp.where(ok, row * xsize + col, 0)
            num = num.at[idx].add(w * alts)
            den = den.at[idx].add(w)

    dsm = jnp.where(den > 0, num / jnp.maximum(den, 1e-12), jnp.nan)
    return dsm.reshape(ysize, xsize)


def dsm_from_latlonalt(lats, lons, alts, roi_txt=None, dsm_path=None, resolution=0.5):
    """lat/lon/alt point cloud -> DSM raster (+ optional GeoTIFF output).

    Mirrors get_dsm_from_nerf_prediction (satellite_scene.py:507-568): the ROI txt
    gives (xoff, yoff, size_px, resolution) with yoff measured from the bottom
    (hence the + size*res correction); without it the bounds come from the cloud.
    """
    easts, norths, zone, northern = latlon_to_utm(np.asarray(lats), np.asarray(lons))

    if roi_txt is not None:
        meta = np.loadtxt(roi_txt)
        xoff, yoff = float(meta[0]), float(meta[1])
        xsize = ysize = int(meta[2])
        resolution = float(meta[3])
        yoff += ysize * resolution  # ROI yoff is the south edge
    else:
        xmin, xmax = easts.min(), easts.max()
        ymin, ymax = norths.min(), norths.max()
        xoff = np.floor(xmin / resolution) * resolution
        xsize = int(1 + np.floor((xmax - xoff) / resolution))
        yoff = np.ceil(ymax / resolution) * resolution
        ysize = int(1 - np.floor((ymin - yoff) / resolution))

    dsm = np.asarray(
        rasterize_dsm(easts, norths, alts, xoff, yoff, resolution,
                      xsize=int(xsize), ysize=int(ysize))
    )

    if dsm_path is not None:
        write_geotiff(
            dsm_path, dsm.astype(np.float32),
            transform=(xoff, resolution, yoff, -resolution),
            epsg=utm_epsg(zone, northern), nodata=float("nan"),
        )
    return dsm, (xoff, yoff, resolution, int(xsize), int(ysize))
