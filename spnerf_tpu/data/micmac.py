"""MicMac dense-depth helpers.

Capability-equivalent to the reference's MicMac interoperability scripts:
  * `utm_to_geocentric` — converts MicMac `*_3DPts.txt` UTM points to ECEF
    (`*_3DPts_ecef.txt`), the format `load_depth_data` consumes
    (/root/reference/modules/utm_to_geocentric.py:10-29 with the per-city UTM
    zone table at :40-50);
  * `dense_depth_to_dsm` / `cal_rmse_depth` — rasterize the MicMac depth points
    to a DSM and score them against the lidar truth, the input-depth sanity
    check (/root/reference/datasets/cal_rmse_depth.py:48-96,147-181);
  * `convert_tiff` — rewrites a GeoTIFF with MicMac-compatible (uncompressed,
    striped) encoding (/root/reference/datasets/convert2MicMac.py:6-32 uses
    gdal_translate; here the self-contained TIFF writer does the re-encode).

The MicMac `mm3d` binaries themselves are external processes in the reference
workflow (README.md:74-111) and are NOT vendored — their text outputs are the
input contract.
"""

import os

import numpy as np

from ..geo import geodetic_to_ecef, latlon_to_utm
from ..geo.utm import utm_to_latlon
from ..io import read_geotiff, write_geotiff

# per-AOI UTM zones of the DFC2019 cities (reference utm_to_geocentric.py:40-50)
AOI_UTM_ZONES = {
    "JAX": (17, True),   # Jacksonville: zone 17N
    "OMA": (15, True),   # Omaha: zone 15N
}


def utm_zone_for_aoi(aoi_id):
    key = aoi_id.split("_")[0]
    if key not in AOI_UTM_ZONES:
        raise KeyError(f"unknown AOI prefix {key}; add it to AOI_UTM_ZONES")
    return AOI_UTM_ZONES[key]


def utm_to_geocentric(pts_utm, zone, northern=True):
    """(N, 3) [east, north, alt] UTM -> (N, 3) ECEF meters."""
    pts = np.asarray(pts_utm, np.float64)
    lat, lon = utm_to_latlon(pts[:, 0], pts[:, 1], zone, northern)
    x, y, z = geodetic_to_ecef(lat, lon, pts[:, 2])
    return np.stack([x, y, z], axis=-1)


def convert_3dpts_file(in_path, out_path=None, aoi_id=None, zone=None,
                       northern=True):
    """`*_3DPts.txt` (UTM) -> `*_3DPts_ecef.txt`, like the reference script."""
    if zone is None:
        zone, northern = utm_zone_for_aoi(aoi_id)
    pts = np.loadtxt(in_path, dtype=np.float64).reshape(-1, 3)
    ecef = utm_to_geocentric(pts, zone, northern)
    if out_path is None:
        base, ext = os.path.splitext(in_path)
        out_path = base + "_ecef" + ext
    np.savetxt(out_path, ecef, fmt="%.6f")
    return out_path


def dense_depth_to_dsm(pts3d_ecef, roi_txt, dsm_path=None):
    """Rasterize ECEF depth points to a DSM on the lidar ROI grid
    (reference get_dsm_from_dense_depth, cal_rmse_depth.py:48-96)."""
    from ..evaluation.dsm import dsm_from_latlonalt
    from ..geo import ecef_to_latlon

    pts = np.asarray(pts3d_ecef, np.float64)
    lat, lon, alt = ecef_to_latlon(pts[:, 0], pts[:, 1], pts[:, 2])
    dsm, grid = dsm_from_latlonalt(lat, lon, alt, roi_txt=roi_txt,
                                   dsm_path=dsm_path)
    return dsm, grid


def cal_rmse_depth(pts3d_ecef_path, gt_dir, aoi_id, out_dir=None):
    """MAE/RMSE of the MicMac input depth itself against the lidar DSM — the
    reference's sanity check that stereo depth is good enough to supervise
    (cal_rmse_depth.py:147-181)."""
    roi_txt = os.path.join(gt_dir, f"{aoi_id}_DSM.txt")
    gt_path = os.path.join(gt_dir, f"{aoi_id}_DSM.tif")
    pts = np.loadtxt(pts3d_ecef_path, dtype=np.float64).reshape(-1, 3)
    dsm, _ = dense_depth_to_dsm(
        pts, roi_txt,
        dsm_path=os.path.join(out_dir, f"{aoi_id}_depth_dsm.tif")
        if out_dir else None,
    )
    gt, _ = read_geotiff(gt_path)
    gt = np.asarray(gt, np.float64)
    diff = dsm - gt
    mae = float(np.nanmean(np.abs(diff)))
    rmse = float(np.sqrt(np.nanmean(diff**2)))
    return {"mae": mae, "rmse": rmse,
            "coverage": float(np.isfinite(dsm).mean())}


def convert_tiff(in_path, out_path):
    """Re-encode a GeoTIFF as plain uncompressed striped TIFF (MicMac cannot
    read some compressed layouts; reference convert2MicMac.py:6-32)."""
    arr, profile = read_geotiff(in_path)
    write_geotiff(out_path, np.asarray(arr), profile=profile)
    return out_path
