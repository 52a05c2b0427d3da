"""Multi-AOI batched training: several satellite scenes merged into one
device-resident ray set.

The reference is strictly single-AOI (its dataset dir is hard-coded,
/root/reference/modules/opt.py:112-114); multi-AOI batched training is the
scale-out configuration from BASELINE.json (config 4): rays from all AOIs mix
freely in each batch (each ray carries everything the field needs — normalized
origin/direction in its own scene frame, sun direction, semantic label,
transient image id), while validation and DSM scoring stay per-AOI.

Scene frames: each AOI keeps its own `scene.loc` normalization and is then
TRANSLATED to a disjoint region of the shared field's domain
(frame_offset = k * FRAME_SPACING along x for the k-th AOI) — one field can
therefore represent all scenes simultaneously, with per-AOI reconstruction
instead of overlapping geometry. DSM extraction and validation invert the
offset through SceneNorm.denormalize_points, so per-AOI outputs and MAE are
unchanged in meaning. The transient image id (t) stays unique across AOIs for
the beta path.
"""

from dataclasses import dataclass
from typing import List

import numpy as np

from .dataset import SatelliteScene, load_scene


@dataclass
class MultiScene:
    scenes: List[SatelliteScene]
    aoi_ids: List[str]
    # merged train arrays (same schema as SatelliteScene)
    rays: np.ndarray
    rgbs: np.ndarray
    ids: np.ndarray
    depths: np.ndarray
    valid_depth: np.ndarray
    depth_std: np.ndarray
    sems: np.ndarray
    valid_sem: np.ndarray

    def __len__(self):
        return self.rays.shape[0]

    def validation_items(self):
        """Yield (aoi_id, scene, record) for every validation image."""
        for aoi, scene in zip(self.aoi_ids, self.scenes):
            for rec in scene.val_images:
                yield aoi, scene, rec


# distance between AOI cubes in normalized space: each scene spans ~[-1, 1],
# so spacing 3 leaves a >= 1-unit empty gap between neighboring AOIs
FRAME_SPACING = 3.0


def load_scenes(aoi_ids, dataset_dir_fn, **scene_kwargs) -> MultiScene:
    """Load and merge several AOIs.

    dataset_dir_fn(aoi_id) -> dict with json_dir, img_dir, depth_dir, sem_dir
    keys for that AOI. Transient image ids are offset so every image across
    all AOIs gets a unique id; scene k lives in a frame translated by
    (k * FRAME_SPACING, 0, 0) in normalized space.
    """
    scenes, id_offset = [], 0
    merged = {k: [] for k in ("rays", "rgbs", "ids", "depths", "valid_depth",
                              "depth_std", "sems", "valid_sem")}
    for k, aoi in enumerate(aoi_ids):
        dirs = dataset_dir_fn(aoi)
        scene = load_scene(dirs["json_dir"], dirs["img_dir"],
                           dirs["depth_dir"], dirs["sem_dir"], aoi,
                           frame_offset=np.array([k * FRAME_SPACING, 0.0, 0.0]),
                           **scene_kwargs)
        # offset transient ids (train + val records); a scene occupies
        # len(train) + len(test) id slots (val record 0 reuses train image 0)
        scene.ids = scene.ids + id_offset
        for rec in scene.val_images:
            rec.t += id_offset
        id_offset += len(scene.train_images) + max(len(scene.val_images) - 1, 0)
        scenes.append(scene)
        for field in merged:
            merged[field].append(getattr(scene, field))
    return MultiScene(
        scenes=scenes, aoi_ids=list(aoi_ids),
        **{k: np.concatenate(v, axis=0) for k, v in merged.items()},
    )
