from .sampling import (
    sample_pdf,
    sample_3sigma,
    compute_samples_around_depth,
    guided_samples,
    stratified_z_vals,
)
from .compositing import composite
from .render import render_rays

__all__ = [
    "sample_pdf",
    "sample_3sigma",
    "compute_samples_around_depth",
    "guided_samples",
    "stratified_z_vals",
    "composite",
    "render_rays",
]
