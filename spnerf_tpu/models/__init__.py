from .spnerf import (
    SPNeRF,
    TransientEmbedding,
    init_spnerf,
    positional_mapping,
)

__all__ = ["SPNeRF", "TransientEmbedding", "init_spnerf", "positional_mapping"]
