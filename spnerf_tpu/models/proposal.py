"""Density-only proposal field: small hash encoding + 2-layer MLP -> sigma.

Pairs with ops/proposal.py (interlevel loss + resampling). Kept deliberately
tiny (NGP-style proposal nets are ~10x smaller than the main field): its only
job is to place the main field's samples."""

import jax
import jax.numpy as jnp
from flax import linen as nn

from .hashgrid import HashGridEncoding
from .spnerf import TorchDense


class ProposalField(nn.Module):
    n_levels: int = 8
    n_features: int = 2
    log2_table_size: int = 16
    max_resolution: int = 512
    hidden: int = 32

    @nn.compact
    def __call__(self, xyz):
        enc = HashGridEncoding(
            n_levels=self.n_levels, n_features=self.n_features,
            log2_table_size=self.log2_table_size,
            max_resolution=self.max_resolution,
        )(xyz)
        h = jax.nn.relu(TorchDense(self.hidden)(enc))
        return jax.nn.softplus(TorchDense(1)(h))[..., 0]


def init_proposal(key):
    model = ProposalField()
    params = model.init(key, jnp.zeros((2, 3), jnp.float32))
    return model, params
