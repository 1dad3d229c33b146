from .registry import list_models, model_entrypoint, register_model
from .equiformer import (
    FeedForwardNetwork,
    GraphAttention,
    GraphAttentionTransformer,
    TransBlock,
)
from .md17_models import energy_and_forces
from . import qm9_models  # noqa: F401  (registers entrypoints)
from . import md17_models  # noqa: F401
from .dens import EquiformerDeNS, add_masked_gaussian_noise, dens_outputs
from . import dens  # noqa: F401
from .oc20 import GraphAttentionTransformerOC20
from . import oc20  # noqa: F401
