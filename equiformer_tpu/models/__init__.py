from .registry import list_models, model_entrypoint, register_model
from .equiformer import (
    FeedForwardNetwork,
    GraphAttention,
    GraphAttentionTransformer,
    TransBlock,
)
from . import qm9_models  # noqa: F401  (registers entrypoints)
