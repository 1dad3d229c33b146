from .activation import Activation, Gate, gate_for, irreps2gate, normalized_activation, smooth_leaky_relu
from .attention_utils import concat_irreps, heads2vec, heads_irreps, vec2heads
from .dropout import EquivariantDropout, EquivariantScalarsDropout, GraphDropPath
from .linear import IrrepsLinear, ScalarMLP
from .norms import (
    EquivariantGraphNorm,
    EquivariantGraphNormV2,
    EquivariantInstanceNorm,
    EquivariantLayerNorm,
    EquivariantLayerNormFast,
    EquivariantLayerNormV3,
    EquivariantLayerNormV4,
    get_norm_layer,
)
from .radial import (
    BesselRadialBasis,
    ExpNormalBasis,
    GaussianRadialBasis,
    RadialProfile,
    cosine_cutoff,
    make_rbf,
)
from .tp_modules import (
    DTPLayer,
    EdgeDegreeEmbedding,
    FCTP,
    FCTPSwishGate,
    NodeEmbedding,
    SeparableFCTP,
)
