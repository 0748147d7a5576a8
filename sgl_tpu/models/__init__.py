from sgl_tpu.models.base import SGAPModel, SGAPNet, eager_aggregate
from sgl_tpu.models.blocks import (
    PReLU,
    IdenticalMapping,
    LogisticRegression,
    MultiLayerPerceptron,
    ResMultiLayerPerceptron,
    OneDimConvolution,
    OneDimConvolutionWeightSharedAcrossFeatures,
    FastOneDimConvolution,
)
from sgl_tpu.models.homo import (
    SGC,
    SIGN,
    SSGC,
    GBP,
    GAMLP,
    GAMLPRecursive,
    NAFS,
    PASCA_V1,
    PASCA_V2,
    PASCA_V3,
    SGCDist,
    GAMLPDist,
)
from sgl_tpu.models.hetero import (
    HeteroSGAPModel,
    FastHeteroSGAPModel,
    NARS_SIGN,
    Fast_NARS_SGC_WithLearnableWeights,
)
from sgl_tpu.models.graph_level import (
    GraphLevelSGAPModel,
    GraphReadoutNet,
    GraphSGC,
    GraphSIGN,
    segment_readout,
)
