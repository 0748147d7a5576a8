from sgl_tpu.tasks.node_classification import NodeClassification
from sgl_tpu.tasks.graph_classification import GraphClassification
from sgl_tpu.tasks.correct_and_smooth import (
    NodeClassificationWithCorrectAndSmooth,
    NodeClassification_With_CorrectAndSmooth,
)
from sgl_tpu.tasks.node_clustering import (
    NodeClustering,
    NodeClusteringNAFS,
    nafs_smooth_features,
    nafs_smooth_sweep,
)
from sgl_tpu.tasks.link_prediction import (
    LinkPredictionGAE,
    LinkPredictionNAFS,
    mask_test_edges,
)
from sgl_tpu.tasks.node_classification_with_label_use import (
    NodeClassificationWithLabelUse,
)
from sgl_tpu.tasks.hetero_node_classification import HeteroNodeClassification
from sgl_tpu.tasks.node_classification_dist import NodeClassificationDist
from sgl_tpu.tasks.inference import Predictor, predictor_from_task
