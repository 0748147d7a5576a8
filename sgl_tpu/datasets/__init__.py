from sgl_tpu.datasets.base import GraphDataset, NodeDataset, HeteroNodeDataset, random_split
from sgl_tpu.datasets.synthetic import (
    PlantedPartition,
    SyntheticGraphClassification,
    SyntheticPowerLaw,
    random_power_law_graph,
    synthetic_hetero,
    SyntheticHeteroDataset,
)
from sgl_tpu.datasets.choose_edge_type import (
    choose_edge_type,
    choose_multi_subgraphs,
    remove_duplicate_edge_types,
)
from sgl_tpu.datasets.planetoid import Planetoid, Nell
from sgl_tpu.datasets.ogbn import Ogbn, OgbnMag
from sgl_tpu.datasets.npz_datasets import (
    Amazon,
    Coauthor,
    Reddit,
    Flickr,
    AmazonProduct,
)
from sgl_tpu.datasets.web_datasets import (
    Actor,
    WebKB,
    Airports,
    Twitch,
    Facebook,
    Github,
    Wikics,
    LINKXDataset,
    KarateClub,
)
from sgl_tpu.datasets.hetero_datasets import (
    Acm,
    Dblp,
    DblpOriginal,
    Imdb,
    Aminer,
)
from sgl_tpu.datasets.tu_dataset import TUDataset
from sgl_tpu.datasets.custom import Custom_Homo, Custom_Hetero
