from sgl_tpu.search.base_search import BaseSearch
from sgl_tpu.search.search_models import SearchModel
from sgl_tpu.search.auto_search import SearchManager
from sgl_tpu.search.search_config import ConfigManager, ARCH_KEYS
from sgl_tpu.search.prop_cache import PropagationCache
from sgl_tpu.search.smbo import (
    run_nas,
    run_sha,
    RandomSearch,
    EvolutionarySearch,
    History,
    Trial,
)
from sgl_tpu.search.auto_search_dist import (
    SearchManagerDist,
    SearchModelDist,
    ConfigManagerDist,
)
