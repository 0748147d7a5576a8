from sgl_tpu.utils.compile_cache import enable_compilation_cache
from sgl_tpu.utils.config import TrainConfig, MeshConfig
from sgl_tpu.utils.hop_store import HostHops, MemmapHopSink
from sgl_tpu.utils.profiling import StageTimer, slope_time, sync, xla_trace
from sgl_tpu.utils.checkpoint import (
    HopCheckpointer,
    load_pytree,
    load_train_state,
    save_pytree,
    save_train_state,
)
from sgl_tpu.utils.device import (
    GpuWithMaxFreeMem,
    default_backend,
    device_with_max_free_mem,
    num_devices,
)
