from sgl_tpu.kernels.sparse import SparseAdj, spmm, sddmm, spmm_segment, spmm_multi, ensure_device_layout, set_default_backend
from sgl_tpu.kernels.pallas_spmm import ChunkedAdj, prepare_chunked, spmm_pallas

__all__ = [
    "SparseAdj",
    "ChunkedAdj",
    "prepare_chunked",
    "spmm",
    "sddmm",
    "spmm_segment",
    "spmm_multi",
    "spmm_pallas",
    "set_default_backend",
]
from sgl_tpu.kernels.pallas_spmm import (  # noqa: E402
    ChunkedPart,
    prepare_chunked_parts,
    spmm_pallas_streaming,
)
from sgl_tpu.kernels.spmm_ooc import (  # noqa: E402
    OutOfCoreAdj,
    OutOfCoreAdj2D,
    k_hop_out_of_core,
    load_out_of_core_2d,
    prepare_out_of_core,
    prepare_out_of_core_2d,
    save_out_of_core_2d,
    spmm_out_of_core,
    spmm_out_of_core_2d,
    spmm_pallas_2d_resident,
)
