from sgl_tpu.kernels.sparse import SparseAdj, spmm, sddmm, spmm_segment, set_default_backend
from sgl_tpu.kernels.pallas_spmm import spmm_pallas

__all__ = [
    "SparseAdj",
    "spmm",
    "sddmm",
    "spmm_segment",
    "spmm_pallas",
    "set_default_backend",
]
