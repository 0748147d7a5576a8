from sgl_tpu.tricks.correct_and_smooth import CorrectAndSmooth
from sgl_tpu.tricks.utils import (
    label_propagation,
    loge_cross_entropy_loss,
    loge_bce_loss,
)
