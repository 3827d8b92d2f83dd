"""Training layer: one generic trainer + task losses replace the
reference's 23 near-identical train_*.py scripts (SURVEY.md §2.3)."""

from speech_recognition_tools_tpu.train.losses import (
    masked_cross_entropy,
    masked_frame_error,
    masked_mse,
    masked_l1,
)
from speech_recognition_tools_tpu.train.optim import make_optimizer
from speech_recognition_tools_tpu.train.trainer import (
    Trainer,
    TrainConfig,
    TrainState,
)
from speech_recognition_tools_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint,
)
