from deepfm_tpu.utils.io import (
    load_checkpoint,
    load_results,
    save_checkpoint,
    save_results,
)
from deepfm_tpu.utils.logging import get_logger
from deepfm_tpu.utils.seeding import make_rngs, seed_everything

__all__ = [
    "get_logger",
    "load_checkpoint",
    "load_results",
    "make_rngs",
    "save_checkpoint",
    "save_results",
    "seed_everything",
]
