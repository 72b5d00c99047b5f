from deepfm_tpu.utils.export import (
    export_scoring,
    load_scoring,
    quantize_embedding_tables,
    quantized_scoring_model,
    save_scoring,
    serving_config,
)
from deepfm_tpu.utils.io import (
    load_checkpoint,
    load_results,
    save_checkpoint,
    save_results,
)
from deepfm_tpu.utils.logging import get_logger
from deepfm_tpu.utils.seeding import make_rngs, seed_everything

__all__ = [
    "export_scoring",
    "get_logger",
    "load_checkpoint",
    "load_results",
    "load_scoring",
    "make_rngs",
    "quantize_embedding_tables",
    "quantized_scoring_model",
    "save_checkpoint",
    "save_results",
    "save_scoring",
    "seed_everything",
    "serving_config",
]
