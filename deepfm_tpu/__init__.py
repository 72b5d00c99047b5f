"""deepfm_tpu — a TPU-native CTR ranking framework (JAX/XLA/Pallas/pjit).

Brand-new implementation with the capabilities of the reference DeepFM /
xDeepFM / AttentionDeepFM stack, redesigned TPU-first: packed batches, fused
width-grouped embedding tables, a single jitted train step over a
("data", "model") device mesh with row-sharded tables, and Pallas kernels
for the hot lookup/interaction paths.
"""

__version__ = "0.1.0"

from deepfm_tpu.config import ExperimentConfig, load_config

__all__ = ["ExperimentConfig", "load_config", "__version__"]
