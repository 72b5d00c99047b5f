from deepfm_tpu.ops.attention import MultiHeadSelfAttention
from deepfm_tpu.ops.cin import CIN, cin_output_dim
from deepfm_tpu.ops.dnn import DNN
from deepfm_tpu.ops.embedding import FeatureEmbedding
from deepfm_tpu.ops.fm import fm_interaction

__all__ = [
    "CIN",
    "DNN",
    "FeatureEmbedding",
    "MultiHeadSelfAttention",
    "cin_output_dim",
    "fm_interaction",
]
