from deepfm_tpu.training.metrics import (
    RankingEvaluator,
    compute_auc,
    compute_hr_at_k,
    compute_logloss,
    compute_ndcg_at_k,
    grouped_ranking_metrics,
)
from deepfm_tpu.training.trainer import (
    PlateauScheduler,
    Trainer,
    TrainState,
    build_optimizer,
)

__all__ = [
    "PlateauScheduler",
    "RankingEvaluator",
    "TrainState",
    "Trainer",
    "build_optimizer",
    "compute_auc",
    "compute_hr_at_k",
    "compute_logloss",
    "compute_ndcg_at_k",
    "grouped_ranking_metrics",
]
