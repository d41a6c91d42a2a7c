from .checkpoints import (TopKCheckpointManager, extract_model_params,
                          load_checkpoint, partial_load, save_checkpoint)
from .init import init_on_cpu
from .optimizers import (OptimConfig, make_lr_schedule, make_optimizer,
                         unwrap_params_for, wrap_params_for)
from .visualization import visualize_depth, visualize_prob

__all__ = [
    "init_on_cpu",
    "OptimConfig", "make_lr_schedule", "make_optimizer", "wrap_params_for",
    "unwrap_params_for",
    "save_checkpoint", "load_checkpoint", "extract_model_params",
    "partial_load", "TopKCheckpointManager",
    "visualize_depth", "visualize_prob",
]
