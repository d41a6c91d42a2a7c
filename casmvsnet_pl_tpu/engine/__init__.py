from .state import TrainState
from .trainer import MVSTrainer, model_batch_args

__all__ = ["TrainState", "MVSTrainer", "model_batch_args"]
