from .image_pool import PoolState, init_pool, query_pool
from .model import GanModel, TrainState, create_model
from .schedule import global_freeze_mask, linear_decay_schedule
from .trainer import Trainer

__all__ = [
    "GanModel",
    "TrainState",
    "create_model",
    "Trainer",
    "PoolState",
    "init_pool",
    "query_pool",
    "linear_decay_schedule",
    "global_freeze_mask",
]
