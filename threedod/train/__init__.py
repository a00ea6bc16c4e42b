from .checkpoint import CheckpointManager
from .events import EventStorage
from .solver import build_optimizer, warmup_multistep_schedule
from .trainer import Trainer, TrainState, train_with_retries
