from .state import TrainState, create_train_state, set_learning_rate  # noqa: F401
from .steps import make_eval_step, make_train_step, split_targets  # noqa: F401
from .plateau import ReduceLROnPlateau  # noqa: F401
from .loop import Trainer, train  # noqa: F401
from .checkpoint import CheckpointManager, load_checkpoint, save_checkpoint  # noqa: F401
