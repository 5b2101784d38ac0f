from .apply import apply_epoch
from .job import replay_batch, run_stream
from .multi import apply_epoch_multi

__all__ = ["apply_epoch", "apply_epoch_multi", "replay_batch", "run_stream"]
