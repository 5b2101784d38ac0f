from .apply import apply_epoch
from .job import replay_batch, run_stream

__all__ = ["apply_epoch", "replay_batch", "run_stream"]
