from .checkpoint import restore_checkpoint, save_checkpoint
from .export import export_serving_fn, load_serving_fn
from .profiling import StageTimer, trace
