from control_toolkit_tpu.evaluation.closed_loop import ClosedLoop
from control_toolkit_tpu.evaluation.tuning import grid_search

__all__ = ["ClosedLoop", "grid_search"]
