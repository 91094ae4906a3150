from control_toolkit_tpu.evaluation.closed_loop import ClosedLoop

__all__ = ["ClosedLoop"]
