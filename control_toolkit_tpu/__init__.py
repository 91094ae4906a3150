"""control_toolkit_tpu — a TPU-native MPC framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
SensorsINI/Control_Toolkit (reference at /root/reference): modular MPC
controllers, a zoo of sampling/gradient trajectory optimizers compiled to
single jitted programs, batched dynamics predictors rolled out with lax.scan
(and a fused Pallas rollout+cost kernel on the hot path), YAML config with
cost-parameter hot-reload, trajectory logging, ZeroMQ serving, and
embedded/C hardware edges.
"""
__version__ = "0.1.0"

from control_toolkit_tpu.utils import registry as registry
from control_toolkit_tpu.utils.config import set_asf_config_dir as set_asf_config_dir
from control_toolkit_tpu.utils.registry import (
    import_controller_by_name as import_controller_by_name,
    import_optimizer_by_name as import_optimizer_by_name,
    get_available_controller_names as get_available_controller_names,
    get_available_optimizer_names as get_available_optimizer_names,
    get_controller_name as get_controller_name,
    get_optimizer_name as get_optimizer_name,
)
