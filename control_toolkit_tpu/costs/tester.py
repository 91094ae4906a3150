"""Cost-function debugging harness.

Capability parity with the reference CostFunctionTester
(/root/reference/Cost_Functions/cost_function_tester.py:12-61): buffer each
named cost component per control step and plot them over time.  Cost
functions opt in by returning a dict from ``cost_components(states, inputs,
previous_input, params)``; matplotlib is imported lazily so headless use
stays dependency-free (``to_arrays`` serves tests/CI).
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np


class CostFunctionTester:
    def __init__(self, cost_function_wrapper):
        self.cost_function = getattr(
            cost_function_wrapper, "cost_function", cost_function_wrapper
        )
        if not hasattr(self.cost_function, "cost_components"):
            raise TypeError(
                f"{type(self.cost_function).__name__} does not expose "
                "cost_components(states, inputs, previous_input, params)"
            )
        self.buffers: Dict[str, List[np.ndarray]] = {}

    def collect_costs(self, states, inputs, previous_input=None, params=None) -> Dict:
        params = params if params is not None else self.cost_function.current_params()
        comps = self.cost_function.cost_components(states, inputs, previous_input, params)
        for k, v in comps.items():
            # first rollout, first horizon step (reference :47-48); ravel
            # handles every rank incl. 0-d scalar components (a shape[0]
            # index would crash the debugging harness mid-run).
            val = np.ravel(np.asarray(v))[0]
            self.buffers.setdefault(k, []).append(val)
        return comps

    def to_arrays(self) -> Dict[str, np.ndarray]:
        return {k: np.stack(v) for k, v in self.buffers.items()}

    def plot(self, show: bool = True):
        import matplotlib
        if not show:
            matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        for k, v in self.to_arrays().items():
            plt.plot(v, label=k)
        plt.legend()
        plt.xlabel("control step")
        plt.ylabel("cost component")
        if show:
            plt.show()
        self.clear_buffers()
        return fig

    def clear_buffers(self) -> None:
        self.buffers = {}
