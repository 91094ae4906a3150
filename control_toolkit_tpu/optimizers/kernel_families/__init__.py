"""Per-model-family Pallas kernel providers (VERDICT r4 weak #5).

Each model family the Pallas kernel stack supports lives in its own
module here, exposing a uniform provider surface over an ``Optimizer``
instance ``opt``:

* ``compatible_model(opt)`` — backend + model/cost eligibility,
  independent of population divisibility and the ``force_scan``
  override (batched callers add their own tiling checks);
* ``can_use_cost(opt, tile_k=None)`` / ``build_cost(opt, interpret,
  tile_k)`` — the fused rollout+cost kernel gate and binder
  (``cost_fn(s_tiled, Q, u_prev, params) -> [K]``);
* ``can_use_grad(opt)`` / ``build_grad(opt, interpret, tile_k)`` — the
  fused forward+backward gradient twin (``fn(...) -> (cost [K],
  dQ [K,H,U])``), where the family has one;
* ``batched_kernels(opt, ...)`` — the columns-mode (``slot_keys``)
  kernel pair for the batched gradient optimizers, where supported
  (``optimizers/base.py _bind_batched_grad_kernels`` orchestrates).

``Optimizer`` keeps its historical ``_pallas_*`` / ``_can_use_*`` /
``_build_pallas_*`` method names as one-line delegations (every
external caller — the optimizer zoo, BatchedMPC, ClosedLoop, tests —
is unchanged); the ONLY dispatch logic left in base.py is the ordered
scan over ``COST_ORDER`` / ``GRAD_ORDER`` below and the generic shared
plumbing (SOA bindings, shard_map wrapper, risk/robust wrappers).

Adding a new model family = one new module here + appending it to the
order tuples (plus, for serving fleets, a ``batched_kernels`` entry).
"""
from control_toolkit_tpu.optimizers.kernel_families import (  # noqa: F401
    batched,
    ensemble,
    gp,
    neural,
    ode,
    report,
    residual,
)

# Preference order of `_make_cost_only` / `_make_grad_and_cost_only`:
# analytic ODE first (cheapest body), then the learned families.  The
# gates are mutually exclusive on the predictor type, so order only
# breaks ties in documentation, not behavior.
COST_ORDER = (ode, neural, ensemble, gp, residual)
GRAD_ORDER = (ode, neural, ensemble, gp, residual)
