"""Multi-process (simulated multi-host) SPMD execution.

VERDICT r2 item 1: the virtual single-process mesh covers SPMD *logic* but
not the distributed runtime.  Here N OS processes each own M virtual CPU
devices, `jax.distributed.initialize` builds the global mesh, and the
sharded MPPI + RPGD steps run with gloo cross-process collectives.  The
result must equal the single-process 8-device run (same global mesh shape)
— the multi-controller model promises the SPMD program is identical.

Reference has no distributed compute at all (SURVEY §5) — this is
north-star coverage (BASELINE.md scale-out), not parity.
"""
import numpy as np
import pytest

from control_toolkit_tpu.parallel.launch import (
    MULTIHOST_CONFIG,
    launch_workers,
    run_sharded_trace,
)

pytestmark = pytest.mark.slow

STEPS = 3


@pytest.fixture(scope="module")
def multiproc_traces():
    # 2 processes x 4 devices = one global 8-device ('k',) mesh.
    return launch_workers(num_processes=2, local_devices=4, steps=STEPS)


def test_cross_process_consistency(multiproc_traces):
    """Every process computes the same global program -> identical traces."""
    a, b = multiproc_traces
    assert set(a) == {"mppi", "rpgd-tf"}
    for name in a:
        np.testing.assert_array_equal(a[name], b[name])


@pytest.mark.parametrize("name", ["mppi", "rpgd-tf"])
def test_matches_single_process(multiproc_traces, name):
    """2-proc x 4-dev == 1-proc x 8-dev to 2e-5 (same global mesh shape,
    so the SPMD partitioning is identical; only the runtime differs)."""
    import jax

    from control_toolkit_tpu.parallel.mesh import make_rollout_mesh

    mesh = make_rollout_mesh(jax.devices())  # conftest: 8 virtual devices
    single = run_sharded_trace(name, mesh, STEPS)
    multi = multiproc_traces[0][name]
    np.testing.assert_allclose(multi, single, atol=2e-5, rtol=0)


def test_worker_sees_global_mesh(multiproc_traces):
    """Traces exist and have the right shape [steps, U]."""
    for proc in multiproc_traces:
        for name, tr in proc.items():
            assert tr.shape == (STEPS, 1)
            assert np.all(np.isfinite(tr))


def test_multislice_mesh_across_processes():
    """2-D ('slice','k') mesh with one slice per PROCESS: cross-slice
    collectives cross the process (DCN-analog) boundary.  Result equals the
    single-process multislice run on the same global mesh shape."""
    import jax

    from control_toolkit_tpu.parallel.mesh import make_multislice_mesh

    multi = launch_workers(num_processes=2, local_devices=4, steps=2,
                           optimizers="mppi", mesh="slice")
    np.testing.assert_array_equal(multi[0]["mppi"], multi[1]["mppi"])

    mesh = make_multislice_mesh(2, jax.devices())  # single-process, 2x4
    single = run_sharded_trace("mppi", mesh, 2)
    np.testing.assert_allclose(multi[0]["mppi"], single, atol=2e-5, rtol=0)


def test_batched_serving_slot_spmd_across_processes():
    """Slot-axis SPMD serving across OS processes: 8 MPPI sessions
    sharded over a 2-process x 4-device global mesh (BatchedMPC
    shard_map, zero collectives; only the final [B,U] control is
    allgathered).  Both processes serve identical controls, equal to the
    unsharded single-process batched controller to 2e-5 — slot-keyed
    PRNG streams make the device/process grouping immaterial."""
    from control_toolkit_tpu.parallel.launch import (
        BATCHED_SLOTS,
        run_batched_trace,
    )

    traces = launch_workers(
        num_processes=2, local_devices=4, steps=STEPS, optimizers="batched"
    )
    a, b = traces[0]["batched"], traces[1]["batched"]
    assert a.shape == (STEPS, BATCHED_SLOTS, 1)
    np.testing.assert_array_equal(a, b)

    single = run_batched_trace(None, STEPS)      # unsharded reference
    np.testing.assert_allclose(a, single, atol=2e-5, rtol=0)


def test_training_across_processes():
    """Data-parallel predictor training across OS processes: the minibatch
    axis of fit_mlp_dynamics shards over a 2-process x 4-device global mesh
    (params replicated, gradient all-reduce over the gloo/DCN-analog
    boundary).  Both processes produce identical params, equal to the
    unsharded single-process fit to 2e-5 (TRAIN_EPOCHS is small; per-step
    math differs only by reduction order)."""
    from control_toolkit_tpu.parallel.launch import run_training_trace

    traces = launch_workers(
        num_processes=2, local_devices=4, optimizers="train"
    )
    a, b = traces[0]["train"], traces[1]["train"]
    np.testing.assert_array_equal(a, b)

    single = run_training_trace(None)            # unsharded reference
    np.testing.assert_allclose(a, single, atol=2e-5, rtol=0)


@pytest.mark.slow
def test_ensemble_training_across_processes():
    """Member-axis ensemble training across OS processes: E=8 bootstrap
    members shard one-per-device over the 2-process x 4-device global mesh
    (the expert-parallel analog; zero collectives — members are
    independent).  Both processes produce identical stacked params, equal
    to the unsharded single-process fit (members see no reduction-order
    change, so parity is tight)."""
    from control_toolkit_tpu.parallel.launch import run_ensemble_training_trace

    traces = launch_workers(
        num_processes=2, local_devices=4, optimizers="train-ens"
    )
    a, b = traces[0]["train-ens"], traces[1]["train-ens"]
    np.testing.assert_array_equal(a, b)

    single = run_ensemble_training_trace(None)   # unsharded reference
    np.testing.assert_allclose(a, single, atol=2e-5, rtol=0)
