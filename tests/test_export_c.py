"""Policy->C export: trained networks deploy through the ControllerOps ABI.

Closes the reference's SI_Toolkit -> hls4ml / firmware deployment story
(/root/reference/Controllers/controller_neural_imitator.py evaluates the
net on the PC; controller_C.py:22-357 runs compiled C) natively: a trained
MLP/GRU/LSTM policy exports to one self-contained .c file that compiles
and runs through the existing CController path, bit-matching the JAX
evaluator to float32 tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from control_toolkit_tpu.controllers.c_controller import CController
from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.models.export_c import export_npz_policy_c, export_policy_c

CARTPOLE_INPUTS = ["position", "positionD", "angle", "angleD"]


def _make_ctrl(tmp_path, cfile):
    ctrl = CController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={},
        config={
            "controller_file": cfile.name,
            "firmware_path": str(tmp_path),
            "controller_logging": False,
        },
    )
    ctrl.configure()
    return ctrl


def _rand_states(n, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.5, 1.5, size=(n, 4)).astype(np.float32)


def test_mlp_export_matches_jax(tmp_path):
    key = jax.random.PRNGKey(0)
    sizes = [4, 16, 16, 1]
    params = nets.mlp_init(key, sizes)
    npz = tmp_path / "policy.npz"
    nets.save_net(
        npz, params,
        meta={"inputs": CARTPOLE_INPUTS, "outputs": ["Q"],
              "arch": {"kind": "mlp", "hiddens": [16, 16]}},
    )
    cfile = export_npz_policy_c(npz, tmp_path / "mlp_pol.c")
    ctrl = _make_ctrl(tmp_path, cfile)
    assert ctrl.input_names == CARTPOLE_INPUTS
    for s in _rand_states(16, 1):
        got = float(ctrl.step(s)[0, 0, 0])
        want = float(np.clip(nets.mlp_apply(params, jnp.asarray(s))[0], -1.0, 1.0))
        assert got == pytest.approx(want, abs=2e-6)


def test_mlp_export_no_clip(tmp_path):
    key = jax.random.PRNGKey(3)
    params = nets.mlp_init(key, [4, 8, 1])
    # Scale the output layer so raw outputs exceed [-1, 1].
    params["w1"] = params["w1"] * 50.0
    cfile = export_policy_c(
        params, {"kind": "mlp", "hiddens": [8]}, CARTPOLE_INPUTS,
        tmp_path / "raw_pol.c", clip_output=False,
    )
    ctrl = _make_ctrl(tmp_path, cfile)
    outs = [float(ctrl.step(s)[0, 0, 0]) for s in _rand_states(16, 2)]
    wants = [float(nets.mlp_apply(params, jnp.asarray(s))[0])
             for s in _rand_states(16, 2)]
    assert any(abs(w) > 1.0 for w in wants), "test net too tame to exercise clip"
    np.testing.assert_allclose(outs, wants, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind", ["gru", "lstm"])
def test_rnn_export_sequence_parity_and_reset(tmp_path, kind):
    key = jax.random.PRNGKey(7 if kind == "gru" else 8)
    init, apply, state0 = nets.RECURRENT_FNS[kind]
    hiddens = [12, 8]
    params = init(key, 4, hiddens, 1)
    npz = tmp_path / f"{kind}_policy.npz"
    nets.save_net(
        npz, params,
        meta={"inputs": CARTPOLE_INPUTS, "outputs": ["Q"],
              "arch": {"kind": kind, "hiddens": hiddens}},
    )
    cfile = export_npz_policy_c(npz, tmp_path / f"{kind}_pol.c")
    ctrl = _make_ctrl(tmp_path, cfile)

    states = _rand_states(10, 5)
    hs = state0(hiddens, 1)
    got, want = [], []
    for s in states:
        got.append(float(ctrl.step(s)[0, 0, 0]))
        out, hs = apply(params, jnp.asarray(s)[None, :], hs)
        want.append(float(np.clip(out[0, 0], -1.0, 1.0)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-6)
    # Hidden state matters: a fresh-hidden eval of the last state differs.
    out_fresh, _ = apply(params, jnp.asarray(states[-1])[None, :], state0(hiddens, 1))
    assert abs(float(out_fresh[0, 0]) - want[-1]) > 1e-7

    # init() resets the C-side hidden: replaying the sequence reproduces it.
    ctrl.lib_ctypes.controller_init()
    replay = [float(ctrl.step(s)[0, 0, 0]) for s in states]
    np.testing.assert_allclose(replay, got, rtol=0, atol=0)


def test_mlp_fixed_export_tracks_hls4ml_emulation(tmp_path):
    """Integer-only export == networks.mlp_apply_fixed to ~2 Q10 LSBs, and
    the generated C must not need libm (no-FPU firmware claim)."""
    key = jax.random.PRNGKey(11)
    params = nets.mlp_init(key, [4, 16, 16, 1])
    qparams = nets.quantize_params(params)
    cfile = export_policy_c(
        params, {"kind": "mlp", "hiddens": [16, 16]}, CARTPOLE_INPUTS,
        tmp_path / "mlp_fx.c", fixed_point=True,
    )
    src = cfile.read_text()
    assert "math.h" not in src and "tanhf" not in src and "expf" not in src
    ctrl = _make_ctrl(tmp_path, cfile)
    for s in _rand_states(32, 13):
        got = float(ctrl.step(s)[0, 0, 0])
        want = float(np.clip(
            nets.mlp_apply_fixed(qparams, jnp.asarray(s))[0], -1.0, 1.0))
        assert got == pytest.approx(want, abs=2.5 / 1024), (got, want, s)
        # Output sits exactly on the Q10 grid.
        assert abs(got * 1024 - round(got * 1024)) < 1e-4


@pytest.mark.parametrize("kind", ["gru", "lstm"])
def test_rnn_fixed_export_tracks_hls4ml_emulation(tmp_path, kind):
    key = jax.random.PRNGKey(21 if kind == "gru" else 22)
    init, _, state0 = nets.RECURRENT_FNS[kind]
    apply_fixed = nets.gru_apply_fixed if kind == "gru" else nets.lstm_apply_fixed
    hiddens = [12, 8]
    params = init(key, 4, hiddens, 1)
    qparams = nets.quantize_params(params)
    cfile = export_policy_c(
        params, {"kind": kind, "hiddens": hiddens}, CARTPOLE_INPUTS,
        tmp_path / f"{kind}_fx.c", fixed_point=True,
    )
    assert "math.h" not in cfile.read_text()
    ctrl = _make_ctrl(tmp_path, cfile)

    states = _rand_states(10, 23)
    hs = state0(hiddens, 1)
    worst = 0.0
    for s in states:
        got = float(ctrl.step(s)[0, 0, 0])
        out, hs = apply_fixed(qparams, jnp.asarray(s)[None, :], hs)
        want = float(np.clip(out[0, 0], -1.0, 1.0))
        worst = max(worst, abs(got - want))
    # Hidden-state feedback compounds LSB rounding differences; bound the
    # drift at 1% of full scale over a 10-step rollout.
    assert worst < 0.01, worst

    # Determinism + reset: integer datapath replays bitwise after init().
    ctrl.lib_ctypes.controller_init()
    replay = [float(ctrl.step(s)[0, 0, 0]) for s in states]
    ctrl.lib_ctypes.controller_init()
    replay2 = [float(ctrl.step(s)[0, 0, 0]) for s in states]
    np.testing.assert_array_equal(replay, replay2)


def test_exported_policy_over_uart_matches_local_bitwise(tmp_path):
    """Full deployment chain: export (fixed-point GRU) -> compile into the
    UART SoC firmware -> drive over the pty with EmbeddedController.  The
    integer datapath is deterministic, so the firmware's replies must equal
    the local ctypes build of the same .c bitwise, hidden state included."""
    import os
    import subprocess
    import time as time_mod
    import tty

    from control_toolkit_tpu.controllers.embedded import EmbeddedController
    from control_toolkit_tpu.models.export_c import build_soc_firmware
    from control_toolkit_tpu.native.uart_interface import UartInterface

    params = nets.gru_init(jax.random.PRNGKey(33), 4, [8], 1)
    cfile = export_policy_c(
        params, {"kind": "gru", "hiddens": [8]}, CARTPOLE_INPUTS,
        tmp_path / "uart_pol.c", fixed_point=True,
    )
    binary = build_soc_firmware(cfile, tmp_path / "soc_fw")

    master, slave = os.openpty()
    tty.setraw(master)
    tty.setraw(slave)
    proc = subprocess.Popen([str(binary), os.ttyname(slave)])
    try:
        time_mod.sleep(0.2)
        assert proc.poll() is None, "firmware exited prematurely"
        iface = UartInterface()
        iface.open_fd(master)
        ctrl = EmbeddedController(
            environment_name="cartpole",
            control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
            initial_environment_attributes={},
            config={"controller_logging": False},
        )
        ctrl.configure(interface=iface)
        assert ctrl.input_names == CARTPOLE_INPUTS

        local = _make_ctrl(tmp_path, cfile)
        for t, s in enumerate(_rand_states(8, 31)):
            over_uart = float(ctrl.step(s, time=t * 0.02)[0, 0, 0])
            local_q = float(local.step(s)[0, 0, 0])
            assert over_uart == local_q, (t, over_uart, local_q)
    finally:
        proc.terminate()
        proc.wait(timeout=5)
        os.close(master)
        os.close(slave)


def test_export_requires_arch_meta(tmp_path):
    params = nets.mlp_init(jax.random.PRNGKey(0), [4, 8, 1])
    npz = tmp_path / "bare.npz"
    nets.save_net(npz, params, meta={"inputs": CARTPOLE_INPUTS})
    with pytest.raises(ValueError, match="arch"):
        export_npz_policy_c(npz, tmp_path / "bare_pol.c")


def test_export_unknown_kind_raises(tmp_path):
    with pytest.raises(ValueError, match="kind"):
        export_policy_c({}, {"kind": "transformer"}, CARTPOLE_INPUTS,
                        tmp_path / "x.c")
