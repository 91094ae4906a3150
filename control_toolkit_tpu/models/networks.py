"""Neural network evaluators: MLP and GRU policies/dynamics models.

The reference delegates network policies to SI_Toolkit's
``neural_network_evaluator`` (used by controller_neural_imitator,
/root/reference/Controllers/controller_neural_imitator.py:2,21-26; network
predictor kinds named in config_controllers.yml:8, e.g.
'GRU-6IN-32H1-32H2-5OUT-0').  Here networks are pure-JAX functions over
explicit parameter pytrees — directly jit/scan/vmap-compatible, trivially
checkpointable (flat dict of arrays -> npz/orbax), and usable both as
policies (neural imitator) and as dynamics predictors.

Architecture strings follow the reference naming scheme:
  "mlp-32-32"              2 hidden layers of 32, tanh
  "GRU-6IN-32H1-32H2-5OUT" GRU with 2 stacked cells (32, 32)
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- MLP
def mlp_init(key: jax.Array, sizes: Sequence[int]) -> Dict:
    """Glorot-initialized MLP params for layer sizes [in, h1, ..., out]."""
    params = {}
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        scale = jnp.sqrt(2.0 / (fan_in + fan_out))
        params[f"w{i}"] = scale * jax.random.normal(keys[i], (fan_in, fan_out))
        params[f"b{i}"] = jnp.zeros((fan_out,))
    return params


def mlp_apply(params: Dict, x: jnp.ndarray, activation=jnp.tanh) -> jnp.ndarray:
    n = sum(1 for k in params if k.startswith("w"))
    for i in range(n):
        x = x @ params[f"w{i}"] + params[f"b{i}"]
        if i < n - 1:
            x = activation(x)
    return x


# ---------------------------------------------------------------- GRU
def gru_cell_init(key: jax.Array, in_dim: int, hidden: int) -> Dict:
    k1, k2 = jax.random.split(key)
    scale_i = jnp.sqrt(1.0 / in_dim)
    scale_h = jnp.sqrt(1.0 / hidden)
    return {
        "wi": scale_i * jax.random.normal(k1, (in_dim, 3 * hidden)),
        "wh": scale_h * jax.random.normal(k2, (hidden, 3 * hidden)),
        "bi": jnp.zeros((3 * hidden,)),
        "bh": jnp.zeros((3 * hidden,)),
    }


def gru_cell_apply(p: Dict, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Standard GRU cell: x [..., I], h [..., H] -> h' [..., H]."""
    gi = x @ p["wi"] + p["bi"]
    gh = h @ p["wh"] + p["bh"]
    H = h.shape[-1]
    r = jax.nn.sigmoid(gi[..., :H] + gh[..., :H])
    z = jax.nn.sigmoid(gi[..., H:2*H] + gh[..., H:2*H])
    n = jnp.tanh(gi[..., 2*H:] + r * gh[..., 2*H:])
    return (1.0 - z) * n + z * h


def gru_init(key: jax.Array, in_dim: int, hiddens: Sequence[int], out_dim: int) -> Dict:
    keys = jax.random.split(key, len(hiddens) + 1)
    params: Dict = {}
    d = in_dim
    for i, h in enumerate(hiddens):
        params[f"cell{i}"] = gru_cell_init(keys[i], d, h)
        d = h
    scale = jnp.sqrt(1.0 / d)
    params["wo"] = scale * jax.random.normal(keys[-1], (d, out_dim))
    params["bo"] = jnp.zeros((out_dim,))
    return params


def gru_apply(params: Dict, x: jnp.ndarray, hs: Tuple[jnp.ndarray, ...]):
    """One step through stacked GRU cells.

    x: [..., I]; hs: tuple of per-layer hidden states [..., H_i].
    Returns (output [..., O], new_hs).
    """
    new_hs = []
    inp = x
    for i in range(len(hs)):
        h_new = gru_cell_apply(params[f"cell{i}"], inp, hs[i])
        new_hs.append(h_new)
        inp = h_new
    out = inp @ params["wo"] + params["bo"]
    return out, tuple(new_hs)


def gru_init_state(hiddens: Sequence[int], batch: int) -> Tuple[jnp.ndarray, ...]:
    return tuple(jnp.zeros((batch, h)) for h in hiddens)


# ---------------------------------------------------------------- LSTM
# Per-layer state is one array [..., 2H] = concat(h, c), so the state
# pytree stays a flat tuple of arrays (checkpointable, vmappable) exactly
# like the GRU's.

def lstm_cell_init(key: jax.Array, in_dim: int, hidden: int) -> Dict:
    k1, k2 = jax.random.split(key)
    scale_i = jnp.sqrt(1.0 / in_dim)
    scale_h = jnp.sqrt(1.0 / hidden)
    bi = jnp.zeros((4 * hidden,))
    # Standard forget-gate bias of 1.0 (gates ordered i, f, g, o).
    bi = bi.at[hidden:2 * hidden].set(1.0)
    return {
        "wi": scale_i * jax.random.normal(k1, (in_dim, 4 * hidden)),
        "wh": scale_h * jax.random.normal(k2, (hidden, 4 * hidden)),
        "bi": bi,
        "bh": jnp.zeros((4 * hidden,)),
    }


def lstm_cell_apply(p: Dict, x: jnp.ndarray, hc: jnp.ndarray):
    """x [..., I], hc [..., 2H] -> (h' [..., H], hc' [..., 2H])."""
    H = hc.shape[-1] // 2
    h, c = hc[..., :H], hc[..., H:]
    g = x @ p["wi"] + p["bi"] + h @ p["wh"] + p["bh"]
    i = jax.nn.sigmoid(g[..., :H])
    f = jax.nn.sigmoid(g[..., H:2 * H])
    gg = jnp.tanh(g[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(g[..., 3 * H:])
    c_new = f * c + i * gg
    h_new = o * jnp.tanh(c_new)
    return h_new, jnp.concatenate([h_new, c_new], axis=-1)


def lstm_init(key: jax.Array, in_dim: int, hiddens: Sequence[int], out_dim: int) -> Dict:
    keys = jax.random.split(key, len(hiddens) + 1)
    params: Dict = {}
    d = in_dim
    for i, h in enumerate(hiddens):
        params[f"cell{i}"] = lstm_cell_init(keys[i], d, h)
        d = h
    scale = jnp.sqrt(1.0 / d)
    params["wo"] = scale * jax.random.normal(keys[-1], (d, out_dim))
    params["bo"] = jnp.zeros((out_dim,))
    return params


def lstm_apply(params: Dict, x: jnp.ndarray, hs: Tuple[jnp.ndarray, ...]):
    """One step through stacked LSTM cells; hs entries are [..., 2H_i]."""
    new_hs = []
    inp = x
    for i in range(len(hs)):
        h_out, hc_new = lstm_cell_apply(params[f"cell{i}"], inp, hs[i])
        new_hs.append(hc_new)
        inp = h_out
    out = inp @ params["wo"] + params["bo"]
    return out, tuple(new_hs)


def lstm_init_state(hiddens: Sequence[int], batch: int) -> Tuple[jnp.ndarray, ...]:
    return tuple(jnp.zeros((batch, 2 * h)) for h in hiddens)


RECURRENT_FNS = {
    # kind -> (param_init, apply, init_state)
    "gru": (gru_init, gru_apply, gru_init_state),
    "lstm": (lstm_init, lstm_apply, lstm_init_state),
}


# ------------------------------------------------ architecture strings
def parse_net_name(name: str) -> Dict:
    """Parse a reference-style network name into an architecture spec."""
    low = name.lower()
    if low.startswith("mlp"):
        hiddens = [int(x) for x in re.findall(r"-(\d+)", name)]
        return {"kind": "mlp", "hiddens": hiddens or [32, 32]}
    if low.startswith("gru") or low.startswith("lstm"):
        in_m = re.search(r"(\d+)in", low)
        out_m = re.search(r"(\d+)out", low)
        hiddens = [int(h) for h in re.findall(r"(\d+)h\d", low)]
        return {
            "kind": "lstm" if low.startswith("lstm") else "gru",
            "in_dim": int(in_m.group(1)) if in_m else None,
            "out_dim": int(out_m.group(1)) if out_m else None,
            "hiddens": hiddens or [32],
        }
    raise ValueError(f"Cannot parse network name {name!r}")


# ------------------------------------------------ checkpoint I/O
def _flatten_params(params: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten nested param dicts with '/'-joined keys (cell0/wi, ...) so
    npz stores pure arrays — nested dicts would otherwise be pickled 0-d
    object arrays that np.load(allow_pickle=False) refuses to read."""
    flat: Dict[str, np.ndarray] = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten_params(v, prefix=f"{key}/"))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten_params(flat: Dict[str, jnp.ndarray]) -> Dict:
    nested: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = nested
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return nested


def save_net(path, params: Dict, meta: Optional[Dict] = None) -> None:
    flat = _flatten_params(params)
    if meta:
        import json
        flat["__meta"] = np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        )
    np.savez(path, **flat)


def load_net(path) -> Tuple[Dict, Dict]:
    import json
    data = np.load(path)
    meta = {}
    flat = {}
    for k in data.files:
        if k == "__meta":
            meta = json.loads(bytes(data[k]).decode("utf-8"))
        else:
            flat[k] = jnp.asarray(data[k])
    return _unflatten_params(flat), meta


def fixed_q(v: jnp.ndarray, total_bits: int = 16, frac_bits: int = 10) -> jnp.ndarray:
    """Round-and-saturate to ap_fixed<total_bits, total_bits-frac_bits>
    semantics (signed fixed point, round-to-nearest, saturating)."""
    scale = float(2**frac_bits)
    lo = -(2 ** (total_bits - 1)) / scale
    hi = (2 ** (total_bits - 1) - 1) / scale
    return jnp.clip(jnp.round(v * scale) / scale, lo, hi)


def quantize_params(params: Dict, total_bits: int = 16, frac_bits: int = 10) -> Dict:
    """Fixed-point weight emulation for the hls4ml/FPGA mode
    (reference controller_neural_imitator.py:44-45,109-113): quantize every
    weight to ap_fixed<total_bits, total_bits-frac_bits> semantics."""

    def q(v):
        v = jnp.asarray(v)
        if v.dtype not in (jnp.float32, jnp.float64):
            return v
        return fixed_q(v, total_bits, frac_bits)

    return jax.tree_util.tree_map(q, params)


# ------------------------------------------------ hls4ml fixed-point forward
# hls4ml-converted models compute EVERYTHING in fixed point: inputs, weights,
# per-layer accumulators (typically a wider ap_fixed) and activation outputs.
# These forward passes emulate that datapath: quantize the input, quantize
# each matmul result at accumulator precision, quantize each activation
# output back to data precision.  Weights are assumed pre-quantized via
# quantize_params.

def mlp_apply_fixed(
    params: Dict,
    x: jnp.ndarray,
    activation=jnp.tanh,
    total_bits: int = 16,
    frac_bits: int = 10,
    acc_total_bits: int = 32,
    acc_frac_bits: int = 20,
) -> jnp.ndarray:
    q = lambda v: fixed_q(v, total_bits, frac_bits)
    qa = lambda v: fixed_q(v, acc_total_bits, acc_frac_bits)
    x = q(x)
    n = sum(1 for k in params if k.startswith("w"))
    for i in range(n):
        acc = qa(x @ params[f"w{i}"] + params[f"b{i}"])
        x = q(activation(acc)) if i < n - 1 else q(acc)
    return x


def gru_cell_apply_fixed(
    p: Dict, x: jnp.ndarray, h: jnp.ndarray,
    total_bits: int = 16, frac_bits: int = 10,
    acc_total_bits: int = 32, acc_frac_bits: int = 20,
) -> jnp.ndarray:
    q = lambda v: fixed_q(v, total_bits, frac_bits)
    qa = lambda v: fixed_q(v, acc_total_bits, acc_frac_bits)
    gi = qa(x @ p["wi"] + p["bi"])
    gh = qa(h @ p["wh"] + p["bh"])
    H = h.shape[-1]
    r = q(jax.nn.sigmoid(gi[..., :H] + gh[..., :H]))
    z = q(jax.nn.sigmoid(gi[..., H:2*H] + gh[..., H:2*H]))
    n = q(jnp.tanh(gi[..., 2*H:] + q(r * gh[..., 2*H:])))
    return q((1.0 - z) * n + z * h)


def lstm_cell_apply_fixed(
    p: Dict, x: jnp.ndarray, hc: jnp.ndarray,
    total_bits: int = 16, frac_bits: int = 10,
    acc_total_bits: int = 32, acc_frac_bits: int = 20,
):
    """hls4ml ap_fixed datapath for one LSTM cell (mirrors
    gru_cell_apply_fixed): gate pre-activations quantized at accumulator
    precision, gate outputs and both states at data precision.  The cell
    state c is kept at data precision after every update — the FPGA stores
    it in the same ap_fixed type as h."""
    q = lambda v: fixed_q(v, total_bits, frac_bits)
    qa = lambda v: fixed_q(v, acc_total_bits, acc_frac_bits)
    H = hc.shape[-1] // 2
    h, c = hc[..., :H], hc[..., H:]
    g = qa(x @ p["wi"] + p["bi"]) + qa(h @ p["wh"] + p["bh"])
    i = q(jax.nn.sigmoid(g[..., :H]))
    f = q(jax.nn.sigmoid(g[..., H:2 * H]))
    gg = q(jnp.tanh(g[..., 2 * H:3 * H]))
    o = q(jax.nn.sigmoid(g[..., 3 * H:]))
    c_new = q(q(f * c) + q(i * gg))
    h_new = q(o * jnp.tanh(c_new))
    return h_new, jnp.concatenate([h_new, c_new], axis=-1)


def lstm_apply_fixed(
    params: Dict, x: jnp.ndarray, hs: Tuple[jnp.ndarray, ...],
    total_bits: int = 16, frac_bits: int = 10,
    acc_total_bits: int = 32, acc_frac_bits: int = 20,
):
    """Fixed-point stacked-LSTM forward (hls4ml emulation; reference
    evaluates whatever hls4ml model is loaded,
    controller_neural_imitator.py:109-113)."""
    q = lambda v: fixed_q(v, total_bits, frac_bits)
    qa = lambda v: fixed_q(v, acc_total_bits, acc_frac_bits)
    new_hs = []
    inp = q(x)
    for i in range(len(hs)):
        h_out, hc_new = lstm_cell_apply_fixed(
            params[f"cell{i}"], inp, hs[i],
            total_bits, frac_bits, acc_total_bits, acc_frac_bits,
        )
        new_hs.append(hc_new)
        inp = h_out
    out = q(qa(inp @ params["wo"] + params["bo"]))
    return out, tuple(new_hs)


def gru_apply_fixed(
    params: Dict, x: jnp.ndarray, hs: Tuple[jnp.ndarray, ...],
    total_bits: int = 16, frac_bits: int = 10,
    acc_total_bits: int = 32, acc_frac_bits: int = 20,
):
    q = lambda v: fixed_q(v, total_bits, frac_bits)
    qa = lambda v: fixed_q(v, acc_total_bits, acc_frac_bits)
    new_hs = []
    inp = q(x)
    for i in range(len(hs)):
        h_new = gru_cell_apply_fixed(
            params[f"cell{i}"], inp, hs[i],
            total_bits, frac_bits, acc_total_bits, acc_frac_bits,
        )
        new_hs.append(h_new)
        inp = h_new
    out = q(qa(inp @ params["wo"] + params["bo"]))
    return out, tuple(new_hs)
