"""Generate Keras network golden fixtures for the neural-family parity
tests.

Run manually in a TF-equipped environment:

    python tests/golden/generate_net_golden.py

The reference's neural predictors/imitators are Keras layers loaded by
SI_Toolkit (GRU names in Control_Toolkit_ASF_Template/
config_controllers.yml:8).  This records, for fixed random inputs:

- a Keras GRU (reset_after=True, the v2 default the reference trains with)
  hidden-state sequence, with its weights REMAPPED into this framework's
  gru param layout (Keras gate order z,r,h -> ours r,z,n; recurrent bias
  split kept),
- a Keras LSTM (unit_forget_bias) ditto (gate order i,f,c,o matches ours),
- a Keras Dense tanh MLP output.

tests/test_tf_parity.py replays the same inputs through
models/networks.py's gru_apply/lstm_apply/mlp_apply and must match —
proving the cells compute the SAME function as the reference's Keras
layers, not merely "a GRU".
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
import tensorflow as tf  # noqa: E402

tf.config.set_visible_devices([], "GPU")

HERE = Path(__file__).resolve().parent

IN_DIM, HID, OUT, T, B = 6, 8, 4, 12, 3


def permute_gru(kernel, recurrent, bias):
    """Keras GRU (z, r, h) + bias [2, 3H] -> our (r, z, n) wi/wh/bi/bh."""
    H = HID

    def perm(m):
        z, r, h = m[..., :H], m[..., H:2 * H], m[..., 2 * H:]
        return np.concatenate([r, z, h], axis=-1)

    return {
        "wi": perm(kernel), "wh": perm(recurrent),
        "bi": perm(bias[0]), "bh": perm(bias[1]),
    }


def main():
    rng = np.random.default_rng(5)
    x_seq = rng.normal(size=(B, T, IN_DIM)).astype(np.float32)

    # ---- GRU (reset_after=True is the Keras default) ----------------------
    gru = tf.keras.layers.GRU(
        HID, return_sequences=True, return_state=True, reset_after=True
    )
    h_seq, h_last = gru(tf.convert_to_tensor(x_seq))
    gk, gr, gb = [w.numpy() for w in gru.weights]
    gru_params = permute_gru(gk, gr, gb)

    # ---- LSTM -------------------------------------------------------------
    lstm = tf.keras.layers.LSTM(
        HID, return_sequences=True, return_state=True, unit_forget_bias=True
    )
    l_seq, l_h, l_c = lstm(tf.convert_to_tensor(x_seq))
    lk, lr, lb = [w.numpy() for w in lstm.weights]
    lstm_params = {"wi": lk, "wh": lr, "bi": lb,
                   "bh": np.zeros_like(lb)}

    # ---- Dense tanh MLP ---------------------------------------------------
    mlp = tf.keras.Sequential([
        tf.keras.layers.Dense(HID, activation="tanh", input_shape=(IN_DIM,)),
        tf.keras.layers.Dense(HID, activation="tanh"),
        tf.keras.layers.Dense(OUT),
    ])
    x_flat = rng.normal(size=(B * T, IN_DIM)).astype(np.float32)
    y_mlp = mlp(tf.convert_to_tensor(x_flat)).numpy()
    mlp_params = {}
    for i, layer in enumerate(mlp.layers):
        w, b = [v.numpy() for v in layer.weights]
        mlp_params[f"w{i}"] = w
        mlp_params[f"b{i}"] = b

    out = HERE / "net_golden.npz"
    np.savez_compressed(
        out,
        x_seq=x_seq, x_flat=x_flat,
        gru_h_seq=h_seq.numpy(), gru_h_last=h_last.numpy(),
        lstm_h_seq=l_seq.numpy(), lstm_h_last=l_h.numpy(),
        lstm_c_last=l_c.numpy(),
        mlp_out=y_mlp,
        **{f"gru_{k}": v for k, v in gru_params.items()},
        **{f"lstm_{k}": v for k, v in lstm_params.items()},
        **{f"mlp_{k}": v for k, v in mlp_params.items()},
        tf_version=np.frombuffer(tf.__version__.encode(), np.uint8),
    )
    print(f"wrote {out} (tf {tf.__version__})")


if __name__ == "__main__":
    main()
