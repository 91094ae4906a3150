"""Export trained policy networks as standalone C controllers.

The reference's deployment story for a trained imitator is SI_Toolkit ->
hls4ml / hand-written firmware: the network that `controller_neural_imitator`
evaluates on the PC (/root/reference/Controllers/controller_neural_imitator.py:21-26)
is re-implemented on the embedded target and driven over UART
(/root/reference/Controllers/controller_embedded.py) or compiled C
(/root/reference/Controllers/controller_C.py:22-357).  This module closes
that loop natively: it emits a single self-contained ``.c`` translation unit
implementing the ``ControllerOps`` ABI (native/cwrapper/controller_api.h)
with the trained weights baked in as ``static const float`` arrays, so the
exported policy runs

* on the PC through the runtime-gcc ``CController`` path, and
* unmodified on any firmware target that links the same ABI

with NO Python, JAX, or runtime dependency beyond libm.

Supported architectures mirror models/networks.py: MLP (tanh hidden
activations), stacked GRU, stacked LSTM.  Recurrent exports keep their
hidden state in ``static float`` arrays that persist across ``evaluate``
calls and reset in ``init`` — the same lifecycle the JAX imitator gives its
explicit hidden-state pytree (controller_reset).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np


def _fmt(v: float) -> str:
    """Format a float32 exactly enough to round-trip (9 sig digits)."""
    if not np.isfinite(np.float32(v)):
        # 'inf'/'nan' would render as the undeclared identifiers inff/nanf
        # and fail deep inside the C build with no hint about the cause.
        raise ValueError(
            f"non-finite weight {v!r} in exported policy (diverged "
            "checkpoint?) — refusing to emit invalid C"
        )
    s = f"{float(np.float32(v)):.9g}"
    if "." not in s and "e" not in s:  # 0 -> 0.0f, not 0f
        s += ".0"
    return s + "f"


def _c_array(name: str, arr: np.ndarray, per_line: int = 8) -> str:
    flat = np.asarray(arr, np.float32).reshape(-1)
    body: List[str] = []
    for i in range(0, flat.size, per_line):
        body.append("    " + ", ".join(_fmt(v) for v in flat[i:i + per_line]) + ",")
    joined = "\n".join(body)
    return f"static const float {name}[{flat.size}] = {{\n{joined}\n}};\n"


_HELPERS = """\
static float ctt_sigmoid(float x) { return 1.0f / (1.0f + expf(-x)); }

/* y[n_out] = x[n_in] @ W[n_in][n_out] + b[n_out] (row-major W). */
static void ctt_matvec(const float *x, const float *W, const float *b,
                       float *y, int n_in, int n_out) {
    for (int j = 0; j < n_out; ++j) y[j] = b[j];
    for (int k = 0; k < n_in; ++k) {
        const float xk = x[k];
        const float *row = W + (size_t)k * n_out;
        for (int j = 0; j < n_out; ++j) y[j] += xk * row[j];
    }
}
"""


def _check_rnn_shapes(kind: str, params: Dict, in_dim: int,
                      hiddens: Sequence[int], out_dim: int) -> None:
    """Weight-vs-declaration consistency for both RNN generators: a
    mismatched ``input_names`` length would otherwise emit a matvec over
    the wrong flattened extent — silently-wrong controls, or C undefined
    behavior past the end of the static arrays."""
    gates = 3 if kind == "gru" else 4
    dims = [in_dim] + list(hiddens)
    for i, h in enumerate(hiddens):
        cell = params[f"cell{i}"]
        assert np.asarray(cell["wi"]).shape == (dims[i], gates * h), (
            f"cell{i} wi", np.asarray(cell["wi"]).shape, (dims[i], gates * h))
        assert np.asarray(cell["wh"]).shape == (h, gates * h), (
            f"cell{i} wh", np.asarray(cell["wh"]).shape, (h, gates * h))
        assert np.asarray(cell["bi"]).shape == (gates * h,), f"cell{i} bi"
        assert np.asarray(cell["bh"]).shape == (gates * h,), f"cell{i} bh"
    assert np.asarray(params["wo"]).shape == (hiddens[-1], out_dim), (
        "wo", np.asarray(params["wo"]).shape, (hiddens[-1], out_dim))
    assert np.asarray(params["bo"]).shape == (out_dim,), "bo"


def _spec_block(name: str, input_names: Sequence[str], n_out: int) -> str:
    if len(input_names) > 32:
        # controller_api.h declares names[CTT_MAX_INPUTS=32]; gcc only
        # WARNS on excess initializers and the GET_SPEC handshake would
        # silently serve a truncated list.
        raise ValueError(
            f"{len(input_names)} input names exceed CTT_MAX_INPUTS=32 "
            "(native/cwrapper/controller_api.h)"
        )
    names = ", ".join(f'"{n}"' for n in input_names)
    return (
        f"static const ControllerSpec {name}_spec = {{\n"
        f"    .version = 1,\n"
        f"    .n_inputs = {len(input_names)},\n"
        f"    .n_outputs = {n_out},\n"
        f"    .names = {{{names}}},\n"
        f"}};\n"
        f"static const ControllerSpec *{name}_get_spec(void) "
        f"{{ return &{name}_spec; }}\n"
    )


def _clip_block(n_out: int, clip: bool) -> str:
    if not clip:
        return ""
    return (
        f"    for (int j = 0; j < {n_out}; ++j) {{\n"
        f"        if (outputs[j] > 1.0f) outputs[j] = 1.0f;\n"
        f"        if (outputs[j] < -1.0f) outputs[j] = -1.0f;\n"
        f"    }}\n"
    )


def _mlp_source(name: str, params: Dict, sizes: List[int],
                input_names: Sequence[str], clip_output: bool) -> str:
    n_layers = len(sizes) - 1
    parts: List[str] = []
    for i in range(n_layers):
        w = np.asarray(params[f"w{i}"], np.float32)
        b = np.asarray(params[f"b{i}"], np.float32)
        assert w.shape == (sizes[i], sizes[i + 1]), (w.shape, sizes)
        parts.append(_c_array(f"{name}_W{i}", w))
        parts.append(_c_array(f"{name}_B{i}", b))
    max_width = max(sizes)
    body = [
        f"static void {name}_evaluate(const float *inputs, float *outputs) {{",
        f"    float a[{max_width}], b[{max_width}];",
        f"    const float *x = inputs;",
        f"    float *y = a;",
    ]
    for i in range(n_layers):
        last = i == n_layers - 1
        dst = "outputs" if last else "y"
        body.append(
            f"    ctt_matvec(x, {name}_W{i}, {name}_B{i}, {dst}, "
            f"{sizes[i]}, {sizes[i + 1]});"
        )
        if not last:
            body.append(
                f"    for (int j = 0; j < {sizes[i + 1]}; ++j) y[j] = tanhf(y[j]);"
            )
            body.append(f"    x = y; y = (y == a) ? b : a;")
    body.append(_clip_block(sizes[-1], clip_output).rstrip("\n"))
    body.append("}")
    parts.append("\n".join(ln for ln in body if ln) + "\n")
    parts.append(f"static void {name}_init(void) {{}}\n")
    return "".join(parts)


def _rnn_source(name: str, kind: str, params: Dict, in_dim: int,
                hiddens: Sequence[int], out_dim: int,
                input_names: Sequence[str], clip_output: bool) -> str:
    gates = 3 if kind == "gru" else 4
    _check_rnn_shapes(kind, params, in_dim, hiddens, out_dim)
    parts: List[str] = []
    dims = [in_dim] + list(hiddens)
    for i, h in enumerate(hiddens):
        cell = params[f"cell{i}"]
        parts.append(_c_array(f"{name}_WI{i}", cell["wi"]))
        parts.append(_c_array(f"{name}_WH{i}", cell["wh"]))
        parts.append(_c_array(f"{name}_BI{i}", cell["bi"]))
        parts.append(_c_array(f"{name}_BH{i}", cell["bh"]))
        parts.append(f"static float {name}_h{i}[{h}];\n")
        if kind == "lstm":
            parts.append(f"static float {name}_c{i}[{h}];\n")
    parts.append(_c_array(f"{name}_WO", params["wo"]))
    parts.append(_c_array(f"{name}_BO", params["bo"]))

    resets = []
    for i, h in enumerate(hiddens):
        resets.append(
            f"    for (int j = 0; j < {h}; ++j) {name}_h{i}[j] = 0.0f;"
        )
        if kind == "lstm":
            resets.append(
                f"    for (int j = 0; j < {h}; ++j) {name}_c{i}[j] = 0.0f;"
            )
    parts.append(
        f"static void {name}_init(void) {{\n" + "\n".join(resets) + "\n}\n"
    )

    max_h = max(hiddens)
    body = [
        f"static void {name}_evaluate(const float *inputs, float *outputs) {{",
        f"    float gi[{gates * max_h}], gh[{gates * max_h}], hn[{max_h}];",
        f"    const float *x = inputs;",
    ]
    for i, h in enumerate(hiddens):
        d = dims[i]
        body.append(
            f"    ctt_matvec(x, {name}_WI{i}, {name}_BI{i}, gi, {d}, {gates * h});"
        )
        body.append(
            f"    ctt_matvec({name}_h{i}, {name}_WH{i}, {name}_BH{i}, gh, "
            f"{h}, {gates * h});"
        )
        if kind == "gru":
            # Gate order r, z, n — matches networks.gru_cell_apply.
            body.append(f"""\
    for (int j = 0; j < {h}; ++j) {{
        const float r = ctt_sigmoid(gi[j] + gh[j]);
        const float z = ctt_sigmoid(gi[{h} + j] + gh[{h} + j]);
        const float n = tanhf(gi[{2 * h} + j] + r * gh[{2 * h} + j]);
        hn[j] = (1.0f - z) * n + z * {name}_h{i}[j];
    }}
    for (int j = 0; j < {h}; ++j) {name}_h{i}[j] = hn[j];""")
        else:
            # Gate order i, f, g, o — matches networks.lstm_cell_apply.
            body.append(f"""\
    for (int j = 0; j < {h}; ++j) {{
        const float gsum_i = gi[j] + gh[j];
        const float gsum_f = gi[{h} + j] + gh[{h} + j];
        const float gsum_g = gi[{2 * h} + j] + gh[{2 * h} + j];
        const float gsum_o = gi[{3 * h} + j] + gh[{3 * h} + j];
        const float ig = ctt_sigmoid(gsum_i);
        const float fg = ctt_sigmoid(gsum_f);
        const float gg = tanhf(gsum_g);
        const float og = ctt_sigmoid(gsum_o);
        {name}_c{i}[j] = fg * {name}_c{i}[j] + ig * gg;
        hn[j] = og * tanhf({name}_c{i}[j]);
    }}
    for (int j = 0; j < {h}; ++j) {name}_h{i}[j] = hn[j];""")
        body.append(f"    x = {name}_h{i};")
    body.append(
        f"    ctt_matvec(x, {name}_WO, {name}_BO, outputs, "
        f"{hiddens[-1]}, {out_dim});"
    )
    body.append(_clip_block(out_dim, clip_output).rstrip("\n"))
    body.append("}")
    parts.append("\n".join(ln for ln in body if ln) + "\n")
    return "".join(parts)


# --------------------------------------------------------------- fixed point
# Integer-only datapath mirroring the hls4ml ap_fixed<16,6> emulation in
# models/networks.py (*_apply_fixed): data int16 Q10, accumulators int32 Q20,
# activations via 1025-entry Q15 LUTs with linear interpolation over [-8, 8]
# (the same table-based scheme hls4ml synthesizes).  The only float ops are
# the ABI boundary (input quantize / output dequantize) — the network itself
# needs NO FPU.  Matches the JAX fixed emulation to ~1-2 Q10 LSBs (integer
# matmuls are exact where float32 accumulation is not; rounding is
# half-up vs numpy's half-even on exact ties).

_FIXED_HELPERS = """\
typedef int16_t ctt_q10;  /* data: ap_fixed<16,6>  = Q10 */
typedef int32_t ctt_q20;  /* accum: ap_fixed<32,12> = Q20 */

static int16_t ctt_sat16(int32_t v) {
    return v > 32767 ? 32767 : (v < -32768 ? (int16_t)-32768 : (int16_t)v);
}
static int32_t ctt_sat32(int64_t v) {
    return v > 2147483647ll ? 2147483647
         : (v < -2147483648ll ? (int32_t)-2147483648ll : (int32_t)v);
}
/* Round a Q(10+s) value to Q10, half-up, saturating. */
static int16_t ctt_rshr16(int64_t v, int s) {
    return ctt_sat16((int32_t)((v + (1ll << (s - 1))) >> s));
}
static int32_t ctt_q20_add(int32_t a, int32_t b) {
    return ctt_sat32((int64_t)a + (int64_t)b);
}
static int16_t ctt_quant_in(float v) {
    float s = v * 1024.0f;
    return ctt_sat16((int32_t)(s >= 0.0f ? s + 0.5f : s - 0.5f));
}

/* y_q20[j] = sat32(B[j] + sum_k x[k] * W[k*n_out + j]); x,W Q10, B Q20.
 * Integer accumulation is exact (qa quantization is pure saturation). */
static void ctt_matvec_q(const int16_t *x, const int16_t *W, const int32_t *b,
                         int32_t *y, int n_in, int n_out) {
    for (int j = 0; j < n_out; ++j) {
        int64_t acc = b[j];
        for (int k = 0; k < n_in; ++k)
            acc += (int32_t)x[k] * (int32_t)W[(size_t)k * n_out + j];
        y[j] = ctt_sat32(acc);
    }
}

/* LUT eval: x in Q20 clamped to [-8, 8), 1/64 step, linear interpolation,
 * entries Q15, result requantized to Q10 (half-up). */
static int16_t ctt_lut_eval(const int16_t *lut, int32_t x_q20) {
    if (x_q20 < -(8 << 20)) x_q20 = -(8 << 20);
    if (x_q20 > (8 << 20) - 1) x_q20 = (8 << 20) - 1;
    uint32_t u = (uint32_t)(x_q20 + (8 << 20));
    uint32_t idx = u >> 14, frac = u & 16383u;
    int32_t lo = lut[idx], hi = lut[idx + 1];
    int32_t v15 = lo + (int32_t)(((int64_t)(hi - lo) * (int64_t)frac) >> 14);
    return ctt_sat16((v15 + 16) >> 5);
}
"""


def _c_i16_array(name: str, arr: np.ndarray, per_line: int = 12) -> str:
    flat = np.asarray(arr, np.int64).reshape(-1)
    assert flat.min() >= -32768 and flat.max() <= 32767, name
    body = []
    for i in range(0, flat.size, per_line):
        body.append("    " + ", ".join(str(int(v)) for v in flat[i:i + per_line]) + ",")
    return (f"static const int16_t {name}[{flat.size}] = {{\n"
            + "\n".join(body) + "\n};\n")


def _c_i32_array(name: str, arr: np.ndarray, per_line: int = 8) -> str:
    flat = np.asarray(arr, np.int64).reshape(-1)
    assert flat.min() >= -2**31 and flat.max() < 2**31, name
    body = []
    for i in range(0, flat.size, per_line):
        body.append("    " + ", ".join(str(int(v)) for v in flat[i:i + per_line]) + ",")
    return (f"static const int32_t {name}[{flat.size}] = {{\n"
            + "\n".join(body) + "\n};\n")


def _q10_w(w) -> np.ndarray:
    """Weight -> int16 Q10 with numpy round-half-even (== fixed_q/quantize_params)."""
    return np.clip(np.round(np.asarray(w, np.float64) * 1024.0),
                   -32768, 32767).astype(np.int64)


def _q20_b(b) -> np.ndarray:
    """Bias -> int32 Q20 (Q10 quantize, then exact shift — matches fixed_q)."""
    return _q10_w(b) * 1024


def _lut_block(name: str, fn) -> str:
    xs = -8.0 + np.arange(1025) / 64.0
    vals = np.clip(np.round(fn(xs) * 32768.0), -32768, 32767)
    return _c_i16_array(name, vals)


def _act_luts(need_sigmoid: bool) -> str:
    out = _lut_block("ctt_tanh_lut", np.tanh)
    if need_sigmoid:
        out += _lut_block("ctt_sig_lut", lambda x: 1.0 / (1.0 + np.exp(-x)))
    return out


def _fixed_io_blocks(n_in: int, n_out: int, clip_output: bool) -> tuple:
    quant = (f"    int16_t xq[{n_in}];\n"
             f"    for (int j = 0; j < {n_in}; ++j) xq[j] = ctt_quant_in(inputs[j]);")
    clip = ""
    if clip_output:
        clip = (f"    for (int j = 0; j < {n_out}; ++j) {{\n"
                f"        if (oq[j] > 1024) oq[j] = 1024;\n"
                f"        if (oq[j] < -1024) oq[j] = -1024;\n"
                f"    }}\n")
    dequant = (clip
               + f"    for (int j = 0; j < {n_out}; ++j) "
               f"outputs[j] = (float)oq[j] * (1.0f / 1024.0f);")
    return quant, dequant


def _mlp_source_fixed(name: str, params: Dict, sizes: List[int],
                      clip_output: bool) -> str:
    n_layers = len(sizes) - 1
    parts: List[str] = []
    for i in range(n_layers):
        w = np.asarray(params[f"w{i}"])
        assert w.shape == (sizes[i], sizes[i + 1]), (w.shape, sizes)
        parts.append(_c_i16_array(f"{name}_W{i}", _q10_w(params[f"w{i}"])))
        parts.append(_c_i32_array(f"{name}_B{i}", _q20_b(params[f"b{i}"])))
    max_width = max(sizes)
    quant, dequant = _fixed_io_blocks(sizes[0], sizes[-1], clip_output)
    body = [
        f"static void {name}_evaluate(const float *inputs, float *outputs) {{",
        quant,
        f"    int16_t a[{max_width}], b[{max_width}], oq[{sizes[-1]}];",
        f"    int32_t acc[{max_width}];",
        f"    const int16_t *x = xq;",
        f"    int16_t *y = a;",
    ]
    for i in range(n_layers):
        last = i == n_layers - 1
        body.append(f"    ctt_matvec_q(x, {name}_W{i}, {name}_B{i}, acc, "
                    f"{sizes[i]}, {sizes[i + 1]});")
        if last:
            body.append(f"    for (int j = 0; j < {sizes[-1]}; ++j) "
                        f"oq[j] = ctt_rshr16(acc[j], 10);")
        else:
            body.append(f"    for (int j = 0; j < {sizes[i + 1]}; ++j) "
                        f"y[j] = ctt_lut_eval(ctt_tanh_lut, acc[j]);")
            body.append(f"    x = y; y = (y == a) ? b : a;")
    body.append(dequant)
    body.append("}")
    parts.append("\n".join(ln for ln in body if ln) + "\n")
    parts.append(f"static void {name}_init(void) {{}}\n")
    return "".join(parts)


def _rnn_source_fixed(name: str, kind: str, params: Dict, in_dim: int,
                      hiddens: Sequence[int], out_dim: int,
                      clip_output: bool) -> str:
    gates = 3 if kind == "gru" else 4
    _check_rnn_shapes(kind, params, in_dim, hiddens, out_dim)
    parts: List[str] = []
    dims = [in_dim] + list(hiddens)
    for i, h in enumerate(hiddens):
        cell = params[f"cell{i}"]
        parts.append(_c_i16_array(f"{name}_WI{i}", _q10_w(cell["wi"])))
        parts.append(_c_i16_array(f"{name}_WH{i}", _q10_w(cell["wh"])))
        parts.append(_c_i32_array(f"{name}_BI{i}", _q20_b(cell["bi"])))
        parts.append(_c_i32_array(f"{name}_BH{i}", _q20_b(cell["bh"])))
        parts.append(f"static int16_t {name}_h{i}[{h}];\n")
        if kind == "lstm":
            parts.append(f"static int16_t {name}_c{i}[{h}];\n")
    parts.append(_c_i16_array(f"{name}_WO", _q10_w(params["wo"])))
    parts.append(_c_i32_array(f"{name}_BO", _q20_b(params["bo"])))

    resets = []
    for i, h in enumerate(hiddens):
        resets.append(f"    for (int j = 0; j < {h}; ++j) {name}_h{i}[j] = 0;")
        if kind == "lstm":
            resets.append(f"    for (int j = 0; j < {h}; ++j) {name}_c{i}[j] = 0;")
    parts.append(f"static void {name}_init(void) {{\n" + "\n".join(resets) + "\n}\n")

    max_h = max(hiddens)
    quant, dequant = _fixed_io_blocks(in_dim, out_dim, clip_output)
    body = [
        f"static void {name}_evaluate(const float *inputs, float *outputs) {{",
        quant,
        f"    int32_t gi[{gates * max_h}], gh[{gates * max_h}], oacc[{out_dim}];",
        f"    int16_t hn[{max_h}], oq[{out_dim}];",
        f"    const int16_t *x = xq;",
    ]
    for i, h in enumerate(hiddens):
        d = dims[i]
        body.append(f"    ctt_matvec_q(x, {name}_WI{i}, {name}_BI{i}, gi, "
                    f"{d}, {gates * h});")
        body.append(f"    ctt_matvec_q({name}_h{i}, {name}_WH{i}, {name}_BH{i}, gh, "
                    f"{h}, {gates * h});")
        if kind == "gru":
            # r, z, n gate order == networks.gru_cell_apply_fixed.
            body.append(f"""\
    for (int j = 0; j < {h}; ++j) {{
        const int32_t r = ctt_lut_eval(ctt_sig_lut, ctt_q20_add(gi[j], gh[j]));
        const int32_t z = ctt_lut_eval(ctt_sig_lut, ctt_q20_add(gi[{h} + j], gh[{h} + j]));
        const int32_t rgh = ctt_rshr16((int64_t)r * (int64_t)gh[{2 * h} + j], 20);
        const int32_t n = ctt_lut_eval(ctt_tanh_lut,
                                       ctt_q20_add(gi[{2 * h} + j], rgh * 1024));
        hn[j] = ctt_rshr16((int64_t)(1024 - z) * n
                           + (int64_t)z * {name}_h{i}[j], 10);
    }}
    for (int j = 0; j < {h}; ++j) {name}_h{i}[j] = hn[j];""")
        else:
            # i, f, g, o gate order == networks.lstm_cell_apply_fixed.
            body.append(f"""\
    for (int j = 0; j < {h}; ++j) {{
        const int32_t ig = ctt_lut_eval(ctt_sig_lut, ctt_q20_add(gi[j], gh[j]));
        const int32_t fg = ctt_lut_eval(ctt_sig_lut, ctt_q20_add(gi[{h} + j], gh[{h} + j]));
        const int32_t gg = ctt_lut_eval(ctt_tanh_lut, ctt_q20_add(gi[{2 * h} + j], gh[{2 * h} + j]));
        const int32_t og = ctt_lut_eval(ctt_sig_lut, ctt_q20_add(gi[{3 * h} + j], gh[{3 * h} + j]));
        const int32_t fc = ctt_rshr16((int64_t)fg * {name}_c{i}[j], 10);
        const int32_t igg = ctt_rshr16((int64_t)ig * gg, 10);
        {name}_c{i}[j] = ctt_sat16(fc + igg);
        const int32_t th = ctt_lut_eval(ctt_tanh_lut, (int32_t){name}_c{i}[j] * 1024);
        hn[j] = ctt_rshr16((int64_t)og * th, 10);
    }}
    for (int j = 0; j < {h}; ++j) {name}_h{i}[j] = hn[j];""")
        body.append(f"    x = {name}_h{i};")
    body.append(f"    ctt_matvec_q(x, {name}_WO, {name}_BO, oacc, "
                f"{hiddens[-1]}, {out_dim});")
    body.append(f"    for (int j = 0; j < {out_dim}; ++j) "
                f"oq[j] = ctt_rshr16(oacc[j], 10);")
    body.append(dequant)
    body.append("}")
    parts.append("\n".join(ln for ln in body if ln) + "\n")
    return "".join(parts)


def export_policy_c(
    params: Dict,
    arch: Dict,
    input_names: Sequence[str],
    out_path,
    *,
    n_outputs: int = 1,
    name: Optional[str] = None,
    clip_output: bool = True,
    fixed_point: bool = False,
) -> Path:
    """Write ``out_path`` (.c) implementing the policy as a ControllerOps.

    ``params``/``arch`` follow models/networks.py conventions (arch from
    ``parse_net_name``).  The ops symbol is ``<STEM>_Ops`` where STEM is the
    upper-cased file stem — exactly what CController derives by default, so
    ``config={"controller_file": out_path.name, "firmware_path": out_path.parent}``
    just works.  ``clip_output`` bakes the imitator's [-1, 1] clamp
    (reference controller_neural_imitator.py:74-75) into the firmware.

    ``fixed_point=True`` emits the integer-only hls4ml-style datapath
    (Q10 data / Q20 accumulators / LUT activations — see _FIXED_HELPERS):
    the firmware needs no FPU and tracks ``networks.*_apply_fixed`` on
    ``quantize_params``-quantized weights to a couple of Q10 LSBs.
    """
    out_path = Path(out_path)
    stem = out_path.stem
    name = name or stem.upper().replace("-", "_").replace(".", "_")
    kind = arch["kind"]
    n_in = len(input_names)

    if kind == "mlp":
        sizes = [n_in] + list(arch["hiddens"]) + [n_outputs]
        if fixed_point:
            net_src = (_act_luts(need_sigmoid=False)
                       + _mlp_source_fixed(name, params, sizes, clip_output))
        else:
            net_src = _mlp_source(name, params, sizes, input_names, clip_output)
    elif kind in ("gru", "lstm"):
        if fixed_point:
            net_src = (_act_luts(need_sigmoid=True)
                       + _rnn_source_fixed(name, kind, params, n_in,
                                           list(arch["hiddens"]), n_outputs,
                                           clip_output))
        else:
            net_src = _rnn_source(
                name, kind, params, n_in, list(arch["hiddens"]), n_outputs,
                input_names, clip_output,
            )
    else:
        raise ValueError(f"cannot export network kind {kind!r}")

    datapath = ("integer-only Q10/Q20 fixed point (no FPU needed)"
                if fixed_point else "float32, needs only libm")
    header = (
        f"/* Auto-generated by control_toolkit_tpu.models.export_c.\n"
        f" * Policy: {kind} {list(arch.get('hiddens', []))}, "
        f"{n_in} inputs -> {n_outputs} outputs.\n"
        f" * Datapath: {datapath}. */\n"
        + ("" if fixed_point else "#include <math.h>\n")
        + "#include <stddef.h>\n"
        + ("#include <stdint.h>\n" if fixed_point else "")
        + '#include "controller_api.h"\n\n'
    )
    ops = (
        f"const ControllerOps {name}_Ops = {{\n"
        f"    {name}_init, {name}_evaluate, {name}_get_spec, 0,\n"
        f"}};\n"
    )
    src = (
        header
        + (_FIXED_HELPERS if fixed_point else _HELPERS) + "\n"
        + _spec_block(name, input_names, n_outputs) + "\n"
        + net_src + "\n"
        + ops
    )
    out_path.write_text(src)
    return out_path


def build_soc_firmware(controller_c, out_binary, ops_name: Optional[str] = None) -> Path:
    """Compile an exported controller into the UART SoC firmware image.

    Links ``controller_c`` (any ControllerOps translation unit — e.g. the
    output of :func:`export_policy_c`) against the PC-compilable firmware
    main loop (native/firmware/soc_main.c: framed UART protocol, SOF 0xAA,
    CRC-8, GET_SPEC handshake — the protocol the reference's embedded
    controller drives, /root/reference/Controllers/controller_embedded.py).
    The result is a binary taking a pty/tty device path as argv[1]; drive it
    with EmbeddedController for the full train -> export -> flash -> UART
    closed loop without leaving the framework.
    """
    import subprocess

    controller_c = Path(controller_c)
    out_binary = Path(out_binary)
    ops_name = ops_name or f"{controller_c.stem.upper().replace('-', '_').replace('.', '_')}_Ops"
    native = Path(__file__).resolve().parent.parent / "native"
    cmd = [
        "gcc", "-O2", f"-DCONTROLLER_OPS={ops_name}",
        "-o", str(out_binary),
        str(native / "firmware" / "soc_main.c"),
        str(controller_c),
        "-I", str(native / "cwrapper"),
        "-lm",
    ]
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError(f"firmware build failed:\n{res.stderr}")
    return out_binary


def export_npz_policy_c(npz_path, out_path, **kwargs) -> Path:
    """Export a checkpoint written by models.networks.save_net (the
    imitator's on-disk format) straight to C.  Reads arch/inputs/outputs
    from the embedded meta."""
    from control_toolkit_tpu.models import networks as nets

    params, meta = nets.load_net(npz_path)
    arch = meta.get("arch")
    if arch is None:
        raise ValueError(f"{npz_path} has no 'arch' meta; pass arch explicitly "
                         "via export_policy_c")
    inputs = meta.get("inputs")
    if inputs is None:
        raise ValueError(f"{npz_path} has no 'inputs' meta")
    outputs = meta.get("outputs", ["Q"])
    return export_policy_c(
        params, arch, inputs, out_path, n_outputs=len(outputs), **kwargs
    )
