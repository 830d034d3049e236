"""int8 post-training quantization for the serving path.

TPU v5e's MXU runs s8 x s8 -> s32 at roughly twice its bf16 rate, and the
serving forward is pure conv (reference network.py:39-41 — the model has
no train-time-only structure at inference beyond dropout), which makes
DeepLab-LargeFOV a textbook PTQ target. Measured on this chip
(tools/bench_int8_probe.py, slope protocol): the fc7-shaped matmul runs
1.35x faster in int8 (147.6 TOPS vs 109.4 bf16 TFLOP/s), conv3-shaped
1.31x, conv4-shaped parity — so int8 buys ~25-35% where the serving
FLOPs actually live (fc6/fc7 dominate: ~170 of ~230 GFLOPs/image).

Scheme (standard symmetric PTQ):
* weights: per-OUTPUT-CHANNEL symmetric int8, scale = max|w[..., c]|/127
  (zero-point 0, so SAME zero padding stays exact);
* activations: per-TENSOR symmetric int8, scale calibrated as the
  max|input| each conv saw over a calibration set (max-abs calibration —
  post-ReLU conv activations are well-behaved; no percentile clipping);
* accumulation: int32 on the MXU (preferred_element_type), then one
  fused dequant: y_f32 = y_i32 * (s_x * s_w[c]) + b.

The quantized model duck-types :class:`~em_adapt_tpu.models.DeepLabLargeFOV`
(``apply``/``predict``), so it drops into :class:`Evaluator` and
``export_predict_fn`` unchanged — an int8 StableHLO serving artifact is
``export_predict_fn(cfg, QuantizedDeepLabLargeFOV(cfg.model), qparams)``.

Training is NOT quantized (the reference recipe and every parity contract
stay f32/bf16); this is a serving-only accuracy/latency trade, and
``quantization_agreement`` reports the induced label-flip rate so the
trade is measured, not assumed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from em_adapt_tpu.config import ModelConfig
from em_adapt_tpu.models.deeplab import POOLS, layer_specs
from em_adapt_tpu.ops.pooling import max_pool_same
from em_adapt_tpu.ops.resize import resize_bilinear_tf

_DIMS = ("NHWC", "HWIO", "NHWC")


def _preprocess_uint8(x: jax.Array) -> jax.Array:
    """The compact-wire uint8 contract — the SAME helper
    DeepLabLargeFOV.apply uses, so int8-vs-f32 parity for uint8 input
    cannot drift on preprocessing."""
    from em_adapt_tpu.data.augment import normalize_uint8_device

    return normalize_uint8_device(x)


def observe_activation_ranges(cfg: ModelConfig, params, batches) -> dict[str, float]:
    """Calibration pass: max|input| of every conv layer over ``batches``.

    ``batches`` is an iterable of [B,H,W,3] arrays (preprocessed float or
    raw uint8). Returns {layer_name: float amax}. One jit, small outputs —
    cheap even through a slow link.
    """

    # params is a jit ARGUMENT (not a closure): closing over it would
    # bake ~all weights into the traced HLO as constants — a much bigger
    # module to compile/ship through the slow relay, re-specialized per
    # quantize_model call.
    @jax.jit
    def one(params, x):
        x = _preprocess_uint8(x)
        h = x
        amax = {}
        from em_adapt_tpu.ops.conv import conv2d_same

        for name, _, _, _, _, rate in layer_specs(cfg):
            amax[name] = jnp.max(jnp.abs(h))
            h = conv2d_same(h, params[name]["w"], params[name]["b"], rate=rate)
            if name != "fc8":
                h = jax.nn.relu(h)
            if name in POOLS:
                h = max_pool_same(h, window=3, stride=POOLS[name])
        return amax

    out: dict[str, float] = {}
    for batch in batches:
        got = jax.device_get(one(params, jnp.asarray(batch)))
        for k, v in got.items():
            out[k] = max(out.get(k, 0.0), float(v))
    for k, v in out.items():
        if v <= 0.0:
            out[k] = 1.0  # degenerate all-zero input: any scale works
    return out


def quantize_params(params, act_ranges: dict[str, float], cfg: ModelConfig) -> dict:
    """f32 params -> int8 qparams tree.

    Per layer: ``w8`` int8 HWIO, ``scale`` = s_x * s_w per output channel
    (the one fused dequant multiplier), ``inv_sx`` for the input
    quantizer, ``b`` f32.
    """
    q = {}
    for name, _, _, _, _, _ in layer_specs(cfg):
        w = jnp.asarray(params[name]["w"], jnp.float32)
        b = jnp.asarray(params[name]["b"], jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0
        w8 = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
        s_x = float(act_ranges[name]) / 127.0
        q[name] = {
            "w8": w8,
            "scale": (s_w * s_x).astype(jnp.float32),
            "inv_sx": jnp.float32(1.0 / s_x),
            "b": b,
        }
    return q


def _conv_s8(x8: jax.Array, w8: jax.Array, rate: int) -> jax.Array:
    """s8 x s8 -> s32 SAME conv (zero padding is exact: zero-point 0)."""
    return lax.conv_general_dilated(
        x8,
        w8,
        window_strides=(1, 1),
        padding="SAME",
        rhs_dilation=(rate, rate),
        dimension_numbers=_DIMS,
        preferred_element_type=jnp.int32,
    )


@dataclasses.dataclass(frozen=True)
class QuantizedDeepLabLargeFOV:
    """Duck-type of DeepLabLargeFOV over a quantized param tree.

    ``apply(qparams, x, train=False)`` -> f32 logits;
    ``predict(qparams, x)`` -> (upsampled logits, argmax labels) — the
    same contracts Evaluator and export_predict_fn consume.
    """

    cfg: ModelConfig = ModelConfig()

    def apply(self, qparams: dict, x: jax.Array, *, train: bool = False,
              rng=None, mesh=None, data_axis: str = "data") -> jax.Array:
        if train:
            raise ValueError(
                "QuantizedDeepLabLargeFOV is serving-only: training runs "
                "the f32/bf16 model (ModelConfig.compute_dtype)"
            )
        h = _preprocess_uint8(x).astype(jnp.float32)
        for name, _, _, _, _, rate in layer_specs(self.cfg):
            q = qparams[name]
            x8 = jnp.clip(jnp.round(h * q["inv_sx"]), -127, 127).astype(jnp.int8)
            y = _conv_s8(x8, q["w8"], rate)
            h = y.astype(jnp.float32) * q["scale"] + q["b"]
            if name != "fc8":
                h = jax.nn.relu(h)
            if name in POOLS:
                h = max_pool_same(h, window=3, stride=POOLS[name])
        return h

    def predict(self, qparams: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        logits = self.apply(qparams, x, train=False)
        up = resize_bilinear_tf(logits, (x.shape[1], x.shape[2]))
        return up, jnp.argmax(up, axis=3).astype(jnp.int32)


def quantize_model(cfg: ModelConfig, params, calib_batches):
    """One-call PTQ: calibrate + quantize. Returns (qmodel, qparams)."""
    ranges = observe_activation_ranges(cfg, params, calib_batches)
    return QuantizedDeepLabLargeFOV(cfg), quantize_params(params, ranges, cfg)


def quantization_agreement(cfg: ModelConfig, params, qparams, batches) -> dict:
    """Measure the int8-vs-f32 label agreement on ``batches``.

    Returns {"pixel_agreement": fraction, "n_pixels": int} — the number
    the serving trade-off is made on.
    """
    from em_adapt_tpu.models.deeplab import DeepLabLargeFOV

    model = DeepLabLargeFOV(cfg)
    qmodel = QuantizedDeepLabLargeFOV(cfg)

    # One fused dispatch per batch, ONE scalar fetched: pulling the two
    # full label maps through this rig's ~12 MB/s relay (~5 MB/batch) and
    # serializing the fp/qp dispatches made the measurement wire-bound
    # (the in-graph-scalar pattern CLAUDE.md prescribes).
    @jax.jit
    def agree_count(params, qparams, x):
        a = model.predict(params, x)[1]
        b = qmodel.predict(qparams, x)[1]
        return jnp.sum(a == b)

    agree = total = 0
    for batch in batches:
        x = jnp.asarray(batch)
        agree += int(agree_count(params, qparams, x))
        total += int(np.prod(x.shape[:3]))
    return {"pixel_agreement": agree / max(total, 1), "n_pixels": total}
