"""DeepLab-LargeFOV (VGG-16 + atrous head) as a pure functional JAX model.

Architecture contract (reference deeplab.py:35-107):
  * 5 VGG conv blocks, 3x3 SAME stride-1 convs + ReLU; the conv5 block uses
    atrous rate 2 (reference deeplab.py:65).
  * 3x3 SAME max pools: stride 2 after blocks 1-3, stride 1 after blocks 4-5
    (reference deeplab.py:73-83) — output stride 8, so 321x321 -> 41x41.
  * fc6 = 4x4x512x4096 atrous rate 4 (reference deeplab.py:92, :145),
    fc7 = 1x1x4096x4096, fc8 = 1x1x4096xC; dropout (TF1 keep-prob
    semantics) after relu6/relu7 (reference deeplab.py:104, :266).
  * Output is raw fc8 logits, no softmax (reference deeplab.py:48-49).

TPU-first notes: parameters live in a flat {layer: {"w","b"}} pytree
(HWIO weights, same layout as the Caffe-converted init.npy the reference
loads — reference deeplab.py:128, :160); the forward pass is a pure
function of (params, x, rng) so it jits/shards/remats freely. With
``compute_dtype="bfloat16"`` convs run on the MXU in bf16 with f32
accumulation; params stay f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from em_adapt_tpu.config import ModelConfig
from em_adapt_tpu.models.registry import register_model
from em_adapt_tpu.ops.conv import conv2d_same
from em_adapt_tpu.ops.pooling import max_pool_same
from em_adapt_tpu.ops.resize import resize_bilinear_tf

# (name, kh, kw, in_ch, out_ch, atrous_rate) for every parameterized layer,
# in forward order. Channel widths follow the reference's stride-derived
# table (reference deeplab.py:133-141), which is standard VGG-16.
VGG_CONV_SPECS: tuple[tuple[str, int, int, int, int, int], ...] = (
    ("conv1_1", 3, 3, 3, 64, 1),
    ("conv1_2", 3, 3, 64, 64, 1),
    ("conv2_1", 3, 3, 64, 128, 1),
    ("conv2_2", 3, 3, 128, 128, 1),
    ("conv3_1", 3, 3, 128, 256, 1),
    ("conv3_2", 3, 3, 256, 256, 1),
    ("conv3_3", 3, 3, 256, 256, 1),
    ("conv4_1", 3, 3, 256, 512, 1),
    ("conv4_2", 3, 3, 512, 512, 1),
    ("conv4_3", 3, 3, 512, 512, 1),
    ("conv5_1", 3, 3, 512, 512, 2),
    ("conv5_2", 3, 3, 512, 512, 2),
    ("conv5_3", 3, 3, 512, 512, 2),
)

#: Pools come after the last conv of each block: (after_layer, stride).
POOLS: dict[str, int] = {
    "conv1_2": 2,
    "conv2_2": 2,
    "conv3_3": 2,
    "conv4_3": 1,
    "conv5_3": 1,
}


def vgg_conv_specs(cfg: ModelConfig) -> tuple[tuple[str, int, int, int, int, int], ...]:
    """The VGG trunk specs with the config knobs applied: conv1_1 input
    channels (``cfg.input_channels``), the conv5 atrous rate
    (``cfg.conv5_rate``, reference deeplab.py:65), and the uniform width
    multiplier (cheap model variants; 1.0 = reference widths)."""
    m = cfg.width_multiplier

    def scale(c: int) -> int:
        return c if m == 1.0 else max(8, int(round(c * m)))

    out = []
    for name, kh, kw, cin, cout, rate in VGG_CONV_SPECS:
        cin = cfg.input_channels if name == "conv1_1" else scale(cin)
        if name.startswith("conv5"):
            rate = cfg.conv5_rate
        out.append((name, kh, kw, cin, scale(cout), rate))
    return tuple(out)


def layer_specs(cfg: ModelConfig) -> tuple[tuple[str, int, int, int, int, int], ...]:
    """All parameterized layers including the atrous-FC head."""
    trunk = vgg_conv_specs(cfg)
    trunk_out = trunk[-1][4]
    fc = (
        ("fc6", 4, 4, trunk_out, cfg.fc6_channels, cfg.fc6_rate),
        ("fc7", 1, 1, cfg.fc6_channels, cfg.fc6_channels, 1),
        ("fc8", 1, 1, cfg.fc6_channels, cfg.num_classes, 1),
    )
    return trunk + fc


LAYER_SPECS = layer_specs(ModelConfig())


def _xavier_uniform(key: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """TF1 xavier_initializer(uniform=True): U(-l, l), l = sqrt(6/(fi+fo)).

    fc8 uses this for BOTH weight and bias (reference deeplab.py:156-167).
    For conv weights fan counts include the receptive field; for a 1-D bias
    TF treats fan_in = fan_out = shape[0].
    """
    if len(shape) == 4:
        rf = shape[0] * shape[1]
        fan_in, fan_out = shape[2] * rf, shape[3] * rf
    else:
        fan_in = fan_out = shape[0]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def init_params(
    key: jax.Array, cfg: ModelConfig, init_model: dict[str, Any] | None = None
) -> dict[str, dict[str, jax.Array]]:
    """Build the parameter pytree.

    With ``init_model`` (the Caffe-converted dict from init.npy): every
    layer except fc8 copies pretrained w/b, fc8 gets Xavier-uniform w and b
    (reference deeplab.py:156-167). Without: N(0, 0.01) weights, zero
    biases (reference deeplab.py:151-154).
    """
    params: dict[str, dict[str, jax.Array]] = {}
    keys = jax.random.split(key, len(layer_specs(cfg)) * 2)
    for idx, (name, kh, kw, cin, cout, _) in enumerate(layer_specs(cfg)):
        wkey, bkey = keys[2 * idx], keys[2 * idx + 1]
        if init_model is not None and name != "fc8":
            w = jnp.asarray(init_model[name]["w"], jnp.float32)
            b = jnp.asarray(init_model[name]["b"], jnp.float32)
            if w.shape != (kh, kw, cin, cout):
                raise ValueError(
                    f"{name}: init.npy weight shape {w.shape} != expected "
                    f"{(kh, kw, cin, cout)} (HWIO)"
                )
        elif init_model is not None:  # fc8 under pretrained init
            w = _xavier_uniform(wkey, (kh, kw, cin, cout))
            b = _xavier_uniform(bkey, (cout,))
        elif cfg.init_scheme == "he":
            # Kaiming-normal fan-in: keeps activation variance through the
            # ReLU stack — required for from-scratch training (the
            # reference scheme below collapses to ~1e-11 logits). The fc8
            # head stays small so initial logits are near zero (CE starts
            # at ln(C), gradients bounded).
            if name == "fc8":
                w = 0.01 * jax.random.normal(wkey, (kh, kw, cin, cout), jnp.float32)
            else:
                fan_in = kh * kw * cin
                w = jnp.sqrt(2.0 / fan_in) * jax.random.normal(
                    wkey, (kh, kw, cin, cout), jnp.float32
                )
            b = jnp.zeros((cout,), jnp.float32)
        else:
            w = 0.01 * jax.random.normal(wkey, (kh, kw, cin, cout), jnp.float32)
            b = jnp.zeros((cout,), jnp.float32)
        params[name] = {"w": w, "b": b}
    return params


def load_caffe_init(path: str) -> dict[str, Any]:
    """Load the Caffe-converted init.npy: {layer: {"w": HWIO, "b": [C]}}
    (np.load latin1 pickle, reference deeplab.py:126-129)."""
    return np.load(path, encoding="latin1", allow_pickle=True).item()


def _dropout(x: jax.Array, key: jax.Array, keep_prob: float) -> jax.Array:
    """TF1 tf.nn.dropout: keep with prob p, scale kept values by 1/p."""
    keep = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(keep, x / keep_prob, jnp.zeros_like(x))


@register_model("deeplab_largefov")
@dataclasses.dataclass(frozen=True)
class DeepLabLargeFOV:
    """Functional model wrapper: ``init`` -> params, ``apply`` -> logits."""

    cfg: ModelConfig = ModelConfig()

    #: "auto" uses the fused block1 kernel only up to this traced batch:
    #: the kernel's per-image cost is flat (~1.45 ms) while XLA's conv
    #: lowering improves ~3x per image by batch 24 (measured crossover
    #: sits between 8 and 12; the reference production config is 6).
    FUSED_BLOCK1_MAX_BATCH = 8

    def _block1_mode(
        self, b: int, h: int, w: int, train: bool,
        mesh=None, data_axis: str = "data",
    ) -> str:
        """Resolve ModelConfig.block1_impl -> "xla" | "pallas" | "pallas_dp".

        "auto" uses the fused kernel only on a real TPU backend (the
        kernel interprets elsewhere, which is correct but slow), only on
        TPU generations whose VMEM fits the kernel (v4+; see
        block1_vmem_ok), only for supported shapes (square, odd), only
        when TRAINING (the kernel's win is its fused custom backward,
        13.5 -> 8.7 ms; its forward alone is slightly slower than XLA's
        conv lowering, 3.6 vs 2.8 ms, so inference keeps the conv path),
        and only at small PER-CHIP batch (see FUSED_BLOCK1_MAX_BATCH —
        the measured crossover is per-chip work, so a dp mesh divides
        the global batch first).

        Multi-device composition: with a mesh whose ``data_axis`` divides
        the batch, the kernel runs under shard_map ("pallas_dp",
        ops/block1_pallas.py::block1_fused_dp). Multi-device WITHOUT a
        mesh keeps "xla" under auto (GSPMD would gather the batch and run
        the kernel redundantly on every chip); forcing impl="pallas"
        there warns and runs replicated.
        """
        impl = self.cfg.block1_impl
        if impl == "xla":
            return "xla"
        from em_adapt_tpu.ops.block1_pallas import (
            block1_supported,
            block1_vmem_ok,
        )

        from em_adapt_tpu.parallel.mesh import shard_map_eligibility

        n_dev = jax.device_count()
        # (incl. the data-axis-size-1 / TP-only contract — see the
        # helper's NOTE)
        can_shard, n_data, b_local = shard_map_eligibility(mesh, data_axis, b)
        if impl == "pallas":
            if not block1_supported(h, w):
                raise ValueError(
                    f"model.block1_impl='pallas' does not support input "
                    f"{h}x{w} (needs square odd sizes); use 'xla'"
                )
            if jax.default_backend() == "tpu":
                # Known-fatal Mosaic-compile combinations (a real TPU
                # only — off-TPU the kernel interprets, where no VMEM
                # ceiling exists): fail with a config error, not an
                # opaque scoped-VMEM OOM deep inside jit.
                if self.cfg.compute_dtype != "bfloat16":
                    # Measured: the f32 forward needs 100.85 MiB scoped
                    # VMEM (over the 100 MiB ceiling); the backward OOMs
                    # even at 112.
                    raise ValueError(
                        "model.block1_impl='pallas' on TPU requires "
                        "compute_dtype='bfloat16' (the f32 kernel "
                        "exceeds the scoped-VMEM ceiling); use 'xla' "
                        "or 'auto'"
                    )
                if not block1_vmem_ok():
                    raise ValueError(
                        "model.block1_impl='pallas' needs a TPU "
                        "generation whose VMEM fits the kernel (v4+); "
                        "this backend is "
                        f"{jax.devices()[0].device_kind!r} — use 'xla' "
                        "or 'auto'"
                    )
            if n_dev > 1 and not can_shard:
                import warnings

                from em_adapt_tpu.parallel.mesh import (
                    shard_map_ineligibility_reason,
                )

                why = shard_map_ineligibility_reason(mesh, data_axis, b)
                warnings.warn(
                    "model.block1_impl='pallas' on >1 device with "
                    f"{why}, or use block1_impl='auto'. As-is, GSPMD "
                    "has no partitioning rule for a pallas call, so XLA "
                    "will all-gather the sharded batch and run the "
                    "whole kernel redundantly on every chip.",
                    stacklevel=2,
                )
            return "pallas_dp" if can_shard else "pallas"
        if impl != "auto":
            raise ValueError(
                f"model.block1_impl={impl!r}: expected 'auto', 'xla' or "
                "'pallas'"
            )
        ok = (
            train
            and b_local <= self.FUSED_BLOCK1_MAX_BATCH
            and jax.default_backend() == "tpu"
            # bf16 only: the kernel's strip intermediates are sized for a
            # 2-byte compute dtype. Measured on v5e (round 3): the f32
            # forward needs 100.85 MiB scoped VMEM (over the 100 MiB
            # ceiling) and the f32 backward still OOMs at a 112 MiB
            # ceiling — Mosaic compilation fails outright, so "auto"
            # keeps XLA for float32 compute.
            and self.cfg.compute_dtype == "bfloat16"
            and block1_vmem_ok()
            and (n_dev == 1 or can_shard)
            and block1_supported(h, w)
        )
        if not ok:
            return "xla"
        return "pallas_dp" if can_shard else "pallas"

    def init(self, key: jax.Array) -> dict:
        init_model = (
            load_caffe_init(self.cfg.init_model_path)
            if self.cfg.init_model_path
            else None
        )
        return init_params(key, self.cfg, init_model)

    def apply(
        self,
        params: dict,
        x: jax.Array,
        *,
        train: bool = False,
        rng: jax.Array | None = None,
        mesh=None,
        data_axis: str = "data",
    ) -> jax.Array:
        """Forward pass. x: [B,H,W,3] — float inputs are assumed
        preprocessed (BGR, mean-subtracted); uint8 inputs are raw RGB and
        get the BGR+Caffe-mean normalization ON DEVICE (the compact wire
        format, DataConfig.wire_dtype="uint8": 4x less H2D traffic, and
        XLA fuses the cast/swap/subtract into the first conv's input).
        Returns fc8 logits [B, H/8(ceil), W/8(ceil), C].

        ``mesh``/``data_axis``: the device mesh the surrounding step is
        sharded over — lets the fused block1 kernel compose with data
        parallelism via shard_map (see :meth:`_block1_mode`). Callers
        must NOT pass a mesh when the input is spatially sharded (a
        nontrivial ``space`` axis): the kernel has no halo exchange, so
        spatial partitioning keeps the XLA conv path (the trainer gates
        on ``plan.num_space_shards == 1``)."""
        cfg = self.cfg
        if x.dtype == jnp.uint8:
            from em_adapt_tpu.data.augment import normalize_uint8_device

            x = normalize_uint8_device(x)
        compute_dtype = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        )
        if train and rng is None:
            raise ValueError("train=True requires a dropout rng")
        drop_keys = jax.random.split(rng, 2) if train else (None, None)

        def block(h, specs, block_params):
            for (name, rate), p in zip(specs, block_params):
                h = conv2d_same(h, p["w"], p["b"], rate=rate, compute_dtype=compute_dtype)
                h = jax.nn.relu(h)
                if name in POOLS:
                    h = max_pool_same(h, window=3, stride=POOLS[name])
            return h

        if cfg.remat:
            block = jax.checkpoint(block, static_argnums=(1,))

        # Keep the whole trunk in the compute dtype: one cast at entry,
        # f32 logits at the exit. Per-layer f32<->bf16 round trips would
        # double the activation HBM traffic (measured ~11% slower backward).
        h = x if compute_dtype is None else x.astype(compute_dtype)
        specs = vgg_conv_specs(cfg)
        mode = self._block1_mode(
            h.shape[0], h.shape[1], h.shape[2], train, mesh, data_axis
        )
        if mode != "xla":
            # Fused Pallas block1: the XLA lowering runs this block at
            # 8.6 TFLOP/s (13.5 of the 59 ms step at batch 6) — see
            # ops/block1_pallas.py and PROFILE.md. Numerically equal to
            # the conv path at f32 — including SelectAndScatter's
            # first-match pool-tie gradients; bf16-ulp deltas in bf16
            # (bias adds before the rounding).
            from em_adapt_tpu.ops.block1_pallas import (
                block1_fused,
                block1_fused_dp,
            )

            p1, p2 = params["conv1_1"], params["conv1_2"]
            # The kernel returns a ZERO cotangent for its input (block1
            # is the first layer); make that contract explicit at the
            # call site so no silent wrong zeros can leak into a future
            # input-gradient use (saliency, adversarial perturbation).
            h = jax.lax.stop_gradient(h)
            if mode == "pallas_dp":
                h = block1_fused_dp(
                    h, p1["w"], p1["b"], p2["w"], p2["b"], mesh, data_axis
                )
            else:
                h = block1_fused(h, p1["w"], p1["b"], p2["w"], p2["b"])
            specs = specs[2:]
        cur_specs: list[tuple[str, int]] = []
        cur_params: list[dict] = []
        for name, _, _, _, _, rate in specs:
            cur_specs.append((name, rate))
            cur_params.append(params[name])
            if name in POOLS:
                h = block(h, tuple(cur_specs), tuple(cur_params))
                cur_specs, cur_params = [], []

        # Atrous-FC head.
        h = conv2d_same(
            h, params["fc6"]["w"], params["fc6"]["b"], rate=cfg.fc6_rate,
            compute_dtype=compute_dtype,
        )
        h = jax.nn.relu(h)
        if train:
            h = _dropout(h, drop_keys[0], cfg.dropout_keep_prob)
        h = conv2d_same(
            h, params["fc7"]["w"], params["fc7"]["b"], compute_dtype=compute_dtype
        )
        h = jax.nn.relu(h)
        if train:
            h = _dropout(h, drop_keys[1], cfg.dropout_keep_prob)
        logits = conv2d_same(
            h, params["fc8"]["w"], params["fc8"]["b"], compute_dtype=compute_dtype
        )
        # Loss/E-step/eval consume f32 logits regardless of compute dtype.
        return logits.astype(jnp.float32)

    def predict(self, params: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Upsampled probabilities + hard prediction at input resolution
        (reference network.py:39-41: bilinear resize of logits + argmax)."""
        logits = self.apply(params, x, train=False)
        up = resize_bilinear_tf(logits, (x.shape[1], x.shape[2]))
        return up, jnp.argmax(up, axis=3).astype(jnp.int32)

    def weight_l2(self, params: dict) -> jax.Array:
        """Sum of 0.5*||w||^2 over conv WEIGHTS only — biases excluded,
        matching tf.nn.l2_loss over self.weights[layer][0]
        (reference deeplab.py:184)."""
        return sum(
            0.5 * jnp.sum(jnp.square(p["w"].astype(jnp.float32)))
            for p in params.values()
        )
