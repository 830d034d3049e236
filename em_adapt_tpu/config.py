"""Typed configuration tree for em_adapt_tpu.

The reference scatters its hyperparameters across call sites (python dicts
read with ``.get()``; reference deeplab.py:287-294, :181, :243-262,
network.py:10-13, dataset.py:8-18). Here every knob lives in one frozen
dataclass tree whose defaults ARE the reference's canonical training recipe,
so ``ExperimentConfig()`` reproduces the published 37.98%-mIoU run.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class EStepConfig:
    """E-step parameters.

    ``method="adaptive"`` (default) is the reference's EM-Adapt rank-based
    adaptive bias; defaults match its production call (reference
    deeplab.py:181): bg_p=0.4, fg_p=0.2, num_iter=5, suppress_others=True,
    margin_others=1e-5. ``method="fixed"`` is the paper's EM-Fixed variant
    (arXiv:1502.02734 §3.3, the reference readme's cited method family,
    reference readme.md:3): a constant bias added to each PRESENT class's
    scores — background ``fixed_bg_bias``, present foreground classes
    ``fixed_fg_bias`` — instead of the rank-based adaptive one; no
    iterations, no order statistics. The bias magnitudes are recipe
    hyperparameters in score (logit) units; the paper tunes them per
    setting rather than publishing universal values.
    """

    method: str = "adaptive"
    bg_p: float = 0.4
    fg_p: float = 0.2
    num_iter: int = 5
    suppress_others: bool = True
    margin_others: float = 1e-5
    fixed_bg_bias: float = 3.0
    fixed_fg_bias: float = 5.0
    #: Units of the EM-Fixed biases: "logit" (paper formulation — raw
    #: score-unit constants; CONVERGENCE_FIXED.json shows every
    #: end-to-end run with these degrading the model on the rehearsal
    #: task) or "spread" (biases are multiples of the per-image
    #: present-class score STD, so the effective bias tracks the logit
    #: spread — the calibrated control the round-4 erosion analysis
    #: implies). Only read when method="fixed".
    fixed_bias_units: str = "logit"
    #: "auto" (fused Pallas kernel on TPU — measured 1.4x faster than the
    #: XLA sort lowering — pure-XLA elsewhere), "jax" (portable), "pallas"
    #: (force the kernel; interpreted off-TPU), or "native" (host C++ via
    #: ctypes — CPU pipelines / oracle checks only). method="fixed" is one
    #: elementwise add — it always runs the plain XLA path.
    impl: str = "auto"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """DeepLab-LargeFOV (VGG-16 + atrous) architecture knobs.

    Defaults reproduce the reference network (reference deeplab.py:35-107):
    21 classes, 321x321 input, dropout keep-prob 0.5 on fc6/fc7
    (reference deeplab.py:266 feeds drop_probe=0.5 — TF1 keep probability).
    """

    name: str = "deeplab_largefov"
    num_classes: int = 21
    input_size: tuple[int, int] = (321, 321)
    input_channels: int = 3
    #: TF1 ``tf.nn.dropout`` keep probability (reference deeplab.py:104, :266).
    dropout_keep_prob: float = 0.5
    #: Uniform width multiplier on every VGG conv block (64..512 -> x m).
    #: 1.0 is the reference architecture; smaller values give cheap model
    #: variants for CPU tests and ablations (fc6 width stays
    #: ``fc6_channels``).
    width_multiplier: float = 1.0
    #: Atrous rates: conv5 blocks rate 2 (reference deeplab.py:65),
    #: fc6 rate 4 (reference deeplab.py:92).
    conv5_rate: int = 2
    fc6_rate: int = 4
    fc6_channels: int = 4096
    #: Parameter/compute dtype. f32 for parity; bf16 params are kept f32 with
    #: bf16 compute when set to "bfloat16".
    compute_dtype: str = "float32"
    #: Rematerialize each VGG block in the backward pass (jax.checkpoint):
    #: trades ~1 extra forward of FLOPs for dropping all intra-block
    #: activations from HBM — enables much larger per-chip batches.
    remat: bool = False
    #: block1 (conv1_1+relu+conv1_2+relu+pool1) implementation:
    #: "xla" (plain convs — the parity reference), "pallas" (fused
    #: VMEM-resident kernel, ops/block1_pallas.py — block1 is the one
    #: conv XLA lowers badly at 321^2, see PROFILE.md), or "auto"
    #: (pallas on TPU for TRAINING when the shape is supported — the
    #: kernel's win is its fused backward; inference keeps xla).
    #: Numeric deltas vs xla: bias adds in f32 before the bf16 rounding
    #: (bf16-ulp differences only); pool-gradient ties use the SAME
    #: first-match routing as SelectAndScatter, so gradients match the
    #: conv path even in flat regions. Spatial partitioning (mesh
    #: space>1) forces "xla" under "auto"; a dp mesh keeps the kernel
    #: engaged via shard_map (block1_fused_dp).
    block1_impl: str = "auto"
    #: Path to the Caffe-converted ``init.npy`` (reference deeplab.py:293).
    #: ``None`` -> random init per ``init_scheme``.
    init_model_path: str | None = None
    #: Random-init scheme when no pretrained init is given: "reference"
    #: (stddev 0.01 normal, zero bias — reference deeplab.py:151-154; NOTE
    #: this collapses through 16 layers, logits ~1e-11 and spatially
    #: constant — the reference only ever used it as a dead fallback) or
    #: "he" (Kaiming-normal fan-in, the working choice for training from
    #: scratch, e.g. the convergence rehearsal).
    init_scheme: str = "reference"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """VOC+SBD input pipeline (reference dataset.py:7-19, :107-145)."""

    main_path: str = "pascal/VOCdevkit/VOC2012"
    list_dir: str = "pascal/txt"
    input_size: tuple[int, int] = (321, 321)
    # NOT knobs (removed from the config on purpose): the 255 ignore label
    # is the VOC mask format (any value >= num_classes is ignored, exactly
    # like the reference's tag filter, reference estep.py:35-44), and the
    # Caffe BGR mean is a constant of the pretrained init.npy weights
    # (em_adapt_tpu.data.augment.BGR_MEAN, reference dataset.py:15-18) —
    # configurable copies here were dead and could only drift.
    #: Train-time augmentation (reference dataset.py:127): random scale
    #: U(0.75, 1.25) then resize to input_size, shared-coin left-right flip.
    random_scale: bool = True
    scale_range: tuple[float, float] = (0.75, 1.25)
    flip: bool = True
    #: Debug truncation of the file lists (reference dataset.py:38-42).
    length: int | None = None
    #: Host loader threads and device prefetch depth (new; the reference's
    #: tf.data pipeline had implicit equivalents).
    num_workers: int = 8
    prefetch: int = 2
    #: Wire format for batches: "float32" (preprocessed on host — the
    #: reference contract, golden-exact) or "uint8" (raw RGB + uint8
    #: labels; BGR+mean normalization runs on device — 4x less H2D
    #: traffic at <=0.5-intensity rounding of the resized image).
    wire_dtype: str = "float32"
    #: Shrink TRAIN labels to this size on the host (e.g. (41, 41), the
    #: score-map resolution) instead of shipping the full-res mask and
    #: shrinking on device. Bit-identical to the device shrink (same TF1
    #: nearest grid, reference deeplab.py:110) and ~60x fewer label bytes
    #: over the wire. None ships full resolution (reference contract).
    #: Ignored by eval iterators, which need full-res ground truth.
    train_label_size: tuple[int, int] | None = None


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """SGD + momentum with gradient accumulation and staged LR.

    Defaults are the reference recipe (reference deeplab.py:288-294,
    :243-262): lr 1e-3 with drops to 1e-4/1e-5/1e-6 at epochs 10/20/30,
    momentum 0.9, weight decay 1e-5 (L2 on conv weights only,
    reference deeplab.py:184), gradient accumulation 5.
    """

    base_lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 1e-5
    accum_steps: int = 5
    #: (epoch, lr) boundaries (reference deeplab.py:245-262).
    lr_schedule: tuple[tuple[int, float], ...] = ((10, 1e-4), (20, 1e-5), (30, 1e-6))
    #: Caffe-style per-group LR multipliers (bias x2, fc8 w x10, fc8 b x20).
    #: The reference *computes* these but a rebinding bug discards them
    #: (reference deeplab.py:194-200), so code-parity default is OFF; turn on
    #: for the paper's Caffe recipe.
    lr_multipliers: bool = False


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout. The reference is single-device
    (reference deeplab.py:3); here DP is first-class and the mesh admits a
    ``space`` axis for spatial sharding of large inputs.
    """

    #: (axis name, size) pairs; -1 means "all remaining devices".
    axes: tuple[tuple[str, int], ...] = (("data", -1), ("space", 1))
    data_axis: str = "data"
    space_axis: str = "space"


@dataclasses.dataclass(frozen=True)
class CheckpointConfig:
    """Orbax checkpointing. Cadence knobs match the reference
    (reference deeplab.py:277-278 'norm' every 6000 steps, network.py:100
    max_to_keep=2) but the state is complete: params + optimizer slots +
    accumulators + step + RNG (the reference saved trainable vars only,
    network.py:100-102).
    """

    save_dir: str = "saver"
    save_every_steps: int = 6000
    max_to_keep: int = 2
    #: Snapshot right before each LR drop (reference deeplab.py:248, :254, :260).
    snapshot_on_lr_drop: bool = True
    async_save: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 6  # per-step global microbatch (reference deeplab.py:288)
    epochs: int = 40  # reference deeplab.py:291
    seed: int = 0
    log_every_steps: int = 500  # reference deeplab.py:273
    #: Run validation every N steps and keep a "best"-mIoU checkpoint (the
    #: reference created a "best" saver but never used it, network.py:102).
    #: None disables periodic eval.
    eval_every_steps: int | None = None
    #: Protocol for periodic/best-checkpoint eval: "fixed" (fast, at the
    #: training resolution) or "voc" (exact per-image original-resolution
    #: protocol — what the headline mIoU is measured with).
    eval_protocol: str = "fixed"
    #: Donate train state buffers to the jitted step.
    donate_state: bool = True
    #: Fuse this many microbatch steps into ONE dispatch (lax.scan).
    #: Semantically identical to single stepping; amortizes per-dispatch
    #: host overhead (vital on dispatch-latency-limited links). Log/eval/
    #: checkpoint cadences quantize to the macro boundary. 1 = off.
    macro_steps: int = 1
    #: Measure the deployed E-step implementation (µs/image at this run's
    #: score-map shape) once at train start and stamp it into every train
    #: JSONL record — the BASELINE.md observability metric. One tiny jit,
    #: persistently cached; set False to skip.
    calibrate_estep: bool = True
    #: PRNG implementation for the train-state key (dropout masks, E-step
    #: class orders). "threefry" is JAX's default counter-based generator;
    #: "rbg" uses the TPU's hardware RNG — measured 32 ms/step of threefry
    #: mask generation drops to ~0 (the two fc6/fc7 dropout masks are 41M
    #: elements each at the production shape). Both are deterministic per
    #: seed; the dropout PATTERN differs between the two (training is
    #: stochastic either way — the reference never pinned it).
    rng_impl: str = "threefry"
    #: Train the first N steps on the weak-tag multi-label CLASSIFICATION
    #: loss (LSE-pooled logits vs image-level tags) instead of the EM
    #: objective, then switch. 0 = off (reference parity: the reference
    #: always warm-starts EM from a classification-pretrained init.npy,
    #: so it never needs this). From RANDOM init the warmup synthesizes
    #: that missing prior from the same weak tags — EM's label-locking
    #: step is heavy-tailed from random init (~250..4000 steps,
    #: CONVERGENCE_LATE_LOCK.json). Implemented as a
    #: traced select on the step counter, so macro-fused windows cross
    #: the boundary per-step exactly. Probed on the synthetic rehearsal
    #: (CONVERGENCE_WARMUP_PROBE.json): there it does NOT beat plain EM
    #: from he-init — warm up at a reduced LR (staged schedule) and
    #: treat it as an opt-in for real-data from-scratch runs.
    tag_warmup_steps: int = 0
    #: Label smoothing for the warmup tag BCE. Hard 0/1 targets have NO
    #: finite minimizer (BCE falls forever as the pooled logits run to
    #: ±inf), so the unanchored warmup race can diverge — a 129² he-init
    #: probe NaN'd mid-warmup on one seed. Smoothed targets [eps, 1-eps]
    #: pin the optimum at pooled logit = ±logit(1-eps) (~±2.9 at 0.05),
    #: keeping gradients alive for the whole window and the weights
    #: bounded. Only read when tag_warmup_steps > 0.
    tag_warmup_smoothing: float = 0.05
    #: LSE pooling sharpness r (Pinheiro & Collobert, arXiv:1411.6228):
    #: pooled = (1/r)(logsumexp(r·x) − log HW), mean at r→0, max at r→∞.
    #: At r=1 a spatially CONSTANT map satisfies the tag objective, so
    #: the warmup teaches no spatial discrimination and EM stays at the
    #: all-background fixed point (probed); sharper pooling makes PEAKED
    #: maps the cheap solution. Only read when tag_warmup_steps > 0.
    tag_warmup_pool_r: float = 4.0


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Prediction + mIoU + optional denseCRF post-processing.

    CRF hyperparameters preserved from the reference's (dead) predict stub
    (reference network.py:63).
    """

    batch_size: int = 6
    use_crf: bool = False
    crf_bi_sxy: float = 121.0
    crf_bi_srgb: float = 5.0
    crf_bi_compat: float = 10.0
    crf_g_sxy: float = 3.0
    crf_g_compat: float = 3.0
    crf_iterations: int = 10
    #: Host threads refining images in parallel during evaluate_voc (the
    #: CRF is numpy/scipy + the native lattice, which releases the GIL).
    crf_workers: int = 4
    #: Where the CRF runs during evaluate_voc: "host" (numpy/scipy +
    #: native permutohedral lattice on a worker pool) or "tpu" (the whole
    #: post-process — dynamic-size bilinear upsample, softmax, mean-field
    #: CRF, argmax — in ONE jitted batched graph on the accelerator; see
    #: eval/crf_tpu.py). Per-image dense_crf() calls are unaffected.
    crf_impl: str = "host"
    #: Static padding bucket (H, W) for the "tpu" CRF path — the LARGEST
    #: compiled shape; must cover the dataset's biggest image (VOC maxes
    #: at 500x500).
    crf_bucket: tuple[int, int] = (512, 512)
    #: Additional smaller buckets for the "tpu" CRF path. Each image pads
    #: into the smallest-area bucket that fits it (falling back to
    #: crf_bucket), so a mostly-landscape dataset like VOC doesn't pay the
    #: square worst case per image (measured: 0.29 s/img in a 384x512
    #: bucket vs 0.39 at 512x512). Each bucket is one extra lazy compile;
    #: outputs are bit-identical across buckets (padding invariance is
    #: pinned by tests/test_crf_tpu.py). Buckets may swap aspect but are
    #: dropped if their area exceeds crf_bucket's; oversize images error
    #: against crf_bucket regardless. Set to () to force one shape.
    crf_buckets: tuple[tuple[int, int], ...] = ((384, 512), (512, 384))


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    estep: EStepConfig = dataclasses.field(default_factory=EStepConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    checkpoint: CheckpointConfig = dataclasses.field(default_factory=CheckpointConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    #: Semi-supervised EM: images whose masks are real pixel labels bypass the
    #: E-step and train with ignore-label masking (BASELINE.json config #4;
    #: mechanism analogous to reference network.py:77-89).
    semi_supervised: bool = False

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def flatten(cfg, prefix: str = "") -> dict[str, object]:
    """Flatten a config tree into {'optim.base_lr': 0.001, ...} for logging."""
    out: dict[str, object] = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        key = f"{prefix}{f.name}"
        if dataclasses.is_dataclass(v):
            out.update(flatten(v, prefix=key + "."))
        else:
            out[key] = v
    return out


def _coerce_override(raw: str, tp, key: str):
    """Parse one CLI override value and validate it against the field's
    declared type.

    ast.literal_eval only accepts Python spellings (True/None); the
    natural config spellings users type (true/false/none) would
    otherwise fall back to bare strings that silently invert semantics
    downstream — ``estep.suppress_others=false`` stored as the truthy
    string "false" keeps suppression ON while the user believes it is
    off. Strings that cannot be interpreted as the field's type are a
    hard error, not a silent store.
    """
    import ast
    import types as _types
    import typing

    try:
        value = ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        value = raw  # bare string, validated below

    if tp is None:  # unannotated field: accept as parsed
        return value
    options = (
        typing.get_args(tp)
        if typing.get_origin(tp) in (typing.Union, _types.UnionType)
        else (tp,)
    )
    # Parameterized generics (tuple[int, ...]) validate against the origin.
    concrete = tuple(
        c
        for c in (typing.get_origin(o) or o for o in options)
        if isinstance(c, type)
    )

    if isinstance(value, str):
        low = value.strip().lower()
        if bool in concrete and low in ("true", "false"):
            return low == "true"
        if type(None) in concrete and low in ("none", "null"):
            return None
        if str in concrete:
            return value
        raise ValueError(
            f"override {key}={raw!r}: cannot interpret {raw!r} as {tp}"
        )
    if isinstance(value, int) and not isinstance(value, bool):
        if float in concrete and int not in concrete:
            return float(value)
    if concrete and not isinstance(value, concrete):
        raise ValueError(
            f"override {key}={raw!r}: parsed {value!r} "
            f"({type(value).__name__}) does not match field type {tp}"
        )
    return value


def apply_overrides(cfg: ExperimentConfig, overrides: Sequence[str]) -> ExperimentConfig:
    """Apply CLI 'dotted.key=value' overrides to a config tree."""
    import typing

    keys = set()
    for item in overrides:
        key, _, raw = item.partition("=")
        if not _:
            raise ValueError(f"override {item!r} must look like key=value")
        keys.add(key)
        parts = key.split(".")
        node = cfg
        for p in parts[:-1]:
            node = getattr(node, p)
        try:
            tp = typing.get_type_hints(type(node)).get(parts[-1])
        except Exception:
            tp = None
        value = _coerce_override(raw, tp, key)
        cfg = _replace_path(cfg, parts, value)
    # model.input_size and data.input_size describe the SAME quantity at
    # two consumers (model trace shape vs pipeline resize target); a user
    # overriding one would otherwise silently train at one resolution
    # and eval/export at another. Overriding either syncs the other;
    # overriding both to different values is an error.
    if cfg.model.input_size != cfg.data.input_size:
        m_set = "model.input_size" in keys
        d_set = "data.input_size" in keys
        if m_set and d_set:
            raise ValueError(
                f"model.input_size={cfg.model.input_size} and "
                f"data.input_size={cfg.data.input_size} disagree — they "
                "are the same quantity; set just one"
            )
        if m_set:
            cfg = cfg.replace(
                data=dataclasses.replace(
                    cfg.data, input_size=cfg.model.input_size
                )
            )
        elif d_set:
            cfg = cfg.replace(
                model=dataclasses.replace(
                    cfg.model, input_size=cfg.data.input_size
                )
            )
    return cfg


def _replace_path(node, parts, value):
    if len(parts) == 1:
        return dataclasses.replace(node, **{parts[0]: value})
    child = getattr(node, parts[0])
    return dataclasses.replace(node, **{parts[0]: _replace_path(child, parts[1:], value)})
