"""Typed configuration (component C17 in SURVEY.md §2).

The reference repo's argparse options module is replaced with frozen
dataclasses plus five named presets mirroring the five judged configs in
BASELINE.json:7-11. Every constant the empty reference mount prevented us
from verifying is isolated here and marked ``UNVERIFIED vs reference`` so
a later diff against real reference code is a constants-only change
(SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class MonoConfig:
    """Monocular ResNet-18 U-Net depth network (SURVEY C6, C7, C8, C13)."""

    # Input resolution (H, W).
    height: int = 192
    width: int = 640
    # Encoder.
    num_layers: int = 18  # ResNet-18 (BASELINE.json:7)
    # Decoder channel plan, coarsest→finest is reversed at use sites.
    # monodepth2-lineage plan. UNVERIFIED vs reference.
    dec_channels: Tuple[int, ...] = (16, 32, 64, 128, 256)
    # Scales at which disparity heads emit output (0 = full decoder res).
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    # disp→depth scaled-sigmoid constants (SURVEY C8).
    # monodepth2 convention. UNVERIFIED vs reference.
    min_depth: float = 0.1
    max_depth: float = 100.0
    # Upsample mode inside the decoder ("nearest" is the monodepth2
    # convention). UNVERIFIED vs reference.
    upsample_mode: str = "nearest"
    # Execute the two finest decoder levels in a space-to-depth packed
    # layout (ops/packed.py) — an exact execution rewrite that fills the
    # 128 TPU lanes the C=16/32 levels otherwise waste. Inference
    # programs only; requires nearest upsample and H, W % 4 == 0
    # (api.build_mono_program falls back automatically otherwise).
    # Round-2 rewrite (ops/collapsed.py): the nearest upsample is FOLDED
    # into the following conv (one half-res conv emitting the s2d-packed
    # full-res result at the ORIGINAL FLOP count — the round-1 plain
    # s2d rewrite carried 4x structural-zero FLOPs and was a measured
    # wash), the level-1 skip runs as a stride-2 4x4 conv reading
    # features[0] directly, and no full-res tensor materializes until
    # the final depth_to_space. Measured numbers in BASELINE.md:
    # 1317.3 vs 1112.6 fps at the judged config (+18%), parity exact to
    # reassociation (tests/test_collapsed.py). Default ON for inference
    # programs (api.build_mono_program falls back automatically when the
    # preconditions fail); training always uses the standard decoder.
    packed_decoder: bool = True
    # OPT-IN fast-border serving mode (ops/collapsed.py border_mode
    # 'fast'): every decoder conv runs with plain zero padding — no
    # border strips, no bordered carry. Deviates from the reference's
    # reflect-border semantics in a band near the image borders (the
    # interior is identical); the measured abs-rel impact and fps gain
    # are recorded in BASELINE.md. Default OFF: the exact path holds
    # bit-parity with the reference decoder everywhere.
    fast_borders: bool = False
    # Fold BatchNorm statistics into the encoder conv weights for
    # inference programs (models/folded.py): removes ~10 separate
    # elementwise BN passes over (B, H, W, C) activations per forward.
    # Inference-only; the Trainer keeps live-statistics BN.
    fold_bn: bool = False
    # Space-to-depth stem (ops/stem.py): run conv1 as a 4x4 stride-1
    # conv on the 2x2-packed input (exact rewrite). Measured SLOWER on
    # v5e (6.47 vs 5.26 ms at the judged b128 shape, bench/probe_stem2):
    # the packed C=12 tensor under-fills the 128-lane tiles as badly as
    # C=3, and the packing pass costs a full read+write of the input.
    # Kept as the recorded experiment; engages on the folded inference
    # path (fold_bn) when H and W are even. Default OFF by measurement.
    s2d_stem: bool = False
    # Temporal-training protocol variant (VERDICT r3 weak-#3): compute
    # the multi-scale photometric loss at each scale's NATIVE resolution
    # (monodepth-v1 convention) instead of upsampling every scale to
    # full res (monodepth2 convention, the default). Cuts the dominant
    # gather/SSIM cost of scales 1..3 by 4x/16x/64x; measured fps and
    # synthetic-recovery quality in BASELINE.md round 4. Training-only;
    # inference programs never read it.
    temporal_at_scale: bool = False
    # Run the TRAIN forward through the collapsed/packed decoder too
    # (ops/collapsed.collapsed_mono_decoder_multiscale): the rewrite is
    # exact and built from plain jnp ops, so jax.grad through it equals
    # the standard decoder's gradients to reassociation error
    # (tests/test_collapsed_train.py pins forward, grads, and one full
    # Adam step). Measured on v5e: supervised 182->511 fps/chip,
    # selfsup 155->332 at 192x640 b16 (BASELINE.md). Default ON — the
    # same exactness standard as packed_decoder; the flag remains for
    # A/B and for shapes the collapse does not admit (auto-fallback).
    collapsed_train: bool = True


@dataclasses.dataclass(frozen=True)
class StereoConfig:
    """Stereo correlation network (SURVEY C9, C10, C11, C12)."""

    height: int = 256
    width: int = 512
    # Maximum disparity at FULL resolution. 192 is the KITTI-standard
    # search range (GC-Net / DispNetC lineage). UNVERIFIED vs reference.
    max_disp: int = 192
    # Feature extractor downsampling factor before correlation.
    feat_stride: int = 4
    # Feature channels fed into the correlation.
    feat_channels: int = 64
    # Aggregation U-Net channel plan over the cost volume.
    agg_channels: Tuple[int, ...] = (64, 96, 128, 160)
    # Stereo rig geometry for disp→depth = fx*baseline/disp.
    # KITTI 2015 values (P2 cam). UNVERIFIED vs reference.
    focal_px: float = 721.5377
    baseline_m: float = 0.54
    # FADNet-style residual refinement + intermediate-scale cost heads
    # (models/stereo.Refinement). Opt-in: adds params, so the default
    # preserves reference checkpoint-parity. VERDICT r1 next-#3.
    refine: bool = False
    # Soft-argmin temperature (softmax over -cost/τ); τ < 1 sharpens the
    # readout. 1.0 = GC-Net convention. Plain hyperparameter: the
    # round-3 collapse study (BASELINE.md) reproduced the high-LR
    # uniform-softmax collapse and measured τ=0.5 NOT rescuing it.
    softargmin_temperature: float = 1.0
    # Weight of the Gaussian-smoothed cross-entropy auxiliary loss on
    # the cost-volume softmax during supervised training
    # (losses.disparity_classification_loss) — the structural anchor
    # against the soft-argmin collapse (BASELINE.md round-3 rescue
    # table). 0 = off (reference-parity default; build-side addition,
    # AcfNet/stereo-focal-loss lineage).
    aux_ce_weight: float = 0.0
    # Collapsed/packed inference execution of the aggregation U-Net
    # (ops/collapsed.collapsed_cost_aggregation): exact rewrite, zero
    # extra pad copies. Inference programs only; refine checkpoints ride
    # it too since round 3 (ops/collapsed.refinement_forward — the aux
    # cost heads are training-only). Default ON by measurement
    # (BASELINE.md): config-5 shape 343.9 → 716.9 fps/chip at b16
    # (+108%); neutral at b64 (1000 vs 1040) where large batch already
    # amortizes the module path's overheads.
    packed_agg: bool = True
    # Run the packed/collapsed forward inside the TRAIN steps too (the
    # rewrite is pure differentiable lax ops, so gradients match the
    # module path to reassociation error —
    # tests/test_collapsed_train.py::test_stereo_* pin forward, grads,
    # and an Adam step). Engages when packed_agg's shape conditions
    # hold and refine is off (aux cost heads need the module decoder).
    # Default OFF by measurement (bench/probe_stereo_train_collapsed.py,
    # fori-amortized): supervised 256x512 b16 369.6 -> 373.9, selfsup
    # 312.2 -> 320.6, config-5-shape b8 bf16 297.3 -> 294.7 fps/chip —
    # a wash; unlike inference (+108% at b16), the train step's backward
    # through the packed layouts gives back what the forward saves.
    collapsed_train: bool = False

    @property
    def corr_disp(self) -> int:
        """Correlation search range at feature resolution."""
        return self.max_disp // self.feat_stride


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """On-device preprocessing (SURVEY C2): resize → scale → normalize.

    Normalization stats: the monodepth2 lineage normalizes with
    (x - 0.45) / 0.225 (a gray-world approximation of the ImageNet
    stats). UNVERIFIED vs reference — switchable to exact ImageNet stats.
    """

    mean: Tuple[float, float, float] = (0.45, 0.45, 0.45)
    std: Tuple[float, float, float] = (0.225, 0.225, 0.225)
    # PIL-parity antialiased bilinear resize (SURVEY §7 "Hard parts").
    antialias: bool = True

    @classmethod
    def imagenet(cls) -> "PreprocessConfig":
        return cls(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """KITTI Eigen-split / NYUv2 / KITTI-2015 evaluation (SURVEY C15).

    Eigen crop + [min,max] depth cap + median scaling are the standard
    monocular protocol (Eigen et al. / monodepth2). UNVERIFIED vs
    reference; all toggleable.
    """

    min_depth: float = 1e-3
    max_depth: float = 80.0
    # Garg/Eigen crop expressed as fractions of (H, W):
    # rows [0.40810811, 0.99189189), cols [0.03594771, 0.96405229).
    eigen_crop: Tuple[float, float, float, float] = (
        0.40810811,
        0.99189189,
        0.03594771,
        0.96405229,
    )
    median_scaling: bool = True
    # KITTI-2015 D1 threshold: error > 3px AND > 5% of GT disparity.
    d1_px: float = 3.0
    d1_frac: float = 0.05


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """One end-to-end pipeline configuration (a BASELINE.json config)."""

    name: str
    pipeline: str  # "mono" | "stereo"
    batch_size: int = 1
    dtype: str = "float32"  # compute dtype: "float32" | "bfloat16"
    num_devices: int = 1  # data-parallel mesh size
    mono: MonoConfig = dataclasses.field(default_factory=MonoConfig)
    stereo: StereoConfig = dataclasses.field(default_factory=StereoConfig)
    pre: PreprocessConfig = dataclasses.field(default_factory=PreprocessConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)

    @property
    def height(self) -> int:
        return self.mono.height if self.pipeline == "mono" else self.stereo.height

    @property
    def width(self) -> int:
        return self.mono.width if self.pipeline == "mono" else self.stereo.width


# ---------------------------------------------------------------------------
# The five judged presets (BASELINE.json:7-11).
# ---------------------------------------------------------------------------

MONO_KITTI_192x640_FP32 = RunConfig(
    name="mono_kitti_192x640_fp32",
    pipeline="mono",
    batch_size=1,
    dtype="float32",
    mono=MonoConfig(height=192, width=640),
)

MONO_NYU_480x640_B8 = RunConfig(
    name="mono_nyu_480x640_b8",
    pipeline="mono",
    batch_size=8,
    dtype="float32",
    mono=MonoConfig(height=480, width=640),
)

MONO_EIGEN_EVAL = RunConfig(
    name="mono_eigen_eval",
    pipeline="mono",
    batch_size=8,
    dtype="float32",
    mono=MonoConfig(height=192, width=640),
)

STEREO_256x512_B4 = RunConfig(
    name="stereo_256x512_b4",
    pipeline="stereo",
    batch_size=4,
    dtype="float32",
    stereo=StereoConfig(height=256, width=512),
)

STEREO_KITTI2015_B16_BF16_V5E8 = RunConfig(
    name="stereo_kitti2015_b16_bf16_v5e8",
    pipeline="stereo",
    batch_size=16,
    dtype="bfloat16",
    num_devices=8,
    stereo=StereoConfig(height=384, width=1152),
)

# Opt-in high-throughput stereo variant (VERDICT r1 next-#4): the C=64
# feature tower fills only half of the 128 VPU lanes in the correlation
# kernel (BASELINE.md correlation tuning note); C=128 fills them. This is
# an ARCHITECTURE change (more params — not reference-checkpoint
# compatible), hence a separate preset, never a default. Measured r2:
# 329.8 vs 343.9 fps — the lane fill loses to the 4x tower FLOPs.
STEREO_KITTI2015_B16_BF16_V5E8_C128 = RunConfig(
    name="stereo_kitti2015_b16_bf16_v5e8_c128",
    pipeline="stereo",
    batch_size=16,
    dtype="bfloat16",
    num_devices=8,
    stereo=StereoConfig(height=384, width=1152, feat_channels=128),
)

# Opt-in LATENCY serving variant (ROADMAP r3 #2): config-5 shape at the
# literal b2/chip operating point with a halved disparity range
# (max_disp 96 → D=24 at stride 4). Halves the correlation sweep and
# the aggregation's input channels. Like the _c128 preset this is an
# ARCHITECTURE change (the agg head's input width depends on D — not
# reference-checkpoint compatible), hence opt-in, never a default.
# KITTI 2015 disparities reach ~230 px at the native 1242-px width;
# at 1152 px the 192-px preset covers the standard protocol, the 96-px
# variant trades range for latency (fine for mid/far scenes; measured
# fps in BASELINE.md).
STEREO_KITTI2015_LATENCY_D96 = RunConfig(
    name="stereo_kitti2015_latency_d96",
    pipeline="stereo",
    batch_size=2,
    dtype="bfloat16",
    stereo=StereoConfig(height=384, width=1152, max_disp=96),
)

# Benchmark config: the judged metric is KITTI frames/sec/chip at 384x1152
# (BASELINE.json:2) — monocular flagship shape. b128 measured fastest on
# v5e-1 (262 fps @ b8 → 1113 fps @ b128 round 1; decoder's small-channel
# convs are data-movement-bound, batch amortizes them — BASELINE.md log).
MONO_KITTI_384x1152_BENCH = RunConfig(
    name="mono_kitti_384x1152_bench",
    pipeline="mono",
    batch_size=128,
    dtype="bfloat16",
    mono=MonoConfig(height=384, width=1152),
)

PRESETS = {
    c.name: c
    for c in (
        MONO_KITTI_192x640_FP32,
        MONO_NYU_480x640_B8,
        MONO_EIGEN_EVAL,
        STEREO_256x512_B4,
        STEREO_KITTI2015_B16_BF16_V5E8,
        STEREO_KITTI2015_B16_BF16_V5E8_C128,
        STEREO_KITTI2015_LATENCY_D96,
        MONO_KITTI_384x1152_BENCH,
    )
}


def get(name: "str | RunConfig") -> RunConfig:
    # Idempotent: callers like benchmark.run_bench/run_train_bench take
    # "preset name or an already-built RunConfig" (the CLI resolves
    # presets early to apply flag overrides like --num-layers).
    if isinstance(name, RunConfig):
        return name
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
