"""Immutable experiment configuration.

Replaces the reference's module-level mutable singleton (``main/config.py:~10-60``
defines ``class Config``; ``cfg = Config()`` is imported and mutated everywhere)
with frozen dataclasses passed explicitly. Field values mirror the reference
defaults: ``trainset=['Human36M','MPII']``, ``input_shape=(256,256)``,
``output_shape=input/4``, ``depth_dim=64``, ``bbox_3d_shape=(2000,2000,2000)`` mm,
ImageNet pixel mean/std, Adam ``lr=1e-3`` with step decay ``x0.1`` at epochs
``[17, 21]``, ``end_epoch=25``, per-device ``batch_size=32``, ``flip_test=True``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

# ImageNet normalization used by the reference's torchvision transform
# (data/dataset.py: ToTensor + Normalize(mean, std)).
IMAGENET_MEAN: Tuple[float, float, float] = (0.485, 0.456, 0.406)
IMAGENET_STD: Tuple[float, float, float] = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Backbone + head. Reference: main/model.py, common/nets/resnet.py."""

    resnet_type: int = 50  # one of 18, 34, 50, 101, 152
    # Number of deconv (upsampling) stages in the head; each is
    # ConvTranspose(256, k4, s2) + BN + ReLU. Reference uses 3 (x8 upsample
    # from the stride-32 backbone output -> stride-4 heatmaps).
    num_deconv_layers: int = 3
    deconv_channels: int = 256
    head_final_init_std: float = 0.001  # reference: normal(std=0.001) head init
    # Compute dtype for conv/matmul. Params stay fp32; bf16 feeds the MXU.
    compute_dtype: str = "float32"  # "float32" | "bfloat16"
    # XLA matmul/conv precision for fp32 operands (None = platform
    # default). On TPU the default quantizes fp32 conv inputs to bf16 on
    # the MXU (~0.25 voxel coordinate shift vs true fp32); "highest" makes
    # fp32 mean fp32 — the parity configs set it. Threaded PER-CALL into
    # every model conv/einsum (build_pose_net -> PoseNet.matmul_precision),
    # so configs never leak precision into each other through process
    # state; the Pallas kernels and the tiny coordinate contractions
    # (integral._expectation, data/warp.py) pin their own precision.
    matmul_precision: Optional[str] = None  # None | "default" | "highest"
    # Emit heatmap logits in fp32 (default: the volumetric softmax is
    # precision-sensitive; bf16 logits shift coords ~0.02 voxel = ~0.6 mm
    # but halve the integral kernel's HBM traffic).
    fp32_logits: bool = True
    # Space-to-depth stem: exact re-layout of the 7x7/2 stem conv that uses
    # 12 MXU lanes instead of 3 (see models/resnet.py:s2d_stem_kernel).
    s2d_stem: bool = False
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    # BatchNorm implementation (models/resnet.py:_BN): "flax" =
    # nn.BatchNorm (fp32-promoted normalize chain); "lean" = fp32 batch
    # statistics but the normalize folded to ONE per-channel FMA in
    # compute_dtype — bf16 elementwise fwd/bwd traffic in bf16 configs,
    # identical arithmetic at fp32. Checkpoint-compatible either way.
    bn_mode: str = "flax"
    # Rematerialize each residual block in backward (saves only block
    # inputs; trades spare MXU FLOPs for HBM residual traffic).
    block_remat: bool = False
    # Remat flavor: "full" (recompute convs too; measured slower) or
    # "conv_outs" (save conv outputs, recompute only BN/ReLU tails).
    remat_policy: str = "full"
    # Fuse Bottleneck 1x1 convs with their BatchNorm statistics in
    # train mode (Pallas matmul kernel with stats epilogue + BN-apply
    # prologue, ops/matmul_bn.py): bn1/bn3 statistics cost no extra HBM
    # pass and conv3's input activation never materializes. Train-time
    # only; eval and checkpoints are unaffected (identical param tree).
    # Under a multi-chip mesh, pass the mesh to build_pose_net: the
    # kernel then launches per-shard via shard_map with psummed
    # statistics (sync-BN, matching the unfused GSPMD path).
    fused_1x1: bool = False
    # Fuse the Bottleneck 3x3 mid-conv with the bn1-apply+ReLU prologue
    # and the bn2-statistics epilogue (train-mode Pallas conv kernel,
    # ops/conv_bn.py): the conv1->conv2 activation never exists in HBM
    # and bn2's statistics cost no extra pass. MEASURED OUT in situ
    # (round 4, tools/bench_sweep.py): the fused full step runs 94.75 vs
    # 92.89 ms/step — XLA's conv fusions win; kept off in production,
    # available as a measurement mode (stride-1 tileable >=256-ch blocks,
    # single-device).
    fused_conv3: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline + augmentation. Reference: data/dataset.py."""

    trainset: Tuple[str, ...] = ("Human36M", "MPII")
    testset: str = "Human36M"
    # (height, width) of the network input patch.
    input_shape: Tuple[int, int] = (256, 256)
    # (height, width) of the heatmap; reference: input / 4.
    output_shape: Tuple[int, int] = (64, 64)
    depth_dim: int = 64
    # Metric volume (z, y, x) in mm mapped onto the voxel grid.
    bbox_3d_shape: Tuple[int, int, int] = (2000, 2000, 2000)
    pixel_mean: Tuple[float, float, float] = IMAGENET_MEAN
    pixel_std: Tuple[float, float, float] = IMAGENET_STD
    # Augmentation ranges (reference data/dataset.py:get_aug_config):
    # scale ~ 1 + 0.25*clip(randn,-1,1); rot ~ 30*clip(randn,-2,2) (range
    # +-60 deg) with prob 0.6; color scale in [0.8, 1.2]/channel; flip 0.5.
    scale_factor: float = 0.25
    rot_factor: float = 30.0
    rot_prob: float = 0.6
    color_factor: float = 0.2
    flip_prob: float = 0.5
    # bbox margin (reference common/utils/pose_utils.py:process_bbox).
    bbox_margin: float = 1.25
    use_aug: bool = True


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Optimizer + schedule. Reference: common/base.py (Adam + step decay)."""

    lr: float = 1e-3
    lr_dec_epoch: Tuple[int, ...] = (17, 21)
    lr_dec_factor: float = 10.0
    end_epoch: int = 25
    # Per-device batch size (reference: batch_size=32 per GPU).
    batch_size_per_device: int = 32
    weight_decay: float = 0.0
    grad_clip_norm: Optional[float] = None
    # Snapshot policy. Reference semantics (common/base.py:save_model) are
    # every epoch / keep all; on slow-IO hosts a full snapshot can outlast
    # the epoch it covers, so production runs can thin them out.
    snapshot_interval: int = 1  # save every N epochs (last epoch always)
    snapshot_keep: Optional[int] = None  # keep newest N on disk (None = all)


@dataclasses.dataclass(frozen=True)
class ParallelConfig:
    """SPMD layout. Replaces nn.DataParallel (common/base.py)."""

    # Number of devices along the data axis; None = all visible devices.
    data_axis_size: Optional[int] = None
    data_axis_name: str = "data"
    # Devices along the spatial axis (>1 shards each sample's IMAGE ROWS
    # across chips — latency/memory scaling for one sample, the CNN analog
    # of sequence parallelism; GSPMD inserts the conv halo exchanges).
    # Spatial steps route the integral through the plain-XLA composition:
    # pallas_call has no GSPMD partitioning rule (parallel/train_step.py).
    spatial_axis_size: int = 1
    spatial_axis_name: str = "spatial"
    # ZeRO-1 analog: shard the Adam moments (mu/nu) over the data axis —
    # each leaf splits along its largest divisible dim; GSPMD derives the
    # reduce-scatter/all-gather. Off by default: this model's opt state is
    # ~270 MB fp32, far under HBM, so the collectives buy nothing here —
    # the knob exists for memory-bound variants (parallel/train_step.py:
    # state_shardings; SURVEY §2 lists ZeRO as optional for the reference).
    shard_opt_state: bool = False
    # Donate input buffers to the train step (in-place param update).
    donate: bool = True


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Reference: main/test.py + data/Human36M/Human36M.py:evaluate."""

    flip_test: bool = True
    protocol: int = 2  # H36M protocol: 1 = PA-MPJPE (S11), 2 = MPJPE (S9, S11)
    # 128 measured fastest on v5e (tools/eval_bench.py HEAD band:
    # 1565-1670 img/s/chip vs 1025-1106 at 64 — eval is dispatch+pull
    # latency-bound on the tunnel; PARITY.md eval row).
    batch_size_per_device: int = 128
    # Write the reference-layout result files (pred.mat / H36M result json /
    # COCO detections json) on evaluate(). Parity default; secondary evals
    # (oracle comparisons, train-subset probes) turn it off — the H36M dump
    # is a full-dataset serial json (gigabyte-scale on the real test set).
    dump_artifacts: bool = True


@dataclasses.dataclass(frozen=True)
class Config:
    name: str = "h36m3d_r50"
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    parallel: ParallelConfig = dataclasses.field(default_factory=ParallelConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    seed: int = 0
    output_dir: str = "output"

    @property
    def joint_num(self) -> int:
        """Joints of the primary (first) train set; reference unifies all
        datasets onto the first trainset's joint order (common/base.py:
        transform_joint_to_other_db)."""
        from ihpr_tpu.data import skeletons

        return skeletons.get_skeleton(self.data.trainset[0]).joint_num

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _cfg(**kw) -> Config:
    return Config(**kw)


# The five named configs pinned by BASELINE.json "configs".
CONFIGS = {
    # 1. ResNet-50 + 64^3 soft-argmax, single-image CPU forward (parity).
    "parity_r50": _cfg(
        name="parity_r50",
        model=ModelConfig(matmul_precision="highest"),
        data=DataConfig(trainset=("Human36M",), use_aug=False),
        optim=OptimConfig(batch_size_per_device=1),
    ),
    # 2. MPII 2D pose: ResNet-50 + 64x64 integral (depth_dim=1), single chip.
    "mpii2d_r50": _cfg(
        name="mpii2d_r50",
        data=DataConfig(trainset=("MPII",), testset="MPII", depth_dim=1),
    ),
    # 2b. COCO 2D keypoints: same 2D-integral family as mpii2d_r50 but the
    # 17-joint COCO skeleton + OKS keypoint-AP eval (reference
    # data/MSCOCO/MSCOCO.py). End-to-end evidence: tools/coco_probe.py.
    "coco2d_r50": _cfg(
        name="coco2d_r50",
        data=DataConfig(trainset=("MSCOCO",), testset="MSCOCO", depth_dim=1),
    ),
    # 3. Human3.6M 3D: ResNet-50 + 64^3 volumetric integral, full train/eval.
    # bf16 convs with fp32 master params + fp32 heatmap logits/integral —
    # the TPU-native mixed-precision recipe (MXU runs bf16 natively; the
    # precision-sensitive softmax stays fp32). Use the _fp32 variant to
    # reproduce the reference's full-fp32 arithmetic.
    # Per-chip batch 128 = the reference's PUBLISHED global batch (32 per
    # GPU x 4 GPUs under nn.DataParallel, main/config.py + README); one v5e
    # chip stands in for the whole reference node, same global batch, same
    # Adam lr=1e-3 schedule. Also measured fastest per-image on v5e
    # (tools/bench_sweep.py: 1364 img/s at B=128 vs 1285 at B=32).
    # bn_mode="lean" since round 3: BN normalize as one per-channel bf16
    # FMA (statistics stay fp32) — measured 95.3 -> 92.9 ms/step (+2.7%),
    # the one winner of the backbone-backward sweep (tools/
    # bwd_experiments.py; full/selective remat and bf16 stats all
    # measured out — PARITY.md).
    "h36m3d_r50": _cfg(
        name="h36m3d_r50",
        model=ModelConfig(
            compute_dtype="bfloat16", fp32_logits=False, bn_mode="lean"
        ),
        optim=OptimConfig(batch_size_per_device=128),
    ),
    # "highest" so fp32 means fp32 on the MXU (the default bf16-quantizes
    # conv inputs; measured ~9 mm MPJPE of artificial deviation vs torch).
    "h36m3d_r50_fp32": _cfg(
        name="h36m3d_r50_fp32", model=ModelConfig(matmul_precision="highest")
    ),
    # 4. ResNet-152 @ 288x384 input, mixed H36M+MPII batches, bf16 matmuls.
    "h36m3d_r152_384": _cfg(
        name="h36m3d_r152_384",
        model=ModelConfig(
            resnet_type=152, compute_dtype="bfloat16", bn_mode="lean"
        ),
        data=DataConfig(
            input_shape=(384, 288),
            output_shape=(96, 72),
            depth_dim=64,
        ),
    ),
    # 5. Multi-chip data-parallel training + batched inference server path.
    "h36m3d_r50_dp": _cfg(
        name="h36m3d_r50_dp",
        model=ModelConfig(compute_dtype="bfloat16", bn_mode="lean"),
        parallel=ParallelConfig(data_axis_size=None),
    ),
}


def get_config(name: str) -> Config:
    if name not in CONFIGS:
        raise KeyError(f"unknown config {name!r}; available: {sorted(CONFIGS)}")
    return CONFIGS[name]


# (The round-3 ``apply_matmul_precision`` process-global helper is gone:
# cfg.model.matmul_precision is threaded per-call through the model —
# build_pose_net -> PoseNet.matmul_precision -> every conv/einsum — so
# configs cannot leak precision into each other through process state.)
