"""Unified typed configuration for all pipeline stages.

One dataclass-based config system with JSON/YAML round-trip replaces
the reference's two worlds (argparse dicts for stages 1-2, yacs for the
detector — SURVEY.md §5). CLI entry points keep the reference flag
names as aliases so published run recipes keep working.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def save_config(cfg, path: str):
    with open(path, "w") as f:
        json.dump(_asdict(cfg), f, indent=2, default=str)


def load_config(cls, path: str):
    with open(path) as f:
        data = json.load(f)
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in data.items() if k in fields})


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    backbone_type: str = "dpt_large"
    sdf_activation: str | None = "tanh"
    use_bg_sdf: bool = True
    image_size: int = 128
    dtype: str = "float32"  # "bfloat16" on the TPU hot path
    # matmul precision: None lets XLA pick (bf16-like on this build);
    # "highest" pins f32 and is required for parity work
    precision: str | None = "highest"


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adam"  # adam | sgd | lars
    learning_rate: float = 1e-4
    lr_scheduler_type: str = "multi_step_lr"
    lr_scheduler_milestones: tuple[int, ...] = (10000, 20000)
    lr_scheduler_gamma: float = 0.1
    sgd_momentum: float = 0.9
    sgd_weight_decay: float = 5e-5


@dataclasses.dataclass(frozen=True)
class TrainObjectnessConfig:
    model: ModelConfig = ModelConfig()
    optim: OptimConfig = OptimConfig()
    seed: int = 0
    batch_size: int = 20
    train_iter: int = 500_000
    save_ckpt_every: int = 5000
    log_every: int = 50
    # losses (reference train_objectness_net.py:215-254 + script.sh)
    sdf_loss_type: str = "l1"
    center_field_loss_type: str = "l2"
    use_sdf_gradient_loss: bool = True
    use_sdf_binary_mask_loss: bool = True
    # data
    random_crop_scale_min: float = 0.08
    random_crop_scale_max: float = 1.0
    # fault tolerance: skip the parameter update when the batch loss is
    # non-finite or above this ceiling (a single corrupted batch /
    # transient device fault at lr 1e-4 permanently damaged a round-3
    # run: loss 0.60 -> 5300 at one step, fields never recovered —
    # STATUS.md). 0 disables. The reference's CAD loop has the analogous
    # NaN-skip (train_loop.py:280-284); its stage 1 has no protection.
    skip_loss_above: float = 1000.0
    # The Adam early-training transient can legitimately exceed any
    # fixed ceiling (measured: peak ~110 without bg-SDF, ~1100 with —
    # above the ceiling, which deadlocked a run: every update skipped,
    # then the fully-skipped-window fail-fast fired at iter 150, round-4
    # scale run). For the first spike_guard_warmup steps only non-finite
    # losses skip; the ceiling arms afterwards. The corruption mode the
    # guard exists for onsets after ~35-50 min of sustained traffic
    # (thousands of iters), never at step 1. Mirrors the CAD trainer's
    # in_warmup exemption (cad/train_net.py --corrupt-loss-ceiling).
    spike_guard_warmup: int = 500

    def __post_init__(self):
        if isinstance(self.model, dict):
            object.__setattr__(self, "model", ModelConfig(**self.model))
        if isinstance(self.optim, dict):
            object.__setattr__(self, "optim", OptimConfig(**self.optim))
