"""HRNet topology configuration.

Replaces the reference's yacs ``MODEL.EXTRA`` (config/default.py:17-140 +
seg_hrnet_w48_*.yaml:13-66) with frozen dataclasses, plus a loader for the
reference's YAML layout so existing config files keep working.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

__all__ = ["HRNetStage", "HRNetConfig", "hrnet_w48", "hrnet_w18", "hrnet_w32",
           "hrnet_w64", "load_hrnet_yaml"]


@dataclass(frozen=True)
class HRNetStage:
    num_modules: int
    num_branches: int
    block: str                      # "BASIC" | "BOTTLENECK"
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]
    fuse_method: str = "SUM"


@dataclass(frozen=True)
class HRNetConfig:
    stage1: HRNetStage
    stage2: HRNetStage
    stage3: HRNetStage
    stage4: HRNetStage
    final_conv_kernel: int = 1
    align_corners: bool = True      # config/default.py:37 MODEL.ALIGN_CORNERS

    @property
    def stages(self) -> Tuple[HRNetStage, ...]:
        return (self.stage1, self.stage2, self.stage3, self.stage4)

    @property
    def last_channels(self) -> int:
        """Concat width of the fused multi-branch features (48+96+192+384=720)."""
        expansion = 4 if self.stage4.block == "BOTTLENECK" else 1
        return sum(c * expansion for c in self.stage4.num_channels)


def _width_cfg(w: int) -> HRNetConfig:
    """Standard HRNet-W{18,32,48} semantic-seg topology
    (reference config/hrnet_config.py:16-130 + seg_hrnet_w48 yaml:17-66)."""
    return HRNetConfig(
        stage1=HRNetStage(1, 1, "BOTTLENECK", (4,), (64,)),
        stage2=HRNetStage(1, 2, "BASIC", (4, 4), (w, 2 * w)),
        stage3=HRNetStage(4, 3, "BASIC", (4, 4, 4), (w, 2 * w, 4 * w)),
        stage4=HRNetStage(3, 4, "BASIC", (4, 4, 4, 4), (w, 2 * w, 4 * w, 8 * w)),
    )


def hrnet_w48() -> HRNetConfig:
    return _width_cfg(48)


def hrnet_w32() -> HRNetConfig:
    return _width_cfg(32)


def hrnet_w18() -> HRNetConfig:
    return _width_cfg(18)


def hrnet_w64() -> HRNetConfig:
    """TPU-native width: every branch (64/128/256/512) is a multiple of the
    MXU/VPU lane count, so conv channel dims tile the 128x128 systolic array
    without padding waste (W48's 48-wide branch packs at 0.375 efficiency —
    see tools/roofline.py and the W48-in-W64 packing parity experiment,
    tools/channel_packing_experiment.py). No reference analog (its widths
    come from the published ImageNet checkpoints); use when training from
    scratch on TPU."""
    return _width_cfg(64)


def resolve_hrnet_config(name_or_path: str) -> HRNetConfig:
    """``--config`` resolver: the shorthand names ``w18``/``w32``/``w48``
    (the reference's hrnet_config.py MODEL_CONFIGS family, vestigial there,
    first-class here) or a reference-format YAML path."""
    key = name_or_path.strip().lower()
    factories = {"w18": hrnet_w18, "w32": hrnet_w32, "w48": hrnet_w48,
                 "w64": hrnet_w64}
    if key in factories:
        return factories[key]()
    return load_hrnet_yaml(name_or_path)


def load_hrnet_yaml(path: str) -> HRNetConfig:
    """Load a reference-format YAML (MODEL.EXTRA.STAGE{1..4}) into HRNetConfig.

    Mirrors ``update_config`` (config/default.py:131-140): only the MODEL block
    is consumed by the active reference code path.
    """
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    extra = cfg["MODEL"]["EXTRA"]

    def stage(key: str) -> HRNetStage:
        s = extra[key]
        return HRNetStage(
            num_modules=int(s.get("NUM_MODULES", 1)),
            # the shipped yaml misspells STAGE1 NUM_BRANCHES as NUM_RANCHES —
            # tolerate both (stage1 is single-branch regardless)
            num_branches=int(s.get("NUM_BRANCHES", s.get("NUM_RANCHES", 1))),
            block=str(s["BLOCK"]),
            num_blocks=tuple(int(x) for x in s["NUM_BLOCKS"]),
            num_channels=tuple(int(x) for x in s["NUM_CHANNELS"]),
            fuse_method=str(s.get("FUSE_METHOD", "SUM")),
        )

    return HRNetConfig(
        stage1=stage("STAGE1"),
        stage2=stage("STAGE2"),
        stage3=stage("STAGE3"),
        stage4=stage("STAGE4"),
        final_conv_kernel=int(extra.get("FINAL_CONV_KERNEL", 1)),
        align_corners=bool(cfg["MODEL"].get("ALIGN_CORNERS", True)),
    )
