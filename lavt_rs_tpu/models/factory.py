"""Model zoo — mirrors reference lib/segmentation.py's factory names.

`build_model(cfg)` returns the flax module; `MODELS[name]` gives a
config-constructor per published model family (reference
lib/segmentation.py:10 `__all__`: lavt, lavt_one, lavt_video, lts, vlt,
lavt_vlt).
"""

from __future__ import annotations

from typing import Callable, Dict

import flax.linen as nn

from ..config import ModelConfig, SwinConfig
from .lavt import LAVT, LAVTOne, LAVTTwo, LAVTVideo, LTS, VLT


def build_model(cfg: ModelConfig, train: bool = False) -> nn.Module:
    if cfg.name == "lavt_one":
        return LAVTOne(cfg, train_mode=train)
    if cfg.name == "lavt":
        # the two-model variant with BERT attached (trainable end-to-end);
        # the raw LAVT module (precomputed l_feats) remains importable.
        return LAVTTwo(cfg, train_mode=train)
    if cfg.name == "lavt_video":
        return LAVTVideo(cfg, train_mode=train)
    if cfg.name == "lts":
        return LTS(cfg, train_mode=train)
    if cfg.name == "vlt":
        return VLT(cfg, train_mode=train)
    if cfg.name == "lavt_vlt":
        return VLT(cfg, train_mode=train, fused_backbone=True)
    raise NotImplementedError(f"model {cfg.name!r} not implemented yet")


def make_config(name: str, swin_type: str = "base", window12: bool = True,
                **kw) -> ModelConfig:
    """Replicates the reference factory's size/window selection
    (lib/segmentation.py:16-45)."""
    window_size = 12 if window12 else 7
    swin_kw = {}
    if name == "lavt_video":
        # Video drop-path rates per size (lib/segmentation.py:154-212);
        # 3D window (8,7,7) or (8,12,12) per --window12.
        swin_kw["drop_path_rate"] = {"tiny": 0.1, "small": 0.2,
                                     "base": 0.3}.get(swin_type, 0.3)
        swin_kw["window_size_3d"] = (8, 12, 12) if window12 else (8, 7, 7)
        kw.setdefault("max_tokens", 22)
    swin = SwinConfig.from_size(swin_type, window_size=window_size, **swin_kw)
    return ModelConfig(name=name, swin=swin, **kw)


MODELS: Dict[str, Callable[..., ModelConfig]] = {
    name: (lambda name=name: lambda **kw: make_config(name, **kw))()
    for name in ("lavt", "lavt_one", "lavt_video", "lts", "vlt", "lavt_vlt")
}
