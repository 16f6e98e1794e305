"""Top-level LAVT models.

Behavioral contract: reference lib/_utils.py
  * LAVT    (external BERT: forward takes precomputed language features)
            — lib/_utils.py:10-27
  * LAVTOne (BERT owned by the model)              — lib/_utils.py:33-67
  * LAVTVideo (Video Swin backbone, per-frame decode) — lib/_utils.py:76-242

I/O conventions (TPU-native, differs from reference layouts):
  * image: NHWC float (B, H, W, 3) — already normalized.
  * video: (B, T, H, W, 3).
  * text:  (B, N_l) int32 token ids;  l_mask: (B, N_l) {0,1}.
  * output logits: NHWC (B, H, W, num_classes) — upsampled to the input
    size with corner-aligned bilinear, like the reference's final
    F.interpolate (lib/_utils.py:61).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..config import ModelConfig
from ..ops.resize import resize_2d, resize_nchw
from .bert import BertEncoder
from .decoder import SimpleDecoding
from .swin2d import MultiModalSwinTransformer


def _upsample_logits_nchw(logits_nchw, in_hw):
    """Final corner-aligned upsample of (B, K, h, w) logits to the input
    size, returned NHWC.  Keeping the class axis (K=2) OUT of the minor
    dim until the very last transpose is worth ~5 ms/step at bs 8 on v5e
    (an NHWC C=2 resize wastes 126/128 lanes in every op that touches
    the logits; tools/profile_infer.py breakdown)."""
    y = resize_nchw(logits_nchw.astype(jnp.float32), in_hw,
                    method="bilinear", align_corners=True)
    return jnp.transpose(y, (0, 2, 3, 1))


class LAVTOne(nn.Module):
    """lavt_one: BERT + multimodal Swin + SimpleDecoding in one module."""

    cfg: ModelConfig
    train_mode: bool = False

    @nn.compact
    def __call__(self, image, text_ids, l_mask, *, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        in_hw = image.shape[1:3]

        l_feats = BertEncoder(cfg.bert, dtype=dt, name="text_encoder")(
            text_ids, l_mask, deterministic=deterministic)

        feats = MultiModalSwinTransformer(
            cfg=cfg.swin, fusion=cfg.fusion, out_indices=cfg.out_indices,
            use_checkpoint=cfg.use_checkpoint, use_pallas=cfg.use_pallas,
            dtype=dt, name="backbone")(
                image.astype(dt), l_feats, l_mask,
                deterministic=deterministic)

        if cfg.lazy_pred:
            x_c1 = None
            x_c2, x_c3, x_c4 = feats
        else:
            x_c1, x_c2, x_c3, x_c4 = feats

        logits = SimpleDecoding(
            c4_dims=8 * cfg.swin.embed_dim, num_classes=cfg.num_classes,
            lazy_pred=cfg.lazy_pred,
            interpolate_before_seg=cfg.interpolate_before_seg,
            seg_last=cfg.seg_last, train=self.train_mode, dtype=dt,
            nchw_out=True, name="classifier")(x_c4, x_c3, x_c2, x_c1)

        return _upsample_logits_nchw(logits, in_hw)


class LAVT(nn.Module):
    """lavt: language features computed externally (reference keeps BERT as
    a separate DDP model; here it is simply a separate module/apply)."""

    cfg: ModelConfig
    train_mode: bool = False

    @nn.compact
    def __call__(self, image, l_feats, l_mask, *, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        in_hw = image.shape[1:3]

        feats = MultiModalSwinTransformer(
            cfg=cfg.swin, fusion=cfg.fusion, out_indices=cfg.out_indices,
            use_checkpoint=cfg.use_checkpoint, use_pallas=cfg.use_pallas,
            dtype=dt, name="backbone")(
                image.astype(dt), l_feats.astype(dt), l_mask,
                deterministic=deterministic)
        x_c1, x_c2, x_c3, x_c4 = feats
        logits = SimpleDecoding(
            c4_dims=8 * cfg.swin.embed_dim, num_classes=cfg.num_classes,
            train=self.train_mode, dtype=dt, nchw_out=True,
            name="classifier")(x_c4, x_c3, x_c2, x_c1)
        return _upsample_logits_nchw(logits, in_hw)


class LAVTTwo(nn.Module):
    """lavt with its external BERT attached as a sibling submodule.

    The reference trains `lavt` as TWO DDP models — the segmentation net and
    a separate BertModel — checkpointed as {'model': ..., 'bert_model': ...}
    (reference train.py:596-605, 634-686; test.py threads bert_model through
    eval).  Here the same structure is one flax module whose param tree has
    top-level 'model' and 'bert_model' keys, so the reference's two state
    dicts round-trip through the converter and the one-jitted-program train
    step works unchanged (same (image, ids, mask) signature as LAVTOne).
    """

    cfg: ModelConfig
    train_mode: bool = False

    @nn.compact
    def __call__(self, image, text_ids, l_mask, *, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        l_feats = BertEncoder(cfg.bert, dtype=dt, name="bert_model")(
            text_ids, l_mask, deterministic=deterministic)
        return LAVT(cfg, train_mode=self.train_mode, name="model")(
            image, l_feats, l_mask, deterministic=deterministic)


class LTS(nn.Module):
    """lts: plain Swin backbone (out_indices 1,2,3) + LTSDecoding
    (reference lib/_utils.py:248-273, lib/segmentation.py:229-293)."""

    cfg: ModelConfig
    train_mode: bool = False

    @nn.compact
    def __call__(self, image, text_ids, l_mask, *, deterministic: bool = True):
        from .lts import LTSDecoding
        from .swin2d import SwinTransformer

        cfg = self.cfg
        dt = cfg.compute_dtype
        in_hw = image.shape[1:3]
        l_feats = BertEncoder(cfg.bert, dtype=dt, name="text_encoder")(
            text_ids, l_mask, deterministic=deterministic)
        x_c2, x_c3, x_c4 = SwinTransformer(
            cfg=cfg.swin, out_indices=(1, 2, 3),
            use_checkpoint=cfg.use_checkpoint, use_pallas=cfg.use_pallas,
            dtype=dt, name="backbone")(image.astype(dt),
                                       deterministic=deterministic)
        logits = LTSDecoding(
            c4_dims=8 * cfg.swin.embed_dim, num_classes=cfg.num_classes,
            train=self.train_mode, dtype=dt, name="classifier")(
                x_c4, x_c3, x_c2, l_feats, l_mask,
                deterministic=deterministic)
        return resize_2d(logits.astype(jnp.float32), in_hw,
                         method="bilinear", align_corners=True)


class VLT(nn.Module):
    """vlt: plain Swin backbone + VLTFuseAndClassify
    (reference lib/_utils.py:278-305)."""

    cfg: ModelConfig
    train_mode: bool = False
    fused_backbone: bool = False  # lavt_vlt: multimodal backbone + VLT head

    @nn.compact
    def __call__(self, image, text_ids, l_mask, *, deterministic: bool = True):
        from .swin2d import SwinTransformer
        from .vlt import VLTFuseAndClassify

        cfg = self.cfg
        dt = cfg.compute_dtype
        in_hw = image.shape[1:3]
        l_feats = BertEncoder(cfg.bert, dtype=dt, name="text_encoder")(
            text_ids, l_mask, deterministic=deterministic)
        if self.fused_backbone:
            x_c2, x_c3, x_c4 = MultiModalSwinTransformer(
                cfg=cfg.swin, fusion=cfg.fusion, out_indices=(1, 2, 3),
                use_checkpoint=cfg.use_checkpoint, use_pallas=cfg.use_pallas,
                dtype=dt, name="backbone")(
                    image.astype(dt), l_feats, l_mask,
                    deterministic=deterministic)
        else:
            x_c2, x_c3, x_c4 = SwinTransformer(
                cfg=cfg.swin, out_indices=(1, 2, 3),
                use_checkpoint=cfg.use_checkpoint, use_pallas=cfg.use_pallas,
                dtype=dt, name="backbone")(image.astype(dt),
                                           deterministic=deterministic)
        logits = VLTFuseAndClassify(
            img_size=cfg.img_size, num_queries=16,
            train=self.train_mode, dtype=dt, name="classifier")(
                x_c4, x_c3, x_c2, l_feats, l_mask,
                deterministic=deterministic)
        return resize_2d(logits.astype(jnp.float32), in_hw,
                         method="bilinear", align_corners=True)


class LAVTVideo(nn.Module):
    """lavt_video: Video Swin 3D backbone + per-frame SimpleDecoding.

    Input video (B, T, H, W, 3); output (B*T, H, W, num_classes) logits —
    frame-major like the reference's (B*T, 2, H, W) (lib/_utils.py:104-108).
    """

    cfg: ModelConfig
    train_mode: bool = False

    @nn.compact
    def __call__(self, video, text_ids, l_mask, *, deterministic: bool = True):
        from .swin3d import MultiModalSwinTransformer3D

        cfg = self.cfg
        dt = cfg.compute_dtype
        in_hw = video.shape[2:4]

        l_feats = BertEncoder(cfg.bert, dtype=dt, name="text_encoder")(
            text_ids, l_mask, deterministic=deterministic)

        feats = MultiModalSwinTransformer3D(
            cfg=cfg.swin, fusion=cfg.fusion, tpwam=cfg.tpwam,
            out_indices=cfg.out_indices, hybrid_2d=cfg.hybrid_2d_3d,
            use_checkpoint=cfg.use_checkpoint,
            use_pallas=cfg.use_pallas, dtype=dt, name="backbone")(
                video.astype(dt), l_feats, l_mask,
                deterministic=deterministic)
        # Each stage output: (B*T, Hi, Wi, Ci)
        if cfg.lazy_pred:
            x_c1 = None
            x_c2, x_c3, x_c4 = feats
        else:
            x_c1, x_c2, x_c3, x_c4 = feats

        logits = SimpleDecoding(
            c4_dims=8 * cfg.swin.embed_dim, num_classes=cfg.num_classes,
            lazy_pred=cfg.lazy_pred,
            interpolate_before_seg=cfg.interpolate_before_seg,
            seg_last=cfg.seg_last, train=self.train_mode, dtype=dt,
            nchw_out=not cfg.seg_last, name="classifier")(
                x_c4, x_c3, x_c2, x_c1)

        if not cfg.seg_last:
            logits = _upsample_logits_nchw(logits, in_hw)
        return logits
