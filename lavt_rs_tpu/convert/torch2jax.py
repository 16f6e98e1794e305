"""PyTorch-checkpoint -> JAX pytree converter.

Converts reference LAVT/LAVT-one/LAVT-video checkpoints (and raw HF BERT /
ImageNet Swin / Kinetics Video-Swin checkpoints) into this framework's flax
variable trees.  Mirrors the reference's weight-import behaviors:
  * prefix stripping ('module.', 'backbone.', MoBY 'encoder.')
    — reference lib/mmcv_custom/checkpoint.py:287-330
  * relative-position-bias bicubic interpolation when window size differs
    — reference lib/mmcv_custom/checkpoint.py:340-356
  * 2D->3D inflation (patch-embed temporal handling, rel-pos temporal tiling)
    — reference lib/_utils.py:133-238, lib/video_swin_transformer.py:811-852

Layout rules (torch -> flax):
  * Linear / 1x1 Conv1d:  weight (out, in[, 1]) -> kernel (in, out)
  * Conv2d:               weight (out, in, kh, kw) -> kernel (kh, kw, in, out)
  * Conv3d:               weight (out, in, kd, kh, kw) -> (kd, kh, kw, in, out)
  * LayerNorm/BatchNorm:  weight -> scale
  * Embedding:            weight -> embedding
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import ModelConfig


Array = np.ndarray
FlatDict = Dict[str, Array]


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def resolve_checkpoint_path(path: str) -> str:
    """Resolve a checkpoint location to a local file, fetching http(s) URLs
    into ~/.cache/lavt_rs_tpu (the reference loads from URL / model-zoo via
    mmcv, lib/mmcv_custom/checkpoint.py:41-80).  torchvision's
    'modelzoo://' scheme maps to the torchvision weight URLs only when
    torchvision is importable; otherwise a clear error tells the user to
    download manually (this environment has no egress)."""
    if path.startswith(("http://", "https://")):
        import hashlib
        import os
        import urllib.request

        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "lavt_rs_tpu")
        os.makedirs(cache, exist_ok=True)
        name = (hashlib.sha1(path.encode()).hexdigest()[:12] + "_"
                + os.path.basename(path.split("?")[0]))
        local = os.path.join(cache, name)
        if not os.path.exists(local):
            tmp = local + ".part"
            try:
                urllib.request.urlretrieve(path, tmp)
            except Exception as e:
                raise RuntimeError(
                    f"could not fetch checkpoint {path!r} ({e!r}); "
                    f"download it manually and pass the local path"
                ) from e
            os.replace(tmp, local)
        return local
    if path.startswith(("modelzoo://", "torchvision://")):
        raise RuntimeError(
            f"{path!r}: model-zoo schemes need torchvision's URL table; "
            "download the weight file and pass a local path or URL")
    return path


def load_torch_state_dict(path: str) -> FlatDict:
    """Load a .pth checkpoint into {name: np.ndarray} (CPU, no grad).
    Accepts local paths and http(s) URLs (see resolve_checkpoint_path)."""
    import torch

    ckpt = torch.load(resolve_checkpoint_path(path), map_location="cpu",
                      weights_only=False)
    for key in ("model", "state_dict", "module"):
        if isinstance(ckpt, dict) and key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
            break
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in ckpt.items() if hasattr(v, "shape")}


def strip_prefixes(sd: FlatDict) -> FlatDict:
    """Strip 'module.' everywhere; strip a uniform 'backbone.'/'encoder.'."""
    out = {k[len("module."):] if k.startswith("module.") else k: v
           for k, v in sd.items()}
    for pfx in ("backbone.", "encoder."):
        if out and all(k.startswith(pfx) for k in out):
            out = {k[len(pfx):]: v for k, v in out.items()}
    return out


def _set(tree: dict, path: Tuple[str, ...], value: Array):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _lin(w: Array) -> Array:
    """Linear or kernel-1 Conv1d weight -> Dense kernel."""
    if w.ndim == 3:  # (out, in, 1)
        w = w[:, :, 0]
    return np.ascontiguousarray(w.T)


def _conv2d(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _conv3d(w: Array) -> Array:
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def interpolate_rel_pos_bias(table: Array, dst_window: Tuple[int, int]) -> Array:
    """Bicubic-resize a 2D relative-position-bias table to a new window size
    (reference lib/mmcv_custom/checkpoint.py:340-356).

    table: ((2*Ws-1)^2, nH) -> ((2*Wd-1)*(2*Wd'-1), nH).
    """
    l1, nh = table.shape
    s1 = int(round(l1**0.5))
    d1, d2 = 2 * dst_window[0] - 1, 2 * dst_window[1] - 1
    if (s1, s1) == (d1, d2):
        return table
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.ascontiguousarray(table.astype(np.float32)))
    t = t.permute(1, 0).view(1, nh, s1, s1)
    t = F.interpolate(t, size=(d1, d2), mode="bicubic")
    return t.view(nh, d1 * d2).permute(1, 0).contiguous().numpy()


# ---------------------------------------------------------------------------
# BERT
# ---------------------------------------------------------------------------

def convert_bert(sd: FlatDict, num_layers: int = 12,
                 prefix: str = "") -> dict:
    """HF BertModel state_dict -> BertEncoder params subtree."""
    p = prefix
    tree: dict = {}
    emb = f"{p}embeddings."
    _set(tree, ("word_embeddings", "embedding"),
         sd[f"{emb}word_embeddings.weight"])
    _set(tree, ("position_embeddings", "embedding"),
         sd[f"{emb}position_embeddings.weight"])
    _set(tree, ("token_type_embeddings", "embedding"),
         sd[f"{emb}token_type_embeddings.weight"])
    _set(tree, ("embeddings_layernorm", "scale"), sd[f"{emb}LayerNorm.weight"])
    _set(tree, ("embeddings_layernorm", "bias"), sd[f"{emb}LayerNorm.bias"])
    for i in range(num_layers):
        src = f"{p}encoder.layer.{i}."
        dst = f"layer_{i}"
        for name in ("query", "key", "value"):
            _set(tree, (dst, "attention", name, "kernel"),
                 _lin(sd[f"{src}attention.self.{name}.weight"]))
            _set(tree, (dst, "attention", name, "bias"),
                 sd[f"{src}attention.self.{name}.bias"])
        _set(tree, (dst, "attention_output", "kernel"),
             _lin(sd[f"{src}attention.output.dense.weight"]))
        _set(tree, (dst, "attention_output", "bias"),
             sd[f"{src}attention.output.dense.bias"])
        _set(tree, (dst, "attention_layernorm", "scale"),
             sd[f"{src}attention.output.LayerNorm.weight"])
        _set(tree, (dst, "attention_layernorm", "bias"),
             sd[f"{src}attention.output.LayerNorm.bias"])
        _set(tree, (dst, "intermediate", "kernel"),
             _lin(sd[f"{src}intermediate.dense.weight"]))
        _set(tree, (dst, "intermediate", "bias"),
             sd[f"{src}intermediate.dense.bias"])
        _set(tree, (dst, "output", "kernel"),
             _lin(sd[f"{src}output.dense.weight"]))
        _set(tree, (dst, "output", "bias"), sd[f"{src}output.dense.bias"])
        _set(tree, (dst, "output_layernorm", "scale"),
             sd[f"{src}output.LayerNorm.weight"])
        _set(tree, (dst, "output_layernorm", "bias"),
             sd[f"{src}output.LayerNorm.bias"])
    return tree


# ---------------------------------------------------------------------------
# Swin 2D multimodal backbone
# ---------------------------------------------------------------------------

def convert_mm_swin2d(sd: FlatDict, cfg: ModelConfig,
                      prefix: str = "backbone.") -> dict:
    """Reference MultiModalSwinTransformer state_dict -> backbone params."""
    p = prefix
    tree: dict = {}
    swin = cfg.swin

    _set(tree, ("patch_embed", "proj", "kernel"),
         _conv2d(sd[f"{p}patch_embed.proj.weight"]))
    _set(tree, ("patch_embed", "proj", "bias"), sd[f"{p}patch_embed.proj.bias"])
    if f"{p}patch_embed.norm.weight" in sd:
        _set(tree, ("patch_embed", "norm", "scale"),
             sd[f"{p}patch_embed.norm.weight"])
        _set(tree, ("patch_embed", "norm", "bias"),
             sd[f"{p}patch_embed.norm.bias"])

    # absolute position embedding: torch (1, L, C) -> NHWC (1, S, S, C)
    # (reference mmcv_custom/checkpoint.py:330-339 reshape)
    if f"{p}absolute_pos_embed" in sd:
        ape = sd[f"{p}absolute_pos_embed"]
        s = int(round(ape.shape[1] ** 0.5))
        _set(tree, ("absolute_pos_embed",),
             np.ascontiguousarray(ape.reshape(1, s, s, ape.shape[-1])))

    for i in range(swin.num_layers):
        lp = f"{p}layers.{i}."
        lt = f"layers_{i}"
        for j in range(swin.depths[i]):
            bp = f"{lp}blocks.{j}."
            bt = f"blocks_{j}"
            for norm in ("norm1", "norm2"):
                _set(tree, (lt, bt, norm, "scale"), sd[f"{bp}{norm}.weight"])
                _set(tree, (lt, bt, norm, "bias"), sd[f"{bp}{norm}.bias"])
            table = sd[f"{bp}attn.relative_position_bias_table"]
            table = interpolate_rel_pos_bias(
                table, (swin.window_size, swin.window_size))
            _set(tree, (lt, bt, "attn", "relative_position_bias_table"), table)
            _set(tree, (lt, bt, "attn", "qkv", "kernel"),
                 _lin(sd[f"{bp}attn.qkv.weight"]))
            if f"{bp}attn.qkv.bias" in sd:
                _set(tree, (lt, bt, "attn", "qkv", "bias"),
                     sd[f"{bp}attn.qkv.bias"])
            _set(tree, (lt, bt, "attn", "proj", "kernel"),
                 _lin(sd[f"{bp}attn.proj.weight"]))
            _set(tree, (lt, bt, "attn", "proj", "bias"),
                 sd[f"{bp}attn.proj.bias"])
            _set(tree, (lt, bt, "mlp", "fc1", "kernel"),
                 _lin(sd[f"{bp}mlp.fc1.weight"]))
            _set(tree, (lt, bt, "mlp", "fc1", "bias"), sd[f"{bp}mlp.fc1.bias"])
            _set(tree, (lt, bt, "mlp", "fc2", "kernel"),
                 _lin(sd[f"{bp}mlp.fc2.weight"]))
            _set(tree, (lt, bt, "mlp", "fc2", "bias"), sd[f"{bp}mlp.fc2.bias"])

        # PWAM fusion
        fp = f"{lp}fusion."
        if f"{fp}vis_project.0.weight" in sd:
            _set(tree, (lt, "fusion", "vis_project", "kernel"),
                 _lin(sd[f"{fp}vis_project.0.weight"]))
            _set(tree, (lt, "fusion", "vis_project", "bias"),
                 sd[f"{fp}vis_project.0.bias"])
            _set(tree, (lt, "fusion", "project_mm", "kernel"),
                 _lin(sd[f"{fp}project_mm.0.weight"]))
            _set(tree, (lt, "fusion", "project_mm", "bias"),
                 sd[f"{fp}project_mm.0.bias"])
            ap = f"{fp}image_lang_att."
            if f"{ap}f_query.0.weight" in sd:  # attention (PWAM) variant
                for src, dst in (("f_query.0", "f_query"), ("f_key.0", "f_key"),
                                 ("f_value.0", "f_value"), ("W.0", "W")):
                    _set(tree, (lt, "fusion", "image_lang_att", dst, "kernel"),
                         _lin(sd[f"{ap}{src}.weight"]))
                    _set(tree, (lt, "fusion", "image_lang_att", dst, "bias"),
                         sd[f"{ap}{src}.bias"])
            else:  # LangProject ablation
                for src, dst in (("project.0", "fc1"), ("project.2", "fc2")):
                    _set(tree, (lt, "fusion", "image_lang_att", dst, "kernel"),
                         _lin(sd[f"{ap}{src}.weight"]))
                    _set(tree, (lt, "fusion", "image_lang_att", dst, "bias"),
                         sd[f"{ap}{src}.bias"])

        # language gate
        if f"{lp}res_gate.0.weight" in sd:
            _set(tree, (lt, "res_gate", "fc1", "kernel"),
                 _lin(sd[f"{lp}res_gate.0.weight"]))
            _set(tree, (lt, "res_gate", "fc2", "kernel"),
                 _lin(sd[f"{lp}res_gate.2.weight"]))

        # downsample
        if f"{lp}downsample.norm.weight" in sd:
            _set(tree, (lt, "downsample", "norm", "scale"),
                 sd[f"{lp}downsample.norm.weight"])
            _set(tree, (lt, "downsample", "norm", "bias"),
                 sd[f"{lp}downsample.norm.bias"])
            _set(tree, (lt, "downsample", "reduction", "kernel"),
                 _lin(sd[f"{lp}downsample.reduction.weight"]))

    for i in cfg.out_indices:
        # backbone-only checkpoints (ImageNet Swin) have a single final
        # `norm`, not per-stage norm{i} — skip, the per-stage norms stay
        # at their init (reference loads non-strictly the same way).
        if f"{p}norm{i}.weight" in sd:
            _set(tree, (f"norm{i}", "scale"), sd[f"{p}norm{i}.weight"])
            _set(tree, (f"norm{i}", "bias"), sd[f"{p}norm{i}.bias"])
    return tree


def convert_lavt_2d_to_hybrid(sd: FlatDict, cfg: ModelConfig,
                              keep_fusion: bool) -> dict:
    """2D lavt_one checkpoint -> variables for the hybrid 2D-Swin video
    model (--ytvos_2d_swin_3d_pwam / --ytvos_2d_swin_pwam).

    Implements load_from_pretrained2d_lavt_weights (reference
    lib/_utils.py:133-183): patch-embed temporal unsqueeze; the 2D blocks
    load as-is (the hybrid backbone runs 2D attention per frame, so the
    rel-pos tables stay 2D); `keep_fusion` keeps the 2D PWAM fusion weights
    only when the hybrid actually uses a 2D PWAM (--ytvos_2d_swin_pwam) —
    with a 3D SepTPWAM the mismatched fusion keys are dropped, like the
    reference's non-strict load.
    """
    sd = strip_prefixes(sd)
    params: dict = {}
    params["text_encoder"] = convert_bert(sd, cfg.bert.num_layers,
                                          prefix="text_encoder.")
    bb = convert_mm_swin2d(sd, cfg, prefix="backbone.")
    pe = bb["patch_embed"]["proj"]["kernel"]  # (kh, kw, in, out)
    bb["patch_embed"]["proj"]["kernel"] = pe[None]  # depth-1 Conv3d
    if not keep_fusion:
        for lt in list(bb):
            if lt.startswith("layers_"):
                bb[lt].pop("fusion", None)
    params["backbone"] = bb
    cls_params, cls_stats = convert_simple_decoding(sd, prefix="classifier.")
    params["classifier"] = cls_params
    return {"params": params, "batch_stats": {"classifier": cls_stats}}


def merge_variables(base, partial):
    """Non-strict state-dict load: overwrite leaves of `base` that exist in
    `partial` (same path and shape); keep everything else at init.  The
    TPU-native equivalent of torch load_state_dict(strict=False) /
    mmcv_custom load_checkpoint (reference checkpoint.py:41-360).

    Returns (merged, loaded_paths, skipped_paths)."""
    loaded, skipped = [], []

    def rec(b, p, pth):
        if isinstance(p, dict):
            if not isinstance(b, dict):
                skipped.append(pth + " (structure mismatch)")
                return b
            out = dict(b)
            for k, v in p.items():
                if k in b:
                    out[k] = rec(b[k], v, f"{pth}/{k}")
                else:
                    skipped.append(f"{pth}/{k}")
            return out
        if hasattr(b, "shape") and tuple(b.shape) != tuple(np.shape(p)):
            skipped.append(f"{pth} (shape {np.shape(p)} vs {tuple(b.shape)})")
            return b
        loaded.append(pth)
        dtype = getattr(b, "dtype", None)
        return np.asarray(p, dtype=dtype)

    return rec(base, partial, ""), loaded, skipped


# ---------------------------------------------------------------------------
# SimpleDecoding classifier
# ---------------------------------------------------------------------------

_DECODER_MAP = [
    ("conv1_4", "bn1_4", "fuse4_a"), ("conv2_4", "bn2_4", "fuse4_b"),
    ("conv1_3", "bn1_3", "fuse3_a"), ("conv2_3", "bn2_3", "fuse3_b"),
    ("conv1_2", "bn1_2", "fuse2_a"), ("conv2_2", "bn2_2", "fuse2_b"),
]


def convert_simple_decoding(sd: FlatDict, prefix: str = "classifier."):
    """-> (params subtree, batch_stats subtree)."""
    p = prefix
    params: dict = {}
    stats: dict = {}
    for conv, bn, dst in _DECODER_MAP:
        if f"{p}{conv}.weight" not in sd:
            continue  # lazy_pred drops the stage-1 join
        _set(params, (dst, "conv", "kernel"), _conv2d(sd[f"{p}{conv}.weight"]))
        _set(params, (dst, "bn", "scale"), sd[f"{p}{bn}.weight"])
        _set(params, (dst, "bn", "bias"), sd[f"{p}{bn}.bias"])
        _set(stats, (dst, "bn", "mean"), sd[f"{p}{bn}.running_mean"])
        _set(stats, (dst, "bn", "var"), sd[f"{p}{bn}.running_var"])
    _set(params, ("head", "kernel"), _conv2d(sd[f"{p}conv1_1.weight"]))
    _set(params, ("head", "bias"), sd[f"{p}conv1_1.bias"])
    return params, stats


# ---------------------------------------------------------------------------
# Swin 3D multimodal backbone (video) + 2D->3D surgery
# ---------------------------------------------------------------------------

def inflate_rel_pos_table_2d_to_3d(table: Array, window_3d) -> Array:
    """2D bias table -> 3D: bicubic spatial resize to (2Wh-1)(2Ww-1), then
    temporal tiling repeat(2*Wd-1, 1) (reference lib/_utils.py:156-175)."""
    wd, wh, ww = window_3d
    table = interpolate_rel_pos_bias(table, (wh, ww))
    return np.tile(table, (2 * wd - 1, 1))


def inflate_patch_embed_2d_to_3d(w: Array, patch_t: int = 1) -> Array:
    """Conv2d (out,in,kh,kw) -> Conv3d (out,in,patch_t,kh,kw): temporal
    unsqueeze, then repeat/÷patch_t along the new depth axis (reference
    lib/video_swin_transformer.py:783 inflate_weights) — the division
    makes the 3D conv of a temporally constant clip reproduce the 2D
    output exactly.  Every shipped LAVT config uses patch depth 1
    (reference lib/_utils.py:153), where this is the plain unsqueeze."""
    w3 = np.repeat(np.asarray(w)[:, :, None], patch_t, axis=2)
    return w3 / patch_t if patch_t > 1 else w3


def sum_patch_embed_temporal(w: Array) -> Array:
    """Kinetics VideoSwin (out,in,kd,kh,kw) -> depth-1 patch embed by
    summing over the temporal kernel dim (reference
    lib/video_swin_transformer.py:841-843)."""
    return w.sum(axis=2, keepdims=True)


def convert_mm_swin3d(sd: FlatDict, cfg: ModelConfig,
                      prefix: str = "backbone.", from_2d: bool = False,
                      drop_fusion: bool = False) -> dict:
    """Reference MultiModalSwinTransformer3D (or a 2D LAVT checkpoint with
    `from_2d=True` surgery) -> 3D backbone params subtree.

    from_2d implements load_from_pretrained2d_lavt_weights[_into_a_3d_model]
    (reference lib/_utils.py:133-238): patch-embed temporal unsqueeze,
    rel-pos spatial resize + temporal tiling, and (drop_fusion) deleting
    the 2D `.fusion` weights that have no 3D counterpart.
    """
    p = prefix
    swin = cfg.swin
    w3d = swin.window_size_3d
    tree: dict = {}

    pe_w = sd[f"{p}patch_embed.proj.weight"]
    if from_2d:
        pe_w = inflate_patch_embed_2d_to_3d(pe_w, cfg.swin.patch_size_3d[0])
    elif pe_w.ndim == 5 and pe_w.shape[2] != cfg.swin.patch_size_3d[0]:
        pe_w = sum_patch_embed_temporal(pe_w)
    _set(tree, ("patch_embed", "proj", "kernel"), _conv3d(pe_w))
    _set(tree, ("patch_embed", "proj", "bias"),
         sd[f"{p}patch_embed.proj.bias"])
    if f"{p}patch_embed.norm.weight" in sd:
        _set(tree, ("patch_embed", "norm", "scale"),
             sd[f"{p}patch_embed.norm.weight"])
        _set(tree, ("patch_embed", "norm", "bias"),
             sd[f"{p}patch_embed.norm.bias"])

    for i in range(swin.num_layers):
        lp = f"{p}layers.{i}."
        lt = f"layers_{i}"
        for j in range(swin.depths[i]):
            bp = f"{lp}blocks.{j}."
            bt = f"blocks_{j}"
            for norm in ("norm1", "norm2"):
                _set(tree, (lt, bt, norm, "scale"), sd[f"{bp}{norm}.weight"])
                _set(tree, (lt, bt, norm, "bias"), sd[f"{bp}{norm}.bias"])
            table = sd[f"{bp}attn.relative_position_bias_table"]
            if from_2d:
                table = inflate_rel_pos_table_2d_to_3d(table, w3d)
            _set(tree, (lt, bt, "attn", "relative_position_bias_table"),
                 table)
            _set(tree, (lt, bt, "attn", "qkv", "kernel"),
                 _lin(sd[f"{bp}attn.qkv.weight"]))
            if f"{bp}attn.qkv.bias" in sd:
                _set(tree, (lt, bt, "attn", "qkv", "bias"),
                     sd[f"{bp}attn.qkv.bias"])
            _set(tree, (lt, bt, "attn", "proj", "kernel"),
                 _lin(sd[f"{bp}attn.proj.weight"]))
            _set(tree, (lt, bt, "attn", "proj", "bias"),
                 sd[f"{bp}attn.proj.bias"])
            for fc in ("fc1", "fc2"):
                _set(tree, (lt, bt, "mlp", fc, "kernel"),
                     _lin(sd[f"{bp}mlp.{fc}.weight"]))
                _set(tree, (lt, bt, "mlp", fc, "bias"),
                     sd[f"{bp}mlp.{fc}.bias"])

        # 3D-PWAM fusion weights (skipped when importing from 2D).  The
        # Conv3d list covers the whole variant family: SepTPWAM's t/s
        # branches, the inner variants' single 1x1x1 outer conv, the
        # sep-seq decoupled `_q` branch (reference
        # video_swin_transformer.py:1822-2089), and TPWAM/TPWAMComp's
        # single-conv projections (1186-1297).
        fp = f"{lp}fusion."
        if not (from_2d and drop_fusion):
            for name in ("temporal_vis_project", "spatial_vis_project",
                         "temporal_vis_project_q", "spatial_vis_project_q",
                         "vis_project", "f_query",
                         "f_query_t", "f_query_s",
                         "f_query_t_q", "f_query_s_q",
                         "W_t", "W_s", "project_mm_t", "project_mm_s",
                         # TPWAMComp / --w_3x3 / --mm_3x3 make W and
                         # project_mm Conv3d (5-dim) instead of Conv1d
                         "W", "project_mm"):
                wkey = f"{fp}{name}.0.weight"
                if wkey not in sd or sd[wkey].ndim != 5:
                    continue
                _set(tree, (lt, "fusion", name, "conv", "kernel"),
                     _conv3d(sd[wkey]))
                _set(tree, (lt, "fusion", name, "conv", "bias"),
                     sd[f"{fp}{name}.0.bias"])
            for src, dst in (("f_key.0", "f_key"),
                             ("f_value.0", "f_value"),
                             ("W.0", "W"), ("project_mm.0", "project_mm")):
                wkey = f"{fp}{src}.weight"
                if wkey in sd and sd[wkey].ndim != 5:
                    _set(tree, (lt, "fusion", dst, "kernel"),
                         _lin(sd[wkey]))
                    _set(tree, (lt, "fusion", dst, "bias"),
                         sd[f"{fp}{src}.bias"])

        if f"{lp}res_gate.0.weight" in sd:
            _set(tree, (lt, "res_gate", "fc1", "kernel"),
                 _lin(sd[f"{lp}res_gate.0.weight"]))
            _set(tree, (lt, "res_gate", "fc2", "kernel"),
                 _lin(sd[f"{lp}res_gate.2.weight"]))
        if f"{lp}downsample.norm.weight" in sd:
            _set(tree, (lt, "downsample", "norm", "scale"),
                 sd[f"{lp}downsample.norm.weight"])
            _set(tree, (lt, "downsample", "norm", "bias"),
                 sd[f"{lp}downsample.norm.bias"])
            _set(tree, (lt, "downsample", "reduction", "kernel"),
                 _lin(sd[f"{lp}downsample.reduction.weight"]))

    for i in cfg.out_indices:
        if f"{p}norm{i}.weight" in sd:
            _set(tree, (f"norm{i}", "scale"), sd[f"{p}norm{i}.weight"])
            _set(tree, (f"norm{i}", "bias"), sd[f"{p}norm{i}.bias"])
    return tree


def convert_lavt_video(sd: FlatDict, cfg: ModelConfig,
                       from_2d: bool = False) -> dict:
    """Full lavt_video checkpoint (or a 2D lavt_one checkpoint with
    from_2d=True surgery) -> variables for LAVTVideo."""
    sd = strip_prefixes(sd)
    params: dict = {}
    params["text_encoder"] = convert_bert(sd, cfg.bert.num_layers,
                                          prefix="text_encoder.")
    params["backbone"] = convert_mm_swin3d(sd, cfg, prefix="backbone.",
                                           from_2d=from_2d,
                                           drop_fusion=from_2d)
    cls_params, cls_stats = convert_simple_decoding(sd, prefix="classifier.")
    params["classifier"] = cls_params
    return {"params": params, "batch_stats": {"classifier": cls_stats}}


# ---------------------------------------------------------------------------
# full models
# ---------------------------------------------------------------------------

def convert_lavt_one(sd: FlatDict, cfg: ModelConfig) -> dict:
    """Full lavt_one checkpoint -> {'params': ..., 'batch_stats': ...}."""
    sd = strip_prefixes(sd)
    params: dict = {}
    params["text_encoder"] = convert_bert(sd, cfg.bert.num_layers,
                                          prefix="text_encoder.")
    params["backbone"] = convert_mm_swin2d(sd, cfg, prefix="backbone.")
    cls_params, cls_stats = convert_simple_decoding(sd, prefix="classifier.")
    params["classifier"] = cls_params
    return {"params": params, "batch_stats": {"classifier": cls_stats}}


def convert_lavt_one_file(path: str, cfg: ModelConfig) -> dict:
    return convert_lavt_one(load_torch_state_dict(path), cfg)


def convert_lavt(model_sd: FlatDict, cfg: ModelConfig,
                 bert_sd: Optional[FlatDict] = None) -> Tuple[dict, Optional[dict]]:
    """The non-integrated `lavt` checkpoint: {'model': ..., 'bert_model': ...}
    (reference train.py saves BERT separately for this variant).

    Returns (model_variables, bert_params-or-None); the LAVT module takes
    precomputed language features, so BERT params go to a standalone
    BertEncoder apply.
    """
    model_sd = strip_prefixes(model_sd)
    params: dict = {}
    params["backbone"] = convert_mm_swin2d(model_sd, cfg, prefix="backbone.")
    cls_params, cls_stats = convert_simple_decoding(model_sd,
                                                    prefix="classifier.")
    params["classifier"] = cls_params
    variables = {"params": params, "batch_stats": {"classifier": cls_stats}}
    bert_params = None
    if bert_sd is not None:
        bert_params = convert_bert(strip_prefixes(bert_sd),
                                   cfg.bert.num_layers, prefix="")
    return variables, bert_params


def convert_lavt_file(path: str, cfg: ModelConfig):
    """Load a reference `lavt` checkpoint file holding both model and
    bert_model dicts."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda d: {k: v.detach().numpy() for k, v in d.items()
                       if hasattr(v, "shape")}
    model_sd = to_np(ckpt["model"])
    bert_sd = to_np(ckpt["bert_model"]) if "bert_model" in ckpt else None
    return convert_lavt(model_sd, cfg, bert_sd)


def convert_lavt_two(model_sd: FlatDict, bert_sd: FlatDict,
                     cfg: ModelConfig) -> dict:
    """Reference `lavt` two-model checkpoint -> variables for
    models.lavt.LAVTTwo (param tree {'model': ..., 'bert_model': ...},
    mirroring the reference's separate state dicts, train.py:596-605)."""
    model_vars, bert_params = convert_lavt(model_sd, cfg, bert_sd)
    if bert_params is None:
        raise ValueError("lavt checkpoint is missing the bert_model dict")
    return {
        "params": {"model": model_vars["params"],
                   "bert_model": bert_params},
        "batch_stats": {"model": model_vars["batch_stats"]},
    }


def convert_lavt_two_file(path: str, cfg: ModelConfig) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda d: {k: v.detach().numpy() for k, v in d.items()
                       if hasattr(v, "shape")}
    if "bert_model" not in ckpt:
        raise ValueError(f"{path} has no 'bert_model' dict — not a "
                         "reference `lavt` checkpoint (use lavt_one?)")
    return convert_lavt_two(to_np(ckpt["model"]), to_np(ckpt["bert_model"]),
                            cfg)


# ---------------------------------------------------------------------------
# VLT / LTS decoder heads (reference lib/vlt.py:12-485,
# lib/mask_predictor.py:147-281)
# ---------------------------------------------------------------------------

def _convbn(params, stats, sd, conv_key, bn_key, dst):
    """torch Conv2d(+BatchNorm2d) pair -> ConvBN {conv, bn} subtree."""
    _set(params, dst + ("conv", "kernel"), _conv2d(sd[f"{conv_key}.weight"]))
    _set(params, dst + ("bn", "scale"), sd[f"{bn_key}.weight"])
    _set(params, dst + ("bn", "bias"), sd[f"{bn_key}.bias"])
    _set(stats, dst + ("bn", "mean"), sd[f"{bn_key}.running_mean"])
    _set(stats, dst + ("bn", "var"), sd[f"{bn_key}.running_var"])


def _mha(params, sd, src, dst):
    """torch nn.MultiheadAttention -> models.vlt.MHA {q,k,v,out}_proj."""
    w = sd[f"{src}.in_proj_weight"]
    b = sd[f"{src}.in_proj_bias"]
    d = w.shape[1]
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        _set(params, dst + (name, "kernel"),
             np.ascontiguousarray(w[i * d:(i + 1) * d].T))
        _set(params, dst + (name, "bias"), b[i * d:(i + 1) * d])
    _set(params, dst + ("out_proj", "kernel"),
         _lin(sd[f"{src}.out_proj.weight"]))
    _set(params, dst + ("out_proj", "bias"), sd[f"{src}.out_proj.bias"])


def _lnorm(params, sd, src, dst):
    _set(params, dst + ("scale",), sd[f"{src}.weight"])
    _set(params, dst + ("bias",), sd[f"{src}.bias"])


def convert_vlt_decoder(sd: FlatDict, prefix: str = "classifier.",
                        nlayers: int = 2):
    """Reference VLTFuseAndClassify state_dict -> (params, batch_stats)
    for models.vlt.VLTFuseAndClassify (lib/vlt.py:12-196)."""
    p = prefix
    params: dict = {}
    stats: dict = {}

    pairs = [
        (f"{p}vis_reduce_chann_1.0", f"{p}vis_reduce_chann_1.1",
         ("vis_reduce_1a",)),
        (f"{p}vis_reduce_chann_1.3", f"{p}vis_reduce_chann_1.4",
         ("vis_reduce_1b",)),
        (f"{p}vis_reduce_chann_2.0", f"{p}vis_reduce_chann_2.1",
         ("vis_reduce_2",)),
        (f"{p}fuse_1_2.0", f"{p}fuse_1_2.1", ("fuse_1_2",)),
        (f"{p}vis_reduce_chann_3.0", f"{p}vis_reduce_chann_3.1",
         ("vis_reduce_3",)),
        (f"{p}fuse_2_3.0", f"{p}fuse_2_3.1", ("fuse_2_3",)),
        (f"{p}hallucinate_result_of_23.0", f"{p}hallucinate_result_of_23.1",
         ("hallucinate_a",)),
        (f"{p}hallucinate_result_of_23.3", f"{p}hallucinate_result_of_23.4",
         ("hallucinate_b",)),
        (f"{p}project_again.0", f"{p}project_again.1", ("project_again",)),
        (f"{p}fuse_again.0", f"{p}fuse_again.1", ("fuse_again",)),
        (f"{p}last_project.0", f"{p}last_project.1", ("last_project",)),
        (f"{p}spatial_refine.0", f"{p}spatial_refine.1",
         ("spatial_refine",)),
    ]
    for conv, bn, dst in pairs:
        _convbn(params, stats, sd, conv, bn, dst)

    # sentence projection: Linear + BatchNorm1d
    _set(params, ("lang_proj", "kernel"), _lin(sd[f"{p}lang_proj.0.weight"]))
    _set(params, ("lang_proj", "bias"), sd[f"{p}lang_proj.0.bias"])
    _set(params, ("lang_proj_bn", "scale"), sd[f"{p}lang_proj.1.weight"])
    _set(params, ("lang_proj_bn", "bias"), sd[f"{p}lang_proj.1.bias"])
    _set(stats, ("lang_proj_bn", "mean"), sd[f"{p}lang_proj.1.running_mean"])
    _set(stats, ("lang_proj_bn", "var"), sd[f"{p}lang_proj.1.running_var"])
    _set(params, ("joint_threshold_bn", "scale"),
         sd[f"{p}joint_threshold.0.weight"])
    _set(params, ("joint_threshold_bn", "bias"),
         sd[f"{p}joint_threshold.0.bias"])
    _set(stats, ("joint_threshold_bn", "mean"),
         sd[f"{p}joint_threshold.0.running_mean"])
    _set(stats, ("joint_threshold_bn", "var"),
         sd[f"{p}joint_threshold.0.running_var"])

    # query generation
    qg = f"{p}query_generation."
    for i in range(3):
        _convbn(params, stats, sd, f"{qg}project_1.{3 * i}",
                f"{qg}project_1.{3 * i + 1}",
                ("query_generation", f"project_1_{i}"))
    _set(params, ("query_generation", "project_2", "kernel"),
         _conv2d(sd[f"{qg}project_2.weight"]))
    _set(params, ("query_generation", "project_query", "kernel"),
         _lin(sd[f"{qg}project_query.0.weight"]))
    _set(params, ("query_generation", "project_lang", "kernel"),
         _lin(sd[f"{qg}project_lang.0.weight"]))
    _mha(params, sd, f"{qg}query_gen", ("query_generation", "query_gen"))

    # transformer encoder / decoder layers
    tf = f"{p}transformer_fusion."
    for i in range(nlayers):
        enc = f"{tf}transformer_encoder.layers.{i}"
        _mha(params, sd, f"{enc}.self_attn", (f"enc_{i}", "self_attn"))
        for lin in ("linear1", "linear2"):
            _set(params, (f"enc_{i}", lin, "kernel"),
                 _lin(sd[f"{enc}.{lin}.weight"]))
            _set(params, (f"enc_{i}", lin, "bias"), sd[f"{enc}.{lin}.bias"])
        _lnorm(params, sd, f"{enc}.norm1", (f"enc_{i}", "norm1"))
        _lnorm(params, sd, f"{enc}.norm2", (f"enc_{i}", "norm2"))

        dec = f"{tf}transformer_decoder.layers.{i}"
        _mha(params, sd, f"{dec}.self_attn", (f"dec_{i}", "self_attn"))
        _mha(params, sd, f"{dec}.multihead_attn", (f"dec_{i}", "cross_attn"))
        for lin in ("linear1", "linear2"):
            _set(params, (f"dec_{i}", lin, "kernel"),
                 _lin(sd[f"{dec}.{lin}.weight"]))
            _set(params, (f"dec_{i}", lin, "bias"), sd[f"{dec}.{lin}.bias"])
        for n in ("norm1", "norm2", "norm3"):
            _lnorm(params, sd, f"{dec}.{n}", (f"dec_{i}", n))

    # query balancing + link
    qb = f"{p}query_balancing."
    _set(params, ("query_balancing", "not_decoded_query_proj", "kernel"),
         _lin(sd[f"{qb}not_decoded_query_proj.0.weight"]))
    _set(params, ("query_balancing", "decoded_query_proj", "kernel"),
         _lin(sd[f"{qb}decoded_query_proj.0.weight"]))
    _set(params, ("query_balancing", "gate_fc1", "kernel"),
         _lin(sd[f"{qb}gate_proj.0.weight"]))
    _set(params, ("query_balancing", "gate_fc2", "kernel"),
         _lin(sd[f"{qb}gate_proj.2.weight"]))
    _set(params, ("q_to_spatial", "kernel"),
         _lin(sd[f"{p}q_to_spatial.0.weight"]))

    # progressive decoding
    dmap = [("conv1_4", "bn1_4", "c4a"), ("conv2_4", "bn2_4", "c4b"),
            ("conv1_3", "bn1_3", "c3"), ("conv1_2", "bn1_2", "c2"),
            ("conv1_1", "bn1_1", "c1")]
    for conv, bn, dst in dmap:
        _convbn(params, stats, sd, f"{p}decoding.{conv}",
                f"{p}decoding.{bn}", ("decoding", dst))
    _set(params, ("decoding", "classifier", "kernel"),
         _conv2d(sd[f"{p}decoding.classifier.weight"]))
    _set(params, ("decoding", "classifier", "bias"),
         sd[f"{p}decoding.classifier.bias"])
    return params, stats


def convert_lts_decoder(sd: FlatDict, prefix: str = "classifier."):
    """Reference LTSDecoding state_dict -> (params, batch_stats) for
    models.lts.LTSDecoding (lib/mask_predictor.py:147-281)."""
    p = prefix
    params: dict = {}
    stats: dict = {}

    _set(params, ("lang_gen_fc1", "kernel"),
         _lin(sd[f"{p}lang_gen.project.0.weight"]))
    _set(params, ("lang_gen_fc1", "bias"), sd[f"{p}lang_gen.project.0.bias"])
    _set(params, ("lang_gen_fc2", "kernel"),
         _lin(sd[f"{p}lang_gen.project.2.weight"]))
    _set(params, ("lang_gen_fc2", "bias"), sd[f"{p}lang_gen.project.2.bias"])
    _set(params, ("lang_proj", "kernel"), _lin(sd[f"{p}lang_proj.0.weight"]))
    _set(params, ("lang_proj", "bias"), sd[f"{p}lang_proj.0.bias"])

    for name in ("vis_proj", "conv4", "conv3_v", "conv3", "conv2_v"):
        _set(params, (name, "kernel"), _conv2d(sd[f"{p}{name}.0.weight"]))

    _set(params, ("lang_filter", "kernel"), _lin(sd[f"{p}lang_filter.weight"]))
    _set(params, ("lang_filter", "bias"), sd[f"{p}lang_filter.bias"])

    # ASPP: convs.0 = 1x1, convs.1-3 = atrous, convs.4 = pooling, + project
    a = f"{p}aspp."
    _set(params, ("aspp", "conv1x1", "kernel"),
         _conv2d(sd[f"{a}convs.0.0.weight"]))
    _lnorm_bn = lambda src, dst: (
        _set(params, dst + ("scale",), sd[f"{src}.weight"]),
        _set(params, dst + ("bias",), sd[f"{src}.bias"]),
        _set(stats, dst + ("mean",), sd[f"{src}.running_mean"]),
        _set(stats, dst + ("var",), sd[f"{src}.running_var"]))
    _lnorm_bn(f"{a}convs.0.1", ("aspp", "bn1x1"))
    for i in range(3):
        _set(params, ("aspp", f"atrous_{i}", "conv", "kernel"),
             _conv2d(sd[f"{a}convs.{i + 1}.0.weight"]))
        _lnorm_bn(f"{a}convs.{i + 1}.1", ("aspp", f"atrous_{i}", "bn"))
    _set(params, ("aspp", "pool", "conv", "kernel"),
         _conv2d(sd[f"{a}convs.4.1.weight"]))
    _lnorm_bn(f"{a}convs.4.2", ("aspp", "pool", "bn"))
    _set(params, ("aspp", "project", "kernel"),
         _conv2d(sd[f"{a}project.0.weight"]))
    _lnorm_bn(f"{a}project.1", ("aspp", "project_bn"))

    _set(params, ("head", "kernel"), _conv2d(sd[f"{p}conv1_1.weight"]))
    _set(params, ("head", "bias"), sd[f"{p}conv1_1.bias"])
    return params, stats


def convert_lts(sd: FlatDict, cfg: ModelConfig) -> dict:
    """Full reference `lts` checkpoint (backbone + classifier +
    text_encoder, lib/_utils.py:248-273) -> models.lavt.LTS variables."""
    sd = strip_prefixes(sd)
    cls_params, cls_stats = convert_lts_decoder(sd, prefix="classifier.")
    params = {
        "backbone": convert_mm_swin2d(sd, cfg, prefix="backbone."),
        "classifier": cls_params,
        "text_encoder": convert_bert(sd, cfg.bert.num_layers,
                                     prefix="text_encoder."),
    }
    return {"params": params, "batch_stats": {"classifier": cls_stats}}


def convert_vlt(sd: FlatDict, cfg: ModelConfig, nlayers: int = 2) -> dict:
    """Full reference `vlt` / `lavt_vlt` checkpoint
    (lib/_utils.py:278-342) -> models.lavt.VLT variables.  The plain-Swin
    backbone reuses convert_mm_swin2d, which skips the absent fusion/gate
    keys for non-multimodal checkpoints."""
    sd = strip_prefixes(sd)
    cls_params, cls_stats = convert_vlt_decoder(sd, prefix="classifier.",
                                                nlayers=nlayers)
    params = {
        "backbone": convert_mm_swin2d(sd, cfg, prefix="backbone."),
        "classifier": cls_params,
        "text_encoder": convert_bert(sd, cfg.bert.num_layers,
                                     prefix="text_encoder."),
    }
    return {"params": params, "batch_stats": {"classifier": cls_stats}}
