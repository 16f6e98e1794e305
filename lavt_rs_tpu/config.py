"""Typed configuration for the LAVT-RS TPU framework.

Replaces the reference's single ~80-flag argparse Namespace (reference:
args.py:4-255) with explicit, typed, hashable dataclasses.  Every constructor
in the reference receives the full Namespace; here each subsystem receives
only the config it needs, and configs are hashable so they can be closed over
by jitted functions without retracing hazards.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple

import jax.numpy as jnp


class FusionKind(str, enum.Enum):
    """Which per-stage language fusion module to use.

    Mirrors the reference's mutually exclusive flags (reference:
    lib/backbone.py:576-601): PWAM (default), BCAM, GACD, EFN, and the
    `--fuse simple` LangProject ablation.
    """

    PWAM = "pwam"
    SIMPLE = "simple"  # LangProject masked-meanpool ablation (--fuse simple)
    BCAM = "bcam"
    GACD = "gacd"
    EFN = "efn"


class GateKind(str, enum.Enum):
    """Language-gate residual variants (reference: lib/backbone.py:598-623,
    args.py:220-228 `--version`)."""

    DEFAULT = "default"  # zero-init 2-layer MLP gate, x + gate(mm) * mm
    NO_GATE = "no_gate"  # x + mm
    NONE = "none"  # no residual fusion add at all


class AttnNorm(str, enum.Enum):
    """Normalization inside SpatialImageLanguageAttention f_query / W
    (reference: lib/backbone.py:1296-1302, args.py:8)."""

    IN = "IN"  # InstanceNorm1d (affine=False) — the published default
    BN = "BN"
    LN = "LN"
    NONE = "none"


class LGAct(str, enum.Enum):
    TANH = "tanh"
    SIGMOID = "sigmoid"


class StageOutput(str, enum.Enum):
    """What each multimodal stage hands to the decoder (reference:
    lib/backbone.py:673-686)."""

    RESIDUAL = "residual"  # default: the PWAM output `x_residual`
    HIDDEN = "hidden"  # --hs: the gated hidden state x
    LAZY = "lazy"  # --lazy_pred: pre-fusion x (and stage 1 is skipped)


class TPWAMKind(str, enum.Enum):
    """3D PWAM family selector — replaces 8 boolean flags (reference:
    lib/video_swin_transformer.py:1061-2089, args.py)."""

    PWAM2D = "pwam2d"  # plain 2D PWAM applied on flattened THW tokens
    TS = "ts"  # TSPWAM: parallel spatial+temporal PWAMs
    T = "t"  # TPWAM: single 3D-conv PWAM
    T_COMP = "t_comp"  # TPWAMComp: all-3D-conv projections
    SEP = "sep"  # SepTPWAM: decoupled t/s branches (published default)
    SEP_INNER = "sep_inner"  # SepTPWAMInner: inner-query-only decoupling
    SEQ = "seq"  # SeqTPWAM: P3D-A sequential s->t
    SEP_SEQ = "sep_seq"  # SepSeqTPWAM
    SEP_SEQ_INNER = "sep_seq_inner"  # SepSeqTPWAMInner


class BranchFuse(str, enum.Enum):
    """How SepTPWAM fuses its temporal and spatial branches
    (reference: lib/video_swin_transformer.py:1300-1584)."""

    SUM = "sum"
    SUM_CONV = "sum_conv"
    CAT = "cat"  # concat + 1x1x1 reduce


# Swin size table (reference: lib/segmentation.py:16-33).
SWIN_SIZES = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    "large": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48)),
}


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """Swin backbone hyperparameters (2D and 3D share this)."""

    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 12  # 2D window; 7 or 12
    patch_size: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.3
    ape: bool = False
    patch_norm: bool = True
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    # Video (3D) extras; ignored by the 2D backbone.
    window_size_3d: Tuple[int, int, int] = (8, 7, 7)
    patch_size_3d: Tuple[int, int, int] = (1, 4, 4)

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * 2**i for i in range(self.num_layers))

    @staticmethod
    def from_size(size: str, window_size: int = 12, **kw) -> "SwinConfig":
        table = SWIN_SIZES[size]
        return SwinConfig(
            embed_dim=table["embed_dim"],
            depths=table["depths"],
            num_heads=table["num_heads"],
            window_size=window_size,
            **kw,
        )


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """PWAM / language-gate configuration, shared across stages."""

    kind: FusionKind = FusionKind.PWAM
    gate: GateKind = GateKind.DEFAULT
    lg_act: LGAct = LGAct.TANH
    att_norm: AttnNorm = AttnNorm.IN
    num_heads: Tuple[int, ...] = (1, 1, 1, 1)  # per stage (--mha)
    dropout: float = 0.0  # --fusion_drop
    lang_dim: int = 768  # BERT hidden size
    stage_output: StageOutput = StageOutput.RESIDUAL


@dataclasses.dataclass(frozen=True)
class TPWAMConfig:
    """3D-PWAM variant configuration (video models)."""

    kind: TPWAMKind = TPWAMKind.SEP
    # Conv3d kernel sizes as (D, H, W) for temporal / spatial branches
    # (reference default for A2D: t=3-3-3, s=1-1-1, README.md:185).
    kernel_t: Tuple[int, int, int] = (3, 3, 3)
    kernel_s: Tuple[int, int, int] = (1, 1, 1)
    # Spatial kernel of the decoupled *sequential* branch in the sep-seq
    # variants (reference --conv3d_kernel_size_sq, default 1-3-3).
    kernel_sq: Tuple[int, int, int] = (1, 3, 3)
    branch_fuse: BranchFuse = BranchFuse.SUM
    # Kernel for the sum-conv / cat-reduce branch fuse (reference
    # --sept_sum_3_kernel_size / --sept_cat_reduce_kernel_size); None
    # falls back to kernel_t.
    fuse_kernel: Optional[Tuple[int, int, int]] = None
    self_gate: bool = False  # (1 + tanh) self-gates on each branch
    w_t3x3_s1x1: bool = True  # decompose out-proj W into W_t + W_s
    mm_t3x3_s1x1: bool = True  # decompose project_mm into t + s branches
    # Single-conv W / project_mm ablations (reference --w_3/--w_3x3/
    # --mm_3/--mm_3x3): "3" = Conv3d (1,3,3); "3x3" = Conv3d kernel_t.
    # Take precedence over the t3x3_s1x1 decompositions, like the
    # reference's if/elif chain (video_swin_transformer.py:1424-1474).
    w_single_conv: Optional[str] = None
    mm_single_conv: Optional[str] = None
    seq_residual: bool = False  # P3D-C residual for SeqTPWAM (--res)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """BERT-base-uncased (HF transformers v3.0.2 contract,
    reference vendored `bert/` per README.md:9-13)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attn_dropout: float = 0.1
    # How many encoder layers receive gradients during finetuning
    # (reference: train.py:634-686 `--lang_enc_params`, default first 10).
    trainable_layers: int = 10


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """A complete LAVT model: backbone + fusion + decoder + text encoder."""

    name: str = "lavt_one"  # lavt | lavt_one | lavt_video | lts | vlt | lavt_vlt
    swin: SwinConfig = dataclasses.field(default_factory=SwinConfig)
    fusion: FusionConfig = dataclasses.field(default_factory=FusionConfig)
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    tpwam: TPWAMConfig = dataclasses.field(default_factory=TPWAMConfig)
    num_classes: int = 2
    img_size: int = 480
    max_tokens: int = 20  # 22 for video / combined pretraining
    lazy_pred: bool = False
    interpolate_before_seg: bool = False
    seg_last: bool = False
    # Video
    num_frames: int = 8
    hybrid_2d_3d: bool = False  # --ytvos_2d_swin_3d_pwam: 2D Swin + 3D PWAM
    use_checkpoint: bool = False  # jax.checkpoint per Swin block
    # Compute dtype for activations; params stay float32.
    dtype: str = "float32"
    use_pallas: bool = False  # fused Pallas window-attention path

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def out_indices(self) -> Tuple[int, ...]:
        return (1, 2, 3) if self.lazy_pred else self.swin.out_indices

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


def lavt_one_base(window12: bool = True, **kw) -> ModelConfig:
    """The published headline config: lavt_one, Swin-B, 480², window 12."""
    swin = SwinConfig.from_size("base", window_size=12 if window12 else 7)
    return ModelConfig(name="lavt_one", swin=swin, **kw)


def lavt_one_tiny(window12: bool = False, **kw) -> ModelConfig:
    swin = SwinConfig.from_size("tiny", window_size=12 if window12 else 7)
    return ModelConfig(name="lavt_one", swin=swin, **kw)


def lavt_video_tiny(**kw) -> ModelConfig:
    """A2D recipe: Video Swin-T, SepTPWAM t=3-3-3 s=1-1-1 (README.md:185)."""
    swin = SwinConfig.from_size("tiny", window_size=7, drop_path_rate=0.1)
    return ModelConfig(name="lavt_video", swin=swin, max_tokens=22, **kw)
