"""VLT decoder ("classifier"): query generation + transformer fusion +
query balancing + progressive decoding.

Behavioral contract: reference lib/vlt.py:12-485
  * VLTFuseAndClassify — multi-scale fuse of (c4, c3, c2) with a
    sentence-vector threshold, then the 4 blocks + 1 link (vlt.py:107-196)
  * PositionalEncoding (interleaved sin/cos)            — vlt.py:203-222
  * TransformerModel (2-layer post-LN encoder/decoder)  — vlt.py:225-263
  * vlt_concat_coords ([x,x,x,y,y,y] channels!)          — vlt.py:267-291
  * QueryGenerationModule (coords conv + MHA over words) — vlt.py:294-357
  * QueryBalancingModule (sigmoid gate)                  — vlt.py:379-405
  * ProgressiveDecoding (3x conv-BN-ReLU + 2x upsample)  — vlt.py:427-485

Layouts: NHWC; queries kept batch-first (B, Q, D) (the reference is
seq-first (Q, B, D) to satisfy torch's nn.Transformer).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.resize import resize_2d


def positional_encoding(n: int, dim: int) -> np.ndarray:
    pos = np.arange(n, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64)
                 * (-np.log(10000.0) / dim))
    pe = np.zeros((n, dim), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


class ConvBN(nn.Module):
    features: int
    kernel: int = 1
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    use_bias=False, padding="SAME", dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class MHA(nn.Module):
    """Multi-head attention with torch key_padding_mask semantics."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None):
        """q: (B, L, D); k, v: (B, S, D); key_padding_mask: (B, S) bool,
        True = ignore."""
        b, lq, _ = q.shape
        s = k.shape[1]
        h, hd = self.heads, self.dim // self.heads
        qp = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(v)
        qp = qp.reshape(b, lq, h, hd).transpose(0, 2, 1, 3)
        kp = kp.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        vp = vp.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhld,bhsd->bhls", qp, kp,
                            preferred_element_type=jnp.float32) / (hd ** 0.5)
        if key_padding_mask is not None:
            neg = jnp.asarray(-jnp.inf, jnp.float32)
            scores = jnp.where(key_padding_mask[:, None, None, :], neg,
                               scores)
        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhls,bhsd->bhld", attn, vp,
                         preferred_element_type=jnp.float32
                         ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer semantics (post-LN, relu FF)."""

    dim: int
    heads: int
    ff: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = MHA(self.dim, self.heads, dtype=self.dtype,
                name="self_attn")(x, x, x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + a)
        y = nn.Dense(self.ff, dtype=self.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="norm2")(x + y)


class TransformerDecoderLayer(nn.Module):
    dim: int
    heads: int
    ff: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory):
        a = MHA(self.dim, self.heads, dtype=self.dtype,
                name="self_attn")(tgt, tgt, tgt)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           name="norm1")(tgt + a)
        a = MHA(self.dim, self.heads, dtype=self.dtype,
                name="cross_attn")(tgt, memory, memory)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           name="norm2")(tgt + a)
        y = nn.Dense(self.ff, dtype=self.dtype, name="linear1")(tgt)
        y = nn.relu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(y)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            name="norm3")(tgt + y)


class QueryGenerationModule(nn.Module):
    visual_dim: int
    dim: int
    num_queries: int = 16
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, l, l_mask):
        """x: (B, H, W, C_v); l: (B, N_l, D_l); l_mask: (B, N_l)."""
        b, h, w, _ = x.shape
        # coords concat [x, x, x, y, y, y] (reference vlt.py:287-289)
        ys = (2.0 * jnp.arange(h, dtype=jnp.float32) / (h - 1.0)) - 1.0
        xs = (2.0 * jnp.arange(w, dtype=jnp.float32) / (w - 1.0)) - 1.0
        xg = jnp.broadcast_to(xs[None, :], (h, w))
        yg = jnp.broadcast_to(ys[:, None], (h, w))
        coords = jnp.stack([xg, xg, xg, yg, yg, yg], axis=-1)
        coords = jnp.broadcast_to(coords[None], (b, h, w, 6)).astype(x.dtype)
        x = jnp.concatenate([x, coords], axis=-1)

        for i in range(3):
            x = ConvBN(self.visual_dim, 3, train=self.train,
                       dtype=self.dtype, name=f"project_1_{i}")(x)
        x = nn.Conv(self.num_queries, (1, 1), use_bias=False,
                    dtype=self.dtype, name="project_2")(x)
        x = x.reshape(b, h * w, self.num_queries)

        # q: spatial dims -> channel dim (Conv1d over h*w channels)
        vis_q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name="project_query")(x.transpose(0, 2, 1))
        vis_q = nn.relu(vis_q)  # (B, Q, dim)

        lp = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                      name="project_lang")(l)
        lp = nn.relu(lp)  # (B, N_l, dim)

        pe_q = jnp.asarray(positional_encoding(self.num_queries, self.dim))
        pe_l = jnp.asarray(positional_encoding(lp.shape[1], self.dim))
        q_in = vis_q + pe_q[None].astype(self.dtype)
        l_in = lp + pe_l[None].astype(self.dtype)

        pad = l_mask.astype(jnp.int32) == 0  # True = padding
        out = MHA(self.dim, 8, dtype=self.dtype, name="query_gen")(
            q_in, l_in, l_in, key_padding_mask=pad)
        return out + vis_q  # (B, Q, dim)


class QueryBalancingModule(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, not_decoded, decoded):
        x = nn.relu(nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                             name="not_decoded_query_proj")(not_decoded))
        y = nn.relu(nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                             name="decoded_query_proj")(decoded))
        yx = jnp.concatenate([y, x], axis=-1)
        g = nn.relu(nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                             name="gate_fc1")(yx))
        g = jax.nn.sigmoid(nn.Dense(1, use_bias=False, dtype=self.dtype,
                                    name="gate_fc2")(g))
        return g * y  # (B, Q, dim)


class ProgressiveDecoding(nn.Module):
    hidden: int
    num_classes: int = 2
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ConvBN(self.hidden, 3, train=self.train, dtype=self.dtype,
                   name="c4a")(x)
        x = ConvBN(self.hidden, 3, train=self.train, dtype=self.dtype,
                   name="c4b")(x)
        for name in ("c3", "c2", "c1"):
            h, w = x.shape[1:3]
            x = resize_2d(x, (2 * h, 2 * w), align_corners=True)
            x = ConvBN(self.hidden, 3, train=self.train, dtype=self.dtype,
                       name=name)(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="classifier")(x)


class VLTFuseAndClassify(nn.Module):
    """(c4, c3, c2) NHWC + language -> logits at H/2 resolution."""

    d_model: int = 256
    nhead: int = 8
    d_hid: int = 256
    nlayers: int = 2
    num_queries: int = 16
    img_size: int = 480
    dropout: float = 0.0
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_c4, x_c3, x_c2, l, l_mask, *,
                 deterministic: bool = True):
        dt = self.dtype
        joint = x_c4.shape[-1]  # 1024 for swin-base
        size = self.img_size // 16

        # sentence vector -> Linear + BatchNorm1d + ReLU
        m = l_mask.astype(jnp.float32)[:, :, None]
        sent = ((l.astype(jnp.float32) * m).sum(1) / m.sum(1)).astype(dt)
        sent = nn.Dense(joint, dtype=dt, name="lang_proj")(sent)
        sent = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                            epsilon=1e-5, dtype=dt, name="lang_proj_bn")(sent)
        sent = nn.relu(sent)

        # bottleneck residual on c4, then sentence-modulate + BN threshold
        y = ConvBN(joint // 2, 1, train=self.train, dtype=dt,
                   name="vis_reduce_1a")(x_c4)
        y = ConvBN(joint, 3, train=self.train, dtype=dt,
                   name="vis_reduce_1b")(y)
        x_c4 = x_c4 + y
        x_mm_c4 = x_c4 * sent[:, None, None, :]
        x_mm_c4 = nn.BatchNorm(use_running_average=not self.train,
                               momentum=0.9, epsilon=1e-5, dtype=dt,
                               name="joint_threshold_bn")(x_mm_c4)
        x_mm_c4 = nn.relu(x_mm_c4)

        up = resize_2d(x_mm_c4, x_c3.shape[1:3], align_corners=True)
        c3p = ConvBN(x_c3.shape[-1], 1, train=self.train, dtype=dt,
                     name="vis_reduce_2")(x_c3)
        fm_mid_query = ConvBN(joint // 2, 1, train=self.train, dtype=dt,
                              name="fuse_1_2")(
            jnp.concatenate([up, c3p], axis=-1))

        # avg-pool c2 down to c3 resolution
        b, h2, w2, c2c = x_c2.shape
        x_c2d = x_c2.reshape(b, h2 // 2, 2, w2 // 2, 2, c2c).mean((2, 4))
        x_c2d = ConvBN(c2c, 1, train=self.train, dtype=dt,
                       name="vis_reduce_3")(x_c2d)
        fm_query = ConvBN(joint // 2, 1, train=self.train, dtype=dt,
                          name="fuse_2_3")(
            jnp.concatenate([fm_mid_query, x_c2d], axis=-1))

        h23 = ConvBN(joint // 4, 1, train=self.train, dtype=dt,
                     name="hallucinate_a")(fm_query)
        h23 = ConvBN(joint // 2, 3, train=self.train, dtype=dt,
                     name="hallucinate_b")(h23)
        fm_mid_tf = jnp.concatenate([h23, fm_mid_query], axis=-1)

        up2 = resize_2d(x_mm_c4, x_c3.shape[1:3], align_corners=True)
        proj = ConvBN(joint // 2, 1, train=self.train, dtype=dt,
                      name="project_again")(fm_mid_tf)
        f_tf = ConvBN(self.d_model, 1, train=self.train, dtype=dt,
                      name="fuse_again")(
            jnp.concatenate([up2, proj], axis=-1))
        f_tf = ConvBN(self.d_model, 1, train=self.train, dtype=dt,
                      name="last_project")(f_tf)

        # 4 blocks + link
        queries = QueryGenerationModule(
            visual_dim=joint // 2, dim=self.d_model,
            num_queries=self.num_queries, train=self.train, dtype=dt,
            name="query_generation")(fm_query, l, l_mask)

        src = f_tf.reshape(b, -1, self.d_model)
        pe = jnp.asarray(positional_encoding(src.shape[1], self.d_model))
        src = src + pe[None].astype(dt)
        for i in range(self.nlayers):
            src = TransformerEncoderLayer(self.d_model, self.nhead,
                                          self.d_hid, dtype=dt,
                                          name=f"enc_{i}")(src)
        pe_q = jnp.asarray(positional_encoding(self.num_queries,
                                               self.d_model))
        tgt = queries + pe_q[None].astype(dt)
        for i in range(self.nlayers):
            tgt = TransformerDecoderLayer(self.d_model, self.nhead,
                                          self.d_hid, dtype=dt,
                                          name=f"dec_{i}")(tgt, src)

        balanced = QueryBalancingModule(self.d_model, dtype=dt,
                                        name="query_balancing")(queries, tgt)

        # link: queries -> spatial map
        out = nn.Dense(size * size, use_bias=False, dtype=dt,
                       name="q_to_spatial")(balanced)  # (B, Q, size*size)
        out = nn.relu(out)
        out = out.reshape(b, self.num_queries, size, size)
        out = out.transpose(0, 2, 3, 1)  # (B, size, size, Q)
        out = ConvBN(self.d_model, 3, train=self.train, dtype=dt,
                     name="spatial_refine")(out)
        return ProgressiveDecoding(self.d_model, train=self.train, dtype=dt,
                                   name="decoding")(out)
