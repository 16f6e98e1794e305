"""Independent PyTorch oracles for golden-parity tests.

These are written from the *documented behavior* of LAVT (SURVEY.md §2) using
plain torch ops — they serve as numeric oracles for the JAX implementation
and intentionally use the reference's state_dict naming contract so the
production converter (lavt_rs_tpu.convert.torch2jax) can be exercised by the
same tests.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class WindowAttentionOracle(nn.Module):
    """W-MSA with relative position bias (LAVT/Swin semantics)."""

    def __init__(self, dim, window, heads):
        super().__init__()
        self.dim, self.window, self.heads = dim, window, heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(window), torch.arange(window), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window - 1
        rel[:, :, 1] += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("relative_position_index", rel.sum(-1))

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(B_, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, h)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.view(-1, h, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


def window_partition_t(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def window_reverse_t(win, ws, H, W):
    B = win.shape[0] // (H * W // ws // ws)
    x = win.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def shift_mask_t(Hp, Wp, ws, shift):
    img = torch.zeros(1, Hp, Wp, 1)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    mw = window_partition_t(img, ws).view(-1, ws * ws)
    am = mw.unsqueeze(1) - mw.unsqueeze(2)
    return am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)


class SwinBlockOracle(nn.Module):
    def __init__(self, dim, heads, window, shift, mlp_ratio=4.0):
        super().__init__()
        self.dim, self.window, self.shift = dim, window, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttentionOracle(dim, window, heads)
        self.norm2 = nn.LayerNorm(dim)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, hidden)
        self.mlp.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        ws, ss = self.window, self.shift
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        pad_r = (ws - W % ws) % ws
        pad_b = (ws - H % ws) % ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        Hp, Wp = H + pad_b, W + pad_r
        if ss > 0:
            x = torch.roll(x, shifts=(-ss, -ss), dims=(1, 2))
            mask = shift_mask_t(Hp, Wp, ws, ss)
        else:
            mask = None
        xw = window_partition_t(x, ws).view(-1, ws * ws, C)
        xw = self.attn(xw, mask)
        x = window_reverse_t(xw.view(-1, ws, ws, C), ws, Hp, Wp)
        if ss > 0:
            x = torch.roll(x, shifts=(ss, ss), dims=(1, 2))
        x = x[:, :H, :W, :].reshape(B, L, C)
        x = shortcut + x
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y


class SpatialImageLanguageAttentionOracle(nn.Module):
    """Visual-query/language-key cross attention with IN norms and the
    1e4-mask softmax trick. Language layout: (B, D_l, N_l) like the ref."""

    def __init__(self, v_in, l_in, key_c, value_c, heads=1):
        super().__init__()
        self.key_c, self.value_c, self.heads = key_c, value_c, heads
        self.f_key = nn.Sequential(nn.Conv1d(l_in, key_c, 1))
        self.f_query = nn.Sequential(nn.Conv1d(v_in, key_c, 1),
                                     nn.InstanceNorm1d(key_c))
        self.f_value = nn.Sequential(nn.Conv1d(l_in, value_c, 1))
        self.W = nn.Sequential(nn.Conv1d(value_c, value_c, 1),
                               nn.InstanceNorm1d(value_c))

    def forward(self, x, l, l_mask):
        B, HW = x.size(0), x.size(1)
        x = x.permute(0, 2, 1)
        l_mask = l_mask.permute(0, 2, 1)  # (B, 1, N_l)
        query = self.f_query(x).permute(0, 2, 1)
        key = self.f_key(l) * l_mask
        value = self.f_value(l) * l_mask
        n_l = value.size(-1)
        h = self.heads
        query = query.reshape(B, HW, h, self.key_c // h).permute(0, 2, 1, 3)
        key = key.reshape(B, h, self.key_c // h, n_l)
        value = value.reshape(B, h, self.value_c // h, n_l)
        l_mask = l_mask.unsqueeze(1)
        sim = torch.matmul(query, key) * (self.key_c ** -0.5)
        sim = sim + (1e4 * l_mask - 1e4)
        sim = F.softmax(sim, dim=-1)
        out = torch.matmul(sim, value.permute(0, 1, 3, 2))
        out = out.permute(0, 2, 1, 3).reshape(B, HW, self.value_c)
        out = self.W(out.permute(0, 2, 1)).permute(0, 2, 1)
        return out


class PWAMOracle(nn.Module):
    def __init__(self, dim, l_in=768, heads=1):
        super().__init__()
        self.vis_project = nn.Sequential(nn.Conv1d(dim, dim, 1), nn.GELU())
        self.image_lang_att = SpatialImageLanguageAttentionOracle(
            dim, l_in, dim, dim, heads)
        self.project_mm = nn.Sequential(nn.Conv1d(dim, dim, 1), nn.GELU())

    def forward(self, x, l, l_mask):
        vis = self.vis_project(x.permute(0, 2, 1))
        lang = self.image_lang_att(x, l, l_mask).permute(0, 2, 1)
        mm = self.project_mm(vis * lang)
        return mm.permute(0, 2, 1)


class SimpleDecodingOracle(nn.Module):
    def __init__(self, c4):
        super().__init__()
        hid = c4 // 2
        self.conv1_4 = nn.Conv2d(c4 + c4 // 2, hid, 3, padding=1, bias=False)
        self.bn1_4 = nn.BatchNorm2d(hid)
        self.conv2_4 = nn.Conv2d(hid, hid, 3, padding=1, bias=False)
        self.bn2_4 = nn.BatchNorm2d(hid)
        self.conv1_3 = nn.Conv2d(hid + c4 // 4, hid, 3, padding=1, bias=False)
        self.bn1_3 = nn.BatchNorm2d(hid)
        self.conv2_3 = nn.Conv2d(hid, hid, 3, padding=1, bias=False)
        self.bn2_3 = nn.BatchNorm2d(hid)
        self.conv1_2 = nn.Conv2d(hid + c4 // 8, hid, 3, padding=1, bias=False)
        self.bn1_2 = nn.BatchNorm2d(hid)
        self.conv2_2 = nn.Conv2d(hid, hid, 3, padding=1, bias=False)
        self.bn2_2 = nn.BatchNorm2d(hid)
        self.conv1_1 = nn.Conv2d(hid, 2, 1)

    def forward(self, c4, c3, c2, c1):
        def up(x, ref):
            if x.size(-2) < ref.size(-2) or x.size(-1) < ref.size(-1):
                return F.interpolate(x, size=ref.shape[-2:], mode="bilinear",
                                     align_corners=True)
            return x

        x = torch.cat([up(c4, c3), c3], 1)
        x = F.relu(self.bn1_4(self.conv1_4(x)))
        x = F.relu(self.bn2_4(self.conv2_4(x)))
        x = torch.cat([up(x, c2), c2], 1)
        x = F.relu(self.bn1_3(self.conv1_3(x)))
        x = F.relu(self.bn2_3(self.conv2_3(x)))
        x = torch.cat([up(x, c1), c1], 1)
        x = F.relu(self.bn1_2(self.conv1_2(x)))
        x = F.relu(self.bn2_2(self.conv2_2(x)))
        return self.conv1_1(x)


def _tpwam_cross_attn(query, key_mod, value_mod, l, l_mask, heads, C):
    """The shared 3D-PWAM attention tail: masked K/V, multi-head scaled dot
    product with the 1e4 mask trick. query: (B, THW, C); l: (B, l_in, N_l);
    l_mask: (B, 1, N_l). Returns (B, THW, C)."""
    B, THW = query.shape[:2]
    key = key_mod(l) * l_mask
    value = value_mod(l) * l_mask
    n_l = value.size(-1)
    h = heads
    query = query.reshape(B, THW, h, C // h).permute(0, 2, 1, 3)
    key = key.reshape(B, h, C // h, n_l)
    value = value.reshape(B, h, C // h, n_l)
    sim = torch.matmul(query, key) * (C ** -0.5)
    sim = sim + (1e4 * l_mask.unsqueeze(1) - 1e4)
    sim = F.softmax(sim, dim=-1)
    lang = torch.matmul(sim, value.permute(0, 1, 3, 2))
    return lang.permute(0, 2, 1, 3).reshape(B, THW, C)


class SepTPWAMInnerOracle(nn.Module):
    """Inner-query-only decoupling: 1x1x1 outer vis conv; parallel t/s
    ConvIN query branches summed; Conv1d+IN W; Conv1d+GELU project_mm."""

    def __init__(self, dim, l_in=768, heads=1, kt=(3, 1, 1), ks=(1, 1, 1)):
        super().__init__()
        self.heads, self.dim = heads, dim
        pt = tuple(k // 2 for k in kt)
        ps = tuple(k // 2 for k in ks)
        self.spatial_vis_project = nn.Sequential(
            nn.Conv3d(dim, dim, 1, 1, 0), nn.GELU())
        self.f_query_t = nn.Sequential(nn.Conv3d(dim, dim, kt, 1, pt),
                                       nn.InstanceNorm3d(dim))
        self.f_query_s = nn.Sequential(nn.Conv3d(dim, dim, ks, 1, ps),
                                       nn.InstanceNorm3d(dim))
        self.f_key = nn.Sequential(nn.Conv1d(l_in, dim, 1))
        self.f_value = nn.Sequential(nn.Conv1d(l_in, dim, 1))
        self.W = nn.Sequential(nn.Conv1d(dim, dim, 1),
                               nn.InstanceNorm1d(dim))
        self.project_mm = nn.Sequential(nn.Conv1d(dim, dim, 1), nn.GELU())

    def forward(self, x, l, l_mask):
        B, D, H, W, C = x.shape
        x = x.permute(0, 4, 1, 2, 3)
        vis = self.spatial_vis_project(x).view(B, C, D * H * W)
        l_mask = l_mask.permute(0, 2, 1)
        query = (self.f_query_t(x) + self.f_query_s(x))
        query = query.permute(0, 2, 3, 4, 1).reshape(B, D * H * W, C)
        lang = _tpwam_cross_attn(query, self.f_key, self.f_value, l, l_mask,
                                 self.heads, C)
        lang = self.W(lang.permute(0, 2, 1))
        mm = self.project_mm(vis * lang)
        return mm.permute(0, 2, 1)


class SepSeqTPWAMOracle(nn.Module):
    """Decoupled sequential (sq->t, own kernel_sq, optional res) + parallel
    spatial branch, for both outer vis projection and inner query; the
    `inner` flavor collapses the outer to a single 1x1x1 conv."""

    def __init__(self, dim, l_in=768, heads=1, kt=(3, 1, 1), ks=(1, 1, 1),
                 ksq=(1, 3, 3), res=False, inner=False):
        super().__init__()
        self.heads, self.dim, self.res, self.inner = heads, dim, res, inner
        pt = tuple(k // 2 for k in kt)
        ps = tuple(k // 2 for k in ks)
        psq = tuple(k // 2 for k in ksq)
        if inner:
            self.spatial_vis_project = nn.Sequential(
                nn.Conv3d(dim, dim, 1, 1, 0), nn.GELU())
        else:
            self.temporal_vis_project_q = nn.Sequential(
                nn.Conv3d(dim, dim, kt, 1, pt), nn.GELU())
            self.spatial_vis_project_q = nn.Sequential(
                nn.Conv3d(dim, dim, ksq, 1, psq), nn.GELU())
            self.spatial_vis_project = nn.Sequential(
                nn.Conv3d(dim, dim, ks, 1, ps), nn.GELU())
        self.f_query_t_q = nn.Sequential(nn.Conv3d(dim, dim, kt, 1, pt),
                                         nn.InstanceNorm3d(dim))
        self.f_query_s_q = nn.Sequential(nn.Conv3d(dim, dim, ksq, 1, psq),
                                         nn.InstanceNorm3d(dim))
        self.f_query_s = nn.Sequential(nn.Conv3d(dim, dim, ks, 1, ps),
                                       nn.InstanceNorm3d(dim))
        self.f_key = nn.Sequential(nn.Conv1d(l_in, dim, 1))
        self.f_value = nn.Sequential(nn.Conv1d(l_in, dim, 1))
        self.W = nn.Sequential(nn.Conv1d(dim, dim, 1),
                               nn.InstanceNorm1d(dim))
        self.project_mm = nn.Sequential(nn.Conv1d(dim, dim, 1), nn.GELU())

    def forward(self, x, l, l_mask):
        B, D, H, W, C = x.shape
        x = x.permute(0, 4, 1, 2, 3)
        if self.inner:
            vis = self.spatial_vis_project(x)
        else:
            s_q = self.spatial_vis_project_q(x)
            t_q = self.temporal_vis_project_q(s_q)
            if self.res:
                t_q = s_q + t_q
            vis = t_q + self.spatial_vis_project(x)
        vis = vis.view(B, C, D * H * W)
        l_mask = l_mask.permute(0, 2, 1)
        q_s_q = self.f_query_s_q(x)
        q_t = self.f_query_t_q(q_s_q)
        if self.res:
            q_t = q_s_q + q_t
        query = q_t + self.f_query_s(x)
        query = query.permute(0, 2, 3, 4, 1).reshape(B, D * H * W, C)
        lang = _tpwam_cross_attn(query, self.f_key, self.f_value, l, l_mask,
                                 self.heads, C)
        lang = self.W(lang.permute(0, 2, 1))
        mm = self.project_mm(vis * lang)
        return mm.permute(0, 2, 1)


class SepTPWAMOracle(nn.Module):
    """SepTPWAM with the A2D defaults: kernel_t, kernel_s branches, sum
    fuse, W and project_mm decomposed into t(3,3,3)+s(1,1,1)."""

    def __init__(self, dim, l_in=768, heads=1, kt=(3, 3, 3), ks=(1, 1, 1)):
        super().__init__()
        self.heads, self.dim = heads, dim
        pt = tuple(k // 2 for k in kt)
        ps = tuple(k // 2 for k in ks)
        self.temporal_vis_project = nn.Sequential(
            nn.Conv3d(dim, dim, kt, 1, pt), nn.GELU())
        self.spatial_vis_project = nn.Sequential(
            nn.Conv3d(dim, dim, ks, 1, ps), nn.GELU())
        self.f_query_t = nn.Sequential(nn.Conv3d(dim, dim, kt, 1, pt),
                                       nn.InstanceNorm3d(dim))
        self.f_query_s = nn.Sequential(nn.Conv3d(dim, dim, ks, 1, ps),
                                       nn.InstanceNorm3d(dim))
        self.f_key = nn.Sequential(nn.Conv1d(l_in, dim, 1))
        self.f_value = nn.Sequential(nn.Conv1d(l_in, dim, 1))
        self.W_t = nn.Sequential(nn.Conv3d(dim, dim, kt, 1, pt),
                                 nn.InstanceNorm3d(dim))
        self.W_s = nn.Sequential(nn.Conv3d(dim, dim, 1, 1, 0),
                                 nn.InstanceNorm3d(dim))
        self.project_mm_t = nn.Sequential(nn.Conv3d(dim, dim, kt, 1, pt),
                                          nn.GELU())
        self.project_mm_s = nn.Sequential(nn.Conv3d(dim, dim, 1, 1, 0),
                                          nn.GELU())

    def forward(self, x, l, l_mask):
        # x: (B, D, H, W, C); l: (B, l_in, N_l); l_mask: (B, N_l, 1)
        B, D, H, W, C = x.shape
        x = x.permute(0, 4, 1, 2, 3)
        ts_vis = (self.temporal_vis_project(x)
                  + self.spatial_vis_project(x)).view(B, C, D * H * W)
        l_mask = l_mask.permute(0, 2, 1)
        query = (self.f_query_t(x) + self.f_query_s(x))
        query = query.permute(0, 2, 3, 4, 1).reshape(B, D * H * W, C)
        key = self.f_key(l) * l_mask
        value = self.f_value(l) * l_mask
        n_l = value.size(-1)
        h = self.heads
        query = query.reshape(B, D * H * W, h, C // h).permute(0, 2, 1, 3)
        key = key.reshape(B, h, C // h, n_l)
        value = value.reshape(B, h, C // h, n_l)
        sim = torch.matmul(query, key) * (C ** -0.5)
        sim = sim + (1e4 * l_mask.unsqueeze(1) - 1e4)
        sim = F.softmax(sim, dim=-1)
        lang = torch.matmul(sim, value.permute(0, 1, 3, 2))
        lang = lang.permute(0, 2, 1, 3).reshape(B, D * H * W, C)
        lang = lang.permute(0, 2, 1).view(B, C, D, H, W)
        lang = (self.W_t(lang) + self.W_s(lang)).view(B, C, D * H * W)
        mm = (ts_vis * lang).view(B, C, D, H, W)
        mm = (self.project_mm_t(mm) + self.project_mm_s(mm)).view(B, C, -1)
        return mm.permute(0, 2, 1)


class BCAMOracle(nn.Module):
    """BRINet bi-directional cross-attention (reference lib/bcam.py:7-72).

    Inputs: x (B, HW, v_in); l (B, l_in, N_l); l_mask (B, N_l, 1).
    hw is the learned relevance-projection size (must equal x's HW)."""

    def __init__(self, dim, v_in, l_in, hw):
        super().__init__()
        self.lang_reduce = nn.Linear(l_in, dim)
        self.vis_1 = nn.Sequential(nn.Linear(v_in, dim), nn.ReLU())
        self.vis_2 = nn.Sequential(nn.Linear(v_in, dim), nn.ReLU())
        self.vis_3 = nn.Sequential(nn.Linear(v_in, dim), nn.ReLU())
        self.vis_4 = nn.Sequential(nn.Linear(v_in, dim), nn.ReLU())
        self.out_1 = nn.Linear(dim, dim)
        self.vis_2_2 = nn.Linear(dim, dim)
        self.a_proj = nn.Linear(dim, hw)
        self.out3_proj = nn.Sequential(nn.Linear(2 * dim, dim), nn.ReLU())

    def forward(self, x, l, l_mask):
        l = self.lang_reduce(l.permute(0, 2, 1))  # (B, N_l, dim)
        l = l.permute(0, 2, 1)  # (B, dim, N_l)

        query = self.vis_1(x)
        sim = torch.matmul(query, l)  # (B, HW, N_l)
        l_mask = l_mask.permute(0, 2, 1)  # (B, 1, N_l)
        sim = sim + (1e4 * l_mask - 1e4)
        sim = F.softmax(sim, dim=-1)
        out = torch.matmul(sim, l.permute(0, 2, 1))  # (B, HW, dim)

        query2 = self.vis_2(x)
        a = torch.tanh(self.out_1(out) + self.vis_2_2(query2))
        a = self.a_proj(a)  # (B, HW, HW)
        rel_map = F.softmax(a, dim=-1)
        query3 = self.vis_3(x)
        out2 = torch.matmul(rel_map, query3)
        out3 = self.out3_proj(torch.cat([out2, out], dim=-1))
        return out3 + self.vis_4(x)


class GACDOracle(nn.Module):
    """GARAN collect-diffuse attention (reference lib/bcam.py:75-127)."""

    def __init__(self, dim, v_in, l_in):
        super().__init__()
        self.dim = dim
        self.lang_gen = nn.Sequential(
            nn.Linear(l_in, v_in), nn.ReLU(), nn.Linear(v_in, v_in))
        self.mm_gen = nn.Sequential(nn.Linear(v_in, dim), nn.ReLU())
        self.query = nn.Linear(dim, dim)
        self.key_c = nn.Linear(v_in, dim)
        self.key_d = nn.Linear(v_in, dim)
        self.value = nn.Linear(v_in, dim)

    def forward(self, x, l, l_mask):
        # LangProject: masked mean-pool over tokens, then 2-layer MLP
        l_mask = l_mask.permute(0, 2, 1)  # (B, 1, N_l)
        pooled = (l * l_mask).sum(dim=-1).div(l_mask.sum(dim=-1))
        s = self.lang_gen(pooled).unsqueeze(1)  # (B, 1, v_in)

        x = s * x
        x = self.mm_gen(x)  # (B, HW, dim)

        query = self.query(s)  # (B, 1, dim)  (requires v_in == dim)
        key_c, key_d = self.key_c(x), self.key_d(x)
        value = self.value(x)

        a_c = torch.matmul(query, key_c.permute(0, 2, 1)) * self.dim ** -0.5
        a_c = F.softmax(a_c, dim=-1)
        a_d = torch.matmul(query, key_d.permute(0, 2, 1)) * self.dim ** -0.5
        a_d = torch.sigmoid(a_d)

        f_col = torch.matmul(a_c, value)  # (B, 1, dim)
        f_dif = torch.matmul(a_d.permute(0, 2, 1), f_col)  # (B, HW, dim)
        return x + f_dif


class EFNAttentionOracle(nn.Module):
    """Mutual HW x HW attention, 2x avg-pool fallback above 225 tokens
    (reference lib/bcam.py:205-269)."""

    def __init__(self, dim):
        super().__init__()
        self.key_channels = dim
        self.f_query = nn.Sequential(
            nn.Conv1d(dim, dim, 1), nn.InstanceNorm1d(dim))
        self.f_key = nn.Sequential(
            nn.Conv1d(dim, dim, 1), nn.InstanceNorm1d(dim))
        self.W = nn.Sequential(
            nn.Conv1d(2 * dim, dim, 3, padding=1), nn.InstanceNorm1d(dim))

    def forward(self, m, l_map):
        # m, l_map: (B, dim, HW)
        b, c, hw = m.shape
        h = w = int(hw ** 0.5)
        m = self.f_query(m)
        l_map = self.f_key(l_map)
        if hw > 225:
            m = F.avg_pool2d(m.view(b, c, h, w), 2).view(b, c, hw // 4)
            l_map = F.avg_pool2d(l_map.view(b, c, h, w), 2).view(b, c, hw // 4)
        sim = torch.matmul(m.permute(0, 2, 1), l_map) * self.key_channels ** -0.5
        s1 = F.softmax(sim, dim=-1)
        s2 = F.softmax(sim, dim=-2).permute(0, 2, 1)
        lp = torch.matmul(s1, l_map.permute(0, 2, 1))
        mp = torch.matmul(s2, m.permute(0, 2, 1))
        out = self.W(torch.cat([lp, mp], dim=-1).permute(0, 2, 1))
        if hw > 225:
            out = F.interpolate(out.view(b, c, h // 2, w // 2),
                                scale_factor=2, mode="bilinear",
                                align_corners=False).view(b, c, hw)
        return out.permute(0, 2, 1)  # (B, HW, dim)


class EFNOracle(nn.Module):
    """Sentence-concat + mutual attention (reference lib/bcam.py:160-201)."""

    def __init__(self, dim, v_in, l_in):
        super().__init__()
        self.project = nn.Sequential(nn.Conv1d(v_in + l_in, dim, 1), nn.GELU())
        self.lang_project = nn.Sequential(nn.Conv1d(l_in, dim, 1), nn.GELU())
        self.image_lang_att = EFNAttentionOracle(dim)

    def forward(self, x, l, l_mask):
        # x (B, HW, v_in); l (B, l_in, N_l); l_mask (B, N_l, 1)
        b, hw = x.size(0), x.size(1)
        l_mask = l_mask.permute(0, 2, 1)  # (B, 1, N_l)
        sent = (l * l_mask).sum(dim=-1).div(l_mask.sum(dim=-1))  # (B, l_in)
        sent = sent.unsqueeze(-1).expand(b, -1, hw)
        x = torch.cat([x.permute(0, 2, 1), sent], dim=1)

        m = self.project(x)  # (B, dim, HW)
        lang = self.lang_project(l) * l_mask  # (B, dim, N_l)

        score = torch.matmul(m.permute(0, 2, 1), lang) * m.size(1) ** -0.5
        score = score + (1e4 * l_mask - 1e4)
        score = F.softmax(score, dim=-1)
        l_map = torch.matmul(score, lang.permute(0, 2, 1)).permute(0, 2, 1)
        return self.image_lang_att(m, l_map)
