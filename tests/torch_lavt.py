"""Full torch LAVT-one oracle, assembled from the component oracles.

Uses the reference's state_dict naming contract (backbone.layers.N...,
classifier.conv1_4..., text_encoder.embeddings...) so the production
converter can ingest its state_dict — giving a full-model parity test and a
PyTorch-CPU throughput baseline without the reference's unavailable deps
(timm/mmcv/mmseg).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_oracles import (
    PWAMOracle, SimpleDecodingOracle, SwinBlockOracle,
)


class PatchEmbedOracle(nn.Module):
    def __init__(self, embed_dim, patch=4):
        super().__init__()
        self.proj = nn.Conv2d(3, embed_dim, patch, patch)
        self.norm = nn.LayerNorm(embed_dim)

    def forward(self, x):
        x = self.proj(x)
        wh, ww = x.shape[2], x.shape[3]
        x = x.flatten(2).transpose(1, 2)
        x = self.norm(x)
        return x, wh, ww


class PatchMergingOracle(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1).view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class MMStageOracle(nn.Module):
    def __init__(self, dim, depth, heads, window, fusion_heads=1,
                 downsample=True):
        super().__init__()
        self.blocks = nn.ModuleList([
            SwinBlockOracle(dim, heads, window,
                            0 if i % 2 == 0 else window // 2)
            for i in range(depth)])
        self.fusion = PWAMOracle(dim, 768, fusion_heads)
        self.res_gate = nn.Sequential(
            nn.Linear(dim, dim, bias=False), nn.ReLU(),
            nn.Linear(dim, dim, bias=False), nn.Tanh())
        nn.init.zeros_(self.res_gate[0].weight)
        nn.init.zeros_(self.res_gate[2].weight)
        self.downsample = PatchMergingOracle(dim) if downsample else None

    def forward(self, x, H, W, l, l_mask):
        for blk in self.blocks:
            x = blk(x, H, W)
        mm = self.fusion(x, l, l_mask)
        x = x + self.res_gate(mm) * mm
        if self.downsample is not None:
            return mm, self.downsample(x, H, W), (H + 1) // 2, (W + 1) // 2
        return mm, x, H, W


class MMBackboneOracle(nn.Module):
    def __init__(self, embed_dim=96, depths=(2, 2, 6, 2),
                 heads=(3, 6, 12, 24), window=7):
        super().__init__()
        self.patch_embed = PatchEmbedOracle(embed_dim)
        self.num_features = [embed_dim * 2**i for i in range(len(depths))]
        self.layers = nn.ModuleList([
            MMStageOracle(self.num_features[i], depths[i], heads[i], window,
                          downsample=i < len(depths) - 1)
            for i in range(len(depths))])
        for i in range(len(depths)):
            self.add_module(f"norm{i}", nn.LayerNorm(self.num_features[i]))

    def forward(self, x, l, l_mask):
        x, H, W = self.patch_embed(x)
        outs = []
        for i, layer in enumerate(self.layers):
            x_out, x, Hn, Wn = layer(x, H, W, l, l_mask)
            x_out = getattr(self, f"norm{i}")(x_out)
            outs.append(x_out.view(-1, H, W, self.num_features[i])
                        .permute(0, 3, 1, 2).contiguous())
            H, W = Hn, Wn
        return tuple(outs)


class LAVTOneOracle(nn.Module):
    def __init__(self, embed_dim=96, depths=(2, 2, 6, 2),
                 heads=(3, 6, 12, 24), window=7, bert_cfg=None):
        super().__init__()
        from transformers import BertConfig as HFConfig, BertModel

        self.backbone = MMBackboneOracle(embed_dim, depths, heads, window)
        self.classifier = SimpleDecodingOracle(8 * embed_dim)
        hf_cfg = bert_cfg or HFConfig(attn_implementation="eager",
                                      hidden_act="gelu")
        self.text_encoder = BertModel(hf_cfg)
        self.text_encoder.pooler = None

    def forward(self, x, text, l_mask):
        input_shape = x.shape[-2:]
        l_feats = self.text_encoder(text, attention_mask=l_mask)[0]
        l_feats = l_feats.permute(0, 2, 1)
        l_mask3 = l_mask.unsqueeze(-1).float()
        c1, c2, c3, c4 = self.backbone(x, l_feats, l_mask3)
        out = self.classifier(c4, c3, c2, c1)
        return F.interpolate(out, input_shape, mode="bilinear",
                             align_corners=True)
