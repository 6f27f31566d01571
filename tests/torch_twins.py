"""Parametrized PyTorch twins of every UFM-TPU module, with the reference
checkpoint naming.

These twins are the checkpoint-fidelity oracle in a zero-egress environment
(the real `infinity1096/UFM-*` weights and the UniCeption submodule are
unreachable — SURVEY.md §2.9): each twin implements the same math as its flax
counterpart in independent torch code, and names its parameters the way the
reference checkpoints do (`encoder.model.*` DINOv2 wrapper per ufm.py:208-210,
`head1.0.0/.0.1` Sequential nesting per ufm.py:262-273, UNet `downs/ups/
conv.N/final_conv` per unet_encoder.py:26-71, Lightning `model.` prefixes per
ufm.py:198-217). A state_dict produced here, pushed through the production
converter, must reproduce the flax forward bit-for-bit (up to float
accumulation order) — the strongest available stand-in for loading the
released weights.

Where the reference's UniCeption internals are unknowable (info-sharing
transformer internals, DPT internals), the twin pins the *documented contract*
this framework's converter implements, so converter and model can never
silently diverge.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F

__all__ = [
    "TorchBlock",
    "TorchDinoViT",
    "TorchInfoSharing",
    "TorchDPTFeature",
    "TorchDPTProcessor",
    "TorchAdaptorMap",
    "TORCH_ADAPTORS",
    "TorchMLPFeature",
    "TorchDoubleConv",
    "TorchUNet",
    "TorchUFMTwin",
    "lightning_checkpoint",
]


# --------------------------------------------------------------------------
# transformer primitives (timm/DINOv2 naming: attn.qkv/attn.proj, mlp.fc1/fc2,
# ls1/ls2.gamma)
# --------------------------------------------------------------------------
class TorchBlock(nn.Module):
    def __init__(self, dim: int, heads: int, mlp_ratio: float = 4.0, layerscale: float | None = None):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.has_ls = layerscale is not None
        if self.has_ls:
            self.ls1 = nn.Module()
            self.ls1.gamma = nn.Parameter(torch.full((dim,), layerscale))
            self.ls2 = nn.Module()
            self.ls2.gamma = nn.Parameter(torch.full((dim,), layerscale))

    def forward(self, x):
        b, s, c = x.shape
        hd = c // self.heads
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, s, 3, self.heads, hd)
        q, k, v = (qkv[:, :, i].permute(0, 2, 1, 3) for i in range(3))
        att = torch.softmax(q @ k.transpose(-1, -2) * hd**-0.5, dim=-1)
        h = self.attn.proj((att @ v).permute(0, 2, 1, 3).reshape(b, s, c))
        x = x + (h * self.ls1.gamma if self.has_ls else h)
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + (h * self.ls2.gamma if self.has_ls else h)


class TorchDinoViT(nn.Module):
    """DINOv2/timm checkpoint layout: patch_embed.proj, cls_token, combined
    cls+grid pos_embed, mask_token (dropped at load), blocks.N, norm.

    Returns the tapped feature levels as (B, C, hp, wp) maps. The input grid
    must equal ``grid`` (no pos-embed interpolation in the twin).
    """

    def __init__(
        self,
        dim: int,
        depth: int,
        heads: int,
        grid: int,
        patch: int = 14,
        layerscale: float | None = 1e-5,
        taps: Sequence[int] = (-1,),
        norm_intermediate: bool = True,
    ):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + grid * grid, dim) * 0.02)
        self.mask_token = nn.Parameter(torch.zeros(1, dim))
        self.blocks = nn.ModuleList([TorchBlock(dim, heads, layerscale=layerscale) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.taps = tuple(t % depth for t in taps)
        self.norm_intermediate = norm_intermediate

    def forward(self, img_bchw) -> List[torch.Tensor]:
        x = self.patch_embed.proj(img_bchw)
        b, c, hp, wp = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1) + self.pos_embed
        tapped: Dict[int, torch.Tensor] = {}
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self.taps:
                tapped[i] = x
        levels = []
        for t in self.taps:
            f = self.norm(tapped[t]) if self.norm_intermediate else tapped[t]
            levels.append(f[:, 1:].transpose(1, 2).reshape(b, c, hp, wp))
        return levels


# --------------------------------------------------------------------------
# info-sharing transformer (framework contract: input_proj, view_embed,
# sin-cos 2D positions, blocks.N, norm; joint attention over both views)
# --------------------------------------------------------------------------
def _torch_sincos_2d(h: int, w: int, dim: int) -> torch.Tensor:
    assert dim % 4 == 0
    quarter = dim // 4
    omega = 1.0 / (10000.0 ** (torch.arange(quarter, dtype=torch.float64) / quarter))
    ys, xs = torch.meshgrid(
        torch.arange(h, dtype=torch.float64), torch.arange(w, dtype=torch.float64), indexing="ij"
    )
    parts = []
    for g in (ys.reshape(-1), xs.reshape(-1)):
        ang = torch.outer(g, omega)
        parts.extend([torch.sin(ang), torch.cos(ang)])
    return torch.cat(parts, dim=1).float()


class TorchInfoSharing(nn.Module):
    def __init__(
        self,
        input_dim: int,
        dim: int,
        depth: int,
        heads: int,
        taps: Sequence[int] = (5, 8),
        mlp_ratio: float = 4.0,
        num_views: int = 2,
        norm_intermediate: bool = True,
    ):
        super().__init__()
        self.dim = dim
        self.num_views = num_views
        if input_dim != dim:
            self.input_proj = nn.Linear(input_dim, dim)
        self.view_embed = nn.Parameter(torch.randn(num_views, dim) * 0.02)
        self.blocks = nn.ModuleList([TorchBlock(dim, heads, mlp_ratio=mlp_ratio) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.taps = tuple(t % depth for t in taps)
        self.norm_intermediate = norm_intermediate

    def forward(self, views: List[torch.Tensor]):
        """views: per-view (B, C, hp, wp). Returns (final, [tap0, tap1]),
        each a list of per-view (B, dim, hp, wp) maps."""
        b, _, hp, wp = views[0].shape
        s = hp * wp
        tokens = torch.stack([v.flatten(2).transpose(1, 2) for v in views], dim=1)  # (B, V, S, C)
        if hasattr(self, "input_proj"):
            tokens = self.input_proj(tokens)
        tokens = tokens + self.view_embed[None, :, None, :]
        tokens = tokens + _torch_sincos_2d(hp, wp, self.dim)[None, None]
        x = tokens.reshape(b, self.num_views * s, self.dim)

        def split(y):
            y = y.reshape(b, self.num_views, hp, wp, self.dim)
            return [y[:, v].permute(0, 3, 1, 2) for v in range(self.num_views)]

        tapped: Dict[int, torch.Tensor] = {}
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in self.taps:
                tapped[i] = self.norm(x) if self.norm_intermediate else x
        return split(self.norm(x)), [split(tapped[t]) for t in self.taps]


# --------------------------------------------------------------------------
# DPT head (framework contract: proj_i, resize_{0,1,3}, scratch_i,
# fusion_i.{rcu_skip,rcu}.{conv1,conv2} + fusion_i.project; processor
# conv1/conv2/conv3)
# --------------------------------------------------------------------------
class _TorchRCU(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv1 = nn.Conv2d(dim, dim, 3, padding=1)
        self.conv2 = nn.Conv2d(dim, dim, 3, padding=1)

    def forward(self, x):
        return x + self.conv2(F.relu(self.conv1(F.relu(x))))


class _TorchFusion(nn.Module):
    def __init__(self, dim, has_skip=True):
        super().__init__()
        if has_skip:  # the top level (fusion_3) fuses nothing — no skip RCU
            self.rcu_skip = _TorchRCU(dim)
        self.rcu = _TorchRCU(dim)
        self.project = nn.Conv2d(dim, dim, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            if x.shape[-2:] != skip.shape[-2:]:
                x = F.interpolate(x, size=skip.shape[-2:], mode="bilinear", align_corners=True)
            x = x + self.rcu_skip(skip)
        x = self.rcu(x)
        x = F.interpolate(x, size=(x.shape[-2] * 2, x.shape[-1] * 2), mode="bilinear", align_corners=True)
        return self.project(x)


class TorchDPTFeature(nn.Module):
    def __init__(self, input_dims: Sequence[int], proj_dims: Sequence[int], feature_dim: int):
        super().__init__()
        for i, (d, p) in enumerate(zip(input_dims, proj_dims)):
            setattr(self, f"proj_{i}", nn.Conv2d(d, p, 1))
            setattr(self, f"scratch_{i}", nn.Conv2d(p, feature_dim, 3, padding=1, bias=False))
        self.resize_0 = nn.ConvTranspose2d(proj_dims[0], proj_dims[0], 4, stride=4)
        self.resize_1 = nn.ConvTranspose2d(proj_dims[1], proj_dims[1], 2, stride=2)
        self.resize_3 = nn.Conv2d(proj_dims[3], proj_dims[3], 3, stride=2, padding=1)
        for i in range(4):
            setattr(self, f"fusion_{i}", _TorchFusion(feature_dim, has_skip=i != 3))

    def forward(self, levels: List[torch.Tensor]) -> torch.Tensor:
        outs = []
        for i, f in enumerate(levels):
            f = getattr(self, f"proj_{i}")(f)
            if i in (0, 1):
                f = getattr(self, f"resize_{i}")(f)
            elif i == 3:
                f = self.resize_3(f)
            outs.append(getattr(self, f"scratch_{i}")(f))
        l0, l1, l2, l3 = outs
        x = self.fusion_3(l3)
        x = self.fusion_2(x, l2)
        x = self.fusion_1(x, l1)
        return self.fusion_0(x, l0)


class TorchDPTProcessor(nn.Module):
    def __init__(self, input_dim: int, hidden_dims: Tuple[int, int], output_dim: int):
        super().__init__()
        self.conv1 = nn.Conv2d(input_dim, hidden_dims[0], 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_dims[0], hidden_dims[1], 3, padding=1)
        self.conv3 = nn.Conv2d(hidden_dims[1], output_dim, 1)

    def forward(self, x, target_hw: Tuple[int, int]):
        x = self.conv1(x)
        x = F.interpolate(x, size=target_hw, mode="bilinear", align_corners=True)
        return self.conv3(F.relu(self.conv2(x)))


# --------------------------------------------------------------------------
# adaptors (parameter-free; channel-first). The AdaptorMap consumes the raw
# regression channels in adaptor list order — the documented channel-split
# contract shared with ufm_tpu.nn.prediction_heads.base.AdaptorMap.
# --------------------------------------------------------------------------
class _Out(dict):
    __getattr__ = dict.__getitem__


def _flow_adaptor(x):
    return _Out(value=x)


def _flow_conf_adaptor(x):
    return _Out(value=x[:, :2], confidence=torch.sigmoid(x[:, 2]))


def _mask_adaptor(x):
    return _Out(mask=torch.sigmoid(x[:, 0]), logits=x[:, 0])


def _confidence_adaptor(x):
    return _Out(value=torch.sigmoid(x))


def _covariance2d_adaptor(x):
    a = torch.clamp(x[:, 0], -10.0, 10.0)
    b = torch.clamp(x[:, 1], -10.0, 10.0)
    rho = torch.tanh(x[:, 2]) * 0.999
    var_x, var_y = torch.exp(a), torch.exp(b)
    cov_xy = rho * torch.exp(0.5 * (a + b))
    one_m = 1.0 - rho * rho
    det = var_x * var_y * one_m
    return _Out(
        covariance=torch.stack([var_x, var_y, cov_xy], dim=1),
        inv_covariance=torch.stack([var_y / det, var_x / det, -cov_xy / det], dim=1),
        log_det=a + b + torch.log(one_m),
    )


TORCH_ADAPTORS = {
    "FlowAdaptor": (_flow_adaptor, 2),
    "FlowWithConfidenceAdaptor": (_flow_conf_adaptor, 3),
    "MaskAdaptor": (_mask_adaptor, 1),
    "ConfidenceAdaptor": (_confidence_adaptor, 1),
    "Covariance2DAdaptor": (_covariance2d_adaptor, 3),
}


class TorchAdaptorMap(nn.Module):
    """Channel-split in insertion order of ``adaptors_kwargs`` — the contract
    this framework's converter+model implement (ufm.py:275-289 consumption)."""

    def __init__(self, adaptors_kwargs: Dict[str, Dict]):
        super().__init__()
        self.specs = [(name, *TORCH_ADAPTORS[spec["class"]]) for name, spec in adaptors_kwargs.items()]

    def forward(self, x):
        out, off = {}, 0
        for name, fn, ch in self.specs:
            out[name] = fn(x[:, off : off + ch])
            off += ch
        assert off == x.shape[1], f"adaptor channels {off} != head output {x.shape[1]}"
        return out


# --------------------------------------------------------------------------
# patch-MLP classification head (framework contract: fc{i}, fc_out,
# depth-to-space unshuffle)
# --------------------------------------------------------------------------
class TorchMLPFeature(nn.Module):
    def __init__(self, input_dim: int, hidden_dims: Sequence[int], output_dim: int, patch_size: int):
        super().__init__()
        d = input_dim
        for i, h in enumerate(hidden_dims):
            setattr(self, f"fc{i}", nn.Linear(d, h))
            d = h
        self.fc_out = nn.Linear(d, patch_size * patch_size * output_dim)
        self.n_hidden = len(hidden_dims)
        self.p = patch_size
        self.out_dim = output_dim

    def forward(self, x_bchw):
        b, _, hp, wp = x_bchw.shape
        x = x_bchw.permute(0, 2, 3, 1)
        for i in range(self.n_hidden):
            x = F.gelu(getattr(self, f"fc{i}")(x))
        x = self.fc_out(x)
        p, oc = self.p, self.out_dim
        x = x.reshape(b, hp, wp, p, p, oc).permute(0, 1, 3, 2, 4, 5).reshape(b, hp * p, wp * p, oc)
        return x.permute(0, 3, 1, 2)


# --------------------------------------------------------------------------
# UNet with the reference's exact naming (unet_encoder.py:26-71)
# --------------------------------------------------------------------------
class TorchDoubleConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(cout, cout, 3, padding=1), nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.conv(x)


class TorchUNet(nn.Module):
    def __init__(self, in_channels=3, out_channels=16, features=(64, 128, 256, 512)):
        super().__init__()
        self.downs = nn.ModuleList()
        self.ups = nn.ModuleList()
        c = in_channels
        for f in features:
            self.downs.append(TorchDoubleConv(c, f))
            c = f
        self.pool = nn.MaxPool2d(2, 2)
        self.bottleneck = TorchDoubleConv(features[-1], features[-1] * 2)
        for f in reversed(features):
            self.ups.append(nn.ConvTranspose2d(f * 2, f, 2, stride=2))
            self.ups.append(TorchDoubleConv(f * 2, f))
        self.final_conv = nn.Conv2d(features[0], out_channels, 1)

    def forward(self, x):
        skips = []
        for d in self.downs:
            x = d(x)
            skips.append(x)
            x = self.pool(x)
        x = self.bottleneck(x)
        skips = skips[::-1]
        for i in range(0, len(self.ups), 2):
            x = self.ups[i](x)
            if x.shape[-2:] != skips[i // 2].shape[-2:]:
                x = F.interpolate(x, size=skips[i // 2].shape[-2:])
            x = torch.cat((skips[i // 2], x), dim=1)
            x = self.ups[i + 1](x)
        return self.final_conv(x)


# --------------------------------------------------------------------------
# the full twin
# --------------------------------------------------------------------------
def _torch_refinement(flow_b2hw, q_bchw, f_bchw, bias, temperature, p):
    """Reference refinement semantics (ufm.py:1041-1178): bicubic P×P window
    grid_sample + 1×P² attention over integer offsets."""
    r = (p - 1) // 2
    b, c, h, w = f_bchw.shape
    ys, xs = torch.meshgrid(torch.arange(h).float(), torch.arange(w).float(), indexing="ij")
    base = torch.stack([xs, ys], dim=0)[None]  # (1, 2, H, W) xy
    pos = flow_b2hw + base  # (B, 2, H, W)

    i_off, j_off = torch.meshgrid(torch.arange(-r, r + 1), torch.arange(-r, r + 1), indexing="ij")
    offs_xy = torch.stack([j_off, i_off], dim=-1).float()  # (P, P, 2) xy

    coords = pos.permute(0, 2, 3, 1)[:, :, :, None, None, :] + offs_xy[None, None, None]
    grid = (coords + 0.5) / torch.tensor([w, h]).float() * 2.0 - 1.0
    sampled = F.grid_sample(
        f_bchw, grid.reshape(b, h, w * p * p, 2), mode="bicubic", padding_mode="zeros", align_corners=False
    ).reshape(b, c, h, w, p, p)

    scores = torch.einsum("bchw,bchwij->bhwij", q_bchw, sampled)
    scores = scores / temperature + bias.reshape(p, p)
    flat = scores.reshape(b, h, w, p * p)
    attn = torch.softmax(flat, dim=-1)
    log_softmax = torch.log_softmax(flat, dim=-1).reshape(b, h, w, p, p)
    residual = (attn @ offs_xy.reshape(p * p, 2)).permute(0, 3, 1, 2)  # (B, 2, H, W)
    return residual, log_softmax


class TorchUFMTwin(nn.Module):
    """Full-model twin of :class:`ufm_tpu.models.network.UFMNet`, built from
    the same :class:`UFMArchConfig`, with reference checkpoint naming."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ek = cfg.encoder_kwargs
        self.encoder = nn.Module()
        self.encoder.model = TorchDinoViT(
            dim=ek.get("embed_dim", 1024),
            depth=ek.get("depth", 24),
            heads=ek.get("num_heads", 16),
            grid=ek.get("pretrain_grid_size", 37),
            patch=ek.get("patch_size", 14),
            layerscale=ek.get("layerscale_init", 1e-5),
            taps=tuple(ek.get("intermediate_layer_idx", (ek.get("depth", 24) - 1,))),
        )
        ik = cfg.info_sharing_kwargs
        self.info_sharing = TorchInfoSharing(
            input_dim=ik.get("input_embed_dim", 1024),
            dim=ik.get("dim", 768),
            depth=ik.get("depth", 12),
            heads=ik.get("num_heads", 12),
            taps=tuple(ik.get("intermediate_layer_idx", (5, 8))),
        )

        def make_dpt(head_kwargs, adaptors_kwargs):
            fk, pk = head_kwargs["dpt_feature"], head_kwargs["dpt_processor"]
            return nn.Sequential(
                nn.Sequential(
                    TorchDPTFeature(fk["input_dims"], fk["proj_dims"], fk["feature_dim"]),
                    TorchDPTProcessor(pk["input_dim"], tuple(pk["hidden_dims"]), pk["output_dim"]),
                ),
                TorchAdaptorMap(adaptors_kwargs),
            )

        self.head1 = make_dpt(cfg.feature_head_kwargs, cfg.adaptors_kwargs)
        if cfg.has_uncertainty_head:
            self.uncertainty_head = make_dpt(cfg.uncertainty_head_kwargs, cfg.uncertainty_adaptors_kwargs)
        if cfg.has_classification_head:
            ck = cfg.classification_head_kwargs
            self.classification_head = TorchMLPFeature(
                ck["input_feature_dim"], tuple(ck["hidden_dims"]), ck["output_dim"], ck["patch_size"]
            )
            p = cfg.refinement_range
            self.classification_bias = nn.Parameter(torch.zeros(p * p))
            if cfg.use_unet_feature:
                uk = cfg.unet_kwargs
                self.unet_feature = TorchUNet(
                    3, uk.get("out_channels", 16), tuple(uk.get("features", (64, 128, 256, 512)))
                )
                oc = ck["output_dim"]
                self.conv1 = nn.Conv2d(oc + self.unet_feature.final_conv.out_channels, 2 * oc, 1)
                self.conv2 = nn.Conv2d(2 * oc, oc, 1)

    def _run_dpt(self, head, pyramid, target_hw):
        fused = head[0][0](pyramid)
        return head[1](head[0][1](fused, target_hw))

    @torch.no_grad()
    def forward(self, img1, img2) -> Dict[str, torch.Tensor]:
        """img1/img2: (B, 3, H, W) normalized. Returns the UFMNet raw output
        dict (BCHW / (B,H,W) fields)."""
        cfg = self.cfg
        b = img1.shape[0]
        target_hw = tuple(img1.shape[-2:])
        levels = self.encoder.model(torch.cat([img1, img2], dim=0))
        feat1 = [lv[:b] for lv in levels]
        feat2 = [lv[b:] for lv in levels]

        final, taps = self.info_sharing([feat1[-1], feat2[-1]])
        pyr1 = [feat1[-1].float(), taps[0][0].float(), taps[1][0].float(), final[0].float()]

        out: Dict[str, torch.Tensor] = {}
        head1_out = self._run_dpt(self.head1, pyr1, target_hw)
        flow = head1_out["flow"].value

        if "flow_cov" in head1_out:
            out["flow_cov"] = head1_out["flow_cov"].covariance
            out["flow_cov_inv"] = head1_out["flow_cov"].inv_covariance
            out["flow_cov_log_det"] = head1_out["flow_cov"].log_det
        if "non_occluded_mask" in head1_out:
            out["covis_mask"] = head1_out["non_occluded_mask"].mask
            out["covis_logits"] = head1_out["non_occluded_mask"].logits

        if cfg.has_uncertainty_head:
            unc = self._run_dpt(self.uncertainty_head, pyr1, target_hw)
            if "flow_cov" in unc:
                out["flow_cov"] = unc["flow_cov"].covariance
                out["flow_cov_inv"] = unc["flow_cov"].inv_covariance
                out["flow_cov_log_det"] = unc["flow_cov"].log_det
            if "keypoint_confidence" in unc:
                out["keypoint_confidence"] = unc["keypoint_confidence"].value[:, 0]
            if "non_occluded_mask" in unc:
                out["covis_mask"] = unc["non_occluded_mask"].mask
                out["covis_logits"] = unc["non_occluded_mask"].logits

        if cfg.has_classification_head:
            cls_in1 = torch.cat([feat1[0].float(), final[0].float()], dim=1)
            cls_in2 = torch.cat([feat2[0].float(), final[1].float()], dim=1)
            cls_features = self.classification_head(torch.cat([cls_in1, cls_in2], dim=0))
            if cfg.use_unet_feature:
                unet_feat = self.unet_feature(torch.cat([img1, img2], dim=0).float())
                if cfg.feature_combine_method == "conv":
                    cls_features = self.conv2(F.relu(self.conv1(torch.cat([cls_features, unet_feat], dim=1))))
                elif cfg.feature_combine_method == "modulate":
                    cls_features = self.conv2(cls_features * torch.tanh(unet_feat))
            f0, f1 = cls_features[:b], cls_features[b:]
            residual, log_softmax = _torch_refinement(
                flow, f0, f1, self.classification_bias, cfg.temperature, cfg.refinement_range
            )
            out["regression_flow"] = flow
            flow = flow + residual
            out["refinement_residual"] = residual
            out["refinement_log_softmax"] = log_softmax
            out["refinement_feature_map_0"] = f0
            out["refinement_feature_map_1"] = f1

        out["flow"] = flow
        return out


def lightning_checkpoint(twin: TorchUFMTwin) -> Dict:
    """Wrap the twin's state_dict the way the reference's training
    checkpoints are laid out (ufm.py:198-217): everything under a ``model.``
    prefix inside ``state_dict``, plus the keys the loader must drop
    (``feature_matching_proj``, ``encoder.model.mask_token``) and non-model
    entries it must ignore."""
    sd = {f"model.{k}": v for k, v in twin.state_dict().items()}
    dim = twin.encoder.model.cls_token.shape[-1]
    sd["model.feature_matching_proj.weight"] = torch.randn(dim, dim)
    sd["model.feature_matching_proj.bias"] = torch.randn(dim)
    sd["optimizer_junk.step"] = torch.zeros(1)  # no "model." prefix -> dropped
    return {"state_dict": sd, "epoch": 3, "global_step": 1234}
