"""Measure the PyTorch-CPU reference-class baseline for bench.py.

The reference repo cannot be executed (its UniCeption network library is not
in the snapshot — SURVEY.md §2.9) and publishes no numbers (BASELINE.md), so
the baseline is an *architecture twin* of our flagship config written in
plain PyTorch: DINOv2 ViT-L/14 class encoder over both 560x420 views,
768-dim/12-layer joint info-sharing transformer, and two DPT heads — the
same compute graph bench.py measures on TPU. Run on this host's CPU, result
cached to bench_baseline.json (one-time measurement; re-run to refresh).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

H, W = 420, 560
PATCH = 14
ENC_DIM, ENC_DEPTH, ENC_HEADS = 1024, 24, 16
INFO_DIM, INFO_DEPTH, INFO_HEADS = 768, 12, 12
FEATURE_DIM = 256


class Block(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = nn.MultiheadAttention(dim, heads, batch_first=True)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Sequential(nn.Linear(dim, 4 * dim), nn.GELU(), nn.Linear(4 * dim, dim))

    def forward(self, x):
        h = self.norm1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        return x + self.mlp(self.norm2(x))


class Transformer(nn.Module):
    def __init__(self, dim, depth, heads):
        super().__init__()
        self.blocks = nn.ModuleList([Block(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return self.norm(x)


class DPTHead(nn.Module):
    def __init__(self, in_dims, out_ch):
        super().__init__()
        proj_dims = [96, 192, 384, 768]
        self.projs = nn.ModuleList([nn.Conv2d(d, p, 1) for d, p in zip(in_dims, proj_dims)])
        self.scratch = nn.ModuleList([nn.Conv2d(p, FEATURE_DIM, 3, padding=1, bias=False) for p in proj_dims])
        self.fuse = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(FEATURE_DIM, FEATURE_DIM, 3, padding=1), nn.ReLU()) for _ in range(4)]
        )
        self.head = nn.Sequential(
            nn.Conv2d(FEATURE_DIM, 128, 3, padding=1),
            nn.Upsample(size=(H, W), mode="bilinear", align_corners=True),
            nn.Conv2d(128, 64, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(64, out_ch, 1),
        )

    def forward(self, levels):
        scales = [4, 2, 1, 0.5]
        feats = []
        for lv, proj, scratch, s in zip(levels, self.projs, self.scratch, scales):
            x = proj(lv)
            if s != 1:
                x = F.interpolate(x, scale_factor=s, mode="bilinear", align_corners=True)
            feats.append(scratch(x))
        x = self.fuse[3](feats[3])
        for i in (2, 1, 0):
            x = F.interpolate(x, size=feats[i].shape[-2:], mode="bilinear", align_corners=True)
            x = self.fuse[i](x + feats[i])
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        return self.head(x)


class UFMTwin(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = nn.Conv2d(3, ENC_DIM, PATCH, stride=PATCH)
        self.encoder = Transformer(ENC_DIM, ENC_DEPTH, ENC_HEADS)
        self.info_proj = nn.Linear(ENC_DIM, INFO_DIM)
        self.info_sharing = Transformer(INFO_DIM, INFO_DEPTH, INFO_HEADS)
        hp, wp = H // PATCH, W // PATCH
        in_dims = [ENC_DIM, INFO_DIM, INFO_DIM, INFO_DIM]
        self.flow_head = DPTHead(in_dims, 2)
        self.unc_head = DPTHead(in_dims, 5)
        self.hp, self.wp = hp, wp

    def forward(self, img1, img2):
        b = img1.shape[0]
        x = self.patch_embed(torch.cat([img1, img2], 0))  # (2B, D, hp, wp)
        tokens = x.flatten(2).transpose(1, 2)
        enc = self.encoder(tokens)
        info = self.info_sharing(self.info_proj(enc).reshape(b, -1, INFO_DIM))

        def to_map(t, d):
            return t.transpose(1, 2).reshape(-1, d, self.hp, self.wp)

        enc1 = to_map(enc[:b], ENC_DIM)
        info_maps = to_map(info, INFO_DIM)[:b]
        levels = [enc1, info_maps, info_maps, info_maps]
        return self.flow_head(levels), self.unc_head(levels)


def main():
    torch.set_num_threads(os.cpu_count() or 1)
    torch.set_grad_enabled(False)
    model = UFMTwin().eval()

    img = torch.randn(1, 3, H, W)
    reps = int(os.environ.get("UFM_BASELINE_REPS", "3"))

    t0 = time.perf_counter()
    model(img, img)  # warmup (allocator, thread pools)
    warmup = time.perf_counter() - t0

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        model(img, img)
        times.append(time.perf_counter() - t0)

    sec_per_pair = float(np.median(times))
    out = {
        "torch_cpu_pairs_per_sec": 1.0 / sec_per_pair,
        "torch_cpu_sec_per_pair": sec_per_pair,
        "warmup_sec": warmup,
        "threads": torch.get_num_threads(),
        "cpu_count": os.cpu_count(),
        "torch_version": torch.__version__,
        "note": "architecture twin of ufm_base_config (ViT-L/14 both views + info sharing + 2 DPT heads) at 560x420, fp32 CPU",
        "architecture": {
            "encoder": f"ViT dim={ENC_DIM} depth={ENC_DEPTH} heads={ENC_HEADS} patch={PATCH}, both views in one 2B batch",
            "info_sharing": f"joint transformer dim={INFO_DIM} depth={INFO_DEPTH} heads={INFO_HEADS} over concatenated view tokens",
            "heads": f"2x DPT (flow 2ch, uncertainty 5ch), 4-level pyramid, feature_dim={FEATURE_DIM}",
            "resolution": f"{W}x{H}",
            "deltas_vs_reference": [
                "reference model itself cannot run (UniCeption submodule absent from snapshot); this twin mirrors the flagship config measured by bench.py",
                "encoder is plain ViT (no DINOv2 register tokens / interpolated pos-embed); same token count, dim, depth — FLOP-equivalent",
                "info-sharing taps and DPT reassembly use one shared info map for levels 1-3 instead of distinct taps — identical conv/attention FLOPs",
                "no adaptor postprocessing (sigmoid/exp transforms, negligible cost) and no symmetrized-pair dedup (reference also disables it for distinct pairs)",
            ],
        },
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
