"""Numerics parity: a DINOv2-layout torch encoder vs our flax encoder after
state-dict conversion.

This is the strongest checkpoint-compat proxy available without the real
weights: a torch module with the checkpoint's naming (timm/DINOv2 blocks,
fused qkv, ls{1,2}.gamma, combined cls+grid pos_embed, encoder.model.*
wrapper prefix) is built, its state_dict converted through the production
converter path, and the two implementations must agree on features.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ufm_tpu.checkpoint.convert import torch_state_dict_to_params  # noqa: E402
from ufm_tpu.checkpoint.io import _merge_params  # noqa: E402
from ufm_tpu.nn.encoders import ViTEncoderInput, ViTEncoder  # noqa: E402

DIM, DEPTH, HEADS, GRID, PATCH = 48, 2, 2, 3, 14


class TorchBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(DIM, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(DIM, 3 * DIM)
        self.attn.proj = tnn.Linear(DIM, DIM)
        self.ls1 = tnn.Module()
        self.ls1.gamma = tnn.Parameter(torch.full((DIM,), 1e-2))
        self.norm2 = tnn.LayerNorm(DIM, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(DIM, 4 * DIM)
        self.mlp.fc2 = tnn.Linear(4 * DIM, DIM)
        self.ls2 = tnn.Module()
        self.ls2.gamma = tnn.Parameter(torch.full((DIM,), 1e-2))

    def forward(self, x):
        b, s, c = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, s, 3, HEADS, c // HEADS)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q, k, v = (t.permute(0, 2, 1, 3) for t in (q, k, v))
        att = torch.softmax(q @ k.transpose(-1, -2) * (c // HEADS) ** -0.5, dim=-1)
        h = (att @ v).permute(0, 2, 1, 3).reshape(b, s, c)
        x = x + self.attn.proj(h) * self.ls1.gamma
        h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + h * self.ls2.gamma


class TorchDinoTwin(tnn.Module):
    """timm/DINOv2-style naming: patch_embed.proj, cls_token, pos_embed
    (cls+grid combined), blocks.N, norm, mask_token (to be dropped)."""

    def __init__(self):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, DIM, PATCH, stride=PATCH)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + GRID * GRID, DIM) * 0.02)
        self.mask_token = tnn.Parameter(torch.zeros(1, DIM))
        self.blocks = tnn.ModuleList([TorchBlock() for _ in range(DEPTH)])
        self.norm = tnn.LayerNorm(DIM, eps=1e-6)

    def forward(self, img_bchw):
        x = self.patch_embed.proj(img_bchw)  # (B, C, hp, wp)
        b, c, hp, wp = x.shape
        x = x.flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(b, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 1:].transpose(1, 2).reshape(b, c, hp, wp)


def test_encoder_forward_parity(rng):
    torch.manual_seed(0)
    twin = TorchDinoTwin().eval()

    # checkpoint layout: wrapped as encoder.model.* like the reference
    # training checkpoints (ufm.py:208-210), with mask_token to drop
    sd = {f"encoder.model.{k}": v for k, v in twin.state_dict().items()}

    enc = ViTEncoder(
        patch_size=PATCH,
        embed_dim=DIM,
        depth=DEPTH,
        num_heads=HEADS,
        layerscale_init=1e-2,
        pretrain_grid_size=GRID,
        intermediate_layer_idx=(DEPTH - 1,),
    )
    h = w = GRID * PATCH  # grid matches pretraining -> no pos interpolation
    img = rng.standard_normal((2, h, w, 3)).astype(np.float32)

    template = enc.init(jax.random.PRNGKey(0), ViTEncoderInput(image=jnp.asarray(img)))["params"]
    converted = torch_state_dict_to_params(sd, extra_mappings={"encoder.model.mask_token": None})
    params = _merge_params({"encoder": template}, converted, strict=True)["encoder"]

    ours = enc.apply({"params": params}, ViTEncoderInput(image=jnp.asarray(img)))[0].features
    ours_bchw = np.asarray(ours).transpose(0, 3, 1, 2)

    with torch.no_grad():
        theirs = twin(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()

    np.testing.assert_allclose(ours_bchw, theirs, rtol=1e-4, atol=1e-4)


class TorchDoubleConv(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, padding=1), tnn.ReLU(inplace=True),
            tnn.Conv2d(cout, cout, 3, padding=1), tnn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.conv(x)


class TorchUNetTwin(tnn.Module):
    """Reference UNet layout (unet_encoder.py:26-71): downs/ups ModuleLists
    with interleaved ConvTranspose + DoubleConv."""

    def __init__(self, cin=3, cout=4, features=(4, 8)):
        super().__init__()
        self.downs = tnn.ModuleList()
        self.ups = tnn.ModuleList()
        c = cin
        for f in features:
            self.downs.append(TorchDoubleConv(c, f))
            c = f
        self.pool = tnn.MaxPool2d(2, 2)
        self.bottleneck = TorchDoubleConv(features[-1], features[-1] * 2)
        for f in reversed(features):
            self.ups.append(tnn.ConvTranspose2d(f * 2, f, 2, stride=2))
            self.ups.append(TorchDoubleConv(f * 2, f))
        self.final_conv = tnn.Conv2d(features[0], cout, 1)

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
            x = torch.cat((skips[i // 2], x), dim=1)
            x = self.ups[i + 1](x)
        return self.final_conv(x)


def test_unet_forward_parity(rng):
    """UNet conversion: conv / ConvTranspose / maxpool / interleaved-ups
    naming all round through the converter with exact numerics."""
    from ufm_tpu.nn.unet import UNet

    torch.manual_seed(1)
    twin = TorchUNetTwin().eval()
    # raw reference naming (conv.0/conv.2 Sequential indices, final_conv) —
    # the production canonicalizer must handle it unassisted
    sd = {f"unet_feature.{k}": v for k, v in twin.state_dict().items()}

    ours = UNet(out_channels=4, features=(4, 8))
    x = rng.standard_normal((2, 16, 24, 3)).astype(np.float32)
    template = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    converted = torch_state_dict_to_params(sd)["unet_feature"]
    params = _merge_params(template, converted, strict=True)

    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x))).transpose(0, 3, 1, 2)
    with torch.no_grad():
        ref = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
