"""Torch-side replica of the reference SVoRT building blocks, used as the
activation-parity oracle for the JAX port.

The reference's transformer stack lives at
/root/reference/nesvor/svort/attention.py:8-254 and its SVR transformers at
/root/reference/nesvor/svort/models.py:269-457. This module re-implements
those *architectures* in torch from their published semantics so that the
JAX params (flat torch-style state_dict names, nesvor_tpu/svort/attention.py)
can be loaded with ``load_state_dict(strict=True)`` — any name/shape/layout
mismatch with real torch checkpoints then fails loudly, and layer outputs
can be compared activation-by-activation.

torchvision is not installed in this environment, so the ResNet topology
(reference attention.py:235-254 wraps ``torchvision.models.resnet{34,50}``
with ``BatchNorm2d(track_running_stats=False)``, a ``d_in``-channel first
conv, and a ``d_model`` fc head) is hand-written here with torchvision's
module names (conv1/bn1/layer{1-4}.{i}.conv*/downsample/fc).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# transformer stack (reference attention.py:8-232); dropout omitted — parity
# is checked at eval() where dropout is identity
# ---------------------------------------------------------------------------


class TorchMHA(nn.Module):
    def __init__(self, n_head, d_model, d_k, d_v, activation="softmax", prenorm=False):
        super().__init__()
        self.n_head, self.d_k, self.d_v = n_head, d_k, d_v
        self.w_qs = nn.Linear(d_model, n_head * d_k)
        self.w_ks = nn.Linear(d_model, n_head * d_k)
        self.w_vs = nn.Linear(d_model, n_head * d_v)
        self.fc = nn.Linear(n_head * d_v, d_model)
        self.layer_norm = nn.LayerNorm(d_model, eps=1e-6)
        self.activation = activation
        self.prenorm = prenorm

    def forward(self, x, mask=None):
        residual = x
        if self.prenorm:
            x = self.layer_norm(x)
        L = x.shape[0]
        q = self.w_qs(x).view(L, self.n_head, self.d_k).transpose(0, 1)
        k = self.w_ks(x).view(L, self.n_head, self.d_k).transpose(0, 1)
        v = self.w_vs(x).view(L, self.n_head, self.d_v).transpose(0, 1)
        attn = (q / self.d_k**0.5) @ k.transpose(1, 2)
        if mask is not None:
            attn = attn + mask
        if self.activation == "softmax":
            attn = F.softmax(attn, dim=-1)
        elif self.activation == "entmax":
            attn = _torch_entmax15(attn, dim=-1)
        else:
            raise ValueError(self.activation)
        out = (attn @ v).transpose(0, 1).reshape(L, -1)
        out = self.fc(out) + residual
        if not self.prenorm:
            out = self.layer_norm(out)
        return out, attn


class TorchFFN(nn.Module):
    def __init__(self, d_in, d_hid, activation="relu", prenorm=False):
        super().__init__()
        self.w_1 = nn.Linear(d_in, d_hid)
        self.w_2 = nn.Linear(d_hid, d_in)
        self.layer_norm = nn.LayerNorm(d_in, eps=1e-6)
        self.act = getattr(F, activation)
        self.prenorm = prenorm

    def forward(self, x):
        residual = x
        if self.prenorm:
            x = self.layer_norm(x)
        x = self.w_2(self.act(self.w_1(x))) + residual
        if not self.prenorm:
            x = self.layer_norm(x)
        return x


class TorchEncoderLayer(nn.Module):
    def __init__(self, d_model, d_inner, n_head, d_k, d_v,
                 activation_attn="softmax", activation_ff="relu", prenorm=False):
        super().__init__()
        self.slf_attn = TorchMHA(n_head, d_model, d_k, d_v, activation_attn, prenorm)
        self.pos_ffn = TorchFFN(d_model, d_inner, activation_ff, prenorm)

    def forward(self, x, mask=None):
        x, attn = self.slf_attn(x, mask)
        return self.pos_ffn(x), attn


class TorchPositionalEncoding(nn.Module):
    def __init__(self, d_model, d_in):
        super().__init__()
        num_w = d_model // 2 // d_in
        self.num_pad = d_model - num_w * 2 * d_in
        w = 1e-3 ** torch.linspace(0, 1, num_w)
        self.w = nn.Parameter(w.view(1, -1, 1).repeat(1, 1, d_in))

    def forward(self, x):
        x = x.unsqueeze(1)
        x = torch.cat((torch.sin(self.w * x), torch.cos(self.w * x)), 1)
        x = x.flatten(1)
        if self.num_pad:
            x = F.pad(x, (0, self.num_pad))
        return x


class TorchTransformerEncoder(nn.Module):
    def __init__(self, n_layers, n_head, d_k, d_v, d_model, d_inner,
                 activation_attn="softmax", activation_ff="relu", prenorm=False):
        super().__init__()
        self.layer_stack = nn.ModuleList(
            TorchEncoderLayer(d_model, d_inner, n_head, d_k, d_v,
                              activation_attn, activation_ff, prenorm)
            for _ in range(n_layers)
        )
        self.layer_norm = nn.LayerNorm(d_model, eps=1e-6)
        self.prenorm = prenorm

    def forward(self, x, pos_enc, mask=None):
        out = x + pos_enc
        if not self.prenorm:
            out = self.layer_norm(out)
        attn = None
        for layer in self.layer_stack:
            out, attn = layer(out, mask)
        if self.prenorm:
            out = self.layer_norm(out)
        return out, attn


def _torch_entmax15(z, dim=-1):
    """Exact entmax15 forward (Peters et al. 2019; reference
    attention.py:257-567) via the sorted-threshold construction."""
    z = z.transpose(dim, -1)
    z = z / 2
    z = z - z.max(dim=-1, keepdim=True).values
    K = z.shape[-1]
    z_sorted, _ = torch.sort(z, dim=-1, descending=True)
    k = torch.arange(1, K + 1, dtype=z.dtype, device=z.device)
    mean = torch.cumsum(z_sorted, -1) / k
    mean_sq = torch.cumsum(z_sorted**2, -1) / k
    ss = k * (mean_sq - mean**2)
    delta = (1 - ss) / k
    tau = mean - torch.sqrt(torch.clamp(delta, min=0))
    support = (tau <= z_sorted).sum(-1) - 1
    tau_star = tau.gather(-1, support.unsqueeze(-1))
    out = torch.clamp(z - tau_star, min=0) ** 2
    return out.transpose(dim, -1)


# ---------------------------------------------------------------------------
# ResNet (torchvision topology, hand-written; reference attention.py:235-254)
# ---------------------------------------------------------------------------


def _bn(planes):
    return nn.BatchNorm2d(planes, track_running_stats=False)


class TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, in_planes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride, 1, bias=False)
        self.bn1 = _bn(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = _bn(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + identity)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, in_planes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 1, bias=False)
        self.bn1 = _bn(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = _bn(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = _bn(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + identity)


class _TorchResNetCore(nn.Module):
    def __init__(self, block, layers, d_in, d_model):
        super().__init__()
        self.conv1 = nn.Conv2d(d_in, 64, 7, 2, 3, bias=False)
        self.bn1 = _bn(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.in_planes = 64
        self.layer1 = self._make_layer(block, 64, layers[0], 1)
        self.layer2 = self._make_layer(block, 128, layers[1], 2)
        self.layer3 = self._make_layer(block, 256, layers[2], 2)
        self.layer4 = self._make_layer(block, 512, layers[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512 * block.expansion, d_model)

    def _make_layer(self, block, planes, n_blocks, stride):
        downsample = None
        if stride != 1 or self.in_planes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.in_planes, planes * block.expansion, 1, stride,
                          bias=False),
                _bn(planes * block.expansion),
            )
        blocks = [block(self.in_planes, planes, stride, downsample)]
        self.in_planes = planes * block.expansion
        blocks += [block(self.in_planes, planes) for _ in range(1, n_blocks)]
        return nn.Sequential(*blocks)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


class TorchResNet(nn.Module):
    """reference attention.py:235-254 (``self.model`` wrapper name kept so
    state_dict keys read ``...img_encoder.model.conv1.weight``)."""

    def __init__(self, n_res, d_model, d_in=1):
        super().__init__()
        block = {34: TorchBasicBlock, 50: TorchBottleneck}[n_res]
        self.model = _TorchResNetCore(block, (3, 4, 6, 3), d_in, d_model)

    def forward(self, x):
        return self.model(x)


# ---------------------------------------------------------------------------
# SVR transformers (reference models.py:269-457), volume=None path only —
# the slice-acquisition branch needs the CUDA extension and is covered by
# the projector's own CG/adjoint tests
# ---------------------------------------------------------------------------


class TorchSVRtransformer(nn.Module):
    def __init__(self, n_res=34, n_layers=4, n_head=4, d_in=8, d_out=6,
                 d_model=256, d_inner=512, res_d_in=3, res_scale=1):
        super().__init__()
        self.img_encoder = TorchResNet(n_res, d_model, res_d_in)
        self.pos_emb = TorchPositionalEncoding(d_model, d_in)
        self.encoder = TorchTransformerEncoder(
            n_layers, n_head, d_model // n_head, d_model // n_head,
            d_model, d_inner,
        )
        self.fc = nn.Linear(d_model, d_out)
        self.res_scale = res_scale
        self.res_d_in = res_d_in

    def pos_augment(self, slices, slices_est):
        n, _, h, w = slices.shape
        y = torch.linspace(-(h - 1) / 256, (h - 1) / 256, h)
        x = torch.linspace(-(w - 1) / 256, (w - 1) / 256, w)
        y, x = torch.meshgrid(y, x, indexing="ij")
        grids = [y.expand(n, 1, h, w), x.expand(n, 1, h, w)]
        if slices_est is not None:
            return torch.cat([slices, slices_est] + grids, 1)
        if self.res_d_in == 3:
            return torch.cat([slices] + grids, 1)
        return torch.cat([slices, 0 * slices] + grids, 1)

    def forward(self, theta, slices, pos):
        pos = torch.cat((theta, pos), -1)
        pe = self.pos_emb(pos)
        x = self.img_encoder(self.pos_augment(slices, None))
        x, attn = self.encoder(x, pe)
        return theta + self.fc(x) * self.res_scale, attn


class TorchSVRtransformerV2(nn.Module):
    def __init__(self, n_res=50, n_layers=4, n_head=4, d_in=8, d_out=6,
                 d_model=256, d_inner=512, n_channels=2):
        super().__init__()
        self.img_encoder = TorchResNet(n_res, d_model, n_channels + 2)
        self.pos_emb = TorchPositionalEncoding(d_model, d_in)
        self.encoder = TorchTransformerEncoder(
            n_layers, n_head, d_model // n_head, d_model // n_head,
            d_model, d_inner, activation_attn="softmax", activation_ff="gelu",
            prenorm=False,
        )
        self.fc = nn.Linear(d_model, d_out)
        self.fc_score = nn.Linear(d_model, 1)

    def pos_augment(self, slices, slices_est):
        n, _, h, w = slices.shape
        y = torch.linspace(-(h - 1) / 256, (h - 1) / 256, h)
        x = torch.linspace(-(w - 1) / 256, (w - 1) / 256, w)
        y, x = torch.meshgrid(y, x, indexing="ij")
        grids = [y.expand(n, 1, h, w), x.expand(n, 1, h, w)]
        if slices_est is not None:
            return torch.cat([slices, slices_est] + grids, 1)
        return torch.cat([slices] + grids, 1)

    def forward(self, theta, slices, pos):
        pos = torch.cat((theta, pos), -1)
        pe = self.pos_emb(pos)
        x = self.img_encoder(self.pos_augment(slices, None))
        x, attn = self.encoder(x, pe)
        score = torch.clamp(
            F.softmax(self.fc_score(x), dim=0) * x.shape[0], max=3.0
        )
        return theta + self.fc(x), score, attn
