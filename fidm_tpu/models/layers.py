"""Flax NHWC building blocks for the ADM-style inpainting UNet.

Clean-room TPU re-design of the reference primitives in
`/root/reference/code/nn.py:12-265`:

- `timestep_embedding` — sinusoidal [cos, sin] embedding (`nn.py:51-61`).
- `ResBlock` — GroupNorm(32) -> SiLU -> 3x3 conv, timestep-embedding add or
  FiLM-style scale-shift-norm, zero-initialized output conv, and fused
  up/down-sampling variants (`nn.py:136-212`).
- `AttentionBlock` — 1x1 qkv projection, per-head attention with fp32 softmax
  and 1/sqrt(sqrt(d)) dual scaling, zero-initialized output projection
  (`nn.py:215-265`).
- `Upsample` / `Downsample` (`nn.py:92-133`).

Layout is NHWC (TPU-native conv layout; the torch reference is NCHW).
Compute dtype is configurable (bf16 for MXU throughput); GroupNorm statistics
and softmax always run in float32.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import qkv_attention

__all__ = [
    "timestep_embedding",
    "GroupNorm32",
    "Upsample",
    "Downsample",
    "ResBlock",
    "AttentionBlock",
]


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embeddings, [cos | sin] order (`nn.py:51-61`)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


class GroupNorm32(nn.Module):
    """GroupNorm(32): float32 statistics, activations stay in compute dtype.

    `force_float32_reductions` keeps the mean/variance reductions in f32
    without materializing an f32 copy of the (large, bf16) activation — on
    TPU this halves the GN memory traffic vs an explicit upcast.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=self.dtype,
            param_dtype=jnp.float32, force_float32_reductions=True,
        )(x)


class Upsample(nn.Module):
    """Nearest-neighbor 2x upsampling with optional 3x3 conv (`nn.py:92-112`)."""

    use_conv: bool
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # nearest upsample as reshape+broadcast (cheaper to fuse than gather)
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        x = x.reshape(b, h * 2, w * 2, c)
        if self.use_conv:
            x = nn.Conv(self.out_channels or c, (3, 3), padding=1,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv, or 2x2 average pool when use_conv=False (`nn.py:115-133`)."""

    use_conv: bool
    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(self.out_channels or x.shape[-1], (3, 3),
                           strides=(2, 2), padding=1,
                           dtype=self.dtype, param_dtype=jnp.float32)(x)
        assert self.out_channels in (None, x.shape[-1])
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """Timestep-conditioned residual block (`nn.py:136-212`)."""

    out_channels: Optional[int] = None
    dropout: float = 0.0
    use_conv_skip: bool = False
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, emb):
        out_ch = self.out_channels or x.shape[-1]

        h = GroupNorm32(dtype=self.dtype, name="in_norm")(x)
        h = nn.silu(h)
        if self.up:
            h = Upsample(False, dtype=self.dtype)(h)
            x = Upsample(False, dtype=self.dtype)(x)
        elif self.down:
            h = Downsample(False, dtype=self.dtype)(h)
            x = Downsample(False, dtype=self.dtype)(x)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * out_ch if self.use_scale_shift_norm else out_ch,
            dtype=self.dtype, param_dtype=jnp.float32, name="emb_proj",
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(dtype=self.dtype, name="out_norm")(h)
            h = h * (1 + scale) + shift
        else:
            h = h + emb_out
            h = GroupNorm32(dtype=self.dtype, name="out_norm")(h)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=self.deterministic)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=nn.initializers.zeros,
                    name="out_conv")(h)

        if out_ch == x.shape[-1]:
            skip = x
        elif self.use_conv_skip:
            skip = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                           param_dtype=jnp.float32, name="skip_conv")(x)
        else:
            skip = nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32, name="skip_conv")(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Global spatial self-attention with residual (`nn.py:238-265`)."""

    num_heads: int = 1
    num_head_channels: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert c % self.num_head_channels == 0
            heads = c // self.num_head_channels
        head_dim = c // heads
        s = h * w

        tokens = GroupNorm32(dtype=self.dtype, name="norm")(x).reshape(b, s, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(tokens)
        # Channel-split order matches the reference 1x1-conv qkv
        # (nn.py:226: chunk(3, dim=1) over a 3C channel axis).
        q, k, v = jnp.split(qkv, 3, axis=-1)
        reshape = lambda a: a.reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)
        out = qkv_attention(reshape(q), reshape(k), reshape(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros, name="proj")(out)
        return x + out.reshape(b, h, w, c)
