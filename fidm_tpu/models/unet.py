"""ADM-style UNet and the 9-channel mask-aware inpainting model (Flax, NHWC).

Clean-room TPU re-design of `/root/reference/code/unet.py:14-200`. The block
topology (input stack / middle / output stack with skip concats, attention at
configured downsample factors, resblock-based up/downsampling) matches the
reference so that FFHQ torch checkpoints import 1:1, but the implementation is
idiomatic JAX: NHWC layout, bf16 compute with fp32 params/norms, optional
`jax.checkpoint` rematerialization per block, and a native 9-channel input
conv instead of the reference's post-hoc layer surgery
(`unet.py:176-200`) — the converter reproduces the RGB-copy + zero-init
semantics when importing 3-channel pretrained weights.

Canonical FFHQ-256 configuration (reference `train_inpainting.py:208-224`):
model_channels=128, num_res_blocks=1, attention at ds=16,
channel_mult=(1,1,2,2,4,4), num_heads=4, num_head_channels=64,
use_scale_shift_norm=True, resblock_updown=True, out_channels=6 (learned
variance).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    AttentionBlock,
    Downsample,
    GroupNorm32,
    ResBlock,
    Upsample,
    timestep_embedding,
)

__all__ = ["UNetConfig", "UNet", "InpaintingUNet", "ffhq256_config"]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    image_size: int = 256
    in_channels: int = 9
    model_channels: int = 128
    out_channels: int = 6
    num_res_blocks: int = 1
    attention_resolutions: Tuple[int, ...] = (16,)  # downsample factors
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_head_channels: int = 64
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    # Rematerialization policy when remat=True:
    #   "full"  — recompute everything in the backward (max memory saving,
    #             ~20% step-time cost measured at 256², BENCH.md);
    #   "convs" — selective: save conv/attention outputs (the expensive,
    #             MXU-bound results, tagged via `checkpoint_name`) and
    #             recompute only the cheap GroupNorm/SiLU/embedding glue —
    #             most of the memory saving at a few % of the cost.
    remat_policy: str = "full"
    # Decoder skip-connections without materializing the channel concat:
    # each out_*_res block computes GroupNorm stats across both halves and
    # runs its convolutions as two half-kernel convs summed — exactly the
    # same function (up to float reassociation) on the same parameter
    # tree. Opt-in perf experiment targeting the ~5% slice/copy share the
    # device trace attributes to skip-concat materialization.
    split_decoder_skips: bool = False


def ffhq256_config(**overrides) -> UNetConfig:
    """The canonical fine-tuning architecture (`train_inpainting.py:208-224`)."""
    return dataclasses.replace(UNetConfig(), **overrides)


class UNet(nn.Module):
    """The full UNet with attention and timestep embedding (`unet.py:14-173`)."""

    config: UNetConfig

    @nn.compact
    def __call__(self, x, timesteps, y=None, *, deterministic: bool = True,
                 cache=None, return_cache: bool = False,
                 cache_depth: Optional[int] = None):
        """Forward pass; optionally reusing / emitting cached features.

        Two cross-step feature-reuse modes (both: `return_cache=True` makes
        a key step publish its features, `cache=...` consumes them; the
        timestep embedding is always fresh):

        - `cache_depth=None` ("Faster Diffusion"-style encoder reuse):
          cache = `(h_mid, skips)`; a cached call skips the encoder+middle
          stacks entirely and runs only the decoder.
        - `cache_depth=b` (DeepCache-style deep-trunk reuse,
          arXiv:2312.00858): cache = the single decoder feature entering
          level b-1 (i.e. the output of level b's upsample). A cached call
          recomputes ONLY the shallow stacks — encoder levels 0..b-1 (whose
          skips the shallow decoder consumes) and decoder levels b-1..0 —
          and skips everything at or below level b, encoder, middle, and
          decoder alike. In this architecture FLOPs concentrate in the
          full-resolution levels, so prefer small b (1 or 2).
        """
        cfg = self.config
        n_levels = len(cfg.channel_mult)
        if cache_depth is not None and not 1 <= cache_depth < n_levels:
            raise ValueError(
                f"cache_depth must be in [1, {n_levels - 1}] for "
                f"channel_mult={cfg.channel_mult}; got {cache_depth}"
            )
        deep_cached = cache is not None and cache_depth is not None
        if (y is not None) != (cfg.num_classes is not None):
            raise ValueError(
                f"labels and num_classes must come together: y is "
                f"{'set' if y is not None else 'None'} but num_classes="
                f"{cfg.num_classes}. For unconditional training with a "
                "label-bearing loader, pass use_labels=False to "
                "make_train_step/make_eval_step (or drop 'label' from the "
                "batch)."
            )
        dtype = cfg.dtype
        heads_up = (
            cfg.num_heads if cfg.num_heads_upsample == -1 else cfg.num_heads_upsample
        )

        if not cfg.remat:
            block, attn = ResBlock, AttentionBlock
        elif cfg.remat_policy == "convs":
            import jax

            policy = jax.checkpoint_policies.save_only_these_names(
                "conv_out", "attn_out")
            block = nn.remat(ResBlock, policy=policy)
            attn = nn.remat(AttentionBlock, policy=policy)
        elif cfg.remat_policy == "full":
            block = nn.remat(ResBlock)
            attn = nn.remat(AttentionBlock)
        else:
            raise ValueError(f"unknown remat_policy: {cfg.remat_policy!r}")

        time_embed_dim = cfg.model_channels * 4
        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = nn.Dense(time_embed_dim, dtype=dtype, param_dtype=jnp.float32,
                       name="time_embed_0")(emb.astype(dtype))
        emb = nn.Dense(time_embed_dim, dtype=dtype, param_dtype=jnp.float32,
                       name="time_embed_1")(nn.silu(emb))
        if cfg.num_classes is not None:
            emb = emb + nn.Embed(cfg.num_classes, time_embed_dim,
                                 param_dtype=jnp.float32, dtype=dtype,
                                 name="label_emb")(y)

        if cache is None or deep_cached:
            # Encoder prefix. A full run computes every level; a deep-cached
            # run computes only the shallow levels (0..cache_depth-1) whose
            # skips the shallow decoder consumes — including the downsamples
            # BETWEEN shallow levels, but not the one feeding level
            # `cache_depth` (its output is only consumed below the branch).
            stop = cache_depth if deep_cached else n_levels
            ch = int(cfg.channel_mult[0] * cfg.model_channels)
            h = nn.Conv(ch, (3, 3), padding=1, dtype=dtype,
                        param_dtype=jnp.float32,
                        name="in_0_conv")(x.astype(dtype))
            hs = [h]
            input_block_chans = [ch]
            ds = 1
            idx = 1  # input block index (mirrors reference input_blocks list)

            for level, mult in list(enumerate(cfg.channel_mult))[:stop]:
                for _ in range(cfg.num_res_blocks):
                    ch = int(mult * cfg.model_channels)
                    h = block(out_channels=ch, dropout=cfg.dropout,
                              use_scale_shift_norm=cfg.use_scale_shift_norm,
                              deterministic=deterministic,
                              dtype=dtype, name=f"in_{idx}_res")(h, emb)
                    if ds in cfg.attention_resolutions:
                        h = attn(num_heads=cfg.num_heads,
                                 num_head_channels=cfg.num_head_channels,
                                 dtype=dtype, name=f"in_{idx}_attn")(h)
                    hs.append(h)
                    input_block_chans.append(ch)
                    idx += 1
                if level != stop - 1:
                    if cfg.resblock_updown:
                        h = block(out_channels=ch, dropout=cfg.dropout,
                                  use_scale_shift_norm=cfg.use_scale_shift_norm,
                                  deterministic=deterministic,
                                  down=True, dtype=dtype,
                                  name=f"in_{idx}_down")(h, emb)
                    else:
                        h = Downsample(cfg.conv_resample, out_channels=ch,
                                       dtype=dtype, name=f"in_{idx}_down")(h)
                    hs.append(h)
                    input_block_chans.append(ch)
                    ds *= 2
                    idx += 1

            if not deep_cached:
                h = block(dropout=cfg.dropout,
                          use_scale_shift_norm=cfg.use_scale_shift_norm,
                          deterministic=deterministic,
                          dtype=dtype, name="mid_res0")(h, emb)
                h = attn(num_heads=cfg.num_heads,
                         num_head_channels=cfg.num_head_channels,
                         dtype=dtype, name="mid_attn")(h)
                h = block(dropout=cfg.dropout,
                          use_scale_shift_norm=cfg.use_scale_shift_norm,
                          deterministic=deterministic,
                          dtype=dtype, name="mid_res1")(h, emb)
        else:
            # decoder-only: replay the static channel bookkeeping without
            # touching any encoder/middle module
            h_mid, skips = cache
            h = h_mid.astype(dtype)
            hs = [s.astype(dtype) for s in skips]
            ch = int(cfg.channel_mult[0] * cfg.model_channels)
            input_block_chans = [ch]
            for level, mult in enumerate(cfg.channel_mult):
                for _ in range(cfg.num_res_blocks):
                    ch = int(mult * cfg.model_channels)
                    input_block_chans.append(ch)
                if level != len(cfg.channel_mult) - 1:
                    input_block_chans.append(ch)
            ds = 2 ** (len(cfg.channel_mult) - 1)

        new_cache = None
        if return_cache and cache_depth is None:
            new_cache = (h, tuple(hs))

        idx = 0
        dec_levels = list(enumerate(cfg.channel_mult))[::-1]
        if deep_cached:
            # shallow decoder only: resume from the cached trunk feature at
            # the exact point where the full decoder enters level
            # cache_depth-1 (block names/indices match the full pass)
            dec_levels = dec_levels[n_levels - cache_depth:]
            idx = (n_levels - cache_depth) * (cfg.num_res_blocks + 1)
            h = cache.astype(dtype)
            ds = 2 ** (cache_depth - 1)
        for level, mult in dec_levels:
            if (return_cache and cache_depth is not None
                    and level == cache_depth - 1):
                new_cache = h  # the deep trunk feature a key step publishes
            for i in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                input_block_chans.pop()
                ch = int(cfg.model_channels * mult)
                res = block(out_channels=ch, dropout=cfg.dropout,
                            use_scale_shift_norm=cfg.use_scale_shift_norm,
                            deterministic=deterministic,
                            dtype=dtype, name=f"out_{idx}_res")
                if cfg.split_decoder_skips:
                    h = res(h, emb, skip.astype(h.dtype))
                else:
                    h = res(jnp.concatenate([h, skip.astype(h.dtype)], -1),
                            emb)
                if ds in cfg.attention_resolutions:
                    h = attn(num_heads=heads_up,
                             num_head_channels=cfg.num_head_channels,
                             dtype=dtype, name=f"out_{idx}_attn")(h)
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = block(out_channels=ch, dropout=cfg.dropout,
                                  use_scale_shift_norm=cfg.use_scale_shift_norm,
                                  deterministic=deterministic,
                                  up=True, dtype=dtype, name=f"out_{idx}_up")(h, emb)
                    else:
                        h = Upsample(cfg.conv_resample, out_channels=ch,
                                     dtype=dtype, name=f"out_{idx}_up")(h)
                    ds //= 2
                idx += 1
        assert not hs

        h = GroupNorm32(dtype=dtype, name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    param_dtype=jnp.float32, kernel_init=nn.initializers.zeros,
                    name="out_conv")(h)
        out = h.astype(jnp.float32)
        if return_cache:
            return out, new_cache
        return out


class InpaintingUNet(nn.Module):
    """Mask-aware 9-channel UNet (`unet.py:176-200`).

    Forward concatenates [noisy_image(3) | masked_image(3) | mask x3] on the
    channel axis (NHWC analogue of the concat at `unet.py:199`) and runs the
    base UNet. The 9-channel first conv is native; importing a 3-channel
    pretrained checkpoint copies RGB weights into channels 0-2 and zeros the
    rest (see models/torch_import.py), matching `unet.py:184-195`.
    """

    config: UNetConfig

    @nn.compact
    def __call__(self, x, t, masked_image, mask, y=None, *,
                 deterministic: bool = True,
                 cache=None, return_cache: bool = False,
                 cache_depth: Optional[int] = None):
        mask3 = jnp.broadcast_to(mask, mask.shape[:-1] + (3,))
        inp = jnp.concatenate(
            [x, masked_image.astype(x.dtype), mask3.astype(x.dtype)], axis=-1
        )
        return UNet(self.config, name="base")(
            inp, t, y, deterministic=deterministic,
            cache=cache, return_cache=return_cache, cache_depth=cache_depth,
        )
