"""Vision Transformer backbone with intermediate feature taps, in Flax.

TPU-first re-design of the DPT encoder plumbing: where the reference
grabs intermediate activations via PyTorch forward hooks on a timm ViT
(reference ``models/dpt/vit.py:104-145,221-348``), here the encoder
simply returns the hooked block outputs from a single traced forward —
no mutable global state, fully jit/vmap/pjit compatible.

Architecture matches timm's ``vit_large_patch16_384`` /
``vit_base_patch16_384`` (pre-LN blocks, fused qkv with bias, GELU MLP)
so converted reference checkpoints reproduce activations exactly.
Position embeddings are stored at the pretraining grid (24x24 for 384^2
/16) and bilinearly resized to the runtime grid at call time, matching
``_resize_pos_embed`` (reference ``models/dpt/vit.py:148-162``,
``F.interpolate`` align_corners=False).

All matmuls honor the configured ``dtype``/``precision``: bf16 on the
TPU hot path, float32 for parity testing (this JAX build defaults to a
bf16-like matmul precision even in f32, so precision is always
explicit).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from unmore_tpu.ops.image import resize_bilinear


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    depth: int
    dim: int
    heads: int
    mlp_dim: int
    patch: int = 16
    pretrain_grid: int = 24  # 384 // 16
    in_chans: int = 3


VIT_CONFIGS = {
    # timm vit_large_patch16_384 (reference models/dpt/vit.py:518)
    "vitl16_384": ViTConfig(depth=24, dim=1024, heads=16, mlp_dim=4096),
    # timm vit_base_patch16_384 (reference models/dpt/vit.py:534)
    "vitb16_384": ViTConfig(depth=12, dim=768, heads=12, mlp_dim=3072),
}


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, precision=self.precision, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, precision=self.precision, name="fc2")(x)
        return x


class Attention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, attn_bias=None):
        B, N, C = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, precision=self.precision, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, hd]
        scale = head_dim**-0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k, precision=self.precision)
        if attn_bias is not None:
            # additive mask [N, N] (e.g. block-diagonal for sequence
            # packing: tokens of different packed crops must not attend)
            attn = attn + attn_bias.astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v, precision=self.precision)
        out = out.reshape(B, N, C)
        return nn.Dense(self.dim, dtype=self.dtype, precision=self.precision, name="proj")(out)


class Block(nn.Module):
    dim: int
    heads: int
    mlp_dim: int
    dtype: Any = jnp.float32
    precision: Any = None

    @nn.compact
    def __call__(self, x, attn_bias=None):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.dim, self.heads, self.dtype, self.precision, name="attn")(y, attn_bias)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(self.dim, self.mlp_dim, self.dtype, self.precision, name="mlp")(y)
        return x


class ViTBackbone(nn.Module):
    """Patch-embed + transformer encoder returning hooked block outputs.

    __call__(images [B, H, W, 3]) -> list of [B, 1 + h*w, C] token maps,
    one per entry of ``hooks`` (the output of block ``hooks[i]``), where
    h = H // patch. cls token at index 0.
    """

    config: ViTConfig
    hooks: Sequence[int]
    dtype: Any = jnp.float32
    precision: Any = None
    remat: bool = False  # jax.checkpoint each block: the stage-1 trainer
    # has no other rematerialization, so saved forward activations scale
    # linearly with batch and cross the 16 GB v5e HBM near batch 96
    # (scripts/compile_oom_probe.py quantifies it); checkpointed blocks
    # trade one extra forward for an O(depth) smaller activation
    # footprint, lifting the trainable-batch ceiling

    @nn.compact
    def __call__(self, x, pack: int = 1):
        """``pack`` > 1 runs the encoder on packed sequences: the B crops
        are grouped ``pack`` at a time, their token sequences concatenated
        to one [B/pack, pack*(1+h*w), C] sequence under a block-diagonal
        attention mask (tokens never attend across crops), and the hooked
        taps split back to per-crop [B, 1+h*w, C] before returning —
        numerically identical to pack=1 (softmax rows are unchanged;
        LN/MLP/Dense are per-token), measured as an MFU experiment for
        the 65-token lane-padding drag (BASELINE.md component
        attribution)."""
        cfg = self.config
        B, H, W, _ = x.shape
        gh, gw = H // cfg.patch, W // cfg.patch

        patches = nn.Conv(
            cfg.dim,
            kernel_size=(cfg.patch, cfg.patch),
            strides=(cfg.patch, cfg.patch),
            padding="VALID",
            dtype=self.dtype,
            precision=self.precision,
            name="patch_embed",
        )(x)
        tokens = patches.reshape(B, gh * gw, cfg.dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.dim), jnp.float32
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + cfg.pretrain_grid**2, cfg.dim),
            jnp.float32,
        )
        pos_tok = pos_embed[:, :1]
        pos_grid = pos_embed[:, 1:].reshape(1, cfg.pretrain_grid, cfg.pretrain_grid, cfg.dim)
        if (gh, gw) != (cfg.pretrain_grid, cfg.pretrain_grid):
            pos_grid = resize_bilinear(pos_grid, (gh, gw), align_corners=False)
        pos = jnp.concatenate([pos_tok, pos_grid.reshape(1, gh * gw, cfg.dim)], axis=1)

        tokens = jnp.concatenate([jnp.broadcast_to(cls_token, (B, 1, cfg.dim)).astype(tokens.dtype), tokens], axis=1)
        tokens = tokens + pos.astype(tokens.dtype)

        attn_bias = None
        n_tok = 1 + gh * gw
        if pack > 1:
            assert B % pack == 0, (B, pack)
            tokens = tokens.reshape(B // pack, pack * n_tok, cfg.dim)
            # block-diagonal additive mask: -inf off the per-crop blocks
            crop_of = jnp.arange(pack * n_tok) // n_tok
            same = crop_of[:, None] == crop_of[None, :]
            attn_bias = jnp.where(same, 0.0, -jnp.inf).astype(jnp.float32)

        taps_by_layer = {}
        hook_set = set(self.hooks)
        block_cls = nn.remat(Block) if self.remat else Block
        for i in range(cfg.depth):
            tokens = block_cls(
                cfg.dim, cfg.heads, cfg.mlp_dim, self.dtype, self.precision, name=f"block{i}"
            )(tokens, attn_bias)
            if i in hook_set:
                taps_by_layer[i] = tokens
        taps = [taps_by_layer[h] for h in self.hooks]
        if pack > 1:
            taps = [t.reshape(B, n_tok, cfg.dim) for t in taps]
        # The reference applies a final LayerNorm to produce `glob`
        # (models/dpt/vit.py:199) but DPT consumes only the hooked block
        # outputs, so the final norm is omitted here.
        return taps
