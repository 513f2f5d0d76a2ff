"""On-device connected-component labeling with static shapes.

The reference uses ``scipy.ndimage.label`` + ``find_objects`` on the
host, per proposal, inside a Python loop
(``object_reasoning.py:206-256``). Here CC labeling is an iterative
min-label propagation (8-connected) under ``lax.while_loop`` — the loop
count is data-dependent but bounded, all work stays on device, and the
op vmaps over the proposal batch so the whole center-reasoning phase
remains one XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**30)


def _min_pool_8(labels: jax.Array) -> jax.Array:
    """Min over the 3x3 neighborhood (8-connectivity), edge-padded with BIG."""
    padded = jnp.pad(labels, 1, constant_values=_BIG)
    h, w = labels.shape
    out = labels
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out = jnp.minimum(out, jax.lax.dynamic_slice(padded, (dy, dx), (h, w)))
    return out


@functools.partial(jax.jit, static_argnames=("max_iters",))
def label_components(mask: jax.Array, max_iters: int = 1024) -> jax.Array:
    """Label 8-connected components of a binary mask.

    mask: [H, W] (0/1). Returns int32 [H, W]: background pixels hold
    BIG (2^30); each component's pixels hold the smallest linear index
    in that component (a stable, deterministic component id).
    """
    h, w = mask.shape
    fg = mask > 0
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)
    labels = jnp.where(fg, idx, _BIG)

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_iters)

    def body(state):
        labels, _, it = state
        prop = jnp.where(fg, _min_pool_8(labels), _BIG)
        # pointer jumping: hop to the label's label to collapse chains fast
        hop = jnp.where(prop < _BIG, prop.reshape(-1)[jnp.clip(prop, 0, h * w - 1).reshape(-1)].reshape(h, w), _BIG)
        new = jnp.minimum(prop, hop)
        return new, jnp.any(new != labels), it + 1

    labels, _, _ = jax.lax.while_loop(cond, body, (labels, jnp.array(True), jnp.int32(0)))
    return labels


@functools.partial(jax.jit, static_argnames=("max_components",))
def component_boxes(labels: jax.Array, max_components: int = 16):
    """Extract per-component tight boxes from a label map.

    labels: [H, W] int32 from :func:`label_components`. Returns
    (boxes [C, 4] xyxy float32 with x2/y2 exclusive — matching
    ``find_objects`` slice stops — valid [C] bool, num_components int32).
    Components are emitted in ascending label order (scan order, same as
    scipy). If there are more than ``max_components`` components the
    largest-id ones are dropped (callers log the overflow).
    """
    h, w = labels.shape
    C = max_components
    yy = jnp.arange(h, dtype=jnp.int32)[:, None]
    xx = jnp.arange(w, dtype=jnp.int32)[None, :]

    def body(carry, _):
        remaining = carry
        cur = jnp.min(remaining)
        found = cur < _BIG
        sel = remaining == cur
        big_f = jnp.float32(1e9)
        x1 = jnp.min(jnp.where(sel, xx.astype(jnp.float32), big_f))
        y1 = jnp.min(jnp.where(sel, yy.astype(jnp.float32), big_f))
        x2 = jnp.max(jnp.where(sel, xx.astype(jnp.float32), -big_f)) + 1.0
        y2 = jnp.max(jnp.where(sel, yy.astype(jnp.float32), -big_f)) + 1.0
        box = jnp.where(found, jnp.stack([x1, y1, x2, y2]), jnp.zeros(4))
        remaining = jnp.where(sel, _BIG, remaining)
        return remaining, (box, found)

    _, (boxes, valid) = jax.lax.scan(body, labels, None, length=C)
    return boxes, valid, jnp.sum(valid.astype(jnp.int32))


def connected_component_boxes(mask: jax.Array, max_components: int = 16, max_iters: int = 1024):
    """Label + box extraction for one mask. Returns (boxes, valid, count)."""
    labels = label_components(mask, max_iters=max_iters)
    return component_boxes(labels, max_components=max_components)
