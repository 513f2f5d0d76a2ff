"""Shared CLI plumbing: model construction + checkpoint resolution.

Checkpoints load from either format transparently:
* this framework's msgpack checkpoints (``train/checkpoints.py``)
* reference PyTorch ``.ckpt`` files (``torch.save`` dicts), converted
  on the fly via :mod:`unmore_tpu.models.convert`
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from unmore_tpu.models.convert import (
    convert_classifier_state_dict,
    convert_objectness_state_dict,
    load_torch_checkpoint,
)
from unmore_tpu.models.objectness import ObjectnessNet
from unmore_tpu.models.resnet import BinaryClassifier

DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


def build_objectness(args_like, dtype="bfloat16") -> ObjectnessNet:
    return ObjectnessNet(
        backbone_type=getattr(args_like, "backbone_type", "dpt_large"),
        sdf_activation=getattr(args_like, "sdf_activation", None),
        use_bg_sdf=getattr(args_like, "use_bg_sdf", False),
        dtype=DTYPES[dtype],
        # encoder sequence packing (numerically identical, see
        # ViTBackbone.__call__): the crop chunk size must divide by it
        vit_pack=getattr(args_like, "vit_pack", 1) or 1,
    )


def build_classifier(dtype="bfloat16") -> BinaryClassifier:
    return BinaryClassifier(dtype=DTYPES[dtype])


def _try_msgpack(path: str):
    """Parse a msgpack checkpoint once; None if it isn't one."""
    try:
        from flax import serialization

        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())
    except Exception:
        return None


def load_objectness_params(path: str):
    """-> params pytree, from msgpack or a reference torch checkpoint."""
    ckpt = _try_msgpack(path)
    if ckpt is not None:
        return ckpt["params"] if "params" in ckpt else ckpt
    sd = load_torch_checkpoint(path)
    return convert_objectness_state_dict(sd)


def load_classifier_variables(path: str):
    """-> {'params': ..., 'batch_stats': ...}."""
    ckpt = _try_msgpack(path)
    if ckpt is not None:
        if "params" in ckpt and "batch_stats" in ckpt:
            return {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
        return ckpt
    sd = load_torch_checkpoint(path)
    return convert_classifier_state_dict(sd)


def make_apply_fns(objectness, obj_params, classifier, cls_vars):
    """Returns (objectness_fn, classifier_fn, variables) for the engines.

    Model state is returned as a separate ``variables`` pytree and the
    fns take it as their first argument: the engines pass it through jit
    as an ARGUMENT. Closing over a 0.3B-param tree instead would make it
    a compile-time constant and inflate compile time by >10x.
    """

    def objectness_fn(variables, crops, compute_center=True):
        return objectness.apply({"params": variables["objectness"]}, crops)

    def classifier_fn(variables, crops):
        return classifier.apply(variables["classifier"], crops)[:, 0]

    # device_put ONCE: checkpoint loading yields host numpy trees, and
    # numpy leaves are re-uploaded on every jit call — through the axon
    # relay that is ~26 s per phase invocation for the 1.5 GB ViT-L tree
    variables = jax.device_put({"objectness": obj_params, "classifier": cls_vars})
    return objectness_fn, classifier_fn, variables


def init_random_variables(objectness, classifier, crop_size=128, seed=0):
    """Random-weight variables (for smoke tests / benches without ckpts)."""
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((1, crop_size, crop_size, 3), jnp.float32)
    obj_params = jax.jit(lambda k: objectness.init(k, dummy)["params"])(rng)
    cls_vars = jax.jit(lambda k: classifier.init(k, dummy, train=False))(rng)
    return obj_params, cls_vars


def partial_fingerprint(args_like, input_paths, skip=()):
    """Fingerprint of everything that determines a stage-2 CLI's
    per-image results: the parsed args (minus supervision/launch flags
    that can't change outputs) plus the byte sizes of the input files
    (checkpoints, discovery boxes). Restarts with identical inputs
    match; a changed checkpoint or input JSON rotates the partial file
    instead of silently reusing stale results."""
    import hashlib

    base_skip = {
        "max_restarts", "hang_timeout_min", "busy_hang_timeout_min",
        "devices", "gpu_index",
    } | set(skip)
    cfg = {k: v for k, v in sorted(vars(args_like).items()) if k not in base_skip}
    for p in input_paths:
        try:
            cfg[f"_input:{p}"] = os.path.getsize(p)
        except (OSError, TypeError):
            cfg[f"_input:{p}"] = None
    blob = json.dumps(cfg, sort_keys=True, default=str).encode()
    return hashlib.sha1(blob).hexdigest()


def load_partial_jsonl(path: str, field: str, fingerprint: str | None = None):
    """Load a per-group durability JSONL written by the stage-2 CLIs.

    Each line is ``{"image_id": int, <field>: ...}`` — one record per
    *processed* image (empty ``field`` values still mark the image
    done: "processed" and "kept" are different facts). Returns
    ``(done_ids, kept)`` where ``kept`` maps image_id -> the non-empty
    field value. Torn tail lines from a mid-append kill are skipped,
    so that group is redone on resume.

    With ``fingerprint`` (see :func:`partial_fingerprint`): a file
    stamped with a DIFFERENT fingerprint was produced under different
    inputs — it is rotated to ``<path>.stale`` and the run starts
    fresh; a matching or missing file gets the stamp appended so the
    next restart can check it. Legacy unstamped files are accepted
    and stamped in place.
    """
    done_ids, kept = set(), {}
    meta_fp = None
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail from a mid-append kill
                if "_meta" in rec:
                    meta_fp = rec.get("fingerprint")
                    continue
                if "image_id" not in rec:
                    continue
                image_id = int(rec["image_id"])
                done_ids.add(image_id)
                if rec[field]:
                    kept[image_id] = rec[field]
        if fingerprint is not None and meta_fp is not None and meta_fp != fingerprint:
            os.replace(path, path + ".stale")
            print(
                f"partial file {path} was produced under different inputs "
                f"(fingerprint mismatch); rotated to .stale and starting fresh",
                flush=True,
            )
            done_ids, kept, meta_fp = set(), {}, None
    if fingerprint is not None and meta_fp is None:
        with open(path, "a") as f:
            f.write(json.dumps({"_meta": 1, "fingerprint": fingerprint}) + "\n")
    return done_ids, kept


class NpEncoder(json.JSONEncoder):
    """JSON encoder accepting numpy scalars/arrays (reference utils/misc.py:25-49)."""

    def default(self, obj):
        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.bool_):
            return bool(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        return super().default(obj)
