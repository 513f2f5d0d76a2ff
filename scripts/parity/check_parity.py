"""Per-layer activation parity check against a reference dump.

Companion to dump_reference_activations.py (run that in the torch+timm
reference environment first; it writes reference_activations.npz). This
script runs in the TPU runtime:

  python scripts/parity/check_parity.py \
      --npz reference_activations.npz \
      --objectness_ckpt objectness_net_model.ckpt \
      [--classifier_ckpt classifier_model.ckpt]

It converts the same torch checkpoints with unmore_tpu.models.convert,
replays the dumped input through our ObjectnessNet (f32, HIGHEST matmul
precision), captures intermediates at the same tap points (the 4
reassembled pyramid levels, 4 refinenet outputs, fused DPT feature),
and reports per-tensor max/mean abs diffs. Pass bar: 1e-3 max-abs for
f32 (SURVEY §4 "numerical parity ... tolerance ~1e-3").

Exit code 0 iff every compared tensor passes.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

# reference tap name -> path into our capture_intermediates tree
TAP_MAP = {
    "layer1_rn": ("backbone", "layer1_rn"),
    "layer2_rn": ("backbone", "layer2_rn"),
    "layer3_rn": ("backbone", "layer3_rn"),
    "layer4_rn": ("backbone", "layer4_rn"),
    "refinenet1": ("backbone", "refinenet1"),
    "refinenet2": ("backbone", "refinenet2"),
    "refinenet3": ("backbone", "refinenet3"),
    "refinenet4": ("backbone", "refinenet4"),
}


def to_nhwc(a: np.ndarray) -> np.ndarray:
    return np.transpose(a, (0, 2, 3, 1)) if a.ndim == 4 else a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", required=True)
    ap.add_argument("--objectness_ckpt", required=True)
    ap.add_argument("--classifier_ckpt", default=None)
    ap.add_argument("--backbone_type", default="dpt_large")
    ap.add_argument("--sdf_activation", default="tanh")
    ap.add_argument("--use_bg_sdf", action="store_true", default=True)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--tiny", action="store_true",
                    help="miniature-dims model (harness self-test; tests/torch_ref.py fixture)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin wins "
                         "platform selection over JAX_PLATFORMS=cpu env; the "
                         "f32/HIGHEST parity check neither needs nor wants "
                         "the remote TPU compile path)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from unmore_tpu.models.convert import (
        convert_classifier_state_dict,
        convert_objectness_state_dict,
        load_torch_checkpoint,
    )
    from unmore_tpu.models.objectness import ObjectnessNet
    from unmore_tpu.models.resnet import BinaryClassifier

    ref = np.load(args.npz)
    x = np.transpose(ref["input"], (0, 2, 3, 1))  # NCHW -> NHWC

    if args.tiny:
        from unmore_tpu.models.vit import ViTConfig

        model = ObjectnessNet(
            backbone_type="dpt_base", sdf_activation="tanh", use_bg_sdf=True,
            features=16,
            vit_config=ViTConfig(depth=4, dim=32, heads=2, mlp_dim=64, pretrain_grid=4),
            hooks=(0, 1, 2, 3), widths=(8, 16, 24, 24),
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        model = ObjectnessNet(
            backbone_type=args.backbone_type,
            sdf_activation=args.sdf_activation,
            use_bg_sdf=args.use_bg_sdf,
            dtype=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    params = convert_objectness_state_dict(load_torch_checkpoint(args.objectness_ckpt))
    out, inter = jax.jit(
        lambda p, x: model.apply(
            {"params": p}, x,
            capture_intermediates=lambda mdl, name: name == "__call__",
        )
    )(params, jnp.asarray(x))
    inter = inter["intermediates"]

    failures = []

    def compare(name, ref_a, ours_a):
        ours_a = np.asarray(ours_a, np.float32)
        ref_a = to_nhwc(np.asarray(ref_a, np.float32))
        if ref_a.shape != ours_a.shape:
            print(f"  {name:16s} SHAPE MISMATCH ref{ref_a.shape} vs ours{ours_a.shape}")
            failures.append(name)
            return
        d = np.abs(ref_a - ours_a)
        status = "ok" if d.max() <= args.tol else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"  {name:16s} max|d|={d.max():.3e} mean|d|={d.mean():.3e} {status}")

    print(f"objectness parity (tol {args.tol}):")
    # center_fields: reference [B,2,H,W] (dy,dx ordering matches synthesis)
    compare("center_fields", ref["center_fields"], np.asarray(out["center_fields"]))
    compare("sdf_maps", ref["sdf_maps"][:, 0] if ref["sdf_maps"].ndim == 4 else ref["sdf_maps"],
            np.asarray(out["sdf_maps"]))
    for ref_name, path in TAP_MAP.items():
        if ref_name not in ref.files:
            continue
        node = inter
        try:
            for key in path:
                node = node[key]
            ours = node["__call__"][0]
        except KeyError:
            print(f"  {ref_name:16s} (no matching tap in our tree — skipped)")
            continue
        compare(ref_name, ref[ref_name], ours)

    if args.classifier_ckpt and "existence" in ref.files:
        cls = BinaryClassifier(dtype=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        variables = convert_classifier_state_dict(load_torch_checkpoint(args.classifier_ckpt))
        score = jax.jit(lambda v, x: cls.apply(v, x, train=False))(variables, jnp.asarray(x))
        print("classifier parity:")
        compare("existence", ref["existence"], np.asarray(score))

    if failures:
        print(f"PARITY FAIL: {failures}")
        sys.exit(1)
    print("PARITY OK")


if __name__ == "__main__":
    main()
