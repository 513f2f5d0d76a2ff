"""Dump reference-model activations for cross-framework parity checks.

RUN THIS IN THE REFERENCE'S ENVIRONMENT (torch + timm + the
vLAR-group/unMORE checkout), not in the TPU runtime:

  python dump_reference_activations.py \
      --reference /path/to/unMORE \
      --objectness_ckpt objectness_net_model.ckpt \
      --classifier_ckpt classifier_model.ckpt \
      --out reference_activations.npz

It builds the reference ObjectnessNet/Binary_Classifier
(models/objectness_net.py:37-223), loads the published checkpoints,
feeds a deterministic seeded input batch, and records:

  * the input batch ("input")
  * final outputs: center_fields / sdf_maps / existence score
  * intermediate taps: the 4 hooked ViT pyramid levels after
    act_postprocess (models/dpt/vit.py:104-145), the 4 refinenet
    outputs (models/dpt/models.py:85-88), and the fused DPT feature

The companion scripts/parity/check_parity.py (TPU runtime) loads this
npz, converts the same checkpoints with unmore_tpu.models.convert, and
reports per-tensor diffs. SURVEY §4 sets the pass bar at ~1e-3 for f32.
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", required=True, help="path to the unMORE checkout")
    ap.add_argument("--objectness_ckpt", required=True)
    ap.add_argument("--classifier_ckpt", default=None)
    ap.add_argument("--backbone_type", default="dpt_large")
    ap.add_argument("--sdf_activation", default="tanh")
    ap.add_argument("--use_bg_sdf", action="store_true", default=True)
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--out", default="reference_activations.npz")
    args = ap.parse_args()

    sys.path.insert(0, args.reference)
    import torch
    from models.objectness_net import ObjectnessNet, Binary_Classifier

    torch.manual_seed(0)
    model = ObjectnessNet(
        backbone_type=args.backbone_type,
        sdf_activation=args.sdf_activation,
        use_bg_sdf=args.use_bg_sdf,
    )
    ckpt = torch.load(args.objectness_ckpt, map_location="cpu")
    model.load_state_dict(ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt)
    model.eval()

    rng = np.random.RandomState(0)
    x = rng.rand(args.batch, 3, args.image_size, args.image_size).astype(np.float32)
    xt = torch.from_numpy(x)

    taps = {}

    def hook(name):
        def fn(_m, _i, out):
            taps[name] = out.detach().numpy() if torch.is_tensor(out) else out

        return fn

    # pyramid levels + refinenets + fused feature
    bb = model.backbone
    for i in range(1, 5):
        getattr(bb.scratch, f"layer{i}_rn").register_forward_hook(hook(f"layer{i}_rn"))
        getattr(bb.scratch, f"refinenet{i}").register_forward_hook(hook(f"refinenet{i}"))
    bb.scratch.output_conv.register_forward_hook(hook("fused_feature"))

    with torch.no_grad():
        out = model(xt)
    arrays = {
        "input": x,
        "center_fields": out["center_fields"].numpy(),
        "sdf_maps": out["sdf_maps"].numpy(),
        **taps,
    }

    if args.classifier_ckpt:
        cls = Binary_Classifier()
        ckpt = torch.load(args.classifier_ckpt, map_location="cpu")
        cls.load_state_dict(ckpt["model_state_dict"] if "model_state_dict" in ckpt else ckpt)
        cls.eval()
        with torch.no_grad():
            arrays["existence"] = cls(xt).numpy()

    np.savez_compressed(args.out, **arrays)
    print(f"wrote {args.out}: " + ", ".join(f"{k}{v.shape}" for k, v in arrays.items()))


if __name__ == "__main__":
    main()
