"""d2 detector converter: structural coverage + transpose correctness.

A d2-style state_dict is synthesized from the flax model's own param
shapes (inverse mapping), converted, and checked for exact tree/shape
coverage; conv/linear/deconv transposes are validated by round-trip.
"""

import numpy as np
import jax

from unmore_tpu.detector.cascade_rcnn import CascadeMaskRCNN
from unmore_tpu.detector.convert_d2 import convert_d2_detector_state_dict
from tests.test_detector import _tiny_cfg


def _synth_d2_sd(params, batch_stats):
    """Build a d2-named random state_dict matching the flax shapes."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv_t(kernel_hwio):  # flax HWIO -> torch OIHW
        kh, kw, ci, co = kernel_hwio.shape
        return rng.randn(co, ci, kh, kw).astype(np.float32)

    trunk = params["backbone"]["trunk"]
    sd["backbone.bottom_up.stem.conv1.weight"] = conv_t(trunk["conv1"]["kernel"])
    for stat in ("weight", "bias", "running_mean", "running_var"):
        sd[f"backbone.bottom_up.stem.conv1.norm.{stat}"] = rng.randn(
            trunk["bn1"]["scale"].shape[0]
        ).astype(np.float32)
    for name, mod in trunk.items():
        if not name.startswith("layer"):
            continue
        stage, block = name[5:].split("_")
        t = f"backbone.bottom_up.res{int(stage) + 1}.{block}."
        for i in (1, 2, 3):
            sd[t + f"conv{i}.weight"] = conv_t(mod[f"conv{i}"]["kernel"])
            for stat in ("weight", "bias", "running_mean", "running_var"):
                sd[t + f"conv{i}.norm.{stat}"] = rng.randn(
                    mod[f"bn{i}"]["scale"].shape[0]
                ).astype(np.float32)
        if "downsample_conv" in mod:
            sd[t + "shortcut.weight"] = conv_t(mod["downsample_conv"]["kernel"])
            for stat in ("weight", "bias", "running_mean", "running_var"):
                sd[t + f"shortcut.norm.{stat}"] = rng.randn(
                    mod["downsample_bn"]["scale"].shape[0]
                ).astype(np.float32)

    fpn = params["backbone"]["fpn"]
    for lvl in range(2, 6):
        for d2n, fxn in ((f"backbone.fpn_lateral{lvl}", f"lateral{lvl}"),
                         (f"backbone.fpn_output{lvl}", f"output{lvl}")):
            sd[d2n + ".weight"] = conv_t(fpn[fxn]["kernel"])
            sd[d2n + ".bias"] = np.asarray(fpn[fxn]["bias"], np.float32)

    for d2n, fxn in (("conv", "conv"), ("objectness_logits", "objectness_logits"),
                     ("anchor_deltas", "anchor_deltas")):
        sd[f"proposal_generator.rpn_head.{d2n}.weight"] = conv_t(params["rpn"][fxn]["kernel"])
        sd[f"proposal_generator.rpn_head.{d2n}.bias"] = np.asarray(params["rpn"][fxn]["bias"], np.float32)

    for k in range(3):
        head = params[f"box_head{k}"]
        for fc in ("fc1", "fc2"):
            ci, co = head[fc]["kernel"].shape
            sd[f"roi_heads.box_head.{k}.{fc}.weight"] = rng.randn(co, ci).astype(np.float32)
            sd[f"roi_heads.box_head.{k}.{fc}.bias"] = np.asarray(head[fc]["bias"], np.float32)
        for name in ("cls_score", "bbox_pred"):
            ci, co = head[name]["kernel"].shape
            sd[f"roi_heads.box_predictor.{k}.{name}.weight"] = rng.randn(co, ci).astype(np.float32)
            sd[f"roi_heads.box_predictor.{k}.{name}.bias"] = np.asarray(head[name]["bias"], np.float32)

    mh = params["mask_head"]
    for i in range(1, 5):
        sd[f"roi_heads.mask_head.mask_fcn{i}.weight"] = conv_t(mh[f"mask_fcn{i}"]["kernel"])
        sd[f"roi_heads.mask_head.mask_fcn{i}.bias"] = np.asarray(mh[f"mask_fcn{i}"]["bias"], np.float32)
    kh, kw, o, i_ = mh["deconv"]["kernel"].shape  # transpose_kernel=True: HW,O,I
    sd["roi_heads.mask_head.deconv.weight"] = rng.randn(i_, o, kh, kw).astype(np.float32)
    sd["roi_heads.mask_head.deconv.bias"] = np.asarray(mh["deconv"]["bias"], np.float32)
    sd["roi_heads.mask_head.predictor.weight"] = conv_t(mh["predictor"]["kernel"])
    sd["roi_heads.mask_head.predictor.bias"] = np.asarray(mh["predictor"]["bias"], np.float32)
    return sd


def test_d2_converter_full_coverage():
    cfg = _tiny_cfg()
    model = CascadeMaskRCNN(cfg)
    import jax.numpy as jnp

    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
                             method=CascadeMaskRCNN.init_all)
    )(jax.random.PRNGKey(0))
    sd = _synth_d2_sd(jax.device_get(variables["params"]), variables["batch_stats"])
    out = convert_d2_detector_state_dict(sd)

    flat_want = dict(jax.tree_util.tree_flatten_with_path(variables["params"])[0])
    flat_got = dict(jax.tree_util.tree_flatten_with_path(out["params"])[0])
    missing = [jax.tree_util.keystr(k) for k in flat_want if k not in flat_got]
    assert not missing, f"converter missing: {missing}"
    for k, leaf in flat_want.items():
        assert flat_got[k].shape == leaf.shape, jax.tree_util.keystr(k)

    flat_stats_want = dict(jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0])
    flat_stats_got = dict(jax.tree_util.tree_flatten_with_path(out["batch_stats"])[0])
    assert set(flat_stats_want) == set(flat_stats_got)

    # transpose correctness: conv OIHW->HWIO round trip on one kernel
    w = sd["backbone.bottom_up.stem.conv1.weight"]
    got = np.asarray(flat_got[next(k for k in flat_got if "conv1" in jax.tree_util.keystr(k) and "trunk" in jax.tree_util.keystr(k))])
    np.testing.assert_array_equal(got, np.transpose(w, (2, 3, 1, 0)))
