"""int8 post-training quantization (train/quantize.py).

The reference has no quantized path (no serving story at all); this is the
TPU-native serving extension measured in tools/int8_experiment.py /
tools/serving_bench.py. Tests pin (a) the interceptor's conv geometry —
padding/stride/bias/dtype handling must equal flax's — via an exactness
oracle, (b) calibration bookkeeping, and (c) the end-to-end quantized
predictor staying close to the float one.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from restrictive_hierarchical_semantic_segmentation_tpu.train.quantize import (
    calibrate,
    make_quant_interceptor,
    quantized_apply,
)


class TwoConv(nn.Module):
    """Covers the conv configs the backbones use: 3x3 pad-1 stride-2 with
    bias, 1x1 SAME no-bias."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(8, (3, 3), (2, 2), padding=1, name="c1")(x)
        x = nn.relu(x)
        x = nn.Conv(4, (1, 1), use_bias=False, name="c2")(x)
        return x


def test_quant_conv_geometry_exact():
    """The int8 path must equal a float conv of the quantize-dequantized
    tensors exactly (integer sums < 2^24 are exact in both f32 and i32) —
    pinning padding, strides, bias and scale arithmetic."""
    m = TwoConv()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 9, 3)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(1), x)

    scales = calibrate(m.apply, v, [x])
    assert set(scales) == {"c1", "c2"}
    assert scales["c1"] == pytest.approx(float(np.abs(x).max()), rel=1e-6)

    got = quantized_apply(m.apply, scales, skip=lambda p: False)(v, x)

    # oracle: quantize-dequantize host-side, then float convs
    def qdq_act(a, amax):
        s = amax / 127.0
        return np.clip(np.round(a / s), -127, 127) * s

    def qdq_w(k):
        s = np.maximum(np.abs(k).max(axis=(0, 1, 2)) / 127.0, 1e-12)
        return np.clip(np.round(k / s), -127, 127) * s

    p = jax.tree_util.tree_map(np.asarray, v["params"])
    h = jax.lax.conv_general_dilated(
        qdq_act(x, scales["c1"]).astype(np.float32),
        qdq_w(p["c1"]["kernel"]).astype(np.float32),
        (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["c1"]["bias"]
    h = np.maximum(np.asarray(h), 0.0)
    want = jax.lax.conv_general_dilated(
        qdq_act(h, scales["c2"]).astype(np.float32),
        qdq_w(p["c2"]["kernel"]).astype(np.float32),
        (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_quantized_close_to_float():
    m = TwoConv()
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(3), x)
    scales = calibrate(m.apply, v, [x])
    yq = np.asarray(quantized_apply(m.apply, scales,
                                    skip=lambda p: False)(v, x))
    yf = np.asarray(m.apply(v, x))
    err = np.abs(yq - yf).mean() / (np.abs(yf).mean() + 1e-9)
    assert err < 0.03, err


def test_skip_and_uncovered_fall_through():
    """Heads (default skip) and convs without calibration stats must run the
    original float path bit-for-bit."""
    m = TwoConv()
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(5), x)
    scales = calibrate(m.apply, v, [x])
    # skip everything -> identical to float
    y_all_skip = quantized_apply(m.apply, scales, skip=lambda p: True)(v, x)
    np.testing.assert_array_equal(np.asarray(y_all_skip),
                                  np.asarray(m.apply(v, x)))
    # missing scales -> identical to float
    y_no_scales = quantized_apply(m.apply, {}, skip=lambda p: False)(v, x)
    np.testing.assert_array_equal(np.asarray(y_no_scales),
                                  np.asarray(m.apply(v, x)))


def test_quantized_predictor_hier_unet(tmp_path, assets_dir, default_tree,
                                       monkeypatch):
    """End-to-end: quantized Predictor on the hierarchical UNet — runs, heads
    stay float, composed probabilities stay near the float predictor's."""
    from restrictive_hierarchical_semantic_segmentation_tpu.config.run import (
        RunConfig,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.serving import (
        Predictor,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    small_model = H.HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    x = np.random.default_rng(7).normal(size=(2, 32, 32, 3)).astype(np.float32)
    state, _ = create_train_state(small_model, jax.random.PRNGKey(0), x[:1], 0.0)
    ckpt = str(tmp_path / "best.ckpt")
    save_checkpoint(ckpt, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                    test_measure_std=0.0)
    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.serving."
        "build_model",
        lambda *a, **k: small_model,
    )
    cfg = RunConfig(tree_root=str(assets_dir / "class_tree_tl.json"),
                    class_map=str(assets_dir / "class_map.csv"),
                    model_select=0, model_type=1, img_size=32)
    pred_f = Predictor(cfg, ckpt, tree=default_tree)
    pred_q = Predictor(cfg, ckpt, tree=default_tree, quantize=True,
                       calib_batches=[x])
    assert pred_q.act_scales and all(v > 0 for v in pred_q.act_scales.values())
    out_f = pred_f(x)
    out_q = pred_q(x)
    for L in range(2):
        pf, pq = out_f["probs"][L], out_q["probs"][L]
        assert np.abs(pf - pq).mean() < 0.02
    # composition invariant survives quantization by construction
    np.testing.assert_allclose(
        out_q["probs"][1].sum(-1),
        np.asarray(out_q["probs"][0])[..., default_tree.parents_with_children[1]].sum(-1),
        rtol=1e-3, atol=1e-3,
    )


def test_quantized_predict_eval_runs(tmp_path, assets_dir, monkeypatch,
                                     default_tree):
    """cfg.quantize=True routes the offline Evaluator's shared eval step
    through the int8 interceptor (calibrated on the first val batch) and
    produces metrics close to the float run."""
    import os

    from restrictive_hierarchical_semantic_segmentation_tpu.config.run import (
        RunConfig,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
        write_synth_dataset,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )

    def small(tree, model_select, model_type, *args, **kwargs):
        return H.HierarchicalSegmenter(
            tree=tree, backbone=UNetBackbone(base_ch=8),
            hierarchical=model_type == 1,
        )

    for mod in ("loop", "evaluate"):
        monkeypatch.setattr(
            f"restrictive_hierarchical_semantic_segmentation_tpu.train.{mod}."
            "build_model",
            small,
        )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.evaluate import (
        predict_eval,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import (
        train,
    )

    root = str(tmp_path / "data")
    write_synth_dataset(root, 6, size=64, seed=3, folds=1)
    base = dict(
        save_path=str(tmp_path / "run"), data_root=root,
        tree_root=str(assets_dir / "class_tree_tl.json"),
        class_map=str(assets_dir / "class_map.csv"),
        model_select=0, model_type=1, img_size=32, epochs=1, batch_size=2,
        val_batch=2, lr=1e-3, num_workers=2, inc_cross_val=True, folds=1,
        seed=0,
    )
    train(RunConfig(**base))
    w = [os.path.join(base["save_path"], "fold_1", "best.ckpt")]
    r = [os.path.join(root, "fold_1", "val")]
    res_f = predict_eval(RunConfig(**base), w, r,
                         save_root=str(tmp_path / "pf"))
    res_q = predict_eval(RunConfig(**base, quantize=True), w, r,
                         save_root=str(tmp_path / "pq"))
    mf = np.array([c["dice"] for c in res_f[0]["per_class"]])
    mq = np.array([c["dice"] for c in res_q[0]["per_class"]])
    assert np.abs(mf - mq).max() < 0.05, (mf, mq)


def test_default_skip_matches_heads_only():
    """The default float-skip covers the per-level logits heads but NOT the
    720-ch shared_head_conv (hrnet.py:327) — the largest measured int8 win
    (tools/int8_experiment.py) must actually be quantized."""
    from restrictive_hierarchical_semantic_segmentation_tpu.train.quantize import (
        default_skip,
    )

    assert default_skip("head_l0")
    assert default_skip("head_l12")
    assert default_skip("head_flat")
    assert default_skip("wrapper/head_l1")
    assert not default_skip("backbone/shared_head_conv")
    assert not default_skip("backbone/stage4_m0_b1_conv2")
    assert not default_skip("overhead_conv")
