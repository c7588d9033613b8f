"""Serve CLI: HTTP endpoint around the Predictor (no reference analog —
the reference predicts only by re-running predictEval.py over a directory)."""
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.config.run import RunConfig


@pytest.fixture(scope="module")
def served(tmp_path_factory, assets_dir, default_tree):
    """A live HTTP server over a tiny hier-UNet predictor (ephemeral port)."""
    import cv2
    import jax

    from restrictive_hierarchical_semantic_segmentation_tpu.cli.serve import (
        make_server,
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
    from restrictive_hierarchical_semantic_segmentation_tpu.train import serving
    from restrictive_hierarchical_semantic_segmentation_tpu.train.serving import (
        Predictor,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    tree = default_tree
    tmp_path = tmp_path_factory.mktemp("serve")
    small_model = H.HierarchicalSegmenter(
        tree=tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    x = np.zeros((1, 32, 32, 3), np.float32)
    state, _ = create_train_state(small_model, jax.random.PRNGKey(0), x, 0.0)
    ckpt = str(tmp_path / "best.ckpt")
    save_checkpoint(ckpt, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                    test_measure_std=0.0)

    orig = serving.build_model
    serving.build_model = lambda *a, **k: small_model
    try:
        cfg = RunConfig(tree_root=str(assets_dir / "class_tree_tl.json"),
                        class_map=str(assets_dir / "class_map.csv"),
                        model_select=0, model_type=1, img_size=32)
        pred = Predictor(cfg, ckpt, tree=tree, outputs=("class_maps",))
        pred.warmup(batch=1)
    finally:
        serving.build_model = orig

    server = make_server(pred, tree, 32, "127.0.0.1", 0,
                         max_body_bytes=1 << 20)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    # a synthetic grayscale "radiograph" PNG and its expected class maps
    rng = np.random.default_rng(0)
    img_u8 = rng.integers(0, 256, (48, 40), np.uint8)  # non-square on purpose
    ok, png = cv2.imencode(".png", img_u8)
    assert ok
    from restrictive_hierarchical_semantic_segmentation_tpu.cli.serve import (
        preprocess_bytes,
    )
    expected = pred(preprocess_bytes(png.tobytes(), 32))["class_maps"]
    yield {
        "url": f"http://127.0.0.1:{port}",
        "png": png.tobytes(),
        "expected": expected,
        "tree": tree,
    }
    server.shutdown()
    server.server_close()


def _post(url: str, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    return urllib.request.urlopen(req, timeout=30)


def test_healthz(served):
    with urllib.request.urlopen(served["url"] + "/healthz", timeout=30) as r:
        info = json.loads(r.read())
    assert info["status"] == "ok"
    assert info["img_size"] == 32
    assert info["classes_per_level"] == list(
        served["tree"].classes_per_level)


def test_predict_png_default_deepest_level(served):
    import cv2

    with _post(served["url"] + "/v1/predict", served["png"]) as r:
        assert r.headers["Content-Type"] == "image/png"
        level = int(r.headers["X-Level"])
        names = r.headers["X-Classes"].split(",")
        data = r.read()
    tree = served["tree"]
    assert level == tree.num_levels - 1
    assert names == list(tree.levels[level])
    got = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_UNCHANGED)
    assert got.shape == (32, 32)
    np.testing.assert_array_equal(
        got, served["expected"][level][0].astype(np.uint8))


def test_predict_json_level0(served):
    with _post(served["url"] + "/v1/predict?format=json&level=0",
               served["png"]) as r:
        out = json.loads(r.read())
    assert out["level"] == 0
    assert out["classes"] == list(served["tree"].levels[0])
    np.testing.assert_array_equal(
        np.asarray(out["class_map"], np.int32), served["expected"][0][0])


def test_predict_bad_requests(served):
    # empty body
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(served["url"] + "/v1/predict", b"")
    assert e.value.code == 400
    # undecodable image
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(served["url"] + "/v1/predict", b"not an image")
    assert e.value.code == 400
    # out-of-range level
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(served["url"] + "/v1/predict?level=99", served["png"])
    assert e.value.code == 400
    # unknown path
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(served["url"] + "/v1/nope", served["png"])
    assert e.value.code == 404
    # oversized body (server built with a 1 MB cap)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(served["url"] + "/v1/predict", b"\0" * (2 << 20))
    assert e.value.code == 413


def test_flat_model_serving(tmp_path, assets_dir, default_tree):
    """Flat models emit ONE class map over the leaf classes — the server
    must index/label it as such, not by tree level (a hier-depth default
    level would be out of range)."""
    import cv2
    import jax

    from restrictive_hierarchical_semantic_segmentation_tpu.cli.serve import (
        make_server, preprocess_bytes,
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
    from restrictive_hierarchical_semantic_segmentation_tpu.train import serving
    from restrictive_hierarchical_semantic_segmentation_tpu.train.serving import (
        Predictor,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    tree = default_tree
    flat_model = H.HierarchicalSegmenter(
        tree=tree, backbone=UNetBackbone(base_ch=8), hierarchical=False
    )
    x = np.zeros((1, 32, 32, 3), np.float32)
    state, _ = create_train_state(flat_model, jax.random.PRNGKey(0), x, 0.0)
    ckpt = str(tmp_path / "best.ckpt")
    save_checkpoint(ckpt, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                    test_measure_std=0.0)
    orig = serving.build_model
    serving.build_model = lambda *a, **k: flat_model
    try:
        cfg = RunConfig(tree_root=str(assets_dir / "class_tree_tl.json"),
                        class_map=str(assets_dir / "class_map.csv"),
                        model_select=0, model_type=0, img_size=32)
        pred = Predictor(cfg, ckpt, tree=tree, outputs=("class_maps",))
        pred.warmup(batch=1)
    finally:
        serving.build_model = orig

    server = make_server(pred, tree, 32, "127.0.0.1", 0, hierarchical=False)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
            info = json.loads(r.read())
        assert info["hierarchical"] is False
        assert info["num_levels"] == 1
        assert info["levels"] == [list(tree.leaf_names)]

        img = np.zeros((32, 32), np.uint8)
        ok, png = cv2.imencode(".png", img)
        assert ok
        expected = pred(preprocess_bytes(png.tobytes(), 32))["class_maps"]
        assert len(expected) == 1  # flat: one map over leaves
        # default level (no query) must hit the one flat output
        with _post(url + "/v1/predict", png.tobytes()) as r:
            assert int(r.headers["X-Level"]) == 0
            assert r.headers["X-Classes"].split(",") == list(tree.leaf_names)
            got = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                               cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(got, expected[0][0].astype(np.uint8))
        # a hier-style level request is a clean 400, not a crash
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url + "/v1/predict?level=1", png.tobytes())
        assert e.value.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_preprocess_matches_dataset_val_chain(tmp_path_factory, default_tree):
    """serve.preprocess_bytes must produce EXACTLY the dataset's val-mode
    input (same decode/resize/normalize/broadcast chain) — the serving
    input distribution is the training/eval one, not approximately so."""
    import glob

    from restrictive_hierarchical_semantic_segmentation_tpu.cli.serve import (
        preprocess_bytes,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.data.dataset import (
        SegDataset,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
        write_synth_dataset,
    )

    root = tmp_path_factory.mktemp("serve_pp")
    write_synth_dataset(str(root), 3, size=64, seed=5, folds=1)
    val = sorted(glob.glob(str(root / "fold_1" / "val" / "images" / "*")))
    masks = sorted(glob.glob(str(root / "fold_1" / "val" / "labels" / "*")))
    assert val and len(val) == len(masks)
    ds = SegDataset(val, masks, default_tree, img_size=48, hierarchical=True,
                    augment=False)
    for i, path in enumerate(val):
        x_ds, _ = ds[i]
        with open(path, "rb") as f:
            x_srv = preprocess_bytes(f.read(), 48)
        np.testing.assert_array_equal(x_srv[0], x_ds)


def test_serve_cli_arg_parsing():
    from restrictive_hierarchical_semantic_segmentation_tpu.cli.serve import (
        get_args,
    )

    args = get_args([
        "--model-weights", "w", "--tree-root", "t", "--class-map", "c",
        "--img-size", "64", "--model-type", "1", "--port", "0",
        "--ensemble", "best",
    ])
    assert args.img_size == 64 and args.ensemble == "best"
    assert args.port == 0 and args.host == "127.0.0.1"


def test_serve_u8_io_mode(tmp_path, assets_dir, default_tree):
    """--io u8 end-to-end: raw uint8 pixels ship to the device, normalization
    runs on device, and the served class map matches the u8 preprocess path
    (same resize as f32; the only delta is 8-bit input quantization)."""
    import cv2
    import jax

    from restrictive_hierarchical_semantic_segmentation_tpu.cli.serve import (
        make_server,
        preprocess_bytes,
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
    from restrictive_hierarchical_semantic_segmentation_tpu.train import serving
    from restrictive_hierarchical_semantic_segmentation_tpu.train.serving import (
        Predictor,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    tree = default_tree
    small_model = H.HierarchicalSegmenter(
        tree=tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    x = np.zeros((1, 32, 32, 3), np.float32)
    state, _ = create_train_state(small_model, jax.random.PRNGKey(0), x, 0.0)
    ckpt = str(tmp_path / "best.ckpt")
    save_checkpoint(ckpt, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                    test_measure_std=0.0)
    orig = serving.build_model
    serving.build_model = lambda *a, **k: small_model
    try:
        cfg = RunConfig(tree_root=str(assets_dir / "class_tree_tl.json"),
                        class_map=str(assets_dir / "class_map.csv"),
                        model_select=0, model_type=1, img_size=32)
        pred = Predictor(cfg, ckpt, tree=tree, outputs=("class_maps",),
                         class_map_dtype="uint8")
        pred.warmup(batch=1, input_dtype="uint8")
    finally:
        serving.build_model = orig

    server = make_server(pred, tree, 32, "127.0.0.1", 0,
                         max_body_bytes=1 << 20, io="u8")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(3)
        img_u8 = rng.integers(0, 256, (40, 48), np.uint8)
        ok, png = cv2.imencode(".png", img_u8)
        assert ok
        xb = preprocess_bytes(png.tobytes(), 32, io="u8")
        assert xb.dtype == np.uint8 and xb.shape == (1, 32, 32)  # gray u8
        expected = pred(xb)["class_maps"]
        with _post(f"http://127.0.0.1:{port}/v1/predict", png.tobytes()) as r:
            data = r.read()
        got = cv2.imdecode(np.frombuffer(data, np.uint8),
                           cv2.IMREAD_UNCHANGED)
        np.testing.assert_array_equal(got, expected[-1][0])
    finally:
        server.shutdown()
        server.server_close()
