"""On-device augmentation (data/device_augment.py) vs the host cv2 pipeline
(data/transforms.py) under FIXED parameters, plus the device-resident
dataset iterator."""
import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.data import (
    transforms as T,
)
from restrictive_hierarchical_semantic_segmentation_tpu.data.device_augment import (  # noqa: E501
    AugmentParams,
    DeviceDataset,
    augment_sample,
    sample_params,
    ternary_encode_jax,
)
from restrictive_hierarchical_semantic_segmentation_tpu.data.target_factory import (  # noqa: E501
    ternary_encode,
)

S = 64


def _params(**kw):
    base = dict(sigma=1.3, brightness=1.2, contrast=0.8, bc_order=False,
                do_hflip=True, angle=17.0, tx=5.0, ty=-8.0, scale=1.05,
                shear=-3.0)
    base.update(kw)
    import jax.numpy as jnp

    return AugmentParams(**{k: jnp.asarray(v) for k, v in base.items()})


def _host_chain(img01, y01, p):
    """The host pipeline with the same explicit parameters."""
    x = T.gaussian_blur(img01, float(p.sigma))
    ops = ([lambda v: np.clip(v * float(p.brightness), 0, 1),
            lambda v: np.clip(v.mean() + (v - v.mean()) * float(p.contrast),
                              0, 1)])
    if bool(p.bc_order):
        ops = ops[::-1]
    for op in ops:
        x = op(x).astype(np.float32)
    x = T.normalize(x)
    y = y01.astype(np.float32)
    if bool(p.do_hflip):
        x, y = T.hflip(x), T.hflip(y)
    ap = T.AffineParams(float(p.angle), (float(p.tx), float(p.ty)),
                        float(p.scale), float(p.shear))
    x = T.affine_nearest(x, ap, fill=-1.0)
    chans = []
    for c in range(y.shape[-1]):
        fill = float(y[..., c].max()) if c == 0 else -1.0
        yc = T.affine_nearest(np.ascontiguousarray(y[..., c]), ap, fill)
        chans.append(yc[..., 0] if yc.ndim == 3 else yc)
    y = np.stack(chans, -1)
    y = (y >= 0.5).astype(np.float32)
    return x, y


@pytest.fixture(scope="module")
def sample(default_tree):
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (S, S, 1)).astype(np.float32)
    C = default_tree.num_classes
    y = (rng.uniform(0, 1, (S, S, C)) > 0.6).astype(np.uint8)
    y[..., 0] = 1  # background present
    return img, y


class TestEquivalence:
    def test_matches_host_pipeline_fixed_params(self, sample, default_tree):
        img, y01 = sample
        p = _params()
        xh, yh = _host_chain(img, y01, p)
        yh = np.asarray(ternary_encode(yh, default_tree))
        xd, yd = augment_sample(
            img, y01.astype(np.float32), p, default_tree, True)
        xd, yd = np.asarray(xd), np.asarray(yd)
        assert xd.shape == xh.shape and yd.shape == yh.shape
        # images: identical math except nearest-rounding at affine edges —
        # bound the disagreeing-pixel fraction and the in-agreement error
        close = np.isclose(xd, xh, atol=2e-2)
        assert close.mean() > 0.97, f"image mismatch {1 - close.mean():.3%}"
        # targets: ternary {-1,0,1}; same boundary-pixel caveat
        agree = (yd == yh).mean()
        assert agree > 0.97, f"target mismatch {1 - agree:.3%}"

    def test_no_affine_identity_is_exact(self, sample, default_tree):
        # angle/translate/shear zero + scale 1: the warp is the identity,
        # so device == host everywhere except blur-kernel float error
        img, y01 = sample
        p = _params(angle=0.0, tx=0.0, ty=0.0, scale=1.0, shear=0.0,
                    do_hflip=True)
        xh, yh = _host_chain(img, y01, p)
        yh = np.asarray(ternary_encode(yh, default_tree))
        xd, yd = augment_sample(
            img, y01.astype(np.float32), p, default_tree, True)
        np.testing.assert_allclose(np.asarray(xd), xh, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(yd), yh)

    def test_ternary_encode_jax_matches_numpy(self, default_tree,
                                              extended_tree):
        rng = np.random.default_rng(0)
        for tree in (default_tree, extended_tree):  # depth 2 and depth 4
            y = (rng.uniform(0, 1, (3, 16, 16, tree.num_classes))
                 > 0.5).astype(np.float32)
            np.testing.assert_array_equal(
                np.asarray(ternary_encode_jax(y, tree)),
                ternary_encode(y, tree),
            )

    def test_param_ranges(self):
        import jax

        ps = [sample_params(jax.random.PRNGKey(i)) for i in range(50)]
        assert all(0.001 <= float(p.sigma) <= 2.0 for p in ps)
        assert all(0.6 <= float(p.brightness) <= 1.4 for p in ps)
        assert all(0.5 <= float(p.contrast) <= 1.5 for p in ps)
        assert all(-50 <= float(p.angle) <= 50 for p in ps)
        assert all(0.85 <= float(p.scale) <= 1.15 for p in ps)
        assert {bool(p.do_hflip) for p in ps} == {True, False}


class TestDeviceDataset:
    def test_iterates_and_reshuffles(self, tmp_path, assets_dir, default_tree):
        from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (  # noqa: E501
            write_synth_dataset,
        )

        write_synth_dataset(str(tmp_path), 6, size=48, seed=2, folds=1)
        import glob as g

        imgs = sorted(g.glob(str(tmp_path / "fold_1" / "train" / "images" / "*")))
        labs = sorted(g.glob(str(tmp_path / "fold_1" / "train" / "labels" / "*")))
        ds = DeviceDataset(imgs, labs, default_tree, 32, True,
                           batch_size=2, seed=0)
        ds.set_epoch(1)
        b1 = [(np.asarray(x), np.asarray(y)) for x, y in ds]
        assert len(b1) == len(ds) == len(imgs) // 2
        x, y = b1[0]
        assert x.shape == (2, 32, 32, 1)
        assert y.shape == (2, 32, 32, default_tree.num_classes)
        assert set(np.unique(y)) <= {-1.0, 0.0, 1.0}
        assert x.min() >= -1.0 - 1e-6 and x.max() <= 1.0 + 1e-6
        # fresh epoch -> different permutation and augmentation draws
        ds.set_epoch(2)
        b2 = [(np.asarray(x), np.asarray(y)) for x, y in ds]
        assert not np.allclose(b1[0][0], b2[0][0])
        # same epoch twice -> deterministic
        ds.set_epoch(1)
        b1r = [(np.asarray(x), np.asarray(y)) for x, y in ds]
        np.testing.assert_array_equal(b1[0][0], b1r[0][0])


class TestTrainerIntegration:
    def test_train_e2e_device_data(self, tmp_path, assets_dir):
        from restrictive_hierarchical_semantic_segmentation_tpu.config.run import (  # noqa: E501
            RunConfig,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (  # noqa: E501
            write_synth_dataset,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import (  # noqa: E501
            train,
        )

        data = str(tmp_path / "d")
        write_synth_dataset(data, 8, size=48, seed=4, folds=1)
        cfg = RunConfig(
            save_path=str(tmp_path / "out"), data_root=data,
            tree_root=str(assets_dir / "class_tree_tl.json"),
            class_map=str(assets_dir / "class_map.csv"),
            model_select=0, model_type=1, img_size=32, epochs=2,
            batch_size=2, folds=1, inc_cross_val=True, lr=1e-3,
            device_data=True, num_workers=2,
        )
        res = train(cfg)
        assert len(res) == 1 and np.isfinite(res[0])
        import csv

        with open(tmp_path / "out" / "fold_1" / "metrics.csv") as f:
            rows = list(csv.reader(f))
        assert [r[0] for r in rows] == ["Epoch", "1", "2"]
        losses = [float(r[1]) for r in rows[1:]]
        assert all(np.isfinite(losses))
        assert losses[1] < losses[0]  # it actually learns from device batches


class TestRandomizedEquivalence:
    def test_random_param_sweep(self, sample, default_tree):
        """20 random draws across the full parameter space: the device and
        host chains must agree on >95% of pixels in every draw (disagreement
        is confined to nearest-rounding at affine boundaries)."""
        img, y01 = sample
        rng = np.random.default_rng(11)
        worst_img, worst_tgt = 1.0, 1.0
        for _ in range(20):
            p = _params(
                sigma=float(rng.uniform(0.001, 2.0)),
                brightness=float(rng.uniform(0.6, 1.4)),
                contrast=float(rng.uniform(0.5, 1.5)),
                bc_order=bool(rng.uniform() > 0.5),
                do_hflip=bool(rng.uniform() > 0.5),
                angle=float(rng.uniform(-50, 50)),
                tx=float(rng.uniform(-20, 20)),
                ty=float(rng.uniform(-20, 20)),
                scale=float(rng.uniform(0.85, 1.15)),
                shear=float(rng.uniform(-5, 5)),
            )
            xh, yh = _host_chain(img, y01, p)
            yh = np.asarray(ternary_encode(yh, default_tree))
            xd, yd = augment_sample(
                img, y01.astype(np.float32), p, default_tree, True)
            img_agree = np.isclose(np.asarray(xd), xh, atol=2e-2).mean()
            tgt_agree = (np.asarray(yd) == yh).mean()
            worst_img = min(worst_img, img_agree)
            worst_tgt = min(worst_tgt, tgt_agree)
        assert worst_img > 0.95, f"worst image agreement {worst_img:.3%}"
        assert worst_tgt > 0.95, f"worst target agreement {worst_tgt:.3%}"
