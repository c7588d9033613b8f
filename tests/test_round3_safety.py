"""Round-3 resource-safety behaviors (VERDICT r2 'What's weak' #1-#5):

* byte-capped host image/bitmask caches (data/dataset.py ByteCappedCache),
* periodic mid-epoch non-finite loss probe (train/loop.py train_epoch),
* bounded in-flight result window in offline eval (train/evaluate.py),
* loader worker pools closed by the trainers,
* mesh-sharded fold-ensemble Predictor parity (train/serving.py).
"""
import os

import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.config.run import RunConfig
from restrictive_hierarchical_semantic_segmentation_tpu.data.dataset import (
    ByteCappedCache, SegDataset,
)
from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
    write_synth_dataset,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_r3")
    write_synth_dataset(str(root), 6, size=64, seed=11, folds=1)
    return str(root)


def _pairs(root):
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import (
        list_pairs,
    )

    return list_pairs(os.path.join(root, "fold_1", "train"))


# --------------------------------------------------------------- byte caps
def test_byte_capped_cache_respects_budget():
    c = ByteCappedCache(100)
    a = np.zeros(10, np.float64)  # 80 bytes
    c["a"] = a
    assert "a" in c and c.nbytes == 80
    c["b"] = np.zeros(10, np.float64)  # would exceed 100 -> not cached
    assert "b" not in c and c.nbytes == 80
    c["c"] = np.zeros(2, np.float64)  # 16 bytes fits
    assert "c" in c and c.nbytes == 96
    c["a"] = np.zeros(1000, np.float64)  # re-insert of same key: no-op
    assert c.nbytes == 96 and c.get("a") is a


def test_dataset_caches_share_one_byte_budget(synth_root, default_tree):
    """cache_bytes is the dataset's TOTAL budget: image and bitmask entries
    share ONE ByteCappedCache (two separate caches each capped at
    cache_bytes would let a dataset pin 2x the advertised bound)."""
    imgs, labs = _pairs(synth_root)
    ds = SegDataset(imgs, labs, tree=default_tree, img_size=32,
                    hierarchical=True, augment=False,
                    cache_bytes=1 << 20)
    assert ds._img_cache is ds._bits_cache
    for i in range(len(imgs)):
        ds.__getitem__(i, np.random.default_rng(i))
    assert 0 < ds._cache.nbytes <= 1 << 20
    # both entry kinds actually land in the one shared cache
    assert {k[0] for k in ds._cache._d} == {"img", "bits"}


def test_process_pool_splits_cache_budget(synth_root, default_tree):
    """With the process loader, every spawn worker holds its OWN dataset
    copy — the byte budget must be divided across workers so the TOTAL
    host-RAM bound stays cache_bytes, not cache_bytes x num_workers."""
    from restrictive_hierarchical_semantic_segmentation_tpu.data.loader import (
        _split_cache_budget,
    )

    imgs, labs = _pairs(synth_root)
    ds = SegDataset(imgs, labs, tree=default_tree, img_size=32,
                    hierarchical=True, augment=False, cache_bytes=1 << 20)
    split = _split_cache_budget(ds, 4)
    assert split is not ds  # original untouched
    assert ds._cache.cap_bytes == 1 << 20
    assert split._cache.cap_bytes == (1 << 20) // 4
    assert split._img_cache is split._cache is split._bits_cache
    # no-ops: single worker, or a zero budget
    assert _split_cache_budget(ds, 1) is ds
    ds0 = SegDataset(imgs, labs, tree=default_tree, img_size=32,
                     hierarchical=True, augment=False, cache_bytes=0)
    assert _split_cache_budget(ds0, 4) is ds0


def test_dataset_identical_with_and_without_cache(synth_root, default_tree):
    imgs, labs = _pairs(synth_root)
    kw = dict(tree=default_tree, img_size=32, hierarchical=True, augment=True)
    ds_cached = SegDataset(imgs, labs, **kw)
    ds_nocache = SegDataset(imgs, labs, cache_bytes=0, **kw)
    assert ds_nocache._img_cache.cap_bytes == 0
    for i in range(len(imgs)):
        rng_a = np.random.default_rng(42 + i)
        rng_b = np.random.default_rng(42 + i)
        xa, ya = ds_cached.__getitem__(i, rng_a)
        xb, yb = ds_nocache.__getitem__(i, rng_b)
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
    # second epoch hits the cache; zero-cap dataset cached nothing
    assert len(ds_cached._img_cache) > 0
    assert len(ds_nocache._img_cache) == 0 and ds_nocache._img_cache.nbytes == 0
    xa2, _ = ds_cached.__getitem__(0, np.random.default_rng(42))
    xb2, _ = ds_nocache.__getitem__(0, np.random.default_rng(42))
    np.testing.assert_array_equal(xa2, xb2)


# ------------------------------------------------------------- NaN probe
def _small_model(monkeypatch):
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

    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.loop.build_model",
        small,
    )


def test_nan_probe_fails_fast_mid_epoch(tmp_path, assets_dir, synth_root,
                                        monkeypatch, default_tree):
    """A NaN at step 0 must abort within `nan_probe_every` steps, not after
    the whole epoch (the round-2 design only checked post-epoch)."""
    import jax.numpy as jnp

    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import (
        Trainer,
    )

    _small_model(monkeypatch)
    cfg = RunConfig(
        save_path=str(tmp_path / "runs"),
        data_root=synth_root,
        tree_root=str(assets_dir / "class_tree_tl.json"),
        class_map=str(assets_dir / "class_map.csv"),
        model_select=0, model_type=1, img_size=32, batch_size=1,
        val_batch=1, lr=1e-3, num_workers=2, folds=1, epochs=1, seed=0,
        nan_probe_every=2,
    )
    tr = Trainer(cfg, default_tree,
                 os.path.join(synth_root, "fold_1", "train"),
                 os.path.join(synth_root, "fold_1", "val"),
                 str(tmp_path / "runs" / "fold_1"))
    n_steps_run = {"n": 0}
    real_step = tr.train_step

    def poisoned_step(state, x, y, mask):
        n_steps_run["n"] += 1
        state, aux = real_step(state, x, y, mask)
        aux = dict(aux)
        aux["loss"] = aux["loss"] * jnp.float32(np.nan)
        return state, aux

    tr.train_step = poisoned_step
    with pytest.raises(FloatingPointError, match="non-finite"):
        tr.train_epoch(1)
    # 6 images / batch 1 = 6 steps; probe every 2 must stop at step 2
    assert n_steps_run["n"] == 2, n_steps_run
    tr.close()


def test_nan_probe_disabled_defers_to_epoch_end(tmp_path, assets_dir,
                                                synth_root, monkeypatch,
                                                default_tree):
    import jax.numpy as jnp

    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import (
        Trainer,
    )

    _small_model(monkeypatch)
    cfg = RunConfig(
        save_path=str(tmp_path / "runs"),
        data_root=synth_root,
        tree_root=str(assets_dir / "class_tree_tl.json"),
        class_map=str(assets_dir / "class_map.csv"),
        model_select=0, model_type=1, img_size=32, batch_size=1,
        val_batch=1, lr=1e-3, num_workers=2, folds=1, epochs=1, seed=0,
        nan_probe_every=0,
    )
    tr = Trainer(cfg, default_tree,
                 os.path.join(synth_root, "fold_1", "train"),
                 os.path.join(synth_root, "fold_1", "val"),
                 str(tmp_path / "runs" / "fold_1"))
    n_steps_run = {"n": 0}
    real_step = tr.train_step

    def poisoned_step(state, x, y, mask):
        n_steps_run["n"] += 1
        state, aux = real_step(state, x, y, mask)
        aux = dict(aux)
        aux["loss"] = aux["loss"] * jnp.float32(np.nan)
        return state, aux

    tr.train_step = poisoned_step
    with pytest.raises(FloatingPointError, match="non-finite"):
        tr.train_epoch(1)
    assert n_steps_run["n"] == 6  # probe off -> full epoch dispatched
    tr.close()


# ------------------------------------------------- bounded eval in-flight
def test_evaluator_bounded_inflight(tmp_path, assets_dir, synth_root,
                                    monkeypatch, default_tree):
    """With eval_inflight=1 the evaluator must consume results WHILE
    dispatching (window bound), not buffer the whole set on device."""
    from restrictive_hierarchical_semantic_segmentation_tpu.models import (
        hierarchical as H,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
        UNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train import (
        evaluate as EV,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (
        save_checkpoint,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
        create_train_state,
    )

    import jax

    small_model = H.HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.evaluate."
        "build_model",
        lambda *a, **k: small_model,
    )
    x = np.zeros((1, 32, 32, 3), np.float32)
    state, _ = create_train_state(small_model, jax.random.PRNGKey(0), x, 0.0)
    ckpt = str(tmp_path / "best.ckpt")
    save_checkpoint(ckpt, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                    test_measure_std=0.0)

    cfg = RunConfig(
        tree_root=str(assets_dir / "class_tree_tl.json"),
        class_map=str(assets_dir / "class_map.csv"),
        model_select=0, model_type=1, img_size=32, val_batch=1,
        num_workers=2, eval_inflight=1,
    )
    # the train split (6 images) gives enough batches to see the window slide
    ev = EV.Evaluator(cfg, default_tree,
                      os.path.join(synth_root, "fold_1", "train"), ckpt,
                      save_dir=None, save_images=False)
    assert ev.inflight == 1

    events = []
    real_step, real_consume = ev.eval_step, ev._consume

    def step_spy(*a, **k):
        events.append("dispatch")
        return real_step(*a, **k)

    def consume_spy(*a, **k):
        events.append("consume")
        return real_consume(*a, **k)

    ev.eval_step = step_spy
    ev._consume = consume_spy
    res = ev.run()
    n_batches = events.count("dispatch")
    assert n_batches >= 2
    assert events.count("consume") == n_batches
    # window=1: the first consume happens after the 2nd dispatch, NOT after
    # all dispatches (the unbounded round-2 behavior)
    first_consume = events.index("consume")
    assert first_consume < n_batches, events
    # window=1: at most ONE batch's results device-resident at any moment —
    # the oldest is consumed BEFORE the next dispatch (dispatch, consume,
    # dispatch, ...); append-then-pop would peak at 2 resident
    assert first_consume == 1, events
    assert 0.0 <= res["overall"]["dice"] <= 1.0


# ----------------------------------------------------- loader pool close
def test_trainer_close_shuts_worker_pools(tmp_path, assets_dir, synth_root,
                                          monkeypatch, default_tree):
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import (
        Trainer,
    )

    _small_model(monkeypatch)
    cfg = RunConfig(
        save_path=str(tmp_path / "runs"),
        data_root=synth_root,
        tree_root=str(assets_dir / "class_tree_tl.json"),
        class_map=str(assets_dir / "class_map.csv"),
        model_select=0, model_type=1, img_size=32, batch_size=2,
        val_batch=1, lr=1e-3, num_workers=2, folds=1, epochs=1, seed=0,
    )
    tr = Trainer(cfg, default_tree,
                 os.path.join(synth_root, "fold_1", "train"),
                 os.path.join(synth_root, "fold_1", "val"),
                 str(tmp_path / "runs" / "fold_1"))
    closed = []
    for ld in (tr.train_loader, tr.val_loader):
        real = ld.close
        ld.close = (lambda r=real, L=ld: (closed.append(id(L)), r())[1])
    tr.close()
    assert len(closed) == 2


# ------------------------------------------- mesh-sharded fold ensemble
def test_mesh_sharded_ensemble_matches_single_device(tmp_path, assets_dir,
                                                     default_tree,
                                                     monkeypatch):
    """Fold-ensemble Predictor with a fold-axis mesh (weights sharded over
    devices, pmean over the fold axis) returns the same fold-mean probs as
    the single-device vmapped ensemble."""
    import jax
    from jax.sharding import Mesh

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
    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.serving."
        "build_model",
        lambda *a, **k: small_model,
    )
    x = np.random.default_rng(5).normal(size=(2, 32, 32, 3)).astype(np.float32)
    cfg = RunConfig(tree_root=str(assets_dir / "class_tree_tl.json"),
                    class_map=str(assets_dir / "class_map.csv"),
                    model_select=0, model_type=1, img_size=32)
    ckpts = []
    for fold, seed in ((1, 0), (2, 7)):
        state, _ = create_train_state(
            small_model, jax.random.PRNGKey(seed), x[:1], 0.0)
        d = tmp_path / f"fold_{fold}"
        d.mkdir()
        p = str(d / "best.ckpt")
        save_checkpoint(p, state, epoch=1, loss=0.0, test_measure_mean=0.5,
                        test_measure_std=0.0)
        ckpts.append(p)

    ref = Predictor(cfg, ckpts, tree=default_tree)(x)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("fold",))
    sharded = Predictor(cfg, ckpts, tree=default_tree, mesh=mesh)
    # the stacked weights actually shard over the fold axis
    leaf = jax.tree_util.tree_leaves(sharded._stacked)[0]
    assert len(leaf.sharding.device_set) == 2
    out = sharded(x)
    for lvl in range(2):
        np.testing.assert_allclose(out["probs"][lvl], ref["probs"][lvl],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(out["class_maps"][lvl],
                                      ref["class_maps"][lvl])

    # wrong axis name is refused loudly
    bad = Mesh(np.asarray(jax.devices()[:2]), ("data",))
    with pytest.raises(ValueError, match="fold"):
        Predictor(cfg, ckpts, tree=default_tree, mesh=bad)
