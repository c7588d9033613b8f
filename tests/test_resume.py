"""Exact resume (VERDICT r1 item #3): train N epochs, stop, resume from
last.ckpt — the trajectory (metrics.csv rows, LR schedule, best-ckpt
decisions) must equal an uninterrupted run's.

The reference's only "resume" is weights-only ``--model-weights`` restart
(train.py:470-505): it loses the epoch counter, the optimizer moments'
schedule context, the ReduceLROnPlateau state, and deletes metrics.csv. Here
the orbax checkpoint restores the full TrainState (params + batch_stats +
AdamW moments + step), the meta sidecar restores epoch + scheduler, and
metrics.csv is appended past the checkpointed epoch.
"""
import csv
import json
import os

import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.config.run import RunConfig
from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
    write_synth_dataset,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_resume")
    write_synth_dataset(str(root), 6, size=96, seed=3, folds=1)
    return str(root)


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


def _cfg(root, save, assets_dir, **kw):
    defaults = dict(
        save_path=save,
        data_root=root,
        tree_root=str(assets_dir / "class_tree_tl.json"),
        class_map=str(assets_dir / "class_map.csv"),
        model_select=0,
        model_type=1,
        img_size=32,
        batch_size=2,
        val_batch=1,
        lr=1e-3,
        num_workers=2,
        inc_cross_val=True,
        folds=1,
        seed=0,
        # patience 0 so the scheduler actually acts within a 4-epoch run —
        # any best/num_bad_epochs state loss would change the LR trajectory
        lrs=True,
    )
    defaults.update(kw)
    return RunConfig(**defaults)


def _read_csv(path):
    with open(path, newline="") as f:
        return list(csv.reader(f))


def test_resume_matches_uninterrupted(tmp_path, synth_root, assets_dir,
                                      monkeypatch):
    _small_model(monkeypatch)
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import train

    total = 4

    # --- run A: uninterrupted 4 epochs
    cfg_a = _cfg(synth_root, str(tmp_path / "a"), assets_dir, epochs=total)
    train(cfg_a)
    dir_a = tmp_path / "a" / "fold_1"
    rows_a = _read_csv(dir_a / "metrics.csv")
    assert len(rows_a) == total + 1

    # --- run B: 2 epochs, then resume from last.ckpt for the remaining 2
    cfg_b1 = _cfg(synth_root, str(tmp_path / "b"), assets_dir, epochs=2)
    train(cfg_b1)
    dir_b = tmp_path / "b" / "fold_1"
    assert len(_read_csv(dir_b / "metrics.csv")) == 3

    cfg_b2 = _cfg(
        synth_root, str(tmp_path / "b"), assets_dir, epochs=total,
        model_weights=str(dir_b / "last.ckpt"),
    )
    train(cfg_b2)
    rows_b = _read_csv(dir_b / "metrics.csv")

    # identical shape: header + 4 epoch rows, epochs 1..4 each exactly once
    assert [r[0] for r in rows_b] == [r[0] for r in rows_a]
    # identical numbers: every scalar column matches the uninterrupted run
    for ra, rb in zip(rows_a[1:], rows_b[1:]):
        for ca, cb in zip(ra, rb):
            try:
                va, vb = float(ca), float(cb)
            except ValueError:
                assert ca == cb  # list-valued columns compare as strings
                continue
            np.testing.assert_allclose(vb, va, rtol=1e-4, atol=1e-6,
                                       err_msg=f"epoch {ra[0]}")

    # best-checkpoint decisions carried over: same best epoch + metric
    def best_meta(d):
        with open(os.path.join(d, "best.ckpt", "rhss_meta.json")) as f:
            return json.load(f)

    ma, mb = best_meta(dir_a), best_meta(dir_b)
    assert ma["epoch"] == mb["epoch"]
    np.testing.assert_allclose(
        mb["test_measure_mean"], ma["test_measure_mean"], rtol=1e-4
    )
    # scheduler state carried over: same final LR
    np.testing.assert_allclose(mb["sched_lr"], ma["sched_lr"], rtol=1e-6)


def test_resume_appends_not_deletes_csv(tmp_path, synth_root, assets_dir,
                                        monkeypatch):
    """A crashed run's metrics.csv survives resume: rows <= checkpoint epoch
    are kept, stale rows beyond it are dropped before appending."""
    _small_model(monkeypatch)
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import train

    cfg = _cfg(synth_root, str(tmp_path / "c"), assets_dir, epochs=2)
    train(cfg)
    d = tmp_path / "c" / "fold_1"
    csv_path = d / "metrics.csv"
    rows_before = _read_csv(csv_path)
    # simulate a crash that wrote a partial epoch-3 row after the last save
    with open(csv_path, "a", newline="") as f:
        csv.writer(f).writerow(["3", "999.0"] + [""] * 17)

    cfg2 = _cfg(synth_root, str(tmp_path / "c"), assets_dir, epochs=3,
                model_weights=str(d / "last.ckpt"))
    train(cfg2)
    rows_after = _read_csv(csv_path)
    assert [r[0] for r in rows_after] == ["Epoch", "1", "2", "3"]
    # epochs 1-2 kept verbatim; the stale epoch-3 row was replaced
    assert rows_after[1] == rows_before[1]
    assert rows_after[2] == rows_before[2]
    assert rows_after[3][1] != "999.0"


def test_auto_resume(tmp_path, synth_root, assets_dir, monkeypatch):
    """--auto-resume picks up fold_N/last.ckpt without --model-weights and
    continues the same trajectory (reuses the exact-resume machinery)."""
    _small_model(monkeypatch)
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import train

    cfg = _cfg(synth_root, str(tmp_path / "d"), assets_dir, epochs=2,
               auto_resume=True)
    train(cfg)  # fresh run — nothing to resume from
    d = tmp_path / "d" / "fold_1"
    rows2 = _read_csv(d / "metrics.csv")
    assert len(rows2) == 3

    cfg2 = _cfg(synth_root, str(tmp_path / "d"), assets_dir, epochs=4,
                auto_resume=True)
    train(cfg2)  # restart: must auto-resume from epoch 3
    rows4 = _read_csv(d / "metrics.csv")
    assert [r[0] for r in rows4] == ["Epoch", "1", "2", "3", "4"]
    assert rows4[1] == rows2[1] and rows4[2] == rows2[2]
