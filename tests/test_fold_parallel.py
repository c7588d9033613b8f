"""Fold-parallel cross-validation training (train/fold_parallel.py).

The reference trains folds sequentially (train.py:546). The fold-parallel
trainer runs every fold as one shard_map/vmap program with the fold axis
manual over the mesh — these tests pin that this is a pure *scheduling*
change: per-fold trajectories, metrics.csv layout, and checkpoints match the
sequential ``Trainer`` on the same data and seeds.
"""
import ast
import csv
import os

import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.config.run import (
    RunConfig,
)
from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
    write_synth_dataset,
)
from restrictive_hierarchical_semantic_segmentation_tpu.parallel.mesh import (
    DATA_AXIS, FOLD_AXIS, SPACE_AXIS, make_fold_mesh,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import train

ASSETS = os.path.join(os.path.dirname(__file__), "..", "assets")


def _cfg(data_root, save_path, **kw):
    base = dict(
        save_path=save_path, data_root=data_root,
        tree_root=os.path.join(ASSETS, "class_tree_tl.json"),
        class_map=os.path.join(ASSETS, "class_map.csv"),
        model_select=0, model_type=1, img_size=32, epochs=2, batch_size=2,
        folds=2, inc_cross_val=True, lr=1e-3, num_workers=2, seed=0,
    )
    base.update(kw)
    return RunConfig(**base)


def _read_csv_rows(path):
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    return rows


def _numeric_row(row):
    """Flatten a metrics.csv row into comparable floats (scalar columns and
    the list-valued level-loss / class-metrics columns)."""
    vals = []
    for cell in row:
        try:
            vals.append(float(cell))
        except ValueError:
            parsed = ast.literal_eval(cell)
            if parsed and isinstance(parsed[0], dict):
                for d in parsed:
                    vals.extend(float(v) for v in d.values())
            else:
                vals.extend(float(v) for v in parsed)
    return np.asarray(vals)


class TestFoldMesh:
    def test_five_folds_eight_devices(self):
        import jax

        mesh = make_fold_mesh(5, batch_size=4, devices=jax.devices())
        assert mesh.shape[FOLD_AXIS] == 5
        assert mesh.shape[DATA_AXIS] == 1
        assert mesh.shape[SPACE_AXIS] == 1

    def test_four_folds_use_all_devices(self):
        import jax

        mesh = make_fold_mesh(4, batch_size=4, devices=jax.devices())
        assert mesh.shape[FOLD_AXIS] == 4
        assert mesh.shape[DATA_AXIS] == 2

    def test_fold_axis_divides_folds(self):
        import jax

        # 6 folds on 8 devices: fold axis must divide 6 -> 3 folds/axis x2
        mesh = make_fold_mesh(6, batch_size=8, devices=jax.devices())
        assert 6 % mesh.shape[FOLD_AXIS] == 0
        assert mesh.shape[FOLD_AXIS] * mesh.shape[DATA_AXIS] <= 8

    def test_space_axis_carried(self):
        import jax

        mesh = make_fold_mesh(2, batch_size=4, n_space=2,
                              devices=jax.devices())
        assert mesh.shape[SPACE_AXIS] == 2
        assert mesh.shape[FOLD_AXIS] == 2


@pytest.fixture(scope="module")
def two_fold_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("fpdata")
    write_synth_dataset(str(root), 8, size=64, seed=3, folds=2)
    return str(root)


class TestFoldParallelTraining:
    def test_step_parity_with_sequential(self, two_fold_data, tmp_path):
        """The rigorous statement: one fold-parallel train step == the
        sequential Trainer's step, per fold, on identical batches (same math,
        different scheduling). Tight tolerance — only reduction-order noise."""
        import jax
        import jax.numpy as jnp

        from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (  # noqa: E501
            ClassTree,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.train.fold_parallel import (  # noqa: E501
            FoldParallelTrainer,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import (  # noqa: E501
            Trainer,
        )

        cfg = _cfg(two_fold_data, str(tmp_path / "sp"))
        tree = ClassTree.from_json(cfg.tree_root, cfg.class_map)
        fp = FoldParallelTrainer(cfg, tree, [1, 2])
        params0 = jax.device_get(
            jax.tree_util.tree_map(lambda l: l[0], fp.state.params))
        x, y = next(fp._stacked_batches(1))
        mask = jnp.ones((fp.n_levels,), jnp.float32)
        new_stack, aux_stack = fp.train_step(fp.state, x, y, mask)
        new_stack, aux_stack = jax.device_get((new_stack, aux_stack))

        for f, fold in enumerate((1, 2)):
            seq = Trainer(
                cfg, tree,
                os.path.join(two_fold_data, f"fold_{fold}", "train"),
                os.path.join(two_fold_data, f"fold_{fold}", "val"),
                str(tmp_path / f"seq_{fold}"),
            )
            seq.train_loader.set_epoch(1)
            xs, ys = next(iter(seq.train_loader))
            # identical loaders/seeds => identical batches
            np.testing.assert_array_equal(np.asarray(x)[f], xs)
            np.testing.assert_array_equal(np.asarray(y)[f], ys)
            new_seq, aux_seq = jax.device_get(
                seq.train_step(seq.state, xs, ys, mask))
            np.testing.assert_allclose(
                float(np.asarray(aux_stack["loss"])[f]),
                float(aux_seq["loss"]), rtol=1e-5)
            np.testing.assert_allclose(
                np.asarray(aux_stack["per_level"])[f],
                np.asarray(aux_seq["per_level"]), rtol=1e-4, atol=1e-6)
            # BN batch stats: pure batch means/vars — deterministic up to
            # reduction order, no AdamW sign amplification
            for sp, ss in zip(
                jax.tree_util.tree_leaves(new_stack.batch_stats),
                jax.tree_util.tree_leaves(new_seq.batch_stats),
            ):
                np.testing.assert_allclose(
                    np.asarray(sp)[f], np.asarray(ss), rtol=1e-4, atol=1e-6)
            # params: AdamW's first step is ~ -lr*sign(grad), so elements
            # with |grad| ~ 0 (symmetric untrained net) amplify reduction-
            # order noise to a full +-lr flip. Compare the significant
            # updates (|update| > lr/2), require near-total agreement.
            leaves_p = jax.tree_util.tree_leaves(new_stack.params)
            leaves_s = jax.tree_util.tree_leaves(new_seq.params)
            leaves_0 = jax.tree_util.tree_leaves(params0)
            assert len(leaves_p) == len(leaves_s) == len(leaves_0)
            n_sig, n_bad = 0, 0
            for lp, ls, l0 in zip(leaves_p, leaves_s, leaves_0):
                up = np.asarray(lp)[f] - np.asarray(l0)
                us = np.asarray(ls) - np.asarray(l0)
                sig = np.abs(us) > 0.5 * cfg.lr
                n_sig += int(sig.sum())
                n_bad += int(
                    (~np.isclose(up[sig], us[sig], rtol=0.1,
                                 atol=0.1 * cfg.lr)).sum())
            assert n_sig > 1000  # the batch actually moved the net
            assert n_bad / max(1, n_sig) < 0.01

    def test_matches_sequential(self, two_fold_data, tmp_path):
        # ONE epoch end-to-end through the CLI-level driver. Val-metric cells
        # are compared loosely: on a 4-step-old model the per-pixel argmax is
        # near-tied, so vmap/shard_map reduction-order noise flips boundary
        # pixels (train losses agree to ~3e-4; see test_step_parity for the
        # tight statement).
        seq_dir = str(tmp_path / "seq")
        par_dir = str(tmp_path / "par")
        res_seq = train(_cfg(two_fold_data, seq_dir, epochs=1))
        res_par = train(_cfg(two_fold_data, par_dir, epochs=1,
                             fold_parallel=True))
        assert len(res_seq) == len(res_par) == 2
        np.testing.assert_allclose(res_par, res_seq, atol=2e-2)
        for fold in (1, 2):
            rows_s = _read_csv_rows(
                os.path.join(seq_dir, f"fold_{fold}", "metrics.csv"))
            rows_p = _read_csv_rows(
                os.path.join(par_dir, f"fold_{fold}", "metrics.csv"))
            assert rows_s[0] == rows_p[0]  # header
            assert len(rows_s) == len(rows_p) == 2  # header + 1 epoch
            # train loss (col 1) tight; full row loose + tolerate isolated
            # rare-class coin-flip cells (0.0 vs 0.5 style) on the 4-step net
            np.testing.assert_allclose(
                float(rows_p[1][1]), float(rows_s[1][1]), rtol=2e-3)
            a, b = _numeric_row(rows_p[1]), _numeric_row(rows_s[1])
            close = np.isclose(a, b, rtol=0.1, atol=5e-2)
            assert close.mean() > 0.95, (
                f"fold {fold}: {int((~close).sum())}/{close.size} cells off")
            # both wrote best/last checkpoints
            for name in ("best.ckpt", "last.ckpt"):
                assert os.path.exists(
                    os.path.join(par_dir, f"fold_{fold}", name))

    def test_auto_resume_lockstep(self, two_fold_data, tmp_path):
        out = str(tmp_path / "resume")
        train(_cfg(two_fold_data, out, fold_parallel=True, epochs=1))
        # resume: epoch 2 appended, epoch-1 row preserved
        train(_cfg(two_fold_data, out, fold_parallel=True, epochs=2,
                   auto_resume=True))
        for fold in (1, 2):
            rows = _read_csv_rows(
                os.path.join(out, f"fold_{fold}", "metrics.csv"))
            assert [r[0] for r in rows] == ["Epoch", "1", "2"]

    def test_best_save_end_stacked_buffer(self, two_fold_data, tmp_path):
        """best_save='end' in fold-parallel keeps every fold's deferred best
        in ONE fold-sharded stacked buffer (not F replicated copies) and
        finalize() materializes per-fold best.ckpt files whose meta matches
        each fold's own best metrics.csv row."""
        from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (  # noqa: E501
            load_checkpoint,
        )

        out = str(tmp_path / "defer")
        train(_cfg(two_fold_data, out, fold_parallel=True, epochs=2,
                   best_save="end", ckpt_every=100))
        import json

        for fold in (1, 2):
            loc = os.path.join(out, f"fold_{fold}")
            rows = _read_csv_rows(os.path.join(loc, "metrics.csv"))
            measures = [float(r[16]) for r in rows[1:]]  # val measure_mean
            best_epoch = int(np.argmax(measures)) + 1
            with open(os.path.join(loc, "best.ckpt",
                                   "rhss_meta.json")) as f:
                meta = json.load(f)
            assert meta["epoch"] == best_epoch
            np.testing.assert_allclose(meta["test_measure_mean"],
                                       max(measures), rtol=1e-6)

    def test_init_failure_restores_resize_default(self, two_fold_data,
                                                  tmp_path):
        """A constructor failure after the n_space>1 resize switch must not
        leak 'matmul' as the process-wide resize default."""
        from restrictive_hierarchical_semantic_segmentation_tpu.ops.resize import (  # noqa: E501
            get_default_method,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.train.fold_parallel import (  # noqa: E501
            FoldParallelTrainer,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (  # noqa: E501
            ClassTree,
        )

        before = get_default_method()
        cfg = _cfg(two_fold_data, str(tmp_path / "x"), n_space=99)
        tree = ClassTree.from_json(cfg.tree_root, cfg.class_map)
        with pytest.raises(ValueError, match="n_space"):
            FoldParallelTrainer(cfg, tree, [1, 2])
        assert get_default_method() == before

    def test_rejects_ckpt_model_weights(self, two_fold_data, tmp_path):
        cfg = _cfg(two_fold_data, str(tmp_path / "x"), fold_parallel=True,
                   model_weights="some/dir/last.ckpt")
        with pytest.raises(ValueError, match="auto-resume"):
            train(cfg)

    def test_composes_with_space_sharding(self, two_fold_data, tmp_path):
        # fold (manual) x space (auto) in one program: the gather/lerp resize
        # trips an XLA GSPMD CHECK under this mesh (PartitionGather /
        # ExpandDeviceGroupsWithIota; repro: tools/fold_space_repro.py
        # --resize gather), so the trainer auto-switches to the gather-free
        # banded-matmul resize (ops/resize.py) for its traces — and restores
        # the process default afterwards
        from restrictive_hierarchical_semantic_segmentation_tpu.ops.resize import (  # noqa: E501
            get_default_method,
        )

        assert get_default_method() == "gather"
        out = str(tmp_path / "fs")
        train(_cfg(two_fold_data, out, fold_parallel=True, epochs=1,
                   n_space=2))
        assert get_default_method() == "gather"  # restored by close()
        for fold in (1, 2):
            rows = _read_csv_rows(
                os.path.join(out, f"fold_{fold}", "metrics.csv"))
            assert [r[0] for r in rows] == ["Epoch", "1"]
            assert np.isfinite(float(rows[1][1]))

    def test_composes_with_grad_accum(self, two_fold_data, tmp_path):
        # fold axis (shard_map) x microbatch scan (grad_accum) in one program
        out = str(tmp_path / "ga")
        train(_cfg(two_fold_data, out, fold_parallel=True, epochs=1,
                   batch_size=4, grad_accum=2))
        for fold in (1, 2):
            rows = _read_csv_rows(
                os.path.join(out, f"fold_{fold}", "metrics.csv"))
            assert [r[0] for r in rows] == ["Epoch", "1"]
            assert np.isfinite(float(rows[1][1]))

    def test_composes_with_device_data(self, two_fold_data, tmp_path):
        # device-resident augmentation per fold, fold stacking on device
        out = str(tmp_path / "dd")
        train(_cfg(two_fold_data, out, fold_parallel=True, epochs=1,
                   device_data=True))
        for fold in (1, 2):
            rows = _read_csv_rows(
                os.path.join(out, f"fold_{fold}", "metrics.csv"))
            assert [r[0] for r in rows] == ["Epoch", "1"]
            assert np.isfinite(float(rows[1][1]))

    def test_device_data_per_fold_placement(self, tmp_path):
        """batch 5 on 8 devices -> (fold=2, data=1) mesh: each fold's
        device-resident dataset lives on its own device and global batches
        assemble from per-device shards (no device-0 funnel)."""
        import jax

        from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (  # noqa: E501
            write_synth_dataset,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (  # noqa: E501
            ClassTree,
        )
        from restrictive_hierarchical_semantic_segmentation_tpu.train.fold_parallel import (  # noqa: E501
            FoldParallelTrainer,
        )

        data = str(tmp_path / "d")
        write_synth_dataset(data, 12, size=64, seed=6, folds=2)
        cfg = _cfg(data, str(tmp_path / "o"), batch_size=5, epochs=1,
                   fold_parallel=True, device_data=True)
        tree = ClassTree.from_json(cfg.tree_root, cfg.class_map)
        fp = FoldParallelTrainer(cfg, tree, [1, 2])
        assert fp.mesh.devices.shape == (2, 1, 1)
        assert fp._shard_stack
        devs = [ld.device for ld in fp.train_loaders]
        assert devs[0] != devs[1]  # one device per fold
        for ld in fp.train_loaders:
            ld.set_epoch(1)
        x, y = next(fp._stacked_batches(1))
        assert x.shape[0] == 2 and x.shape[1] == 5
        assert x.sharding.is_equivalent_to(fp.batch_shard, x.ndim)
        # shards sit where the folds' datasets sit
        shard_devs = {s.device for s in x.addressable_shards}
        assert shard_devs == set(devs)
        # and a real vmapped step consumes it
        import jax.numpy as jnp

        state, aux = fp.train_step(
            fp.state, x, y, jnp.ones((fp.n_levels,), jnp.float32))
        assert np.all(np.isfinite(np.asarray(aux["loss"])))
