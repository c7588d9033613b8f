"""Async checkpointing (train/checkpoint.py CheckpointManager): the orbax
serialization runs in a background worker; update() snapshots and returns."""
import os

import numpy as np
import optax
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.train.checkpoint import (  # noqa: E501
    CheckpointManager,
    load_checkpoint,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
    TrainState,
)


def _tiny_state(value: float):
    import jax.numpy as jnp

    params = {"w": jnp.full((8, 8), value, jnp.float32)}
    tx = optax.sgd(1.0)
    return TrainState(params=params, batch_stats={},
                      opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


class TestAsyncCheckpoint:
    def test_ordering_and_completion(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        mgr.update(_tiny_state(1.0), 1, 0.5, 0.3, 0.0)
        mgr.update(_tiny_state(2.0), 2, 0.4, 0.6, 0.0)  # waits for save 1
        mgr.wait()
        st, meta = load_checkpoint(mgr.last_path, _tiny_state(0.0))
        assert meta["epoch"] == 2
        np.testing.assert_array_equal(np.asarray(st.params["w"]),
                                      np.full((8, 8), 2.0))
        # best gate: epoch 2 improved (0.6 > 0.3) -> best is epoch 2 too
        _, bmeta = load_checkpoint(mgr.best_path, _tiny_state(0.0))
        assert bmeta["epoch"] == 2 and mgr.prev_best == 0.6

    def test_snapshot_isolated_from_later_mutation(self, tmp_path):
        # the worker serializes a host snapshot — donating/overwriting the
        # device state after update() must not corrupt the file
        import jax

        mgr = CheckpointManager(str(tmp_path))
        state = _tiny_state(3.0)
        mgr.update(state, 1, 0.0, 0.1, 0.0)
        state = jax.tree_util.tree_map(lambda l: l * 0.0, state)  # clobber
        mgr.wait()
        st, _ = load_checkpoint(mgr.last_path, _tiny_state(0.0))
        np.testing.assert_array_equal(np.asarray(st.params["w"]),
                                      np.full((8, 8), 3.0))

    def test_worker_errors_surface(self, tmp_path, monkeypatch):
        mgr = CheckpointManager(str(tmp_path))

        def boom(*a, **k):
            raise RuntimeError("disk full")

        monkeypatch.setattr(
            "restrictive_hierarchical_semantic_segmentation_tpu.train."
            "checkpoint.save_checkpoint", boom)
        mgr.update(_tiny_state(1.0), 1, 0.0, 0.1, 0.0)
        with pytest.raises(RuntimeError, match="disk full"):
            mgr.wait()

    def test_sync_mode(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), async_save=False)
        mgr.update(_tiny_state(5.0), 1, 0.0, 0.1, 0.0)
        st, meta = load_checkpoint(mgr.last_path, _tiny_state(0.0))
        assert meta["epoch"] == 1

    def test_save_last_cadence_skips_fetch(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        # epoch 1: improving -> best saved even with save_last=False
        mgr.update(_tiny_state(1.0), 1, 0.0, 0.5, 0.0, save_last=False)
        mgr.wait()
        assert os.path.exists(mgr.best_path)
        assert not os.path.exists(mgr.last_path)
        # epoch 2: not improving, off-cadence -> nothing written
        mgr.update(_tiny_state(2.0), 2, 0.0, 0.4, 0.0, save_last=False)
        mgr.wait()
        assert not os.path.exists(mgr.last_path)
        # epoch 3: on-cadence -> last written at epoch 3
        mgr.update(_tiny_state(3.0), 3, 0.0, 0.3, 0.0, save_last=True)
        mgr.wait()
        _, meta = load_checkpoint(mgr.last_path, _tiny_state(0.0))
        assert meta["epoch"] == 3
        _, bmeta = load_checkpoint(mgr.best_path, _tiny_state(0.0))
        assert bmeta["epoch"] == 1  # best still epoch 1

    def test_internal_cadence(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), ckpt_every=2, final_epoch=5)
        mgr.update(_tiny_state(1.0), 1, 0.0, 0.5, 0.0)  # best; off-cadence
        mgr.update(_tiny_state(2.0), 2, 0.0, 0.4, 0.0)  # on-cadence
        mgr.update(_tiny_state(3.0), 3, 0.0, 0.3, 0.0)  # neither
        mgr.wait()
        _, meta = load_checkpoint(mgr.last_path, _tiny_state(0.0))
        assert meta["epoch"] == 2
        mgr.update(_tiny_state(5.0), 5, 0.0, 0.2, 0.0)  # final epoch
        mgr.wait()
        _, meta = load_checkpoint(mgr.last_path, _tiny_state(0.0))
        assert meta["epoch"] == 5

    def test_failed_save_surfaces_on_next_update(self, tmp_path, monkeypatch):
        import time

        mgr = CheckpointManager(str(tmp_path), ckpt_every=100)

        def boom(*a, **k):
            raise RuntimeError("disk full")

        monkeypatch.setattr(
            "restrictive_hierarchical_semantic_segmentation_tpu.train."
            "checkpoint.save_checkpoint", boom)
        mgr.update(_tiny_state(1.0), 1, 0.0, 0.5, 0.0)  # best -> async fail
        for _ in range(100):  # let the worker finish
            if mgr._pending.done():
                break
            time.sleep(0.05)
        with pytest.raises(RuntimeError, match="disk full"):
            # epoch 2: non-improving, off-cadence — must STILL surface the
            # earlier failure instead of silently skipping for 98 epochs
            mgr.update(_tiny_state(2.0), 2, 0.0, 0.4, 0.0)

    def test_rejects_bad_cadence(self, tmp_path):
        with pytest.raises(ValueError, match="ckpt_every"):
            CheckpointManager(str(tmp_path), ckpt_every=0)
        from restrictive_hierarchical_semantic_segmentation_tpu.config.run import (  # noqa: E501
            RunConfig,
        )

        with pytest.raises(ValueError, match="ckpt_every"):
            RunConfig(ckpt_every=0)
        with pytest.raises(ValueError, match="grad_accum"):
            RunConfig(grad_accum=0)


class TestDeferredBest:
    """best_save='end': improvements keep a device-side copy; best.ckpt is
    written once by finalize() with the best epoch's state."""

    def test_defers_until_finalize_and_picks_best_epoch(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), best_save="end", ckpt_every=100)
        assert mgr.update(_tiny_state(1.0), 1, 0.5, 0.3, 0.0)   # improves
        assert mgr.update(_tiny_state(2.0), 2, 0.4, 0.7, 0.0)   # improves
        assert not mgr.update(_tiny_state(3.0), 3, 0.3, 0.6, 0.0)  # worse
        mgr.wait()
        assert not os.path.exists(mgr.best_path)  # nothing written yet
        mgr.finalize()
        st, meta = load_checkpoint(mgr.best_path, _tiny_state(0.0))
        assert meta["epoch"] == 2 and meta["test_measure_mean"] == 0.7
        np.testing.assert_array_equal(np.asarray(st.params["w"]),
                                      np.full((8, 8), 2.0))

    def test_device_copy_isolated_from_donation_style_mutation(self, tmp_path):
        # the deferred snapshot must not alias the live state's buffers
        import jax.numpy as jnp

        mgr = CheckpointManager(str(tmp_path), best_save="end", ckpt_every=100)
        st = _tiny_state(5.0)
        mgr.update(st, 1, 0.5, 0.9, 0.0)
        st = st.replace(params={"w": st.params["w"] * 0 - 1.0})  # "donated"
        del st
        mgr.finalize()
        best, meta = load_checkpoint(mgr.best_path, _tiny_state(0.0))
        np.testing.assert_array_equal(np.asarray(best.params["w"]),
                                      np.full((8, 8), 5.0))

    def test_cadence_last_still_written(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), best_save="end", ckpt_every=2)
        mgr.update(_tiny_state(1.0), 1, 0.5, 0.3, 0.0)
        mgr.update(_tiny_state(2.0), 2, 0.4, 0.6, 0.0)  # cadence + improve
        mgr.wait()
        assert os.path.exists(mgr.last_path)
        # the pending deferred best rides the cadence flush to disk
        assert os.path.exists(mgr.best_path)
        _, lmeta = load_checkpoint(mgr.last_path, _tiny_state(0.0))
        assert lmeta["epoch"] == 2
        mgr.finalize()
        _, bmeta = load_checkpoint(mgr.best_path, _tiny_state(0.0))
        assert bmeta["epoch"] == 2

    def test_cadence_flush_bounds_crash_loss(self, tmp_path):
        """A kill between cadences loses at most ckpt_every epochs of best:
        the deferred best is flushed with every last.ckpt, and a resumed
        manager re-seeds its gate from the flushed meta."""
        mgr = CheckpointManager(str(tmp_path), best_save="end", ckpt_every=2)
        mgr.update(_tiny_state(1.0), 1, 0.5, 0.9, 0.0)   # improve (defer)
        mgr.update(_tiny_state(2.0), 2, 0.4, 0.4, 0.0)   # cadence -> flush
        mgr.wait()
        st, bmeta = load_checkpoint(mgr.best_path, _tiny_state(0.0))
        assert bmeta["epoch"] == 1 and bmeta["test_measure_mean"] == 0.9
        np.testing.assert_array_equal(np.asarray(st.params["w"]),
                                      np.full((8, 8), 1.0))
        # simulate a crash + --auto-resume: a fresh manager re-seeds the gate
        mgr2 = CheckpointManager(str(tmp_path), best_save="end", ckpt_every=2)
        assert mgr2.prev_best == 0.9
        assert not mgr2.update(_tiny_state(3.0), 3, 0.3, 0.5, 0.0)  # worse
        mgr2.finalize()
        _, bmeta = load_checkpoint(mgr2.best_path, _tiny_state(0.0))
        assert bmeta["epoch"] == 1  # pre-crash best survived the restart

    def test_defer_early_return_surfaces_failed_save(self, tmp_path,
                                                     monkeypatch):
        import time

        mgr = CheckpointManager(str(tmp_path), best_save="end", ckpt_every=2)
        mgr.update(_tiny_state(1.0), 1, 0.5, 0.3, 0.0)   # improve (defer)

        def boom(*a, **k):
            raise RuntimeError("disk full")

        monkeypatch.setattr(
            "restrictive_hierarchical_semantic_segmentation_tpu.train."
            "checkpoint.save_checkpoint", boom)
        mgr.update(_tiny_state(2.0), 2, 0.4, 0.2, 0.0)   # cadence -> fails
        for _ in range(100):
            if mgr._pending.done():
                break
            time.sleep(0.05)
        with pytest.raises(RuntimeError, match="disk full"):
            # epoch 3: improving off-cadence (defer early-return path) must
            # STILL surface the epoch-2 failure
            mgr.update(_tiny_state(3.0), 3, 0.3, 0.8, 0.0)

    def test_defer_hooks(self, tmp_path):
        """Owner-managed deferred-best storage: snapshot returns a handle,
        fetch materializes it (fold-parallel's stacked-buffer contract)."""
        store = {}

        def snap(state):
            store["best"] = state  # owner keeps it; handle is a key
            return "best"

        def fetch(handle):
            return store[handle]

        mgr = CheckpointManager(str(tmp_path), best_save="end",
                                ckpt_every=100, defer_snapshot=snap,
                                defer_fetch=fetch)
        mgr.update(_tiny_state(7.0), 1, 0.5, 0.9, 0.0)
        assert mgr._deferred_best[0] == "best"  # handle, not a state copy
        mgr.finalize()
        st, meta = load_checkpoint(mgr.best_path, _tiny_state(0.0))
        assert meta["epoch"] == 1
        np.testing.assert_array_equal(np.asarray(st.params["w"]),
                                      np.full((8, 8), 7.0))

    def test_defer_hooks_must_come_together(self, tmp_path):
        with pytest.raises(ValueError, match="together"):
            CheckpointManager(str(tmp_path), defer_snapshot=lambda s: s)

    def test_rejects_bad_policy(self, tmp_path):
        with pytest.raises(ValueError):
            CheckpointManager(str(tmp_path), best_save="never")
