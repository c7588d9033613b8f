"""Fold-parallel cross-validation training: every fold at once, one program.

The reference trains its 5 cross-validation folds strictly sequentially
(train.py:546: ``for fold_n in range(folds)``), so a full TL-pano experiment
costs 5x the single-fold wall-clock. Folds are independent models on disjoint
data — embarrassingly parallel — which on TPU maps to a *vmapped* train step:
every per-fold ``TrainState`` is stacked along a leading ``fold`` axis, the
step from ``steps.make_train_step`` is ``jax.vmap``-ed over that axis, and the
axis is sharded over the mesh's ``fold`` dimension
(``parallel.mesh.make_fold_mesh``). XLA then partitions the single SPMD
program so each fold's compute, gradient reductions, and BatchNorm statistics
stay entirely inside that fold's device group — zero cross-fold collectives,
and 5-fold training on a v5e-8 costs one fold's wall-clock.

Per-fold host-side semantics are preserved exactly: each fold keeps its own
ReduceLROnPlateau trajectory (the stacked optimizer carries a per-fold
learning-rate vector through ``optax.inject_hyperparams``), its own
best/last checkpoints and metrics.csv in the sequential ``Trainer``'s exact
layout, so downstream tooling (``cli.predict_eval``, ``cli.agreement``) is
oblivious to how folds trained. JSONL/TensorBoard logs add one key —
``concurrent_folds`` — because ``sec_per_epoch`` there is the stacked
epoch's wall clock shared by all folds.

Epoch-length note: folds step in lockstep inside the one program, so an epoch
runs ``min_f(len(loader_f))`` steps; if fold shard sizes differ the surplus
batches of longer folds are dropped for that epoch (logged, never silent) —
the same images return in later epochs via per-epoch reshuffling.
"""
from __future__ import annotations

import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config.run import RunConfig
from ..data.loader import prefetch_to_device
from ..hierarchy.tree import ClassTree
from ..metrics.segmentation import MetricAccumulator
from ..models.hierarchical import build_model
from ..parallel.mesh import DATA_AXIS, FOLD_AXIS, SPACE_AXIS, make_fold_mesh
from .checkpoint import CheckpointManager, load_checkpoint
from .loop import (append_csv, dump_prediction_images, make_loaders,
                   run_validation, truncate_csv)
from .plateau import ReduceLROnPlateau
from .state import create_train_state
from .steps import make_eval_step, make_train_step

__all__ = ["FoldParallelTrainer", "train_folds_parallel"]


def _stack_states(states):
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *states)


class FoldParallelTrainer:
    """All folds' build + epoch machinery as one vmapped SPMD program."""

    def __init__(self, cfg: RunConfig, tree: ClassTree, fold_ids: List[int]):
        self.cfg = cfg
        self.tree = tree
        self.fold_ids = list(fold_ids)
        self._restore_resize = None
        self.save_locs, self.train_loaders, self.val_loaders = [], [], []
        try:
            self._build()
        except BaseException:
            # construction failed partway: restore the process-global resize
            # default and release any loader pools already created, instead
            # of leaking them into the rest of the process
            self.close()
            raise

    def _build(self):
        cfg, tree = self.cfg, self.tree
        F = len(self.fold_ids)
        from ..utils.compile_cache import enable as _enable_cache

        _enable_cache()
        # multi-process (jax.distributed): every process drives the SAME
        # global fold mesh (fold groups land on contiguous device ranges, so
        # with F a multiple of the process count each fold's collectives stay
        # inside one process's chips); exactly one process writes artifacts
        self.multiproc = jax.process_count() > 1
        self.is_main = jax.process_index() == 0

        hier = cfg.hierarchical
        self.num_classes_per_level = (
            list(tree.classes_per_level) if hier else [tree.num_leaves]
        )
        self.n_levels = len(self.num_classes_per_level)

        # --- mesh (first: device-data loaders upload straight to their fold
        # device) ------------------------------------------------------------
        if cfg.n_space > 1:
            # the gather/lerp resize gathers along the space-sharded H axis,
            # which trips an XLA GSPMD CHECK under the partial-manual fold
            # mesh (spmd_partitioner_util.cc partition_group_list CHECK via
            # PartitionGather / ExpandDeviceGroupsWithIota; repro:
            # tools/fold_space_repro.py --resize gather). The banded-matmul
            # resize formulation (ops/resize.py) is numerically identical,
            # contains no gather, and partitions cleanly — make it the
            # default for every trace this trainer owns (train + eval steps;
            # resolved before the jit boundary, so compile caches are keyed
            # by formulation)
            from ..ops.resize import get_default_method, set_default_method

            self._restore_resize = get_default_method()
            set_default_method("matmul")
            print("fold x space mesh: resize switched to the gather-free "
                  "matmul formulation (XLA partial-manual partitioner "
                  "rejects gathers on the space-sharded axis)")
        self.mesh = make_fold_mesh(F, cfg.batch_size, cfg.n_space)
        n_fold_mesh, n_data_mesh, n_space_mesh = self.mesh.devices.shape
        # device-data + one-device-per-fold mesh: each fold's resident
        # dataset (and its augmentation) lives on ITS fold device, and the
        # global stacked batch assembles directly from the per-device shards
        # (jax.make_array_from_single_device_arrays) — no host round-trip,
        # no device-0 funnel, no transient all-folds-on-one-device upload
        self._shard_stack = (
            cfg.device_data and not self.multiproc and n_fold_mesh == F
            and n_data_mesh == 1 and n_space_mesh == 1
        )
        loader_cfg = cfg
        if self.multiproc and cfg.device_data:
            # device-resident per-fold datasets are a single-process
            # optimization (a fold's device may belong to another process);
            # fall back to the deterministic host pipeline, whose global
            # batches every process assembles identically
            # (prefetch_to_device slices each process's shards locally)
            from dataclasses import replace as _dc_replace

            loader_cfg = _dc_replace(cfg, device_data=False)
            if self.is_main:
                print("fold-parallel multi-process: --device-data falls back "
                      "to the host pipeline (fold devices span processes)")

        # --- per-fold data / output dirs ------------------------------------
        for f, fold in enumerate(self.fold_ids):
            train_root = os.path.join(cfg.data_root, f"fold_{fold}", "train")
            val_root = os.path.join(cfg.data_root, f"fold_{fold}", "val")
            save_loc = os.path.join(cfg.save_path, f"fold_{fold}")
            os.makedirs(save_loc, exist_ok=True)
            tr, va = make_loaders(
                loader_cfg, tree, train_root, val_root,
                device=(self.mesh.devices[f, 0, 0] if self._shard_stack
                        else None),
            )
            self.save_locs.append(save_loc)
            self.train_loaders.append(tr)
            self.val_loaders.append(va)

        # --- model / stacked state ------------------------------------------
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        hrnet_cfg = None
        if cfg.hrnet_yaml:
            from ..config.hrnet import resolve_hrnet_config

            hrnet_cfg = resolve_hrnet_config(cfg.hrnet_yaml)
        self.model = build_model(
            tree, cfg.model_select, cfg.model_type, hrnet_cfg, dtype,
            cfg.concat_prev_probs, cfg.remat,
        )
        sample = np.zeros((1, cfg.img_size, cfg.img_size, 3), np.float32)
        # one init shared by all folds — matches the sequential Trainer, which
        # seeds every fold with PRNGKey(cfg.seed) (fold trajectories diverge
        # through their disjoint data, as in the reference)
        template, self.tx = create_train_state(
            self.model, jax.random.PRNGKey(cfg.seed), sample, cfg.lr,
            cfg.weight_decay,
        )
        if cfg.model_weights and cfg.model_weights.endswith((".pt", ".pth")):
            from .torch_import import load_donor_weights

            params, bstats = load_donor_weights(
                cfg.model_weights, template.params, template.batch_stats,
                cfg.model_select,
            )
            template = template.replace(params=params, batch_stats=bstats)
        elif cfg.model_weights:
            raise ValueError(
                "fold-parallel training resumes via --auto-resume True "
                "(per-fold last.ckpt); --model-weights accepts only donor "
                ".pt/.pth files here"
            )
        fold_states, self.start_epoch = self._resume_or_init(template, F)

        self._fold_shard = NamedSharding(self.mesh, P(FOLD_AXIS))
        if self.multiproc:
            # device_put cannot target non-addressable devices; every process
            # holds the same host-side fold states, so each assembles the
            # global stacked state from its local shards
            def _stack_put(*leaves):
                x = np.stack([np.asarray(lf) for lf in leaves])
                return jax.make_array_from_callback(
                    x.shape, self._fold_shard, lambda idx: x[idx])

            self.state = jax.tree_util.tree_map(_stack_put, *fold_states)
        else:
            self.state = jax.device_put(
                _stack_states(fold_states), self._fold_shard
            )
        self.batch_shard = NamedSharding(
            self.mesh, P(FOLD_AXIS, DATA_AXIS, SPACE_AXIS, None, None)
        )
        # per-fold validation runs the plain eval step on a fold-replicated
        # state slice; batches ride the same mesh (shape-flexible over folds)
        self.eval_batch_shard = NamedSharding(
            self.mesh, P(None, SPACE_AXIS, None, None)
        )
        self._slice_fold = jax.jit(
            lambda s, i: jax.tree_util.tree_map(lambda l: l[i], s),
            out_shardings=NamedSharding(self.mesh, P()),
        )
        # deferred-best storage (best_save='end'): ONE stacked fold-sharded
        # buffer holding every fold's best-so-far state. Per-chip cost is the
        # chip's own fold shard (~1x state), vs F fully-replicated per-fold
        # copies (~F x state per chip) if each CheckpointManager kept its own
        # jnp.copy of the replicated _slice_fold output.
        self._best_stacked = None
        stacked_shard = NamedSharding(self.mesh, P(FOLD_AXIS))
        self._copy_stacked = jax.jit(
            lambda s: jax.tree_util.tree_map(jnp.copy, s),
            out_shardings=stacked_shard,
        )
        self._scatter_fold = jax.jit(
            lambda best, cur, i: jax.tree_util.tree_map(
                lambda b, c: b.at[i].set(c[i]), best, cur),
            out_shardings=stacked_shard, donate_argnums=(0,),
        )

        # --- steps ----------------------------------------------------------
        lw = cfg.level_weights
        ohem = (cfg.ohem_thres, cfg.ohem_keep) if cfg.use_ohem else None
        raw_step = make_train_step(
            self.model, self.tx, tree, hier, lw, cfg.lambda_cons,
            cfg.lambda_kl, ohem=ohem, jit=False,
            grad_accum=cfg.grad_accum,
        )
        # fold axis is MANUAL (shard_map): each fold device group compiles the
        # plain per-fold step, so fold sharding never leaks into the channel
        # dims of the batched-conv backward (pure vmap + GSPMD does exactly
        # that, triggering involuntary full-rematerialization reshards).
        # data/space stay auto — GSPMD partitions inside each fold group
        # exactly as in the sequential Trainer. The inner vmap covers
        # F // mesh_fold local folds (usually 1).
        local_step = jax.vmap(raw_step, in_axes=(0, 0, 0, None))
        sharded_step = jax.shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(P(FOLD_AXIS), P(FOLD_AXIS), P(FOLD_AXIS), P()),
            out_specs=(P(FOLD_AXIS), P(FOLD_AXIS)),
            axis_names=frozenset({FOLD_AXIS}),
            check_vma=False,
        )
        # multi-process: pin step aux (and eval outputs) replicated so every
        # process's host fetches (metrics, checkpoint decisions, the nan
        # probe) read local shards — same rationale as the sequential
        # Trainer (see steps.py); the state stays fold-sharded
        step_out = ((self._fold_shard, NamedSharding(self.mesh, P()))
                    if self.multiproc else None)
        self.train_step = jax.jit(sharded_step, donate_argnums=(0,),
                                  out_shardings=step_out)
        self.eval_step = make_eval_step(
            self.model, tree, hier, lw, cfg.lambda_cons, cfg.lambda_kl,
            ohem=ohem, return_outputs=cfg.save_images_batch,
            out_shardings=(NamedSharding(self.mesh, P())
                           if self.multiproc else None),
        )
        self.ckpts = [
            CheckpointManager(loc, ckpt_every=cfg.ckpt_every,
                              final_epoch=cfg.epochs,
                              best_save=cfg.best_save,
                              defer_snapshot=(
                                  lambda _state, f=f: self._snap_best(f)),
                              defer_fetch=self._fetch_best,
                              write=self.is_main)
            for f, loc in enumerate(self.save_locs)
        ]

    # --------------------------------------------------------------- resume
    def _resume_or_init(self, template, F: int):
        """All-or-nothing resume: folds advance in lockstep, so resuming needs
        every fold checkpointed at the SAME epoch (the normal crash case —
        this trainer checkpoints all folds each epoch). Anything else starts
        fresh with a warning."""
        cfg = self.cfg
        self.scheds = (
            [ReduceLROnPlateau(cfg.lr, "max", 0.5, 3, min_lr=cfg.lrs_min)
             for _ in range(F)] if cfg.lrs else None
        )
        if not cfg.auto_resume:
            return [template] * F, 1
        paths = [os.path.join(loc, "last.ckpt") for loc in self.save_locs]
        if not all(os.path.exists(p) for p in paths):
            if any(os.path.exists(p) for p in paths):
                print("fold-parallel auto-resume: not every fold has a "
                      "last.ckpt — starting fresh")
            return [template] * F, 1
        states, metas = [], []
        for p in paths:
            s, meta = load_checkpoint(p, template)
            states.append(s)
            metas.append(meta)
        epochs = {int(m.get("epoch", 0)) for m in metas}
        if len(epochs) != 1:
            print(f"fold-parallel auto-resume: folds at different epochs "
                  f"{sorted(epochs)} — starting fresh")
            return [template] * F, 1
        start = epochs.pop() + 1
        if self.scheds is not None:
            for sched, meta in zip(self.scheds, metas):
                if "sched_lr" in meta:
                    best = meta.get("sched_best")
                    sched.load_state_dict({
                        "lr": meta["sched_lr"],
                        "best": None if best is None or best != best else best,
                        "num_bad_epochs":
                            int(meta.get("sched_num_bad_epochs", 0)),
                    })
        print(f"fold-parallel auto-resume: all {F} folds at epoch "
              f"{start - 1}, resuming")
        return states, start

    # --------------------------------------------------------------- epochs
    def _set_learning_rates(self, lrs):
        hp = dict(self.state.opt_state.hyperparams)
        if self.multiproc:
            arr = np.asarray(lrs, np.float32)
            lr_global = jax.make_array_from_callback(
                arr.shape, self._fold_shard, lambda idx: arr[idx])
        else:
            lr_global = jax.device_put(
                jnp.asarray(lrs, jnp.float32), self._fold_shard)
        hp["learning_rate"] = lr_global
        self.state = self.state.replace(
            opt_state=self.state.opt_state._replace(hyperparams=hp)
        )

    def _stacked_batches(self, epoch: int):
        for loader in self.train_loaders:
            loader.set_epoch(epoch)
        lens = [len(ld) for ld in self.train_loaders]
        if max(lens) > min(lens):
            print(f"fold-parallel epoch {epoch}: folds have {lens} batches; "
                  f"running {min(lens)} lockstep steps "
                  f"(longer folds drop their surplus this epoch)")
        its = [iter(ld) for ld in self.train_loaders]
        for _ in range(min(lens)):
            batches = [next(it) for it in its]
            if self._shard_stack:
                yield (self._from_shards([b[0] for b in batches]),
                       self._from_shards([b[1] for b in batches]))
                continue
            # device-data loaders yield device arrays — stack on device
            # (jnp) instead of round-tripping through host numpy
            stack = (jnp.stack if isinstance(batches[0][0], jax.Array)
                     else np.stack)
            yield (stack([b[0] for b in batches]),
                   stack([b[1] for b in batches]))

    def _from_shards(self, fold_arrays):
        """(B, ...) per-fold arrays, each on its fold device -> the global
        (F, B, ...) array sharded P(fold, ...) with zero data movement."""
        shards = [a[None] for a in fold_arrays]  # (1, B, ...) shard shape
        global_shape = (len(shards),) + tuple(fold_arrays[0].shape)
        return jax.make_array_from_single_device_arrays(
            global_shape, self.batch_shard, shards
        )

    def train_epoch(self, epoch: int):
        cfg = self.cfg
        mask = jnp.asarray(
            cfg.level_mask_for_epoch(epoch, self.n_levels), jnp.float32
        )
        t0 = time.time()
        n = 0
        device_aux = []
        from ..utils.profiling import trace

        profile = cfg.profile_dir if epoch == 2 else None
        probe = max(0, int(cfg.nan_probe_every))
        with trace(profile):
            for x, y in prefetch_to_device(
                self._stacked_batches(epoch), 2, self.batch_shard
            ):
                self.state, aux = self.train_step(self.state, x, y, mask)
                device_aux.append(aux)
                n += 1
                if probe and n % probe == 0:
                    # periodic fail-fast across all folds (one scalar-vector
                    # fetch; bounds garbage-step blast radius to `probe`)
                    lv = np.asarray(jax.device_get(aux["loss"]))
                    if not np.all(np.isfinite(lv)):
                        bad = int(np.argmax(~np.isfinite(lv)))
                        raise FloatingPointError(
                            f"non-finite loss {lv[bad]} in fold "
                            f"{self.fold_ids[bad]} at epoch {epoch} "
                            f"step {n - 1}"
                        )
        all_aux = jax.device_get(device_aux)
        dt = time.time() - t0

        F = len(self.fold_ids)
        results = []
        for f in range(F):
            acc = MetricAccumulator(self.num_classes_per_level)
            losses, level_losses = [], np.zeros((self.n_levels,))
            for step_idx, aux in enumerate(all_aux):
                loss_val = float(np.asarray(aux["loss"])[f])
                if not np.isfinite(loss_val):
                    raise FloatingPointError(
                        f"non-finite loss {loss_val} in fold "
                        f"{self.fold_ids[f]} at epoch {epoch} step {step_idx}"
                    )
                losses.append(loss_val)
                level_losses += np.asarray(aux["per_level"])[f]
                acc.update([np.asarray(c)[f] for c in aux["confmats"]])
            denom = max(1, n * cfg.batch_size)
            results.append({
                "loss": float(np.mean(losses)) if losses else 0.0,
                "level_loss": (level_losses / denom).tolist(),
                "overall": acc.epoch_overall(),
                "per_class": acc.epoch_per_class(),
                "time": dt,
                "steps": n,
            })
        return results

    def _snap_best(self, f: int) -> int:
        """Deferred-best snapshot hook (``best_save='end'``): record fold
        ``f``'s current state into the fold-sharded stacked buffer; the fold
        index is the handle (the buffer always holds the newest snapshot for
        each fold, matching the newest deferred meta)."""
        if self._best_stacked is None:
            self._best_stacked = self._copy_stacked(self.state)
        else:
            self._best_stacked = self._scatter_fold(
                self._best_stacked, self.state, jnp.int32(f))
        return f

    def _fetch_best(self, f: int):
        """Deferred-best fetch hook: materialize fold ``f``'s snapshot on
        host (flush/finalize time — the fold's one device->host best fetch)."""
        return jax.device_get(self._slice_fold(self._best_stacked,
                                               jnp.int32(f)))

    def evaluate_fold(self, f: int, epoch: int, dump_images: bool = False):
        sliced = self._slice_fold(self.state, jnp.int32(f))
        dump_fn = (
            (lambda outputs: dump_prediction_images(
                outputs, self.save_locs[f], epoch))
            if dump_images else None
        )
        return run_validation(
            self.eval_step, sliced.params, sliced.batch_stats,
            self.val_loaders[f], self.eval_batch_shard,
            self.num_classes_per_level, self.cfg.val_batch, dump_fn=dump_fn,
        )

    def run(self):
        cfg = self.cfg
        F = len(self.fold_ids)
        from ..utils.logging import MetricsLogger

        csv_paths, loggers = [], []
        for loc in self.save_locs:
            path = os.path.join(loc, "metrics.csv")
            if self.is_main and os.path.exists(path):
                if self.start_epoch > 1:
                    truncate_csv(path, self.start_epoch)
                else:
                    os.remove(path)  # fresh run (train.py:599-600)
            csv_paths.append(path)
            logger = (MetricsLogger(os.path.join(loc, "logs"),
                                    tensorboard=cfg.tensorboard)
                      if self.is_main else None)
            if logger:
                logger.truncate_after(self.start_epoch - 1)
            loggers.append(logger)

        for epoch in range(self.start_epoch, cfg.epochs + 1):
            if self.scheds is not None:
                self._set_learning_rates([s.lr for s in self.scheds])
            trs = self.train_epoch(epoch)
            dump = cfg.save_images_batch and (
                epoch % cfg.save_images_batch_num == 0 or epoch == 1
            )
            for f in range(F):
                va = self.evaluate_fold(
                    f, epoch, dump_images=dump and self.is_main)
                tr = trs[f]
                lr_f = (self.scheds[f].lr if self.scheds is not None
                        else cfg.lr)
                if self.is_main:
                    append_csv(csv_paths[f], epoch, tr, va)
                    print(
                        f"Fold {self.fold_ids[f]} epoch {epoch}: "
                        f"train loss {tr['loss']:.4f} "
                        f"({tr['steps']} steps, {tr['time']:.1f}s all folds) "
                        f"| val dice(no bg) {va['measure_mean']:.4f} "
                        f"iou {va['overall']['iou']:.4f} lr {lr_f:.5f}",
                        flush=True,
                    )
                    # sec_per_epoch is the WALL clock of the stacked epoch
                    # (all folds trained concurrently in it);
                    # concurrent_folds lets tooling normalize against
                    # sequential-Trainer logs
                    loggers[f].log(epoch, {
                        "loss": tr["loss"], "dice": tr["overall"]["dice"],
                        "iou": tr["overall"]["iou"],
                        "sec_per_epoch": tr["time"], "concurrent_folds": F,
                        "lr": lr_f,
                    }, prefix="train")
                    loggers[f].log(epoch, {
                        "loss": va["loss"], "dice_no_bg": va["measure_mean"],
                        "iou": va["overall"]["iou"],
                        "dice": va["overall"]["dice"],
                    }, prefix="val")
                if self.scheds is not None:
                    self.scheds[f].step(va["measure_mean"])
                sched_meta = (
                    {f"sched_{k}": (v if v is not None else float("nan"))
                     for k, v in self.scheds[f].state_dict().items()}
                    if self.scheds is not None else {}
                )
                self.ckpts[f].update(
                    self._slice_fold(self.state, jnp.int32(f)), epoch,
                    tr["loss"], va["measure_mean"], va["measure_std"],
                    **sched_meta,
                )
        for c in self.ckpts:
            c.finalize()  # drain async saves; materialize deferred bests
        return [c.prev_best for c in self.ckpts]

    def close(self):
        """Release all folds' loader worker pools (process pools hold OS
        processes; F folds x2 loaders otherwise leak until exit) and restore
        the process resize default if the space mesh switched it."""
        for ld in (*self.train_loaders, *self.val_loaders):
            if hasattr(ld, "close"):
                ld.close()
        self._best_stacked = None  # free the deferred-best HBM buffer
        if getattr(self, "_restore_resize", None) is not None:
            from ..ops.resize import set_default_method

            set_default_method(self._restore_resize)
            self._restore_resize = None


def train_folds_parallel(cfg: RunConfig, tree: Optional[ClassTree] = None,
                         fold_ids: Optional[List[int]] = None):
    """All-folds-at-once driver (the ``--fold-parallel True`` path of
    ``loop.train``). Requires the cross-val ``data_root/fold_N/{train,val}``
    layout (train.py:796-803)."""
    if tree is None:
        tree = ClassTree.from_json(cfg.tree_root, cfg.class_map)
    if fold_ids is None:
        folds = cfg.folds if cfg.inc_cross_val and cfg.folds > 0 else 1
        fold_ids = [cfg.fold] if cfg.fold > 0 else list(range(1, folds + 1))
    if jax.process_index() == 0:
        print(f"Fold-parallel training: folds {fold_ids} as one vmapped "
              f"program")
    trainer = FoldParallelTrainer(cfg, tree, fold_ids)
    if trainer.is_main:
        print(f"mesh: "
              f"{dict(zip(trainer.mesh.axis_names, trainer.mesh.devices.shape))}")
    try:
        return trainer.run()
    finally:
        trainer.close()
