"""Training driver: folds -> build -> epochs -> metrics.csv + best/last.

Host-side orchestration around the jitted steps, replicating the reference's
``train``/``train_epoch``/``test`` behaviors (train.py:161-710) with the §4
defects fixed: every fold actually trains (defect #2), the loss signature
accepts the lambda weights (defect #1), and the consistency term sees soft
probabilities (defect #4).
"""
from __future__ import annotations

import csv
import glob
import os
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.run import RunConfig
from ..data.dataset import SegDataset
from ..data.loader import BatchLoader, prefetch_to_device
from ..hierarchy.tree import ClassTree
from ..metrics.segmentation import MetricAccumulator
from ..models.hierarchical import build_model
from ..parallel.mesh import batch_sharding, make_mesh, replicated
from .checkpoint import CheckpointManager
from .plateau import ReduceLROnPlateau
from .state import create_train_state, set_learning_rate
from .steps import make_eval_step, make_train_step

__all__ = ["Trainer", "train", "list_pairs", "make_loaders",
           "run_validation", "append_csv", "truncate_csv"]

CSV_HEADER = [
    "Epoch", "Train Loss", "Train Level Loss", "Train Accuracy", "Train IoU",
    "Train Dice", "Train Precision", "Train Recall", "Train Class Metrics",
    "Val Loss", "Val Level Loss", "Val Accuracy", "Val IoU", "Val Dice",
    "Val Precision", "Val Recall", "Val Test Measure Mean",
    "Val Test Measure Std", "Val Class Metrics",
]  # train.py:637


def list_pairs(root: str) -> Tuple[List[str], List[str]]:
    """root/{images,labels}/* sorted (train.py:420-423)."""
    imgs = sorted(glob.glob(os.path.join(root, "images", "*")))
    labs = sorted(glob.glob(os.path.join(root, "labels", "*")))
    if not imgs or len(imgs) != len(labs):
        raise FileNotFoundError(
            f"bad dataset at {root}: {len(imgs)} images / {len(labs)} labels"
        )
    return imgs, labs


def make_loaders(cfg: RunConfig, tree: ClassTree, train_root: str,
                 val_root: Optional[str], device=None):
    """Build one fold's (train, val) loaders — shared by the sequential
    ``Trainer`` and the fold-parallel trainer so both see identical batches.
    ``device``: target device for a device-resident train set (fold-parallel
    uploads each fold's data straight to its fold device)."""
    hier = cfg.hierarchical
    tr_imgs, tr_labs = list_pairs(train_root)
    if val_root:
        va_imgs, va_labs = list_pairs(val_root)
    else:
        from ..data.loader import split_ids

        tr_idx, _, va_idx = split_ids(len(tr_imgs), False, False, True)
        va_imgs = [tr_imgs[i] for i in va_idx]
        va_labs = [tr_labs[i] for i in va_idx]
        tr_imgs = [tr_imgs[i] for i in tr_idx]
        tr_labs = [tr_labs[i] for i in tr_idx]
    loader_cls = BatchLoader
    loader_kw = dict(num_workers=cfg.num_workers)
    if cfg.loader == "process":
        # spawn-context OS worker processes with the accelerator env
        # scrubbed (loader._make_process_pool) — the multi-core answer
        # where cv2/OpenMP thread scaling tops out
        loader_kw["worker_mode"] = "process"
    if cfg.loader == "grain":
        from ..data.grain_pipeline import GrainLoader, grain_available

        if grain_available():
            loader_cls = GrainLoader
            # in-process (0 workers): grain worker processes re-run this
            # environment's TPU-claiming sitecustomize and crash; grain
            # still provides determinism/sharding/epoch handling. Flip to
            # process workers on standard multi-core hosts if needed.
            loader_kw = dict(num_workers=0)
    ds_kw = dict(
        target_dtype=np.int8 if cfg.host_compact else np.float32,
        emit_gray=cfg.host_compact,
    )
    if cfg.device_data:
        # device-resident training set + on-device augmentation: the host's
        # per-epoch contribution is an integer permutation. Validation keeps
        # the host pipeline (deterministic, reference-parity scoring) with
        # whatever loader backend cfg.loader selected above.
        from ..data.device_augment import DeviceDataset

        train_loader = DeviceDataset(
            tr_imgs, tr_labs, tree, cfg.img_size, hier,
            batch_size=cfg.batch_size, seed=cfg.seed, device=device,
        )
    else:
        train_loader = loader_cls(
            SegDataset(tr_imgs, tr_labs, tree, cfg.img_size, hier,
                       augment=True, **ds_kw),
            cfg.batch_size, shuffle=True, drop_last=True, seed=cfg.seed,
            **loader_kw,
        )
    val_loader = loader_cls(
        SegDataset(va_imgs, va_labs, tree, cfg.img_size, hier,
                   augment=False, **ds_kw),
        cfg.val_batch, shuffle=False, drop_last=False, seed=cfg.seed,
        **loader_kw,
    )
    return train_loader, val_loader


def dump_prediction_images(outputs, save_loc: str, epoch: int):
    """Per-class binary prediction PNGs (train.py:370-385)."""
    import cv2

    save_clss = 0
    for lvl_out in outputs:
        arr = np.asarray(lvl_out[0])  # first image in batch (H, W, C)
        pred = np.argmax(arr, -1)
        for c in range(arr.shape[-1]):
            d = os.path.join(save_loc, "images", str(save_clss))
            os.makedirs(d, exist_ok=True)
            cv2.imwrite(
                os.path.join(d, f"Epoch{epoch}.png"),
                ((pred == c) * 255).astype(np.uint8),
            )
            save_clss += 1


def run_validation(eval_step, params, batch_stats, val_loader, batch_shard,
                   num_classes_per_level, val_batch: int, dump_fn=None):
    """One validation pass (reference ``test``, train.py:283-393): aggregate
    confusion-matrix metrics, per-level losses, and the ``perf_no_bg``
    selection metric. ``dump_fn(outputs)`` is called once, on the first batch,
    when the eval step returns raw outputs (prediction-PNG dumps)."""
    acc = MetricAccumulator(num_classes_per_level)
    losses, level_losses = [], np.zeros((len(num_classes_per_level),))
    device_res = []
    first = True
    t0 = time.time()
    for x, y in prefetch_to_device(val_loader, 2, batch_shard):
        res = eval_step(params, batch_stats, x, y)
        if dump_fn is not None and first and "outputs" in res:
            dump_fn(res["outputs"])
            first = False
        res.pop("outputs", None)  # don't haul full-res maps per batch
        device_res.append(res)
    t_dispatch = time.time() - t0
    # one host transfer after the last dispatch (see train_epoch note)
    for res in jax.device_get(device_res):
        losses.append(float(res["loss"]))
        level_losses += np.asarray(res["per_level"])
        acc.update([np.asarray(c) for c in res["confmats"]])
    mean, std = acc.selection_metric()
    denom = max(1, len(val_loader) * val_batch)
    return {
        "loss": losses[-1] if losses else 0.0,  # train.py:341 (last batch)
        "level_loss": (level_losses / denom).tolist(),
        "overall": acc.epoch_overall(),
        "per_class": acc.epoch_per_class(),
        "measure_mean": mean,
        "measure_std": std,
        "sec_dispatch": t_dispatch,
        "sec_total": time.time() - t0,
    }


class Trainer:
    """One fold's build + epoch machinery."""

    def __init__(self, cfg: RunConfig, tree: ClassTree,
                 train_root: str, val_root: Optional[str], save_loc: str):
        self.cfg = cfg
        self.tree = tree
        self.save_loc = save_loc
        # multi-process (jax.distributed) runs: every process executes the
        # same replicated computation; exactly one writes artifacts
        # (metrics.csv, checkpoints, logs, dumps) and prints progress
        import jax as _jax_pi

        self.is_main = _jax_pi.process_index() == 0
        os.makedirs(save_loc, exist_ok=True)
        from ..utils.compile_cache import enable as _enable_cache

        _enable_cache()

        hier = cfg.hierarchical
        self.num_classes_per_level = (
            list(tree.classes_per_level) if hier else [tree.num_leaves]
        )

        # --- data -----------------------------------------------------------
        self.train_loader, self.val_loader = make_loaders(
            cfg, tree, train_root, val_root
        )

        # --- mesh / model / state -------------------------------------------
        # data-axis size must divide the per-step batch; use the largest
        # divisor of batch_size that fits the available devices
        import jax as _jax

        procs = _jax.process_count()
        avail = len(_jax.devices()) // cfg.n_space
        if procs == 1:
            n_data = max(d for d in range(1, avail + 1)
                         if cfg.batch_size % d == 0)
            self.mesh = make_mesh(n_data=n_data, n_space=cfg.n_space)
        else:
            # multi-process: the mesh must span EVERY process (a process
            # with no addressable mesh devices can neither feed batches nor
            # join collectives). n_data*n_space must divide evenly across
            # processes; each contributes the same local device prefix.
            cand = [d for d in range(1, avail + 1)
                    if cfg.batch_size % d == 0
                    and (d * cfg.n_space) % procs == 0]
            if not cand:
                raise ValueError(
                    f"no data-axis size divides batch {cfg.batch_size} and "
                    f"spreads {cfg.n_space}-way space over {procs} processes")
            n_data = max(cand)
            per = n_data * cfg.n_space // procs
            by_proc: dict = {}
            for d in _jax.devices():
                by_proc.setdefault(d.process_index, []).append(d)
            for p in sorted(by_proc):
                if len(by_proc[p]) < per:
                    raise ValueError(
                        f"process {p} has {len(by_proc[p])} devices but the "
                        f"{n_data}x{cfg.n_space} mesh needs {per} per process "
                        f"({procs} processes); per-process device counts "
                        f"must be homogeneous and >= {per}")
            devs = [d for p in sorted(by_proc) for d in by_proc[p][:per]]
            assert len(devs) == n_data * cfg.n_space, (
                len(devs), n_data, cfg.n_space)
            self.mesh = make_mesh(n_data=n_data, n_space=cfg.n_space,
                                  devices=devs)
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
        self.state, self.tx = create_train_state(
            self.model, jax.random.PRNGKey(cfg.seed), sample, cfg.lr,
            cfg.weight_decay,
        )
        if cfg.model_weights:
            if cfg.model_weights.endswith((".pt", ".pth")):
                # donor torch checkpoint (fuzzy importer, train.py:470-505 /
                # models.py:804-832 capability)
                from .torch_import import load_donor_weights

                params, bstats = load_donor_weights(
                    cfg.model_weights, self.state.params,
                    self.state.batch_stats, cfg.model_select,
                )
                self.state = self.state.replace(
                    params=params, batch_stats=bstats
                )
            else:
                # resume from one of our own orbax checkpoints
                from .checkpoint import load_checkpoint

                self.state, meta = load_checkpoint(
                    cfg.model_weights, self.state
                )
                self._resume_meta = meta
                if self.is_main:
                    print(f"Resumed from {cfg.model_weights}: {meta}")
        self.state = jax.device_put(self.state, replicated(self.mesh))
        self.batch_shard = batch_sharding(self.mesh)
        if hasattr(self.train_loader, "set_sharding"):
            # device-resident loader: emit batches already laid out for the
            # training mesh (prefetch's device_put becomes a no-op)
            self.train_loader.set_sharding(self.batch_shard)
        # eval batches (val_batch, often 1, ragged last batch) ride the SAME
        # mesh with the batch dim replicated over `data` — keeps one device
        # set, stays shape-flexible, still spatially sharded over `space`
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import SPACE_AXIS

        self.eval_batch_shard = NamedSharding(
            self.mesh, P(None, SPACE_AXIS, None, None)
        )

        lw = cfg.level_weights
        ohem = (cfg.ohem_thres, cfg.ohem_keep) if cfg.use_ohem else None
        # multi-process: pin step outputs replicated so host fetches
        # (checkpoint snapshots, epoch aux) never initiate a cross-process
        # transfer that only one process would join (see steps.py)
        shard_out = (replicated(self.mesh)
                     if _jax_pi.process_count() > 1 else None)
        self.train_step = make_train_step(
            self.model, self.tx, tree, hier, lw, cfg.lambda_cons,
            cfg.lambda_kl, ohem=ohem, grad_accum=cfg.grad_accum,
            out_shardings=shard_out,
        )
        self.eval_step = make_eval_step(
            self.model, tree, hier, lw, cfg.lambda_cons, cfg.lambda_kl,
            ohem=ohem, return_outputs=cfg.save_images_batch,
            out_shardings=shard_out,
        )
        self.scheduler = ReduceLROnPlateau(
            cfg.lr, "max", 0.5, 3, min_lr=cfg.lrs_min
        ) if cfg.lrs else None
        self.ckpt = CheckpointManager(
            save_loc, ckpt_every=cfg.ckpt_every, final_epoch=cfg.epochs,
            best_save=cfg.best_save)
        self.n_levels = len(self.num_classes_per_level)

        # --- exact resume (beats the reference's weights-only --model-weights
        # restart, train.py:470-505): restore the epoch counter and the
        # plateau scheduler from the checkpoint's meta sidecar so the LR
        # trajectory and best-ckpt decisions continue as if uninterrupted
        self.start_epoch = 1
        meta = getattr(self, "_resume_meta", None)
        if meta and "epoch" in meta:
            self.start_epoch = int(meta["epoch"]) + 1
            if self.scheduler is not None and "sched_lr" in meta:
                best = meta.get("sched_best")
                self.scheduler.load_state_dict({
                    "lr": meta["sched_lr"],
                    "best": None if best is None or best != best else best,
                    "num_bad_epochs": int(meta.get("sched_num_bad_epochs", 0)),
                })

    def _check_finite(self, loss_val: float, epoch: int, step_idx: int, aux):
        """Failure detection the reference lacks (SURVEY §5.3): fail fast
        with context instead of training on garbage."""
        if not np.isfinite(loss_val):
            raise FloatingPointError(
                f"non-finite loss {loss_val} at epoch {epoch} "
                f"step {step_idx} (lr={self.state.lr():.2e}); per-level "
                f"losses: {np.asarray(jax.device_get(aux['per_level'])).tolist()}"
            )

    # ------------------------------------------------------------- epochs
    def train_epoch(self, epoch: int):
        cfg = self.cfg
        self.train_loader.set_epoch(epoch)
        mask = jnp.asarray(
            cfg.level_mask_for_epoch(epoch, self.n_levels), jnp.float32
        )
        acc = MetricAccumulator(self.num_classes_per_level)
        losses, level_losses = [], np.zeros((self.n_levels,))
        t0 = time.time()
        n = 0
        # profile epoch 2 (first steady-state epoch) when requested
        from ..utils.profiling import trace

        profile = cfg.profile_dir if epoch == 2 else None
        # per-step aux stays ON DEVICE during the epoch (reading it would
        # force a host sync each step and serialize dispatch); everything is
        # fetched in one transfer after the last step
        device_aux = []
        probe = max(0, int(cfg.nan_probe_every))
        with trace(profile):
            for x, y in prefetch_to_device(
                self.train_loader, 2, self.batch_shard
            ):
                self.state, aux = self.train_step(self.state, x, y, mask)
                device_aux.append(aux)
                n += 1
                if probe and n % probe == 0:
                    # periodic fail-fast: one scalar fetch (host sync) every
                    # `probe` steps bounds the garbage-step blast radius while
                    # keeping the on-device aux pipelining for the epoch
                    self._check_finite(float(jax.device_get(aux["loss"])),
                                       epoch, n - 1, aux)
        all_aux = jax.device_get(device_aux)
        dt = time.time() - t0
        for step_idx, aux in enumerate(all_aux):
            loss_val = float(aux["loss"])
            self._check_finite(loss_val, epoch, step_idx, aux)
            losses.append(loss_val)
            level_losses += np.asarray(aux["per_level"])
            acc.update([np.asarray(c) for c in aux["confmats"]])
        overall = acc.epoch_overall()
        denom = max(1, len(self.train_loader) * cfg.batch_size)
        return {
            "loss": float(np.mean(losses)) if losses else 0.0,
            "level_loss": (level_losses / denom).tolist(),
            "overall": overall,
            "per_class": acc.epoch_per_class(),
            "time": dt,
            "steps": n,
        }

    def evaluate(self, epoch: int, dump_images: bool = False):
        dump_fn = (
            (lambda outputs: self._dump_images(outputs, epoch))
            if dump_images else None
        )
        return run_validation(
            self.eval_step, self.state.params, self.state.batch_stats,
            self.val_loader, self.eval_batch_shard,
            self.num_classes_per_level, self.cfg.val_batch, dump_fn=dump_fn,
        )

    def _dump_images(self, outputs, epoch: int):
        dump_prediction_images(outputs, self.save_loc, epoch)

    def close(self):
        """Release loader worker pools (process pools hold OS processes —
        without this a 5-fold --loader process run leaks ~10 spawn pools)."""
        for ld in (self.train_loader, self.val_loader):
            if hasattr(ld, "close"):
                ld.close()

    def run(self):
        cfg = self.cfg
        csv_path = os.path.join(self.save_loc, "metrics.csv")
        if self.is_main and os.path.exists(csv_path):
            if self.start_epoch > 1:
                # resume: keep history up to the resumed epoch, drop any rows
                # a crashed run wrote beyond the checkpoint
                self._truncate_csv(csv_path, self.start_epoch)
            else:
                os.remove(csv_path)  # fresh run (train.py:599-600)
        from ..utils.logging import MetricsLogger

        logger = (MetricsLogger(os.path.join(self.save_loc, "logs"),
                                tensorboard=cfg.tensorboard)
                  if self.is_main else None)
        if logger:
            logger.truncate_after(self.start_epoch - 1)
        for epoch in range(self.start_epoch, cfg.epochs + 1):
            if self.scheduler:
                self.state = set_learning_rate(self.state, self.scheduler.lr)
            tr = self.train_epoch(epoch)
            dump = cfg.save_images_batch and (
                epoch % cfg.save_images_batch_num == 0 or epoch == 1
            )
            va = self.evaluate(epoch, dump_images=dump and self.is_main)
            if self.is_main:
                self._append_csv(csv_path, epoch, tr, va)
                print(
                    f"Epoch {epoch}: train loss {tr['loss']:.4f} "
                    f"({tr['steps']} steps, {tr['time']:.1f}s) | "
                    f"val dice(no bg) {va['measure_mean']:.4f} "
                    f"iou {va['overall']['iou']:.4f} "
                    f"lr {self.state.lr():.5f} | "
                    f"val {va.get('sec_total', 0.0):.1f}s "
                    f"(dispatch {va.get('sec_dispatch', 0.0):.1f}s)",
                    flush=True,
                )
                logger.log(epoch, {
                    "loss": tr["loss"], "dice": tr["overall"]["dice"],
                    "iou": tr["overall"]["iou"],
                    "sec_per_epoch": tr["time"], "lr": self.state.lr(),
                }, prefix="train")
                logger.log(epoch, {
                    "loss": va["loss"], "dice_no_bg": va["measure_mean"],
                    "iou": va["overall"]["iou"], "dice": va["overall"]["dice"],
                }, prefix="val")
            # scheduler steps on EVERY process (replicated metric, identical
            # decisions) so the LR trajectory stays in lockstep
            if self.scheduler:
                self.scheduler.step(va["measure_mean"])
            sched_meta = (
                {f"sched_{k}": (v if v is not None else float("nan"))
                 for k, v in self.scheduler.state_dict().items()}
                if self.scheduler else {}
            )
            if self.is_main:
                self.ckpt.update(
                    self.state, epoch, tr["loss"], va["measure_mean"],
                    va["measure_std"], **sched_meta,
                )
        if self.is_main:
            self.ckpt.finalize()  # drain async saves; materialize best
        return self.ckpt.prev_best

    def _truncate_csv(self, path, start_epoch: int):
        truncate_csv(path, start_epoch)

    def _append_csv(self, path, epoch, tr, va):
        append_csv(path, epoch, tr, va)


def truncate_csv(path, start_epoch: int):
    """Resume: keep rows below ``start_epoch`` (drop rows a crashed run wrote
    beyond the checkpoint)."""
    with open(path, newline="") as f:
        rows = list(csv.reader(f))
    kept = [r for i, r in enumerate(rows)
            if i == 0 or (r and r[0].isdigit() and int(r[0]) < start_epoch)]
    with open(path, "w", newline="") as f:
        csv.writer(f).writerows(kept)


def append_csv(path, epoch, tr, va):
    """One reference-layout metrics.csv row (train.py:634-642)."""
    new = not os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if new:
            w.writerow(CSV_HEADER)
        w.writerow([
            epoch, tr["loss"], tr["level_loss"], tr["overall"]["accuracy"],
            tr["overall"]["iou"], tr["overall"]["dice"],
            tr["overall"]["precision"], tr["overall"]["recall"],
            tr["per_class"], va["loss"], va["level_loss"],
            va["overall"]["accuracy"], va["overall"]["iou"],
            va["overall"]["dice"], va["overall"]["precision"],
            va["overall"]["recall"], va["measure_mean"], va["measure_std"],
            va["per_class"],
        ])


def train(cfg: RunConfig) -> List[Optional[float]]:
    """All-folds driver (train.py:536-710; defect #2 fixed — every fold runs).

    Cross-val layout: ``data_root/fold_N/{train,val}`` (train.py:796-803)."""
    tree = ClassTree.from_json(cfg.tree_root, cfg.class_map)
    results = []
    folds = cfg.folds if cfg.inc_cross_val and cfg.folds > 0 else 1
    fold_ids = [cfg.fold] if cfg.fold > 0 else list(range(1, folds + 1))
    if cfg.fold_parallel and len(fold_ids) > 1:
        # all folds as ONE vmapped program, fold axis sharded over the mesh
        from .fold_parallel import train_folds_parallel

        return train_folds_parallel(cfg, tree, fold_ids)
    for fold in fold_ids:
        if cfg.inc_cross_val and cfg.folds > 0:
            train_root = os.path.join(cfg.data_root, f"fold_{fold}", "train")
            val_root = os.path.join(cfg.data_root, f"fold_{fold}", "val")
        else:
            train_root = os.path.join(cfg.data_root, "train")
            val_root = cfg.val_dataset
            if val_root is None:
                cand = os.path.join(cfg.data_root, "val")
                val_root = cand if os.path.exists(cand) else None
        save_loc = os.path.join(cfg.save_path, f"fold_{fold}")
        if jax.process_index() == 0:
            print(f"Fold {fold}: train={train_root} val={val_root} "
                  f"-> {save_loc}")
        fold_cfg = cfg
        if cfg.auto_resume and not cfg.model_weights:
            last = os.path.join(save_loc, "last.ckpt")
            if os.path.exists(last):
                # restart-safe training (beats the reference's weights-only
                # --model-weights restart): each fold resumes independently
                from dataclasses import replace

                fold_cfg = replace(cfg, model_weights=last)
                print(f"Auto-resuming fold {fold} from {last}")
        trainer = Trainer(fold_cfg, tree, train_root, val_root, save_loc)
        try:
            results.append(trainer.run())
        finally:
            trainer.close()
    return results
