"""Run configuration: one dataclass replacing the reference's two-tier
argparse-with-eval()-coercion + yacs scheme (train.py:714-826,
config/default.py). CLI flag names are preserved verbatim by ``cli/train.py``
for drop-in parity."""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

__all__ = ["RunConfig"]


@dataclass
class RunConfig:
    # paths
    save_path: str = "runs/out"
    data_root: str = ""
    val_dataset: Optional[str] = None
    tree_root: str = "assets/class_tree_tl.json"
    class_map: str = "assets/class_map.csv"
    model_weights: Optional[str] = None
    # pick up <save_path>/fold_N/last.ckpt automatically when it exists —
    # crash/preemption-safe restarts without hand-passing --model-weights
    auto_resume: bool = False

    # model
    model_select: int = 0            # 0 UNet, 1 HRNet (train.py:732)
    model_type: int = 1              # 0 flat, 1 hierarchical (train.py:731)
    img_size: int = 352
    hrnet_yaml: Optional[str] = None # reference --config
    concat_prev_probs: bool = False  # README-abstract variant
    # rematerialization: False | "module" (full per-module recompute) |
    # "conv" (save conv outputs, recompute elementwise tails — the
    # bandwidth-sweet memory knob); True is accepted as "module"
    remat: object = False
    compute_dtype: str = "float32"   # "bfloat16" for mixed precision

    # optimization
    epochs: int = 200
    batch_size: int = 16
    val_batch: int = 1
    # int8 post-training quantization for the offline-eval forward
    # (train/quantize.py; measured 1.27x at 620px, tools/serving_bench.py)
    quantize: bool = False
    # activation-scale calibration batches for --quantize (per-tensor amax
    # over the first N val batches; one batch can clip the rest of the set)
    calib_batches: int = 4
    # offline-eval dispatch window: max batches of results held in HBM
    # before the oldest is fetched (train/evaluate.py Evaluator.run)
    eval_inflight: int = 4
    # horizontal-flip test-time augmentation for offline eval
    # (train/evaluate.py tta_apply; composes with quantize)
    tta: bool = False
    lr: float = 1e-4
    lrs: bool = True                 # ReduceLROnPlateau on/off
    lrs_min: float = 1e-6
    level_weights: Optional[List[List[float]]] = None
    level0_pretrain_epochs: Optional[int] = None
    lambda_cons: float = 1.0
    lambda_kl: float = 0.0           # reference intent 0.1, impl commented out
    use_ohem: bool = False           # reference dead config keys, made real
    ohem_thres: float = 0.9          # config/default.py:49 OHEMTHRES
    ohem_keep: int = 100000          # config/default.py:50 OHEMKEEP
    weight_decay: float = 0.01
    # last.ckpt save cadence in epochs (best.ckpt still saves on every
    # improvement). >1 skips the device->host state fetch on non-improving
    # off-cadence epochs — the dominant per-epoch cost on slow host links;
    # the final epoch always saves. Resume granularity becomes N epochs.
    ckpt_every: int = 1
    # best.ckpt policy: "every" = hit disk on every improvement (reference
    # train.py:666-686 durability); "end" = keep the best state as a device-
    # side HBM copy (~0.1 s) and materialize best.ckpt once at fold end —
    # the right mode on slow host links, where the full-state device->host
    # fetch (~30 s for W48 AdamW over a ~25 MB/s tunnel) otherwise dominates
    # every improving epoch (train/checkpoint.py CheckpointManager)
    best_save: str = "every"
    # fail-fast cadence: every N steps the epoch loop fetches the latest
    # step's loss and raises on non-finite values. Per-step aux otherwise
    # stays on device for the whole epoch (dispatch pipelining), so without
    # the probe a NaN at step 0 would burn a full epoch of garbage steps
    # before detection. Each probe costs one host sync; 0 disables.
    nan_probe_every: int = 50
    # >1: one optimizer step from N sequential microbatches (lax.scan) —
    # peak activation memory of ONE microbatch; the cheaper large-batch
    # knob vs --remat (train/steps.py accum_step, BENCHMARKS.md)
    grad_accum: int = 1

    # data
    loader: str = "threads"          # "threads" | "process" (spawn workers) | "grain"
    num_workers: int = 8
    # compact host formats: int8 ternary targets + single-channel grayscale
    # images, decoded on device by the jitted steps (4x/3x smaller
    # host->device transfers; bit-identical values)
    host_compact: bool = True
    # device-resident training set + on-device augmentation
    # (data/device_augment.py): base images/masks upload once, every epoch's
    # blur/jitter/flip/affine/ternary runs as one jitted program — zero host
    # work per epoch. Distributionally equivalent to the host pipeline
    # (not bit-exact at affine boundary pixels); validation stays host-side.
    device_data: bool = False
    inc_cross_val: bool = True
    folds: int = 0
    fold: int = 0                    # >0: train ONLY this fold (fold-parallel)
    test_remove: bool = True
    seed: int = 0

    # logging
    save_images_batch: bool = False
    save_images_batch_num: int = 10
    profile_dir: Optional[str] = None
    tensorboard: bool = False        # tf.summary events under <fold>/logs/tb

    # parallelism
    n_space: int = 1                 # spatial-sharding mesh axis size
    # train every cross-val fold simultaneously as ONE vmapped program with
    # the fold axis sharded over the mesh (train/fold_parallel.py); the
    # reference runs folds sequentially (train.py:546)
    fold_parallel: bool = False

    def __post_init__(self):
        if self.ckpt_every < 1:
            raise ValueError(f"ckpt_every must be >= 1, got {self.ckpt_every}")
        if self.best_save not in ("every", "end"):
            raise ValueError(
                f"best_save must be 'every'|'end', got {self.best_save!r}")
        if self.grad_accum < 1:
            raise ValueError(f"grad_accum must be >= 1, got {self.grad_accum}")
        if self.calib_batches < 1:
            raise ValueError(
                f"calib_batches must be >= 1, got {self.calib_batches}")
        if self.eval_inflight < 1:
            raise ValueError(
                f"eval_inflight must be >= 1, got {self.eval_inflight}")

    @property
    def hierarchical(self) -> bool:
        return self.model_type == 1

    def level_mask_for_epoch(self, epoch: int, n_levels: int) -> List[float]:
        """train.py:125-133: cap supervised levels during level-0 pretraining.
        ``epoch`` is 1-based as in the reference's loop (train.py:618)."""
        if self.level0_pretrain_epochs is None:
            return [1.0] * n_levels
        cap = min(n_levels - 1, epoch // self.level0_pretrain_epochs)
        return [1.0 if L <= cap else 0.0 for L in range(n_levels)]
