"""StableHLO model export — a self-contained deployment artifact.

The reference has no deployment story: serving means re-instantiating the
torch modules from source and re-loading a ``.pt`` (predictEval.py:190-261).
This module exports the :class:`~.serving.Predictor`'s weight-baked forward
as serialized StableHLO via :mod:`jax.export`, plus a JSON metadata sidecar:

* the artifact is **self-contained** — weights ride inside the program as
  constants (BN already folded, training graph already pruned by the
  Predictor's bake), so it runs under any matching JAX runtime *without this
  package's model code*;
* the **batch dimension is symbolic by default** (``jax.export``
  shape polymorphism), so one artifact serves any batch size; H/W stay
  static (the compile-time layout win is the point of the serving path);
* ``platforms`` pins which backends the artifact may run on (e.g. export on
  a CPU host *for* TPU serving, or ``("tpu", "cpu")`` for both);
* the sidecar records the class layout (per-level class names from the
  :class:`ClassTree`) and the requested outputs so a consumer can decode
  class maps without the tree assets.

Ensemble predictors are not exportable: their fold weights are runtime
arguments by design (program-size limits — serving.py), which defeats the
self-contained artifact. Export per-fold artifacts instead and average
probabilities host-side, or serve the ensemble through :class:`Predictor`.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["export_predictor", "load_exported", "ExportedPredictor"]

_SIDECAR_SUFFIX = ".json"


def export_predictor(
    predictor,
    out_path: str,
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize ``predictor``'s compiled forward to ``out_path``.

    Args:
      predictor: a single-checkpoint :class:`~.serving.Predictor`.
      out_path: artifact path (conventionally ``*.stablehlo``); a JSON
        metadata sidecar is written next to it at ``out_path + ".json"``.
      batch: static batch size, or ``None`` (default) for a symbolic batch
        dimension — one artifact, any batch.
      platforms: lowering platforms for the artifact (e.g. ``("tpu",)`` or
        ``("tpu", "cpu")``); ``None`` exports for the current default
        backend only.

    Returns the artifact path.
    """
    import jax
    from jax import export as jexport

    if getattr(predictor, "_stacked", None) is not None:
        raise ValueError(
            "fold-ensemble Predictors are not exportable (their stacked fold "
            "weights are runtime arguments by design); export per-fold "
            "artifacts instead")

    s = predictor.cfg.img_size
    if batch is None:
        shape = jexport.symbolic_shape(f"b, {s}, {s}, 3")
    else:
        shape = (int(batch), s, s, 3)
    spec = jax.ShapeDtypeStruct(shape, np.float32)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jexport.export(jax.jit(predictor._fn), **kwargs)(spec)

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    blob = exported.serialize()
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, out_path)  # two-phase, like the checkpoint writer

    tree = predictor.tree
    cfg = predictor.cfg
    hierarchical = cfg.model_type == 1
    level_classes = ([list(lv) for lv in tree.levels] if hierarchical
                     else [list(tree.leaf_names)])
    meta = {
        "format": "jax.export/stablehlo",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "img_size": s,
        "batch": "symbolic" if batch is None else int(batch),
        "input": {"shape": [str(d) for d in shape], "dtype": "float32",
                  "layout": "NHWC, training-normalized"},
        "outputs": {
            "keys": sorted(_output_keys(predictor)),
            "level_classes": level_classes,
        },
        "model": {
            "model_select": cfg.model_select,
            "model_type": cfg.model_type,
            "compute_dtype": cfg.compute_dtype,
            "quantized": hasattr(predictor, "act_scales"),
        },
        "artifact_bytes": len(blob),
    }
    with open(out_path + _SIDECAR_SUFFIX, "w") as f:
        json.dump(meta, f, indent=2)
    return out_path


def _output_keys(predictor) -> Sequence[str]:
    # probe the jitted forward's output structure without running it: the
    # Predictor's _select already dropped unrequested keys, so evaluate the
    # out pytree shape via jax.eval_shape on a dummy spec
    import jax

    s = predictor.cfg.img_size
    out = jax.eval_shape(
        predictor._fn, jax.ShapeDtypeStruct((1, s, s, 3), np.float32))
    return list(out.keys())


class ExportedPredictor:
    """Callable wrapper over a deserialized artifact.

    Mirrors :class:`~.serving.Predictor.__call__`: takes ``(B, H, W, 3)``
    float32 training-normalized images, returns numpy outputs keyed like the
    exporting Predictor's. ``meta`` is the sidecar dict (``{}`` if the
    sidecar is missing — the artifact alone is still runnable).
    """

    def __init__(self, exported, meta: Dict):
        import jax

        self.meta = meta
        self._exported = exported
        self._call = jax.jit(exported.call)

    @property
    def platforms(self):
        return tuple(self._exported.platforms)

    def __call__(self, images: np.ndarray) -> Dict:
        import jax

        out = self._call(np.asarray(images, np.float32))
        return jax.tree_util.tree_map(np.asarray, out)


def load_exported(path: str) -> ExportedPredictor:
    """Deserialize an artifact written by :func:`export_predictor`.

    Needs only ``jax`` — none of this package's model code runs; the graph
    (weights included) comes from the artifact.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    meta: Dict = {}
    sidecar = path + _SIDECAR_SUFFIX
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
    return ExportedPredictor(exported, meta)
