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

Fold-ensemble predictors export too — their stacked fold weights are a
*runtime argument* of the compiled forward (program-size limits —
serving.py), which is exactly the form :mod:`jax.export` serializes: the
artifact holds the vmapped fold-mean program and the weights ship beside it
as ``<artifact>.weights.npz`` (loaded once onto device by
:class:`ExportedPredictor`). Mesh-sharded ensembles (fold axis over chips)
are the one refusal: the artifact would pin the exporting mesh; export the
unsharded ensemble (or per-fold artifacts) instead.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

__all__ = ["export_predictor", "load_exported", "ExportedPredictor"]

_SIDECAR_SUFFIX = ".json"
_WEIGHTS_SUFFIX = ".weights.npz"


def _flatten_tree(d, prefix=""):
    """Nested dict-of-arrays -> ('a/b/c', array) pairs (flax param trees
    never contain '/' in keys). bfloat16 leaves — which the npy format
    cannot hold — ship as uint16 bit-views tagged '::bf16'."""
    for k in sorted(d):
        key = f"{prefix}/{k}" if prefix else str(k)
        v = d[k]
        if isinstance(v, dict):
            yield from _flatten_tree(v, key)
            continue
        v = np.asarray(v)
        if v.dtype.name == "bfloat16":
            yield key + "::bf16", v.view(np.uint16)
        else:
            yield key, v


def _unflatten_tree(flat):
    out: Dict = {}
    for key, v in flat.items():
        if key.endswith("::bf16"):
            import ml_dtypes

            key = key[: -len("::bf16")]
            v = v.view(ml_dtypes.bfloat16)
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def export_predictor(
    predictor,
    out_path: str,
    batch: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize ``predictor``'s compiled forward to ``out_path``.

    Args:
      predictor: a :class:`~.serving.Predictor` — single-checkpoint or a
        fold ensemble (mesh=None); ensembles additionally write the stacked
        fold weights to ``out_path + ".weights.npz"``.
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

    ensemble = getattr(predictor, "_stacked", None) is not None
    if ensemble and getattr(predictor, "_ens_mesh", None) is not None:
        raise ValueError(
            "mesh-sharded fold-ensemble Predictors are not exportable (the "
            "artifact would pin the exporting mesh); export the unsharded "
            "ensemble (mesh=None) or per-fold artifacts instead")

    s = predictor.cfg.img_size
    if batch is None:
        shape = jexport.symbolic_shape(f"b, {s}, {s}, 3")
    else:
        shape = (int(batch), s, s, 3)
    spec = jax.ShapeDtypeStruct(shape, np.float32)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    n_folds = 0
    if ensemble:
        # the ensemble forward takes the stacked fold weights as a runtime
        # argument; they ship beside the artifact as an .npz (loaded once
        # onto device by ExportedPredictor)
        stacked = predictor._stacked
        n_folds = int(jax.tree_util.tree_leaves(stacked)[0].shape[0])
        w_spec = jax.tree_util.tree_map(
            lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), stacked)
        exported = jexport.export(predictor._ens_jit, **kwargs)(w_spec, spec)
    else:
        exported = jexport.export(jax.jit(predictor._fn), **kwargs)(spec)

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    blob = exported.serialize()
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, out_path)  # two-phase, like the checkpoint writer
    if ensemble:
        flat = dict(_flatten_tree(jax.device_get(predictor._stacked)))
        wtmp = out_path + _WEIGHTS_SUFFIX + ".tmp"
        with open(wtmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(wtmp, out_path + _WEIGHTS_SUFFIX)

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
        "ensemble": (
            {"folds": n_folds,
             "weights_file": os.path.basename(out_path) + _WEIGHTS_SUFFIX}
            if ensemble else None
        ),
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

    def __init__(self, exported, meta: Dict, stacked_weights=None):
        import jax

        self.meta = meta
        self._exported = exported
        self._call = jax.jit(exported.call)
        # fold-ensemble artifacts: the stacked weights live on device once
        # and ride as the program's first argument per call
        self._stacked = (jax.device_put(stacked_weights)
                         if stacked_weights is not None else None)

    @property
    def platforms(self):
        return tuple(self._exported.platforms)

    def __call__(self, images: np.ndarray) -> Dict:
        import jax

        x = np.asarray(images, np.float32)
        out = (self._call(self._stacked, x) if self._stacked is not None
               else self._call(x))
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
    stacked = None
    wfile = path + _WEIGHTS_SUFFIX
    # Trust the sidecar only: a stray .weights.npz beside a non-ensemble
    # artifact must not change the program's call arity.
    if meta.get("ensemble"):
        if not os.path.exists(wfile):
            raise FileNotFoundError(
                f"ensemble artifact {path!r} requires its stacked-weights "
                f"sidecar at {wfile!r}, which is missing")
        with np.load(wfile) as z:
            stacked = _unflatten_tree({k: z[k] for k in z.files})
    return ExportedPredictor(exported, meta, stacked_weights=stacked)
