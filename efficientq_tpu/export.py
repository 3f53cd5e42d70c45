"""Portable serving artifacts: the deployed patch forward serialized as
StableHLO via ``jax.export``.

The reference's deployment artifact is a weight file
(``store_int_weight``, src/models/PTQConv.py:128-143): serving it needs
the full model code plus the exact CLI flags that built the net, and the
reference can only re-check a quantized net by re-running the PTQ
pipeline (src/ptqer.py:282-387).  Here the artifact IS the computation —
the post-deployment patch-forward function with every weight baked in as
a constant, serialized with JAX's versioned-stability export format.  A
consumer deserializes and calls it with zero model-construction code, on
any platform the artifact was exported for (XLA-path graphs export
multi-platform ``('cpu', 'tpu')`` from either host; graphs carrying
fused Pallas kernels are TPU-only custom calls).

Artifact = one zip file:
    manifest.json       serving metadata (patch size, classes, batch mode,
                        platforms, deploy mode, stitch defaults)
    module.jaxexport    ``jax.export.Exported.serialize()`` bytes

Calling convention of the exported function:
    (B, pd, ph, pw, nMod) float32  ->  (1, B, pd, ph, pw, C_out) float32
final-head logits only (aux deep-supervision heads are sliced off before
export so XLA dead-code-eliminates them — same mechanism as
eval/sliding.py ``heads``).  B is a symbolic dimension when the graph
lowers with one (plain XLA graphs do); otherwise it is pinned to the
export-time ``patch_batch`` and ``ServingArtifact.patch_model_fn`` zero-
pads ragged final chunks and drops the padded rows.
"""
from __future__ import annotations

import json
import zipfile
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from . import nnir, ops

FORMAT = "efficientq-serving/1"
MODULE_NAME = "module.jaxexport"
MANIFEST_NAME = "manifest.json"


def export_patch_model(graph, variables, patch_size, n_mod: int, *,
                       mode: str = "quantized", patch_batch: int = 4,
                       platforms=None, compute_dtype=None):
    """Export the final-head patch forward with weights baked in.

    Returns ``(exported, batch)`` where ``batch`` is the string
    ``"symbolic"`` or the pinned int batch size.  ``platforms`` defaults
    to ``('tpu',)`` when the graph carries Pallas nodes (their Mosaic
    custom calls only target TPU) and ``('cpu', 'tpu')`` otherwise —
    cross-platform lowering needs no device of the target kind.
    ``compute_dtype`` bakes a low-precision serving dtype (--serve_dtype
    bf16) into the module; head outputs stay f32 either way.
    """
    from jax import export as jexport

    patch_size = tuple(ops.triple(patch_size))

    def patch_fn(xb):
        # final head only: slicing before export lets XLA DCE the aux
        # classifiers out of the serialized module (eval/sliding.py heads)
        return nnir.apply(graph, variables, xb, mode=mode,
                          compute_dtype=compute_dtype)[-1:]

    if platforms is None:
        has_pallas = any(n.attrs.get("pallas") for n in graph.nodes)
        platforms = ("tpu",) if has_pallas else ("cpu", "tpu")
    jitted = jax.jit(patch_fn)
    try:
        b, = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, *patch_size, n_mod), jnp.float32)
        return jexport.export(jitted, platforms=tuple(platforms))(spec), \
            "symbolic"
    except Exception as e:
        # symbolic batch does not lower through every op (the Pallas
        # kernels and some resize paths need static shapes): pin it.
        # Say WHY — a transient failure (OOM, version regression) must not
        # silently degrade every future serve to the pinned batch
        print(f"export: symbolic batch unavailable ({type(e).__name__}: "
              f"{e}); pinning batch={patch_batch}")
        spec = jax.ShapeDtypeStruct((patch_batch, *patch_size, n_mod),
                                    jnp.float32)
        return jexport.export(jitted, platforms=tuple(platforms))(spec), \
            int(patch_batch)


def export_s2d_model(graph, variables, patch_size, n_mod: int, *,
                     patch_batch: int, compute_dtype=jnp.bfloat16):
    """Export the host-s2d serving forward — the headline serving mode
    (``--serve_stem s2d``; ptq/deploy.py::make_s2d_volume_inferencer) as
    a portable artifact.

    The exported callable takes ``(stack, parities)`` — the host-built
    s2d patch stack (pallas/stem.py) — and returns final-head logits in
    the channels-first serving layout.  The host transform itself
    (data/native.py::s2d_bf16 with its NumPy fallback) is package code on
    the serving side, driven by the manifest (``serve_stem='s2d'`` +
    ``stem_geometry``); ``ServingArtifact.volume_inferencer`` wires it
    up.  Returns ``(exported, batch, stem_attrs)`` or ``None`` when the
    graph has no eligible stem (use ``--deploy int8|mixed`` first).

    NOTE: export on the TPU host — a CPU-host export lowers the Pallas
    kernels in interpret mode (correct everywhere, fast nowhere).
    """
    import jax

    from jax import export as jexport

    from .ptq.deploy import channels_first_tail, s2d_stem_serving

    patch_size = tuple(ops.triple(patch_size))
    stem0 = next((n for n in graph.nodes
                  if n.op == "conv" and n.inputs == (graph.input_name,)),
                 None)
    g2 = channels_first_tail(graph)
    g2, v2, stem = s2d_stem_serving(g2, variables)
    if stem is None:
        return None

    def patch_fn(xb):
        return nnir.apply(g2, v2, xb, mode="quantized",
                          compute_dtype=compute_dtype)[-1:]

    pd, ph, pw = patch_size
    B = int(patch_batch)
    stack_sd = jax.ShapeDtypeStruct((B, pd // 2 + 1, ph // 2, pw // 2,
                                     8 * n_mod), jnp.bfloat16)
    par_sd = jax.ShapeDtypeStruct((B,), jnp.int32)
    # a TPU host lowers real Mosaic custom calls (TPU-only); any other
    # host lowers interpret-mode Pallas (plain HLO, runs on that backend)
    platforms = (("tpu",) if jax.default_backend() == "tpu"
                 else (jax.default_backend(),))
    exported = jexport.export(jax.jit(patch_fn),
                              platforms=platforms)((stack_sd, par_sd))
    stem_attrs = {k: (list(v) if isinstance(v, tuple) else v)
                  for k, v in stem0.attrs.items()
                  if k in ("kernel_size", "stride", "padding", "dilation",
                           "groups")}
    return exported, B, stem_attrs


def save_serving_artifact(path: str, exported, manifest: dict) -> None:
    manifest = dict(manifest)
    manifest["format"] = FORMAT
    manifest["platforms"] = list(exported.platforms)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(MANIFEST_NAME, json.dumps(manifest, indent=1))
        z.writestr(MODULE_NAME, bytes(exported.serialize()))


class ServingArtifact:
    """A loaded serving artifact: ``.manifest`` + the callable module."""

    def __init__(self, exported, manifest: dict):
        self.exported = exported
        self.manifest = manifest

    @property
    def batch(self):
        return self.manifest["batch"]  # "symbolic" | int

    @property
    def patch_size(self):
        return tuple(self.manifest["patch_size"])

    def check_platform(self) -> None:
        backend = jax.default_backend()
        if backend not in self.exported.platforms:
            raise RuntimeError(
                f"artifact was exported for {self.exported.platforms}, "
                f"current backend is {backend!r}")

    def patch_model_fn(self):
        """A ``model_fn`` for eval/sliding.py sliding_window_inference:
        (B, pd, ph, pw, nMod) -> (1, B, pd, ph, pw, C_out) — or, for s2d
        artifacts, a ``(stack, parities)`` pytree in and the channels-
        first head out.  Static-batch artifacts zero-pad ragged chunks
        (every leaf's leading axis) and drop the padded outputs."""
        call = self.exported.call
        if self.batch == "symbolic":
            return call
        B = int(self.batch)

        def fn(xb):
            n = jax.tree_util.tree_leaves(xb)[0].shape[0]
            if n > B:
                raise ValueError(f"chunk of {n} patches > artifact batch {B}")
            if n < B:
                xb = jax.tree_util.tree_map(
                    lambda a: jnp.pad(a, [(0, B - n)] + [(0, 0)]
                                      * (a.ndim - 1)), xb)
            return call(xb)[:, :n]

        return fn

    def volume_inferencer(self, patch_batch: Optional[int] = None,
                          hard_pred: bool = True, multilabel: bool = False):
        """Jitted whole-volume sliding-window inference from the artifact —
        the no-model-code analogue of sliding.make_jitted_volume_inferencer
        (same hard-pred semantics; the artifact already emits only the
        final head).  Takes ``(variables, image, patch_size, overlap)``
        with ``variables`` ignored, so eval/validate.py drives it
        unchanged.

        Column artifacts (manifest ``serve_grid='column'``): the patch D
        is the export-pinned column depth — volumes pad up to it (deeper
        volumes need a re-export); the caller's patch/overlap D entries
        are ignored in favor of the manifest's."""
        from .eval.sliding import sliding_window_inference

        model_fn = self.patch_model_fn()
        if patch_batch is None or patch_batch == "auto" or patch_batch <= 0:
            patch_batch = self.batch if self.batch != "symbolic" else 4
        if self.manifest.get("serve_stem") == "s2d":
            return self._s2d_volume_inferencer(int(patch_batch), hard_pred,
                                               multilabel)
        column = self.manifest.get("serve_grid") == "column"
        col_d = int(self.manifest.get("column_depth", 0))

        @partial(jax.jit, static_argnames=("patch_size", "overlap"))
        def infer(variables, image, patch_size, overlap):
            del variables
            d = image.shape[1]
            if column:
                if d > col_d:
                    raise ValueError(
                        f"volume depth {d} exceeds the artifact's pinned "
                        f"column depth {col_d} — re-export with a larger "
                        f"--export_column_depth")
                patch_size = self.patch_size
                overlap = tuple(self.manifest["overlap"])
                image = jnp.pad(image, ((0, 0), (0, col_d - d), (0, 0),
                                        (0, 0), (0, 0)))
            out = sliding_window_inference(model_fn, image, patch_size,
                                           overlap, int(patch_batch),
                                           normalize=not hard_pred)
            out = out[:, :, :d]  # crop the column pad (no-op for patch)
            if hard_pred:
                if multilabel:
                    out = (out >= 0).astype(jnp.uint8)
                else:
                    out = jnp.argmax(out, axis=-1).astype(jnp.uint8)
            return out

        return infer


    def _s2d_volume_inferencer(self, patch_batch: int, hard_pred: bool,
                               multilabel: bool):
        """Serving loop for an s2d artifact (export_s2d_model): host-side
        space-to-depth (data/native.py s2d_bf16 — threaded C++ with a
        NumPy fallback, both driven purely by the manifest geometry),
        device-side patch slicing, the exported channels-first forward,
        and the stitch.  Same call contract as the direct inferencer.

        Geometry the s2d grid cannot serve (odd H/W starts or extents)
        raises with the fix spelled out — export also writes the direct
        artifact alongside for exactly this case (cli/missions.py)."""
        import numpy as np

        from .data import native as effq_native
        from .eval.sliding import patch_grid, sliding_window_inference
        from .pallas.stem import (extract_pre_s2d_patches, s2d_need_planes,
                                  s2d_supported)

        model_fn = self.patch_model_fn()
        stem_attrs = {k: (tuple(v) if isinstance(v, list) else v)
                      for k, v in self.manifest["stem_geometry"].items()}

        @partial(jax.jit, static_argnames=("patch_size", "overlap",
                                           "vol_shape"))
        def run(sv, patch_size, overlap, vol_shape):
            out = sliding_window_inference(
                model_fn, sv, patch_size, overlap, int(patch_batch),
                normalize=not hard_pred, channels_first=True,
                extract_fn=extract_pre_s2d_patches, vol_shape=vol_shape)
            if hard_pred:
                if multilabel:
                    # channels-first sign test, then back to the
                    # channels-last contract of the eval consumers
                    return jnp.moveaxis((out >= 0).astype(jnp.uint8), 2, -1)
                return jnp.argmax(out, axis=2).astype(jnp.uint8)
            return jnp.moveaxis(out, 2, -1)

        def infer(variables_ignored, image, patch_size, overlap):
            del variables_ignored
            image = np.asarray(image)
            patch_size = tuple(ops.triple(patch_size))
            overlap = tuple(ops.triple(overlap))
            vol_shape = tuple(image.shape[1:4])
            starts = patch_grid(vol_shape, patch_size, overlap)
            if not s2d_supported(starts, patch_size, vol_shape, stem_attrs):
                raise ValueError(
                    f"volume {vol_shape} has odd H/W grid geometry the s2d "
                    f"artifact cannot serve — use the direct serving "
                    f"artifact exported alongside (serving_artifact.zip)")
            svol = effq_native.s2d_bf16(
                image.astype(np.float32, copy=False),
                s2d_need_planes(starts, patch_size))
            return run(jnp.asarray(svol), patch_size, overlap, vol_shape)

        return infer


def load_serving_artifact(path: str) -> ServingArtifact:
    from jax import export as jexport

    with zipfile.ZipFile(path) as z:
        manifest = json.loads(z.read(MANIFEST_NAME))
        if manifest.get("format") != FORMAT:
            raise ValueError(f"not a serving artifact (format="
                             f"{manifest.get('format')!r}, want {FORMAT!r})")
        exported = jexport.deserialize(z.read(MODULE_NAME))
    return ServingArtifact(exported, manifest)
