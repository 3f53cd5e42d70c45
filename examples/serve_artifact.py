#!/usr/bin/env python3
"""Serve a volume from a serving artifact — NO model code, NO flags.

    python examples/serve_artifact.py serving_artifact.zip volume.npy out.npy

This is the whole point of `--export_artifact` (export.py): the zip holds
the deployed final-head patch forward itself (versioned StableHLO via
``jax.export``) plus a manifest with the stitch geometry, so a consumer
needs none of the model-construction stack the reference requires to
serve a quantized net (src/models/PTQConv.py:128-143 stores weights only;
re-checking a net there means re-running the PTQ pipeline,
src/ptqer.py:282-387).  Everything below the argparse is the entire
client: load, check platform, stitch, save.
"""
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if os.environ.get("EFFQ_PLATFORM"):  # same backend pin as the CLI
    import jax

    jax.config.update("jax_platforms", os.environ["EFFQ_PLATFORM"])

from efficientq_tpu.export import load_serving_artifact  # noqa: E402


def main(art_path: str, vol_path: str, out_path: str) -> None:
    import jax.numpy as jnp

    art = load_serving_artifact(art_path)
    art.check_platform()
    m = art.manifest
    print(f"artifact: task={m.get('task')} patch={art.patch_size} "
          f"classes={m.get('n_class')} platforms={m['platforms']}")

    vol = np.load(vol_path)  # (D, H, W) single-mod or (nMod, D, H, W)
    if vol.ndim == 3:
        vol = vol[None]
    x = jnp.asarray(vol.astype(np.float32).transpose(1, 2, 3, 0)[None])

    infer = art.volume_inferencer(
        hard_pred=True, multilabel=m.get("multilabel_fusetype") is not None)
    seg = infer(None, x, art.patch_size, tuple(m["overlap"]))
    np.save(out_path, np.asarray(seg[0]))
    print(f"segmentation -> {out_path} (labels "
          f"{np.unique(np.asarray(seg))})")


if __name__ == "__main__":
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    main(*sys.argv[1:4])
