"""Full-model parity: our JAX forward vs the same graph executed with torch
CPU ops from the same parameters — the migration guarantee for reference
users (checkpoints + numerics carry over)."""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir, ops
from efficientq_tpu.models import UResQConfig, build_uresq, torch_io
from efficientq_tpu.models.torch_exec import torch_reference_forward


def randomized(graph, seed=0):
    variables = nnir.init(graph, jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    for p in variables["params"].values():
        for k in p:
            if p[k].ndim > 0:
                p[k] = jnp.asarray(rng.randn(*p[k].shape).astype(np.float32) * 0.2)
    for s in variables["state"].values():
        s["mean"] = jnp.asarray(rng.randn(*s["mean"].shape).astype(np.float32) * 0.1)
        s["var"] = jnp.asarray((np.abs(rng.randn(*s["var"].shape)) * 0.3 + 0.7)
                               .astype(np.float32))
    return variables


def test_full_model_matches_torch_execution():
    cfg = UResQConfig(num_mod=2, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.5, blk_type="mid",
                      ds="simple", ds_depth_limit=3)
    graph = build_uresq(cfg)
    variables = randomized(graph)
    x = np.random.RandomState(1).randn(2, 2, 16, 16, 16).astype(np.float32)

    ref = torch_reference_forward(graph, variables, x).numpy()
    got = nnir.apply(graph, variables, ops.ncdhw_to_ndhwc(jnp.asarray(x)),
                     precision=jax.lax.Precision.HIGHEST)
    got = np.moveaxis(np.asarray(got), -1, 2)  # (M,N,...,C) -> (M,N,C,...)
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-2 * scale, rtol=1e-2)
    # tight agreement in the bulk
    err = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    assert np.median(err) < 1e-3


def test_torch_state_dict_import_preserves_forward():
    """Export to a torch-style state dict, reload into fresh variables, and
    confirm identical outputs — the checkpoint migration path."""
    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(1, 1, 1), drop_rate=0.0, blk_type="mid",
                      ds=None)
    graph = build_uresq(cfg)
    variables = randomized(graph, 3)
    sd = torch_io.to_torch_state_dict(graph, variables)
    fresh = nnir.init(graph, jax.random.PRNGKey(99))
    loaded = torch_io.load_torch_state_dict(graph, fresh, sd, strict=True)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 8, 1)
                    .astype(np.float32))
    a = nnir.apply(graph, variables, x)
    b = nnir.apply(graph, loaded, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
