"""Cross-implementation parity against the actual reference code.

Builds the reference's torch UResQ (imported from the read-only reference
tree — used purely as a test oracle, skipped when unavailable), transfers
its randomly-initialized state dict into our graph via torch_io, and checks
the forwards agree.  This validates the name mapping, block orderings, deep
supervision wiring, upsampling convention and BN semantics against the real
implementation rather than our own re-derivation.
"""
import os.path as P
import sys

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not P.isdir(REF),
                                reason="reference tree not mounted")


class _Args:
    """Minimal argparse.Namespace stand-in for the reference definer."""

    task = "brats"
    nMod = 2
    nClass = 4
    bin_label = None
    multi_label = "brats"
    model = "UResQ"
    init_stride = "2,2,2"
    blk = "mid"
    qconv = "conv"
    qlvl_w = None
    qlvl_a = None
    q_first = None
    q_last = None
    nla = "relu"
    norm = "bn"
    drop_rate = 0.0
    width = "4,8,4"
    depth = "1,1,1"
    dilation = "1,1,1"
    ds = "simple"
    hetero_dim = True
    init_kernel = 3
    pretrain = None
    resume = None


def build_reference_model(nla="relu"):
    # the reference's utils.misc imports pytz (absent here) for timestamp
    # formatting only; stub it so the model factory can be imported
    import types

    if "pytz" not in sys.modules:
        fake = types.ModuleType("pytz")
        fake.timezone = lambda tz: None
        sys.modules["pytz"] = fake
    sys.path.insert(0, REF)
    try:
        from definer import get_model_cube

        args = _Args()
        args.nla = nla
        cube, _ = get_model_cube(args)
        return cube["model"], cube["num_mo"]
    finally:
        sys.path.remove(REF)


def our_config(inplace_nla=True):
    from efficientq_tpu.models import UResQConfig

    return UResQConfig(
        num_mod=2, num_classes=3, depth_config=[1, 1, 1],
        width_config=[4, 8, 4], dilation_config=[1, 1, 1],
        init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid", ds="simple",
        ds_depth_limit=3, drop_cut_thres=128, aniso_pool_depth=99999,
        aniso_pool_stride=(2, 2, 1), fuse_bn=True, inplace_nla=inplace_nla)


def test_forward_matches_reference_model():
    import torch

    import jax
    import jax.numpy as jnp

    from efficientq_tpu import nnir, ops
    from efficientq_tpu.models import build_uresq, torch_io

    torch.manual_seed(0)
    ref_model, ref_num_mo = build_reference_model()
    ref_model.eval()
    # randomize BN running stats so eval-mode BN is non-trivial
    rng = np.random.RandomState(0)
    for m in ref_model.modules():
        if m.__class__.__name__ == "BatchNorm3d":
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(*m.running_mean.shape).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (np.abs(rng.randn(*m.running_var.shape)) * 0.3 + 0.7)
                .astype(np.float32)))

    graph = build_uresq(our_config())
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = torch_io.load_torch_state_dict(graph, variables, sd,
                                               strict=False)
    # every one of our parameter tensors must have come from the reference
    ours = set()
    for node in graph.nodes:
        if node.op == "conv":
            ours.add(f"{node.name}.weight")
        elif node.op == "bn":
            ours.add(f"{node.name}.weight")
            ours.add(f"{node.name}.running_mean")
    missing = ours - set(sd.keys())
    assert not missing, f"name mapping gaps: {sorted(missing)[:5]}"

    x = rng.randn(1, 2, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x)).numpy()  # (M, N, C, D, H, W)

    got = nnir.apply(graph, variables, ops.ncdhw_to_ndhwc(jnp.asarray(x)),
                     precision=jax.lax.Precision.HIGHEST)
    got = np.moveaxis(np.asarray(got), -1, 2)

    assert got.shape == ref_out.shape == (ref_num_mo, 1, 3, 16, 16, 16)
    scale = np.abs(ref_out).max()
    np.testing.assert_allclose(got, ref_out, atol=3e-3 * scale, rtol=3e-3)


def test_reluf_forward_matches_reference_model():
    """--nla reluf (non-in-place ReLU, definer.py:179-184) changes the 'mid'
    ordering's residual math: the skip path adds x rather than relu(x).
    Our inplace_nla=False graph must match the reference's reluf model."""
    import torch

    import jax
    import jax.numpy as jnp

    from efficientq_tpu import nnir, ops
    from efficientq_tpu.models import build_uresq, torch_io

    torch.manual_seed(2)
    ref_model, ref_num_mo = build_reference_model(nla="reluf")
    ref_model.eval()
    rng = np.random.RandomState(2)
    for m in ref_model.modules():
        if m.__class__.__name__ == "BatchNorm3d":
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(*m.running_mean.shape).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (np.abs(rng.randn(*m.running_var.shape)) * 0.3 + 0.7)
                .astype(np.float32)))

    graph = build_uresq(our_config(inplace_nla=False))
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = torch_io.load_torch_state_dict(graph, variables, sd,
                                               strict=False)

    x = rng.randn(1, 2, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x)).numpy()

    got = nnir.apply(graph, variables, ops.ncdhw_to_ndhwc(jnp.asarray(x)),
                     precision=jax.lax.Precision.HIGHEST)
    got = np.moveaxis(np.asarray(got), -1, 2)
    assert got.shape == ref_out.shape == (ref_num_mo, 1, 3, 16, 16, 16)
    scale = np.abs(ref_out).max()
    np.testing.assert_allclose(got, ref_out, atol=3e-3 * scale, rtol=3e-3)

    # and the two nla modes genuinely differ (else this test proves nothing)
    graph_ip = build_uresq(our_config(inplace_nla=True))
    vars_ip = nnir.init(graph_ip, jax.random.PRNGKey(0))
    vars_ip = torch_io.load_torch_state_dict(graph_ip, vars_ip, sd,
                                             strict=False)
    got_ip = nnir.apply(graph_ip, vars_ip, ops.ncdhw_to_ndhwc(jnp.asarray(x)),
                        precision=jax.lax.Precision.HIGHEST)
    assert not np.allclose(np.asarray(got_ip), np.moveaxis(got, 2, -1),
                           atol=1e-5)


def test_fold_bn_matches_reference_fold():
    """Our pure fold transform vs the reference's in-place fold: outputs of
    the folded models must agree."""
    import torch

    import jax
    import jax.numpy as jnp

    from efficientq_tpu import nnir, ops
    from efficientq_tpu.models import build_uresq, torch_io
    from efficientq_tpu.ptq import fold_bn

    torch.manual_seed(1)
    ref_model, _ = build_reference_model()
    ref_model.eval()
    rng = np.random.RandomState(1)
    for m in ref_model.modules():
        if m.__class__.__name__ == "BatchNorm3d":
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(*m.running_mean.shape).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (np.abs(rng.randn(*m.running_var.shape)) * 0.3 + 0.7)
                .astype(np.float32)))

    graph = build_uresq(our_config())
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = torch_io.load_torch_state_dict(graph, variables, sd)

    sys.path.insert(0, REF)
    try:
        from models.fold_bn import search_fold_and_remove_bn

        search_fold_and_remove_bn(ref_model)
    finally:
        sys.path.remove(REF)

    fgraph, fvars = fold_bn(graph, variables)
    x = rng.randn(1, 2, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x)).numpy()
    got = nnir.apply(fgraph, fvars, ops.ncdhw_to_ndhwc(jnp.asarray(x)),
                     precision=jax.lax.Precision.HIGHEST)
    got = np.moveaxis(np.asarray(got), -1, 2)
    scale = np.abs(ref_out).max()
    np.testing.assert_allclose(got, ref_out, atol=3e-3 * scale, rtol=3e-3)


@pytest.mark.parametrize("blk,ds", [("pre", "simple"), ("post", "complex"),
                                    ("mid", "complex")])
def test_variant_orderings_match_reference(blk, ds):
    """pre/post block orderings and complex deep-supervision heads vs the
    actual reference model (closes the 'built but preset-unexercised' gap)."""
    import types

    import torch

    import jax
    import jax.numpy as jnp

    from efficientq_tpu import nnir, ops
    from efficientq_tpu.models import UResQConfig, build_uresq, torch_io

    if "pytz" not in sys.modules:
        fake = types.ModuleType("pytz")
        fake.timezone = lambda tz: None
        sys.modules["pytz"] = fake
    torch.manual_seed(5)

    class A(_Args):
        pass

    A.blk = blk
    A.ds = ds
    sys.path.insert(0, REF)
    try:
        from definer import get_model_cube

        cube, _ = get_model_cube(A())
        ref_model, ref_num_mo = cube["model"], cube["num_mo"]
    finally:
        sys.path.remove(REF)
    ref_model.eval()
    rng = np.random.RandomState(5)
    for m in ref_model.modules():
        if m.__class__.__name__ == "BatchNorm3d":
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(*m.running_mean.shape).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (np.abs(rng.randn(*m.running_var.shape)) * 0.3 + 0.7)
                .astype(np.float32)))

    cfg = UResQConfig(
        num_mod=2, num_classes=3, depth_config=[1, 1, 1],
        width_config=[4, 8, 4], dilation_config=[1, 1, 1],
        init_stride=(2, 2, 2), drop_rate=0.0, blk_type=blk, ds=ds,
        ds_depth_limit=3, drop_cut_thres=128, aniso_pool_depth=99999,
        aniso_pool_stride=(2, 2, 1), fuse_bn=True)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = torch_io.load_torch_state_dict(graph, variables, sd,
                                               strict=False)

    x = rng.randn(1, 2, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x)).numpy()
    got = nnir.apply(graph, variables, ops.ncdhw_to_ndhwc(jnp.asarray(x)),
                     precision=jax.lax.Precision.HIGHEST)
    got = np.moveaxis(np.asarray(got), -1, 2)
    assert got.shape == ref_out.shape == (ref_num_mo, 1, 3, 16, 16, 16)
    scale = np.abs(ref_out).max()
    np.testing.assert_allclose(got, ref_out, atol=3e-3 * scale, rtol=3e-3)
