"""Mixed-precision training (--amp): bf16 activations, f32 master state.

The reference trains f32-only (torch 1.12, no autocast anywhere in the
tree); --amp is a TPU-native capability: bf16 keeps f32's exponent range,
so unlike fp16 AMP there is no loss scaling, and the MXU natively consumes
bf16 operands.  Contract: params, grads, BN running statistics, the loss,
and the Adam state stay f32; only in-graph activations (and the conv
operand casts) run at bf16.
"""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.train.losses import (cross_entropy, head_loss_weights,
                                         multi_output_loss)


def small(drop=0.0):
    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=drop, blk_type="mid",
                      ds="simple", ds_depth_limit=3)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    return graph, variables


def _loss(graph, compute_dtype):
    hw = head_loss_weights(len(graph.outputs))

    def loss(params, state, x, y, rng):
        out, ns = nnir.apply(graph, {"params": params, "state": state}, x,
                             train=True, rng=rng,
                             compute_dtype=compute_dtype)
        total, _ = multi_output_loss(cross_entropy, hw,
                                     jnp.moveaxis(out, -1, 2), y)
        return total, ns

    return loss


def _data(seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(2, 8, 8, 8, 1).astype(np.float32))
    y = jnp.asarray(rs.randint(0, 3, (2, 8, 8, 8)))
    return x, y


def test_amp_grads_f32_and_close_to_fp32():
    """bf16 compute must leave every grad leaf f32 and within bf16 rounding
    of the f32 gradients (loose relative tolerance, tight on direction)."""
    graph, variables = small()
    x, y = _data()
    rng = jax.random.PRNGKey(1)
    gf, _ = jax.grad(_loss(graph, None), has_aux=True)(
        variables["params"], variables["state"], x, y, rng)
    gb, _ = jax.grad(_loss(graph, jnp.bfloat16), has_aux=True)(
        variables["params"], variables["state"], x, y, rng)
    flat_f, flat_b = [], []
    for (kf, lf), (kb, lb) in zip(jax.tree_util.tree_leaves_with_path(gf),
                                  jax.tree_util.tree_leaves_with_path(gb)):
        assert kf == kb
        assert lb.dtype == jnp.float32, (kb, lb.dtype)
        a, b = np.asarray(lf).ravel(), np.asarray(lb).ravel()
        flat_f.append(a)
        flat_b.append(b)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na > 1e-8:
            cos = float(a @ b / (na * max(nb, 1e-30)))
            # tiny leaves (4-channel BN scales on this toy) see real bf16
            # direction noise; the global direction check below is tight
            assert cos > 0.9, (kf, cos)
    a = np.concatenate(flat_f)
    b = np.concatenate(flat_b)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    # measured ~0.982 on this 4-channel random-init toy (pure bf16 rounding:
    # the same harness with compute_dtype=f32 is BITWISE equal to the plain
    # path — the casts are the only difference); end-to-end convergence is
    # covered by test_trainer_amp_step_end_to_end
    assert cos > 0.97, cos


def test_amp_bn_state_f32_and_accurate():
    """BN batch statistics under bf16 compute accumulate in f32: running
    stats stay f32 dtype and track the f32 run's values closely."""
    graph, variables = small()
    x, y = _data(2)
    rng = jax.random.PRNGKey(2)
    _, ns_f = _loss(graph, None)(variables["params"], variables["state"],
                                 x, y, rng)
    _, ns_b = _loss(graph, jnp.bfloat16)(variables["params"],
                                         variables["state"], x, y, rng)
    assert set(ns_f) == set(ns_b)
    for k in ns_f:
        for f in ("mean", "var"):
            assert ns_b[k][f].dtype == jnp.float32, (k, f)
            np.testing.assert_allclose(np.asarray(ns_f[k][f]),
                                       np.asarray(ns_b[k][f]),
                                       rtol=2e-2, atol=2e-3, err_msg=k)


def test_amp_composes_with_remat():
    """--amp --remat: the segmented engine passes compute_dtype through;
    outputs must be bit-identical to unsegmented bf16 execution."""
    graph, variables = small(drop=0.5)
    x, _ = _data(3)
    rng = jax.random.PRNGKey(3)
    ref, _ = nnir.apply(graph, variables, x, train=True, rng=rng,
                        compute_dtype=jnp.bfloat16)
    out, _ = nnir.apply(graph, variables, x, train=True, rng=rng,
                        compute_dtype=jnp.bfloat16, remat=4)
    assert ref.dtype == jnp.float32  # head outputs stay f32
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_trainer_amp_step_end_to_end(tmp_path):
    """A Trainer with amp=True: params/opt state stay f32, loss finite and
    decreasing over a few epochs on a learnable toy."""
    from efficientq_tpu.train.trainer import Trainer

    graph, variables = small()
    rs = np.random.RandomState(4)
    xs = rs.randn(4, 1, 8, 8, 8).astype(np.float32)  # loader yields NCDHW
    ys = (xs[:, 0] > 0).astype(np.int64) + 1

    class Loader:
        def __len__(self):
            return 2

        def __iter__(self):
            for i in range(0, 4, 2):
                yield xs[i:i + 2], ys[i:i + 2]

    class Hub:
        trainloader = Loader()
        valloader = None
        testloader = None
        val_sn = test_sn = ()
        slide_patch_size = (8, 8, 8)
        slide_overlap = (4, 4, 4)
        merge_label_func = None

    tr = Trainer(graph, variables, Hub(), loss_name="ce",
                 num_mo=len(graph.outputs), n_class=3, base_lr=0.01,
                 max_epoch=3, snapshot_root=str(tmp_path), amp=True,
                 test_interval=99, display_interval=99)
    losses = [tr.train_epoch()["loss"] for _ in range(3)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    for leaf in jax.tree.leaves(tr.variables["params"]):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree.leaves(tr.opt_state):
        assert jnp.issubdtype(leaf.dtype, jnp.floating) is False or \
            leaf.dtype == jnp.float32


def test_amp_data_parallel_step_close_to_f32():
    """amp=True on the mesh step: finite, f32 param leaves, loss within
    bf16 rounding of the replicated f32 step from the same init."""
    from efficientq_tpu.parallel import (data_parallel_train_step, make_mesh,
                                         replicate, shard_batch)
    from efficientq_tpu.train.losses import cross_entropy, head_loss_weights
    from efficientq_tpu.train.schedule import make_optimizer

    graph, variables = small()
    mesh = make_mesh()
    opt, _ = make_optimizer(0.01, 100, 10)
    hw = head_loss_weights(len(graph.outputs))
    rng = np.random.RandomState(5)
    xs = shard_batch(mesh, jnp.asarray(
        rng.randn(8, 8, 8, 8, 1).astype(np.float32)))
    ys = shard_batch(mesh, jnp.asarray(rng.randint(0, 3, (8, 8, 8, 8))))
    var_r = replicate(mesh, variables)
    opt_state = opt.init(var_r["params"])

    losses = {}
    for amp in (False, True):
        step = data_parallel_train_step(graph, opt, cross_entropy, hw, mesh,
                                        amp=amp)
        p, _, _, loss, _ = step(var_r["params"], var_r["state"], opt_state,
                                xs, ys, jax.random.PRNGKey(1))
        losses[amp] = float(loss)
        for leaf in jax.tree.leaves(p):
            assert leaf.dtype == jnp.float32
    assert np.isfinite(losses[True])
    assert abs(losses[True] - losses[False]) < 0.02, losses
