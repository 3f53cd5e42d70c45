"""Multi-device tests on the simulated 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.parallel import (data_parallel_train_step, make_mesh,
                                     replicate, shard_batch,
                                     shard_patch_inference)
from efficientq_tpu.train.losses import cross_entropy, head_loss_weights
from efficientq_tpu.train.schedule import make_optimizer


def tiny():
    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds="simple", ds_depth_limit=3)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    return cfg, graph, variables


def test_eight_cpu_devices_available():
    assert jax.device_count() == 8


def test_data_parallel_step_matches_single_device():
    cfg, graph, variables = tiny()
    n_heads = len(graph.outputs)  # 3-stage net with ds_depth_limit=3 -> 2
    assert n_heads == 2
    mesh = make_mesh()
    opt, _ = make_optimizer(0.01, 100, 10)
    hw = head_loss_weights(n_heads)
    step = data_parallel_train_step(graph, opt, cross_entropy, hw, mesh)

    rng = np.random.RandomState(0)
    x = rng.randn(8, 8, 8, 8, 1).astype(np.float32)
    y = rng.randint(0, 3, (8, 8, 8, 8))
    opt_state = opt.init(variables["params"])
    xs = shard_batch(mesh, jnp.asarray(x))
    ys = shard_batch(mesh, jnp.asarray(y))
    var_r = replicate(mesh, variables)
    p, s, o, loss, arr = step(var_r["params"], var_r["state"], opt_state,
                              xs, ys, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # single-device oracle: same weighted multi-head loss, unsharded
    from efficientq_tpu.train.losses import multi_output_loss

    def loss_fn(params, state):
        out, _ = nnir.apply(graph, {"params": params, "state": state},
                            jnp.asarray(x), train=True,
                            rng=jax.random.PRNGKey(1))
        total, _ = multi_output_loss(cross_entropy, hw,
                                     jnp.moveaxis(out, -1, 2), jnp.asarray(y))
        return total

    ref_loss = float(loss_fn(variables["params"], variables["state"]))
    assert abs(float(loss) - ref_loss) < 1e-4


def test_sharded_patch_inference_matches_local():
    cfg, graph, variables = tiny()
    mesh = make_mesh()
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(1, 16, 16, 16, 1).astype(np.float32))
    out = shard_patch_inference(graph, mesh, variables, img, (8, 8, 8),
                                (4, 4, 4))
    from efficientq_tpu.eval.sliding import sliding_window_inference

    ref = sliding_window_inference(
        lambda xb: nnir.apply(graph, variables, xb), img, (8, 8, 8),
        (4, 4, 4), patch_batch=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-3)


def test_trainer_with_mesh(tmp_path):
    """Trainer end-to-end with a device mesh: loss decreases, batch axis
    sharded across all 8 devices."""
    from efficientq_tpu.data.datahub import DataHub
    from efficientq_tpu.data.synthetic import (make_synthetic_dataset,
                                               task_modalities)
    from efficientq_tpu.train import Trainer

    data_dir, split_dir = make_synthetic_dataset(
        str(tmp_path), task="lits", n_subjects=8, vol_shape=(16, 16, 16))
    hub = DataHub(data_dir, task_modalities("lits"),
                  train_split=f"{split_dir}/round1/train.txt",
                  train_batchsize=8, test_batchsize=1, access_type="npy",
                  crop_type="random", crop_size_img=(8, 8, 8),
                  slide_patch_size=(8, 8, 8), slide_overlap=(2, 2, 2))
    cfg, graph, variables = tiny()
    tr = Trainer(graph, variables, hub, loss_name="ce",
                 num_mo=len(graph.outputs), n_class=3, base_lr=0.01,
                 max_epoch=4, snapshot_root=str(tmp_path / "s"),
                 mesh=make_mesh())
    first = tr.train_epoch()["loss"]
    for _ in range(3):
        last = tr.train_epoch()["loss"]
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first


def test_fsdp_trainer_matches_replicated_dp(tmp_path):
    """--fsdp: params + optimizer state sharded over the data mesh.  The
    jitted step computes the same math as the replicated-dp step (GSPMD
    derives the all-gather / reduce-scatter schedule), so two steps from
    the same init must match; the carried state must actually live sharded
    (ZeRO memory saving), both at init and after a step."""
    from jax.sharding import PartitionSpec as P

    from efficientq_tpu.data.datahub import DataHub
    from efficientq_tpu.data.synthetic import (make_synthetic_dataset,
                                               task_modalities)
    from efficientq_tpu.train import Trainer

    data_dir, split_dir = make_synthetic_dataset(
        str(tmp_path), task="lits", n_subjects=8, vol_shape=(16, 16, 16))
    hub = DataHub(data_dir, task_modalities("lits"),
                  train_split=f"{split_dir}/round1/train.txt",
                  train_batchsize=8, test_batchsize=1, access_type="npy",
                  crop_type="random", crop_size_img=(8, 8, 8),
                  slide_patch_size=(8, 8, 8), slide_overlap=(2, 2, 2))
    cfg, graph, variables = tiny()
    mesh = make_mesh()
    kw = dict(loss_name="ce", num_mo=len(graph.outputs), n_class=3,
              base_lr=0.01, max_epoch=4, mesh=mesh)
    tr_rep = Trainer(graph, variables, hub,
                     snapshot_root=str(tmp_path / "rep"), **kw)
    tr_fs = Trainer(graph, variables, hub, fsdp=True,
                    snapshot_root=str(tmp_path / "fs"), **kw)

    # sharded placement from step 0: divisible leaves carry the data axis
    def data_sharded(tree):
        # plain (non-device_put) arrays carry SingleDeviceSharding: no .spec
        return [k for k, v in jax.tree_util.tree_leaves_with_path(tree)
                if "data" in str(getattr(v.sharding, "spec", ""))]

    assert data_sharded(tr_fs.variables["params"]), "no sharded param leaf"
    assert data_sharded(tr_fs.opt_state), "no sharded optimizer-state leaf"
    assert not data_sharded(tr_rep.variables["params"])

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 1, 8, 8, 8).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, (8, 8, 8, 8)))
    for i in range(2):
        out_r = tr_rep._train_step(tr_rep.variables["params"],
                                   tr_rep.variables["state"],
                                   tr_rep.opt_state, x, y, tr_rep.rng, i)
        tr_rep.variables = {"params": out_r[0], "state": out_r[1]}
        tr_rep.opt_state = out_r[2]
        out_f = tr_fs._train_step(tr_fs.variables["params"],
                                  tr_fs.variables["state"],
                                  tr_fs.opt_state, x, y, tr_fs.rng, i)
        tr_fs.variables = {"params": out_f[0], "state": out_f[1]}
        tr_fs.opt_state = out_f[2]
    np.testing.assert_allclose(float(out_r[3]), float(out_f[3]),
                               rtol=1e-5, atol=1e-6)
    for (kr, pr), (kf, pf) in zip(
            jax.tree_util.tree_leaves_with_path(tr_rep.variables["params"]),
            jax.tree_util.tree_leaves_with_path(tr_fs.variables["params"])):
        assert kr == kf
        np.testing.assert_allclose(np.asarray(pr), np.asarray(pf),
                                   rtol=1e-5, atol=1e-6, err_msg=str(kr))
    # the step's fixed point stays sharded
    assert data_sharded(tr_fs.variables["params"])
    assert data_sharded(tr_fs.opt_state)

    # the sharding helper's specs: conv kernels shard O, vectors their axis
    from efficientq_tpu.parallel import fsdp_shardings

    sh = fsdp_shardings(mesh, tr_rep.variables["params"])
    # at least one 5-D kernel sharded on its O axis
    specs = [v.spec for v in jax.tree_util.tree_leaves(sh)]
    assert any(s == P(None, None, None, None, "data") for s in specs)


def test_sharded_gram_stats_matches_single_device():
    """Mesh-sharded Gram accumulation (psum over the depth-slab axis) equals
    the single-chip compute_gram_stats, incl. a ragged last slab."""
    from efficientq_tpu.parallel import sharded_gram_stats
    from efficientq_tpu.ptq.solver import compute_gram_stats

    mesh = make_mesh()
    rng = np.random.RandomState(7)
    # Do=13 over 8 devices -> chunk 2, last device fully masked (ceil: 7*2=14)
    x = jnp.asarray(rng.randn(2, 13, 5, 5, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 13, 5, 5, 4).astype(np.float32))
    att = jnp.asarray(rng.rand(2, 13, 5, 5).astype(np.float32))
    for a in (att, None):
        sh = sharded_gram_stats(mesh, x, y, a, (3, 3, 3), (1, 1, 1),
                                (1, 1, 1))
        ref = compute_gram_stats(x, y, a, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        for f in ("A_att", "B_att", "A_unw", "B_unw", "yy_att", "yy_unw"):
            np.testing.assert_allclose(
                np.asarray(getattr(sh, f)), np.asarray(getattr(ref, f)),
                rtol=2e-4, atol=2e-4, err_msg=f)
        assert sh.numel_y == ref.numel_y


def test_sharded_gram_stats_strided():
    """Strided + anisotropic case (BraTS init conv shape class)."""
    from efficientq_tpu.parallel import sharded_gram_stats
    from efficientq_tpu.ptq.solver import compute_gram_stats

    mesh = make_mesh()
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 18, 8, 8, 2).astype(np.float32))
    y = jnp.asarray(rng.randn(1, 9, 4, 4, 3).astype(np.float32))
    att = jnp.asarray(rng.rand(1, 9, 4, 4).astype(np.float32))
    sh = sharded_gram_stats(mesh, x, y, att, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    ref = compute_gram_stats(x, y, att, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    np.testing.assert_allclose(np.asarray(sh.A_att), np.asarray(ref.A_att),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(sh.B_att), np.asarray(ref.B_att),
                               rtol=2e-4, atol=2e-4)


def test_tensor_parallel_matches_single_device():
    """Channel-sharded (TP) forward across a 2x4 mesh equals the local one."""
    from efficientq_tpu.parallel.mesh import make_mesh_2d, tensor_parallel_apply

    cfg, graph, variables = tiny()
    mesh = make_mesh_2d(2, 4)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8, 1)
                    .astype(np.float32))
    out_tp = tensor_parallel_apply(graph, mesh, variables, x)
    ref = nnir.apply(graph, variables, x)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(ref),
                               atol=1e-4, rtol=1e-3)


def test_sharded_gram_stats_valid_padding_tail():
    """padding=0 ('valid') geometry: the last device's receptive field
    extends past the even shard boundary — the replicated tail-halo rows
    must reach it (regression for real-data loss at the tail)."""
    from efficientq_tpu.parallel import sharded_gram_stats
    from efficientq_tpu.ptq.solver import compute_gram_stats

    mesh = make_mesh()
    rng = np.random.RandomState(13)
    # D=18, k=3, pad 0 -> Do=16; 8 devices -> chunk 2, own=2, halo=1;
    # last device's inputs need rows 16..17 past the 8*2=16 boundary
    x = jnp.asarray(rng.randn(1, 18, 5, 5, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(1, 16, 3, 3, 4).astype(np.float32))
    att = jnp.asarray(rng.rand(1, 16, 3, 3).astype(np.float32))
    for a in (att, None):
        sh = sharded_gram_stats(mesh, x, y, a, (3, 3, 3), (1, 1, 1),
                                (0, 0, 0))
        ref = compute_gram_stats(x, y, a, (3, 3, 3), (1, 1, 1), (0, 0, 0))
        for f in ("A_att", "B_att", "A_unw", "B_unw", "yy_att", "yy_unw"):
            np.testing.assert_allclose(
                np.asarray(getattr(sh, f)), np.asarray(getattr(ref, f)),
                rtol=2e-4, atol=2e-4, err_msg=f)


def test_calibrate_layer_sharded_matches_single_device():
    """Full per-layer calibration through the mesh (sharded Grams + the
    shared ADMM) matches calibrate_layer at the grid level, including the
    shallow-volume fallback (own < halo -> single-device Grams)."""
    from efficientq_tpu import ops
    from efficientq_tpu.parallel.ptq import calibrate_layer_sharded
    from efficientq_tpu.ptq.admm import PTQHyperParams, calibrate_layer

    mesh = make_mesh()
    rng = np.random.RandomState(5)
    for D in (16, 6):  # D=6: own(1) < halo(2) -> fallback path
        x = jnp.asarray(np.abs(rng.randn(1, D, 8, 8, 4)).astype(np.float32))
        k = jnp.asarray(rng.randn(3, 3, 3, 4, 6).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.randn(6).astype(np.float32) * 0.05)
        y = ops.conv3d(x, k, b, (1, 1, 1), (1, 1, 1), (1, 1, 1),
                       precision=jax.lax.Precision.HIGHEST)
        att = jnp.asarray(rng.rand(*y.shape[:-1]).astype(np.float32))
        kw = dict(ksize=(3, 3, 3), stride=(1, 1, 1), padding=(1, 1, 1),
                  dilation=(1, 1, 1), qlvl_w=4, has_bias=True,
                  hp=PTQHyperParams(admm_iter=20), qlvl_act=4)
        r1 = calibrate_layer(x, y, k, b, att, **kw)
        rs = calibrate_layer_sharded(mesh, x, y, k, b, att, **kw)
        g1 = np.round(np.asarray(r1["kernel"]) / float(r1["alpha_w"]) * 3)
        gs = np.round(np.asarray(rs["kernel"]) / float(rs["alpha_w"]) * 3)
        np.testing.assert_array_equal(gs, g1)
        assert abs(float(rs["alpha_w"]) - float(r1["alpha_w"])) < 1e-5
        assert abs(float(rs["alpha_act"]) - float(r1["alpha_act"])) < 1e-5


def test_calibrate_layer_sharded_channel_wise_parity():
    """Mesh-sharded calibration with per-channel alpha_w: identical grids
    and per-channel scales vs the single-device program (channel_wise
    flows through hp into the shared calibrate_from_stats)."""
    from efficientq_tpu import ops
    from efficientq_tpu.parallel.ptq import calibrate_layer_sharded
    from efficientq_tpu.ptq.admm import PTQHyperParams, calibrate_layer

    mesh = make_mesh()
    rng = np.random.RandomState(9)
    x = jnp.asarray(np.abs(rng.randn(1, 16, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 3, 4, 6).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(6).astype(np.float32) * 0.05)
    y = ops.conv3d(x, k, b, (1, 1, 1), (1, 1, 1), (1, 1, 1),
                   precision=jax.lax.Precision.HIGHEST)
    att = jnp.asarray(rng.rand(*y.shape[:-1]).astype(np.float32))
    kw = dict(ksize=(3, 3, 3), stride=(1, 1, 1), padding=(1, 1, 1),
              dilation=(1, 1, 1), qlvl_w=4, has_bias=True,
              hp=PTQHyperParams(admm_iter=20, channel_wise=True), qlvl_act=4)
    r1 = calibrate_layer(x, y, k, b, att, **kw)
    rs = calibrate_layer_sharded(mesh, x, y, k, b, att, **kw)
    a1 = np.asarray(r1["alpha_w"])
    assert a1.shape == (6,)
    g1 = np.round(np.asarray(r1["kernel"]) / a1 * 3)
    gs = np.round(np.asarray(rs["kernel"]) / np.asarray(rs["alpha_w"]) * 3)
    np.testing.assert_array_equal(gs, g1)
    np.testing.assert_allclose(np.asarray(rs["alpha_w"]), a1, atol=1e-5)


def test_run_ptq_with_mesh_matches_single_device(tmp_path):
    """run_ptq(mesh=...) end-to-end == single-device at W16A16 (fine
    enough that iterate/alpha selection has no near-ties to flip)."""
    from efficientq_tpu.models import UResQConfig, build_uresq
    from efficientq_tpu.ptq import run_ptq
    from efficientq_tpu.ptq.admm import PTQHyperParams

    cfg = UResQConfig(num_mod=1, num_classes=3, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None, quantize=True, qlvl_w=16, qlvl_act=16,
                      q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(2))
    rng = np.random.RandomState(0)
    calib = jnp.asarray(np.abs(rng.randn(1, 16, 16, 16, 1))
                        .astype(np.float32))
    hp = PTQHyperParams(admm_iter=10)
    _, _, r_mesh = run_ptq(graph, variables, calib, task="lits",
                           init_stride=(2, 2, 2), hp=hp, mesh=make_mesh())
    _, _, r_1dev = run_ptq(graph, variables, calib, task="lits",
                           init_stride=(2, 2, 2), hp=hp)
    np.testing.assert_allclose(np.asarray(r_mesh.output_q),
                               np.asarray(r_1dev.output_q),
                               atol=1e-3, rtol=1e-3)


def test_validate_seg_mesh_multilabel_matches_single_device():
    """validate_seg(mesh=...) on the MULTILABEL (sigmoid/sign-test) branch:
    the mesh path's on-device hard prediction (validate.py) must yield the
    same metrics as the single-device pipeline."""
    from efficientq_tpu.eval.validate import validate_seg

    cfg, graph, variables = tiny()
    num_mo = len(graph.outputs)
    rng = np.random.RandomState(11)
    loader = [
        (rng.randn(1, 1, 16, 16, 16).astype(np.float32),
         (rng.rand(1, 3, 16, 16, 16) > 0.5).astype(np.float32))
        for _ in range(2)
    ]
    kw = dict(num_mo=num_mo, n_class=3, patch_size=(8, 8, 8),
              overlap=(4, 4, 4), patch_batch=2)
    sm_mesh = validate_seg(graph, variables, loader, ["a", "b"],
                           mesh=make_mesh(), **kw)
    sm_one = validate_seg(graph, variables, loader, ["a", "b"], **kw)
    for i in range(num_mo):
        assert len(sm_mesh[i]) == 2
        m, o = sm_mesh[i].get_metric(), sm_one[i].get_metric()
        assert m.keys() == o.keys()
        for k in m:
            assert abs(m[k] - o[k]) < 1e-6, (i, k, m[k], o[k])


def test_hybrid_mesh_single_process():
    """make_hybrid_mesh on one process: (dcn, data) axes, batch shards over
    BOTH, fsdp shardings stay on the ICI 'data' axis, and the dp+fsdp step
    matches the 1-D-mesh step exactly (same devices, same math)."""
    from efficientq_tpu.parallel import (batch_sharding, fsdp_shardings,
                                         host_local_batch, make_hybrid_mesh)

    cfg, graph, variables = tiny()
    mesh_h = make_hybrid_mesh(2, 4)
    assert mesh_h.axis_names == ("dcn", "data")
    assert batch_sharding(mesh_h).spec == jax.sharding.PartitionSpec(
        ("dcn", "data"))
    # fsdp specs never mention the dcn axis (ZeRO gathers stay intra-slice)
    specs = jax.tree_util.tree_leaves(
        fsdp_shardings(mesh_h, variables["params"]),
        is_leaf=lambda x: isinstance(x, jax.sharding.NamedSharding))
    assert all("dcn" not in str(s.spec) for s in specs)

    opt, _ = make_optimizer(1e-3, 100, 10)
    loss = cross_entropy
    hw = head_loss_weights(len(graph.outputs))
    rng = np.random.RandomState(0)
    x = rng.randn(8, 16, 16, 16, 1).astype(np.float32)
    y = rng.randint(0, 3, (8, 16, 16, 16)).astype(np.int32)

    step_h = data_parallel_train_step(graph, opt, loss, hw, mesh_h, fsdp=True)
    var_h = replicate(mesh_h, variables)
    p0 = jax.device_put(var_h["params"], fsdp_shardings(mesh_h,
                                                        var_h["params"]))
    o0 = opt.init(p0)
    _, _, _, lv_h, _ = step_h(p0, var_h["state"], o0,
                              host_local_batch(mesh_h, x),
                              host_local_batch(mesh_h, y),
                              jax.random.PRNGKey(1))

    mesh_1 = make_mesh(8)
    step_1 = data_parallel_train_step(graph, opt, loss, hw, mesh_1)
    var_1 = replicate(mesh_1, variables)
    o1 = opt.init(var_1["params"])
    _, _, _, lv_1, _ = step_1(var_1["params"], var_1["state"], o1,
                              shard_batch(mesh_1, jnp.asarray(x)),
                              shard_batch(mesh_1, jnp.asarray(y)),
                              jax.random.PRNGKey(1))
    assert abs(float(lv_h) - float(lv_1)) < 1e-5, (lv_h, lv_1)


def test_mesh_shape_cli_flag():
    from types import SimpleNamespace

    from efficientq_tpu.cli.entrance import build_parser
    from efficientq_tpu.cli.missions import _make_dp_mesh

    args = build_parser().parse_args(["ptq", "--mesh_shape", "2,4"])
    assert args.mesh_shape == "2,4" and not args.distributed
    mesh = _make_dp_mesh(args)
    assert mesh.shape == {"dcn": 2, "data": 4}
    # batch divisibility checked against the full mesh
    import pytest

    bad = SimpleNamespace(mesh_shape="2,4", batch_size=3)
    with pytest.raises(ValueError):
        _make_dp_mesh(bad, check_batch=True)


def test_host_local_batch_uneven_multiprocess_raises(monkeypatch):
    """Multi-process uneven batches fail fast with a named error (the
    single-process fallback — place unsharded, let the in-jit constraint
    distribute — has no multi-process analogue; without the guard the
    failure surfaces as an opaque shape-assembly error deep inside
    make_array_from_process_local_data)."""
    import pytest

    from efficientq_tpu.parallel import host_local_batch, make_mesh
    from efficientq_tpu.parallel import mesh as mesh_mod

    mesh = make_mesh(8)
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    x = np.zeros((3, 4, 4, 4, 1), np.float32)  # 3 % (8/2 = 4 local shards)
    with pytest.raises(ValueError, match="process-local batch"):
        host_local_batch(mesh, x)
    # single-process uneven batches still take the unsharded fallback
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 1)
    out = host_local_batch(mesh, x)
    assert out.shape == (3, 4, 4, 4, 1)
