"""UResQ graph structure + forward smoke tests (tiny shapes, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.models import (UResQConfig, build_uresq, num_mo,
                                   preset_config, torch_io)


def tiny_cfg(quantize=False, blk_type="mid", ds="simple"):
    return UResQConfig(
        num_mod=2, num_classes=3,
        depth_config=[1, 1, 1], width_config=[4, 8, 4], dilation_config=[1, 1, 1],
        init_stride=(2, 2, 2), drop_rate=0.5, blk_type=blk_type, ds=ds,
        fuse_bn=True, ds_depth_limit=3, drop_cut_thres=6,
        quantize=quantize, qlvl_w=4, qlvl_act=4,
        q_first=(256, -1), q_last=(256, -1),
    )


def test_forward_shapes_and_heads():
    cfg = tiny_cfg()
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    x = jnp.zeros((1, 16, 16, 16, 2))
    out = jax.jit(lambda v, x: nnir.apply(graph, v, x))(variables, x)
    # 3-stage net: only the final head (no decoder stages besides final)
    assert out.shape == (num_mo(cfg), 1, 16, 16, 16, 3)


def test_seven_stage_heads():
    cfg = UResQConfig(
        num_mod=1, num_classes=2,
        depth_config=[1] * 7, width_config=[2, 4, 8, 8, 8, 4, 2],
        dilation_config=[1] * 7, init_stride=(2, 2, 2), drop_rate=0.0,
        blk_type="mid", ds="simple", ds_depth_limit=3, quantize=False)
    graph = build_uresq(cfg)
    assert num_mo(cfg) == 3
    assert len(graph.outputs) == 3
    variables = nnir.init(graph, jax.random.PRNGKey(1))
    x = jnp.ones((1, 32, 32, 32, 1))
    out = jax.jit(lambda v, x: nnir.apply(graph, v, x))(variables, x)
    assert out.shape == (3, 1, 32, 32, 32, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_qcfg_assignment():
    cfg = tiny_cfg(quantize=True)
    graph = build_uresq(cfg)
    qnodes = graph.qconv_nodes()
    names = [n.name for n in qnodes]
    # first conv quantized per q_first (256-level weights, fp acts)
    assert "conv0.conv" in names
    first = graph.node("conv0.conv").attrs["qcfg"]
    assert first.qlvl_w == 256 and not first.q_act
    # final conv per q_last
    last = graph.node("final_cls.cls").attrs["qcfg"]
    assert last.qlvl_w == 256 and not last.q_act
    # interior convs at main qcfg
    mid = graph.node("u_blocks.UResBlock2.Layer1.block1.conv").attrs["qcfg"]
    assert mid.qlvl_w == 4 and mid.qlvl_act == 4 and mid.q_act
    # UResQ blocks are width->width so no projection convs exist
    # (make_nBlocks passes inChans == outChans, factoryQ.py:202-211)
    assert not any("projection" in n for n in names)
    # transition (1x1) convs are quantized
    assert any("TransDown" in n for n in names)


def test_train_mode_updates_bn_state_and_dropout_runs():
    cfg = tiny_cfg()
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8, 2))
    out, new_state = nnir.apply(graph, variables, x, train=True,
                                rng=jax.random.PRNGKey(3))
    assert len(new_state) == len(variables["state"])
    changed = any(
        not np.allclose(np.asarray(new_state[k]["mean"]),
                        np.asarray(variables["state"][k]["mean"]))
        for k in new_state)
    assert changed


def test_torch_state_dict_roundtrip():
    cfg = tiny_cfg(quantize=True)
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    sd = torch_io.to_torch_state_dict(graph, variables)
    assert "conv0.conv.weight" in sd
    assert sd["conv0.conv.weight"].shape[2:] == (3, 3, 3)  # OIDHW
    # perturb and load back
    sd2 = {k: v + 1.0 if v.dtype == np.float32 else v for k, v in sd.items()}
    v2 = torch_io.load_torch_state_dict(graph, variables, sd2)
    w0 = np.asarray(variables["params"]["conv0.conv"]["kernel"])
    w2 = np.asarray(v2["params"]["conv0.conv"]["kernel"])
    np.testing.assert_allclose(w2, w0 + 1.0, atol=1e-6)


def test_preset_configs_build():
    for task in ("brats", "lits"):
        cfg = preset_config(task, quantize=True)
        graph = build_uresq(cfg)
        assert num_mo(cfg) == 3
        assert len(graph.outputs) == 3
        n_q = len(graph.qconv_nodes())
        assert n_q > 10
        # aux classifier convs are not quantized
        for n in graph.conv_nodes():
            if "AuxClassifier" in n.name:
                assert n.attrs["qcfg"] is None
