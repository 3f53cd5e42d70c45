"""Int8 deployment path: exactness vs the fake-quant f32 forward."""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import PTQHyperParams, run_ptq
from efficientq_tpu.ptq.deploy import eligible, to_int8_inference


def make_quantized():
    cfg = UResQConfig(num_mod=1, num_classes=2, depth_config=[1, 1, 1],
                      width_config=[4, 8, 4], dilation_config=[1, 1, 1],
                      init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid",
                      ds=None, quantize=True, qlvl_w=4, qlvl_act=4,
                      q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 16, 1)
                    .astype(np.float32))
    fgraph, qvars, _ = run_ptq(graph, variables, x, task="lits",
                               init_stride=(2, 2, 2),
                               hp=PTQHyperParams(admm_iter=8))
    return fgraph, qvars, x


def test_int8_matches_fake_quant():
    fgraph, qvars, x = make_quantized()
    ref = nnir.apply(fgraph, qvars, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    igraph, ivars = to_int8_inference(fgraph, qvars)
    # interior 4-level convs converted; 256-level first/last kept float
    n_int8 = sum(1 for n in igraph.nodes if n.attrs.get("int8"))
    assert n_int8 >= 8
    assert not igraph.node("conv0.conv").attrs.get("int8")
    got = nnir.apply(igraph, ivars, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    scale = float(jnp.std(ref))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3 * scale + 1e-4, rtol=1e-3)


def test_int8_codes_are_odd_symmetric():
    fgraph, qvars, _ = make_quantized()
    igraph, ivars = to_int8_inference(fgraph, qvars)
    for node in igraph.nodes:
        if node.attrs.get("int8"):
            codes = np.asarray(ivars["params"][node.name]["kernel_int8"])
            nw = node.attrs["qcfg"].qlvl_w
            assert codes.dtype == np.int8
            assert set(np.unique(np.abs(codes))) <= {1, 3} if nw == 4 else True
            assert np.abs(codes).max() <= nw - 1


def test_eligibility_rules():
    from efficientq_tpu.nnir import QCfg

    assert eligible(QCfg(True, 4, True, 4))
    assert eligible(QCfg(True, 16, True, 16))
    assert not eligible(QCfg(True, 256, False, -1))   # q_first style
    assert not eligible(QCfg(True, 256, True, 256))   # codes overflow int8
    assert not eligible(None)
