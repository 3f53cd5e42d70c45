"""Per-output-channel weight scales (--channel_wise).

The reference's PTQBlock reads a ``channel_wise`` attribute that no
PTQConv ever defines (src/models/PTQBlock.py:15) — an aspirational
capability with no implementation.  Here it is real: the ADMM projection
runs per output channel (quant.py::project_by_iter_rows), the deployed
int8 epilogue scale becomes a per-channel row (the Pallas kernels read a
(2, O) scale+bias pair), and the pack/unpack/interop paths carry vector
alphas.
"""
import jax
import jax.numpy as jnp
import numpy as np

from efficientq_tpu import nnir
from efficientq_tpu.models import UResQConfig, build_uresq
from efficientq_tpu.ptq import PTQHyperParams, run_ptq
from efficientq_tpu.quant import (pack_int_weight, project_by_iter,
                                  project_by_iter_rows, unpack_int_weight)


def test_project_rows_matches_per_row_scalar():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(5, 13).astype(np.float32))
    a_rows, b_rows = project_by_iter_rows(w, 4)
    assert a_rows.shape == (5,)
    for i in range(5):
        a_i, b_i = project_by_iter(w[i], 4)
        np.testing.assert_allclose(float(a_rows[i]), float(a_i), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(b_rows[i]), np.asarray(b_i))
    # per-row reconstruction is never worse than the shared-scale one
    a_t, b_t = project_by_iter(w, 4)
    err_rows = float(jnp.sum((a_rows[:, None] * b_rows - w) ** 2))
    err_tensor = float(jnp.sum((a_t * b_t - w) ** 2))
    assert err_rows <= err_tensor * (1 + 1e-6)


def test_pack_unpack_vector_alpha_roundtrip():
    rng = np.random.RandomState(1)
    alpha = np.abs(rng.randn(6)).astype(np.float32) + 0.5
    grid = (rng.randint(0, 4, size=(6, 3, 3, 3, 5)) * (2 / 3) - 1)
    w = (alpha.reshape(-1, 1, 1, 1, 1) * grid).astype(np.float32)  # (O,I,...)
    codes = pack_int_weight(w, alpha, 4)
    assert codes.dtype == np.uint8
    back = unpack_int_weight(codes, alpha, 4)
    np.testing.assert_allclose(back, w, atol=1e-6)


def _tiny():
    cfg = UResQConfig(
        num_mod=2, num_classes=3, depth_config=[1, 1, 1],
        width_config=[4, 8, 4], dilation_config=[1, 1, 1],
        init_stride=(2, 2, 2), drop_rate=0.0, blk_type="mid", ds="simple",
        ds_depth_limit=3, quantize=True, qlvl_w=4, qlvl_act=4,
        q_first=(256, -1), q_last=(256, -1))
    graph = build_uresq(cfg)
    variables = nnir.init(graph, jax.random.PRNGKey(0))
    return cfg, graph, variables


def test_channel_wise_ptq_improves_and_deploys_bit_exact():
    from efficientq_tpu.ptq.deploy import to_int8_inference

    cfg, graph, variables = _tiny()
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 16, 16, 16, 2).astype(np.float32))

    res = {}
    for cw in (False, True):
        hp = PTQHyperParams(admm_iter=40, channel_wise=cw)
        fg, qv, rep = run_ptq(graph, variables, x, task="lits",
                              init_stride=cfg.init_stride, hp=hp)
        res[cw] = (fg, qv, rep)
        if cw:
            alphas = [qv["params"][n.name]["alpha_w"]
                      for n in fg.qconv_nodes()
                      if n.attrs["qcfg"].q_weight]
            assert all(a.ndim == 1 for a in alphas)
    # per-channel scales give a strictly richer grid: whole-net output
    # reconstruction must not regress (measured on this fixture: improves)
    err = {cw: float(jnp.linalg.norm(r[2].output_q - r[2].output_fp))
           for cw, r in res.items()}
    assert err[True] <= err[False] * 1.02, err

    # int8 deployment with per-channel epilogue scales matches the
    # fake-quant forward to f32 reduction-order noise (same tolerance as
    # tests/test_int8_deploy.py), and the Pallas path matches the XLA int8
    # path EXACTLY (both integer accumulation + identical f32 epilogue)
    fg, qv, _ = res[True]
    ref = nnir.apply(fg, qv, x, mode="quantized",
                     precision=jax.lax.Precision.HIGHEST)
    outs = {}
    for pallas in (False, True):
        ig, iv = to_int8_inference(fg, qv, pallas=pallas)
        nscale = [iv["params"][n.name]["scale"].ndim
                  for n in ig.nodes if n.attrs.get("int8")]
        assert nscale and all(nd == 1 for nd in nscale)
        outs[pallas] = nnir.apply(ig, iv, x, mode="quantized",
                                  precision=jax.lax.Precision.HIGHEST)
        scale = float(jnp.std(ref))
        np.testing.assert_allclose(np.asarray(outs[pallas]), np.asarray(ref),
                                   atol=2e-3 * scale + 1e-4, rtol=1e-3)
    # XLA-int8 vs Pallas-int8 differ only by f32 reduction order in the
    # non-int8 layers (the 1x1 Pallas matmuls) — ulp-level
    np.testing.assert_allclose(np.asarray(outs[False]),
                               np.asarray(outs[True]), atol=1e-5)


def test_channel_wise_interop_roundtrip():
    from efficientq_tpu.models import torch_io

    cfg, graph, variables = _tiny()
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 16, 16, 16, 2).astype(np.float32))
    hp = PTQHyperParams(admm_iter=10, channel_wise=True)
    fg, qv, _ = run_ptq(graph, variables, x, task="lits",
                        init_stride=cfg.init_stride, hp=hp)
    sd = torch_io.to_torch_state_dict(fg, qv)
    v2 = torch_io.load_torch_state_dict(fg, nnir.init(fg, jax.random.PRNGKey(1)),
                                        sd)
    hi = jax.lax.Precision.HIGHEST
    a = nnir.apply(fg, qv, x, mode="quantized", precision=hi)
    b = nnir.apply(fg, v2, x, mode="quantized", precision=hi)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_channel_wise_flag():
    from efficientq_tpu.cli.definer import get_lwq_hyperparams
    from efficientq_tpu.cli.entrance import build_parser

    args = build_parser().parse_args(["ptq", "--channel_wise"])
    assert get_lwq_hyperparams(args).channel_wise
    args = build_parser().parse_args(["ptq"])
    assert not get_lwq_hyperparams(args).channel_wise
