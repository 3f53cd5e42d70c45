"""Multi-chip scaling: device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.2 — no torch.distributed
anywhere); multi-device execution here is a new TPU-native capability built
on ``jax.sharding``:

- data parallelism: shard the batch axis of the train step across the mesh;
  XLA inserts the gradient all-reduce over ICI automatically.
- eval "spatial parallelism": the sliding-window patch grid of a whole
  volume is a batch of patches — shard that axis the same way.

Everything is a sharding annotation on the same single-program jitted
functions; no collectives are written by hand.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Idempotent ``jax.distributed.initialize`` wrapper — the multi-host
    (DCN) entry point (SURVEY.md §2.2/§5: ICI intra-slice, DCN multi-slice).

    With no arguments, jax reads the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    cluster autodetectors on TPU pods).  Must run before any backend
    initializes.  Safe to call twice (second call is a no-op)."""
    try:
        # idempotency probe that does NOT touch the XLA backend
        # (jax.process_count() would initialize it, and initialize() must
        # run before any backend init)
        from jax._src.distributed import global_state

        if getattr(global_state, "client", None) is not None:
            return
    except ImportError:  # pragma: no cover — private-module move
        pass
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized -> idempotent
        if "already initialized" not in str(e):
            raise


def make_hybrid_mesh(n_dcn: int, n_ici: int,
                     axes: Sequence[str] = ("dcn", "data")) -> Mesh:
    """(n_dcn, n_ici) 2-D mesh: outer axis across processes/slices (DCN),
    inner axis within a slice (ICI).

    Multi-process: uses ``mesh_utils.create_hybrid_device_mesh`` so the
    inner axis stays within each process's local devices — collectives on
    the ``data`` (ICI) axis ride the fast interconnect and only the outer
    axis crosses DCN.  Single-process (incl. the CPU dryrun): a plain
    reshape of the device list, same axis semantics.

    Use with :func:`data_parallel_train_step`: the batch shards over BOTH
    axes; ``fsdp=True`` shards parameters over the ICI axis only (ZeRO
    all-gathers never cross DCN — the standard pod recipe)."""
    total = n_dcn * n_ici
    devs = jax.devices()
    if len(devs) < total:
        raise ValueError(f"mesh {n_dcn}x{n_ici} needs {total} devices, "
                         f"have {len(devs)}")
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        if n_dcn % jax.process_count() != 0 and \
                jax.process_count() % n_dcn != 0:
            raise ValueError(
                f"dcn axis {n_dcn} incompatible with "
                f"{jax.process_count()} processes")
        # TPU pods group the outer axis by slice_index; CPU (the dryrun)
        # reports one slice for every process — group by process there
        n_slices = len({getattr(d, "slice_index", None) or 0
                        for d in devs[:total]})
        arr = mesh_utils.create_hybrid_device_mesh(
            (n_ici,), (n_dcn,), devices=devs[:total],
            process_is_granule=n_slices != n_dcn)
        return Mesh(arr.reshape(n_dcn, n_ici), tuple(axes))
    return Mesh(np.array(devs[:total]).reshape(n_dcn, n_ici), tuple(axes))


def batch_axes(mesh: Mesh, axis_name: str = "data"):
    """The mesh axes a batch dimension shards over: every mesh axis for a
    hybrid (dcn, data) mesh, else just ``axis_name``."""
    return (tuple(mesh.axis_names) if "dcn" in mesh.axis_names
            else (axis_name,))


def host_local_batch(mesh: Mesh, arr, axis_name: str = "data"):
    """Multi-process-safe :func:`shard_batch`: ``arr`` is THIS process's
    shard of the global batch (global batch = process-local batch x
    process count along the leading axis)."""
    sh = NamedSharding(mesh, P(batch_axes(mesh, axis_name)))
    n_shards = int(np.prod([mesh.shape[a]
                            for a in batch_axes(mesh, axis_name)]))
    if jax.process_count() > 1:
        # the single-process uneven fallback below (place unsharded, let
        # the in-jit constraint distribute) has no multi-process analogue:
        # make_array_from_process_local_data would raise a shape-assembly
        # error deep inside jax — fail fast with the fix spelled out
        per_proc = n_shards // jax.process_count()
        if per_proc == 0 or arr.shape[0] % per_proc:
            raise ValueError(
                f"process-local batch {arr.shape[0]} does not divide this "
                f"process's {per_proc} mesh shard(s) "
                f"({n_shards} global shards / {jax.process_count()} "
                f"processes); multi-process meshes need the per-process "
                f"batch to be a multiple of its local shard count — pad "
                f"or adjust --batch_size")
        global_shape = (arr.shape[0] * jax.process_count(),) + arr.shape[1:]
        return jax.make_array_from_process_local_data(sh, np.asarray(arr),
                                                      global_shape)
    if arr.shape[0] % n_shards:
        # uneven batch: device_put rejects it, but the step's in-jit
        # with_sharding_constraint allows uneven sharding — place it
        # unsharded and let the constraint distribute (single-process only)
        return jax.device_put(np.asarray(arr))
    return jax.device_put(arr, sh)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """First-axis (batch) sharding; everything else replicated.  On a
    hybrid (dcn, data) mesh the batch shards over BOTH axes."""
    return NamedSharding(mesh, P(batch_axes(mesh, axis_name)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, arr, axis_name: str = "data"):
    """Place ``arr`` with its leading axis sharded across the mesh (pads are
    the caller's responsibility: leading dim must divide the mesh size)."""
    return jax.device_put(arr, batch_sharding(mesh, axis_name))


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    if jax.process_count() > 1:
        # process-local jax.Arrays can't be re-placed onto a mesh spanning
        # non-addressable devices; host (numpy) values can — every process
        # holds identical values by the replication contract
        return jax.tree.map(
            lambda x: jax.device_put(np.asarray(x), sh), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def data_parallel_train_step(graph, optimizer, loss_fn, head_w, mesh,
                             axis_name: str = "data", fsdp: bool = False,
                             amp: bool = False):
    """Build a jitted data-parallel train step.

    The step body is identical to the single-chip one (train/trainer.py);
    sharding constraints on (x, y) put the batch across the mesh and XLA
    derives the psum for gradients.  With ``fsdp=True`` the parameters and
    optimizer state are constrained to :func:`fsdp_shardings` instead of
    replicated — same math, ZeRO memory/collective schedule.  ``amp=True``
    runs the forward/backward activations at bf16 (f32 master state), same
    contract as Trainer(amp=True).

    Hybrid (dcn, data) meshes (make_hybrid_mesh): the batch shards over
    BOTH axes; fsdp shardings stay on the ICI ``data`` axis so ZeRO
    all-gathers never cross DCN (the gradient all-reduce is the only
    cross-slice collective — SURVEY.md §2.2's ICI/DCN plan).
    """
    import jax.numpy as jnp

    from .. import nnir
    from ..train.losses import multi_output_loss

    xsh = NamedSharding(mesh, P(batch_axes(mesh, axis_name)))
    rsh = replicated(mesh)
    compute_dtype = jnp.bfloat16 if amp else None

    def loss_and_state(params, state, x, y, rng):
        out, new_state = nnir.apply(graph, {"params": params, "state": state},
                                    x, train=True, rng=rng,
                                    compute_dtype=compute_dtype)
        out_ncdhw = jnp.moveaxis(out, -1, 2)
        total, arr = multi_output_loss(loss_fn, head_w, out_ncdhw, y)
        return total, (new_state, arr)

    @jax.jit
    def step(params, state, opt_state, x, y, rng):
        x = jax.lax.with_sharding_constraint(x, xsh)
        y = jax.lax.with_sharding_constraint(y, xsh)
        if fsdp:
            params = jax.lax.with_sharding_constraint(
                params, fsdp_shardings(mesh, params, axis_name))
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, fsdp_shardings(mesh, opt_state, axis_name))
        else:
            params = jax.lax.with_sharding_constraint(
                params, jax.tree.map(lambda _: rsh, params))
        (loss, (new_state, arr)), grads = jax.value_and_grad(
            loss_and_state, has_aux=True)(params, state, x, y, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        if fsdp:
            params = jax.lax.with_sharding_constraint(
                params, fsdp_shardings(mesh, params, axis_name))
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, fsdp_shardings(mesh, opt_state, axis_name))
        return params, {**state, **new_state}, opt_state, loss, arr

    return step


def fsdp_shardings(mesh: Mesh, tree, axis_name: str = "data"):
    """ZeRO/FSDP-style shardings for training state over the data axis.

    Each leaf shards ONE axis across the mesh when divisible — conv kernels
    (DHWIO) their output-channel axis, everything else its leading axis —
    and replicates otherwise (scalars, indivisible widths).  Apply the same
    function to the parameter tree and to the optimizer state: Adam moments
    mirror the parameter shapes leaf-for-leaf, so they pick up the same
    specs and the per-device optimizer memory drops ~Nx.

    No collectives are written by hand: constraining the parameters to
    these shardings inside the jitted step makes GSPMD all-gather each
    weight where the forward consumes it and reduce-scatter the matching
    gradient — the ZeRO-3 schedule, derived by the partitioner.  (The
    reference is single-GPU with fully replicated optimizer state,
    SURVEY.md §2.2; this is a new TPU-native capability.)
    """
    n = mesh.shape[axis_name]

    def spec_for(arr):
        shape = getattr(arr, "shape", ())
        if len(shape) == 5 and shape[4] % n == 0:  # conv kernel: shard O
            return NamedSharding(mesh, P(None, None, None, None, axis_name))
        if len(shape) >= 1 and shape[0] >= n and shape[0] % n == 0:
            return NamedSharding(mesh, P(axis_name))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, tree)


def make_mesh_2d(n_data: int, n_model: int,
                 axes: Sequence[str] = ("data", "model")) -> Mesh:
    devs = jax.devices()[: n_data * n_model]
    return Mesh(np.array(devs).reshape(n_data, n_model), tuple(axes))


def tensor_parallel_shardings(mesh: Mesh, params, axis_name: str = "model"):
    """Channel-axis (tensor-parallel) shardings for the parameter tree:
    conv kernels (DHWIO) and per-channel vectors shard their output-channel
    axis; scalars replicate.  XLA GSPMD propagates the activation shardings
    and inserts the all-reduces where a sharded feature axis is contracted
    (SURVEY.md §2.2 TP row — optional for these model sizes)."""
    n = mesh.shape[axis_name]

    def spec_for(arr):
        if arr.ndim == 5 and arr.shape[4] % n == 0:  # conv kernel: shard O
            return NamedSharding(mesh, P(None, None, None, None, axis_name))
        if arr.ndim == 1 and arr.shape[0] % n == 0:  # bias / bn vectors
            return NamedSharding(mesh, P(axis_name))
        return NamedSharding(mesh, P())  # indivisible layers replicate

    return jax.tree.map(spec_for, params)


def tensor_parallel_apply(graph, mesh, variables, x, axis_name: str = "model",
                          mode: str = "fp", precision=None):
    """Run one forward with parameters channel-sharded across the mesh's
    model axis (activations resharded by GSPMD as needed)."""
    from .. import nnir

    n = mesh.shape[axis_name]
    p_sh = tensor_parallel_shardings(mesh, variables["params"], axis_name)
    params = jax.tree.map(jax.device_put, variables["params"], p_sh)
    state = jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(
            mesh, P(axis_name) if a.ndim == 1 and a.shape[0] % n == 0
            else P())),
        variables.get("state", {}))
    x = jax.device_put(x, NamedSharding(mesh, P()))

    @jax.jit
    def fwd(params, state, x):
        return nnir.apply(graph, {"params": params, "state": state}, x,
                          mode=mode, precision=precision)

    return fwd(params, state, x)


def make_sharded_volume_inferencer(graph, mesh, mode: str = "fp",
                                   axis_name: str = "data", precision=None,
                                   hard_pred: bool = False,
                                   multilabel: bool = False,
                                   compute_dtype=None):
    """Compile-once sharded analogue of
    eval.sliding.make_jitted_volume_inferencer (the reference's long-axis
    analogue, SURVEY.md §2.2): patch extraction, the mesh-sharded forward,
    the on-device stitch, and optionally the hard prediction are ONE jitted
    program per (volume shape, patch size) signature.

    Two pitfalls of a naive per-volume implementation are avoided: a fresh
    ``@jax.jit`` per volume retraces/recompiles every call, and a host-side
    stitch round-trips the full f32 multi-head patch logits (larger than
    the volume, due to overlap) through the host instead of transferring
    uint8 hard predictions.  Variables are replicated onto the mesh once
    and cached by identity.
    """
    import jax.numpy as jnp

    from .. import nnir, ops
    from ..eval.sliding import extract_patches, patch_grid, stitch_patches

    xsh = batch_sharding(mesh, axis_name)
    n_dev = mesh.devices.size

    @partial(jax.jit, static_argnames=("patch_size", "overlap"))
    def run(variables, image, patch_size, overlap):
        vol_shape = image.shape[1:4]
        starts = patch_grid(vol_shape, patch_size, overlap)
        patches = extract_patches(image, starts, patch_size)  # (P, N, ...)
        Pn, N = patches.shape[0], patches.shape[1]
        flat = patches.reshape(Pn * N, *patches.shape[2:])
        pad = (-flat.shape[0]) % n_dev
        if pad:
            flat = jnp.concatenate([flat, jnp.repeat(flat[:1], pad, axis=0)])
        flat = jax.lax.with_sharding_constraint(flat, xsh)
        out = nnir.apply(graph, variables, flat, mode=mode,
                         precision=precision, compute_dtype=compute_dtype,
                         keep_head_dtype=bool(hard_pred and compute_dtype
                                              is not None)
                         )  # (M, P*N+pad, pd, ph, pw, C)
        out = out[:, :Pn * N]
        M = out.shape[0]
        out = out.reshape(M, Pn, N, *out.shape[2:])
        out = jnp.moveaxis(out, 1, 0)  # patch axis first
        # hard predictions are invariant to the overlap-average division
        # (sliding.py), so skip the normalize pass when only they are kept
        stitched = stitch_patches(out, starts, vol_shape,
                                  normalize=not hard_pred)
        if hard_pred:
            if multilabel:
                return (stitched >= 0).astype(jnp.uint8)
            return jnp.argmax(stitched, axis=-1).astype(jnp.uint8)
        return stitched

    cache = {"vars": None, "repl": None}

    def infer(variables, image, patch_size, overlap):
        if cache["vars"] is not variables:
            cache["vars"] = variables
            cache["repl"] = replicate(mesh, variables)
        if jax.process_count() > 1:
            # multi-process: a plain jnp.asarray is process-local and the
            # jitted mesh constraint would reject it — place the volume
            # replicated on the global mesh (callers pass identical host
            # volumes on every process, the eval-loop contract)
            image = jax.device_put(np.asarray(image), replicated(mesh))
        else:
            image = jnp.asarray(image)
        return run(cache["repl"], image, tuple(ops.triple(patch_size)),
                   tuple(ops.triple(overlap)))

    return infer


def shard_patch_inference(graph, mesh, variables, image, patch_size, overlap,
                          mode: str = "fp", axis_name: str = "data",
                          precision=None):
    """One-shot wrapper around :func:`make_sharded_volume_inferencer` —
    builds (and compiles) the inferencer per call; loops over many volumes
    should hold the maker's result instead."""
    infer = make_sharded_volume_inferencer(graph, mesh, mode=mode,
                                           axis_name=axis_name,
                                           precision=precision)
    return infer(variables, image, patch_size, overlap)
