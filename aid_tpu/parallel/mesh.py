"""Multi-chip sharding: frame-axis data parallelism + tensor parallelism.

The reference is single-device (SURVEY.md §2.6: no torch.distributed
anywhere). The TPU-native scaling design (SURVEY.md §5.8):

  * ``data`` mesh axis: the frame/batch dimension. Each frame's denoise is
    independent given the endpoint K/V; endpoint rows (0 and N-1) are
    gathered across frame shards each attention call — XLA GSPMD inserts
    the (tiny: 2 x L x D per layer) collectives from the batch-dim
    sharding of ``k[0]`` / ``k[-1]`` in aid_tpu.ops.attention.
  * ``model`` mesh axis: tensor parallelism over attention/MLP hidden units
    (megatron-style column/row splits of to_q/k/v + to_out and ff layers).

Sharding is expressed with jax.sharding.NamedSharding on the inputs; the
jitted engine programs are partitioned by GSPMD. Works identically on a
virtual CPU mesh (tests / driver dry run) and real ICI-connected chips.

GSPMD + Pallas: pallas_call is opaque to the partitioner, so on this path
construct the models with ``attention_backend="xla"`` AND
``conv_backend="xla"`` (UNet2DCondition / AutoencoderKL fields) — both
keep the measured pure-XLA lowerings but never emit a pallas_call. The
shard_map path runs per-device programs and uses the Pallas kernels
freely.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def _shard_map(fn, *, mesh, in_specs, out_specs):
    """shard_map with replication checking off, across jax versions: the
    stable ``jax.shard_map`` (jax >= 0.8; check_vma) with a fallback to the
    pre-0.8 experimental import (check_rep)."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    from jax.experimental.shard_map import shard_map as _sm  # jax < 0.8

    return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
               check_rep=False)


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    """Create a (data, model) mesh. Default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    assert dp * tp <= len(devices), f"need {dp * tp} devices, have {len(devices)}"
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(dp_dcn: int, dp_ici: Optional[int] = None, tp: int = 1) -> Mesh:
    """Multi-slice mesh: frames data-parallel over DCN x ICI, TP inside a slice.

    Axes ("dcn", "data", "model"): the outer frame axis crosses slices over
    DCN (each slice denoises its own frame shard; the per-layer endpoint
    gather is the only cross-slice traffic), the inner frame axis and TP
    ride ICI. Uses mesh_utils.create_hybrid_device_mesh when running
    multi-host; degenerates to a reshaped local mesh otherwise (CI/tests).
    """
    devices = jax.devices()
    if dp_ici is None:
        dp_ici = len(devices) // (dp_dcn * tp)
    try:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (dp_ici, tp), dcn_mesh_shape=(dp_dcn, 1),
        ).reshape(dp_dcn, dp_ici, tp)
    except Exception:
        arr = np.asarray(devices[: dp_dcn * dp_ici * tp]).reshape(dp_dcn, dp_ici, tp)
    return Mesh(arr, ("dcn", DATA_AXIS, MODEL_AXIS))


def frame_axes(mesh: Mesh):
    """Mesh axes the frame dimension shards over: ("dcn", "data") on a
    multislice mesh (outer frame shards cross slices over DCN; the per-layer
    endpoint gather is the only cross-slice traffic), else just "data"."""
    return ("dcn", DATA_AXIS) if "dcn" in mesh.axis_names else DATA_AXIS


def frame_shard_count(mesh: Mesh) -> int:
    ax = frame_axes(mesh)
    return int(np.prod([mesh.shape[a] for a in ax])) if isinstance(ax, tuple) else mesh.shape[ax]


def frame_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (frame) axis over the data (and dcn) axes,
    replicate the rest."""
    return NamedSharding(mesh, P(frame_axes(mesh), *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple, leaf) -> P:
    """Megatron-style TP layout for the UNet attention/MLP projections.

    Column-parallel (shard output features): to_q/to_k/to_v/to_k_ip/to_v_ip
    and the GEGLU up-projection. Row-parallel (shard input features):
    to_out_0 and the FF down-projection — XLA inserts the psum.
    Everything else (convs, norms, time embeddings) is replicated; convs are
    batch-parallel over frames already.
    """
    names = [str(p) for p in path]
    joined = "/".join(names)
    if not names or names[-1] not in ("kernel",):
        return P()
    if any(n in joined for n in ("to_q", "to_k", "to_v", "to_k_ip", "to_v_ip", "net_0_proj")):
        return P(None, MODEL_AXIS)
    if any(n in joined for n in ("to_out_0", "net_2")):
        return P(MODEL_AXIS, None)
    return P()


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh with the TP layout above."""
    def place(path, leaf):
        spec = _param_spec(tuple(k.key for k in path), leaf)
        # guard: axis size must divide the sharded dim
        tp = mesh.shape[MODEL_AXIS]
        for axis_i, axis_name in enumerate(spec):
            if axis_name == MODEL_AXIS and leaf.shape[axis_i] % tp != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def sharded_denoise_sequence(
    mesh: Mesh,
    unet,
    scheduler,
    params,
    latents,
    embs,
    uncond_embs,
    coef,
    sched_state,
    guidance_scale,
    *,
    early,
    late,
    num_steps: int,
    warmup_steps: int,
    **kwargs,
):
    """Run the full denoise loop under shard_map with frames sharded.

    The explicit-SPMD twin of engine.denoise_sequence: each shard owns a
    contiguous slice of frames; every attention layer fetches the global
    endpoint K/V (frames 0 and N-1) with a 2-row all_gather over ICI
    (models.layers.CrossAttention frame_axis mode). This path supports the
    Pallas flash kernel multi-chip — GSPMD cannot partition pallas_call,
    but inside shard_map the kernel runs per shard on local frames.

    Params are replicated; latents/embs/coef are sharded on the frame axis
    (frame count must divide the data-axis size).
    """
    import functools

    from aid_tpu.pipelines import engine

    f_axes = frame_axes(mesh)
    unet_sh = unet.clone(frame_axis=f_axes)
    dp = frame_shard_count(mesh)
    assert latents.shape[0] % dp == 0, "frames must divide the frame shards"

    # Per-frame optional inputs (IP tokens, SDXL added-cond dicts) must ride
    # the frame sharding through in_specs — a closure capture would stay
    # full-batch and mismatch the sharded latents inside the UNet.
    frame_kw_names = [
        k for k in ("ip_embeds", "ip_uncond_embeds", "added_cond", "added_cond_uncond")
        if kwargs.get(k) is not None
    ]
    frame_kw = {k: kwargs.pop(k) for k in frame_kw_names}

    fn_inner = functools.partial(
        engine.denoise_sequence,
        unet_sh,
        scheduler,
        early=early,
        late=late,
        num_steps=num_steps,
        warmup_steps=warmup_steps,
        **kwargs,
    )

    def fn(params, latents, embs, uncond_embs, coef, sched_state, guidance_scale, frame_kw):
        return fn_inner(params, latents, embs, uncond_embs, coef, sched_state,
                        guidance_scale, **frame_kw)

    frame_spec = lambda x: P(f_axes, *([None] * (x.ndim - 1)))
    # scheduler-state leaves that are latent-shaped (multistep history
    # buffers) shard with the frames; small 1-D schedule arrays replicate
    state_specs = jax.tree_util.tree_map(
        lambda x: frame_spec(x) if getattr(x, "ndim", 0) >= 4 else P(), sched_state
    )
    in_specs = (
        jax.tree_util.tree_map(lambda _: P(), params),
        frame_spec(latents),
        frame_spec(embs),
        frame_spec(uncond_embs),
        P(f_axes),
        state_specs,
        P(),
        jax.tree_util.tree_map(frame_spec, frame_kw),
    )
    out_specs = frame_spec(latents)

    return _shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
    )(params, latents, embs, uncond_embs, coef, sched_state, guidance_scale, frame_kw)


def shard_frames(tree, mesh: Mesh):
    """Place activation arrays with the frame axis sharded over data (and
    dcn on a multislice mesh)."""
    def place(leaf):
        dp = frame_shard_count(mesh)
        if leaf.ndim >= 1 and leaf.shape[0] % dp == 0:
            return jax.device_put(leaf, frame_sharding(mesh, leaf.ndim))
        return jax.device_put(leaf, replicated(mesh))

    return jax.tree_util.tree_map(place, tree)
