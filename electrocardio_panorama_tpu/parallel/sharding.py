"""Sharded execution: shard_map data-parallel training and view-sharded
panorama rendering.

Training (dp): params/opt-state replicated, batch sharded on the `data` axis.
Each shard computes its local loss/grads; gradients and loss pmean over the
axis (the explicit-collective replacement for DataParallel's implicit gradient
reduction); decoder BatchNorm batch-statistics psum-sync via the model's
`bn_axis` hook so sharded training normalizes with full-batch statistics.

Panorama (sp over views): the dense viewpoint sweep shards on the `view` axis —
every device decodes a slice of the viewpoints from the (replicated) latent;
outputs concatenate along the view axis. No collectives in the math: views are
independent after encoding (SURVEY.md section 5, long-context equivalent).

Lead tensor parallelism (tp): every per-lead-grouped weight (the encoder
tower, w_conv, z1_conv, z2_conv1, z2_conv2 — all lead-major on axis 0 by
construction, models/blocks.py) shards across the `lead` axis together with
the input's lead dimension; each device encodes only its lead slice and the
lead-mean of z1/z2 (model_nefnet.py:146-151) becomes the single psum of the
whole encode. The decoder/MLP weights replicate (they are lead-independent).
This is the SURVEY section 2.3 "shard the lead/group axis" equivalence — the
grouped convs are embarrassingly parallel across leads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from electrocardio_panorama_tpu.models.losses import loss_wrapper
from electrocardio_panorama_tpu.training.precision import cast_floats, cast_floats_f32


def build_dp_train_step(model_def, cfg, tx, mesh: Mesh, axis: str = "data",
                        *, deterministic: bool = False):
    """Jitted shard_map train step. Batch arrays must be sharded on `axis`
    (leading dim divisible by the axis size); params/opt replicated. Loss
    components come from loss_wrapper (already loss_factor-scaled) so dp and
    single-device runs log identical quantities.

    With ``deterministic=True`` dropout is disabled (rng ignored), which makes
    the step bit-compatible with the single-device Solver step on the same
    full batch — the full-batch psum-synced BN plus pmean'd grads reproduce
    the single-device update exactly (pinned by tests/test_sharding.py).

    Honors ``cfg.TPU.compute_dtype='bfloat16'`` with the same mixed-precision
    policy as Solver._build_train_step: f32 master params/opt/BN running
    stats, bf16 forward/backward, f32 loss and f32 grad pmean.

    Honors ``cfg.TPU.train_decoder='fused'`` (the Pallas training decoder,
    ops/pallas/decoder_train.py) with one documented semantic difference: the
    kernel computes BN batch statistics per shard (the reference
    DataParallel's actual behavior — each replica normalizes its own
    sub-batch) instead of the XLA path's psum-synced full-batch statistics,
    so dp-fused matches single-device-fused only at mesh size 1.
    """
    use_noise = bool(cfg.DATA.noise)
    compute_dtype = jnp.dtype(cfg.TPU.compute_dtype)
    mixed = compute_dtype != jnp.float32
    _cast = lambda t: cast_floats(t, compute_dtype)  # noqa: E731
    if getattr(cfg.TPU, "train_decoder", "xla") == "fused":
        from electrocardio_panorama_tpu.ops.pallas.decoder_train import (
            make_train_decode_fn)

        tdf = make_train_decode_fn(
            compute_dtype=compute_dtype,
            interpret=jax.devices()[0].platform == "cpu",
        )
    else:
        tdf = None
    if getattr(cfg.TPU, "train_encoder", "xla") == "fused":
        if cfg.MODEL.model != "model_nefnet":
            raise ValueError(
                "TPU.train_encoder='fused' supports model_nefnet only "
                "(the fused encoder mirrors its per-lead tower/z-block)"
            )
        from electrocardio_panorama_tpu.ops.pallas.encoder_fused import (
            make_fused_encode_fn)

        # per-shard kernel: each device encodes its local batch slice
        # (hardware needs local batch % 8; interpret shrinks the tile)
        enc_fn = make_fused_encode_fn(
            cfg.DATA.lead_num, cfg.MODEL.theta_L,
            interpret=jax.devices()[0].platform == "cpu",
            tower_ckpt=getattr(cfg.TPU, "encoder_ckpt", "tower"),
        )
    else:
        enc_fn = None

    def local_step(params, bn_state, opt_state, rng, i1, i2,
                   data, input_theta, target_theta, rois, target_view, noise):
        # decorrelate dropout across shards
        rng = None if deterministic else jax.random.fold_in(
            rng, jax.lax.axis_index(axis)
        )

        def loss_fn(p):
            if mixed:
                p, d, it, tt = _cast((p, data, input_theta, target_theta))
            else:
                d, it, tt = data, input_theta, target_theta
            kw = {"encode_fn": enc_fn} if enc_fn is not None else {}
            (out, sp, sl), new_bn = model_def.apply(
                p, bn_state, d, it, tt, rois,
                phase="train", rng=rng, shuffle_idx=(i1, i2), bn_axis=axis,
                train_decode_fn=tdf, **kw,
            )
            if mixed:
                out, sp, sl = cast_floats_f32((out, sp, sl))
                new_bn = cast_floats_f32(new_bn)
            if use_noise:
                out = out + noise[:, None, :]
            loss, lo1, lo2, lo3 = loss_wrapper(out, sp, sl, target_view[:, None, :], cfg)
            return loss, (lo1, lo2, lo3, new_bn)

        (loss, (lo1, lo2, lo3, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        grads = jax.lax.pmean(grads, axis)
        loss_vec = jax.lax.pmean(
            jnp.stack([loss, jnp.asarray(lo1), jnp.asarray(lo2), jnp.asarray(lo3)]), axis
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # bn running stats already psum-synced inside batch_norm1d (bn_axis)
        return params, new_bn, new_opt, loss_vec

    rep = P()
    sh = P(axis)
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep, sh, sh, sh, sh, sh, sh),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0, 1, 2))


def build_sharded_panorama(model_def, mesh: Mesh, *, data_axis: str = "data",
                           view_axis: str = "view", use_fused: bool = False,
                           compute_dtype=jnp.float32, v_tile: int = 16,
                           interpret: bool = False):
    """Encode on the data axis, decode with views sharded on the view axis.

    Returns render(params, bn_state, data, input_theta, rois, views) -> [B, V, 512]
    where `views` is [V, 2] broadcast to the batch; B divides the data-axis
    size and V divides the view-axis size.

    ``use_fused=True`` decodes each (batch-shard x view-shard) slice with the
    fused Pallas decoder (ops/pallas/decoder_fused.py) — the flagship
    single-chip pipeline running per device under shard_map, so the ~650k
    views/s/chip bf16 path scales across the mesh with no collectives in the
    decode. ``compute_dtype=jnp.bfloat16`` selects the throughput pipeline;
    BN folding happens in-jit from the replicated params (negligible next to
    the decode). ``interpret=True`` runs the kernel in interpret mode for
    CPU-mesh tests.
    """

    if use_fused:
        from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (
            fold_decoder_bn,
            fused_decode_views,
        )
        from electrocardio_panorama_tpu.ops.theta import angular_encode

        def local_render(params, bn_state, data, input_theta, rois, views):
            latent = model_def.encode(params, data, input_theta, rois).latent_all
            folded = fold_decoder_bn(params, bn_state, dtype=compute_dtype)
            v = jnp.broadcast_to(views[None], (latent.shape[0], *views.shape))
            # basis decode: angular encodings in, rank-J mix inside
            enc = angular_encode(v, model_def.theta_encoder_len)
            return fused_decode_views(
                folded, latent.astype(compute_dtype), enc=enc,
                v_tile=v_tile, interpret=interpret,
            )
    else:
        def local_render(params, bn_state, data, input_theta, rois, views):
            latent = model_def.encode(params, data, input_theta, rois).latent_all
            # every view shard decodes its slice from the local batch shard
            v = jnp.broadcast_to(views[None], (latent.shape[0], *views.shape))
            return model_def.decode_views(params, bn_state, latent, v)

    rep = P()
    render = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(rep, rep, P(data_axis), P(data_axis), P(data_axis), P(view_axis)),
        out_specs=P(data_axis, view_axis),
        check_vma=False,
    )
    return jax.jit(render)


# Param-name prefixes whose leaves are per-lead-grouped, lead-major on axis 0
# (models/nefnet.py::init_nefnet + models/blocks.py): out-channel blocks of
# 128 (z-convs / encoder) or 128*7 (z2_conv2's segment-folded groups) per lead.
_LEAD_PREFIXES = ("W_encoder.", "w_conv.", "z1_conv.", "z2_conv1.", "z2_conv2.")


def lead_param_specs(params, lead_num: int, lead_axis: str = "lead"):
    """PartitionSpec tree for lead tensor parallelism: per-lead-grouped leaves
    shard axis 0 on `lead_axis`; everything else (decoder, mlp gates, the dead
    w_feature_extractor) replicates."""
    def spec(name, v):
        if name.startswith(_LEAD_PREFIXES):
            assert v.shape[0] % lead_num == 0, (name, v.shape, lead_num)
            return P(lead_axis)
        return P()

    return {k: spec(k, v) for k, v in params.items()}


def opt_state_specs(tx, params, p_specs):
    """PartitionSpec tree for an optax state matching per-param shardings.

    Any state leaf that mirrors a param (same dict key on its tree path and
    same shape — e.g. SGD momentum / Adam moments) inherits that param's
    spec; scalars and hyperparams replicate."""
    from jax.tree_util import DictKey, tree_map_with_path

    shapes = {k: v.shape for k, v in params.items()}
    opt_shapes = jax.eval_shape(tx.init, params)

    def leaf_spec(path, leaf):
        for k in reversed(path):
            if isinstance(k, DictKey) and k.key in p_specs:
                if getattr(leaf, "shape", None) == shapes[k.key]:
                    return p_specs[k.key]
                break
        return P()

    return tree_map_with_path(leaf_spec, opt_shapes)


def build_3d_train_step(model_def, cfg, tx, mesh: Mesh, *,
                        data_axis: str = "data", lead_axis: str = "lead",
                        view_axis: str = "view", deterministic: bool = False):
    """One shard_map training step over a 3-D (data x lead x view) mesh —
    every parallelism axis of the framework composed in a single program.

    Axis roles and their collectives:
      * data + view: the batch shards jointly over BOTH axes
        (``P((data, view))`` on the leading dim) — views of one beat are
        independent training samples after encoding, so the view axis doubles
        as extra batch parallelism in training. Grad/loss pmean and BN
        batch-stat psum run over ``(data, view)``.
      * lead: encoder tensor parallelism — every per-lead-grouped weight
        (`lead_param_specs`) AND its activations shard over the lead axis;
        each device encodes only its lead slice (exactly the L_local-lead
        model, since all encoder ops are lead-grouped) and the reference's
        lead-mean (model_nefnet.py:146-151) is one psum. The per-lead z1/z2
        picked by the Standin shuffles (model_nefnet.py:154-165) come from
        their owning shard by a masked psum. `mlp1` grads are lead-partial
        (each shard only sees its leads' thetas) and psum over the lead axis;
        decoder/mlp2 compute is replicated across lead, so their grads are
        lead-identical and need no lead collective.

    Optimizer state shards like the params (`opt_state_specs`), so encoder
    momentum lives only on the owning lead shard — the optimizer update is
    elementwise and runs fully sharded.

    Honors ``cfg.TPU.compute_dtype='bfloat16'`` with the same mixed-precision
    policy as build_dp_train_step / Solver._build_train_step: f32 master
    params/opt/BN running stats, bf16 encode/decode forward+backward (the
    lead-axis latent psums and the (data, view) BN batch-stat psums ride ICI
    in bf16), f32 loss, grad corrections, and f32 grad pmean. With
    ``deterministic=True`` dropout is off and the step is numerically
    parity-checkable against the unsharded train step on the same batch
    (tests/test_sharding.py).

    Batch arrays must have leading dim divisible by |data|*|view| and lead
    dims divisible by |lead|. Returns a jitted
    step(params, bn_state, opt_state, rng, i1, i2, data, input_theta,
    target_theta, rois, target_view, noise) -> (params, bn_state, opt_state,
    losses[4]) with params/opt sharded per their specs.
    """
    from electrocardio_panorama_tpu.models.nefnet import (
        decoder_apply, encode_latents, query_gates)

    compute_dtype = jnp.dtype(cfg.TPU.compute_dtype)
    mixed = compute_dtype != jnp.float32
    _cast = lambda t: cast_floats(t, compute_dtype)  # noqa: E731
    L = model_def.lead_num
    n_lead = mesh.shape[lead_axis]
    if L % n_lead != 0:
        raise ValueError(f"lead_num={L} not divisible by |{lead_axis}|={n_lead}")
    L_local = L // n_lead
    batch_axes = (data_axis, view_axis)
    use_noise = bool(cfg.DATA.noise)
    tlen = model_def.theta_encoder_len

    p_shapes, _ = jax.eval_shape(model_def.init, jax.random.PRNGKey(0))
    p_specs = lead_param_specs(p_shapes, L, lead_axis)
    o_specs = opt_state_specs(tx, p_shapes, p_specs)

    def pick_lead(z_leads, idx):
        """z_leads [b, L_local, 128, 128] (this shard's leads), idx global
        lead int -> [b, 128, 128] from the owning shard (masked psum)."""
        lo = jax.lax.axis_index(lead_axis) * L_local
        own = (idx >= lo) & (idx < lo + L_local)
        local = jnp.take(z_leads, jnp.clip(idx - lo, 0, L_local - 1), axis=1)
        return jax.lax.psum(local * own.astype(local.dtype), lead_axis)

    def local_step(params, bn_state, opt_state, rng, i1, i2,
                   data, input_theta, target_theta, rois, target_view, noise):
        if deterministic:
            rng = None
        else:
            shard = (
                jax.lax.axis_index(data_axis) * mesh.shape[view_axis]
                + jax.lax.axis_index(view_axis)
            ) * n_lead + jax.lax.axis_index(lead_axis)
            rng = jax.random.fold_in(rng, shard)

        def loss_fn(p):
            B = data.shape[0]
            if mixed:
                p, d, ith, tth = _cast((p, data, input_theta, target_theta))
            else:
                d, ith, tth = data, input_theta, target_theta
            lat = encode_latents(
                p, d, ith, rois, lead_num=L_local,
                theta_encoder_len=tlen, rng=rng, train=True,
            )
            z1_mean = jax.lax.psum(lat.z1_mean * (L_local / L), lead_axis)
            z2_mean = jax.lax.psum(lat.z2_mean * (L_local / L), lead_axis)
            latent_all = jnp.concatenate([z1_mean, z2_mean], axis=1)
            shuffle_z1 = pick_lead(lat.z1.reshape(B, L_local, 128, 128), i1)
            shuffle_z2 = pick_lead(lat.z2.reshape(B, L_local, 128, 128), i2)
            shuffle_patient_all = jnp.concatenate([shuffle_z1, z2_mean], axis=1)
            shuffle_lead_all = jnp.concatenate([z1_mean, shuffle_z2], axis=1)

            gate_q = query_gates(p, tth, theta_encoder_len=tlen)
            gx = gate_q[:, :, None]
            stacked = jnp.concatenate(
                [gx * latent_all, gx * shuffle_patient_all, gx * shuffle_lead_all],
                axis=0,
            )  # [3B, 256, 128] group-major (nefnet_apply train branch)
            o, u = decoder_apply(
                p, bn_state, stacked, train=True, bn_axis=batch_axes, bn_groups=3,
            )
            if mixed:
                o = o.astype(jnp.float32)
                u = cast_floats_f32(u)
            outs = jax.nn.sigmoid(o / 3.0).reshape(3, B, 1, 512)
            out = outs[0] + (noise[:, None, :] if use_noise else 0.0)
            new_bn = dict(bn_state)
            new_bn.update(u)
            loss, lo1, lo2, lo3 = loss_wrapper(
                out, outs[1], outs[2], target_view[:, None, :], cfg
            )
            return loss, (lo1, lo2, lo3, new_bn)

        (loss, (lo1, lo2, lo3, new_bn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        # The loss is REPLICATED over the lead axis (each lead shard computes
        # the identical scalar after the latent psums), so per-shard autodiff
        # effectively differentiates sum_over_lead(loss) = n_lead * loss:
        # every grad that flowed through a lead psum is n_lead x too large.
        #   * lead-sharded encoder params: enter all n_lead replicated losses
        #     through the latent/shuffle psums -> divide by n_lead;
        #   * mlp1 (replicated param, consumed on each shard's own lead
        #     thetas): per-shard grad is n_lead x its lead-partial -> pmean
        #     over lead recovers the true sum of partials;
        #   * decoder/mlp2 (replicated, replicated compute): each shard's
        #     copy enters only its own loss copy -> grads already correct
        #     and lead-identical, no collective.
        # Everything then pmean's over the joint batch axes.
        inv_lead = 1.0 / n_lead
        grads = {
            k: (jax.lax.pmean(g, lead_axis) if k.startswith("mlp1.")
                else g * inv_lead if p_specs[k] != P() else g)
            for k, g in grads.items()
        }
        grads = jax.lax.pmean(grads, batch_axes)
        loss_vec = jax.lax.pmean(
            jnp.stack([loss, jnp.asarray(lo1), jnp.asarray(lo2), jnp.asarray(lo3)]),
            batch_axes,
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bn, new_opt, loss_vec

    rep = P()
    bsh = P(batch_axes)
    lead_in = P(batch_axes, lead_axis)
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(p_specs, rep, o_specs, rep, rep, rep,
                  lead_in, lead_in, bsh, bsh, bsh, bsh),
        out_specs=(p_specs, rep, o_specs, rep),
        check_vma=False,
    )
    return jax.jit(step)


def build_lead_parallel_panorama(model_def, mesh: Mesh, *, lead_axis: str = "lead",
                                 view_axis: str | None = None):
    """Tensor-parallel panorama: encoder weights AND activations sharded over
    the lead axis, one psum to form the latent, then a (optionally
    view-sharded) batched decode.

    Each device holds L/n leads' encoder/z-conv weights (`lead_param_specs`)
    and the matching slice of `data`/`input_theta` [B, L, ...]; it runs the
    full encode on its slice (every op is grouped per lead, so the math is
    exactly the L_local-lead model), and the reference's mean over leads
    (model_nefnet.py:146-151) is recovered as psum(local_sum)/L — the only
    collective in the pipeline. The decode then sees the replicated [B, 256,
    128] latent, so it can ride the same view sharding as
    build_sharded_panorama.

    Returns render(params, bn_state, data, input_theta, rois, views) ->
    [B, V, 512]. jit reshards inputs to the in_specs automatically;
    device_put-ing params with `lead_param_specs` shardings up front avoids
    the per-call transfer. The model is small enough to replicate — this path exists for the mesh
    dimension itself: on a (lead, view) 2-D mesh a 12-lead panorama uses all
    devices even at batch 1, where a data axis would idle.
    """
    from electrocardio_panorama_tpu.models.nefnet import encode_latents

    L = model_def.lead_num
    n_lead = mesh.shape[lead_axis]
    if L % n_lead != 0:
        raise ValueError(f"lead_num={L} not divisible by |{lead_axis}|={n_lead}")
    L_local = L // n_lead

    # param spec tree from the abstract init (no compute): grouped leaves
    # shard on the lead axis, the rest replicate
    p_shapes, _ = jax.eval_shape(model_def.init, jax.random.PRNGKey(0))
    p_specs = lead_param_specs(p_shapes, L, lead_axis)

    def local_render(params, bn_state, data, input_theta, rois, views):
        lat = encode_latents(
            params, data, input_theta, rois,
            lead_num=L_local, theta_encoder_len=model_def.theta_encoder_len,
        )
        # lead-mean over ALL L leads = psum of the local-lead partial means
        z1_mean = jax.lax.psum(lat.z1_mean * (L_local / L), lead_axis)
        z2_mean = jax.lax.psum(lat.z2_mean * (L_local / L), lead_axis)
        latent_all = jnp.concatenate([z1_mean, z2_mean], axis=1)
        v = jnp.broadcast_to(views[None], (latent_all.shape[0], *views.shape))
        return model_def.decode_views(params, bn_state, latent_all, v)

    lead_sh = P(None, lead_axis)
    view_sh = P(view_axis) if view_axis is not None else P()
    render = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(p_specs, P(), lead_sh, lead_sh, P(), view_sh),
        out_specs=P(None, view_axis) if view_axis is not None else P(),
        check_vma=False,
    )
    return jax.jit(render)
