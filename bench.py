"""Flagship benchmark: panorama view synthesis throughput on one chip.

Workload (north-star, BASELINE.md): few-view encode ONCE per heartbeat batch,
then decode dense viewpoint sweeps — views/sec/chip end-to-end on device.

Measurement notes:
  * The axon tunnel's block_until_ready does not wait for remote execution, so
    timing forces a true data dependency (a scalar pulled to host).
  * EVERY path chains launches per timing sample (lax.scan over view stacks)
    AND the measured tunnel round-trip (~25 ms, reported as tunnel_rtt_ms) is
    subtracted from each chained median: per-launch = (median - RTT) / K.
    K is sized so the subtraction is a small correction, not the dominant
    term (decode K=32 -> RTT is ~7% of the sample; train/p50 K=256; encode
    K=64; dense sweep K=16). History: r02 train metrics chained K=8 and
    carried ~3 ms of RTT per step (reported 6.0 ms, real ~3.0); r03's
    initial decode numbers chained K=8 without subtraction and carried
    ~3.2 ms per launch (reported 14.0 ms, real ~10.3). The subtraction was
    cross-checked against K-doubling (which leaves the corrected per-launch
    number invariant) and against nested-pipeline row differences, which
    cancel RTT exactly. Per-path std is reported.
  * Decode paths measured (best reported):
      - fused Pallas decoder, f32 (FULL fidelity, BN folded, whole chain in
        VMEM; ops/pallas/decoder_fused.py);
      - fused Pallas decoder, bf16 storage / f32 accumulation (correlation
        vs f32 > 0.999, pinned by tests/test_pallas_decoder.py);
      - pure-XLA decoder in bfloat16 (scan-chained).
    f32 parity vs the PyTorch reference is covered by the golden tests
    (waveform correlation > 0.999999).
  * A second metric rides in extras: jitted training-step latency at the
    shipped batch 32 (forward + loss + SGD update), K-chained the same way.

Prints ONE JSON line:
  {"metric": "panorama_views_per_sec_per_chip", "value": N, "unit": "views/s",
   "vs_baseline": value / 50000, ...extras}

`vs_baseline` is relative to the 50k views/sec/chip north-star target
(BASELINE.json — the reference publishes no quantitative numbers; its demo
decodes 84 views sequentially per batch, demo.ipynb cells 2-4).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _rtt(jax, jnp):
    @jax.jit
    def triv(x):
        return (x * 2).sum()

    x0 = jnp.ones((8, 128))
    float(triv(x0))
    t0 = time.perf_counter()
    for _ in range(10):
        float(triv(x0))
    return (time.perf_counter() - t0) / 10


def _time(fn, args, reps, rtt=0.0):
    """Median wall time of fn, minus the tunnel round-trip `rtt`.

    Every timed fn here is a K-chained launch stack, so one host sync (the
    scalar pull) rides on each call; subtracting the measured RTT leaves the
    pure device time. Floored at half the raw median as a guard against a
    pathological probe (never triggers when K is sized per the docstring).
    """
    float(fn(*args))  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    return max(med - rtt, 0.5 * med), 100 * float(np.std(ts) / med)


def _devices_or_die(jax, timeout_s=240):
    """Fail fast instead of hanging forever when the axon tunnel is down.

    Backend init (`jax.devices()`) blocks inside make_c_api_client with no
    client-side timeout when the tunnel is unreachable; a hung bench run
    reports nothing, while a loud exit says exactly what went wrong."""
    import os
    import sys
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(
                f"bench: jax backend init did not complete in {timeout_s}s — "
                "TPU tunnel unreachable",
                file=sys.stderr, flush=True,
            )
            # still emit the one-JSON-line contract so the run is recorded as
            # an infrastructure outage, not an absent/undefined benchmark
            print(json.dumps({
                "metric": "panorama_views_per_sec_per_chip",
                "value": None,
                "unit": "views/s",
                "vs_baseline": None,
                "error": f"TPU tunnel unreachable (backend init hung {timeout_s}s)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    devs = jax.devices()
    done.set()
    return devs


def main():
    import jax
    import jax.numpy as jnp

    _devices_or_die(jax)

    from electrocardio_panorama_tpu.config import get_cfg
    from electrocardio_panorama_tpu.models import build_model
    from electrocardio_panorama_tpu.models.nefnet import query_gates
    from __graft_entry__ import _synth_batch

    cfg = get_cfg()
    cfg.MODEL.model = "model_nefnet"
    cfg.DATA.lead_num = 3
    model = build_model(cfg)

    params, bn_state = model.init(jax.random.PRNGKey(0))
    B, V, K = 32, 336, 32
    rng = np.random.default_rng(0)
    batch = _synth_batch(rng, B=B)
    rtt = _rtt(jax, jnp)
    results, stds = {}, {}
    fargs = (
        jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
        jnp.asarray(batch["rois"]),
    )
    vstack_f32 = jnp.asarray(rng.uniform(-np.pi, np.pi, (K, B, V, 2)).astype(np.float32))

    # ---- paths 1+2: fused Pallas decoder (f32 full fidelity; bf16 storage).
    # Production runs the STREAMED-U basis decode (angular encodings in; the
    # per-beat rank-J basis planes stream into the kernel once per beat and
    # the [vt, J] view mix runs in-kernel — head='auto' resolves to the
    # per-dtype winner, decoder_fused._basis_head_auto); basis=False keeps
    # the legacy in-kernel gate path benched for the A/B delta.
    def bench_fused(name, storage_dtype, v_tile, basis=True):
        from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (
            fold_decoder_bn,
            fused_decode_views,
        )
        from electrocardio_panorama_tpu.ops.theta import angular_encode

        folded = fold_decoder_bn(params, bn_state, dtype=storage_dtype)

        @jax.jit
        def chain(p, f, data, input_theta, rois, vs):
            # full workload: encode once + per-sweep view prep + fused decode
            latent = model.encode(p, data, input_theta, rois).latent_all
            latent = latent.astype(storage_dtype)

            def body(carry, v):
                if basis:
                    out = fused_decode_views(
                        f, latent, enc=angular_encode(v, 1), v_tile=v_tile)
                else:
                    gates = query_gates(p, v).astype(storage_dtype)
                    out = fused_decode_views(f, latent, gates, v_tile=v_tile)
                return carry + out.sum(), None

            acc, _ = jax.lax.scan(body, 0.0, vs)
            return acc

        try:
            med, std = _time(chain, (params, folded, *fargs, vstack_f32), 5, rtt)
            results[name] = K * B * V / med
            stds[name] = round(std, 1)
        except Exception as e:  # noqa: BLE001 — report the fallback instead
            results[f"{name}_error"] = str(e)[:120]

    # v_tile=16 measured best on v5e (304k vs 264k at vt=24, vs 260k at vt=32;
    # tools/bench_kernel_variants.py). The bf16 pipeline compiles since the
    # gate stage went f32 (Mosaic's one bf16-hostile pattern — docs/KERNELS.md)
    # and correlates > 0.999 vs f32 (tests/test_pallas_decoder.py).
    # f32 rides the stream_scalar head whose measured-best tile is 8
    # (tools/bench_kernel_basis_stream.py: 328k at vt8 vs 277k at vt16)
    bench_fused("pallas_fused_f32", jnp.float32, 8)
    bench_fused("pallas_fused_bf16", jnp.bfloat16, 16)
    bench_fused("pallas_gatekernel_bf16", jnp.bfloat16, 16, basis=False)

    # ---- path 3: XLA decoder, bf16, scan-chained
    dtype = jnp.bfloat16
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, t
    )
    params_c, bn_c = cast(params), cast(bn_state)

    @jax.jit
    def chain(p, s, data, input_theta, rois, vs):
        latent = model.encode(p, data, input_theta, rois).latent_all

        def body(carry, v):
            out = model.decode_views(p, s, latent, v)
            return carry + out.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(body, 0.0, vs)
        return acc

    args = (
        params_c, bn_c,
        jnp.asarray(batch["data"], dtype), jnp.asarray(batch["input_theta"], dtype),
        jnp.asarray(batch["rois"]), vstack_f32.astype(dtype),
    )
    med, std = _time(chain, args, 5, rtt)
    results["xla_bf16"] = K * B * V / med
    stds["xla_bf16"] = round(std, 1)

    # ---- paths 4+5: XLA decoder in f32 — the like-for-like baselines for the
    # two fused pipelines. On TPU a DEFAULT-precision f32 matmul/conv truncates
    # operands to one bf16 MXU pass (f32 storage, bf16 numerics), so
    # 'xla_f32' pairs with the bf16 kernel's numerics at f32 storage while
    # 'xla_f32_highest' (multi-pass, f32-accurate) is the honest baseline for
    # the HIGHEST-precision pallas_fused_f32 pipeline.
    f32_args = (params, bn_state, *fargs, vstack_f32)
    med, std = _time(chain, f32_args, 5, rtt)
    results["xla_f32"] = K * B * V / med
    stds["xla_f32"] = round(std, 1)

    @jax.jit
    def chain_hi(p, s, data, input_theta, rois, vs):
        with jax.default_matmul_precision("highest"):
            latent = model.encode(p, data, input_theta, rois).latent_all

            def body(carry, v):
                out = model.decode_views(p, s, latent, v)
                return carry + out.astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(body, 0.0, vs)
            return acc

    med, std = _time(chain_hi, f32_args, 5, rtt)
    results["xla_f32_highest"] = K * B * V / med
    stds["xla_f32_highest"] = round(std, 1)

    # ---- encode stage alone (K-chained over perturbed batches so XLA cannot
    # hoist the loop-invariant encode; measured 1.4 ms/launch = ~8% of the
    # per-launch fused path; see tools/bench_encode_share.py for the bf16
    # no-gain result that keeps it f32)
    @jax.jit
    def enc_chain(p, ds, it, r):
        def body(c, d):
            return c + model.encode(p, d, it, r).latent_all.sum(), None
        acc, _ = jax.lax.scan(body, 0.0, ds)
        return acc

    # K_ENC=64: encode is ~1.4 ms/launch, so the tunnel RTT must amortize
    # over many more launches than the decode chains need
    K_ENC = 64
    datas = jnp.stack([fargs[0] + 1e-6 * k for k in range(K_ENC)])
    enc_med, _ = _time(enc_chain, (params, datas, fargs[1], fargs[2]), 5, rtt)
    encode_ms = 1e3 * enc_med / K_ENC

    # ---- dense full-record sweep (BASELINE config 5 workload on one chip):
    # every beat of several records batches together (the beat axis IS the
    # batch axis) x 360 continuous viewpoints — demo.ipynb cells 2-4 scaled
    # to the full-record/continuous-sweep shape, fused bf16 pipeline.
    from electrocardio_panorama_tpu.ops.pallas.decoder_fused import (
        fold_decoder_bn,
        fused_decode_views,
    )

    B_DS, V_DS, K_DS = 48, 360, 16  # e.g. 8 records x 6 beats, 360-view sweep
    ds_batch = _synth_batch(rng, B=B_DS)
    folded16 = fold_decoder_bn(params, bn_state, dtype=jnp.bfloat16)
    vs_ds = jnp.asarray(
        rng.uniform(-np.pi, np.pi, (K_DS, B_DS, V_DS, 2)).astype(np.float32)
    )

    @jax.jit
    def dense_chain(p, f, data, input_theta, rois, vs):
        latent = model.encode(p, data, input_theta, rois).latent_all
        latent = latent.astype(jnp.bfloat16)

        def body(carry, v):
            from electrocardio_panorama_tpu.ops.theta import angular_encode

            out = fused_decode_views(f, latent, enc=angular_encode(v, 1),
                                     v_tile=16)
            return carry + out.sum(), None

        acc, _ = jax.lax.scan(body, 0.0, vs)
        return acc

    ds_args = (
        params, folded16, jnp.asarray(ds_batch["data"]),
        jnp.asarray(ds_batch["input_theta"]), jnp.asarray(ds_batch["rois"]), vs_ds,
    )
    ds_med, _ = _time(dense_chain, ds_args, 5, rtt)
    dense_sweep_views_per_sec = K_DS * B_DS * V_DS / ds_med

    # ---- train-step latency (batch 32, forward+loss+SGD, K-chained)
    from electrocardio_panorama_tpu.models.losses import loss_wrapper
    from electrocardio_panorama_tpu.training.optim import get_optimizer

    tx = get_optimizer(cfg)
    opt_state = tx.init(params)
    import optax

    from electrocardio_panorama_tpu.training.precision import (
        cast_floats, cast_floats_f32)

    K_TRAIN = 256  # train steps are ~1-3 ms: even with the RTT subtraction
    # the residual probe noise must stay small relative to K x signal
    # (the r02 train metrics chained K=8 and carried ~3 ms of RTT each)

    def make_train_chain(compute_dtype, train_decoder="xla", train_encoder="xla"):
        # the Solver's mixed-precision policy (training/precision.py):
        # master params f32, forward/backward in compute_dtype, f32 loss.
        # train_decoder='fused' rides the Pallas training decoder
        # (forward + custom-VJP backward, ops/pallas/decoder_train.py);
        # train_encoder='fused' the Pallas encoder (ops/pallas/encoder_fused.py).
        mixed = compute_dtype != jnp.float32
        castc = lambda t: cast_floats(t, compute_dtype)
        if train_decoder == "fused":
            from electrocardio_panorama_tpu.ops.pallas.decoder_train import (
                make_train_decode_fn,
            )

            tdf = make_train_decode_fn(compute_dtype=compute_dtype)
        else:
            tdf = None
        if train_encoder == "fused":
            from electrocardio_panorama_tpu.ops.pallas.encoder_fused import (
                make_fused_encode_fn,
            )

            ekw = {"encode_fn": make_fused_encode_fn(cfg.DATA.lead_num,
                                                     cfg.MODEL.theta_L)}
        else:
            ekw = {}

        @jax.jit
        def train_chain(p, bn, opt, rng_key, data, input_theta, target_theta,
                        rois, target_view):
            def one_step(carry, k):
                p, bn, opt = carry

                def loss_fn(pp):
                    if mixed:
                        pp, d, it, tt = castc((pp, data, input_theta, target_theta))
                    else:
                        d, it, tt = data, input_theta, target_theta
                    (out, sp, sl), new_bn = model.apply(
                        pp, bn, d, it, tt, rois,
                        phase="train", rng=jax.random.fold_in(rng_key, k),
                        shuffle_idx=(0, 1), train_decode_fn=tdf, **ekw,
                    )
                    if mixed:
                        out, sp, sl = cast_floats_f32((out, sp, sl))
                        new_bn = cast_floats_f32(new_bn)
                    loss, *_ = loss_wrapper(out, sp, sl, target_view[:, None, :], cfg)
                    return loss, new_bn

                (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
                updates, new_opt = tx.update(grads, opt, p)
                return (optax.apply_updates(p, updates), new_bn, new_opt), loss

            (_, _, _), losses = jax.lax.scan(one_step, (p, bn, opt), jnp.arange(K_TRAIN))
            return losses.sum()

        return train_chain

    # rbg key = the Solver's shipped TPU.rng_impl default (hardware-RNG
    # dropout masks; threefry costs ~0.5 ms more per step at this recipe)
    targs = (
        params, bn_state, opt_state, jax.random.key(0, impl="rbg"),
        jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
        jnp.asarray(batch["target_theta"]), jnp.asarray(batch["rois"]),
        jnp.asarray(batch["target_view"]),
    )
    train_med, train_std = _time(make_train_chain(jnp.float32), targs, 5, rtt)
    train_step_ms = 1e3 * train_med / K_TRAIN
    train_med16, _ = _time(make_train_chain(jnp.bfloat16), targs, 5, rtt)
    train_step_ms_bf16 = 1e3 * train_med16 / K_TRAIN
    # The Pallas TRAINING decoder is not timed here: the round-5 batch sweep
    # (tools/sweep_train_decoder.py, docs/KERNELS.md) found no winning
    # regime — it loses 1.11x at batch 32 and exceeds VMEM at batch >= 128 —
    # so it is demoted to documented-pattern status (TPU.train_decoder
    # default stays 'xla'; parity tests keep it honest).
    try:
        train_medfe, _ = _time(
            make_train_chain(jnp.bfloat16, train_encoder="fused"), targs, 5, rtt
        )
        train_step_ms_bf16_fused_enc = round(1e3 * train_medfe / K_TRAIN, 3)
    except Exception as e:  # noqa: BLE001 — report the fallback instead
        train_step_ms_bf16_fused_enc = f"error: {str(e)[:80]}"

    # ---- Solver-harness train step (VERDICT r4 item 4): time the ACTUAL
    # production Solver._train_step — donating jit, per-step host rng split,
    # per-step Python dispatch — exactly as run_one_epoch drives it. This is
    # the number TPU.train_encoder='auto' governs; the lean chain above and
    # this harness disagreed in r4 (2.28 vs 2.55) because the chain hides
    # per-step dispatch and rng-split work inside one scan.
    def solver_step_ms(train_encoder: str):
        import shutil
        import tempfile

        from electrocardio_panorama_tpu.training.solver import Solver

        cfg2 = get_cfg()
        cfg2.MODEL.model = "model_nefnet"
        cfg2.DATA.lead_num = 3
        cfg2.TPU.compute_dtype = "bfloat16"
        cfg2.TPU.train_encoder = train_encoder
        cfg2.desc = "bench_solver"
        tmp = tempfile.mkdtemp(prefix="bench_solver_")
        cfg2.output_dir = tmp
        try:
            solver = Solver(cfg2, use_writer=False)
            p, bn = solver.model.init(jax.random.PRNGKey(0))
            opt = solver.tx.init(p)
            step = solver._train_step
            rng = jax.random.key(0, impl=cfg2.TPU.rng_impl)
            dargs = (
                jnp.asarray(batch["data"]), jnp.asarray(batch["input_theta"]),
                jnp.asarray(batch["target_theta"]), jnp.asarray(batch["rois"]),
                jnp.asarray(batch["target_view"]),
                jnp.zeros((B, 512), jnp.float32),
            )
            i1 = i2 = np.int32(0)

            def run(n, p, bn, opt, k0):
                for k in range(k0, k0 + n):
                    p, bn, opt, lvec = step(p, bn, opt, rng, np.int32(k),
                                            i1, i2, *dargs)
                jax.block_until_ready(lvec)
                return p, bn, opt

            p, bn, opt = run(3, p, bn, opt, 0)  # compile + warm
            N = 200
            ts = []
            for r in range(3):
                t0 = time.perf_counter()
                p, bn, opt = run(N, p, bn, opt, 3 + r * N)
                ts.append(time.perf_counter() - t0)
            return 1e3 * max(float(np.median(ts)) - rtt, 1e-9) / N
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    try:
        solver_step_fused = round(solver_step_ms("auto"), 3)
    except Exception as e:  # noqa: BLE001 — report the fallback instead
        solver_step_fused = f"error: {str(e)[:80]}"
    try:
        solver_step_xla = round(solver_step_ms("xla"), 3)
    except Exception as e:  # noqa: BLE001 — report the fallback instead
        solver_step_xla = f"error: {str(e)[:80]}"

    # p50 latency: single-beat 24-view panorama. The signal (~4 us/launch) is
    # far below tunnel-RTT variance (+-6 ms observed), so rtt subtraction
    # clamps to 0 — instead time TWO chain lengths and take the per-launch
    # DIFFERENCE quotient, which cancels RTT (and any fixed dispatch cost)
    # exactly in the medians.
    b1 = _synth_batch(rng, B=1)
    K_SHORT, K_LONG = 256, 2304
    vlong = jnp.asarray(rng.uniform(-np.pi, np.pi, (K_LONG, 1, 24, 2)), dtype)
    d1 = (jnp.asarray(b1["data"], dtype), jnp.asarray(b1["input_theta"], dtype),
          jnp.asarray(b1["rois"]))
    args_s = (params_c, bn_c, *d1, vlong[:K_SHORT])
    args_l = (params_c, bn_c, *d1, vlong)
    float(chain(*args_s)), float(chain(*args_l))
    lat_s, lat_l = [], []
    for _ in range(10):
        t0 = time.perf_counter()
        float(chain(*args_s))
        lat_s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(chain(*args_l))
        lat_l.append(time.perf_counter() - t0)
    p50_ms = max(
        float(np.median(lat_l)) - float(np.median(lat_s)), 0.0
    ) / (K_LONG - K_SHORT) * 1e3

    # ---- host input pipeline: steady-state ms per batch-32 (record/beat
    # caches warm — the state every epoch after the first runs in). The train
    # step is ~2-3 ms on device, so this is the number that decides whether
    # training is input-bound (26 ms/batch before the r03 loader work; ~2.6
    # after, measured on an idle host).
    # Recipe shared with tools/bench_loader.py; guarded so a host-side failure
    # (corpus regeneration, filesystem) can't take down the device metrics,
    # and any dataset-build chatter goes to stderr to keep the one-JSON-line
    # stdout contract.
    try:
        import contextlib
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from tools.bench_loader import measure as _loader_measure

        with contextlib.redirect_stdout(sys.stderr):
            host_loader_ms = round(_loader_measure(0, batches=100), 2)
    except Exception as e:  # noqa: BLE001 — report instead of aborting the bench
        host_loader_ms = f"error: {str(e)[:80]}"

    candidates = {k: v for k, v in results.items() if not k.endswith("_error")}
    best_path = max(candidates, key=candidates.get)
    views_per_sec = candidates[best_path]

    # ---- MFU framing (VERDICT r03 item 3): algorithmic model FLOPs (XLA
    # cost analysis, recomputed by tests/test_flops.py) vs the v5e 197 TF bf16
    # peak. The f32 pipelines run multi-pass bf16 on this chip (docs/KERNELS.md
    # dtype section) so they are framed against the same peak, labeled.
    from electrocardio_panorama_tpu.utils import flops as F

    decode_tflops = views_per_sec * F.FULL_WORKLOAD_FLOPS_PER_VIEW / 1e12
    # the rank-J basis collapse does strictly less work than the reference
    # decode chain, so the ALGORITHMIC framing (reference-chain FLOPs /
    # wall time) exceeds 100% of peak — that is the speedup-style number.
    # decode_mfu_pct is framed on the FLOPs the winning pipeline EXECUTES
    # (utils/flops.basis_decode_executed_flops_per_view).
    decode_exec_tflops = (
        views_per_sec * F.basis_decode_executed_flops_per_view() / 1e12)
    train_tflops = F.TRAIN_STEP_FLOPS_B32 / (train_med16 / K_TRAIN) / 1e12
    print(json.dumps({
        "metric": "panorama_views_per_sec_per_chip",
        "value": round(views_per_sec, 1),
        "unit": "views/s",
        "vs_baseline": round(views_per_sec / 50000.0, 3),
        "best_path": best_path,
        "paths": {k: (round(v, 1) if isinstance(v, float) else v) for k, v in results.items()},
        "path_std_pct": stds,
        "batch_beats": B,
        "views_per_beat": V,
        "chained_launches": K,
        "decode_algorithmic_tflops": round(decode_tflops, 1),
        "decode_algorithmic_pct_of_peak": round(
            100 * decode_tflops * 1e12 / F.V5E_BF16_PEAK_FLOPS, 1),
        "decode_executed_tflops": round(decode_exec_tflops, 1),
        "decode_mfu_pct": round(
            100 * decode_exec_tflops * 1e12 / F.V5E_BF16_PEAK_FLOPS, 1),
        "train_achieved_tflops": round(train_tflops, 1),
        "train_mfu_pct": round(100 * train_tflops * 1e12 / F.V5E_BF16_PEAK_FLOPS, 1),
        "mfu_basis": ("decode_mfu_pct = EXECUTED FLOPs of the streamed-basis "
                      "pipeline / 197 TF v5e bf16 peak; the algorithmic "
                      "framing (reference-chain model FLOPs, "
                      "tests/test_flops.py) is reported separately and may "
                      "exceed 100% because the rank-J basis collapse removes "
                      "work"),
        "dense_sweep_views_per_sec": round(dense_sweep_views_per_sec, 1),
        "dense_sweep_shape": [B_DS, V_DS],
        "encode_ms_per_launch_batch32": round(encode_ms, 3),
        "train_step_ms_batch32": round(train_step_ms, 3),
        "train_step_ms_batch32_bf16": round(train_step_ms_bf16, 3),
        "train_step_ms_batch32_bf16_fused_encoder": train_step_ms_bf16_fused_enc,
        "solver_train_step_ms_batch32_bf16_auto": solver_step_fused,
        "solver_train_step_ms_batch32_bf16_xla_encoder": solver_step_xla,
        "train_step_std_pct": round(train_std, 1),
        "p50_latency_ms_24view_panorama_amortized": round(p50_ms, 3),
        "host_loader_ms_per_batch32": host_loader_ms,
        "tunnel_rtt_ms": round(rtt * 1e3, 1),
        "rtt_subtracted": True,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
