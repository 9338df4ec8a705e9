"""Model-FLOP accounting for MFU reporting (VERDICT r03 item 3).

The constants below are the XLA cost-analysis FLOP counts of the *algorithm*
(the pure-XLA f32 lowering of each workload — what the model mathematically
computes), NOT the instruction counts of any particular kernel. MFU is then

    mfu = model_flops / wall_time / chip_peak_flops

which is the standard convention: algorithmic restructurings that *skip* work
(e.g. the polyphase upsample+conv that drops the 80% structural zeros of the
dense upsample matmuls, docs/KERNELS.md) raise MFU above their dot-issue
utilization, exactly as FlashAttention-style kernels do.

Provenance: each constant is `jax.jit(fn).lower(...).compile().cost_analysis()
["flops"]` on the CPU backend at the bench shapes (B=32, V=336, L=3);
tests/test_flops.py recomputes them on every suite run, so a model change
that shifts the FLOP count fails loudly instead of silently skewing MFU.

Peak numbers: TPU v5e (v5litepod) is 197 TFLOP/s bf16 per chip (public spec,
jax-ml.github.io/scaling-book hardware table). There is no meaningful f32 MXU
peak on this chip — f32 matmuls run as multi-pass bf16 (docs/KERNELS.md dtype
section) — so f32 paths are framed against the same bf16 peak and labeled as
such.
"""

from __future__ import annotations

V5E_BF16_PEAK_FLOPS = 197e12

# Full panorama workload: encode batch B=32 ONCE + decode V=336 views/beat
# (gates + gate*latent + decoder convs), per decoded view. bench.py's
# views/s metrics count exactly this workload's views.
FULL_WORKLOAD_FLOPS_PER_VIEW = 117_784_454.0

# Decode-only chain (gates + gate*latent + decoder), per view: the marginal
# view cost with the encode amortized away entirely.
DECODE_FLOPS_PER_VIEW = 115_009_040.0

# One reference-recipe training step at batch 32 (forward + loss + backward +
# SGD update; model_nefnet train phase = encode + 3 decodes + BN updates).
TRAIN_STEP_FLOPS_B32 = 123_727_478_784.0

# Encode (few-view, L=3) per beat, eval mode.
ENCODE_FLOPS_PER_BEAT = 932_372_224.0


def mfu_pct(flops: float, seconds: float, peak: float = V5E_BF16_PEAK_FLOPS) -> float:
    """Achieved fraction of chip peak, in percent."""
    return 100.0 * flops / seconds / peak


def basis_decode_executed_flops_per_view(v_tile: int = 16, j: int = 13,
                                         views_per_beat: int = 336) -> float:
    """EXECUTED FLOPs per view of the streamed-U basis decode pipeline
    (ops/pallas/decoder_fused.py, head='stream') — the denominator companion
    to FULL_WORKLOAD_FLOPS_PER_VIEW once the rank-J basis collapse makes the
    *algorithmic* MFU exceed 100% (the basis head does strictly less work
    than the reference chain it is value-equal to).

    Per-view in-kernel MACs (dot shapes from the kernel, docs/KERNELS.md):
    the f-batched [vt, J] mix, conv2 N-fused, upconv2 M-stacked (PL+PR),
    conv4 at K=128, conv5 selector dots (vt-times redundant by structure,
    counted as executed). Per-beat XLA work amortized over the sweep's
    views: the basis-plane build (T = lat @ u1eo; U = w1a @ T) and the
    encode pass."""
    mac = 128 * j * 256                   # in-kernel view mix (fdot)
    mac += 3 * 128 * 128 * 256            # conv2 N-fused (3 dots, N=256)
    mac += 6 * 128 * 128 * 128            # upconv2 M-stacked (2 planes x 3)
    mac += 8 * 64 * 128 * 128             # conv4, 2 dots x 4 phases, K=128
    mac += 3 * v_tile * 64 * 512          # conv5 selector dots
    beat_mac = 3 * 256 * 128 * 256        # T[b,k] = lat @ u1eo[k]
    beat_mac += 3 * j * 128 * 256 * 256   # U[b,j] = sum_k w1a[k,j] @ T[b,k]
    return (2.0 * mac
            + (2.0 * beat_mac + ENCODE_FLOPS_PER_BEAT) / views_per_beat)
