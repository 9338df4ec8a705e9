"""Default configuration.

Mirrors the reference's yacs config tree (reference codes/config/default.py:1-56)
key-for-key so the reference's shipped YAML files (e.g. codes/config/nef_net.yml)
load unchanged, while adding a TPU group for mesh/precision knobs that have no
reference counterpart.
"""

from electrocardio_panorama_tpu.config.node import Node


def get_default_cfg() -> Node:
    cfg = Node()
    cfg.seed = 123
    cfg.fit_msg = "None"
    cfg.output_dir = "output"
    cfg.latent_save_dir = "output/latents"
    cfg.desc = "model_v2_tianchi"

    # ------------------------------------------------------------------ DATA
    # reference codes/config/default.py:14-27
    cfg.DATA = Node()
    cfg.DATA.dataset = "tianchi"
    cfg.DATA.train_label_path = "data/tianchi/tianchi_train_jsons.txt"
    cfg.DATA.test_label_path = "data/tianchi/tianchi_test_jsons.txt"
    cfg.DATA.train_data_root = "data/tianchi/npy_data/tianchi_train_round1"
    cfg.DATA.train_label_root = "data/tianchi/tianchi_interval"
    cfg.DATA.train_pkl_path = "data/PTB/pkl_data/train_heartbeats.pkl"
    cfg.DATA.test_pkl_path = "data/PTB/pkl_data/test_heartbeats.pkl"
    cfg.DATA.noise_std = [
        4.37258895, 4.73799667, 5.00643047, 6.7582663,
        6.57354042, 6.31023917, 6.05944371, 7.05612394,
    ]
    cfg.DATA.lead_num = 1
    cfg.DATA.noise = False
    cfg.DATA.train_data_mode = "normal"
    cfg.DATA.super_mode = "normal"
    cfg.DATA.weighted_sample = False
    cfg.DATA.synthetic_root = ""       # non-empty => root for the synthetic corpus
    cfg.DATA.synthetic_n_train = 16    # corpus size when generating synthetic data
    cfg.DATA.synthetic_n_test = 8
    cfg.DATA.use_native_prep = True    # C++ beat-prep fast path (falls back to numpy)
    cfg.DATA.record_cache = 2048       # LRU'd record arrays (~320 KB each); 0 disables
    cfg.DATA.beat_cache = 8192         # LRU'd prepped beats (~25 KB each); 0 disables
    cfg.DATA.batch_size = 32           # reference hardcodes 32 (train_net.py:27)
    cfg.DATA.num_workers = 0           # host pipeline threads (0 = synchronous)

    # ----------------------------------------------------------------- MODEL
    # reference codes/config/default.py:33-38
    cfg.MODEL = Node()
    cfg.MODEL.model = "modelv2"
    cfg.MODEL.resume = ""
    cfg.MODEL.loss = "v1"
    cfg.MODEL.jitter_factor = 0.0
    cfg.MODEL.theta_L = 1

    # ---------------------------------------------------------------- SOLVER
    # reference codes/config/default.py:44-55
    cfg.SOLVER = Node()
    cfg.SOLVER.optim = "sgd"
    cfg.SOLVER.scheduler = "steplr"
    cfg.SOLVER.lr_step = [150, 350]
    cfg.SOLVER.lr = 1e-3
    cfg.SOLVER.epochs = 500
    cfg.SOLVER.OurLoss1_version = "v2"
    cfg.SOLVER.reg_loss = "l1_loss"
    cfg.SOLVER.loss_using = [1, 2, 3]
    cfg.SOLVER.part_loss_no_grad = False
    cfg.SOLVER.loss_factor = [1, 1, 1]

    # ------------------------------------------------------------------- TPU
    # New group: TPU/JAX execution knobs. No reference counterpart.
    cfg.TPU = Node()
    cfg.TPU.mesh_shape = []            # [] = single device; e.g. [8] for dp=8
    cfg.TPU.mesh_axes = ["data"]       # axis names matching mesh_shape
    cfg.TPU.param_dtype = "float32"
    cfg.TPU.compute_dtype = "float32"  # "bfloat16" for throughput mode
    cfg.TPU.steps_per_epoch = 0        # 0 = full pass over the dataset
    cfg.TPU.profile_dir = ""           # non-empty => jax.profiler traces
    cfg.TPU.check_nans = True          # loss-finiteness guard, checked once per
                                       # epoch on the stacked step losses (a
                                       # per-step check would sync the device
                                       # every step)
    cfg.TPU.checkpoint_backend = "pickle"  # "pickle" (reference-parity) | "orbax"
    # eval/val rest-view decoder: "auto" rides the fused Pallas kernel on TPU
    # and the XLA decoder elsewhere; force "xla" | "fused" (f32, full
    # fidelity) | "fused_bf16" (throughput; corr > 0.999 vs f32)
    cfg.TPU.eval_decoder = "auto"
    # train-step decoder: "xla" (grouped three-decode) | "fused" (Pallas
    # forward + custom-VJP backward, ops/pallas/decoder_train.py; gradient
    # parity pinned by tests/test_pallas_train_decoder.py). 'xla' is the
    # verdict of the round-5 batch sweep (tools/sweep_train_decoder.py,
    # docs/KERNELS.md): the kernel loses 1.11x at batch 32 and exceeds VMEM
    # at batch >= 128 — no winning regime, kept as a documented pattern
    cfg.TPU.train_decoder = "xla"
    # train-step encoder: "auto" | "xla" | "fused" (whole encode chain —
    # tower, gate, w/z convs, roi_align, z2_conv2 — as one Pallas forward +
    # recomputing custom-VJP backward, ops/pallas/encoder_fused.py; gradient
    # parity pinned by tests/test_pallas_encoder.py). "auto" rides the fused
    # kernel where it measured faster (TPU + bfloat16 + model_nefnet: 2.553
    # vs 2.838 ms/step at batch 32, tools/verify_fused_encoder.py) and XLA
    # elsewhere — the kernel is bf16-only on hardware (VMEM; see
    # encoder_vmem_bytes_estimate) and falls back to the XLA encode for
    # batches not divisible by 8 (e.g. a final partial validation batch)
    cfg.TPU.train_encoder = "auto"
    # fused-encoder backward checkpointing: 'tower' stores the 7 tower
    # block-boundary planes in HBM during the forward (~19 MB/step at batch
    # 32 bf16) and skips the tower recompute in the backward kernel —
    # measured 2.467 vs 2.559 ms/step (recompute) vs 2.800 (XLA encoder) in
    # the on-chip Solver A/B (docs/KERNELS.md "Tower-checkpoint encoder
    # backward"). 'full' additionally stores the 10 post-tower planes
    # (backward = pure reverse walk); 'off' is the zero-activation-HBM
    # recompute backward. Gradients are bitwise identical across all three
    # (tests/test_pallas_encoder.py).
    cfg.TPU.encoder_ckpt = "tower"
    # eval/val encoder: "xla" | "fused" (forward-only fused encoder kernel;
    # needs batch % 8 == 0 on hardware)
    cfg.TPU.eval_encoder = "xla"
    # PRNG implementation for the TRAINING rng stream (dropout masks, standin
    # shuffles): "rbg" rides the TPU hardware RNG (~3.7x faster per dropout
    # mask than threefry — 44 -> 12 us on [32, 384, 128]); "threefry2x32" is
    # JAX's counter PRNG whose draws are topology-invariant BY CONSTRUCTION
    # (rbg's invariance is empirical — the 2-process test passes with rbg,
    # but XLA does not guarantee RngBitGenerator stability across versions).
    # Model INIT always uses threefry so init draws never depend on this knob.
    cfg.TPU.rng_impl = "rbg"
    return cfg
