"""Electrocardio Panorama synthesis — the north-star workload.

Reference: demo.ipynb builds a dense 84-view grid (7 theta x 12 phi), overrides
each batch's rest_theta with it, and decodes views SEQUENTIALLY per view
(model_nefnet.py:185-190), saving all_theta_data.npz. Here:

  * encode once, decode ALL views in one batched launch (models.decode_views);
  * arbitrary grid densities (e.g. 360 continuous viewpoints) are a reshape,
    not a loop;
  * the view axis can shard across a device mesh (parallel.sharding) for
    dense sweeps over full multi-beat records;
  * synthesis-from-scratch: the reference ships the latent->ECG mechanism but
    no latent source (README.md:19-22, SURVEY.md section 3.4). We add an
    explicit, documented Gaussian latent prior fitted over dataset latents.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# Device-resident accumulation window for streaming loops (render_dataset,
# GaussianLatentPrior.fit): outputs stay on device within a window (no
# per-batch D2H sync) and drain to host once the window exceeds this bound,
# so device-memory use is O(window) regardless of dataset size.
_DEVICE_ACCUM_BYTES = 256 << 20


def theta_grid(n_theta: int = 7, n_phi: int = 12) -> np.ndarray:
    """The demo notebook's dense viewpoint grid (demo.ipynb cell 2) at its
    default 7x12=84 size; other densities keep the same endpoint layout."""
    if n_theta == 7:
        thetas = np.array([np.pi / 24] + [np.pi * k / 6 for k in range(1, 6)] + [np.pi * 23 / 24])
    else:
        thetas = np.linspace(np.pi / 24, np.pi * 23 / 24, n_theta)
    phis = -np.pi + np.arange(n_phi) * (np.pi / 6 if n_phi == 12 else 2 * np.pi / n_phi)
    grid = np.stack(np.meshgrid(thetas, phis, indexing="ij"), axis=-1)  # [T, P, 2]
    return grid.reshape(-1, 2).astype(np.float32)


class PanoramaGenerator:
    """Encode-once / decode-many panorama renderer (demo.ipynb Generator).

    `use_fused=True` decodes with the fused Pallas decoder kernel
    (ops/pallas/decoder_fused.py: BN folded, whole chain in VMEM). Pair it
    with `compute_dtype=jnp.bfloat16` for the throughput pipeline (~500k
    views/s on v5e-1, 2.3x the bf16 XLA decoder; corr > 0.999999 vs f32 on
    trained weights — docs/KERNELS.md); f32 keeps exact parity with the XLA
    decoder. Views are padded up to the kernel's view-tile and trimmed after.
    """

    def __init__(self, model_def, params, bn_state, *, compute_dtype=jnp.float32,
                 use_fused: bool = False, v_tile: int = 16):
        self.model = model_def
        self.params = params
        self.bn_state = bn_state
        self.dtype = compute_dtype
        self.use_fused = use_fused
        self.v_tile = v_tile
        if compute_dtype != jnp.float32:
            self.params = jax.tree.map(
                lambda x: x.astype(compute_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                params,
            )
        self._encode = jax.jit(
            lambda p, x, it, r: self.model.encode(p, x, it, r).latent_all
        )
        self._decode = jax.jit(self.model.decode_views)
        self._folded = None
        if use_fused:
            from electrocardio_panorama_tpu.ops.pallas.decoder_fused import fold_decoder_bn

            self._folded = fold_decoder_bn(params, bn_state, dtype=compute_dtype)

    def encode(self, data, input_theta, rois):
        return self._encode(
            self.params, jnp.asarray(data, self.dtype), jnp.asarray(input_theta, self.dtype),
            jnp.asarray(rois),
        )

    def render(self, data, input_theta, rois, views: np.ndarray) -> jnp.ndarray:
        """data [B,L,512], views [V,2] (shared) or [B,V,2] -> [B,V,512]."""
        latent = self.encode(data, input_theta, rois)
        v = jnp.asarray(views, self.dtype)
        if v.ndim == 2:
            v = jnp.broadcast_to(v[None], (latent.shape[0], *v.shape))
        if self._folded is not None:
            from electrocardio_panorama_tpu.ops.pallas.decoder_fused import fused_decode_views
            from electrocardio_panorama_tpu.ops.theta import angular_encode

            # basis decode: ship angular encodings; the gate/upsample/conv1
            # head runs as the streamed rank-J basis mix
            # (decoder_fused._decoder_kernel_ppu)
            enc = angular_encode(v, self.model.theta_encoder_len)
            return fused_decode_views(self._folded, latent, enc=enc, v_tile=self.v_tile)
        return self._decode(self.params, self.bn_state, latent, v)

    def render_dataset(self, loader, views: np.ndarray, out_path: str | None = None,
                       max_batches: int | None = None):
        """demo.ipynb cells 3-4: render every test batch under the dense grid,
        save all_theta_data.npz (outputs + rois)."""
        host, outs, rois_all, pending = [], [], [], 0
        for bi, batch in enumerate(loader):
            if max_batches is not None and bi >= max_batches:
                break
            # keep the device array: pulling it here would serialize batch
            # assembly with device compute (one D2H round-trip per batch);
            # launches dispatch back-to-back and transfer once per window —
            # the window bound keeps device residency O(window), not
            # O(dataset) (a 50k-beat x 84-view sweep would otherwise hold
            # ~9 GB of outputs in HBM before the final transfer)
            out = self.render(batch["data"], batch["input_theta"], batch["rois"], views)
            outs.append(out)
            rois_all.append(batch["rois"])
            pending += out.size * out.dtype.itemsize
            if pending >= _DEVICE_ACCUM_BYTES:
                host.extend(np.asarray(o, np.float32) for o in outs)
                outs, pending = [], 0
        host.extend(np.asarray(o, np.float32) for o in outs)
        rest_out = (
            np.concatenate(host)
            if host else np.zeros((0, len(views), 512), np.float32)
        )
        rois_cat = np.concatenate(rois_all) if rois_all else np.zeros((0, 7, 2), np.int64)
        if out_path:
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            np.savez(out_path, rest_out=rest_out, rois=rois_cat)
        return rest_out, rois_cat


def plot_panorama(rest_out: np.ndarray, rois: np.ndarray, sample: int, path: str,
                  n_theta: int = 7, n_phi: int = 12) -> None:
    """The 12x7 matplotlib grid (demo.ipynb cells 5-6), time-trimmed to
    rois[-1,0]-20."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    end = max(int(rois[sample, -1, 0]) - 20, 8)
    waves = rest_out[sample].reshape(n_theta, n_phi, -1)
    fig, axes = plt.subplots(n_phi, n_theta, figsize=(2 * n_theta, 1.2 * n_phi),
                             sharex=True, sharey=True, squeeze=False)
    for i in range(n_theta):
        for j in range(n_phi):
            axes[j][i].plot(waves[i, j, :end], linewidth=0.8)
            axes[j][i].set_xticks([])
            axes[j][i].set_yticks([])
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, format="png", dpi=120)
    plt.close(fig)


def render_full_record(gen: PanoramaGenerator, dataset, record_index: int,
                       views: np.ndarray, rng: np.random.Generator | None = None):
    """Dense panorama over EVERY beat of one record (BASELINE config 5:
    full multi-beat records x dense view sweeps).

    The beat axis becomes the batch axis: all beats encode in one launch and
    all (beat, view) pairs decode together. Returns ([n_beats, V, 512], batch).
    """
    from electrocardio_panorama_tpu.data.pipeline import collate

    rng = rng or np.random.default_rng(0)
    n = dataset.num_beats(record_index)
    metas = [dataset.get_beat(record_index, b, rng) for b in range(n)]
    batch = collate(metas)
    pano = gen.render(batch["data"], batch["input_theta"], batch["rois"], views)
    return pano, batch


# ------------------------------------------------------- from-scratch synthesis
class GaussianLatentPrior:
    """Diagonal Gaussian over (z1, z2_grid) latents, fitted on dataset encodes.

    The documented latent source for synthesis-from-scratch (the reference
    exposes gen_ecg but no sampler). Latents are stored flattened per example.
    """

    def __init__(self, mean_z1, std_z1, mean_z2, std_z2, rois_template):
        self.mean_z1, self.std_z1 = mean_z1, std_z1
        self.mean_z2, self.std_z2 = mean_z2, std_z2
        self.rois_template = rois_template  # [7, 2] representative segmentation

    @classmethod
    def fit(cls, model_def, params, loader, max_batches: int = 8):
        enc = jax.jit(
            lambda p, x, it, r: model_def.encode(p, x, it, r, stop_before_reverse=True)
        )
        host1, host2, z1s, z2s, rois, pending = [], [], [], [], None, 0
        for bi, batch in enumerate(loader):
            if bi >= max_batches:
                break
            z1, z2 = enc(params, jnp.asarray(batch["data"]),
                         jnp.asarray(batch["input_theta"]), jnp.asarray(batch["rois"]))
            # device-resident within a bounded window (no per-batch D2H sync,
            # no O(dataset) device residency — see _DEVICE_ACCUM_BYTES)
            z1s.append(z1)
            z2s.append(z2)
            pending += z1.size * z1.dtype.itemsize + z2.size * z2.dtype.itemsize
            if pending >= _DEVICE_ACCUM_BYTES:
                host1.extend(np.asarray(z) for z in z1s)
                host2.extend(np.asarray(z) for z in z2s)
                z1s, z2s, pending = [], [], 0
            if rois is None:
                rois = batch["rois"][0]
        host1.extend(np.asarray(z) for z in z1s)
        host2.extend(np.asarray(z) for z in z2s)
        z1 = np.concatenate(host1)
        z2 = np.concatenate(host2)
        eps = 1e-6
        return cls(z1.mean(0), z1.std(0) + eps, z2.mean(0), z2.std(0) + eps, rois)

    def sample(self, rng: np.random.Generator, n: int, temperature: float = 1.0):
        z1 = self.mean_z1 + temperature * self.std_z1 * rng.standard_normal((n, *self.mean_z1.shape))
        z2 = self.mean_z2 + temperature * self.std_z2 * rng.standard_normal((n, *self.mean_z2.shape))
        rois = np.broadcast_to(self.rois_template, (n, *self.rois_template.shape))
        return z1.astype(np.float32), z2.astype(np.float32), rois.copy()

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, mean_z1=self.mean_z1, std_z1=self.std_z1,
                 mean_z2=self.mean_z2, std_z2=self.std_z2, rois=self.rois_template)

    @classmethod
    def load(cls, path: str):
        z = np.load(path)
        return cls(z["mean_z1"], z["std_z1"], z["mean_z2"], z["std_z2"], z["rois"])


def synthesize_from_scratch(model_def, params, bn_state, prior: GaussianLatentPrior,
                            views: np.ndarray, n: int, seed: int = 0,
                            temperature: float = 1.0):
    """Sample latents from the prior, decode under arbitrary viewpoints
    (reference gen_ecg two-step API, model_nefnet.py:196-218). Returns [n, V, 512]."""
    rng = np.random.default_rng(seed)
    z1, z2, rois = prior.sample(rng, n, temperature=temperature)
    v = np.broadcast_to(np.asarray(views, np.float32)[None], (n, len(views), 2))
    return model_def.gen_ecg(params, bn_state, jnp.asarray(z1), jnp.asarray(z2),
                             jnp.asarray(v), jnp.asarray(rois))
