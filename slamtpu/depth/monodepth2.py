"""MonoDepth2 inference: JAX/Flax replacement of the tch-rs TorchScript
wrapper (/root/reference/src/depth/monodepth2.rs).

Differences from the reference, by design:
  * preprocessing (resize to 640x192, [0,1] scaling, channel handling) is
    FUSED into the same jit program as the network — one compiled step per
    batch instead of the reference's CPU Mat juggling (:336-379);
  * whole batches of frames per call instead of frame-at-a-time.

Matching the reference's observable behavior:
  * predict() returns the FULL-RESOLUTION (scale 0) disparity of the
    4-scale decoder output (:60-201 takes index 0), min-max normalized to
    [0, 1] (:206-251), at the model's 192x640 resolution;
  * predict_colored() normalizes by [min, 95th percentile] and maps through
    the magma colormap (:262-333), byte-exact: the reference's 728-entry
    magma.png LUT is embedded (magma_lut.npz) and the index/percentile
    arithmetic matches the Rust loop operation-for-operation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.depth_decoder import DepthDecoder
from ..models.resnet import ResNet18Encoder

__all__ = ["MonoDepth2"]


@functools.lru_cache()
def _magma_lut():
    """728x3 uint8 RGB magma table, byte-identical to the reference's shipped
    magma.png (src/depth/magma.png, consumed at monodepth2.rs:271-276). The
    pixel values are embedded as magma_lut.npz so `predict_colored` output is
    byte-compatible with the reference's saved visualizations — the same
    parity standard the PLY/JSON exporters hold."""
    import os

    path = os.path.join(os.path.dirname(__file__), "magma_lut.npz")
    return np.load(path)["lut"]


class MonoDepth2:
    """Batched MonoDepth2 predictor.

    Construct from converted upstream checkpoints
    (`MonoDepth2(encoder_path="encoder.pth", depth_path="depth.pth")`, the
    artifacts described in /root/reference/weights/README.md) or from
    in-memory variable trees / random init (testing).
    """

    def __init__(
        self,
        encoder_path: Optional[str] = None,
        depth_path: Optional[str] = None,
        encoder_vars=None,
        decoder_vars=None,
        width: int = 640,
        height: int = 192,
        seed: int = 0,
        compute_dtype=None,
    ):
        """compute_dtype: None keeps full f32; jnp.bfloat16 runs the network
        in bf16 (params stored f32, cast at the jit boundary; output cast
        back to f32). Measured on TPU v5e at 192x640 the win grows with
        batch — 1.00x at batch 4, 1.05x at 16, 1.23x at 64
        (tools/bench_depth_bf16.py; table in PARITY.md): at small batch the
        network is dispatch/HBM-bound, not MXU-bound, so halving the matmul
        width buys little. Inference-only BatchNorm is a scale/shift, so
        bf16 costs ~1e-2 relative disparity error (asserted against the f32
        path in tests/test_depth.py)."""
        self.width = width
        self.height = height
        self.compute_dtype = compute_dtype
        self.encoder = ResNet18Encoder()
        self.decoder = DepthDecoder()

        if encoder_path is not None:
            from .convert import convert_decoder, convert_encoder, load_state_dict

            encoder_vars = convert_encoder(load_state_dict(encoder_path))
            decoder_vars = convert_decoder(load_state_dict(depth_path))
        if encoder_vars is None:
            # Random init — architecture/testing use; predictions are noise.
            key = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1, height, width, 3), jnp.float32)
            encoder_vars = self.encoder.init(key, dummy)
            feats = self.encoder.apply(encoder_vars, dummy)
            decoder_vars = self.decoder.init(key, feats)
        self.encoder_vars = jax.tree_util.tree_map(jnp.asarray, encoder_vars)
        self.decoder_vars = jax.tree_util.tree_map(jnp.asarray, decoder_vars)

        @functools.partial(jax.jit, static_argnums=())
        def forward(encoder_vars, decoder_vars, images):
            # images: [B, H, W, 3] float32 in [0, 255]; fused preprocessing.
            x = jax.image.resize(
                images, (images.shape[0], height, width, 3), method="linear"
            )
            x = x / 255.0
            if compute_dtype is not None:
                cast = lambda t: jax.tree_util.tree_map(
                    lambda a: a.astype(compute_dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    t,
                )
                encoder_vars, decoder_vars = cast(encoder_vars), cast(decoder_vars)
                x = x.astype(compute_dtype)
            feats = self.encoder.apply(encoder_vars, x)
            disps = self.decoder.apply(decoder_vars, feats)
            return disps[0][..., 0].astype(jnp.float32)  # scale-0 disparity

        self._forward = forward

    # -- input plumbing ---------------------------------------------------
    def _batchify(self, image):
        image = np.asarray(image)
        single = image.ndim == 2 or (image.ndim == 3 and image.shape[-1] == 3)
        if image.ndim == 2:
            image = np.repeat(image[..., None], 3, axis=-1)
        elif image.ndim == 3 and image.shape[-1] != 3:
            image = np.repeat(image[..., None], 3, axis=-1)  # [T, H, W] grayscale clip
            single = False
        if image.ndim == 3:
            image = image[None]
        return image.astype(np.float32), single

    def predict_raw(self, image):
        """Sigmoid disparity in [0, 1], un-normalized. [B?, 192, 640]."""
        batch, single = self._batchify(image)
        disp = self._forward(self.encoder_vars, self.decoder_vars, jnp.asarray(batch))
        return disp[0] if single else disp

    def predict(self, image):
        """Min-max-normalized disparity (monodepth2.rs:206-251)."""
        disp = self.predict_raw(image)
        lo = jnp.min(disp, axis=(-2, -1), keepdims=True)
        hi = jnp.max(disp, axis=(-2, -1), keepdims=True)
        return (disp - lo) / jnp.maximum(hi - lo, 1e-12)

    def predict_colored(self, image):
        """uint8 RGB magma visualization, byte-exact to the reference's
        (monodepth2.rs:262-333): vmin = min, vmax = sorted values at index
        floor(0.95 * count) (an index percentile, NOT an interpolated one),
        degenerate range -> 1.0, and LUT index = trunc(normalized * 727)
        through the embedded 728-entry magma table."""
        disp = np.asarray(self.predict_raw(image))
        batched = disp.ndim == 3
        flat = disp.reshape(disp.shape[0] if batched else 1, -1)
        vmin = flat.min(axis=-1)
        srt = np.sort(flat, axis=-1)
        p95_idx = min(int(flat.shape[-1] * 0.95), flat.shape[-1] - 1)
        vmax = srt[:, p95_idx]
        rng = vmax - vmin
        rng = np.where(rng < 1e-8, 1.0, rng)
        shape = (-1, 1, 1) if batched else (-1, 1)
        if not batched:
            vmin, rng = vmin[0], rng[0]
        else:
            vmin, rng = vmin.reshape(shape), rng.reshape(shape)
        lut = _magma_lut()
        n = lut.shape[0]
        norm = np.clip((disp - vmin) / rng, 0.0, 1.0)
        idx = np.clip((norm * (n - 1)).astype(np.int32), 0, n - 1)
        return lut[idx]
