"""Pallas fused corner kernel vs the XLA reference path (interpret mode)."""

import jax.numpy as jnp
import numpy as np

from slamtpu.ops.fast import fast_score, nms3x3
from slamtpu.ops.harris import harris_response
from slamtpu.ops.pallas_corner import corner_response


def xla_ranked(images, threshold=20.0):
    score = nms3x3(fast_score(images, threshold))
    harris = harris_response(images)
    return np.where(np.asarray(score) > 0, np.asarray(harris), -np.inf)


def test_pallas_matches_xla_path(rng):
    import cv2

    img = rng.uniform(0, 255, size=(96, 200)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 2.0)
    for _ in range(25):
        cv2.circle(img, (int(rng.integers(15, 185)), int(rng.integers(15, 81))), int(rng.integers(2, 6)), float(rng.uniform(0, 255)), -1)
    imgs = np.stack([img, img[::-1].copy()])

    ours = np.asarray(corner_response(jnp.asarray(imgs), 20.0, interpret=True))
    oracle = xla_ranked(jnp.asarray(imgs), 20.0)

    # Compare away from borders (the kernel's column rolls and edge padding
    # differ from the XLA path's wraparound only in the outer ~8 px, which
    # the detector's 31 px margin discards anyway).
    m = 10
    a = ours[:, m:-m, m:-m]
    b = oracle[:, m:-m, m:-m]
    corner_match = (np.isfinite(a) == np.isfinite(b))
    assert corner_match.mean() > 0.999, f"corner sets differ: {1-corner_match.mean():.4%}"
    both = np.isfinite(a) & np.isfinite(b)
    assert both.sum() > 50  # enough corners to be a meaningful comparison
    np.testing.assert_allclose(a[both], b[both], rtol=1e-4)


def test_pallas_blank_image():
    imgs = np.zeros((1, 64, 128), np.float32)
    out = np.asarray(corner_response(jnp.asarray(imgs), 20.0, interpret=True))
    assert not np.isfinite(out).any()


def test_pallas_patch_matches_dynamic_slice():
    """ops/pallas_patch.extract_patches_batched (interpret mode on CPU) must
    reproduce the vmapped dynamic_slice path bit-for-bit, including clamped
    out-of-range starts and the aligned-load + dynamic-roll window cut."""
    import jax
    import jax.numpy as jnp

    from slamtpu.ops.brief import PATCH_RADIUS, extract_patches
    from slamtpu.ops.pallas_patch import extract_patches_batched

    rng = np.random.default_rng(7)
    b, h, w, k, r = 3, 90, 260, 17, PATCH_RADIUS
    imgs = jnp.asarray(rng.uniform(0, 255, (b, h, w)).astype(np.float32))
    xy = np.stack(
        [rng.integers(r, w - r, (b, k)), rng.integers(r, h - r, (b, k))], -1
    )
    # A few edge-hugging keypoints exercise the clamp.
    xy[:, 0] = (r, r)
    xy[:, 1] = (w - r - 1, h - r - 1)
    starts = jnp.asarray((xy - r).astype(np.int32))

    ref = jax.vmap(lambda i, kk: extract_patches(i, kk.astype(jnp.float32), r))(
        imgs, jnp.asarray(xy, jnp.float32)
    )
    out = extract_patches_batched(imgs, starts, r, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
