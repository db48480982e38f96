"""Multi-chip VO: shard_map over (data, seq) with ICI halo exchange.

The full VO step — detection, pairwise matching, RANSAC pose, keyframe scan,
trajectory composition — jitted over a `jax.sharding.Mesh`:

  * the batch of sequences shards over `data` (no communication);
  * the time axis shards over `seq`. Two collectives make that correct:
      1. a one-frame HALO EXCHANGE (`jax.lax.ppermute` along `seq`): each
         shard sends its last frame's features to its right neighbor, so the
         neighbor can form the boundary frame pair — the SLAM analog of
         context-parallel halo exchange (SURVEY.md §5);
      2. a CROSS-SHARD PREFIX PRODUCT for trajectory composition: each shard
         scans its local relative transforms, `all_gather`s the per-shard
         totals along `seq`, and multiplies in its prefix offset — a
         distributed associative scan in two hops.

  Keyframe selection is the one sequentially-dependent piece. Its scan state
  is tiny (a rotation, a translation, two counters), so instead of
  approximating it per shard, every shard `all_gather`s the per-frame scan
  INPUTS (relative pose + match count + success — ~14 floats/frame) along
  `seq` and runs the full-sequence scan REDUNDANTLY, then slices out its own
  shard's decisions. The scalar scan is negligible next to detection/RANSAC,
  and sharded == serial EXACTLY for every keyframe config (not just the
  default where each successful frame is a keyframe).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..feature.detector import detect_and_compute
from ..feature.matcher import FeatureMatcher
from ..mapping.keyframe import KeyframeState, keyframe_step
from ..odometry.camera import CameraIntrinsics
from ..odometry.pose import estimate_relative_pose
from ..odometry.trajectory import compose_relative_transforms
from ..ops.lie import se3_matrix
from .mesh import DATA_AXIS, SEQ_AXIS
from ..pipeline.vo import VoConfig

__all__ = ["sharded_vo_step", "ShardedVoResult"]


class ShardedVoResult(NamedTuple):
    rotations: jnp.ndarray  # [B, T, 3, 3] per-frame relative pose (frame t vs t-1)
    translations: jnp.ndarray  # [B, T, 3]
    success: jnp.ndarray  # [B, T] bool (frame 0 of each sequence is False)
    is_keyframe: jnp.ndarray  # [B, T] bool
    positions: jnp.ndarray  # [B, T, 3] trajectory positions (reference composition)
    num_matches: jnp.ndarray  # [B, T] int32


def _local_vo(frames, keys, intrinsics, config, halo_feats, is_first_shard,
              halo_frame=None):
    """Per-shard, per-sequence VO over [T_local] frames.

    halo_feats: features of the left neighbor's last frame (garbage on the
    first seq shard — masked via is_first_shard). halo_frame: that frame's
    pixels (same masking), for sub-pixel match refinement parity with the
    serial pipeline.
    """
    matcher = FeatureMatcher()
    feats = detect_and_compute(frames, config.orb)  # [T_local, K, ...]
    prev = jax.tree_util.tree_map(
        lambda h, f: jnp.concatenate([h[None], f[:-1]], axis=0), halo_feats, feats
    )

    # Same bits-based matching path as pipeline/vo.vo_frontend (unpack once
    # per frame; identical arithmetic keeps sharded == serial).
    from ..ops.hamming import descriptor_bits

    q_bits, q_pops = descriptor_bits(prev.descriptors)
    t_bits, t_pops = descriptor_bits(feats.descriptors)

    good = jax.vmap(
        lambda qb, qp, m1, tb, tp, m2: matcher.filter_good_matches(
            matcher.match_from_bits(qb, qp, m1, tb, tp, m2), config.match_ratio
        )
    )(q_bits, q_pops, prev.mask, t_bits, t_pops, feats.mask)

    pts1 = prev.xy
    pts2 = jnp.take_along_axis(feats.xy, good.train_idx[..., None], axis=1)
    num_good = jnp.sum(good.mask.astype(jnp.int32), axis=-1)
    enough = num_good >= config.min_matches

    # Identical accuracy stages to pipeline/vo.vo_frontend (sharded == serial):
    # sub-pixel SSD refinement, then per-octave sigma for the pose solver.
    if config.refine_matches and halo_frame is not None:
        from ..ops.patch_refine import refine_matches

        prev_imgs = jnp.concatenate([halo_frame[None], frames[:-1]], axis=0)
        pts2 = jax.vmap(
            lambda a, b, p1, p2, m: refine_matches(
                a, b, p1, p2, m, radius=config.refine_radius, search=config.refine_search
            )
        )(prev_imgs, frames, pts1, pts2, good.mask)

    if config.ransac.octave_sigma:
        oct2 = jnp.take_along_axis(feats.octave, good.train_idx, axis=1)
        sigma = jnp.asarray(config.orb.scale_factor, pts1.dtype) ** jnp.maximum(
            prev.octave, oct2
        ).astype(pts1.dtype)
    else:
        sigma = jnp.ones_like(pts1[..., 0])

    poses = jax.vmap(
        lambda k, p1, p2, m, s: estimate_relative_pose(
            k, intrinsics, p1, p2, mask=m, config=config.ransac, sigma=s
        )
    )(keys, pts1, pts2, good.mask, sigma)

    # Pair 0 of the first shard has no real predecessor.
    t_idx = jnp.arange(frames.shape[0])
    valid_pair = ~(is_first_shard & (t_idx == 0))
    success = poses.valid & enough & valid_pair

    return poses, success, num_good, feats


def _keyframe_scan_exact(config, rotations, translations, num_good, success, seq_rank):
    """Cross-shard-exact keyframe decisions for this shard's frames.

    The selector state must thread serially through the WHOLE sequence, but
    its per-frame inputs are ~14 floats: gather them along `seq`, scan the
    full sequence on every shard (redundant, negligible), slice the local
    piece. Identical arithmetic to pipeline/vo.vo_frontend's scan, so the
    sharded pipeline reproduces the serial keyframe schedule for EVERY
    KeyframeConfig, including max_frames/ratio-driven ones.
    """
    t_local = success.shape[0]
    gathered = jax.lax.all_gather(
        (rotations, translations, num_good, success), SEQ_AXIS
    )  # [S, T_local, ...]
    full = jax.tree_util.tree_map(
        lambda x: x.reshape(-1, *x.shape[2:]), gathered
    )

    def kf_body(state, inp):
        rot, trans, n, ok = inp
        stepped, kf = keyframe_step(config.keyframe, state, rot, trans, n)
        state_out = jax.tree_util.tree_map(lambda a, b: jnp.where(ok, a, b), stepped, state)
        return state_out, kf & ok

    _, is_kf_full = jax.lax.scan(kf_body, KeyframeState.initial(), full)
    return jax.lax.dynamic_slice_in_dim(is_kf_full, seq_rank * t_local, t_local)


def sharded_vo_step(
    mesh,
    frames,
    keys,
    intrinsics: CameraIntrinsics,
    config: VoConfig = VoConfig(),
    return_features: bool = False,
):
    """Jit-compiled multi-chip VO over [B, T, H, W] frames.

    B shards over `data`, T over `seq`. keys: [B, T, 2] per-frame PRNG keys.
    Returns a fully-replicated-on-host ShardedVoResult; with
    `return_features=True` returns (result, features) where features is the
    per-frame OrbFeatures pytree ([B, T, K, ...], sharded like the frames) —
    the input the flagship mapping phase needs (parallel/flagship.py).
    """
    n_seq = mesh.shape[SEQ_AXIS]

    out_tree = ShardedVoResult(*range(6))
    if return_features:
        out_tree = (out_tree, 6)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, SEQ_AXIS), P(DATA_AXIS, SEQ_AXIS)),
        out_specs=jax.tree_util.tree_map(lambda _: P(DATA_AXIS, SEQ_AXIS), out_tree),
        check_vma=False,
    )
    def step(frames_shard, keys_shard):
        seq_rank = jax.lax.axis_index(SEQ_AXIS)
        is_first = seq_rank == 0

        def per_sequence(seq_frames, seq_keys):
            # Detect locally, then halo-exchange the LAST frame's features to
            # the right neighbor along the seq ring.
            feats = detect_and_compute(seq_frames[-1:], config.orb)
            last = jax.tree_util.tree_map(lambda x: x[0], feats)
            halo = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(
                    x[None],
                    SEQ_AXIS,
                    [(i, (i + 1) % n_seq) for i in range(n_seq)],
                )[0],
                last,
            )
            halo_frame = None
            if config.refine_matches:
                halo_frame = jax.lax.ppermute(
                    seq_frames[-1],
                    SEQ_AXIS,
                    [(i, (i + 1) % n_seq) for i in range(n_seq)],
                )
            poses, success, num_good, feats_all = _local_vo(
                seq_frames, seq_keys, intrinsics, config, halo, is_first, halo_frame
            )
            is_kf = _keyframe_scan_exact(
                config, poses.rotation, poses.translation, num_good, success, seq_rank
            )
            rel = se3_matrix(poses.rotation, poses.translation)
            rel = jnp.where(is_kf[:, None, None], rel, jnp.eye(4, dtype=rel.dtype))
            local_prefix = compose_relative_transforms(rel)  # [T_local, 4, 4]

            # Distributed prefix product along seq.
            local_total = local_prefix[-1]
            totals = jax.lax.all_gather(local_total, SEQ_AXIS)  # [S, 4, 4]

            def offset_body(carry, s):
                use = s < seq_rank
                carry = jnp.where(use, carry @ totals[s], carry)
                return carry, None

            offset, _ = jax.lax.scan(
                offset_body, jnp.eye(4, dtype=local_prefix.dtype), jnp.arange(n_seq)
            )
            global_prefix = jnp.einsum("ij,tjk->tik", offset, local_prefix)
            positions = global_prefix[:, :3, 3]
            result = ShardedVoResult(
                rotations=poses.rotation,
                translations=poses.translation,
                success=success,
                is_keyframe=is_kf,
                positions=positions,
                num_matches=num_good,
            )
            return (result, feats_all) if return_features else result

        return jax.vmap(per_sequence)(frames_shard, keys_shard)

    return step(frames, keys)
