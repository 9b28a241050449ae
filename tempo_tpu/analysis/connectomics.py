"""Connectomics-style segmentation analysis: watershed cells, VI metrics,
error maps, smart-rescan planning, and EM patch sampling.

Capability parity with the reference's vendored toolkit
(reference: src/mltools/connectomics/connectomics_tools.py and
ConnectomicsDataset.py), redesigned for this framework:

- The image-morphology compute (h-minima, watershed) runs ON DEVICE through
  the jittable stencil kernels in `tempo_tpu.ops.morphology` — the
  reference calls skimage/MATLAB on the host (connectomics_tools.py:101-122).
- Membrane-probability inference (`membrane_prob`) pads to the UNet's
  stride multiple and runs one jitted forward of `nn.unet.CUNet`, replacing
  the torch nets (`EM2MBNet.get_mb`, connectomics_tools.py:518-529).
- The variation-of-information analysis (`vi`, `vi_from_seg`, `error_map`)
  is host-side numpy — label bookkeeping over dynamic segment counts is
  unique/scatter work, not MXU work (same split as `analysis.probes`).
- The reference's threshold *search* for a rescan budget
  (`SmartEM.get_rescan_map`, connectomics_tools.py:656-668) is replaced by
  a direct quantile.

No skimage/MATLAB dependency: everything here needs only numpy + the
in-repo ops (scipy only in tests, as an independent oracle).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tempo_tpu.ops.morphology import dilate3x3, hmin, watershed

# ---------------------------------------------------------------------------
# segmentation


def get_seg(mb_prob: np.ndarray, mb_thres: int = 155,
            minsupp: int = 77) -> np.ndarray:
    """Cell segmentation from a uint8-scale membrane-probability image.

    Suppress minima shallower than `minsupp`, watershed with lines, then
    zero every pixel whose suppressed membrane probability exceeds
    `mb_thres` (reference: connectomics_tools.py:114-122, same defaults as
    get_error_map's minsupp=int(0.3*255)).
    """
    mb = np.asarray(mb_prob)
    if mb.ndim != 2:
        raise ValueError(f"mb_prob must be [H, W], got {mb.shape}")
    if mb.min() < 0 or int(mb.max()) + int(minsupp) >= 32768:
        raise ValueError("mb_prob + minsupp must stay below 32768 (the "
                         "watershed's integer headroom); pass uint8-scale "
                         "membrane probabilities")
    labels, _ = _seg_device(jnp.asarray(mb, jnp.int32), int(mb_thres),
                            int(minsupp))
    return np.asarray(labels)


@jax.jit
def _hmin_j(mb, minsupp):
    return hmin(mb, minsupp)


def _seg_device(mb: jnp.ndarray, mb_thres: int,
                minsupp: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    mb_hmin = _hmin_j(mb, jnp.int32(minsupp))
    labels = watershed(mb_hmin, lines=True)
    return jnp.where(mb_hmin > mb_thres, 0, labels), mb_hmin


def relabel_consecutive(labels: np.ndarray) -> np.ndarray:
    """Map arbitrary nonneg label ids to consecutive 0..K (0 stays 0)."""
    labels = np.asarray(labels)
    ids = np.unique(labels)
    lut = np.zeros(ids.max() + 1, dtype=np.int32)
    lut[ids] = np.arange(len(ids), dtype=np.int32)
    out = lut[labels]
    if ids[0] != 0:  # no background present: shift to 1-based
        out += 1
    return out


# ---------------------------------------------------------------------------
# variation of information


def vi(labels: np.ndarray, labels_gt: np.ndarray):
    """Variation of information between two flat label arrays.

    Returns (vi, vi_split, vi_merge, splitters, mergers):
      vi_split = H(labels | labels_gt) — ground-truth segments split apart
        in the prediction; vi_merge = H(labels_gt | labels) — ground-truth
        segments merged together. splitters rows are
        [contribution, gt_label] sorted descending; mergers rows are
        [contribution, pred_label] — the same decomposition (and return
        order) as the reference's VI (connectomics_tools.py:330-373).
    """
    labels = np.asarray(labels).ravel()
    labels_gt = np.asarray(labels_gt).ravel()
    if labels.shape != labels_gt.shape:
        raise ValueError("label arrays must have equal size")
    n = labels.size
    a_ids, a_inv, a_cnt = np.unique(labels, return_inverse=True,
                                    return_counts=True)
    b_ids, b_inv, b_cnt = np.unique(labels_gt, return_inverse=True,
                                    return_counts=True)
    pair = a_inv.astype(np.int64) * len(b_ids) + b_inv
    pair_ids, pair_cnt = np.unique(pair, return_counts=True)
    i = (pair_ids // len(b_ids)).astype(np.int64)
    j = (pair_ids % len(b_ids)).astype(np.int64)

    p_ij = pair_cnt / n
    p_a = a_cnt / n
    p_b = b_cnt / n
    joint_ent = -p_ij * np.log(p_ij)  # per contingency cell

    # per-gt-segment: q_j * H(pred | gt=j) = sum_i -p_ij log p_ij + q_j log q_j
    split_each = np.zeros(len(b_ids))
    np.add.at(split_each, j, joint_ent)
    split_each += p_b * np.log(p_b)
    # per-pred-segment: p_i * H(gt | pred=i)
    merge_each = np.zeros(len(a_ids))
    np.add.at(merge_each, i, joint_ent)
    merge_each += p_a * np.log(p_a)

    vi_split = float(split_each.sum())
    vi_merge = float(merge_each.sum())
    order_b = np.argsort(split_each)[::-1]
    order_a = np.argsort(merge_each)[::-1]
    splitters = np.stack([split_each[order_b],
                          b_ids[order_b].astype(np.float64)], axis=1)
    mergers = np.stack([merge_each[order_a],
                        a_ids[order_a].astype(np.float64)], axis=1)
    return vi_split + vi_merge, vi_split, vi_merge, splitters, mergers


def vi_from_seg(seg: np.ndarray, seg_gt: np.ndarray,
                gt_dilation: int = 5):
    """VI restricted to pixels away from the ground-truth membrane.

    Dilates the GT membrane (label 0) by a `gt_dilation`-square structuring
    element and scores only the remaining support (reference:
    connectomics_tools.py:125-131).
    """
    seg_gt = np.asarray(seg_gt)
    membrane = jnp.asarray(seg_gt == 0, jnp.int32)
    # gt_dilation is an odd square size; k reps of 3x3 dilate = (2k+1)-square
    for _ in range(int(gt_dilation) // 2):
        membrane = dilate3x3(membrane)
    support = ~np.asarray(membrane, bool)
    return vi(np.asarray(seg)[support], seg_gt[support])


def error_map(fm_prob: np.ndarray, sm_prob: np.ndarray,
              mb_thres: int = 155, minsupp: int = 77,
              vi_thres: float = 1e-5, max_size: int = 200_000,
              rm_bounds: int = 5, mb_thres_low: int = 50):
    """Disagreement map between a fast-scan and a slow-scan segmentation.

    Segments both membrane-probability images, computes VI over their
    joint support (interiors only: excludes a `rm_bounds` border band
    around fast-scan membranes, oversized cells, and line pixels), then
    marks the pixels of every segment implicated in a split, merge, miss,
    or extra (reference behavior: connectomics_tools.py:134-257). Returns
    (error_map uint8 0/255, vi, vi_split, vi_merge).
    """
    fm = jnp.asarray(np.asarray(fm_prob), jnp.int32)
    sm = jnp.asarray(np.asarray(sm_prob), jnp.int32)
    fm_seg, fm_hmin = _seg_device(fm, mb_thres, minsupp)
    sm_seg, sm_hmin = _seg_device(sm, mb_thres, minsupp)
    fm_seg, sm_seg = np.asarray(fm_seg), np.asarray(sm_seg)
    fm_hmin, sm_hmin = np.asarray(fm_hmin), np.asarray(sm_hmin)

    # gt(slow) segments with no overlap vs any fast cell, and vice versa
    miss_cand = np.unique(sm_seg[(sm_seg > 0) & (fm_seg == 0)])
    misses = miss_cand[~np.isin(miss_cand, sm_seg[fm_seg > 0])]
    extra_cand = np.unique(fm_seg[(fm_seg > 0) & (sm_seg == 0)])
    extras = extra_cand[~np.isin(extra_cand, fm_seg[sm_seg > 0])]

    def _toobig(seg):
        ids, cnt = np.unique(seg, return_counts=True)
        big = ids[(cnt > max_size) & (ids != 0)]
        return np.isin(seg, big)

    support = (fm_seg > 0) & (sm_seg > 0) & ~_toobig(fm_seg) & ~_toobig(sm_seg)
    if rm_bounds > 0:
        interior = jnp.asarray(fm_seg > 0, jnp.int32)
        for _ in range(rm_bounds // 2):
            interior = -dilate3x3(-interior)  # binary erosion
        support &= np.asarray(interior, bool) & (sm_prob < mb_thres_low)

    total, vi_split, vi_merge, splitters, mergers = vi(
        fm_seg[support], sm_seg[support])

    i_splits = splitters[splitters[:, 0] > vi_thres, 1].astype(np.int64)
    i_merges = mergers[mergers[:, 0] > vi_thres, 1].astype(np.int64)
    err = np.zeros(fm_seg.shape, bool)
    err |= np.isin(sm_seg, i_splits) & (sm_hmin < mb_thres) & (fm_hmin > mb_thres)
    err |= np.isin(fm_seg, i_merges) & (sm_hmin > mb_thres) & (fm_hmin < mb_thres)
    err |= np.isin(sm_seg, misses) | np.isin(fm_seg, extras)
    err = np.asarray(dilate3x3(jnp.asarray(err, jnp.int32)), bool)
    return (err.astype(np.uint8) * 255), total, vi_split, vi_merge


# ---------------------------------------------------------------------------
# membrane inference + smart rescan


def membrane_prob(apply_fn, params, em: np.ndarray, levels: int = 2,
                  return_dtype=np.uint8) -> np.ndarray:
    """Membrane probability of an [H, W] EM image from a binary-output net.

    Normalizes integer images to [0, 1], pads reflectively to a multiple of
    2**levels (the UNet's downsampling stride), runs one jitted forward,
    takes a sigmoid, and crops back (reference: get_prob + EM2MBNet.get_mb,
    connectomics_tools.py:37-53, 518-529 — which softmaxes a 2-channel
    torch net; CUNet here emits one logit channel).
    """
    em = np.asarray(em)
    if np.issubdtype(em.dtype, np.integer):
        em = em.astype(np.float32) / np.iinfo(em.dtype).max
    h, w = em.shape
    s = 1 << levels
    ph, pw = (-h) % s, (-w) % s
    x = np.pad(em, ((0, ph), (0, pw)), mode="reflect")[None, ..., None]

    logits = _membrane_fwd(apply_fn, params, jnp.asarray(x, jnp.float32))
    prob = np.asarray(logits)[0, :h, :w, 0]
    if return_dtype == np.uint8:
        return np.clip(prob * 255.0, 0, 255).astype(np.uint8)
    return prob.astype(return_dtype)


@partial(jax.jit, static_argnums=0)
def _membrane_fwd(apply_fn, params, x):
    return jax.nn.sigmoid(apply_fn(params, x))


def rescan_map(error_prob: np.ndarray, rescan_frac: float) -> np.ndarray:
    """Boolean mask selecting the `rescan_frac` most error-prone pixels.

    Direct quantile of the error probabilities — the closed form of the
    reference's iterative threshold search (connectomics_tools.py:656-668).
    """
    error_prob = np.asarray(error_prob, np.float32)
    if not 0.0 <= rescan_frac <= 1.0:
        raise ValueError(f"rescan_frac must be in [0, 1]: {rescan_frac}")
    if rescan_frac == 0.0:
        return np.zeros(error_prob.shape, bool)
    thr = np.quantile(error_prob, 1.0 - rescan_frac)
    return error_prob >= thr


def smart_rescan(fast_em: np.ndarray, slow_em: np.ndarray,
                 mask: np.ndarray) -> np.ndarray:
    """Compose a mock acquisition: slow (high-quality) pixels where `mask`,
    fast pixels elsewhere (reference: SmartEM.smart_mock,
    connectomics_tools.py:614-645)."""
    fast_em, slow_em = np.asarray(fast_em), np.asarray(slow_em)
    if fast_em.shape != slow_em.shape or fast_em.shape != np.shape(mask):
        raise ValueError("fast_em, slow_em and mask must share a shape")
    return np.where(np.asarray(mask, bool), slow_em, fast_em)


# ---------------------------------------------------------------------------
# data: EM patch sampling (reference: ConnectomicsDataset.py:15-106)


def sample_patches(image: np.ndarray, mask: np.ndarray, n_samples: int,
                   patch_size: int = 256, seed: int = 0,
                   clahe_prob: float = 0.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Random augmented (image, mask) training patches from one EM section.

    Uniform random crops with random flip-h/flip-v/rot90 applied jointly to
    image and mask; optional CLAHE contrast augmentation on the image when
    cv2 is available. Returns float32 [N, P, P] images in [0, 1] and uint8
    masks.
    """
    image, mask = np.asarray(image), np.asarray(mask)
    if image.shape != mask.shape:
        raise ValueError("image and mask must share a shape")
    if min(image.shape) < patch_size:
        raise ValueError(f"patch_size {patch_size} exceeds image "
                         f"{image.shape}")
    rng = np.random.default_rng(seed)
    clahe = None
    if clahe_prob > 0.0:
        import cv2

        clahe = cv2.createCLAHE(clipLimit=3).apply

    ims = np.empty((n_samples, patch_size, patch_size), np.float32)
    mks = np.empty((n_samples, patch_size, patch_size), np.uint8)
    for k in range(n_samples):
        i = int(rng.integers(0, image.shape[0] - patch_size + 1))
        j = int(rng.integers(0, image.shape[1] - patch_size + 1))
        im = image[i:i + patch_size, j:j + patch_size]
        mk = mask[i:i + patch_size, j:j + patch_size]
        if clahe is not None and rng.random() < clahe_prob:
            im8 = (np.clip(im.astype(np.float32) /
                           (im.max() if im.max() > 0 else 1), 0, 1)
                   * 255).astype(np.uint8)
            im = clahe(im8)
        if rng.random() < 0.5:
            im, mk = im[::-1], mk[::-1]
        if rng.random() < 0.5:
            im, mk = im[:, ::-1], mk[:, ::-1]
        rot = int(rng.integers(0, 4))
        im, mk = np.rot90(im, rot), np.rot90(mk, rot)
        imf = im.astype(np.float32)
        if np.issubdtype(np.asarray(im).dtype, np.integer):
            imf /= np.iinfo(np.asarray(im).dtype).max
        ims[k], mks[k] = imf, mk.astype(np.uint8)
    return ims, mks


def color_mask(mask: np.ndarray,
               rgba: Tuple[float, float, float, float] = (1.0, 0.0, 1.0, 0.5)
               ) -> np.ndarray:
    """uint8 [H, W] mask -> float RGBA overlay (reference:
    connectomics_tools.py:19-21)."""
    return (np.asarray(mask, np.float32) / 255.0)[..., None] * \
        np.asarray(rgba, np.float32)
