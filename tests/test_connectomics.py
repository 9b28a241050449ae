"""Connectomics segmentation-analysis tests.

Oracles: sklearn (mutual information -> VI identity), scipy.ndimage
(watershed_ift on clean basins, independent algorithm), and brute-force
numpy morphology for reconstruction/h-minima. The reference's own stack
(skimage/MATLAB, connectomics_tools.py) is unavailable here, so parity is
pinned at the mathematical-definition level rather than via imports.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.analysis.connectomics import (
    color_mask,
    error_map,
    get_seg,
    membrane_prob,
    relabel_consecutive,
    rescan_map,
    sample_patches,
    smart_rescan,
    vi,
    vi_from_seg,
)
from tempo_tpu.ops.morphology import (
    dilate3x3,
    erode3x3,
    hmin,
    label_components,
    reconstruct_by_erosion,
    regional_minima,
    watershed,
)


def _brute_reconstruct(marker, mask):
    """Definitional grayscale reconstruction by erosion (host loop)."""
    m = marker.astype(np.int64).copy()
    while True:
        p = np.pad(m, 1, constant_values=np.iinfo(np.int32).max)
        er = np.min(np.stack([p[di:di + m.shape[0], dj:dj + m.shape[1]]
                              for di in range(3) for dj in range(3)]), 0)
        new = np.maximum(er, mask)
        if np.array_equal(new, m):
            return m
        m = new


def test_erode_dilate_duality():
    rng = np.random.default_rng(0)
    im = rng.integers(0, 256, (12, 17)).astype(np.int32)
    er = np.asarray(erode3x3(jnp.asarray(im)))
    di = np.asarray(dilate3x3(jnp.asarray(im)))
    # erosion = -dilation of negation, and both bound the image
    np.testing.assert_array_equal(er, -np.asarray(dilate3x3(jnp.asarray(-im))))
    assert (er <= im).all() and (di >= im).all()


def test_reconstruction_matches_bruteforce():
    rng = np.random.default_rng(1)
    mask = rng.integers(0, 200, (20, 20)).astype(np.int32)
    marker = mask + rng.integers(0, 50, (20, 20)).astype(np.int32)
    got = np.asarray(reconstruct_by_erosion(jnp.asarray(marker),
                                            jnp.asarray(mask)))
    np.testing.assert_array_equal(got, _brute_reconstruct(marker, mask))


def test_hmin_suppresses_shallow_minima_only():
    im = np.full((16, 16), 100, np.int32)
    im[3, 3] = 97       # depth 3 < h: suppressed
    im[10:12, 10] = 60  # depth 40 >= h: kept, raised by h
    hm = np.asarray(hmin(jnp.asarray(im), 5))
    assert hm[3, 3] == 100
    assert hm[10, 10] == 65 and hm[11, 10] == 65
    minima = np.asarray(regional_minima(jnp.asarray(hm)))
    assert minima.sum() == 2 and minima[10, 10] and minima[11, 10]
    # brute-force definition: R_eps(f + h) over f
    np.testing.assert_array_equal(hm, _brute_reconstruct(im + 5, im))


def test_label_components_8_connectivity():
    mask = np.zeros((10, 10), bool)
    mask[1, 1] = mask[2, 2] = True          # diagonal touch: one component
    mask[6:8, 6:8] = True                   # block: one component
    mask[0, 9] = True                       # isolated: one component
    lab = np.asarray(label_components(jnp.asarray(mask)))
    assert (lab[~mask] == 0).all()
    ids = np.unique(lab[mask])
    assert len(ids) == 3
    assert lab[1, 1] == lab[2, 2]
    assert (lab[6:8, 6:8] == lab[6, 6]).all()


def test_watershed_two_basins_and_lines():
    im = np.full((24, 24), 50, np.int32)
    im[:, 11:13] = 90                       # ridge
    im[5, 4] = 3
    im[18, 20] = 7
    ws = np.asarray(watershed(jnp.asarray(im), lines=True))
    a, b = ws[5, 4], ws[18, 20]
    assert a > 0 and b > 0 and a != b
    assert (ws[:, :10] == a).all()
    assert (ws[:, 14:] == b).all()
    # line property: distinct basins are never 8-adjacent
    lab = ws
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            s = lab[max(di, 0):lab.shape[0] + min(di, 0),
                    max(dj, 0):lab.shape[1] + min(dj, 0)]
            t = lab[max(-di, 0):lab.shape[0] + min(-di, 0),
                    max(-dj, 0):lab.shape[1] + min(-dj, 0)]
            both = (s > 0) & (t > 0)
            assert (s[both] == t[both]).all()


def test_watershed_basins_match_voronoi_oracle():
    """Geometric oracle: on a distance-to-nearest-seed surface the basin of
    every pixel with an unambiguous nearest seed IS that seed's Voronoi
    cell (any correct watershed must agree; only equidistant ridge pixels
    are tie-broken). scipy.watershed_ift is NOT usable as an oracle here —
    its image-foresting-transform cost is path-based, not flooding."""
    from scipy import ndimage as ndi

    seeds = [(6, 6), (24, 25), (27, 4)]
    yy, xx = np.mgrid[0:32, 0:32]
    d = np.stack([np.hypot(yy - cy, xx - cx) for cy, cx in seeds])
    im = np.round(4 * d.min(axis=0)).astype(np.int32)

    ws = np.asarray(watershed(jnp.asarray(im), lines=False))
    minima = np.asarray(regional_minima(jnp.asarray(im)))
    _, n = ndi.label(minima, structure=np.ones((3, 3)))
    assert n == len(seeds) == len(np.unique(ws))

    nearest = d.argmin(axis=0)
    margin = np.sort(np.round(4 * d), axis=0)
    unambiguous = (margin[1] - margin[0]) >= 2
    assert unambiguous.mean() > 0.8
    seed_label = {k: ws[c] for k, c in enumerate(seeds)}
    assert len(set(seed_label.values())) == n
    expect = np.vectorize(seed_label.get)(nearest)
    np.testing.assert_array_equal(ws[unambiguous], expect[unambiguous])


def test_vi_matches_sklearn_identity():
    from sklearn.metrics import mutual_info_score

    rng = np.random.default_rng(4)
    a = rng.integers(0, 7, 5000)
    b = rng.integers(0, 5, 5000)
    total, vs, vm, splitters, mergers = vi(a, b)

    def ent(x):
        _, c = np.unique(x, return_counts=True)
        p = c / len(x)
        return float(-(p * np.log(p)).sum())

    mi = mutual_info_score(a, b)
    np.testing.assert_allclose(total, ent(a) + ent(b) - 2 * mi, rtol=1e-10)
    np.testing.assert_allclose(vs, ent(a) - mi, rtol=1e-10)  # H(a|b)
    np.testing.assert_allclose(vm, ent(b) - mi, rtol=1e-10)  # H(b|a)
    # rankings are sorted descending and labeled with segment ids
    assert (np.diff(splitters[:, 0]) <= 1e-12).all()
    assert set(splitters[:, 1].astype(int)) == set(np.unique(b))
    assert set(mergers[:, 1].astype(int)) == set(np.unique(a))


def test_vi_split_merge_directions():
    gt = np.repeat([1, 2], 100)
    # prediction splits gt segment 1 into two pieces: pure split error
    pred_split = np.concatenate([np.full(50, 10), np.full(50, 11),
                                 np.full(100, 20)])
    total, vs, vm, splitters, _ = vi(pred_split, gt)
    assert vs > 0 and abs(vm) < 1e-12
    assert int(splitters[0, 1]) == 1  # the split gt segment ranks first
    # prediction merges both gt segments: pure merge error
    pred_merge = np.full(200, 7)
    total, vs, vm, _, mergers = vi(pred_merge, gt)
    assert vm > 0 and abs(vs) < 1e-12
    assert int(mergers[0, 1]) == 7
    # identical labelings (up to renaming) -> zero
    total, *_ = vi(gt * 13 + 1, gt)
    assert abs(total) < 1e-12


def _membrane_image(seed=0, size=48, cells=((12, 12), (12, 34), (34, 22))):
    """Synthetic membrane-probability image: bright ridges between cells."""
    yy, xx = np.mgrid[0:size, 0:size]
    d = np.stack([np.hypot(yy - cy, xx - cx) for cy, cx in cells])
    nearest = np.sort(d, axis=0)
    # high where equidistant from two cells (membrane), low in interiors
    memb = np.clip(200 - 18 * (nearest[1] - nearest[0]), 10, 200)
    return memb.astype(np.int32)


def test_get_seg_counts_cells():
    mb = _membrane_image()
    seg = get_seg(mb, mb_thres=155, minsupp=40)
    ids = np.unique(seg)
    assert 0 in ids and len(ids) == 4  # 3 cells + membrane/lines
    # each seeded cell center belongs to a distinct cell
    centers = [(12, 12), (12, 34), (34, 22)]
    got = {seg[c] for c in centers}
    assert 0 not in got and len(got) == 3
    # membrane pixels (high prob) are label 0
    assert (seg[mb > 170] == 0).all()


def test_vi_from_seg_ignores_dilated_membrane():
    mb = _membrane_image()
    seg = get_seg(mb, mb_thres=155, minsupp=40)
    total, vs, vm, *_ = vi_from_seg(seg, seg, gt_dilation=5)
    assert abs(total) < 1e-12


def test_error_map_flags_merge_region():
    sm = _membrane_image()                       # slow scan: 3 cells
    fm = sm.copy()
    # fast scan misses the membrane between cells 1 and 2 -> merge error
    memb12 = (sm > 155) & (np.mgrid[0:48, 0:48][0] < 24)
    fm[memb12] = 30
    err, total, vs, vm = error_map(fm, sm, minsupp=40, rm_bounds=0)
    assert total > 0.05
    assert err.dtype == np.uint8 and set(np.unique(err)) <= {0, 255}
    assert err.any(), "disagreement must be flagged"
    # identical scans -> no error anywhere
    err0, total0, *_ = error_map(sm, sm, minsupp=40, rm_bounds=0)
    assert total0 < 1e-9 and not err0.any()


def test_relabel_consecutive():
    lab = np.array([[0, 5, 5], [9, 0, 5]])
    out = relabel_consecutive(lab)
    assert (out == np.array([[0, 1, 1], [2, 0, 1]])).all()
    nolines = relabel_consecutive(np.array([[7, 7], [3, 3]]))
    assert set(np.unique(nolines)) == {1, 2}


def test_rescan_map_and_smart_rescan():
    rng = np.random.default_rng(5)
    prob = rng.random((64, 64)).astype(np.float32)
    m = rescan_map(prob, 0.25)
    frac = m.mean()
    assert 0.2 <= frac <= 0.3
    assert prob[m].min() >= prob[~m].max() - 1e-6  # top-quantile selection
    assert not rescan_map(prob, 0.0).any()
    fast = np.zeros((64, 64), np.uint8)
    slow = np.full((64, 64), 255, np.uint8)
    mock = smart_rescan(fast, slow, m)
    assert (mock[m] == 255).all() and (mock[~m] == 0).all()


def test_membrane_prob_unet_shapes():
    import jax

    from tempo_tpu.nn.unet import CUNet

    net = CUNet(shape=(16, 16, 1), out_channels=1, chs=(8, 12),
                norm_groups=4, n_attention_heads=2, dropout_prob=0.0)
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 16, 1)))["params"]
    apply_fn = lambda p, x: net.apply({"params": p}, x)
    em = (np.random.default_rng(6).random((30, 29)) * 255).astype(np.uint8)
    prob = membrane_prob(apply_fn, params, em, levels=1)
    assert prob.shape == em.shape and prob.dtype == np.uint8
    probf = membrane_prob(apply_fn, params, em, levels=1,
                          return_dtype=np.float32)
    assert probf.shape == em.shape
    assert (probf >= 0).all() and (probf <= 1).all()


def test_sample_patches_augment():
    rng = np.random.default_rng(7)
    image = rng.integers(0, 255, (100, 120)).astype(np.uint8)
    mask = (image > 128).astype(np.uint8) * 255
    ims, mks = sample_patches(image, mask, n_samples=8, patch_size=32,
                              seed=1)
    assert ims.shape == (8, 32, 32) and mks.shape == (8, 32, 32)
    assert ims.dtype == np.float32 and 0.0 <= ims.min() <= ims.max() <= 1.0
    # image/mask stay aligned through the joint augmentation
    for k in range(8):
        np.testing.assert_array_equal(mks[k] > 0, ims[k] > 128 / 255)


def test_color_mask():
    mask = np.zeros((4, 4), np.uint8)
    mask[1, 1] = 255
    rgba = color_mask(mask)
    assert rgba.shape == (4, 4, 4)
    np.testing.assert_allclose(rgba[1, 1], [1.0, 0.0, 1.0, 0.5])
    assert (rgba[0, 0] == 0).all()
