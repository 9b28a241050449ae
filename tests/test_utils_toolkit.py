"""Toolkit utils: publication plot styling (reference
mltools/plotting/niceplots.py) and device selection (reference
mltools/utils/cuda_tools.py, train_utils.get_device)."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import jax  # noqa: E402

from tempo_tpu.utils.devices import device_memory_summary, get_freer_device
from tempo_tpu.utils.figures import (RAMP_ANCHORS, apply_global_settings,
                                     apply_heatmap_style, apply_plot_style,
                                     linear_colors)


def test_linear_colors_ramp():
    cols = linear_colors(5)
    assert cols.shape == (5, 4)
    np.testing.assert_allclose(cols[0], RAMP_ANCHORS[0])
    np.testing.assert_allclose(cols[-1], RAMP_ANCHORS[1])
    # strictly monotone interpolation in each channel
    diffs = np.diff(cols, axis=0)
    assert (np.sign(diffs) == np.sign(diffs[0])).all()
    assert linear_colors(1).shape == (1, 4)


def test_apply_plot_style():
    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1])
    apply_plot_style(fig, ax, lw=2.5, labelsize=10)
    assert not ax.spines["top"].get_visible()
    assert not ax.spines["right"].get_visible()
    assert ax.spines["left"].get_linewidth() == 2.5
    assert ax.get_lines()[0].get_linewidth() == 2.5
    plt.close(fig)


def test_apply_heatmap_style():
    fig, ax = plt.subplots()
    ax.imshow(np.zeros((4, 4)))
    apply_heatmap_style(fig, ax, labelsize=12)
    assert all(not s.get_visible() for s in ax.spines.values())
    assert ax.xaxis.get_tick_params(which="major")["length"] == 0
    assert ax.xaxis.get_tick_params(which="minor")["length"] == 0
    plt.close(fig)


def test_apply_global_settings_roundtrip():
    before = dict(plt.rcParams)
    try:
        apply_global_settings(figsize=(4, 3), dpi=100, fontsize=11)
        assert plt.rcParams["figure.dpi"] == 100
        assert plt.rcParams["font.size"] == 11
    finally:
        plt.rcParams.update({k: before[k] for k in
                             ("figure.figsize", "figure.dpi", "font.size")})


def test_get_freer_device_deterministic():
    dev = get_freer_device(verbose=True)
    assert dev in jax.local_devices()
    # CPU mesh reports no memory stats -> tie -> lowest id wins
    if all(r["bytes_free"] is None for r in device_memory_summary()):
        assert dev.id == min(d.id for d in jax.local_devices())


def test_device_memory_summary_schema():
    recs = device_memory_summary()
    assert len(recs) == len(jax.local_devices())
    for rec in recs:
        assert {"id", "platform", "bytes_limit", "bytes_in_use",
                "bytes_free"} <= set(rec)
