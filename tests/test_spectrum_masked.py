"""Power-spectrum + masked-encoder + h5-tools parity vs the reference
toolkit (src/mltools/utils/pk_utils.py, models/masked_encoder_model.py,
h5/h5_tools.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempo_tpu.analysis.spectrum import get_pk, pk_op, pk_rescale
from tempo_tpu.models.masked import MaskedEncoder, random_token_masks
from tempo_tpu.utils.h5 import repack, tree

torch = pytest.importorskip("torch")

REF_SRC = Path("/root/reference/src")
ref_available = REF_SRC.exists()
if ref_available and str(REF_SRC) not in sys.path:
    sys.path.insert(0, str(REF_SRC))

needs_ref = pytest.mark.skipif(not ref_available,
                               reason="reference tree not mounted")


@needs_ref
@pytest.mark.parametrize("dim", [2, 3])
def test_pk_op_and_get_pk_parity(dim):
    from mltools.utils import pk_utils as ref_pk

    n = 16 if dim == 2 else 8
    ks_ref, pkop_ref = ref_pk.get_ks_pkop(n, dim)
    op = pk_op(n, dim)
    np.testing.assert_allclose(np.asarray(op.ks),
                               ks_ref.numpy().astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(op.weight),
                               pkop_ref.to_dense().numpy(), atol=1e-7)

    rng = np.random.default_rng(0)
    shape = (2, 3, n, n) if dim == 2 else (2, 3, n, n, n)
    x = rng.standard_normal(shape).astype(np.float32)
    pks_ref = ref_pk.get_pk(torch.from_numpy(x), pkop_ref).numpy()
    # NCHW -> channel-last
    x_cl = np.moveaxis(x, 1, -1)
    pks = get_pk(jnp.asarray(x_cl), op)
    np.testing.assert_allclose(np.asarray(pks), pks_ref, rtol=2e-4,
                               atol=1e-3)


@needs_ref
def test_pk_rescale_parity():
    from mltools.utils import pk_utils as ref_pk

    n = 16
    _, pkop = ref_pk.get_ks_pkop(n, 2)
    _, pkop_bc = ref_pk.get_ks_pkop(n, 2, broadcast_op=True)
    op = pk_op(n, 2)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, n, n)).astype(np.float32)
    xt = torch.from_numpy(x)
    pks_ref = ref_pk.get_pk(xt, pkop)
    target = pks_ref * 2.0
    out_ref = ref_pk.pk_rescale(xt, pks_ref, target, pkop_bc).numpy()

    x_cl = jnp.asarray(np.moveaxis(x, 1, -1))
    pks = get_pk(x_cl, op)
    out = pk_rescale(x_cl, pks, pks * 2.0, op)
    np.testing.assert_allclose(np.asarray(out), np.moveaxis(out_ref, 1, -1),
                               atol=2e-4, rtol=1e-3)


def test_pk_rescale_hits_target_spectrum():
    """Doubling the target power doubles the measured spectrum (away from
    the zeroed DC/row-0 factor quirk)."""
    n = 32
    op = pk_op(n, 2)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, n, n, 2)).astype(np.float32))
    pks = get_pk(x, op)
    out = pk_rescale(x, pks, pks * 4.0, op)
    pks_out = get_pk(out, op)
    # channel 0 has the rescaler[:,0,0]=0 quirk; check channel 1, bins >=1
    ratio = np.asarray(pks_out)[0, 1, 1:] / np.asarray(pks)[0, 1, 1:]
    np.testing.assert_allclose(ratio, 4.0, rtol=1e-3)


@needs_ref
@pytest.mark.parametrize("mask_channels,input_mask",
                         [(None, False), ([True, False, True], False),
                          (None, True)])
def test_masked_encoder_loss_parity(mask_channels, input_mask):
    from mltools.models.masked_encoder_model import (
        MaskedEncoder as RefMasked,
    )

    b, t, c = 4, 6, 3
    rng = np.random.default_rng(3)
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    masks = rng.random((b, t)) < 0.4
    # with input_mask the net is shape-preserving over c+1 channels and the
    # wrapper strips the appended mask channel from the prediction
    cin = c + 1 if input_mask else c
    w = rng.standard_normal((cin, cin)).astype(np.float32) * 0.3

    class TorchNet(torch.nn.Module):
        def forward(self, data):
            return data["x"] @ torch.from_numpy(w)

    ref = RefMasked(TorchNet(),
                    lambda bs: torch.from_numpy(masks),
                    mask_channels=mask_channels, input_mask=input_mask)
    loss_ref = ref.get_loss({"x": torch.from_numpy(x)})

    enc = MaskedEncoder(lambda xm: xm @ jnp.asarray(w),
                        mask_channels=mask_channels, input_mask=input_mask)
    loss = jax.jit(enc.get_loss)(jnp.asarray(x), jnp.asarray(masks))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-5)


def test_random_token_masks_fraction():
    masks = random_token_masks(jax.random.PRNGKey(0), 64, 64, 0.25)
    assert masks.shape == (64, 64) and masks.dtype == bool
    assert 0.15 < float(jnp.mean(masks)) < 0.35


def test_h5_repack_and_tree(tmp_path):
    p = str(tmp_path / "t.h5")
    with h5py.File(p, "w") as f:
        f.attrs["who"] = "tempo"
        # "gone" sits before "g/d" in the file, so deleting it leaves a
        # hole HDF5 cannot truncate away — only repack reclaims it
        f.create_dataset("gone", data=np.zeros(200_000, np.float64))
        g = f.create_group("g")
        g.attrs["k"] = 1
        g.create_dataset("d", data=np.zeros((4, 5), np.float32))
    with h5py.File(p, "a") as f:
        del f["gone"]
    before = Path(p).stat().st_size
    repack(p)
    after = Path(p).stat().st_size
    assert after < before / 2
    out = tree(p)
    assert "who: tempo" in out and "g/" in out
    assert "d: shape=(4, 5)" in out
    with h5py.File(p, "r") as f:
        assert f["g"].attrs["k"] == 1
        assert f["g/d"].shape == (4, 5)
