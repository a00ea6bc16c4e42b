"""Numeric parity of the flax TinyViT-5M port against the exact-naming
torch stand-in (tests/_tinyvit_ref.py).

The reference consumes TinyViT through sam-hq's `vit_tiny` registry entry
(generate_ground_segmentations.py:14-18); no source or weights ship in this
image, so parity is against our independent torch implementation of the
published MobileSAM architecture — same policy as the GDINO stand-in.

Runs at a reduced 128px input (same dims/heads/windows; every code path —
MBConv stage, both strides of PatchMerging, window padding at 7 and 14,
bias tables, neck) for CPU speed.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from threedod.models.tinyvit import TinyViT
from threedod.utils.convert_weights import convert_tinyvit

IMG = 128


@pytest.fixture(scope="module")
def torch_model_and_params():
    from tests._tinyvit_ref import TinyViT as TorchTinyViT

    torch.manual_seed(0)
    m = TorchTinyViT()
    # randomize BN stats + bias tables so the fold is actually exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.2)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0, 0.2)
            if hasattr(mod, "attention_biases"):
                mod.attention_biases.normal_(0, 0.5)
    m.eval()
    sd = {f"image_encoder.{k}": v.detach().numpy() for k, v in m.state_dict().items()}
    params = convert_tinyvit(sd)
    return m, params


class TestTinyViTParity:
    def test_forward_matches_torch(self, torch_model_and_params):
        m, params = torch_model_and_params
        rng = np.random.RandomState(1)
        x = rng.randn(1, IMG, IMG, 3).astype(np.float32)

        with torch.no_grad():
            want = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

        model = TinyViT(img_size=IMG)
        got = jax.jit(
            lambda p, t: model.apply({"params": p}, t)
        )(jax.tree.map(jnp.asarray, params), jnp.asarray(x))
        got = np.asarray(got).transpose(0, 3, 1, 2)

        assert got.shape == want.shape == (1, 256, IMG // 16, IMG // 16)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)

    def test_every_encoder_key_consumed(self, torch_model_and_params):
        """The converter must consume the full image-encoder state dict —
        a silently-dropped tensor would wreck real-checkpoint loads."""
        m, params = torch_model_and_params
        sd_keys = {
            k for k, v in m.state_dict().items() if "attention_bias_idxs" not in k
        }
        n_tensors = sum(
            1 for _ in jax.tree.leaves(params)
        )
        # folded pairs: each Conv2d_BN (6 torch tensors incl.
        # num_batches_tracked) -> 2 flax tensors; everything else maps 1:1
        n_convbn = sum(1 for k in sd_keys if k.endswith(".c.weight"))
        expected = len(sd_keys) - n_convbn * 4
        assert n_tensors == expected

    def test_interm_feature_shape(self, torch_model_and_params):
        _, params = torch_model_and_params
        model = TinyViT(img_size=IMG)
        emb, interm = model.apply(
            {"params": jax.tree.map(jnp.asarray, params)},
            jnp.zeros((1, IMG, IMG, 3)), return_interm=True,
        )
        assert emb.shape == (1, IMG // 16, IMG // 16, 256)
        assert interm.shape == (1, IMG // 16, IMG // 16, 160)
