"""Reverse conversion: our variables → reference-named torch state dicts.

Strongest check: export our randomly-initialized head and load it into
the ACTUAL reference head module with strict=True, then compare forwards.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

from seghiero_tpu.models.heads import SepASPPContrastHead
from seghiero_tpu.models.resnet import ResNetBackbone
from seghiero_tpu.models.torch_convert import (
    export_reference_backbone,
    export_reference_head,
    import_reference_head,
    import_torchvision_backbone,
)

sys.path.insert(0, "/root/reference")


def test_head_export_loads_into_reference_and_matches(rng):
    from models.head.sep_aspp_contrast_head import (
        DepthwiseSeparableASPPContrastHead as RefHead,
    )

    ours = SepASPPContrastHead(
        num_classes=13,
        c1_channels=8,
        aspp_channels=16,
        dilations=(1, 2, 3, 4),
        proj_dim=8,
        proj_type="convmlp",
    )
    c1 = rng.standard_normal((2, 16, 16, 16)).astype(np.float32)
    c4 = rng.standard_normal((2, 4, 4, 32)).astype(np.float32)
    variables = ours.init(
        jax.random.key(3), [jnp.asarray(c1), None, None, jnp.asarray(c4)], train=False
    )
    variables = jax.device_get(variables)

    sd = export_reference_head(
        variables["params"], variables["batch_stats"], "convmlp"
    )
    ref = RefHead(
        in_channels=32,
        c1_in_channels=16,
        c1_channels=8,
        aspp_channels=16,
        dilations=(1, 2, 3, 4),
        num_classes=13,
        proj_dim=8,
        proj_type="convmlp",
    )
    ref.load_state_dict(sd, strict=True)  # every key must line up
    ref.eval()

    out_logits, out_emb = ours.apply(
        variables, [jnp.asarray(c1), None, None, jnp.asarray(c4)], train=False
    )
    with torch.no_grad():
        ref_logits, ref_emb = ref(
            [
                torch.from_numpy(np.moveaxis(c1, -1, 1)),
                None,
                None,
                torch.from_numpy(np.moveaxis(c4, -1, 1)),
            ]
        )
    np.testing.assert_allclose(
        np.asarray(out_logits), np.moveaxis(ref_logits.numpy(), 1, -1),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_emb), np.moveaxis(ref_emb.numpy(), 1, -1), rtol=1e-4, atol=1e-4
    )


def test_backbone_export_import_roundtrip():
    bb = ResNetBackbone(depth=18)
    variables = jax.device_get(
        bb.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    )
    sd = export_reference_backbone(
        variables["params"], variables["batch_stats"], 18
    )
    p2, s2 = import_torchvision_backbone(sd, 18)
    def flat(tree):
        return sorted(
            (str(k), v) for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        )

    for (ka, a), (kb, b) in zip(flat(variables["params"]), flat(p2)):
        assert ka == kb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
