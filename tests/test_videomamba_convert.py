"""VideoMamba checkpoint-converter contract tests.

The reference loads the external (non-vendored) VideoMamba package's
checkpoints through /root/reference/models/backbones/mamba.py:36-133:
model-key unwrap, 'backbone.'/'encoder.' prefix strip, head removal,
spatial pos-embed bicubic interpolation and temporal linear interpolation.
No torch-side oracle of the bimamba forward exists (the package is not
vendored), so these tests pin the *converter contract*: the converted tree
must cover the flax param tree exactly (every leaf, right shapes, layout
rules inverted correctly) and the interpolation must follow the reference
semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from class_query_vad_tpu.models.videomamba import VideoMamba
from class_query_vad_tpu.utils.checkpoint_convert import (
    _interp_mamba_pos_embed,
    _interp_mamba_temporal,
    convert_videomamba,
    convert_videomamba_pretrain,
    strip_mamba_prefixes,
)

DEPTH, EMBED, T, HW = 2, 64, 4, (32, 32)


def _small_model_params():
    model = VideoMamba(embed_dim=EMBED, depth=DEPTH, num_frames=T,
                       patch_size=16)
    px = jnp.zeros((1, T, HW[0], HW[1], 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), px)
    return model, params["params"]


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def _synthetic_sd(flax_tree, rng):
    """Invert the converter's layout rules: derive an external-named torch
    state_dict whose conversion must exactly reproduce the flax tree."""
    sd = {}
    for path, leaf in _flatten(flax_tree).items():
        parts = path.split("/")
        torch_name = ".".join(parts)
        val = rng.normal(size=leaf.shape).astype(np.float32)
        if parts[-1] == "kernel":
            base = ".".join(parts[:-1])
            if "patch_embed" in path:                   # conv3d
                sd[f"{base}.proj.weight"] = val.transpose(4, 3, 0, 1, 2)
            elif "conv1d" in parts[-2]:                 # depthwise conv1d
                sd[f"{base}.weight"] = val.transpose(2, 1, 0)
            else:                                       # dense
                sd[f"{base}.weight"] = val.T
        elif parts[-1] == "scale":
            sd[".".join(parts[:-1]) + ".weight"] = val
        elif parts[-1] == "bias" and parts[-2] in ("norm", "norm_f"):
            sd[".".join(parts[:-1]) + ".bias"] = val
        elif parts[-1] == "bias" and "patch_embed" in path:
            sd[".".join(parts[:-1]) + ".proj.bias"] = val
        elif parts[-1].endswith("_kernel"):             # dt_proj{,_b}_kernel
            sd[".".join(parts[:-1] + [parts[-1][:-7]]) + ".weight"] = val.T
        elif parts[-1].endswith("_bias"):
            sd[".".join(parts[:-1] + [parts[-1][:-5]]) + ".bias"] = val
        elif parts[-1] == "bias":
            sd[".".join(parts[:-1]) + ".bias"] = val
        else:                                           # raw params
            sd[torch_name] = val
    return {k.replace("layers_", "layers."): v for k, v in sd.items()}


def test_converter_covers_tree_exactly():
    _, flax_params = _small_model_params()
    sd = _synthetic_sd(flax_params, np.random.default_rng(0))
    tree = {}
    convert_videomamba(sd, tree, "m", depth=DEPTH)
    got = _flatten(tree["m"])
    want = _flatten(flax_params)
    assert set(got) == set(want)
    for k in want:
        assert got[k].shape == want[k].shape, k


def test_layout_rules_inverted():
    _, flax_params = _small_model_params()
    sd = _synthetic_sd(flax_params, np.random.default_rng(1))
    tree = {}
    convert_videomamba(sd, tree, "m", depth=DEPTH)
    mx = tree["m"]["layers_0"]["mixer"]
    np.testing.assert_array_equal(
        mx["in_proj"]["kernel"], sd["layers.0.mixer.in_proj.weight"].T
    )
    np.testing.assert_array_equal(
        mx["conv1d_b"]["kernel"],
        sd["layers.0.mixer.conv1d_b.weight"].transpose(2, 1, 0),
    )
    np.testing.assert_array_equal(
        mx["dt_proj_b_kernel"], sd["layers.0.mixer.dt_proj_b.weight"].T
    )
    np.testing.assert_array_equal(mx["A_b_log"], sd["layers.0.mixer.A_b_log"])


def test_prefix_strip_and_head_removal():
    sd = {
        "backbone.pos_embed": np.zeros((1, 5, 8)),
        "encoder.cls_token": np.zeros((1, 1, 8)),
        "head.weight": np.zeros((10, 8)),
        "head.bias": np.zeros((10,)),
        "norm_f.weight": np.ones((8,)),
    }
    out = strip_mamba_prefixes(sd)
    assert set(out) == {"pos_embed", "cls_token", "norm_f.weight"}


def test_spatial_interpolation_semantics():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    c = 8
    pos = rng.normal(size=(1, 1 + 14 * 14, c)).astype(np.float32)

    # same grid: no-op
    np.testing.assert_array_equal(_interp_mamba_pos_embed(pos, 14 * 14), pos)

    out = _interp_mamba_pos_embed(pos, 16 * 16)
    assert out.shape == (1, 1 + 16 * 16, c)
    # cls token untouched (mamba.py:104: only position tokens interpolated)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])
    # bit-faithful to the reference's torch call
    want = torch.nn.functional.interpolate(
        torch.from_numpy(pos[:, 1:]).reshape(1, 14, 14, c).permute(0, 3, 1, 2),
        size=(16, 16), mode="bicubic", align_corners=False,
    ).permute(0, 2, 3, 1).reshape(1, 256, c).numpy()
    np.testing.assert_array_equal(out[:, 1:], want)


def test_temporal_interpolation_semantics():
    pytest.importorskip("torch")
    c = 6
    # a linear ramp stays linear in the interior under align_corners=False
    ramp = np.linspace(0.0, 1.0, 8, dtype=np.float32)
    tpe = np.tile(ramp[None, :, None], (1, 1, c))
    np.testing.assert_array_equal(_interp_mamba_temporal(tpe, 8), tpe)
    out = _interp_mamba_temporal(tpe, 16)
    assert out.shape == (1, 16, c)
    diffs = np.diff(out[0, 2:-2, 0])
    np.testing.assert_allclose(diffs, diffs[0], atol=1e-6)


def test_pretrain_fragment_loads_into_model():
    """convert_videomamba_pretrain output merges into a freshly initialized
    model with zero skips, and the model forward still runs."""
    model, flax_params = _small_model_params()
    sd = _synthetic_sd(flax_params, np.random.default_rng(3))
    sd = {f"backbone.{k}": v for k, v in sd.items()}     # pretrain prefixing
    sd["head.weight"] = np.zeros((400, EMBED), np.float32)
    sd["head.bias"] = np.zeros((400,), np.float32)
    frag = convert_videomamba_pretrain(
        sd, depth=DEPTH, num_frames=T, num_patches=(HW[0] // 16) * (HW[1] // 16)
    )
    got = _flatten(frag["backbone"])
    want = _flatten(flax_params)
    assert set(got) == set(want)
    scaled = {"params": jax.tree_util.tree_map(jnp.asarray, frag["backbone"])}
    px = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, T, HW[0], HW[1], 3)),
        jnp.float32,
    )
    tokens, summary = model.apply(scaled, px)
    assert np.isfinite(np.asarray(tokens)).all()
    assert summary.shape == (1, T, EMBED)
