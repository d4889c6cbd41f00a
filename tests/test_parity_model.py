"""Golden parity: our flax model vs the PyTorch reference with IDENTICAL
weights (torch state_dict converted via utils.checkpoint_convert).

The reference's CUDA deformable-attention kernel is replaced by a pure-torch
trilinear sampler implementing the same contract
(ops/src/cuda/ms_deform_im2col_cuda_t.cuh:34-115), which lets the ENTIRE
reference model run on CPU — full-forward activation parity is the oracle
for f-mAP parity (SURVEY.md §7.3 item 3).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from class_query_vad_tpu.config import get_cfg_custom
from class_query_vad_tpu.models import build_model
from class_query_vad_tpu.models.position_encoding import position_embedding_sine_3d
from class_query_vad_tpu.utils.checkpoint_convert import convert_detr_checkpoint

from reference_oracle import install_reference

install_reference(need_model_stubs=True)


def _torch_ms_deform_attn_3d(value, spatial_shapes, level_start_index,
                             sampling_locations, attention_weights, im2col_step):
    """Pure-torch 3D trilinear sampling with the CUDA kernel's contract."""
    n, s, nh, d = value.shape
    _, q, _, nl, np_, _ = sampling_locations.shape
    out = value.new_zeros(n, q, nh, d)
    start = 0
    for l in range(nl):
        t, h, w = [int(x) for x in spatial_shapes[l]]
        vol = value[:, start : start + t * h * w].reshape(n, t, h, w, nh, d)
        loc = sampling_locations[:, :, :, l]            # [N, Q, nh, P, 3]
        wgt = attention_weights[:, :, :, l]             # [N, Q, nh, P]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        tt = loc[..., 2] * t - 0.5
        inb = (tt > -1) & (y > -1) & (x > -1) & (tt < t) & (y < h) & (x < w)
        x0, y0, t0 = x.floor(), y.floor(), tt.floor()
        lx, ly, lt = x - x0, y - y0, tt - t0
        acc = value.new_zeros(n, q, nh, np_, d)
        for dt in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    ti = (t0 + dt).long()
                    yi = (y0 + dy).long()
                    xi = (x0 + dx).long()
                    ok = (
                        (ti >= 0) & (ti < t) & (yi >= 0) & (yi < h)
                        & (xi >= 0) & (xi < w)
                    )
                    cw = (
                        (lt if dt else 1 - lt)
                        * (ly if dy else 1 - ly)
                        * (lx if dx else 1 - lx)
                    ) * ok
                    tc = ti.clamp(0, t - 1)
                    yc = yi.clamp(0, h - 1)
                    xc = xi.clamp(0, w - 1)
                    flat = ((tc * h + yc) * w + xc)      # [N, Q, nh, P]
                    head_ids = torch.arange(nh).view(1, 1, nh, 1)
                    g = vol.reshape(n, -1, nh, d)[
                        torch.arange(n).view(n, 1, 1, 1), flat, head_ids
                    ]                                     # [N, Q, nh, P, d]
                    acc = acc + cw[..., None] * g
        out = out + (wgt[..., None] * (acc * 1.0)).sum(3) * 1.0
        start += t * h * w
    # match CUDA guard: entirely-outside points contribute 0 (cw already 0
    # there per corner; inb not needed beyond that)
    return out.reshape(n, q, nh * d)


class _FakeMSDAFunction:
    @staticmethod
    def apply(value, shapes, level_start_index, loc, weights, im2col_step):
        return _torch_ms_deform_attn_3d(value, shapes, level_start_index, loc,
                                        weights, im2col_step)


@pytest.fixture(scope="module")
def small_cfg():
    cfg = get_cfg_custom("/root/reference/configuration/AVA22_ViT-B.yaml")
    cfg.CONFIG.DATA.TEMP_LEN = 4
    cfg.CONFIG.MODEL.TEMP_LEN = 4
    cfg.CONFIG.ViT.DEPTH = 2
    cfg.CONFIG.ViT.USE_CHECKPOINT = False
    cfg.CONFIG.MODEL.ENC_LAYERS = 2
    cfg.CONFIG.MODEL.DEC_LAYERS = 2
    cfg.CONFIG.GRADIENT_CHECKPOINTING = False
    cfg.CONFIG.LOG.BASE_PATH = "/tmp"
    cfg.CONFIG.LOG.EXP_NAME = "parity"
    return cfg


@pytest.fixture(scope="module")
def ref_model(small_cfg):
    """Reference DETR on CPU with the CUDA kernel monkeypatched."""
    import models.backbones.vit as ref_vit
    import ops.functions.ms_deform_attn_func as ref_func
    import ops.modules.ms_deform_attn as ref_mod

    ref_vit.load_weights = lambda *a, **k: None
    ref_func.MSDeformAttnFunction = _FakeMSDAFunction
    ref_mod.MSDeformAttnFunction = _FakeMSDAFunction

    from models.model import build_model as ref_build_model

    torch.manual_seed(0)
    model, criterion, post = ref_build_model(small_cfg)
    model.eval()
    return model


def test_position_encoding_parity():
    from models.position_encoding import PositionEmbeddingSine_3D
    from utils.misc import NestedTensor

    mask = np.zeros((2, 4, 8, 10), bool)
    mask[0, :, 6:, :] = True
    mask[0, :, :, 7:] = True
    ref_pe = PositionEmbeddingSine_3D(256, normalize=True)
    with torch.no_grad():
        ref = ref_pe(
            NestedTensor(torch.zeros(2, 3, 4, 8, 10), torch.from_numpy(mask))
        ).numpy()                                        # [B, C, T, H, W]
    ours = np.asarray(position_embedding_sine_3d(jnp.asarray(mask), 256))
    ours = ours.transpose(0, 4, 1, 2, 3)
    assert np.allclose(ref, ours, atol=1e-5), np.abs(ref - ours).max()


def test_full_model_parity(small_cfg, ref_model):
    rng = np.random.default_rng(0)
    B, T, H, W = 2, 4, 64, 96
    pixels = rng.normal(size=(B, T, H, W, 3)).astype(np.float32)
    mask = np.zeros((B, H, W), bool)
    mask[1, 48:, :] = True
    mask[1, :, 80:] = True

    from utils.misc import NestedTensor

    with torch.no_grad():
        ref_out = ref_model(
            NestedTensor(
                torch.from_numpy(pixels.transpose(0, 4, 1, 2, 3)),
                torch.from_numpy(mask),
            )
        )

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params = convert_detr_checkpoint(sd, small_cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    model = build_model(small_cfg)
    out = jax.jit(model.apply, static_argnums=(3,))(
        params, jnp.asarray(pixels), jnp.asarray(mask), True
    )

    for key in ("pred_boxes", "pred_logits_b", "pred_logits"):
        ref_v = ref_out[key].numpy()
        our_v = np.asarray(out[key])
        assert ref_v.shape == our_v.shape, (key, ref_v.shape, our_v.shape)
        err = np.abs(ref_v - our_v).max()
        assert err < 2e-3, (key, err)
    for i, aux in enumerate(ref_out["aux_outputs"]):
        err = np.abs(aux["pred_boxes"].numpy()
                     - np.asarray(out["aux_outputs"][i]["pred_boxes"])).max()
        assert err < 2e-3, (i, err)


def test_full_model_parity_csn(small_cfg):
    """Same oracle with the CSN-50 backbone (CNN path: input projections,
    extra stride-2 level, BatchNorm-in-eval parity)."""
    import copy

    import models.backbones.ir_CSN_50 as ref_csn50
    import models.backbones.ir_CSN_152 as ref_csn152
    import ops.functions.ms_deform_attn_func as ref_func
    import ops.modules.ms_deform_attn as ref_mod

    ref_csn50.load_weights = lambda *a, **k: None
    ref_csn152.load_weights = lambda *a, **k: None
    ref_func.MSDeformAttnFunction = _FakeMSDAFunction
    ref_mod.MSDeformAttnFunction = _FakeMSDAFunction

    cfg = copy.deepcopy(small_cfg)
    cfg.CONFIG.MODEL.BACKBONE_NAME = "CSN-50"
    cfg.CONFIG.MODEL.PRETRAINED = False

    from models.model import build_model as ref_build_model

    torch.manual_seed(1)
    ref_model, _, _ = ref_build_model(cfg)
    ref_model.eval()
    # randomize BN running stats so the BN folding is actually exercised
    with torch.no_grad():
        for m in ref_model.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(1)
    B, T, H, W = 1, 4, 64, 96
    pixels = rng.normal(size=(B, T, H, W, 3)).astype(np.float32)
    mask = np.zeros((B, H, W), bool)
    mask[0, 48:, :] = True

    from utils.misc import NestedTensor

    with torch.no_grad():
        ref_out = ref_model(
            NestedTensor(
                torch.from_numpy(pixels.transpose(0, 4, 1, 2, 3)),
                torch.from_numpy(mask),
            )
        )

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_detr_checkpoint(sd, cfg)
    )
    model = build_model(cfg)
    out = jax.jit(model.apply, static_argnums=(3,))(
        params, jnp.asarray(pixels), jnp.asarray(mask), True
    )
    for key in ("pred_boxes", "pred_logits_b"):
        err = np.abs(ref_out[key].numpy() - np.asarray(out[key])).max()
        assert err < 5e-3, (key, err)


def test_load_detr_weights_transplant(small_cfg, ref_model, tmp_path):
    """Two-stage init (model_utils.py:17-99): stage-1 transformer weights
    transplant into a fresh init; refpoints reshape across modes."""
    import copy

    from class_query_vad_tpu.engine.checkpoint import load_detr_weights

    sd = {f"module.{k}": v for k, v in ref_model.state_dict().items()}
    ckpt_path = str(tmp_path / "stage1.pth")
    torch.save({"model": sd}, ckpt_path)

    model = build_model(small_cfg)
    pixels = jnp.zeros((1, 4, 64, 96, 3))
    mask = np.zeros((1, 64, 96), bool)
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(7), pixels, jnp.asarray(mask), True
    )
    params = jax.device_get(params)
    new_params = load_detr_weights(copy.deepcopy(params), ckpt_path, small_cfg)

    # decoder weights replaced by the donor's (converted) values
    donor_w = ref_model.state_dict()[
        "transformer.decoder.layers.0.ca_qcontent_proj.weight"
    ].numpy().T
    got = np.asarray(
        new_params["params"]["transformer"]["decoder"]["layers_0"][
            "ca_qcontent_proj"
        ]["kernel"]
    )
    assert np.allclose(got, donor_w)
    # refpoints transplanted too (same single-frame mode -> direct copy)
    assert np.allclose(
        np.asarray(new_params["params"]["refpoint_embed"]),
        ref_model.state_dict()["refpoint_embed.weight"].numpy(),
    )
    # backbone untouched
    assert np.allclose(
        np.asarray(new_params["params"]["backbone"]["body"]["norm"]["scale"]),
        np.asarray(params["params"]["backbone"]["body"]["norm"]["scale"]),
    )
