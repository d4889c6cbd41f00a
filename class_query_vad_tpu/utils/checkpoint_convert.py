"""Reference (PyTorch) checkpoint → flax param-tree conversion.

Maps the reference DETR state_dict names (see /root/reference/models/
model.py, dab_transformer.py, backbone_3d_builder.py, backbones/vit.py)
onto this framework's flax tree.  Layout rules:

* Linear  weight [O, I]            -> Dense kernel [I, O] (transpose)
* Conv3d  weight [O, I, t, h, w]   -> Conv kernel [t, h, w, I, O]
* Conv2d  weight [O, I, h, w]      -> Conv kernel [h, w, I, O]
* Conv2d 1x1 (cls k/v_proj)        -> Dense kernel [I, O]
* ConvTranspose3d [I, O, t, h, w]  -> ConvTranspose kernel [t, h, w, I, O]
  (flax's default transpose_kernel=False convention needs the kernel
  spatially FLIPPED relative to torch; with kernel==stride==(1,2,2) the
  flip is over the 2x2 spatial window)
* LayerNorm weight/bias            -> scale/bias

The class decoder layer's three registered conv_blocks share one module
object in the reference (dab_transformer.py:1017-1018) — conv_blocks.0
is taken; its unused ``q_proj`` is dropped.

Pure numpy in/out: pass ``state_dict`` as {name: np.ndarray}.  Use
``load_torch_state_dict`` to read .pth files (imports torch lazily).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("module", "model", "state_dict"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    out = {}
    for k, v in ckpt.items():
        k = k.replace("module.", "", 1) if k.startswith("module.") else k
        out[k] = v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def _set(tree: dict, path: str, value: np.ndarray):
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def _linear(tree, dst, sd, src, bias=True):
    _set(tree, f"{dst}/kernel", sd[f"{src}.weight"].T)
    if bias and f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _layernorm(tree, dst, sd, src):
    _set(tree, f"{dst}/scale", sd[f"{src}.weight"])
    _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _channel_ln(tree, dst, sd, src):
    # our ChannelLayerNorm nests a plain LayerNorm under LayerNorm_0
    _set(tree, f"{dst}/LayerNorm_0/scale", sd[f"{src}.weight"])
    _set(tree, f"{dst}/LayerNorm_0/bias", sd[f"{src}.bias"])


def _conv3d(tree, dst, sd, src, bias=None):
    w = sd[f"{src}.weight"]                       # [O, I, t, h, w]
    _set(tree, f"{dst}/kernel", w.transpose(2, 3, 4, 1, 0))
    if bias is None:
        bias = f"{src}.bias" in sd
    if bias:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _convtranspose3d(tree, dst, sd, src):
    w = sd[f"{src}.weight"]                       # [I, O, t, h, w]
    w = w.transpose(2, 3, 4, 0, 1)                # [t, h, w, I, O]
    w = w[::-1, ::-1, ::-1].copy()                # flip for flax convention
    _set(tree, f"{dst}/kernel", w)
    if f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _conv2d_as_dense(tree, dst, sd, src):
    w = sd[f"{src}.weight"]                       # [O, I, 1, 1]
    _set(tree, f"{dst}/kernel", w[:, :, 0, 0].T)
    if f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _conv2d(tree, dst, sd, src):
    w = sd[f"{src}.weight"]                       # [O, I, h, w]
    _set(tree, f"{dst}/kernel", w.transpose(2, 3, 1, 0))
    if f"{src}.bias" in sd:
        _set(tree, f"{dst}/bias", sd[f"{src}.bias"])


def _mlp(tree, dst, sd, src, n_layers):
    for i in range(n_layers):
        _linear(tree, f"{dst}/layers_{i}", sd, f"{src}.layers.{i}")


def convert_vit_body(sd: Dict[str, np.ndarray], tree: dict, dst: str,
                     prefix: str = "", depth: int = 12):
    """ViT backbone params.  prefix: reference name prefix (e.g.
    'backbone.0.body.' inside a DETR checkpoint, '' for a raw VideoMAE
    checkpoint)."""
    p = prefix
    _conv3d(tree, f"{dst}/patch_embed", sd, f"{p}patch_embed.proj")
    for i in range(depth):
        b = f"{p}blocks.{i}"
        d = f"{dst}/blocks_{i}"
        _layernorm(tree, f"{d}/norm1", sd, f"{b}.norm1")
        _layernorm(tree, f"{d}/norm2", sd, f"{b}.norm2")
        _set(tree, f"{d}/attn/qkv_kernel", sd[f"{b}.attn.qkv.weight"].T)
        _set(tree, f"{d}/attn/q_bias", sd[f"{b}.attn.q_bias"])
        _set(tree, f"{d}/attn/v_bias", sd[f"{b}.attn.v_bias"])
        _linear(tree, f"{d}/attn/proj", sd, f"{b}.attn.proj")
        _linear(tree, f"{d}/mlp_fc1", sd, f"{b}.mlp.fc1")
        _linear(tree, f"{d}/mlp_fc2", sd, f"{b}.mlp.fc2")
    _layernorm(tree, f"{dst}/norm", sd, f"{p}norm")


def convert_lateral_convs(sd, tree, dst_prefix, src_prefix):
    """FPN branches (backbone_3d_builder.py:139-180).  Sequential indices
    per scale: 4.0 -> [ConvT, LN, GELU, ConvT, Conv, LN, Conv];
    2.0 -> [ConvT, Conv, LN, Conv]; 1.0 -> [Conv, LN, Conv];
    0.5 -> [MaxPool, Conv, LN, Conv]."""
    layouts = {
        0: dict(up1=0, up1_norm=1, up2=3, proj1=4, proj_norm=5, proj2=6),
        1: dict(up1=0, proj1=1, proj_norm=2, proj2=3),
        2: dict(proj1=0, proj_norm=1, proj2=2),
        3: dict(proj1=1, proj_norm=2, proj2=3),
    }
    for lvl, layout in layouts.items():
        src = f"{src_prefix}.{lvl}"
        dst = f"{dst_prefix}_{lvl}"
        for name, idx in layout.items():
            s = f"{src}.{idx}"
            if name.startswith("up") and not name.endswith("norm"):
                _convtranspose3d(tree, f"{dst}/{name}", sd, s)
            elif name.endswith("norm"):
                _channel_ln(tree, f"{dst}/{name}", sd, s)
            else:
                _conv3d(tree, f"{dst}/{name}", sd, s)


def convert_encoder(sd, tree, dst, src, n_layers):
    for i in range(n_layers):
        s = f"{src}.layers.{i}"
        d = f"{dst}/layers_{i}"
        for proj in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            _linear(tree, f"{d}/self_attn/{proj}", sd, f"{s}.self_attn.{proj}")
        _layernorm(tree, f"{d}/norm1", sd, f"{s}.norm1")
        _layernorm(tree, f"{d}/norm2", sd, f"{s}.norm2")
        _linear(tree, f"{d}/linear1", sd, f"{s}.linear1")
        _linear(tree, f"{d}/linear2", sd, f"{s}.linear2")


def convert_decoder(sd, tree, dst, src, n_layers, bbox_diff_each_layer=False):
    for i in range(n_layers):
        s = f"{src}.layers.{i}"
        d = f"{dst}/layers_{i}"
        for proj in ("sa_qcontent_proj", "sa_qpos_proj", "sa_kcontent_proj",
                     "sa_kpos_proj", "sa_v_proj", "lvl_w_embed",
                     "ca_qcontent_proj", "ca_qpos_proj", "ca_kcontent_proj",
                     "ca_kpos_proj", "ca_v_proj", "ca_qpos_sine_proj"):
            if f"{s}.{proj}.weight" in sd:          # ca_qpos_proj pruned l>0
                _linear(tree, f"{d}/{proj}", sd, f"{s}.{proj}")
        _linear(tree, f"{d}/self_attn/out_proj", sd, f"{s}.self_attn.out_proj")
        _linear(tree, f"{d}/cross_attn/out_proj", sd, f"{s}.cross_attn.out_proj")
        for nm in ("norm1", "norm2", "norm3", "norm_"):
            _layernorm(tree, f"{d}/{nm}", sd, f"{s}.{nm}")
        _linear(tree, f"{d}/linear1", sd, f"{s}.linear1")
        _linear(tree, f"{d}/linear2", sd, f"{s}.linear2")

        s = f"{src}.cls_layers.{i}"
        d = f"{dst}/cls_layers_{i}"
        for nm in ("cls_linear1", "cls_linear2", "cls_linear1_", "cls_linear2_",
                   "cls_qpos_sine_proj"):
            _linear(tree, f"{d}/{nm}", sd, f"{s}.{nm}")
        for nm in ("cls_norm", "cls_norm_", "conv_norm", "norm1"):
            _layernorm(tree, f"{d}/{nm}", sd, f"{s}.{nm}")
        _conv2d_as_dense(tree, f"{d}/k_proj", sd, f"{s}.k_proj")
        _conv2d_as_dense(tree, f"{d}/v_proj", sd, f"{s}.v_proj")
        _linear(tree, f"{d}/self_attn/out_proj", sd, f"{s}.self_attn.out_proj")
        _linear(tree, f"{d}/cross_attn/out_proj", sd, f"{s}.cross_attn.out_proj")
        cb = f"{s}.conv_blocks.0"                    # shared module x3
        _conv2d(tree, f"{d}/conv_block/conv1", sd, f"{cb}.conv1")
        _layernorm(tree, f"{d}/conv_block/norm", sd, f"{cb}.norm")
        _linear(tree, f"{d}/conv_block/conv2", sd, f"{cb}.conv2")
        _linear(tree, f"{d}/conv_block/conv3", sd, f"{cb}.conv3")

    _layernorm(tree, f"{dst}/norm", sd, f"{src}.norm")
    _layernorm(tree, f"{dst}/cls_norm2", sd, f"{src}.cls_norm2")
    _set(tree, f"{dst}/class_queries", sd[f"{src}.class_queries.weight"])
    _mlp(tree, f"{dst}/query_scale", sd, f"{src}.query_scale", 2)
    _mlp(tree, f"{dst}/ref_point_head", sd, f"{src}.ref_point_head", 2)
    if f"{src}.ref_anchor_head.layers.0.weight" in sd:
        _mlp(tree, f"{dst}/ref_anchor_head", sd, f"{src}.ref_anchor_head", 2)
    if bbox_diff_each_layer:
        for i in range(n_layers):
            _mlp(tree, f"{dst}/bbox_embed_{i}", sd, f"{src}.bbox_embed.{i}", 3)
    else:
        _mlp(tree, f"{dst}/bbox_embed", sd, f"{src}.bbox_embed", 3)


def _affine(tree, dst, sd, src):
    """CSN norm: BatchNorm3d (use_affine=False, running stats present) or
    Affine stored [C, 1, 1, 1] (ir_CSN_152.py:22-33)."""
    _set(tree, f"{dst}/weight", sd[f"{src}.weight"].reshape(-1))
    _set(tree, f"{dst}/bias", sd[f"{src}.bias"].reshape(-1))
    if f"{src}.running_mean" in sd:
        _set(tree, f"{dst}/running_mean", sd[f"{src}.running_mean"])
        _set(tree, f"{dst}/running_var", sd[f"{src}.running_var"])


def convert_csn_body(sd: Dict[str, np.ndarray], tree: dict, dst: str,
                     prefix: str, block_nums=(3, 8, 36, 3)):
    """CSN backbone from a reference DETR state_dict (torch names)."""
    p = prefix
    _conv3d(tree, f"{dst}/conv1", sd, f"{p}conv1")
    _affine(tree, f"{dst}/bn1", sd, f"{p}bn1")
    for s, n_blocks in enumerate(block_nums):
        for b in range(n_blocks):
            src = f"{p}layer{s + 1}.{b}"
            d = f"{dst}/layer{s + 1}_{b}"
            for conv in ("conv1", "conv3", "conv4"):
                _conv3d(tree, f"{d}/{conv}", sd, f"{src}.{conv}")
            for bn in ("bn1", "bn3", "bn4"):
                _affine(tree, f"{d}/{bn}", sd, f"{src}.{bn}")
            if b == 0:
                _conv3d(tree, f"{d}/down_conv", sd, f"{src}.down_sample.0")
                _affine(tree, f"{d}/down_bn", sd, f"{src}.down_sample.1")


def convert_csn_mat(mat: Dict[str, np.ndarray], block_nums=(3, 8, 36, 3)) -> dict:
    """Caffe2 .mat weights -> flax CSN body params
    (name map: ir_CSN_152.py:262-340).  Conv weights are [O, I, t, h, w];
    Affine scale/bias are <name>_s / <name>_b."""
    tree: dict = {}

    def conv(dst, name):
        _set(tree, f"{dst}/kernel", mat[name].transpose(2, 3, 4, 1, 0))

    def bn(dst, name):
        _set(tree, f"{dst}/weight", mat[name + "_s"].reshape(-1))
        _set(tree, f"{dst}/bias", mat[name + "_b"].reshape(-1))
        if name + "_rm" in mat:
            _set(tree, f"{dst}/running_mean", mat[name + "_rm"].reshape(-1))
            _set(tree, f"{dst}/running_var", mat[name + "_riv"].reshape(-1))

    conv("conv1", "conv1_w")
    bn("bn1", "conv1_spatbn_relu")
    start_count = np.concatenate([[0], np.cumsum(block_nums)[:-1]])
    for s, n_blocks in enumerate(block_nums):
        count = int(start_count[s])
        for b in range(n_blocks):
            d = f"layer{s + 1}_{b}"
            conv(f"{d}/conv1", f"comp_{count}_conv_1_w")
            conv(f"{d}/conv3", f"comp_{count}_conv_3_w")
            conv(f"{d}/conv4", f"comp_{count}_conv_4_w")
            bn(f"{d}/bn1", f"comp_{count}_spatbn_1")
            bn(f"{d}/bn3", f"comp_{count}_spatbn_3")
            bn(f"{d}/bn4", f"comp_{count}_spatbn_4")
            if b == 0:
                conv(f"{d}/down_conv", f"shortcut_projection_{count}_w")
                bn(f"{d}/down_bn", f"shortcut_projection_{count}_spatbn")
            count += 1
    return tree


def _frozen_bn(tree, dst, sd, src):
    _set(tree, f"{dst}/weight", sd[f"{src}.weight"])
    _set(tree, f"{dst}/bias", sd[f"{src}.bias"])
    _set(tree, f"{dst}/running_mean", sd[f"{src}.running_mean"])
    _set(tree, f"{dst}/running_var", sd[f"{src}.running_var"])


def convert_vss_block(sd, tree, dst, src):
    """VSSBlock (models/detr/VSS.py:305-388) -> models/vss.VSSBlock."""
    _conv2d(tree, f"{dst}/proj_conv", sd, f"{src}.proj_conv.0")
    _frozen_bn(tree, f"{dst}/proj_bn", sd, f"{src}.proj_conv.1")
    ls = f"{src}.lsblock"
    _conv2d(tree, f"{dst}/lsblock/fc1", sd, f"{ls}.fc1")
    _frozen_bn(tree, f"{dst}/lsblock/norm", sd, f"{ls}.norm")
    _conv2d(tree, f"{dst}/lsblock/fc2", sd, f"{ls}.fc2")
    _conv2d(tree, f"{dst}/lsblock/fc3", sd, f"{ls}.fc3")
    # LayerNorm2d wraps an inner nn.LayerNorm named 'norm'
    _layernorm(tree, f"{dst}/norm", sd, f"{src}.norm.norm")
    op = f"{src}.op"
    _conv2d_as_dense(tree, f"{dst}/op/in_proj", sd, f"{op}.in_proj")
    _conv2d(tree, f"{dst}/op/conv2d", sd, f"{op}.conv2d")
    _set(tree, f"{dst}/op/x_proj_weight", sd[f"{op}.x_proj_weight"])
    _set(tree, f"{dst}/op/dt_projs_weight", sd[f"{op}.dt_projs_weight"])
    _set(tree, f"{dst}/op/dt_projs_bias", sd[f"{op}.dt_projs_bias"])
    _set(tree, f"{dst}/op/A_logs", sd[f"{op}.A_logs"])
    _set(tree, f"{dst}/op/Ds", sd[f"{op}.Ds"])
    _layernorm(tree, f"{dst}/op/out_norm", sd, f"{op}.out_norm")
    _conv2d_as_dense(tree, f"{dst}/op/out_proj", sd, f"{op}.out_proj")


def convert_mamba_block(sd, tree, dst, src):
    """mamba_simple.Mamba (unidirectional) -> models/mamba_block.Mamba."""
    _linear(tree, f"{dst}/in_proj", sd, f"{src}.in_proj")
    w = sd[f"{src}.conv1d.weight"]                 # [D, 1, K]
    _set(tree, f"{dst}/conv1d/kernel", w.transpose(2, 1, 0))
    if f"{src}.conv1d.bias" in sd:
        _set(tree, f"{dst}/conv1d/bias", sd[f"{src}.conv1d.bias"])
    _linear(tree, f"{dst}/x_proj", sd, f"{src}.x_proj")
    _set(tree, f"{dst}/dt_proj_kernel", sd[f"{src}.dt_proj.weight"].T)
    _set(tree, f"{dst}/dt_proj_bias", sd[f"{src}.dt_proj.bias"])
    _set(tree, f"{dst}/A_log", sd[f"{src}.A_log"])
    _set(tree, f"{dst}/D", sd[f"{src}.D"])
    _linear(tree, f"{dst}/out_proj", sd, f"{src}.out_proj")


def _interp_mamba_pos_embed(pos: np.ndarray, num_patches: int,
                            num_extra: int = 1) -> np.ndarray:
    """Spatial pos-embed bicubic interpolation for VideoMamba checkpoints.

    Mirrors /root/reference/models/backbones/mamba.py:92-115: only the
    position tokens (after ``num_extra`` leading cls tokens) are resampled,
    on a square grid, with torch's bicubic ``align_corners=False`` (torch is
    used directly so the converter is bit-faithful to the reference loader).
    """
    orig_size = int(round((pos.shape[-2] - num_extra) ** 0.5))
    new_size = int(round(num_patches ** 0.5))
    if orig_size == new_size:
        return pos
    import torch

    extra = pos[:, :num_extra]
    tok = torch.from_numpy(
        np.ascontiguousarray(pos[:, num_extra:], dtype=np.float32)
    )
    c = tok.shape[-1]
    tok = tok.reshape(-1, orig_size, orig_size, c).permute(0, 3, 1, 2)
    tok = torch.nn.functional.interpolate(
        tok, size=(new_size, new_size), mode="bicubic", align_corners=False
    )
    tok = tok.permute(0, 2, 3, 1).reshape(-1, new_size * new_size, c).numpy()
    return np.concatenate([extra, tok], axis=1)


def _interp_mamba_temporal(tpe: np.ndarray, new_t: int) -> np.ndarray:
    """Temporal pos-embed linear interpolation (mamba.py:117-130).

    Deviation from the reference (documented): mamba.py:27 sets
    ``orig_t_size`` from the *config* rather than the checkpoint tensor, so
    its temporal branch never fires and a length-mismatched embedding is
    silently dropped by its lenient ``load_state_dict``.  We derive the
    source length from the tensor itself so pretrained temporal embeddings
    survive a TEMP_LEN change (interpolation math itself is identical).
    """
    orig_t = tpe.shape[1]
    if orig_t == new_t:
        return tpe
    import torch

    t = torch.from_numpy(np.ascontiguousarray(tpe, dtype=np.float32))
    t = t.permute(0, 2, 1)
    t = torch.nn.functional.interpolate(
        t, size=(new_t,), mode="linear", align_corners=False
    )
    return t.permute(0, 2, 1).numpy()


def strip_mamba_prefixes(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """'backbone.'/'encoder.' prefix stripping + head removal
    (mamba.py:63-88)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("backbone."):
            k = k[9:]
        elif k.startswith("encoder."):
            k = k[8:]
        if k in ("head.weight", "head.bias"):
            continue
        out[k] = v
    return out


def convert_videomamba(sd: Dict[str, np.ndarray], tree: dict, dst: str,
                       prefix: str = "", *, depth: int,
                       num_frames: int = None, num_patches: int = None):
    """External VideoMamba package state_dict -> models/videomamba.VideoMamba.

    Source naming is the OpenGVLab ``videomamba_{tiny,small,middle}``
    bimamba-v2 layout the reference loads through
    /root/reference/models/backbones/mamba.py:38-133 (patch_embed.proj,
    pos_embed, temporal_pos_embedding, cls_token, layers.{i}.{norm,mixer},
    norm_f; backward-direction params suffixed ``_b``).  When
    ``num_patches``/``num_frames`` are given, the positional embeddings are
    resampled to the target grid exactly as the reference loader does
    (mamba.py:92-130).
    """
    p = prefix
    _conv3d(tree, f"{dst}/patch_embed", sd, f"{p}patch_embed.proj")
    pos = sd[f"{p}pos_embed"]
    if num_patches is not None:
        pos = _interp_mamba_pos_embed(pos, num_patches)
    _set(tree, f"{dst}/pos_embed", pos)
    tpe = sd[f"{p}temporal_pos_embedding"]
    if num_frames is not None:
        tpe = _interp_mamba_temporal(tpe, num_frames)
    _set(tree, f"{dst}/temporal_pos_embedding", tpe)
    _set(tree, f"{dst}/cls_token", sd[f"{p}cls_token"])
    for i in range(depth):
        s = f"{p}layers.{i}"
        d = f"{dst}/layers_{i}"
        _layernorm(tree, f"{d}/norm", sd, f"{s}.norm")
        mx_s, mx_d = f"{s}.mixer", f"{d}/mixer"
        _linear(tree, f"{mx_d}/in_proj", sd, f"{mx_s}.in_proj")
        for suf in ("", "_b"):
            w = sd[f"{mx_s}.conv1d{suf}.weight"]          # [D, 1, K]
            _set(tree, f"{mx_d}/conv1d{suf}/kernel", w.transpose(2, 1, 0))
            _set(tree, f"{mx_d}/conv1d{suf}/bias", sd[f"{mx_s}.conv1d{suf}.bias"])
            _linear(tree, f"{mx_d}/x_proj{suf}", sd, f"{mx_s}.x_proj{suf}")
            _set(tree, f"{mx_d}/dt_proj{suf}_kernel",
                 sd[f"{mx_s}.dt_proj{suf}.weight"].T)
            _set(tree, f"{mx_d}/dt_proj{suf}_bias",
                 sd[f"{mx_s}.dt_proj{suf}.bias"])
            _set(tree, f"{mx_d}/A{suf}_log", sd[f"{mx_s}.A{suf}_log"])
            _set(tree, f"{mx_d}/D{suf}", sd[f"{mx_s}.D{suf}"])
        _linear(tree, f"{mx_d}/out_proj", sd, f"{mx_s}.out_proj")
    _layernorm(tree, f"{dst}/norm_f", sd, f"{p}norm_f")


def convert_videomamba_pretrain(sd: Dict[str, np.ndarray], *, depth: int,
                                num_frames: int,
                                num_patches: int) -> dict:
    """Raw VideoMamba pretrain checkpoint -> {'backbone': tree} params
    fragment, reproducing the reference's build-time load (mamba.py:36-133:
    model-key unwrap is handled by load_torch_state_dict, prefix strip +
    head delete by strip_mamba_prefixes, pos-embed interpolation here)."""
    sd = strip_mamba_prefixes(sd)
    tree: dict = {}
    convert_videomamba(sd, tree, "backbone", depth=depth,
                       num_frames=num_frames, num_patches=num_patches)
    return tree


def convert_mamba_proj(sd, tree, dst_prefix, src):
    """mamba_proj Sequential (backbone_3d_builder.py:69-76): Linear, LN,
    GELU, Linear(no bias), LN, Linear(no bias) -> mamba_proj_{0,1,3,4,5}."""
    _linear(tree, f"{dst_prefix}_0", sd, f"{src}.0")
    _layernorm(tree, f"{dst_prefix}_1", sd, f"{src}.1")
    _linear(tree, f"{dst_prefix}_3", sd, f"{src}.3")
    _layernorm(tree, f"{dst_prefix}_4", sd, f"{src}.4")
    _linear(tree, f"{dst_prefix}_5", sd, f"{src}.5")


def convert_ssm_encoder(sd, tree, dst, src, n_layers, kind):
    """Mamba/VSS encoder layers (dab_transformer.py:528-669)."""
    for i in range(n_layers):
        s = f"{src}.layers.{i}"
        d = f"{dst}/layers_{i}"
        _linear(tree, f"{d}/compress", sd, f"{s}.compress")
        _linear(tree, f"{d}/pos_compress", sd, f"{s}.pos_compress")
        _layernorm(tree, f"{d}/recurrent/step/ssm_norm", sd, f"{s}.ssm_norm")
        if kind == "vssm":
            convert_vss_block(sd, tree, f"{d}/recurrent/step/ssm", f"{s}.ssm")
        else:
            convert_mamba_block(sd, tree, f"{d}/recurrent/step/ssm", f"{s}.ssm")
        _linear(tree, f"{d}/decompress", sd, f"{s}.decompress")
        _linear(tree, f"{d}/linear1", sd, f"{s}.linear1")
        _linear(tree, f"{d}/linear2", sd, f"{s}.linear2")
        _layernorm(tree, f"{d}/norm2", sd, f"{s}.norm2")


def convert_detr_checkpoint(sd: Dict[str, np.ndarray], cfg) -> dict:
    """Full reference DETR checkpoint -> flax params dict."""
    m = cfg.CONFIG.MODEL
    tree: dict = {}
    if "VideoMamba" in m.BACKBONE_NAME:
        from ..models.videomamba import VIDEOMAMBA_SPECS

        spec = VIDEOMAMBA_SPECS[m.get("BACKBONE_TYPE", "videomamba_tiny")]
        img = int(cfg.CONFIG.DATA.get("IMG_SIZE", 224))
        convert_videomamba(
            sd, tree, "backbone", "backbone.0.body.", depth=spec["depth"],
            num_frames=cfg.CONFIG.DATA.TEMP_LEN, num_patches=(img // 16) ** 2,
        )
        convert_mamba_proj(sd, tree, "mamba_proj", "backbone.0.mamba_proj")
    elif "ViT" in m.BACKBONE_NAME:
        convert_vit_body(sd, tree, "backbone/body", "backbone.0.body.",
                         depth=cfg.CONFIG.ViT.DEPTH)
        convert_lateral_convs(sd, tree, "backbone/lateral_convs",
                              "backbone.0.lateral_convs")
    else:
        block_nums = (3, 8, 36, 3) if "152" in m.BACKBONE_NAME else (3, 4, 6, 3)
        convert_csn_body(sd, tree, "backbone", "backbone.0.body.", block_nums)
        for i in range(4):
            _conv3d(tree, f"input_proj_{i}_conv", sd, f"input_proj.{i}.0",
                    bias=True)
            _layernorm(tree, f"input_proj_{i}_norm", sd, f"input_proj.{i}.1")
    _set(tree, "transformer/level_embed", sd["transformer.level_embed"])
    enc_type = m.get("ENCODER_TYPE", "attention")
    if enc_type == "attention":
        convert_encoder(sd, tree, "transformer/encoder", "transformer.encoder",
                        m.ENC_LAYERS)
    else:
        convert_ssm_encoder(sd, tree, "transformer/encoder",
                            "transformer.encoder", m.ENC_LAYERS, enc_type)
    convert_decoder(sd, tree, "transformer/decoder", "transformer.decoder",
                    m.DEC_LAYERS, m.BBOX_EMBED_DIFF_EACH_LAYER)
    _linear(tree, "class_embed_b", sd, "class_embed_b")
    _set(tree, "refpoint_embed", sd["refpoint_embed.weight"])
    return {"params": tree}
