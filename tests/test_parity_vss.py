"""Golden parity: VSSBlock / SS2D and the VSS encoder layer vs the PyTorch
reference, with the reference's CUDA selective scan replaced by a pure-torch
sequential scan implementing the same contract
(selective_scan/csrc semantics; executable spec in
selective_scan/test_selective_scan_easy.py:14-97).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from class_query_vad_tpu.models.vss import VSSBlock
from class_query_vad_tpu.utils.checkpoint_convert import convert_vss_block

from reference_oracle import install_reference

install_reference(need_model_stubs=True)


def torch_selective_scan_ref(u, delta, A, B, C, D=None, delta_bias=None,
                             delta_softplus=False):
    dtype = u.dtype
    u = u.float()
    delta = delta.float()
    if delta_bias is not None:
        delta = delta + delta_bias[None, :, None].float()
    if delta_softplus:
        delta = F.softplus(delta)
    if B.dim() == 3:
        B = B.unsqueeze(1)
    if C.dim() == 3:
        C = C.unsqueeze(1)
    b, d, l = u.shape
    n = A.shape[1]
    g = B.shape[1]
    dk = d // g
    B_ = B.float().repeat_interleave(dk, dim=1)       # [b, d, n, l]
    C_ = C.float().repeat_interleave(dk, dim=1)
    deltaA = torch.exp(delta.unsqueeze(-1) * A.float()[None, :, None, :])  # [b, d, l, n]
    x = torch.zeros(b, d, n)
    ys = []
    for i in range(l):
        x = deltaA[:, :, i] * x + (delta[:, :, i] * u[:, :, i]).unsqueeze(-1) * B_[:, :, :, i]
        ys.append((x * C_[:, :, :, i]).sum(-1))
    y = torch.stack(ys, dim=-1)
    if D is not None:
        y = y + D.float()[None, :, None] * u
    return y.to(dtype)


class _FakeScan:
    @staticmethod
    def apply(u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=False,
              *rest):
        return torch_selective_scan_ref(u, delta, A, B, C, D, delta_bias,
                                        delta_softplus)


@pytest.fixture(scope="module")
def patched_vss():
    import models.detr.common_utils_mbyolo as cu
    import models.detr.VSS as ref_vss

    cu.SelectiveScanCore = _FakeScan
    ref_vss.SelectiveScanCore = _FakeScan
    return ref_vss


def test_vss_block_parity(patched_vss, rng):
    torch.manual_seed(0)
    d = 64
    ref = patched_vss.VSSBlock(
        d, ssm_d_state=4, hidden_dim=d, drop_path=0.0, mlp_ratio=0.0,
        post_norm=True,
    )
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    x = rng.normal(size=(2, 8, 10, d)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    sd = {f"m.{k}": v.numpy() for k, v in ref.state_dict().items()}
    tree = {}
    convert_vss_block(sd, tree, "p", "m")
    params = {"params": tree["p"]}

    ours = VSSBlock(d, d, ssm_d_state=4, mlp_ratio=0.0, post_norm=True)
    out = ours.apply(params, jnp.asarray(x))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    err = np.abs(ref_out - out).max()
    assert err < 2e-4, err


def test_vss_encoder_layer_parity(patched_vss, rng):
    """Full VSSMambaEncoderLayer (bidirectional time recurrence) vs ours."""
    import models.detr.dab_transformer as ref_tr

    torch.manual_seed(1)
    d_model, t, h, w = 64, 3, 4, 5
    ref = ref_tr.VSSMambaEncoderLayer(d_model=d_model, d_ffn=128)
    # rebuild the ssm with matching dims (reference hardcodes d_model//2)
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    b = 2
    src = rng.normal(size=(b, t * h * w, d_model)).astype(np.float32)
    pos = rng.normal(size=(b, t * h * w, d_model)).astype(np.float32)
    shapes = torch.tensor([[t, h, w]])
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(src.copy()), torch.from_numpy(pos.copy()),
            None, shapes, None, None, return_key=False,
        ).numpy()
        ref_key, ref_key_pos = ref(
            torch.from_numpy(src.copy()), torch.from_numpy(pos.copy()),
            None, shapes, None, None, return_key=True,
        )

    from class_query_vad_tpu.models.ssm_encoder import SSMEncoderLayer
    from class_query_vad_tpu.utils.checkpoint_convert import convert_ssm_encoder

    sd = {f"x.layers.0.{k}": v.numpy() for k, v in ref.state_dict().items()}
    tree = {}
    convert_ssm_encoder(sd, tree, "enc", "x", 1, "vssm")
    params = {"params": tree["enc"]["layers_0"]}

    ours = SSMEncoderLayer(d_model, 128, "vssm")
    out = ours.apply(params, jnp.asarray(src), jnp.asarray(pos), (t, h, w),
                     False)
    err = np.abs(ref_out - np.asarray(out)).max()
    assert err < 5e-4, err

    key_out, key_pos = ours.apply(
        params, jnp.asarray(src), jnp.asarray(pos), (t, h, w), True
    )
    err = np.abs(ref_key.numpy() - np.asarray(key_out)).max()
    assert err < 5e-4, err
    err_p = np.abs(ref_key_pos.numpy() - np.asarray(key_pos)).max()
    assert err_p < 1e-5, err_p
