"""CSN BatchNorm train-mode parity vs a torch BatchNorm3d oracle
(round-3 verdict item 7).

The reference's build_CSN(use_affine=False) uses real BatchNorm3d
(/root/reference/models/backbones/ir_CSN_152.py:352, eps=1e-3 :18): in
train mode it normalizes by the CURRENT BATCH statistics (biased
variance) and backprops through them.  CSNBatchNorm(train=True) must
match forward and input-gradient; eval mode keeps the running-stat
inference form.

Pinned deviation (documented in csn.py + PERF.md): running statistics do
not update during training — engine.train freezes them out of the
optimizer so they keep their pretrained values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from class_query_vad_tpu.models.csn import CSNBatchNorm


def _setup(C=7, shape=(2, 3, 4, 5)):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(shape[0], shape[1], shape[2], shape[3], C)).astype(
        np.float32
    )
    w = rng.normal(size=C).astype(np.float32)
    b = rng.normal(size=C).astype(np.float32)
    rm = rng.normal(size=C).astype(np.float32)
    rv = rng.uniform(0.5, 2.0, size=C).astype(np.float32)

    tbn = torch.nn.BatchNorm3d(C, eps=1e-3)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(w))
        tbn.bias.copy_(torch.from_numpy(b))
        tbn.running_mean.copy_(torch.from_numpy(rm))
        tbn.running_var.copy_(torch.from_numpy(rv))

    params = {"params": {"weight": jnp.asarray(w), "bias": jnp.asarray(b),
                         "running_mean": jnp.asarray(rm),
                         "running_var": jnp.asarray(rv)}}
    return x, tbn, params


def _torch_fwd_grad(tbn, x, train):
    tbn.train(train)
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3))).requires_grad_()
    out = tbn(xt)
    out.square().sum().backward()
    return (
        np.transpose(out.detach().numpy(), (0, 2, 3, 4, 1)),
        np.transpose(xt.grad.numpy(), (0, 2, 3, 4, 1)),
    )


def _jax_fwd_grad(params, x, train):
    bn = CSNBatchNorm(features=x.shape[-1])

    def f(xj):
        return jnp.sum(bn.apply(params, xj, train) ** 2)

    out = bn.apply(params, jnp.asarray(x), train)
    g = jax.grad(f)(jnp.asarray(x))
    return np.asarray(out), np.asarray(g)


def test_train_mode_matches_torch_batch_stats():
    x, tbn, params = _setup()
    t_out, t_gx = _torch_fwd_grad(tbn, x, train=True)
    j_out, j_gx = _jax_fwd_grad(params, x, train=True)
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(j_gx, t_gx, rtol=1e-3, atol=1e-3)


def test_eval_mode_matches_torch_running_stats():
    x, tbn, params = _setup()
    t_out, t_gx = _torch_fwd_grad(tbn, x, train=False)
    j_out, j_gx = _jax_fwd_grad(params, x, train=False)
    np.testing.assert_allclose(j_out, t_out, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(j_gx, t_gx, rtol=1e-4, atol=1e-4)


def test_train_vs_eval_differ():
    x, _, params = _setup()
    j_tr, _ = _jax_fwd_grad(params, x, train=True)
    j_ev, _ = _jax_fwd_grad(params, x, train=False)
    assert np.abs(j_tr - j_ev).max() > 1e-2


def test_running_stats_frozen_in_optimizer():
    """BN buffers must be excluded from the optimizer (no grad step, no
    AdamW weight decay) — torch registers them as buffers."""
    from class_query_vad_tpu.config import get_cfg_defaults
    from class_query_vad_tpu.engine.train import backbone_freeze_labels

    cfg = get_cfg_defaults()
    cfg.CONFIG.MODEL.BACKBONE_NAME = "CSN-50"
    cfg.CONFIG.MODEL.PRETRAINED = False
    params = {"params": {"backbone": {
        "bn1": {"weight": np.ones(3), "bias": np.zeros(3),
                "running_mean": np.zeros(3), "running_var": np.ones(3)},
        "conv1": {"kernel": np.ones((1, 1, 1, 3, 3))},
    }}}
    labels = backbone_freeze_labels(params, cfg)
    bn = labels["params"]["backbone"]["bn1"]
    assert bn["running_mean"] == "frozen"
    assert bn["running_var"] == "frozen"
    assert bn["weight"] == "trainable"
    assert bn["bias"] == "trainable"
    assert labels["params"]["backbone"]["conv1"]["kernel"] == "trainable"
