"""Engine-level golden tests.

* optimizer parity: the optax chain (sum-accumulating MultiSteps ->
  global-norm clip 1.0 -> AdamW torch defaults) must track torch's
  AdamW + clip_grad_norm + grad-accumulation trajectory exactly
  (reference train.py:83,150-167);
* checkpoint round trip (orbax TrainState);
* two-stage init transplant (load_detr_weights).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from class_query_vad_tpu.engine.train import make_optimizer


@pytest.mark.parametrize("accum", [1, 3])
def test_optimizer_matches_torch(rng, accum):
    shapes = {"a": (4, 5), "b": (7,), "c": (3, 2)}
    init = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
    n_micro = 6 * accum
    grads = [
        {k: rng.normal(size=s).astype(np.float32) * 3 for k, s in shapes.items()}
        for _ in range(n_micro)
    ]
    lr = 1e-3

    # torch reference trajectory
    t_params = {k: torch.nn.Parameter(torch.from_numpy(v.copy()))
                for k, v in init.items()}
    opt = torch.optim.AdamW(t_params.values(), lr=lr)
    opt.zero_grad()
    for step, g in enumerate(grads, 1):
        for k in t_params:
            gt = torch.from_numpy(g[k])
            if t_params[k].grad is None:
                t_params[k].grad = gt.clone()
            else:
                t_params[k].grad += gt
        if step % accum == 0:
            torch.nn.utils.clip_grad_norm_(t_params.values(), max_norm=1.0)
            opt.step()
            opt.zero_grad()

    # ours
    tx = make_optimizer(lr, grad_accum=accum, clip_norm=1.0)
    params = {k: jnp.asarray(v) for k, v in init.items()}
    opt_state = tx.init(params)
    import optax

    for g in grads:
        gj = {k: jnp.asarray(v) for k, v in g.items()}
        updates, opt_state = tx.update(gj, opt_state, params)
        params = optax.apply_updates(params, updates)

    for k in shapes:
        ours = np.asarray(params[k])
        theirs = t_params[k].detach().numpy()
        assert np.allclose(ours, theirs, atol=1e-6), (
            k, np.abs(ours - theirs).max()
        )


def test_checkpoint_roundtrip(tmp_path, rng):
    from class_query_vad_tpu.config import get_cfg_defaults
    from class_query_vad_tpu.engine import load_checkpoint, save_checkpoint
    from class_query_vad_tpu.engine.train import TrainState, make_optimizer

    cfg = get_cfg_defaults()
    cfg.CONFIG.LOG.BASE_PATH = str(tmp_path)
    cfg.CONFIG.LOG.EXP_NAME = "ck"
    params = {"params": {"w": jnp.asarray(rng.normal(size=(4, 4)), jnp.float32)}}
    tx = make_optimizer(1e-3)
    state = TrainState(
        step=jnp.asarray(7), params=params, opt_state=tx.init(params),
        dropout_rng=jax.random.PRNGKey(3),
    )
    path = save_checkpoint(cfg, state, epoch=2, accuracy=0.5)
    restored, meta = load_checkpoint(path, target=jax.device_get(state))
    assert meta["epoch"] == 2
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["w"]),
        np.asarray(params["params"]["w"]),
    )


def test_load_pretrained_params_from_trainstate_ckpt(tmp_path, rng):
    """--pretrained_path pointing at a saved TrainState orbax dir must yield
    a plain variables dict {'params': tree} (regression: the TrainState
    branch used to double-nest 'params')."""
    from class_query_vad_tpu.config import get_cfg_defaults
    from class_query_vad_tpu.engine import save_checkpoint
    from class_query_vad_tpu.engine.checkpoint import load_pretrained_params
    from class_query_vad_tpu.engine.train import TrainState, make_optimizer

    cfg = get_cfg_defaults()
    cfg.CONFIG.LOG.BASE_PATH = str(tmp_path)
    cfg.CONFIG.LOG.EXP_NAME = "ck2"
    params = {"params": {"w": jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)}}
    tx = make_optimizer(1e-3)
    state = TrainState(
        step=jnp.asarray(1), params=params, opt_state=tx.init(params),
        dropout_rng=jax.random.PRNGKey(0),
    )
    path = save_checkpoint(cfg, state, epoch=0)
    out = load_pretrained_params(cfg, path)
    assert set(out.keys()) == {"params"}
    assert "w" in out["params"]
    np.testing.assert_array_equal(
        np.asarray(out["params"]["w"]), np.asarray(params["params"]["w"])
    )


def test_lr_policy_schedules():
    """CONFIG.TRAIN.LR_POLICY wires utils/lr_scheduler into the optimizer:
    cosine+warmup must ramp then decay; multistep must drop at milestones."""
    from class_query_vad_tpu.config import get_cfg_defaults
    from class_query_vad_tpu.utils.lr_scheduler import build_scheduler

    cfg = get_cfg_defaults()
    cfg.CONFIG.TRAIN.LR = 1e-3
    cfg.CONFIG.TRAIN.NUM_EPOCHS = 10
    cfg.CONFIG.TRAIN.LR_POLICY = "cosine"
    cfg.CONFIG.TRAIN.WARMUP_EPOCHS = 1
    sched = build_scheduler(cfg, steps_per_epoch=10)
    assert float(sched(0)) == 0.0
    assert abs(float(sched(10)) - 1e-3) < 1e-9          # end of warmup
    assert float(sched(50)) < 1e-3                      # decaying
    assert float(sched(99)) < float(sched(50))

    cfg.CONFIG.TRAIN.LR_POLICY = "multistep"
    cfg.CONFIG.TRAIN.LR_MILESTONE = [5]
    cfg.CONFIG.TRAIN.WARMUP_EPOCHS = 0
    sched = build_scheduler(cfg, steps_per_epoch=10)
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert abs(float(sched(60)) - 1e-4) < 1e-9

    # schedules thread through make_optimizer (optax schedule support)
    tx = make_optimizer(sched, grad_accum=1)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    upd, st = tx.update({"w": jnp.ones((3,))}, st, params)
    assert np.isfinite(np.asarray(upd["w"])).all()


def test_run_validation_jits_are_memoized():
    """run_validation's jits are memoized on their defining objects —
    a fresh jax.jit per call re-traces and re-loads the persistent
    compile cache every eval epoch (measured ~2 s/batch of phantom cost,
    PERF.md 'End-to-end eval loop')."""
    from class_query_vad_tpu.engine.evaluate import (
        _default_forward,
        _jit_loss,
        _jit_postprocess,
    )
    from class_query_vad_tpu.models import build_model
    from class_query_vad_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    model = build_model(cfg)
    assert _default_forward(model) is _default_forward(model)

    def post(out, sizes):
        return out

    def crit(out, targets, evaluation=False):
        return {"total_loss": jnp.zeros(())}

    assert _jit_postprocess(post) is _jit_postprocess(post)
    assert _jit_loss(crit) is _jit_loss(crit)


def test_bf16_pixel_shipping_is_exact():
    """run_validation(transfer_dtype=bf16) claims exactness because a bf16
    model's first backbone op casts pixels to bf16 anyway — so casting on
    the HOST before transfer must be bit-identical.  Pin that on the ViT
    patch embed at flagship-like values."""
    from class_query_vad_tpu.models.vit import ViT

    vit = ViT(embed_dim=32, depth=1, num_heads=2, patch_size=8,
              tubelet_size=2, num_frames=4, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    px32 = (rng.normal(size=(1, 4, 16, 16, 3)) * 3).astype(np.float32)
    params = vit.init(jax.random.PRNGKey(0), jnp.asarray(px32), True)
    a = vit.apply(params, jnp.asarray(px32), True)
    b = vit.apply(params, jnp.asarray(px32.astype(jnp.bfloat16)), True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
