"""Optimizer parity: our optax chain (value-clip -> L2-into-grad -> amsgrad)
must track torch's clip_grad_value_ + Adam(amsgrad=True, weight_decay) update
sequence step for step (reference src/train.py:86-97,207-210)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from mvc_tpu.config import TrainerConfig
from mvc_tpu.training.optimizer import PlateauScheduler, make_optimizer, set_learning_rate


def test_adam_amsgrad_wd_clip_matches_torch(rng):
    lr, wd, clip = 1e-3, 1e-2, 0.05
    cfg = TrainerConfig()
    cfg.lr, cfg.weight_decay, cfg.gradient_clip_value, cfg.amsgrad = lr, wd, clip, True

    p0 = rng.normal(size=(7, 5)).astype(np.float32)
    grads = [rng.normal(size=(7, 5)).astype(np.float32) * (2.0 if i % 3 == 0 else 0.02)
             for i in range(12)]

    # torch side
    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd, amsgrad=True)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g.copy())
        torch.nn.utils.clip_grad_value_([tp], clip_value=clip)
        topt.step()

    # ours
    params = {"w": jnp.asarray(p0)}
    opt = make_optimizer(cfg)
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_lr_change_matches_torch(rng):
    """Changing the injected learning rate mid-run tracks torch's param-group
    lr change (the plateau path)."""
    lr0, lr1 = 1e-3, 5e-4
    cfg = TrainerConfig()
    cfg.lr, cfg.weight_decay, cfg.gradient_clip_value, cfg.amsgrad = lr0, 0.0, 0.0, True

    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(8)]

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr0, amsgrad=True)
    params = {"w": jnp.asarray(p0)}
    opt = make_optimizer(cfg)
    state = opt.init(params)

    for i, g in enumerate(grads):
        if i == 4:
            for group in topt.param_groups:
                group["lr"] = lr1
            state = set_learning_rate(state, lr1)
        topt.zero_grad()
        tp.grad = torch.tensor(g.copy())
        topt.step()
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


def test_plateau_min_mode_reference_quirk():
    """plateau_mode='min' reproduces the reference quirk: stepping a min-mode
    scheduler on an improving CIDEr decays the LR."""
    s = PlateauScheduler(lr=1.0, factor=0.5, patience=2, min_lr=1e-3, mode="min")
    lrs = [s.step(m) for m in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6)]
    assert lrs[-1] < 1.0  # improvement counted as "bad" epochs -> decay


def test_adam_state_dtype_bf16_close_to_f32():
    """Opt-in bf16 moment storage (cfg.adam_state_dtype, PARITY.md): the
    state trees are stored bf16, default stays exact f32, and a short
    trajectory tracks the f32 optimizer to bf16 rounding tolerance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvc_tpu.config import TrainerConfig
    from mvc_tpu.training.optimizer import make_optimizer

    params = {"w": jnp.asarray(np.random.default_rng(0).normal(
        size=(32, 32)).astype(np.float32))}

    def run(state_dtype):
        cfg = TrainerConfig(lr=1e-2, adam_state_dtype=state_dtype)
        opt = make_optimizer(cfg)
        p = dict(params)
        st = opt.init(p)
        gen = np.random.default_rng(1)
        for _ in range(20):
            g = {"w": jnp.asarray(gen.normal(size=(32, 32)).astype(np.float32))}
            up, st = opt.update(g, st, p)
            p = jax.tree.map(lambda a, b: a + b, p, up)
        return p, st

    p32, st32 = run(None)
    pbf, stbf = run("bfloat16")
    inner32 = st32.inner_state[-1] if hasattr(st32, "inner_state") else st32
    leaves32 = [x for x in jax.tree.leaves(st32) if hasattr(x, "dtype")]
    leavesbf = [x for x in jax.tree.leaves(stbf) if hasattr(x, "dtype")]
    assert all(x.dtype != jnp.bfloat16 for x in leaves32)
    assert any(x.dtype == jnp.bfloat16 for x in leavesbf)
    np.testing.assert_allclose(np.asarray(p32["w"]), np.asarray(pbf["w"]),
                               rtol=0.05, atol=5e-3)
