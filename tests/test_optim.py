"""AdamW optimizer + LR schedules: parity with the reference formulas."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipbert_tpu.train import optim, sched


def _toy_params():
    return {
        "transformer": {
            "bert": {"encoder": {"q": {"kernel": jnp.ones((4, 4)),
                                       "bias": jnp.zeros((4,))},
                                 "ln": {"scale": jnp.ones((4,)),
                                        "bias": jnp.zeros((4,))}}},
            "classifier": {"fc1": {"kernel": jnp.ones((4, 4)),
                                   "bias": jnp.zeros((4,))}},
        },
        "cnn": {
            "resnet": {"stem": {"conv": {"kernel": jnp.ones((3, 3, 3, 4))},
                                "bn": {"scale": jnp.ones((4,)),
                                       "bias": jnp.zeros((4,))}}},
            "grid_encoder": {"conv": {"kernel": jnp.ones((3, 3, 4, 4))}},
        },
    }


def test_group_assignment():
    cfg = optim.OptimConfig(cnn_lr_mul_prefix="grid_encoder", cnn_lr_mul=2.0)
    meta = optim.build_group_meta(_toy_params(), cfg)
    flat = {optim._path_str(p): m for p, m in
            jax.tree_util.tree_flatten_with_path(
                meta, is_leaf=lambda x: isinstance(x, optim.GroupMeta))[0]}
    # BN is frozen
    assert not flat["cnn/resnet/stem/bn/scale"].trainable
    assert not flat["cnn/resnet/stem/bn/bias"].trainable
    # grid_encoder is the cnn "top" prefix group with lr_mul
    gm = flat["cnn/grid_encoder/conv/kernel"]
    assert gm.use_cnn_lr and gm.lr_mul == 2.0 and gm.group_id == 4
    # kernel = decay, bias/ln = no decay
    assert flat["transformer/bert/encoder/q/kernel"].weight_decay > 0
    assert flat["transformer/bert/encoder/q/bias"].weight_decay == 0
    assert flat["transformer/bert/encoder/ln/scale"].weight_decay == 0
    # transformer non-top groups: ids 2 (decay), 3 (no decay)
    assert flat["transformer/bert/encoder/q/kernel"].group_id == 2
    assert flat["transformer/bert/encoder/q/bias"].group_id == 3


def test_freeze_cnn():
    cfg = optim.OptimConfig(freeze_cnn=True)
    meta = optim.build_group_meta(_toy_params(), cfg)
    for path, m in jax.tree_util.tree_flatten_with_path(
            meta, is_leaf=lambda x: isinstance(x, optim.GroupMeta))[0]:
        name = optim._path_str(path)
        if name.startswith("cnn"):
            assert not m.trainable, name


def _reference_adamw_step(p, g, m, v, t, lr, b1, b2, eps, wd):
    """HF AdamW math (reference adamw.py:60-101), numpy."""
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    step_size = lr * np.sqrt(1 - b2 ** t) / (1 - b1 ** t)
    p = p - step_size * m / (np.sqrt(v) + eps)
    p = p - lr * wd * p
    return p, m, v


def test_adamw_matches_reference_math():
    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 1, (4, 4)).astype(np.float32)
    params = {"transformer": {"x": {"kernel": jnp.asarray(w0)}}}
    cfg = optim.OptimConfig(learning_rate=1e-2, weight_decay=0.1,
                            betas=(0.9, 0.98), grad_norm=-1)
    meta = optim.build_group_meta(params, cfg)
    state = optim.init_adamw_state(params)

    p_ref = w0.copy()
    m_ref = np.zeros_like(w0)
    v_ref = np.zeros_like(w0)
    p_cur = params
    for t in range(1, 4):
        g = rng.normal(0, 1, (4, 4)).astype(np.float32)
        grads = {"transformer": {"x": {"kernel": jnp.asarray(g)}}}
        p_cur, state, _ = optim.adamw_update(
            p_cur, grads, state, meta, cfg,
            lr_transformer=jnp.float32(1e-2), lr_cnn=jnp.float32(1e-2))
        p_ref, m_ref, v_ref = _reference_adamw_step(
            p_ref, g, m_ref, v_ref, t, 1e-2, 0.9, 0.98, 1e-6, 0.1)
    np.testing.assert_allclose(
        np.asarray(p_cur["transformer"]["x"]["kernel"]), p_ref,
        rtol=1e-5, atol=1e-6)


def test_frozen_leaves_unchanged():
    params = _toy_params()
    cfg = optim.OptimConfig(grad_norm=-1)
    meta = optim.build_group_meta(params, cfg)
    state = optim.init_adamw_state(params)
    grads = jax.tree.map(jnp.ones_like, params)
    new_p, _, _ = optim.adamw_update(params, grads, state, meta, cfg,
                                     jnp.float32(0.1), jnp.float32(0.1))
    np.testing.assert_array_equal(
        np.asarray(new_p["cnn"]["resnet"]["stem"]["bn"]["scale"]),
        np.asarray(params["cnn"]["resnet"]["stem"]["bn"]["scale"]))
    assert not np.allclose(
        np.asarray(new_p["cnn"]["grid_encoder"]["conv"]["kernel"]),
        np.asarray(params["cnn"]["grid_encoder"]["conv"]["kernel"]))


def test_grad_clip_matches_torch_semantics():
    grads = {"a": jnp.asarray(np.full((3,), 4.0, np.float32))}
    clipped, norm = optim.clip_by_global_norm(grads, 2.0)
    expected_norm = np.sqrt(3 * 16.0)
    np.testing.assert_allclose(float(norm), expected_norm, rtol=1e-6)
    coef = 2.0 / (expected_norm + 1e-6)
    np.testing.assert_allclose(np.asarray(clipped["a"]), 4.0 * coef, rtol=1e-6)


def _ref_warmup_linear(step, warmup, tot):
    if step < warmup:
        return step / warmup
    return max(0, (tot - step) / (tot - warmup))


def _ref_noam(step, warmup):
    if step <= warmup:
        return step / warmup
    return warmup ** 0.5 * step ** -0.5


def _ref_multi_step(n_epoch, milestones, gamma=0.5):
    milestones = sorted(milestones)
    for i, m in enumerate(milestones):
        if n_epoch < m:
            return gamma ** i
    return gamma ** (len(milestones) + 1)


def test_schedules_match_reference():
    tot, warm = 1000, 100
    for step in [0, 1, 50, 100, 101, 500, 999, 1000]:
        got = float(sched.get_lr(step, "linear", 1.0, tot, 0.1))
        ref = max(_ref_warmup_linear(step, warm, tot), 1e-8)
        np.testing.assert_allclose(got, ref, rtol=1e-5, err_msg=f"linear {step}")
        got = float(sched.get_lr(step, "invsqrt", 1.0, tot, 0.1))
        ref = max(_ref_noam(step, warm) if step > 0 else 0, 1e-8)
        np.testing.assert_allclose(got, ref, rtol=1e-5, err_msg=f"invsqrt {step}")
    for ep in [0, 2, 5, 11, 20]:
        got = float(sched.get_lr(0, "multi_step", 1.0, tot, 0.1,
                                 decay_epochs=[5, 10], multi_step_epoch=ep))
        ref = max(_ref_multi_step(ep, [5, 10]), 1e-8)
        np.testing.assert_allclose(got, ref, rtol=1e-5, err_msg=f"ms {ep}")


def test_grad_clip_excludes_frozen_leaves():
    """The reference clips only optimizer params (requires_grad); frozen
    leaves must not contribute to the global norm or the clip coefficient."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.train import optim

    params = {"transformer": {"w": jnp.ones((4,))},
              "cnn": {"w": jnp.ones((4,))}}
    cfg = optim.OptimConfig(grad_norm=2.0, freeze_cnn=True,
                            weight_decay=0.0, cnn_weight_decay=0.0)
    meta = optim.build_group_meta(params, cfg)
    state = optim.init_adamw_state(params)
    grads = {"transformer": {"w": jnp.full((4,), 0.5)},
             "cnn": {"w": jnp.full((4,), 1e3)}}   # huge FROZEN grads
    _, _, norm = optim.adamw_update(params, grads, state, meta, cfg,
                                    jnp.float32(1e-3), jnp.float32(1e-3))
    # norm counts only the trainable leaf: sqrt(4 * 0.25) = 1.0 (< 2.0, so
    # the trainable update is NOT scaled down by the frozen junk)
    np.testing.assert_allclose(float(norm), 1.0, rtol=1e-5)


def test_first_step_lr_matches_reference_schedule():
    """Reference increments global_step BEFORE get_lr_sched, so update #1
    runs at lr = base/warmup_steps, not the 1e-8 floor."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.core.config import ModelConfig
    from clipbert_tpu.models import clipbert
    from clipbert_tpu.train import optim, steps

    cfg = ModelConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=32,
                      max_grid_row_position_embeddings=4,
                      max_grid_col_position_embeddings=4,
                      num_labels=2, loss_type="ce")
    ts = steps.TaskSettings(head_type="seq_cls", num_labels=2,
                            loss_type="ce", train_n_clips=1, group_size=1)
    oc = optim.OptimConfig(learning_rate=1e-3, cnn_learning_rate=1e-3)
    ss = steps.ScheduleSettings(learning_rate=1e-3, cnn_learning_rate=1e-3,
                                num_train_steps=100, warmup_ratio=0.1)
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "seq_cls")
    meta = optim.build_group_meta(params, oc)
    step_fn = steps.make_train_step(cfg, ts, oc, ss, meta)
    state = steps.init_train_state(params)
    batch = {"text_input_ids": jnp.zeros((2, 6), jnp.int32),
             "text_input_mask": jnp.ones((2, 6), jnp.int32),
             "visual_inputs": jnp.zeros((2, 1, 64, 64, 3), jnp.float32),
             "labels": jnp.zeros((2,), jnp.int32)}
    _, metrics = step_fn(state, batch, jax.random.key(1))
    # warmup_linear(1, 10, 100) = 1/10 -> lr = 1e-4 (NOT the 1e-8 floor)
    np.testing.assert_allclose(float(metrics["lr"]), 1e-4, rtol=1e-5)


@pytest.mark.parametrize("opt_name", ["adamw", "adam", "adamax"])
def test_fused_update_exactly_matches_per_leaf(opt_name):
    """The group-fused update (one concatenated buffer per optimizer group,
    the production default) must match the per-leaf oracle across several
    steps, for every optimizer family, with frozen leaves, lr_mul prefix
    groups, and clipping in play. The per-element math is the shared
    _elementwise_update, so the only permitted difference is the global-
    norm reduction order (per-leaf partials vs per-group vectors): one ulp
    on the clip coefficient."""
    rng = np.random.default_rng(3)

    def rand_tree(template):
        return jax.tree.map(
            lambda x: jnp.asarray(rng.normal(0, 1, x.shape), jnp.float32),
            template)

    params = rand_tree(_toy_params())
    cfg = optim.OptimConfig(optim=opt_name, learning_rate=1e-3,
                            cnn_learning_rate=2e-3, weight_decay=0.01,
                            cnn_weight_decay=0.02, grad_norm=1.0,
                            transformer_lr_mul=2.0,
                            transformer_lr_mul_prefix="classifier")
    meta = optim.build_group_meta(params, cfg)

    # cover BOTH fused paths: with the tiny toy leaves, a threshold of 8
    # elements routes the (4,4) kernels through the native-shape big-leaf
    # path and the biases through the per-group concat path
    orig_thresh = optim._FUSE_CONCAT_MAX_ELEMS
    optim._FUSE_CONCAT_MAX_ELEMS = 8
    try:
        s_ref = optim.init_adamw_state(params)
        s_fused = optim.init_adamw_state(params)
        p_ref = p_fused = params
        for step in range(3):
            grads = rand_tree(params)
            p_ref, s_ref, n_ref = optim.adamw_update(
                p_ref, grads, s_ref, meta, cfg, jnp.float32(1e-3),
                jnp.float32(2e-3), fused=False)
            p_fused, s_fused, n_fused = optim.adamw_update(
                p_fused, grads, s_fused, meta, cfg, jnp.float32(1e-3),
                jnp.float32(2e-3), fused=True)
            np.testing.assert_allclose(float(n_ref), float(n_fused),
                                       rtol=1e-6)
            for ta, tb in ((p_ref, p_fused), (s_ref.mu, s_fused.mu),
                           (s_ref.nu, s_fused.nu)):
                for a, b in zip(jax.tree.leaves(ta), jax.tree.leaves(tb)):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(b), rtol=2e-6, atol=1e-7)
        assert int(s_fused.step) == 3
    finally:
        optim._FUSE_CONCAT_MAX_ELEMS = orig_thresh
