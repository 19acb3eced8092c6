"""Pallas fused matmul+BN+act kernel parity (interpret mode on the CPU
test mesh; the same kernel compiles natively on TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from clipbert_tpu.models import resnet
from clipbert_tpu.ops.pallas_kernels import conv1x1_bn_act, matmul_bn_act


def test_matmul_bn_act_matches_reference_math(rng_np):
    x = jnp.asarray(rng_np.standard_normal((100, 64)), jnp.float32)
    w = jnp.asarray(rng_np.standard_normal((64, 96)) * 0.1, jnp.float32)
    s = jnp.asarray(rng_np.standard_normal(96), jnp.float32)
    b = jnp.asarray(rng_np.standard_normal(96), jnp.float32)
    r = jnp.asarray(rng_np.standard_normal((100, 96)), jnp.float32)

    want = np.maximum((np.asarray(x) @ np.asarray(w)) * np.asarray(s)
                      + np.asarray(b) + np.asarray(r), 0)
    got = matmul_bn_act(x, w, s, b, residual=r, relu=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)

    # no-relu / no-residual path
    want2 = (np.asarray(x) @ np.asarray(w)) * np.asarray(s) + np.asarray(b)
    got2 = matmul_bn_act(x, w, s, b, relu=False)
    np.testing.assert_allclose(np.asarray(got2), want2, rtol=2e-5, atol=2e-5)


def test_conv1x1_strided(rng_np):
    x = jnp.asarray(rng_np.standard_normal((2, 8, 8, 16)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((1, 1, 16, 32)) * 0.1, jnp.float32)
    s = jnp.ones(32, jnp.float32)
    b = jnp.zeros(32, jnp.float32)
    got = conv1x1_bn_act(x, k, s, b, stride=2, relu=False)
    want = resnet.conv2d(x, k, stride=2, padding="VALID")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pallas_resnet_matches_xla(rng_np):
    p = resnet.init_resnet50(jax.random.key(0))
    x = jnp.asarray(rng_np.standard_normal((1, 64, 64, 3)), jnp.float32)
    a = resnet.resnet50_forward(p, x, use_pallas=False)
    b = resnet.resnet50_forward(p, x, use_pallas=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-3, atol=1e-3)


def test_fused_stem_pool_matches_xla_stem(rng_np):
    """Pallas fused stem (conv7x7/s2 + BN + relu + maxpool3x3/s2) is exact
    vs the XLA stem path, across shapes incl. non-square and band counts."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.models import resnet
    from clipbert_tpu.ops import pallas_stem

    for shape in [(2, 64, 64, 3), (1, 48, 80, 3), (2, 32, 32, 3)]:
        x = jnp.asarray(rng_np.standard_normal(shape), jnp.float32)
        k = jnp.asarray(rng_np.standard_normal((7, 7, 3, 64)) * 0.05,
                        jnp.float32)
        scale = jnp.asarray(0.5 + rng_np.random(64), jnp.float32)
        bias = jnp.asarray(rng_np.standard_normal(64), jnp.float32)
        h = resnet.conv2d(x, k, 2, [(3, 3), (3, 3)])
        h = jax.nn.relu(h * scale + bias)
        ref = resnet.max_pool(h, 3, 2, [(0, 0), (1, 1), (1, 1), (0, 0)])
        wp = jnp.asarray(pallas_stem.pack_stem_weights(k, scale))
        got = pallas_stem.fused_stem_pool(x, wp, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_bottleneck_with_folded_params(rng_np):
    """use_pallas must accept fold_bn_scales() output (bias-only BN nodes)."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.models import resnet
    p = resnet.init_resnet50(jax.random.key(2))
    pf = resnet.fold_bn_scales(p)
    x = jnp.asarray(rng_np.standard_normal((1, 64, 64, 3)), jnp.float32)
    ref = resnet.resnet50_forward(pf, x, use_pallas=False)
    got = resnet.resnet50_forward(pf, x, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_attention_matches_einsum_path(rng_np):
    """The Pallas attention kernel must equal the production einsum math
    exactly-enough (same fp32 softmax, fp32-accumulated matmuls), including
    masked key positions and batch padding to the block size."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.models.bert import extended_attention_mask
    from clipbert_tpu.ops.attention import multi_head_attention
    from clipbert_tpu.ops.pallas_attention import BLK_B

    D, H = 32, 4
    k1 = jax.random.key(3)
    params = {
        n: {"kernel": jnp.asarray(rng_np.standard_normal((D, D)) * 0.1,
                                  jnp.float32),
            "bias": jnp.asarray(rng_np.standard_normal(D) * 0.1, jnp.float32)}
        for n in ("query", "key", "value")}
    for B, L in [(3, 11), (BLK_B, 16), (2 * BLK_B + 1, 7)]:
        hidden = jnp.asarray(rng_np.standard_normal((B, L, D)), jnp.float32)
        mask = (rng_np.random((B, L)) > 0.3).astype(np.float32)
        mask[:, 0] = 1.0
        bias = extended_attention_mask(jnp.asarray(mask))
        ref = multi_head_attention(hidden, params, H, bias, fused=False)
        got = multi_head_attention(hidden, params, H, bias, fused=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
    # dropout-live calls must keep the einsum path (fused has no prob dropout)
    hidden = jnp.asarray(rng_np.standard_normal((4, 6, D)), jnp.float32)
    bias = extended_attention_mask(jnp.ones((4, 6)))
    drop = multi_head_attention(hidden, params, H, bias, dropout_rate=0.5,
                                dropout_key=k1, fused=True)
    ref = multi_head_attention(hidden, params, H, bias, dropout_rate=0.5,
                               dropout_key=k1, fused=False)
    np.testing.assert_allclose(np.asarray(drop), np.asarray(ref), rtol=1e-6)


def test_fused_attention_in_scoring_program(rng_np):
    """make_text_prob_step(fused_attn=True) — the production TPU inference
    configuration (steps.fused_attn_default) — equals the einsum scoring
    program on the same cached features and captions."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.core.config import ModelConfig
    from clipbert_tpu.models import clipbert
    from clipbert_tpu.train import steps

    cfg = ModelConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_grid_row_position_embeddings=8,
                      max_grid_col_position_embeddings=8, num_labels=2)
    ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                            loss_type="ce", score_agg_func="lse",
                            train_n_clips=2, group_size=1)
    params = clipbert.init_clipbert(jax.random.key(1), cfg, "retrieval")
    # cached grid features: (B_v=2 videos, nc=2 clips, T=1, 3, 3, D)
    feats = jnp.asarray(rng_np.standard_normal((2, 2, 1, 3, 3, 32)) * 0.1,
                        jnp.float32)
    ids = jnp.asarray(rng_np.integers(0, 64, (5, 7)), jnp.int32)
    mask = np.ones((5, 7), np.int32)
    mask[:, 5:] = 0
    mask = jnp.asarray(mask)
    ref = steps.make_text_prob_step(cfg, ts, jnp.float32, fused_attn=False)(
        params, feats, ids, mask)
    got = steps.make_text_prob_step(cfg, ts, jnp.float32, fused_attn=True)(
        params, feats, ids, mask)
    assert got.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_attention_in_encoder(rng_np):
    """bert.encoder(fused_attn=True) == the default path on a 2-layer stack."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.core.config import ModelConfig
    from clipbert_tpu.models import bert
    cfg = ModelConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    p = bert.init_encoder(jax.random.key(0), cfg)
    hidden = jnp.asarray(rng_np.standard_normal((5, 9, 32)), jnp.float32)
    mask = np.ones((5, 9), np.float32)
    mask[:, 7:] = 0.0
    bias = bert.extended_attention_mask(jnp.asarray(mask))
    ref = bert.encoder(p, hidden, bias, cfg)
    got = bert.encoder(p, hidden, bias, cfg, fused_attn=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_sharded_scoring_program(rng_np):
    """make_text_prob_step(fused_attn=True, mesh=8-device mesh) — the
    multi-chip inference configuration — runs the Pallas kernel under
    shard_map over the caption axis and equals the plain GSPMD einsum
    program on the same cached features and captions."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.core.config import ModelConfig
    from clipbert_tpu.core.mesh import data_shard, make_mesh
    from clipbert_tpu.models import clipbert
    from clipbert_tpu.train import steps

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    cfg = ModelConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_grid_row_position_embeddings=8,
                      max_grid_col_position_embeddings=8, num_labels=2)
    ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                            loss_type="ce", score_agg_func="lse",
                            train_n_clips=2, group_size=1)
    params = clipbert.init_clipbert(jax.random.key(1), cfg, "retrieval")
    feats = jnp.asarray(rng_np.standard_normal((2, 2, 1, 3, 3, 32)) * 0.1,
                        jnp.float32)
    # caption minibatch divides the mesh data axis (inference_retrieval
    # rounds it up the same way) and is sharded like the production loader
    ids_np = rng_np.integers(0, 64, (8, 7)).astype(np.int32)
    mask_np = np.ones((8, 7), np.int32)
    mask_np[:, 5:] = 0
    ids = jax.device_put(ids_np, data_shard(mesh))
    mask = jax.device_put(mask_np, data_shard(mesh))
    ref = steps.make_text_prob_step(cfg, ts, jnp.float32, fused_attn=False)(
        params, feats, jnp.asarray(ids_np), jnp.asarray(mask_np))
    got = steps.make_text_prob_step(cfg, ts, jnp.float32, fused_attn=True,
                                    mesh=mesh)(params, feats, ids, mask)
    assert got.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_attention_tp_head_sharded(rng_np):
    """make_text_prob_step on a TENSOR-PARALLEL mesh (model axis > 1,
    Megatron param split) with the fused kernel: fused_attn_default returns
    the mesh and ops/attention.py routes the core through
    fused_attention_shard_heads — shard_map over (batch, HEADS) inside the
    GSPMD program. Must equal the einsum TP program AND the single-device
    reference (VERDICT r3 #8)."""
    import jax
    import jax.numpy as jnp
    from clipbert_tpu.core.config import ModelConfig
    from clipbert_tpu.core.mesh import MODEL_AXIS, data_shard, make_mesh
    from clipbert_tpu.models import clipbert
    from clipbert_tpu.parallel.sharding import param_shardings
    from clipbert_tpu.train import steps

    mesh = make_mesh(model_parallel=2)
    assert mesh.shape[MODEL_AXIS] == 2
    cfg = ModelConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_grid_row_position_embeddings=8,
                      max_grid_col_position_embeddings=8, num_labels=2)
    ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                            loss_type="ce", score_agg_func="lse",
                            train_n_clips=2, group_size=1)
    params = clipbert.init_clipbert(jax.random.key(1), cfg, "retrieval")
    feats = jnp.asarray(rng_np.standard_normal((2, 2, 1, 3, 3, 32)) * 0.1,
                        jnp.float32)
    ids_np = rng_np.integers(0, 64, (8, 7)).astype(np.int32)
    mask_np = np.ones((8, 7), np.int32)
    mask_np[:, 5:] = 0

    tp_params = jax.device_put(params, param_shardings(
        params, mesh, tensor_parallel=True))
    ids = jax.device_put(ids_np, data_shard(mesh))
    mask = jax.device_put(mask_np, data_shard(mesh))

    ref = steps.make_text_prob_step(cfg, ts, jnp.float32, fused_attn=False)(
        params, feats, jnp.asarray(ids_np), jnp.asarray(mask_np))
    tp_einsum = steps.make_text_prob_step(
        cfg, ts, jnp.float32, fused_attn=False, mesh=mesh)(
        tp_params, feats, ids, mask)
    tp_fused = steps.make_text_prob_step(
        cfg, ts, jnp.float32, fused_attn=mesh, mesh=mesh)(
        tp_params, feats, ids, mask)
    assert tp_fused.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(tp_einsum), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tp_fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_attn_default_tp_selector(monkeypatch):
    """Mode selection on a non-cpu backend: DP mesh -> True (whole-step
    shard_map), TP mesh with head-divisible model axis -> the mesh itself
    (head-sharded kernel), indivisible heads -> False (einsum)."""
    import jax
    from clipbert_tpu.core.mesh import make_mesh
    from clipbert_tpu.train import steps

    mesh_dp = make_mesh()
    mesh_tp = make_mesh(model_parallel=2)
    monkeypatch.setattr(steps.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(steps.jax, "local_device_count", lambda: 8)
    assert steps.fused_attn_default(mesh_dp) is True
    assert steps.fused_attn_default(mesh_tp, num_heads=12) is mesh_tp
    assert steps.fused_attn_default(mesh_tp, num_heads=5) is False
    assert steps.fused_attn_default(None) is False
