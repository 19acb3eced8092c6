"""int8 inference-scoring path: quantization numerics and e2e parity.

The opt-in path (ops/linear.py quantize_dense/_qlinear +
models/clipbert.quantize_scoring_params + the merged int8-QKV branch in
ops/attention.py) trades a small, bounded score perturbation for 1.5x
matmul throughput on the MXU. These tests pin:
 - per-channel quantized matmul error against the known quantization bound,
 - merged-QKV int8 projection == three separate quantized matmuls (exact:
   the per-channel scales concatenate alongside their kernel columns),
 - stacked (L, d_in, d_out) encoder kernels quantize layerwise-identically,
 - end-to-end: quantized scoring probabilities track the fp oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.models import clipbert as cb
import importlib

# the ops package re-exports the `linear` FUNCTION under the same name,
# shadowing the module attribute — fetch the module explicitly
lin = importlib.import_module("clipbert_tpu.ops.linear")
from clipbert_tpu.ops.attention import multi_head_attention

TINY = ModelConfig(
    vocab_size=99, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=64, backbone_channel_in_size=2048,
    num_labels=2, loss_type="ce",
    hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


def _dense(rng, d_in, d_out):
    return {"kernel": jnp.asarray(
                rng.normal(0, 0.05, (d_in, d_out)).astype(np.float32)),
            "bias": jnp.asarray(
                rng.normal(0, 0.01, (d_out,)).astype(np.float32))}


def test_qlinear_error_bound(rng_np):
    """int8xint8 per-channel matmul stays within the analytic quantization
    bound: |err| <= sum_k (|x_k| dW + |W_k| dx + dx dW) per output, with
    dx/dW the row/col quantization steps (scale/2... conservatively scale)."""
    d_in, d_out, B = 64, 48, 16
    p = _dense(rng_np, d_in, d_out)
    x = jnp.asarray(rng_np.normal(0, 1.0, (B, d_in)).astype(np.float32))
    y_fp = lin.linear(x, p)
    y_q = lin.linear(x, lin.quantize_dense(p))
    # conservative bound: rounding steps are (absmax/127) per row/col
    dx = np.abs(np.asarray(x)).max(-1, keepdims=True) / 127.0
    dW = np.abs(np.asarray(p["kernel"])).max(0, keepdims=True) / 127.0
    # per-element rounding error <= 0.5 step on each side
    bound = (0.5 * dx * np.abs(np.asarray(p["kernel"])).sum(0, keepdims=True) / 1.0
             + 0.5 * dW * np.abs(np.asarray(x)).sum(-1, keepdims=True)
             + 0.25 * d_in * dx * dW)
    err = np.abs(np.asarray(y_q) - np.asarray(y_fp))
    assert (err <= bound + 1e-5).all(), (err.max(), bound.min())
    # and it is genuinely close in relative terms
    assert err.max() / (np.abs(np.asarray(y_fp)).max() + 1e-9) < 0.05


def test_merged_qkv_int8_equals_separate(rng_np):
    """The merged int8 QKV projection in ops/attention must equal running
    the three quantized matmuls separately — scales concatenate alongside
    their kernel columns, so the math is identical, not just close."""
    D = 32
    params = {n: _dense(rng_np, D, D) for n in ("query", "key", "value")}
    qparams = {n: lin.quantize_dense(params[n]) for n in params}
    # bias survives quantize_dense
    for n in params:
        assert "bias" in qparams[n]
    x = jnp.asarray(rng_np.normal(0, 1.0, (3, 7, D)).astype(np.float32))
    sep = [lin.linear(x, qparams[n]) for n in ("query", "key", "value")]

    merged = {"kernel_i8": jnp.concatenate(
                  [qparams[n]["kernel_i8"]
                   for n in ("query", "key", "value")], axis=1),
              "kscale": jnp.concatenate(
                  [qparams[n]["kscale"] for n in ("query", "key", "value")]),
              "bias": jnp.concatenate(
                  [qparams[n]["bias"] for n in ("query", "key", "value")])}
    out = lin.linear(x, merged)
    q, k, v = jnp.split(out, 3, axis=-1)
    for got, want in zip((q, k, v), sep):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_attention_int8_branch_matches_quantized_oracle(rng_np):
    """multi_head_attention with int8 QKV params equals an attention built
    from the separately-quantized q/k/v projections (the merged branch
    changes the projection layout, never the numbers)."""
    B, L, D, H = 2, 9, 32, 4
    params = {n: _dense(rng_np, D, D) for n in ("query", "key", "value")}
    qparams = {n: lin.quantize_dense(params[n]) for n in params}
    x = jnp.asarray(rng_np.normal(0, 1.0, (B, L, D)).astype(np.float32))
    mask = jnp.zeros((B, 1, 1, L), jnp.float32)

    got = multi_head_attention(x, qparams, H, mask_bias=mask)

    # oracle: separate quantized projections -> einsum attention
    q, k, v = (lin.linear(x, qparams[n]).reshape(B, L, H, D // H)
               for n in ("query", "key", "value"))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(D // H))
    probs = jax.nn.softmax(scores + mask, axis=-1)
    want = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(x.dtype), v,
                      preferred_element_type=jnp.float32
                      ).astype(x.dtype).reshape(B, L, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_stacked_kernels_quantize_layerwise(rng_np):
    """(L, d_in, d_out) stacked encoder kernels quantize in one call
    identically to quantizing each layer's slice separately."""
    L, d_in, d_out = 3, 16, 8
    w = rng_np.normal(0, 0.05, (L, d_in, d_out)).astype(np.float32)
    stacked = lin.quantize_dense({"kernel": jnp.asarray(w)})
    for i in range(L):
        one = lin.quantize_dense({"kernel": jnp.asarray(w[i])})
        np.testing.assert_array_equal(np.asarray(stacked["kernel_i8"][i]),
                                      np.asarray(one["kernel_i8"]))
        np.testing.assert_allclose(np.asarray(stacked["kscale"][i]),
                                   np.asarray(one["kscale"]), rtol=1e-7)


@pytest.fixture(scope="module")
def e2e_params():
    return cb.init_clipbert(jax.random.PRNGKey(0), TINY, "retrieval")


def test_quantized_scoring_parity_e2e(e2e_params, rng_np):
    """Full scoring program (CNN feats -> BERT -> head -> softmax probs):
    the int8-quantized transformer tracks the fp oracle closely and
    preserves the caption ranking on a spread-out score set."""
    from clipbert_tpu.train import steps

    ts = steps.TaskSettings(head_type="retrieval", num_labels=2,
                            loss_type="ce", score_agg_func="lse",
                            train_n_clips=1, group_size=1)
    B_t, Lt = 6, 8
    feats = jnp.asarray(
        rng_np.normal(0, 1.0, (1, 1, 2, 2, 2, TINY.hidden_size))
        .astype(np.float32))
    ids = jnp.asarray(rng_np.integers(4, TINY.vocab_size, (B_t, Lt)),
                      jnp.int32)
    mask = jnp.ones((B_t, Lt), jnp.int32)

    prob_fn = steps.make_text_prob_step(TINY, ts, compute_dtype=jnp.float32,
                                        fused_attn=False)
    p_fp = np.asarray(prob_fn(e2e_params, feats, ids, mask))[0]
    qp = cb.quantize_scoring_params(e2e_params)
    p_q = np.asarray(prob_fn(qp, feats, ids, mask))[0]

    assert np.isfinite(p_q).all()
    np.testing.assert_allclose(p_q, p_fp, atol=0.08)
    # CNN params untouched: quantization applies to the transformer only
    assert jax.tree.all(jax.tree.map(
        lambda a, b: bool((np.asarray(a) == np.asarray(b)).all()),
        qp["cnn"], e2e_params["cnn"]))


def test_quantize_scoring_params_structure(e2e_params):
    qp = cb.quantize_scoring_params(e2e_params)
    enc = qp["transformer"]["bert"]["encoder"]
    for n in ("query", "key", "value"):
        assert "kernel_i8" in enc["attention"]["self"][n]
        assert enc["attention"]["self"][n]["kernel_i8"].dtype == jnp.int8
    assert "kernel_i8" in enc["intermediate"]["dense"]
    assert "kernel_i8" in enc["output"]["dense"]
    assert "kernel_i8" in qp["transformer"]["bert"]["pooler"]["dense"]
    assert "kernel_i8" in qp["transformer"]["classifier"]["fc1"]
    # LNs and embeddings stay fp
    assert "kernel_i8" not in str(
        jax.tree.structure(qp["transformer"]["bert"]["embeddings"]))
    assert enc["attention"]["output"]["ln"]["scale"].dtype == jnp.float32
