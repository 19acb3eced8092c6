"""Fused-attention A/B on the real TPU at the retrieval scoring shape.

The eval/serving scoring encoder runs at ~59 TF/s of the 92 TF/s chip
ceiling (PARITY.md "Retrieval eval at MSRVTT scale"); the non-matmul
residue is the attention core — tiny (S,dh)x(dh,S) batched matmuls plus an
fp32 (B,H,S,S) score tensor XLA materializes in HBM between them. Three
timings bound and measure the lever:

  einsum       the production XLA path (ops/attention.py)
  fused        ops/pallas_attention.py VMEM-resident kernel
  no_attn_core upper bound: attention replaced by the value projection
               (what the encoder would cost if the attention core were free)

Usage: python scripts/perf_attn_ab.py [variant ...]   (TPU, not CPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from clipbert_tpu.core import compile_cache
compile_cache.enable()

from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.models import bert
from clipbert_tpu.ops.activations import ACT2FN
from clipbert_tpu.ops.layernorm import layer_norm
from clipbert_tpu.ops.linear import linear

B, S = 8192, 69          # 8 videos x 16 clips x 64 captions; 20 txt + 49 grid


def timeit(fn, args, iters=3, desc=""):
    @jax.jit
    def loop(args):
        def body(carry, _):
            return fn(carry, *args), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return acc

    t0 = time.perf_counter()
    acc = float(np.asarray(loop(args)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = float(np.asarray(loop(args)))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(acc), (desc, acc)
    # big-matmul FLOPs only (QKVO + FFN), the MFU accounting convention
    flops = B * S * 12 * (4 * 768 * 768 + 2 * 768 * 3072) * 2
    print(f"  {desc}: {dt * 1000:.1f} ms/pass = {flops / dt / 1e12:.1f} TF/s "
          f"(compile {compile_s:.0f}s)", flush=True)
    return dt


def perturb(x, c):
    return x + (c * 1e-30).astype(x.dtype)


def main():
    want = set(sys.argv[1:])
    cfg = ModelConfig()          # BERT-base defaults
    rng = np.random.default_rng(0)
    p = jax.device_put(bert.init_encoder(jax.random.key(0), cfg))
    hidden = jax.device_put(jnp.asarray(
        rng.standard_normal((B, S, 768)) * 0.02, jnp.bfloat16))
    mask = np.ones((B, S), np.float32)
    mask[:, 12:20] = 0.0         # some padded text positions, like real runs
    bias = jax.device_put(bert.extended_attention_mask(jnp.asarray(mask)))

    # correctness: fused == einsum on a small slice, on this backend
    # (skipped when specific variants are requested — parity is pinned by
    # tests/test_pallas_kernels.py; the two extra compiles are dead time)
    if not want or "check" in want:
        small = 64
        a = bert.encoder(p, hidden[:small], bias[:small], cfg, unroll=True)
        b = bert.encoder(p, hidden[:small], bias[:small], cfg, unroll=True,
                         fused_attn=True)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - b.astype(jnp.float32))))
        print(f"  fused-vs-einsum max abs diff (12 layers, bf16): {err:.5f}",
              flush=True)

    def run(name, fn, args):
        if want and name not in want:
            return
        timeit(fn, args, desc=name)

    # params ride as jit ARGUMENTS (closed-over arrays ship as HLO
    # constants -> the remote compile endpoint rejects the 340MB body)
    run("einsum",
        lambda c, h, pp: bert.encoder(pp, perturb(h, c), bias, cfg,
                                      unroll=True)
        .astype(jnp.float32)[:, 0, 0].sum(), (hidden, p))

    run("fused",
        lambda c, h, pp: bert.encoder(pp, perturb(h, c), bias, cfg,
                                      unroll=True, fused_attn=True)
        .astype(jnp.float32)[:, 0, 0].sum(), (hidden, p))

    # upper bound: the encoder with the attention core free (ctx = V)
    def no_core_encoder(h, pp):
        def layer_fn(h, lp):
            ctx = linear(h, lp["attention"]["self"]["value"])
            # keep q/k projections live (their FLOPs are in the model):
            # tiny-scaled add instead of dead code XLA would DCE
            ctx = ctx + 1e-30 * (linear(h, lp["attention"]["self"]["query"])
                                 + linear(h, lp["attention"]["self"]["key"]))
            a = linear(ctx, lp["attention"]["output"]["dense"])
            h = layer_norm(a + h, lp["attention"]["output"]["ln"]["scale"],
                           lp["attention"]["output"]["ln"]["bias"],
                           cfg.layer_norm_eps)
            inter = ACT2FN[cfg.hidden_act](
                linear(h, lp["intermediate"]["dense"]))
            out = linear(inter, lp["output"]["dense"])
            h = layer_norm(out + h, lp["output"]["ln"]["scale"],
                           lp["output"]["ln"]["bias"], cfg.layer_norm_eps)
            return h, None
        h, _ = jax.lax.scan(layer_fn, h, pp, unroll=cfg.num_hidden_layers)
        return h

    run("no_attn_core",
        lambda c, h, pp: no_core_encoder(perturb(h, c), pp)
        .astype(jnp.float32)[:, 0, 0].sum(), (hidden, p))

    # ---- train-step shape (VERDICT r4 #8) --------------------------------
    # The train step's BERT batch is ~128 joint sequences (mil_forward at
    # the MSRVTT train config). The fused kernel has no backward (it is
    # deliberately inference-only, ops/pallas_attention.py), so the honest
    # A/B is: the FORWARD delta at this shape IS the fwd+bwd delta — a
    # kernel-fwd/einsum-bwd hybrid would share the identical einsum
    # backward, and remat only repeats the forward (doubling the delta,
    # not changing its sign). train_fwdbwd_einsum gives the full-step
    # denominator so the delta can be expressed as % of a train pass.
    tb, ts_ = 128, S
    t_hidden = jax.device_put(jnp.asarray(
        rng.standard_normal((tb, ts_, 768)) * 0.02, jnp.bfloat16))
    t_bias = jax.device_put(
        bert.extended_attention_mask(jnp.asarray(mask[:tb])))

    def t_timeit(name, fn, args, flops):
        if want and name not in want:
            return

        @jax.jit
        def loop(args):
            def body(carry, _):
                return fn(carry, *args), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=30)
            return acc

        t0 = time.perf_counter()
        acc = float(np.asarray(loop(args)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        acc = float(np.asarray(loop(args)))
        dt = (time.perf_counter() - t0) / 30
        assert np.isfinite(acc), (name, acc)
        print(f"  {name}: {dt * 1000:.2f} ms/pass = "
              f"{flops / dt / 1e12:.1f} TF/s (compile {compile_s:.0f}s)",
              flush=True)

    t_flops = tb * ts_ * 12 * (4 * 768 * 768 + 2 * 768 * 3072) * 2

    t_timeit("train_fwd_einsum",
             lambda c, h, pp: bert.encoder(pp, perturb(h, c), t_bias, cfg)
             .astype(jnp.float32)[:, 0, 0].sum(), (t_hidden, p), t_flops)

    t_timeit("train_fwd_fused",
             lambda c, h, pp: bert.encoder(pp, perturb(h, c), t_bias, cfg,
                                           fused_attn=True)
             .astype(jnp.float32)[:, 0, 0].sum(), (t_hidden, p), t_flops)

    def fwdbwd(c, h, pp):
        def loss(hh, ppp):
            return bert.encoder(ppp, hh, t_bias, cfg).astype(
                jnp.float32).sum()
        # differentiate wrt the params TOO and consume every weight-grad
        # leaf in full — grad-wrt-input-only skips all the x^T@dy dW
        # matmuls (and fetching a single element lets XLA slice-DCE them),
        # which would undercount the 3x-forward train pass by ~1x
        l, (gh, gp) = jax.value_and_grad(loss, argnums=(0, 1))(
            perturb(h, c), pp)
        gp_sum = sum(leaf.astype(jnp.float32).sum()
                     for leaf in jax.tree_util.tree_leaves(gp))
        return l * 0 + gh.astype(jnp.float32)[:, 0, 0].sum() + gp_sum

    t_timeit("train_fwdbwd_einsum", fwdbwd, (t_hidden, p), 3 * t_flops)


if __name__ == "__main__":
    main()
