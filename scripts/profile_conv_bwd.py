"""Kernel-level attribution of the train step's conv backward (the MFU wall).

Captures a jax.profiler trace of the isolated CNN fwd+bwd at the MSRVTT
train shape (the same unit scripts/perf_conv_bwd_ab.py times) on the real
chip, parses the xplane with xprof's op_profile converter, and prints the
top HLO ops by device self-time — the profile-backed evidence VERDICT r3
asked for behind PARITY.md's "conv backward is the bound" claim.

Usage: python scripts/profile_conv_bwd.py [--remat early] [--full-step]
"""

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from clipbert_tpu.core import compile_cache
from clipbert_tpu.core.config import ModelConfig
from clipbert_tpu.models import clipbert

N_VISUALS = 64          # 8 videos x 8 clips
NUM_FRM = 2
IMG = 448


def parse_hlo_stats(raw):
    """xprof hlo_stats table -> list of dicts (one per HLO op).

    hlo_stats is the reliable tool here: per-op SELF time, occurrences, the
    roofline "Bound by" verdict and measured HBM bandwidth. (op_profile's
    tree aggregates in ways that do not sum to device time — it
    under-reported this workload ~7x; do not use it for attribution.)
    """
    d = json.loads(raw if isinstance(raw, str) else raw.decode())
    cols = [c["label"] for c in d["cols"]]
    i = {k: cols.index(k) for k in (
        "HLO op category", "HLO op name", "#Occurrences",
        "Total self time (us)", "Bound by", "Model GFLOP/s",
        "Measured memory BW (GiB/s)",
        "Operational intensity (FLOPS/Byte)")}
    out = []
    for r in d["rows"]:
        v = [c.get("v") for c in r["c"]]
        out.append({"category": v[i["HLO op category"]],
                    "op": v[i["HLO op name"]],
                    "n": int(v[i["#Occurrences"]]),
                    "us": v[i["Total self time (us)"]],
                    "bound": v[i["Bound by"]],
                    "tf": v[i["Model GFLOP/s"]] / 1e3,
                    "bw": v[i["Measured memory BW (GiB/s)"]],
                    "oi": v[i["Operational intensity (FLOPS/Byte)"]]})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", default="early")
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()
    remat = {"False": False, "True": True}.get(args.remat, args.remat)

    compile_cache.enable()
    cfg = ModelConfig()
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    p_cnn = jax.device_put(params["cnn"])
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((N_VISUALS, NUM_FRM, IMG, IMG, 3)) * 0.5,
        jnp.bfloat16))

    def loss(p, x):
        return jnp.sum(clipbert.cnn_forward(p, x, jnp.bfloat16,
                                            remat=remat).astype(jnp.float32))

    @jax.jit
    def step(p, x):
        g = jax.grad(loss)(p, x)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree.leaves(g))

    assert np.isfinite(float(step(p_cnn, x)))           # compile outside trace

    tmp = tempfile.mkdtemp(prefix="prof_conv_")
    jax.profiler.start_trace(tmp)
    acc = step(p_cnn, x)          # ONE step: self-times then equal per-step
    assert np.isfinite(float(acc))
    jax.profiler.stop_trace()

    from xprof.convert import raw_to_tool_data as r2t
    fs = glob.glob(os.path.join(tmp, "plugins/profile/*/*.xplane.pb"))
    data, _ = r2t.xspace_to_tool_data(fs, "hlo_stats", {})
    ops = parse_hlo_stats(data)
    total = sum(o["us"] for o in ops)

    bycat, bybound = {}, {}
    for o in ops:
        bycat[o["category"]] = bycat.get(o["category"], 0.0) + o["us"]
        bybound[o["bound"]] = bybound.get(o["bound"], 0.0) + o["us"]
    print(json.dumps({"remat": str(remat), "n_ops": len(ops),
                      "total_device_ms": round(total / 1e3, 1)}))
    print(json.dumps({"by_category_pct": {
        k: round(100 * v / total, 1)
        for k, v in sorted(bycat.items(), key=lambda kv: -kv[1])[:8]}}))
    print(json.dumps({"by_bound_pct": {
        str(k): round(100 * v / total, 1)
        for k, v in sorted(bybound.items(), key=lambda kv: -kv[1])}}))
    for o in sorted(ops, key=lambda o: -o["us"])[:args.top]:
        print(json.dumps({
            "op": o["op"][:60], "category": o["category"], "n": o["n"],
            "ms": round(o["us"] / 1e3, 2),
            "pct": round(100 * o["us"] / total, 1), "bound": o["bound"],
            "tf_per_sec": round(o["tf"], 1), "hbm_GiBps": round(o["bw"]),
            "flops_per_byte": round(o["oi"], 1)}))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
