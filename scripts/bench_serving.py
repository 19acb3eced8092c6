"""Serving latency: single-query video+captions scoring on the real chip.

Measures `clipbert_tpu.serve.RetrievalScorer` end-to-end per query
(decode -> H2D -> device resize -> CNN encode -> joint scoring -> fetch)
at the low-latency configuration (n_clips=1) and the quality configuration
(n_clips=16), full BERT-base + R50 @ 448^2, bf16. Reports p50/p90 over
--queries runs plus the decode-only share, one JSON line per config.

Caveat on THIS dev box: every query pays the axon tunnel's H2D + RTT
(~10s of ms); production TPU hosts are PCIe-class, so treat the device
portion as the transferable number and the absolute p50 here as an upper
bound (CLAUDE.md "Measured environment facts").

Run with the box otherwise idle:
    python scripts/bench_serving.py [--queries 20]
"""

import argparse
import ctypes
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_mp4(w=320, h=240, frames=96, fps=12.0) -> bytes:
    nd = os.path.join(os.path.dirname(__file__), "..", "native")
    lib_path = os.path.join(nd, "libclipbert_data.so")
    if not os.path.exists(lib_path):
        subprocess.run(["make", "-C", nd], check=True)
    lib = ctypes.CDLL(lib_path)
    lib.venc_make_test_video.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double]
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "q.mp4")
        assert lib.venc_make_test_video(p.encode(), w, h, frames, fps) == 0
        with open(p, "rb") as f:
            return f.read()


def sustained_load(scorer, blob: bytes, captions, seconds: float,
                   clients: int, port: int = 8491):
    """N concurrent HTTP clients hammering /score for ~`seconds`:
    throughput + tail latency + recompile count under the concurrency the
    thread-safety argument in serve.py:22-33 covers. Recompiles are counted
    via jax.monitoring's backend-compile events — the documented worst-case
    race is a redundant duplicate compile, and after warmup there must be
    ZERO (asserted by the caller via the returned count)."""
    import base64
    import http.client
    import threading

    import jax

    from clipbert_tpu.serve import make_http_server

    server = make_http_server(scorer, port=port)
    srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
    srv_thread.start()
    payload = json.dumps({"video_b64": base64.b64encode(blob).decode(),
                          "captions": captions})
    headers = {"Content-Type": "application/json"}

    def one_request(conn):
        t0 = time.perf_counter()
        conn.request("POST", "/score", payload, headers)
        r = conn.getresponse()
        r.read()
        return r.status, (time.perf_counter() - t0) * 1e3

    # per-client warmup (connection + any residual compile) BEFORE the
    # compile counter arms
    conns = [http.client.HTTPConnection("127.0.0.1", port, timeout=120)
             for _ in range(clients)]
    for c in conns:
        status, _ = one_request(c)
        assert status == 200, status

    compiles = []
    try:
        jax.monitoring.register_event_duration_secs_listener(
            lambda name, *a, **kw: (compiles.append(name)
                                    if "compile" in name else None))
        compile_counter = True
    except Exception:                                  # noqa: BLE001
        compile_counter = False

    lock = threading.Lock()
    lat, errors = [], [0]
    stop_at = time.monotonic() + seconds

    def client(conn):
        while time.monotonic() < stop_at:
            try:
                status, ms = one_request(conn)
            except Exception:                          # noqa: BLE001
                with lock:
                    errors[0] += 1
                continue
            with lock:
                if status == 200:
                    lat.append(ms)
                else:
                    errors[0] += 1
        conn.close()

    t_start = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,)) for c in conns]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    server.shutdown()

    lat_arr = np.array(lat) if lat else np.array([float("nan")])
    return {
        "qps": round(len(lat) / wall, 2),
        "p50_ms": round(float(np.percentile(lat_arr, 50)), 1),
        "p99_ms": round(float(np.percentile(lat_arr, 99)), 1),
        "n_ok": len(lat), "n_err": errors[0],
        "clients": clients, "seconds": round(wall, 1),
        "recompiles_after_warmup": (len(compiles) if compile_counter
                                    else None),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--max_captions", type=int, default=16)
    ap.add_argument("--sustained", type=float, default=0.0,
                    help="also run a sustained-load phase of this many "
                         "seconds (VERDICT r4 #7: qps/p50/p99 + zero "
                         "recompiles under concurrency)")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--quantize", type=int, default=0,
                    help="int8-quantize the transformer matmuls in the "
                         "scorer (serve.py --quantize): A/B the serving "
                         "latency of the quantized path vs these fp "
                         "numbers")
    args = ap.parse_args()

    import jax
    from clipbert_tpu.core import compile_cache
    compile_cache.enable()
    from clipbert_tpu.core.config import ModelConfig
    from clipbert_tpu.data import tokenization
    from clipbert_tpu.models import clipbert
    from clipbert_tpu.serve import RetrievalScorer

    tmp = tempfile.mkdtemp(prefix="serve_bench_")
    vpath = os.path.join(tmp, "vocab.txt")
    tokenization.write_tiny_vocab(
        vpath, extra_tokens=["a", "person", "does", "thing"]
        + [str(i) for i in range(10)])
    tok = tokenization.BertTokenizer(vpath)
    blob = make_mp4()
    captions = [f"a person does thing {i}" for i in range(8)]

    cfg = ModelConfig(num_labels=2, loss_type="ce", score_agg_func="lse")
    params = clipbert.init_clipbert(jax.random.key(0), cfg, "retrieval")
    first = True
    for n_clips in (1, 16):
        scorer = RetrievalScorer(
            params, cfg, tok, num_frm=2, n_clips=n_clips, fps=1,
            max_img_size=448, max_captions=args.max_captions,
            fold_bn=first, quantize=bool(args.quantize))
        params = scorer.params          # reuse folded params for config 2
        first = False
        scorer.warmup()
        # decode-only share
        t0 = time.perf_counter()
        for _ in range(args.queries):
            scorer._decode_clips(blob)
        decode_ms = (time.perf_counter() - t0) / args.queries * 1e3

        lat = []
        for _ in range(args.queries):
            t0 = time.perf_counter()
            probs = scorer.score(blob, captions)
            lat.append((time.perf_counter() - t0) * 1e3)
            assert np.isfinite(probs).all()
        lat = np.array(lat)
        print(json.dumps({
            "metric": f"serving_latency_ms_{n_clips}clip",
            "p50": round(float(np.percentile(lat, 50)), 1),
            "p90": round(float(np.percentile(lat, 90)), 1),
            "decode_ms": round(decode_ms, 1),
            "captions": len(captions),
            "note": "axon tunnel adds per-query H2D+RTT; device share "
                    "transfers to PCIe hosts",
        }), flush=True)

        if args.sustained > 0 and n_clips == 1:
            # sustained concurrent load at the low-latency config
            stats = sustained_load(scorer, blob, captions, args.sustained,
                                   args.clients)
            print(json.dumps({
                "metric": "serving_sustained_1clip", **stats}), flush=True)
            rc = stats["recompiles_after_warmup"]
            assert rc in (None, 0), (
                f"{rc} recompiles under sustained load — the duplicate-"
                "compile race fired after warmup (serve.py:22-33)")


if __name__ == "__main__":
    main()
