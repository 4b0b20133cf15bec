"""Measure the host per-hit frame-layer envelope (frames/s/core):
pure-Python decode_frame vs the native hitparse batch engine + the
stateful decode_frame(pre=...) remainder.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
       python perf/hitparse_envelope.py
"""

import json
import time

import numpy as np

from tetraear_tpu.frame import hitparse
from tetraear_tpu.frame.decoder import TetraDecoder, FRAME_LENGTH
from tetraear_tpu.ref import golden


def make_windows(n: int, seed: int = 4) -> np.ndarray:
    rng = np.random.default_rng(seed)
    wins = np.empty((n, FRAME_LENGTH), np.uint8)
    base = [golden.build_slot(golden.build_mac_resource_data_bits(
        golden.sds_text_payload(f"ENVELOPE {i:03d}")))
        for i in range(16)]
    for i in range(n):
        w = base[i % 16].copy()
        if i % 4 == 3:                   # some CRC-failing noise frames
            w = rng.integers(0, 2, FRAME_LENGTH).astype(np.uint8)
        wins[i] = w[:FRAME_LENGTH]
    return wins


def main():
    n = 4000
    wins = make_windows(n)
    res = {}

    dec = TetraDecoder(auto_decrypt=False)
    t0 = time.time()
    for i in range(n):
        dec.decode_frame(wins[i], 0, frame_number=i)
    dt = time.time() - t0
    res["python_us_per_frame"] = round(dt / n * 1e6, 1)
    res["python_frames_per_s"] = round(n / dt)

    if hitparse.available():
        dec2 = TetraDecoder(auto_decrypt=False)
        t0 = time.time()
        hb = hitparse.parse_windows(wins)
        t_native = time.time() - t0
        for i in range(n):
            dec2.decode_frame(wins[i], 0, frame_number=i,
                              pre=hb.pre(i))
        dt = time.time() - t0
        res["native_engine_us_per_frame"] = round(t_native / n * 1e6, 2)
        res["batched_us_per_frame"] = round(dt / n * 1e6, 1)
        res["batched_frames_per_s"] = round(n / dt)
        res["speedup"] = round(res["python_us_per_frame"]
                               / res["batched_us_per_frame"], 2)

        # worker scaling: the sharded layer's pass-2 (stateful decode)
        # round-tripped through spawn workers, 1 vs 2 vs 3
        from tetraear_tpu.frame import parallel as par
        hb = hitparse.parse_windows(wins)
        meta = [(i % 64, 0, 10_000 * i) for i in range(n)]
        hints = np.ones(n, bool)

        def send(layer, w, lo, hi):
            layer._conns[w].send(("cands", meta[lo:hi], wins[lo:hi],
                                  hb.subset(range(lo, hi)),
                                  hints[lo:hi]))
        for nw in (1, 2, 3):
            layer = par.ShardedFrameLayer(64, n_workers=nw,
                                          auto_decrypt=False)
            try:
                # warm the lazy worker decoders
                for w in range(layer.n_workers):
                    send(layer, w, 0, 64)
                for w in range(layer.n_workers):
                    layer._conns[w].recv()
                t0 = time.time()
                per = (n + nw - 1) // nw
                for w in range(nw):
                    send(layer, w, w * per, min(n, (w + 1) * per))
                got = 0
                for w in range(nw):
                    st, fr = layer._conns[w].recv()
                    got += len(fr)
                dt = time.time() - t0
                res[f"workers{nw}_frames_per_s"] = round(got / dt)
            finally:
                layer.close()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
