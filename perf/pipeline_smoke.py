"""Real-chip smoke of the PRODUCTION streaming path.

bench.py times the raw device chain; this instead drives
api.Pipeline.process_block — fused Pallas back half, sparse hit keys,
O(hits) host frame layer, LazySoftRows voice fetch, device ACELP pool —
on a golden multi-carrier capture and asserts the SDS texts decode.
The assertion, not the timing, is the point: the streaming production
path runs end to end on hardware.

Run: PYTHONPATH=/root/repo:/root/.axon_site python perf/pipeline_smoke.py
Env: PERF_CARRIERS (256 bank size), PERF_ACTIVE (6), PERF_BLOCKS (3),
     PERF_WORKERS (0 = in-process frame layer), PERF_TIMEOUT_S (2400).
"""

import json
import os
import signal
import time

import numpy as np


def main():
    budget = int(os.environ.get("PERF_TIMEOUT_S", "2400"))
    signal.signal(signal.SIGALRM,
                  lambda *a: (_ for _ in ()).throw(TimeoutError()))
    signal.alarm(budget)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import math
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tetraear_tpu.api import Pipeline, PipelineConfig
    from tetraear_tpu.ref import golden, modulator

    c = int(os.environ.get("PERF_CARRIERS", "256"))
    active = int(os.environ.get("PERF_ACTIVE", "6"))
    n_blocks = int(os.environ.get("PERF_BLOCKS", "3"))

    needed = max(9.216e6, c * 25_000 * 1.15)
    fs = 72_000.0 * 2 ** math.ceil(math.log2(needed / 72_000.0))
    offsets = tuple((i - c // 2) * 25_000 + 12_500 for i in range(c))

    frames, audio = [], []
    cfg = PipelineConfig(
        sample_rate=fs, carrier_offsets_hz=offsets, frontend="fft",
        carrier_afc=False, detect_gate=False, validate=False,
        voice=True, auto_decrypt=False,
        frame_workers=int(os.environ.get("PERF_WORKERS", "0")))
    pipe = Pipeline(cfg, on_frame=frames.append, on_audio=audio.append)
    fused = pipe._fused is not None
    print(f"C={c} fs={fs/1e6:.3f}M block={pipe.block_len} fused={fused} "
          f"sparse={pipe._sparse} device_voice="
          f"{pipe._voice_device is not None}", flush=True)

    # golden capture: `active` carriers transmit SDS text, rest noise
    rng = np.random.default_rng(3)
    need = n_blocks * pipe.block_len
    n_slots = need // int(fs / 18_000 * 255) + 2
    act_idx = np.linspace(0, c - 1, active).astype(int)
    streams = [golden.build_stream(
        [golden.sds_text_payload(f"PIPE SMOKE {k}")] * n_slots)
        for k in range(active)]
    iq = modulator.generate_multi_carrier(
        streams, fs=fs, offsets_hz=[offsets[i] for i in act_idx],
        snr_db=22, rng=rng)
    if len(iq) < need:
        iq = np.concatenate([iq, np.zeros(need - len(iq), np.complex64)])

    times = []
    for b in range(n_blocks):
        t0 = time.time()
        pipe.process_block(iq[b * pipe.block_len:(b + 1) * pipe.block_len])
        times.append(time.time() - t0)
    # block 0 pays the jit compiles; steady state is the rest
    dt = (np.mean(times[1:]) if len(times) > 1 else times[0])

    texts = {f.get("sds_message") for f in frames if f.get("sds_message")}
    got = sum(1 for k in range(active)
              if f"[TXT] PIPE SMOKE {k}" in texts)
    res = {
        "carriers": c, "active": active, "blocks": n_blocks,
        "workers": cfg.frame_workers,
        "fused": fused, "frames": len(frames),
        "crc_pass": pipe.stats.crc_pass,
        "texts_decoded": got,
        "voice_frames": pipe.stats.voice_frames,
        "first_block_s": round(times[0], 1),
        "warm_s_per_block": round(float(dt), 3),
        "rt_factor": round(pipe.block_len / fs / float(dt), 2),
    }
    print(json.dumps(res))
    assert got >= max(1, active - 1), f"only {got}/{active} texts decoded"
    assert pipe.stats.crc_pass >= active * n_blocks, "too few CRC passes"
    print("PIPELINE SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
